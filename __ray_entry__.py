"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in whitebox_tools_ray) calls ``ray.init()`` / ``ray.shutdown()``.

Column-name / rounding discipline: every computed column is named
identically on both sides, and float aggregates are ROUND()ed to the same
decimals in the Ray code and the SQL so distributed-summation
reassociation can't flip the value hash.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from whitebox_tools_ray.pipelines import relational as R


def entry() -> Any:
    """Flagship slice on sf0.001: derive the deterministic point layer
    from lineitem, clip it against a polygon layer with the full
    spatial-join path (broadcast parts + quad-cell pruning + winding
    kernel + distributed sequential FID)."""
    return R.q_clip_points_convex("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "pricing_summary": R.q_pricing_summary,
        "join_tables_left": R.q_join_tables_left,
        "join_bucketed": R.q_join_bucketed,
        "topk_orders": R.q_topk_orders,
        "unique_values": R.q_unique_values,
        "zonal_stats": R.q_zonal_stats,
        "zscores": R.q_zscores,
        "reclass": R.q_reclass,
        "minmax_stretch": R.q_minmax_stretch,
        "cell_binning": R.q_cell_binning,
        "tile_assign": R.q_tile_assign,
        "clip_points_convex": R.q_clip_points_convex,
        "dedup_exact": R.q_dedup_exact,
        "text_tokens": R.q_text_tokens,
        "events_window": R.q_events_window,
        "ann_topk": R.q_ann_topk,
        "lang_distribution": R.q_lang_distribution,
        "session_windows": R.q_session_windows,
        "text_quality": R.q_text_quality,
        "token_count": R.q_token_count,
        "near_dup_cosine": R.q_near_dup_cosine,
        "frame_sample": R.q_frame_sample,
        # rows-only checks (no SQL-expressible oracle):
        "minhash_pairs": R.q_minhash_pairs,
        "simhash_pairs": R.q_simhash_pairs,
        "kmeans_clusters": R.q_kmeans_clusters,
        "ann_lsh": R.q_ann_lsh,
        "lang_pred": R.q_lang_pred,
        "correlation": R.q_correlation,
        "rmse": R.q_rmse,
        "crosstab": R.q_crosstab,
        "kappa": R.q_kappa,
        "random_sample": R.q_random_sample,
        "trend_surface": R.q_trend_surface,
        "pca_project": R.q_pca_project,
        "sliding_window": R.q_sliding_window,
        "hex_binning": R.q_hex_binning,
        "polygon_metrics": R.q_polygon_metrics,
        "rgb_to_ihs": R.q_rgb_to_ihs,
        "colour_composite": R.q_colour_composite,
        "regression": R.q_regression,
        "erase_points_convex": R.q_erase_points_convex,
        "quantiles": R.q_quantiles,
        "semi_join": R.q_semi_join,
        "topk_per_group": R.q_topk_per_group,
        "overlay_intersect": R.q_overlay_intersect,
        "overlay_difference": R.q_overlay_difference,
        "overlay_union": R.q_overlay_union,
        "dissolve_zones": R.q_dissolve_zones,
        "polygonize_grid": R.q_polygonize_grid,
        "knn_join": R.q_knn_join,
        "hypsometric": R.q_hypsometric,
        "euclidean_distance": R.q_euclidean_distance,
        "anova_status": R.q_anova_status,
        "paired_ttest": R.q_paired_ttest,
        "ks_orders": R.q_ks_orders,
        "wilcoxon": R.q_wilcoxon,
        "cume_dist": R.q_cume_dist,
        "crispness": R.q_crispness,
        "cva": R.q_cva,
        "pan_sharpen": R.q_pan_sharpen,
        "lidar_thin": R.q_lidar_thin,
        "flightline_edges": R.q_flightline_edges,
        "reclass_interval": R.q_reclass_interval,
        "allocation": R.q_allocation,
        "slope_horn": R.q_slope_horn,
        "aspect_horn": R.q_aspect_horn,
        "hillshade_horn": R.q_hillshade_horn,
        "window_total": R.q_window_total,
        "prof_curvature": R.q_prof_curvature_horn,
        "d8_accum": R.q_d8_accum,
        "basins_grid": R.q_basins_grid,
        "downslope_length": R.q_downslope_length,
        "watershed_grid": R.q_watershed_grid,
        "resample_bilinear": R.q_resample_bilinear,
        "idw_grid": R.q_idw_grid,
        "horizon_angle": R.q_horizon_angle,
        "fetch_analysis": R.q_fetch_analysis,
        "viewshed": R.q_viewshed,
        "overlay_intersect_cp": R.q_overlay_intersect_cp,
        "idw_grid_cp": R.q_idw_grid_cp,
        "las_round_trip": R.q_las_round_trip,
        "ann_ivf": R.q_ann_ivf,
        "shp_round_trip": R.q_shp_round_trip,
        "geotiff_round_trip": R.q_geotiff_round_trip,
        "grid_convert_round_trip": R.q_grid_convert_round_trip,
        "image_decode": R.q_image_decode,
        "wav_round_trip": R.q_wav_round_trip,
        "stream_dist_outlet": R.q_stream_dist_outlet,
        "median_filter": R.q_median_filter,
        "composite_split": R.q_composite_split,
        "sobel_filter": R.q_sobel_filter,
        "laplacian_filter": R.q_laplacian_filter,
        "integral_image": R.q_integral_image,
        "hist_equalization": R.q_hist_equalization,
        "num_inflowing": R.q_num_inflowing,
        "shreve_magnitude": R.q_shreve_magnitude,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "pricing_summary": R.Q_PRICING_SUMMARY_SQL,
        "join_tables_left": R.Q_JOIN_TABLES_LEFT_SQL,
        "join_bucketed": R.Q_JOIN_BUCKETED_SQL,
        "topk_orders": R.Q_TOPK_ORDERS_SQL,
        "unique_values": R.Q_UNIQUE_VALUES_SQL,
        "zonal_stats": R.Q_ZONAL_STATS_SQL,
        "zscores": R.Q_ZSCORES_SQL,
        "reclass": R.Q_RECLASS_SQL,
        "minmax_stretch": R.Q_MINMAX_STRETCH_SQL,
        "cell_binning": R.q_cell_binning_sql(),
        "tile_assign": R.q_tile_assign_sql(),
        "clip_points_convex": R.q_clip_points_convex_sql(),
        "dedup_exact": R.Q_DEDUP_EXACT_SQL,
        "text_tokens": R.Q_TEXT_TOKENS_SQL,
        "events_window": R.Q_EVENTS_WINDOW_SQL,
        "ann_topk": R.q_ann_topk_sql(),
        "lang_distribution": R.Q_LANG_DISTRIBUTION_SQL,
        "session_windows": R.q_session_windows_sql(),
        "text_quality": R.Q_TEXT_QUALITY_SQL,
        "token_count": R.Q_TOKEN_COUNT_SQL,
        "near_dup_cosine": R.q_near_dup_cosine_sql(),
        "frame_sample": R.q_frame_sample_sql(),
        "correlation": R.Q_CORRELATION_SQL,
        "rmse": R.Q_RMSE_SQL,
        "crosstab": R.Q_CROSSTAB_SQL,
        "kappa": R.Q_KAPPA_SQL,
        "random_sample": R.q_random_sample_sql(),
        "sliding_window": R.q_sliding_window_sql(),
        "polygon_metrics": R.Q_POLYGON_METRICS_SQL,
        "rgb_to_ihs": R.Q_RGB_TO_IHS_SQL,
        "colour_composite": R.Q_COLOUR_COMPOSITE_SQL,
        "regression": R.Q_REGRESSION_SQL,
        "erase_points_convex": R.q_erase_points_convex_sql(),
        "quantiles": R.q_quantiles_sql(),
        "semi_join": R.Q_SEMI_JOIN_SQL,
        "overlay_intersect": R.Q_OVERLAY_INTERSECT_SQL,
        "overlay_difference": R.Q_OVERLAY_DIFFERENCE_SQL,
        "overlay_union": R.Q_OVERLAY_UNION_SQL,
        "dissolve_zones": R.Q_DISSOLVE_ZONES_SQL,
        "polygonize_grid": R.Q_POLYGONIZE_GRID_SQL,
        "knn_join": R.Q_KNN_JOIN_SQL,
        "hypsometric": R.q_hypsometric_sql(),
        "euclidean_distance": R.Q_EUCLIDEAN_DISTANCE_SQL,
        "anova_status": R.Q_ANOVA_STATUS_SQL,
        "paired_ttest": R.Q_PAIRED_TTEST_SQL,
        "ks_orders": R.Q_KS_ORDERS_SQL,
        "wilcoxon": R.Q_WILCOXON_SQL,
        "cume_dist": R.Q_CUME_DIST_SQL,
        "crispness": R.Q_CRISPNESS_SQL,
        "cva": R.Q_CVA_SQL,
        "pan_sharpen": R.Q_PAN_SHARPEN_SQL,
        "lidar_thin": R.q_lidar_thin_sql(),
        "flightline_edges": R.Q_FLIGHTLINE_EDGES_SQL,
        "reclass_interval": R.Q_RECLASS_INTERVAL_SQL,
        "allocation": R.Q_ALLOCATION_SQL,
        "slope_horn": R.Q_SLOPE_HORN_SQL,
        "aspect_horn": R.Q_ASPECT_HORN_SQL,
        "hillshade_horn": R.q_hillshade_horn_sql(),
        "window_total": R.q_window_total_sql(),
        "prof_curvature": R.q_prof_curvature_horn_sql(),
        "d8_accum": R.q_d8_accum_sql(),
        "basins_grid": R.q_basins_grid_sql(),
        "downslope_length": R.q_downslope_length_sql(),
        "watershed_grid": R.q_watershed_grid_sql(),
        "trend_surface": R.Q_TREND_SURFACE_SQL,
        "resample_bilinear": R.Q_RESAMPLE_BILINEAR_SQL,
        "idw_grid": R.q_idw_grid_sql(),
        "horizon_angle": R.Q_HORIZON_ANGLE_SQL,
        "fetch_analysis": R.Q_FETCH_ANALYSIS_SQL,
        "viewshed": R.Q_VIEWSHED_SQL,
        "overlay_intersect_cp": R.Q_OVERLAY_INTERSECT_CP_SQL,
        "idw_grid_cp": R.q_idw_grid_sql(),
        "hex_binning": R.q_hex_binning_sql(),
        "topk_per_group": R.q_topk_per_group_sql(),
        # minhash_pairs / simhash_pairs / kmeans_clusters / ann_lsh /
        # lang_pred / pca_project intentionally omitted:
        # non-SQL-expressible (sketch / iterative / heuristic / eigen) →
        # driver's rows-only check.
        "las_round_trip": R.q_las_round_trip_sql(),
        "ann_ivf": R.q_ann_ivf_sql(),
        "shp_round_trip": R.q_shp_round_trip_sql(),
        "geotiff_round_trip": R.q_geotiff_round_trip_sql(),
        "grid_convert_round_trip": R.q_grid_convert_round_trip_sql(),
        "wav_round_trip": R.q_wav_round_trip_sql(),
        "stream_dist_outlet": R.q_stream_dist_outlet_sql(),
        "median_filter": R.q_median_filter_sql(),
        "composite_split": R.q_composite_split_sql(),
        "sobel_filter": R.q_sobel_filter_sql(),
        "laplacian_filter": R.q_laplacian_filter_sql(),
        "integral_image": R.q_integral_image_sql(),
        "hist_equalization": R.q_hist_equalization_sql(),
        "num_inflowing": R.q_num_inflowing_sql(),
        "shreve_magnitude": R.q_shreve_magnitude_sql(),
    }
