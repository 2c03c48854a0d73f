"""Vector overlay family: planar-arrangement kernel parity + Ray stages.

Kernel cases mirror the reference overlay semantics
(gis_analysis/intersect.rs, union.rs, difference.rs,
symmetrical_difference.rs, clip.rs polygon branch, split_with_lines.rs,
polygonize.rs, dissolve.rs): rectangles with hand-computable results,
holes, shared edges, concave subjects, plus a randomized even-odd
membership check of the output region against the input predicate.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from whitebox_tools_ray.kernels.arrangement import (
    _even_odd,
    overlay_groups,
    polygon_overlay,
    polygonize_segments,
    ring_signed_area,
)
from whitebox_tools_ray.sources.vectors import POLY_SCHEMA, make_polygon_record


def rect(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], float)


def rect_cw(x0, y0, x1, y1):
    return [(x0, y0), (x0, y1), (x1, y1), (x1, y0)]


def rect_ccw(x0, y0, x1, y1):
    return [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]


def total_area(polys):
    a = 0.0
    for p in polys:
        a += abs(ring_signed_area(p["shell"]))
        for h in p["holes"]:
            a -= abs(ring_signed_area(h))
    return a


class TestArrangementKernel:
    def test_rect_ops(self):
        A = [rect(0, 0, 10, 10)]
        B = [[rect(5, 5, 15, 15)]]
        for op, expect in [
            ("intersect", 25),
            ("difference", 75),
            ("union", 175),
            ("symdiff", 150),
        ]:
            assert total_area(polygon_overlay(A, B, op)) == pytest.approx(expect)

    def test_disjoint_and_identical(self):
        A = [rect(0, 0, 10, 10)]
        assert total_area(polygon_overlay(A, [[rect(20, 20, 30, 30)]], "union")) == 200.0
        assert total_area(polygon_overlay(A, [[rect(20, 20, 30, 30)]], "intersect")) == 0.0
        assert total_area(polygon_overlay(A, [A], "symdiff")) == 0.0
        assert total_area(polygon_overlay(A, [A], "intersect")) == 100.0

    def test_shared_edge_collapses(self):
        A = [rect(0, 0, 10, 10)]
        B = [[rect(10, 0, 20, 10)]]
        out = polygon_overlay(A, B, "union")
        assert total_area(out) == 200.0
        assert total_area(polygon_overlay(A, B, "intersect")) == 0.0

    def test_contained_difference_gets_hole(self):
        out = polygon_overlay([rect(0, 0, 10, 10)], [[rect(3, 3, 7, 7)]], "difference")
        assert total_area(out) == pytest.approx(84.0)
        assert sum(len(p["holes"]) for p in out) == 1

    def test_subject_hole_respected(self):
        # A = square with hole; B overlaps part of the hole
        A = [rect(0, 0, 10, 10), rect(4, 4, 6, 6)]
        out = polygon_overlay(A, [[rect(5, 0, 15, 10)]], "intersect")
        assert total_area(out) == pytest.approx(48.0)  # 50 − 2 in-hole

    def test_concave_subject(self):
        L = np.array([[0, 0], [10, 0], [10, 4], [4, 4], [4, 10], [0, 10]], float)
        out = polygon_overlay([L], [[rect(2, 2, 8, 8)]], "intersect")
        assert total_area(out) == pytest.approx(20.0)

    def test_triangle_crossing(self):
        T = np.array([[0, 0], [10, 0], [5, 9]], float)
        out = polygon_overlay([T], [[rect(0, 3, 10, 20)]], "intersect")
        assert total_area(out) == pytest.approx(45 * (6 / 9) ** 2)

    def test_multiple_overlay_groups(self):
        out = polygon_overlay(
            [rect(0, 0, 10, 10)],
            [[rect(-5, -5, 3, 3)], [rect(7, 7, 15, 15)]],
            "difference",
        )
        assert total_area(out) == pytest.approx(82.0)

    def test_split_with_dangling_line_no_face(self):
        out = overlay_groups(
            [[rect(0, 0, 10, 10)]],
            lambda m: bool(m[0]),
            extra_segments=[np.array([[4, -1], [4, 5]], float)],
            dissolve=False,
        )
        assert [round(total_area([p]), 6) for p in out] == [100.0]

    def test_split_full_cross(self):
        out = overlay_groups(
            [[rect(0, 0, 10, 10)]],
            lambda m: bool(m[0]),
            extra_segments=[np.array([[4, -1], [4, 11]], float)],
            dissolve=False,
        )
        assert sorted(round(total_area([p]), 6) for p in out) == [40.0, 60.0]

    def test_polygonize_nested(self):
        segs = [np.vstack([r, r[:1]]) for r in (rect(0, 0, 10, 10), rect(3, 3, 7, 7))]
        out = polygonize_segments(segs)
        assert sorted(round(total_area([p]), 6) for p in out) == [16.0, 84.0]

    def test_randomized_membership(self):
        rng = np.random.RandomState(7)

        def rand_poly(cx, cy, r, n):
            ang = np.sort(rng.uniform(0, 2 * np.pi, n))
            rad = rng.uniform(0.3 * r, r, n)
            return np.column_stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)])

        ops = {
            "intersect": lambda a, b: a and b,
            "difference": lambda a, b: a and not b,
            "union": lambda a, b: a or b,
            "symdiff": lambda a, b: a != b,
        }
        gx, gy = np.meshgrid(np.linspace(-9.87, 9.91, 25), np.linspace(-9.93, 9.89, 25))
        pts = np.column_stack([gx.ravel(), gy.ravel()])
        for _ in range(5):
            A = [rand_poly(rng.uniform(-3, 3), rng.uniform(-3, 3), rng.uniform(2, 6), rng.randint(5, 12))]
            B = [rand_poly(rng.uniform(-3, 3), rng.uniform(-3, 3), rng.uniform(2, 6), rng.randint(5, 12))]
            for op, fn in ops.items():
                out = polygon_overlay(A, [B], op)
                out_rings = [p["shell"] for p in out] + [h for p in out for h in p["holes"]]
                for px, py in pts:
                    want = fn(_even_odd(px, py, A), _even_odd(px, py, B))
                    got = _even_odd(px, py, out_rings) if out_rings else False
                    assert want == got, (op, px, py)


def _line_rec(rid, pts):
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    return {
        "record_id": rid,
        "parts": [0],
        "xs": xs,
        "ys": ys,
        "x_min": min(xs),
        "x_max": max(xs),
        "y_min": min(ys),
        "y_max": max(ys),
        "name": "l",
        "zone": 1,
    }


class TestOverlayStages:
    @pytest.fixture()
    def layers(self):
        a = [
            make_polygon_record(1, [rect_cw(0, 0, 10, 10)], "a1", 1),
            make_polygon_record(2, [rect_cw(20, 0, 30, 10)], "a2", 1),
            make_polygon_record(3, [rect_cw(0, 20, 10, 30), rect_ccw(3, 23, 7, 27)], "a3", 2),
        ]
        b = [make_polygon_record(1, [rect_cw(5, 5, 25, 8)], "b1", 1)]
        return (
            pa.Table.from_pylist(a, schema=POLY_SCHEMA),
            pa.Table.from_pylist(b, schema=POLY_SCHEMA),
        )

    def test_intersect_difference(self, ray_session, layers):
        import ray.data as rd

        from whitebox_tools_ray import api

        a_tbl, b_tbl = layers
        a_ds = rd.from_arrow(a_tbl)
        inter = api.run("Intersect", a_ds, b_tbl).to_pandas()
        assert dict(zip(inter["record_id"], inter["area"])) == {1: 15.0, 2: 15.0}
        diff = api.run("Difference", a_ds, b_tbl).to_pandas()
        assert dict(zip(diff["record_id"], diff["area"])) == {1: 85.0, 2: 85.0, 3: 84.0}

    def test_union_symdiff(self, ray_session, layers):
        import ray.data as rd

        from whitebox_tools_ray import api

        a_tbl, b_tbl = layers
        a_ds, b_ds = rd.from_arrow(a_tbl), rd.from_arrow(b_tbl)
        uni = api.run("Union", a_ds, b_tbl, b_ds, a_tbl).to_pandas()
        assert uni["area"].sum() == pytest.approx(284 + 60 - 30)
        sym = api.run("SymmetricalDifference", a_ds, b_tbl, b_ds, a_tbl).to_pandas()
        assert sym["area"].sum() == pytest.approx(284 + 60 - 2 * 30)

    def test_dissolve(self, ray_session):
        import ray.data as rd

        from whitebox_tools_ray import api

        recs = [
            make_polygon_record(1, [rect_cw(0, 0, 10, 10)], "p", 1),
            make_polygon_record(2, [rect_cw(10, 0, 20, 10)], "p", 1),
            make_polygon_record(3, [rect_cw(5, 5, 15, 18)], "p", 1),
            make_polygon_record(4, [rect_cw(40, 40, 50, 50)], "p", 2),
        ]
        ds = rd.from_arrow(pa.Table.from_pylist(recs, schema=POLY_SCHEMA))
        out = api.run("Dissolve", ds, "zone").to_pandas().sort_values("zone")
        assert out["zone"].tolist() == [1, 2]
        assert out["area"].tolist() == pytest.approx([280.0, 100.0])

    def test_dissolve_skewed_zone_salted(self, ray_session):
        """90% of records share one zone value: the salted two-stage path
        must complete without a single-task group and match the
        single-stage (salt=None) result exactly."""
        import ray.data as rd

        from whitebox_tools_ray.stages import overlay as ov

        recs = []
        # hot zone: 45 overlapping 2x1 strips tiling [0,46]x[0,1]
        for i in range(45):
            recs.append(
                make_polygon_record(i + 1, [rect_cw(i, 0, i + 2, 1)], "p", 7)
            )
        # cold zones: one rect each
        for z in range(5):
            recs.append(
                make_polygon_record(100 + z, [rect_cw(100 + 3 * z, 0, 102 + 3 * z, 1)], "p", z)
            )
        tbl = pa.Table.from_pylist(recs, schema=POLY_SCHEMA)
        salted = (
            ov.dissolve(rd.from_arrow(tbl), "zone", salt=8)
            .to_pandas().sort_values("zone").reset_index(drop=True)
        )
        single = (
            ov.dissolve(rd.from_arrow(tbl), "zone", salt=None)
            .to_pandas().sort_values("zone").reset_index(drop=True)
        )
        assert salted["zone"].tolist() == single["zone"].tolist()
        assert salted["area"].tolist() == pytest.approx(single["area"].tolist())
        hot = salted[salted["zone"] == 7]
        assert hot["area"].sum() == pytest.approx(46.0)

    def test_split_and_polygonize(self, ray_session):
        import ray.data as rd

        from whitebox_tools_ray import api

        lines = pa.Table.from_pylist(
            [_line_rec(1, [(5, -2), (5, 12)]), _line_rec(2, [(-2, 5), (12, 5)])],
            schema=POLY_SCHEMA,
        )
        subj = rd.from_arrow(
            pa.Table.from_pylist(
                [make_polygon_record(1, [rect_cw(0, 0, 10, 10)], "s", 1)], schema=POLY_SCHEMA
            )
        )
        sp = api.run("SplitWithLines", subj, lines).to_pandas()
        assert sorted(round(a, 6) for a in sp["area"]) == [25.0, 25.0, 25.0, 25.0]

        grid = pa.Table.from_pylist(
            [
                _line_rec(1, [(0, 0), (20, 0)]),
                _line_rec(2, [(0, 10), (20, 10)]),
                _line_rec(3, [(0, 0), (0, 10)]),
                _line_rec(4, [(10, 0), (10, 10)]),
                _line_rec(5, [(20, 0), (20, 10)]),
            ],
            schema=POLY_SCHEMA,
        )
        pz = api.run("Polygonize", grid).to_pandas()
        assert sorted(round(a, 6) for a in pz["area"]) == [100.0, 100.0]

    def test_merge_line_segments(self, ray_session):
        import ray.data as rd

        from whitebox_tools_ray import api

        segs = [
            _line_rec(1, [(0, 0), (1, 0)]),
            _line_rec(2, [(1, 0), (2, 0)]),
            _line_rec(3, [(3, 0), (2, 0)]),
            _line_rec(4, [(9, 9), (9, 10)]),
        ]
        ds = rd.from_arrow(pa.Table.from_pylist(segs, schema=POLY_SCHEMA))
        out = api.run("MergeLineSegments", ds).to_pandas()
        assert sorted(out["n_segments"].tolist()) == [1, 3]
        chain = out[out["n_segments"] == 3].iloc[0]
        assert list(zip(chain["xs"], chain["ys"])) == [
            (0.0, 0.0),
            (1.0, 0.0),
            (2.0, 0.0),
            (3.0, 0.0),
        ]

    def test_output_ring_convention(self, ray_session, layers):
        """Shells CW, holes CCW — the repo's Bourke-test record
        convention (geometry.rs:305-345)."""
        import ray.data as rd

        from whitebox_tools_ray.sources.vectors import record_is_hole
        from whitebox_tools_ray.stages import overlay as ov

        a_tbl, b_tbl = layers
        diff = ov.difference(rd.from_arrow(a_tbl), b_tbl).to_pandas()
        for _, row in diff.iterrows():
            flags = record_is_hole(
                np.asarray(row["parts"]), np.asarray(row["xs"]), np.asarray(row["ys"])
            )
            assert flags[0] is False or flags[0] == False  # first ring is a shell
