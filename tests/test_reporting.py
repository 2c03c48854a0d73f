"""HTML/SVG report surface (reference: src/rendering/html.rs + the
get_svg chart builders) — renderers take already-reduced stage outputs."""

import numpy as np

from whitebox_tools_ray import reporting as rep


class TestReporting:
    def test_stats_table_mapping_and_rows(self):
        h = rep.stats_table_html({"mean": 1.23456789, "n": 42}, title="t")
        assert "<table>" in h and "mean" in h and "1.23457" in h and "42" in h
        h2 = rep.stats_table_html([{"a": 1, "b": 2.5}, {"a": 3, "b": 4.0}])
        assert h2.count("<tr>") == 3  # header + 2 rows

    def test_histogram_svg_shape(self):
        svg = rep.histogram_svg([1, 5, 3], [0.0, 1.0, 2.0, 3.0])
        assert svg.startswith("<svg") and svg.endswith("</svg>")
        assert svg.count("<rect") == 4  # frame + 3 bars

    def test_line_graph_and_scatter(self):
        svg = rep.line_graph_svg({"cdf": ([0, 1, 2], [0.0, 0.5, 1.0])})
        assert "<polyline" in svg and "cdf" in svg
        sc = rep.scattergram_svg(np.arange(10.0), np.arange(10.0) * 2)
        assert sc.count("<circle") == 10

    def test_report_page_escapes(self):
        page = rep.report_page("A <b>title</b>", [("S", "<p>x</p>")])
        assert "&lt;b&gt;title&lt;/b&gt;" in page and "<p>x</p>" in page
        assert page.startswith("<!DOCTYPE html>")

    def test_histogram_report_distributed(self, ray_session):
        import ray.data as rd

        ds = rd.from_items([{"v": float(i % 10)} for i in range(1000)])
        page = rep.histogram_report(ds, "v", bins=10)
        assert "<svg" in page and "Histogram of v" in page and "1000" in page
