"""HTML report rendering — the reference's stats tools emit a styled
HTML page with embedded SVG charts (src/rendering/html.rs get_css,
histogram.rs/line_graph.rs/scattergram.rs get_svg); this module is the
engine's equivalent surface, written from scratch in pure Python.

Design split (Ray-first): the DISTRIBUTED part of every report — the
histogram counts, the regression coefficients, the test statistic —
comes from the existing Dataset stages (stages/stats.py etc.); these
renderers take the already-reduced small result and return an HTML
string. Rendering never touches a Dataset.
"""

from __future__ import annotations

import html as _html
from collections.abc import Iterable, Mapping

import numpy as np

_CSS = """
body { font-family: Helvetica, Arial, sans-serif; margin: 24px; color: #222; }
h1 { font-size: 20px; border-bottom: 2px solid #3b6ea5; padding-bottom: 4px; }
h2 { font-size: 16px; color: #3b6ea5; }
table { border-collapse: collapse; margin: 8px 0 16px 0; }
th, td { border: 1px solid #bbb; padding: 4px 10px; font-size: 13px; text-align: right; }
th { background: #e8eef5; }
caption { font-size: 13px; font-style: italic; padding: 4px; }
svg { margin: 8px 0; }
.footer { margin-top: 24px; font-size: 11px; color: #888; }
"""


def _fmt(v) -> str:
    if isinstance(v, float) and not float(v).is_integer():
        return f"{v:.6g}"
    return _html.escape(str(v))


def stats_table_html(rows, title: str | None = None) -> str:
    """Rows = mapping (one-column stat table) or iterable of mappings
    (multi-row). Returns one <table>."""
    if isinstance(rows, Mapping):
        body = "".join(
            f"<tr><th>{_html.escape(str(k))}</th><td>{_fmt(v)}</td></tr>"
            for k, v in rows.items()
        )
        cap = f"<caption>{_html.escape(title)}</caption>" if title else ""
        return f"<table>{cap}{body}</table>"
    rows = list(rows)
    if not rows:
        return "<table></table>"
    cols = list(rows[0].keys())
    head = "".join(f"<th>{_html.escape(str(c))}</th>" for c in cols)
    body = "".join(
        "<tr>" + "".join(f"<td>{_fmt(r.get(c, ''))}</td>" for c in cols) + "</tr>"
        for r in rows
    )
    cap = f"<caption>{_html.escape(title)}</caption>" if title else ""
    return f"<table>{cap}<tr>{head}</tr>{body}</table>"


def _axes(w, h, ml, mb, mt, mr):
    """Plot-area geometry helpers: (x0, y0, plot_w, plot_h)."""
    return ml, mt, w - ml - mr, h - mt - mb


def histogram_svg(counts, bin_edges, width: int = 540, height: int = 320,
                  x_label: str = "value", y_label: str = "frequency") -> str:
    """Vertical-bar histogram SVG from already-reduced counts
    (the distributed stage is stages/stats.histogram)."""
    counts = np.asarray(counts, dtype=np.float64)
    edges = np.asarray(bin_edges, dtype=np.float64)
    x0, y0, pw, ph = _axes(width, height, 56, 44, 10, 10)
    cmax = counts.max() if len(counts) and counts.max() > 0 else 1.0
    parts = [f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}">']
    parts.append(f'<rect x="{x0}" y="{y0}" width="{pw}" height="{ph}" '
                 'fill="white" stroke="#999"/>')
    n = len(counts)
    for i, c in enumerate(counts):
        bh = ph * c / cmax
        bx = x0 + pw * i / n
        parts.append(
            f'<rect x="{bx:.2f}" y="{y0 + ph - bh:.2f}" width="{pw / n:.2f}" '
            f'height="{bh:.2f}" fill="#5588bb" stroke="#336699"/>'
        )
    # x ticks at 5 positions
    for t in np.linspace(0, 1, 5):
        xv = edges[0] + t * (edges[-1] - edges[0]) if len(edges) else t
        parts.append(
            f'<text x="{x0 + pw * t:.1f}" y="{y0 + ph + 16}" font-size="10" '
            f'text-anchor="middle">{xv:.4g}</text>'
        )
    for t in np.linspace(0, 1, 5):
        parts.append(
            f'<text x="{x0 - 6}" y="{y0 + ph - ph * t + 4:.1f}" font-size="10" '
            f'text-anchor="end">{cmax * t:.4g}</text>'
        )
    parts.append(f'<text x="{x0 + pw / 2}" y="{height - 6}" font-size="12" '
                 f'text-anchor="middle">{_html.escape(x_label)}</text>')
    parts.append(f'<text x="14" y="{y0 + ph / 2}" font-size="12" text-anchor="middle" '
                 f'transform="rotate(-90 14 {y0 + ph / 2})">{_html.escape(y_label)}</text>')
    parts.append("</svg>")
    return "".join(parts)


def line_graph_svg(series: Mapping[str, tuple], width: int = 540, height: int = 320,
                   x_label: str = "x", y_label: str = "y") -> str:
    """Multi-series polyline SVG; series = {name: (xs, ys)}."""
    x0, y0, pw, ph = _axes(width, height, 56, 44, 10, 10)
    all_x = np.concatenate([np.asarray(x, dtype=np.float64) for x, _ in series.values()])
    all_y = np.concatenate([np.asarray(y, dtype=np.float64) for _, y in series.values()])
    xmin, xmax = float(all_x.min()), float(all_x.max())
    ymin, ymax = float(all_y.min()), float(all_y.max())
    xr = (xmax - xmin) or 1.0
    yr = (ymax - ymin) or 1.0
    colors = ["#336699", "#bb5533", "#338855", "#885599", "#999933"]
    parts = [f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}">']
    parts.append(f'<rect x="{x0}" y="{y0}" width="{pw}" height="{ph}" '
                 'fill="white" stroke="#999"/>')
    for i, (name, (xs, ys)) in enumerate(series.items()):
        xs = np.asarray(xs, dtype=np.float64)
        ys = np.asarray(ys, dtype=np.float64)
        pts = " ".join(
            f"{x0 + pw * (x - xmin) / xr:.2f},{y0 + ph - ph * (y - ymin) / yr:.2f}"
            for x, y in zip(xs, ys)
        )
        parts.append(f'<polyline points="{pts}" fill="none" '
                     f'stroke="{colors[i % len(colors)]}" stroke-width="1.5"/>')
        parts.append(f'<text x="{x0 + pw + 4 - 90}" y="{y0 + 14 + 14 * i}" font-size="11" '
                     f'fill="{colors[i % len(colors)]}">{_html.escape(name)}</text>')
    for t in np.linspace(0, 1, 5):
        parts.append(f'<text x="{x0 + pw * t:.1f}" y="{y0 + ph + 16}" font-size="10" '
                     f'text-anchor="middle">{xmin + xr * t:.4g}</text>')
        parts.append(f'<text x="{x0 - 6}" y="{y0 + ph - ph * t + 4:.1f}" font-size="10" '
                     f'text-anchor="end">{ymin + yr * t:.4g}</text>')
    parts.append(f'<text x="{x0 + pw / 2}" y="{height - 6}" font-size="12" '
                 f'text-anchor="middle">{_html.escape(x_label)}</text>')
    parts.append(f'<text x="14" y="{y0 + ph / 2}" font-size="12" text-anchor="middle" '
                 f'transform="rotate(-90 14 {y0 + ph / 2})">{_html.escape(y_label)}</text>')
    parts.append("</svg>")
    return "".join(parts)


def scattergram_svg(x, y, width: int = 420, height: int = 420,
                    x_label: str = "x", y_label: str = "y",
                    max_points: int = 5000) -> str:
    """Point-cloud SVG. Callers pass an already-SAMPLED slice (use
    ``ds.random_sample``/``limit`` upstream); past ``max_points`` the
    renderer thins deterministically to keep the page light."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if len(x) > max_points:
        step = len(x) // max_points + 1
        x, y = x[::step], y[::step]
    x0, y0, pw, ph = _axes(width, height, 56, 44, 10, 10)
    xmin, xmax = float(x.min()), float(x.max())
    ymin, ymax = float(y.min()), float(y.max())
    xr = (xmax - xmin) or 1.0
    yr = (ymax - ymin) or 1.0
    parts = [f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}">']
    parts.append(f'<rect x="{x0}" y="{y0}" width="{pw}" height="{ph}" '
                 'fill="white" stroke="#999"/>')
    for xi, yi in zip(x, y):
        parts.append(
            f'<circle cx="{x0 + pw * (xi - xmin) / xr:.1f}" '
            f'cy="{y0 + ph - ph * (yi - ymin) / yr:.1f}" r="1.6" '
            'fill="#33669988"/>'
        )
    for t in np.linspace(0, 1, 5):
        parts.append(f'<text x="{x0 + pw * t:.1f}" y="{y0 + ph + 16}" font-size="10" '
                     f'text-anchor="middle">{xmin + xr * t:.4g}</text>')
        parts.append(f'<text x="{x0 - 6}" y="{y0 + ph - ph * t + 4:.1f}" font-size="10" '
                     f'text-anchor="end">{ymin + yr * t:.4g}</text>')
    parts.append(f'<text x="{x0 + pw / 2}" y="{height - 6}" font-size="12" '
                 f'text-anchor="middle">{_html.escape(x_label)}</text>')
    parts.append(f'<text x="14" y="{y0 + ph / 2}" font-size="12" text-anchor="middle" '
                 f'transform="rotate(-90 14 {y0 + ph / 2})">{_html.escape(y_label)}</text>')
    parts.append("</svg>")
    return "".join(parts)


def report_page(title: str, sections: Iterable[tuple[str, str]]) -> str:
    """Full HTML page: ``sections`` = (heading, inner-html) pairs —
    typically stats_table_html / *_svg outputs."""
    body = "".join(
        f"<h2>{_html.escape(h)}</h2>\n{inner}" for h, inner in sections
    )
    return (
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        f"<title>{_html.escape(title)}</title><style>{_CSS}</style></head>"
        f"<body><h1>{_html.escape(title)}</h1>\n{body}"
        "<div class='footer'>Generated by whitebox_tools_ray</div>"
        "</body></html>"
    )


def histogram_report(ds, col: str, bins: int = 64, title: str | None = None) -> str:
    """AttributeHistogram / RasterHistogram HTML surface
    (attribute_histogram.rs, raster_histogram.rs): the distributed
    histogram stage reduces the Dataset; this renders the page."""
    from .stages.stats import histogram

    edges, counts = histogram(ds, col, bins=bins)
    svg = histogram_svg(counts, edges, x_label=col)
    table = stats_table_html(
        {"rows": int(counts.sum()), "bins": int(len(counts)),
         "min": float(edges[0]), "max": float(edges[-1])},
        title="summary",
    )
    return report_page(title or f"Histogram of {col}", [("Distribution", svg),
                                                        ("Summary", table)])
