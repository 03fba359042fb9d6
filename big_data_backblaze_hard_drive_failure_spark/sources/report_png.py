"""PNG reporting sink (reference S8) — pure-stdlib chart rendering.

The reference's only image output is a matplotlib SHAP summary plot
saved as PNG (/root/reference/scripts/05_SHAP_alert_explanation.py:
139-149): a DRIVER-SIDE report over an already-bounded frame (one row
per feature).  matplotlib isn't in this container and chart styling is
not engine work, so the engine twin keeps the same contract — bounded
collect, deterministic raster, real PNG bytes — with the rasterizer
written against the package's own spec-complete PNG codec
(``functions/multimodal.py:encode_png``/``decode_png``), which also
round-trip-verifies it in tests.

Scale stance: every writer here hard-caps the driver collect (the
reference caps at its feature count / plot sample too).  The DATA
REDUCTION — mean |contribution| per feature, the PR curve's
K-threshold summary — happens distributed, in the registered queries;
only the final ≤``cap``-row report frame crosses to the driver, which
is exactly what "driver-side reporting; out of engine scope" meant in
SURVEY §2.1 made concrete.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..functions.multimodal import encode_png

# chart geometry/colors: fixed so output bytes are deterministic
_BG = (255, 255, 255)
_AXIS = (32, 32, 32)
_BAR = (31, 119, 180)   # matplotlib C0 — familiar, but ours by value
_LINE = (214, 39, 40)   # matplotlib C3
_MARGIN = 8


class _Raster:
    """Top-down row-major RGB canvas with the few primitives a bar /
    line chart needs.  Integer-only (Bresenham); no anti-aliasing, so
    every pixel is closed-form checkable in tests."""

    def __init__(self, width: int, height: int) -> None:
        if width <= 2 * _MARGIN or height <= 2 * _MARGIN:
            raise ValueError("canvas too small")
        self.w, self.h = width, height
        self.buf = bytearray(_BG * (width * height))

    def put(self, x: int, y: int, rgb: tuple[int, int, int]) -> None:
        if 0 <= x < self.w and 0 <= y < self.h:
            i = (y * self.w + x) * 3
            self.buf[i : i + 3] = bytes(rgb)

    def rect(
        self, x0: int, y0: int, x1: int, y1: int, rgb: tuple[int, int, int]
    ) -> None:
        for y in range(max(0, y0), min(self.h, y1 + 1)):
            row = (y * self.w) * 3
            px = bytes(rgb)
            for x in range(max(0, x0), min(self.w, x1 + 1)):
                self.buf[row + x * 3 : row + x * 3 + 3] = px

    def line(
        self, x0: int, y0: int, x1: int, y1: int, rgb: tuple[int, int, int]
    ) -> None:
        dx, dy = abs(x1 - x0), -abs(y1 - y0)
        sx, sy = (1 if x0 < x1 else -1), (1 if y0 < y1 else -1)
        err = dx + dy
        while True:
            self.put(x0, y0, rgb)
            if x0 == x1 and y0 == y1:
                return
            e2 = 2 * err
            if e2 >= dy:
                err += dy
                x0 += sx
            if e2 <= dx:
                err += dx
                y0 += sy

    def png(self) -> bytes:
        return encode_png(self.w, self.h, bytes(self.buf))


def render_bar_chart(
    values: "list[float]", width: int = 480, height: int = 320
) -> bytes:
    """Horizontal bar chart (the shape of a SHAP summary's mean-|v|
    panel): one left-anchored bar per value, lengths proportional to
    value / max(values), a 1px gap between bars, y-axis line.
    Returns PNG bytes."""
    if not values:
        raise ValueError("no bars to draw")
    if any(v < 0 for v in values):
        raise ValueError("bar values must be non-negative")
    r = _Raster(width, height)
    x_axis = _MARGIN
    plot_w = width - 2 * _MARGIN - 1
    vmax = max(values) or 1.0
    n = len(values)
    slot = (height - 2 * _MARGIN) // n
    if slot < 3:
        raise ValueError(f"{n} bars need height >= {2 * _MARGIN + 3 * n}")
    for i, v in enumerate(values):
        y0 = _MARGIN + i * slot
        y1 = y0 + slot - 2  # rect is y1-inclusive: slot-1 rows, 1px gap
        bar_len = int(round(plot_w * (v / vmax)))
        if bar_len > 0:
            r.rect(x_axis + 1, y0, x_axis + bar_len, y1, _BAR)
    r.line(x_axis, _MARGIN, x_axis, height - _MARGIN - 1, _AXIS)
    return r.png()


def render_curve(
    xs: "list[float]", ys: "list[float]", width: int = 480, height: int = 320
) -> bytes:
    """Polyline chart over unit-normalized data (a PR curve, a ROC
    curve): x/y axes plus connected segments.  Returns PNG bytes."""
    if len(xs) != len(ys) or not xs:
        raise ValueError("xs/ys must be equal-length and non-empty")
    r = _Raster(width, height)
    x0a, y0a = _MARGIN, height - _MARGIN - 1
    xmin, xmax = min(xs), max(xs)
    ymin, ymax = min(ys), max(ys)
    xspan = (xmax - xmin) or 1.0
    yspan = (ymax - ymin) or 1.0
    plot_w = width - 2 * _MARGIN - 1
    plot_h = height - 2 * _MARGIN - 1

    def px(x: float) -> int:
        return x0a + int(round(plot_w * (x - xmin) / xspan))

    def py(y: float) -> int:
        return y0a - int(round(plot_h * (y - ymin) / yspan))

    r.line(x0a, y0a, x0a + plot_w, y0a, _AXIS)
    r.line(x0a, y0a, x0a, y0a - plot_h, _AXIS)
    pts = sorted(zip(xs, ys))
    for (xa, ya), (xb, yb) in zip(pts, pts[1:]):
        r.line(px(xa), py(ya), px(xb), py(yb), _LINE)
    if len(pts) == 1:
        r.put(px(pts[0][0]), py(pts[0][1]), _LINE)
    return r.png()


def write_feature_importance_png(
    df: DataFrame,
    path: str,
    value_col: str = "mean_abs_contribution",
    cap: int = 64,
) -> "list[tuple[str, float]]":
    """S8 twin of the reference's ``plt.savefig("outputs/
    shap_alert_summary.png")``: render the per-feature mean
    |contribution| frame (M10's distributed output) as a bar-chart PNG.
    ``df`` must have (feature STRING, value DOUBLE)-shaped columns;
    rows beyond ``cap`` raise — a feature-importance report with more
    rows than features is a bug, not a big frame."""
    other = [c for c in df.columns if c != value_col]
    if not other or value_col not in df.columns:
        raise ValueError(f"need a label column and '{value_col}'")
    feature_col = other[0]
    rows = df.limit(cap + 1).collect()
    if len(rows) > cap:
        raise ValueError(f"feature-importance frame exceeds cap={cap}")
    pairs = sorted(
        ((r[feature_col], float(r[value_col])) for r in rows),
        key=lambda kv: -kv[1],
    )
    png = render_bar_chart([v for _, v in pairs])
    with open(path, "wb") as f:
        f.write(png)
    return pairs


def write_pr_curve_png(
    df: DataFrame,
    path: str,
    recall_col: str = "recall",
    precision_col: str = "precision",
    cap: int = 4096,
) -> int:
    """Render a (recall, precision) frame — mlops_pr_curve /
    mlops_pr_at_thresholds output — as a curve PNG.  The curve
    DECIMATION happened distributed (the every-100th-alert filter /
    K-threshold summary); this collects only the ≤``cap`` plotted
    points.  Returns the number of points drawn."""
    rows = df.select(recall_col, precision_col).limit(cap + 1).collect()
    if len(rows) > cap:
        raise ValueError(
            f"plot frame exceeds cap={cap}; decimate distributed first"
        )
    if not rows:
        raise ValueError("empty curve frame")
    png = render_curve(
        [float(r[recall_col]) for r in rows],
        [float(r[precision_col]) for r in rows],
    )
    with open(path, "wb") as f:
        f.write(png)
    return len(rows)
