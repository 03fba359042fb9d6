"""S8 (PNG reporting sink) and O5 (show) — the last two SURVEY §2 rows.

The PNG writers are verified by decoding their own output with the
package's spec-complete PNG decoder (CRC-checked chunk walk, filter
reversal) and asserting closed-form pixel facts: exact bar lengths for
known values, axis pixels, endpoint pixels for curves.  show_string is
pinned byte-for-byte against Spark's own ``Dataset.showString``.
"""

from __future__ import annotations

import pytest

from big_data_backblaze_hard_drive_failure_spark.functions.multimodal import decode_png
from big_data_backblaze_hard_drive_failure_spark.operators.display import show_string
from big_data_backblaze_hard_drive_failure_spark.sources.report_png import (
    _MARGIN,
    render_bar_chart,
    render_curve,
    write_feature_importance_png,
    write_pr_curve_png,
)

BAR = (31, 119, 180)
LINE = (214, 39, 40)
BG = (255, 255, 255)


def _pixels(png: bytes):
    w, h, rgb = decode_png(png)
    def at(x, y):
        i = (y * w + x) * 3
        return tuple(rgb[i : i + 3])
    return w, h, at


def test_bar_chart_exact_bar_lengths():
    w, h, at = _pixels(render_bar_chart([4.0, 2.0, 1.0], 480, 320))
    assert (w, h) == (480, 320)
    plot_w = w - 2 * _MARGIN - 1
    slot = (h - 2 * _MARGIN) // 3
    for i, v in enumerate([4.0, 2.0, 1.0]):
        y = _MARGIN + i * slot  # first row of bar i
        bar_len = sum(
            1 for x in range(_MARGIN + 1, w) if at(x, y) == BAR
        )
        assert bar_len == round(plot_w * v / 4.0), f"bar {i}"
    # y-axis drawn, corners untouched
    assert at(_MARGIN, _MARGIN) == (32, 32, 32)
    assert at(0, 0) == BG and at(w - 1, h - 1) == BG


def test_bar_chart_rejects_bad_input():
    with pytest.raises(ValueError):
        render_bar_chart([])
    with pytest.raises(ValueError):
        render_bar_chart([1.0, -0.5])
    with pytest.raises(ValueError):
        render_bar_chart([1.0] * 200, 480, 320)  # bars can't fit


def test_curve_endpoints_and_axes():
    xs = [0.0, 0.5, 1.0]
    ys = [1.0, 0.8, 0.2]
    w, h, at = _pixels(render_curve(xs, ys, 480, 320))
    x0, y0 = _MARGIN, h - _MARGIN - 1
    plot_w, plot_h = w - 2 * _MARGIN - 1, h - 2 * _MARGIN - 1
    # left end of the curve: (0.0, 1.0) = (xmin, ymax) -> top-left
    assert at(x0, y0 - plot_h) == LINE
    # right end: (1.0, 0.2) = (xmax, ymin) -> bottom-right, on the axis
    assert at(x0 + plot_w, y0) == LINE
    # both axes present
    assert at(x0 + plot_w // 2, y0) == (32, 32, 32)
    assert at(x0, y0 - plot_h // 2) in (LINE, (32, 32, 32))


def test_feature_importance_png_sink(spark, tmp_path):
    df = spark.createDataFrame(
        [("smart_5_delta", 0.8), ("rolling_mean_7", 0.4), ("age", 0.1)],
        "feature string, mean_abs_contribution double",
    )
    out = str(tmp_path / "imp.png")
    pairs = write_feature_importance_png(df, out)
    assert [p[0] for p in pairs] == ["smart_5_delta", "rolling_mean_7", "age"]
    with open(out, "rb") as f:
        w, h, _ = decode_png(f.read())
    assert (w, h) == (480, 320)


def test_feature_importance_cap_enforced(spark, tmp_path):
    df = spark.range(100).selectExpr(
        "CAST(id AS STRING) AS feature",
        "CAST(id AS DOUBLE) AS mean_abs_contribution",
    )
    with pytest.raises(ValueError, match="cap"):
        write_feature_importance_png(df, str(tmp_path / "x.png"), cap=64)


def test_pr_curve_png_sink(spark, tmp_path):
    df = spark.createDataFrame(
        [(0.1, 0.95), (0.5, 0.7), (0.9, 0.3)],
        "recall double, precision double",
    )
    out = str(tmp_path / "pr.png")
    n = write_pr_curve_png(df, out)
    assert n == 3
    with open(out, "rb") as f:
        w, h, rgb = decode_png(f.read())
    # the curve actually drew something non-background, non-axis
    line_px = sum(
        1
        for i in range(0, len(rgb), 3)
        if tuple(rgb[i : i + 3]) == LINE
    )
    assert line_px > 50


def test_feature_importance_query_feeds_png_sink(spark, sf_smoke, tmp_path):
    """End-to-end S8: the mlops_feature_importance query (the SHAP
    summary aggregate) renders through the PNG sink — the reference's
    05_SHAP compute->plot->savefig path, engine-side."""
    from big_data_backblaze_hard_drive_failure_spark.plans import QUERIES

    df = QUERIES["mlops_feature_importance"](spark, sf_smoke)
    out = str(tmp_path / "summary.png")
    pairs = write_feature_importance_png(df, out)
    assert {p[0] for p in pairs} == {"contrib_value", "contrib_is_error"}
    assert all(v >= 0 for _, v in pairs)
    with open(out, "rb") as f:
        w, h, _ = decode_png(f.read())
    assert (w, h) == (480, 320)


def test_show_string_matches_spark_show(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha", None),
            (2, "a-very-long-string-that-truncates", "y"),
            (3, None, "z"),
        ],
        "id int, name string, tag string",
    )
    want = df._jdf.showString(2, 20, False)
    got = show_string(df, n=2, truncate=20)
    assert got.rstrip("\n") == want.rstrip("\n")


def test_show_string_no_truncate_left_aligns(spark):
    df = spark.createDataFrame([(1, "abc")], "id int, s string")
    want = df._jdf.showString(20, 0, False)
    got = show_string(df, n=20, truncate=0)
    assert got.rstrip("\n") == want.rstrip("\n")


def test_show_string_typed_rendering_matches_spark(spark):
    """The cells where naive Python str() diverges from Catalyst's
    cast-to-string: meta characters (showString escapes \\n etc.),
    sub-second timestamps, Java-style double scientific notation and
    Infinity, structs, arrays, and binary hex. Each pinned
    byte-for-byte against Dataset.showString."""
    import datetime as dt

    df = spark.createDataFrame(
        [
            (
                "a\nb\tc",
                dt.datetime(2024, 1, 1, 0, 0, 0, 123456),
                1e-7,
                (1, "x"),
                [1, 2],
                bytearray(b"\x00\xff"),
            ),
            (
                "plain",
                dt.datetime(2024, 6, 1, 12, 30),
                float("inf"),
                (2, "y\nz"),
                [],
                bytearray(b""),
            ),
        ],
        "s string, ts timestamp, d double, "
        "st struct<a:int,b:string>, arr array<int>, bin binary",
    )
    for truncate in (0, 10, 20):
        want = df._jdf.showString(5, truncate, False)
        got = show_string(df, n=5, truncate=truncate)
        assert got.rstrip("\n") == want.rstrip("\n"), f"truncate={truncate}"


def test_show_string_duplicate_and_dotted_columns(spark):
    """Positional projection keeps duplicate and dotted column names
    working — the case where F.col(name) would be ambiguous."""
    base = spark.createDataFrame([(1, 2)], "a int, b int")
    df = base.select(
        base["a"].alias("x.y"), base["b"].alias("n"), base["a"].alias("n")
    )
    want = df._jdf.showString(5, 20, False)
    got = show_string(df, n=5, truncate=20)
    assert got.rstrip("\n") == want.rstrip("\n")
