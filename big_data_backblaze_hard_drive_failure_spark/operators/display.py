"""Truncated top-N display (reference O5).

The reference calls ``df.show(5)`` as its inspection step
(/root/reference/scripts/02_label_generation.py:138,152,
03_feature_engineering.py:165).  ``show`` is a driver-side ACTION with
a built-in bound — Spark executes ``take(n + 1)``, so only n+1 rows
ever cross to the driver regardless of table size; that bound is the
whole reason it is safe at 100 TB while ``collect()`` is not.

``show_string`` reproduces Spark's grid exactly (same truncation rule,
same alignment rule, same footer) but RETURNS the string instead of
printing, which is what an engine embedded in a pipeline needs: the
caller decides whether it goes to a log, a notebook, or a test
assertion.  Behavior matched to the public ``Dataset.showString``
contract: cells longer than ``truncate`` keep the first
``truncate - 3`` chars + ``"..."`` (or a bare prefix when truncate <
4); cells are RIGHT-aligned when truncating, LEFT-aligned when
``truncate=0``; ``None`` renders as ``NULL``.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame


def _cell(v: object, truncate: int) -> str:
    if v is None:
        s = "NULL"
    elif isinstance(v, (bytes, bytearray)):
        s = "[" + " ".join(f"{b:02X}" for b in v) + "]"
    elif isinstance(v, bool):
        s = "true" if v else "false"
    elif isinstance(v, dt.datetime):
        s = v.strftime("%Y-%m-%d %H:%M:%S")
    elif isinstance(v, list):
        s = "[" + ", ".join(_cell(x, 0) for x in v) + "]"
    elif isinstance(v, dict):
        s = "{" + ", ".join(
            f"{_cell(k, 0)} -> {_cell(x, 0)}" for k, x in v.items()
        ) + "}"
    else:
        s = str(v)
    u16len = sum(2 if ord(c) > 0xFFFF else 1 for c in s)
    if 0 < truncate < u16len:
        return (
            _u16_truncate(s, truncate)
            if truncate < 4
            else _u16_truncate(s, truncate - 3) + "..."
        )
    return s


# Spark's Dataset.showString measures cells in DISPLAY width: East
# Asian full-width characters count as 2 columns (the fullWidthRegex
# ranges in Dataset.scala, verbatim)
_FULL_WIDTH_RANGES = (
    (0x1100, 0x115F), (0x2E80, 0xA4CF), (0xAC00, 0xD7A3),
    (0xF900, 0xFAFF), (0xFE10, 0xFE19), (0xFE30, 0xFE6F),
    (0xFF00, 0xFF60), (0xFFE0, 0xFFE6),
)


def _display_width(s: str) -> int:
    # JVM String.length counts UTF-16 code units (astral chars = 2);
    # the full-width ranges are all BMP, so astral chars never also
    # match the regex — width = UTF-16 length + full-width count
    return sum(2 if ord(ch) > 0xFFFF else 1 for ch in s) + sum(
        1
        for ch in s
        if any(lo <= ord(ch) <= hi for lo, hi in _FULL_WIDTH_RANGES)
    )


def _u16_truncate(s: str, units: int) -> str:
    """``String.substring(0, units)`` in UTF-16 code units — including
    the JVM artifact of splitting a surrogate pair (the leftover high
    surrogate survives via surrogatepass, exactly as showString emits
    it)."""
    b = s.encode("utf-16-be", "surrogatepass")
    return b[: units * 2].decode("utf-16-be", "surrogatepass")


def show_string(df: DataFrame, n: int = 20, truncate: int = 20) -> str:
    """Spark-``show``-shaped grid over ``take(n + 1)`` rows (the +1
    detects whether the footer is needed without a count job)."""
    rows = df.take(n + 1)
    more = len(rows) > n
    rows = rows[:n]
    header = list(df.columns)
    cells = [[_cell(v, truncate) for v in row] for row in rows]
    # column width = max DISPLAY width, Spark's minimum of 3
    widths = [
        max(3, _display_width(h), *[_display_width(r[i]) for r in cells])
        if cells else max(3, _display_width(h))
        for i, h in enumerate(header)
    ]
    sep = "+" + "+".join("-" * w for w in widths) + "+"

    def fmt(vals: "list[str]") -> str:
        def pad(s: str, w: int) -> str:
            fill = " " * (w - _display_width(s))
            return (fill + s) if truncate > 0 else (s + fill)

        return "|" + "|".join(pad(v, w) for v, w in zip(vals, widths)) + "|"

    lines = [sep, fmt(header), sep, *(fmt(r) for r in cells), sep]
    if more:
        lines.append(f"only showing top {n} row" + ("s" if n != 1 else ""))
    return "\n".join(lines) + "\n"
