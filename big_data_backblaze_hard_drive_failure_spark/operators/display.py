"""Truncated top-N display (reference O5).

The reference calls ``df.show(5)`` as its inspection step
(/root/reference/scripts/02_label_generation.py:138,152,
03_feature_engineering.py:165).  ``show`` is a driver-side ACTION with
a built-in bound — Spark executes ``take(n + 1)``, so only n+1 rows
ever cross to the driver regardless of table size; that bound is the
whole reason it is safe at 100 TB while ``collect()`` is not.

``show_string`` reproduces ``Dataset.showString`` byte-for-byte but
RETURNS the string instead of printing, which is what an engine
embedded in a pipeline needs: the caller decides whether it goes to a
log, a notebook, or a test assertion.  Faithfulness comes from doing
what Spark's ``getRows`` does rather than re-implementing value
rendering: every non-binary column is CAST TO STRING in the JVM (so
timestamps keep microseconds, doubles print Java-style ``1.0E-7``,
structs print ``{1, x}`` — Catalyst's cast is the single source of
truth), then the driver-side steps are mechanical: NULL for nulls,
``[AA BB]`` hex for binary, meta-character escaping (``\\n`` etc.),
UTF-16-unit truncation (first ``truncate - 3`` units + ``"..."``, no
ellipsis under 4), display-width padding (full-width East Asian chars
count 2), right-aligned when truncating, left-aligned at
``truncate=0``, minimum column width 3, top-N footer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# SparkStringUtils.escapeMetaCharacters, verbatim
_META = {
    "\n": "\\n", "\r": "\\r", "\t": "\\t", "\f": "\\f",
    "\b": "\\b", "\x0b": "\\v", "\x07": "\\a",
}

# Dataset.scala's fullWidthRegex ranges, verbatim: these count as 2
# display columns (all BMP, so they never overlap the astral rule)
_FULL_WIDTH_RANGES = (
    (0x1100, 0x115F), (0x2E80, 0xA4CF), (0xAC00, 0xD7A3),
    (0xF900, 0xFAFF), (0xFE10, 0xFE19), (0xFE30, 0xFE6F),
    (0xFF00, 0xFF60), (0xFFE0, 0xFFE6),
)


def _escape_meta(s: str) -> str:
    return "".join(_META.get(ch, ch) for ch in s)


def _u16_len(s: str) -> int:
    """JVM ``String.length``: UTF-16 code units (astral chars = 2)."""
    return sum(2 if ord(ch) > 0xFFFF else 1 for ch in s)


def _display_width(s: str) -> int:
    return _u16_len(s) + sum(
        1
        for ch in s
        if any(lo <= ord(ch) <= hi for lo, hi in _FULL_WIDTH_RANGES)
    )


def _u16_truncate(s: str, units: int) -> str:
    """``String.substring(0, units)`` in UTF-16 code units — including
    the JVM artifact of splitting a surrogate pair: the leftover high
    surrogate is unencodable, and the JVM's UTF-8 writer (what show()
    actually prints through, and what py4j transports) replaces it
    with ``?`` — so we do too."""
    b = s.encode("utf-16-be", "surrogatepass")
    t = b[: units * 2].decode("utf-16-be", "surrogatepass")
    if t and 0xD800 <= ord(t[-1]) <= 0xDBFF:
        t = t[:-1] + "?"
    return t


def _cell(v: object, truncate: int) -> str:
    if v is None:
        s = "NULL"
    elif isinstance(v, (bytes, bytearray)):
        s = "[" + " ".join(f"{b:02X}" for b in v) + "]"
    else:
        # always a string here: the JVM cast already rendered the value
        s = _escape_meta(str(v))
    if 0 < truncate < _u16_len(s):
        return (
            _u16_truncate(s, truncate)
            if truncate < 4
            else _u16_truncate(s, truncate - 3) + "..."
        )
    return s


def show_string(df: DataFrame, n: int = 20, truncate: int = 20) -> str:
    """Spark-``show``-shaped grid over ``take(n + 1)`` rows (the +1
    detects whether the footer is needed without a count job)."""
    # getRows' move: cast everything except binary to string IN THE
    # JVM, so Catalyst owns value rendering. The positional toDF
    # rename first makes duplicate/dotted column names unambiguous
    # (df[i] and F.col both resolve BY NAME).
    from pyspark.sql import functions as F

    renamed = df.toDF(*[f"c{i}" for i in range(len(df.columns))])
    projected = renamed.select(
        [
            F.col(f"c{i}")
            if isinstance(f.dataType, T.BinaryType)
            else F.col(f"c{i}").cast("string")
            for i, f in enumerate(df.schema.fields)
        ]
    )
    rows = projected.take(n + 1)
    more = len(rows) > n
    rows = rows[:n]
    # headers are escaped but never truncated (getRows truncates data
    # cells only)
    header = [_escape_meta(c) for c in df.columns]
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
