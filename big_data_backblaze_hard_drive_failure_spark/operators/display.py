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
    if 0 < truncate < len(s):
        return s[:truncate] if truncate < 4 else s[: truncate - 3] + "..."
    return s


def show_string(df: DataFrame, n: int = 20, truncate: int = 20) -> str:
    """Spark-``show``-shaped grid over ``take(n + 1)`` rows (the +1
    detects whether the footer is needed without a count job)."""
    rows = df.take(n + 1)
    more = len(rows) > n
    rows = rows[:n]
    header = list(df.columns)
    cells = [[_cell(v, truncate) for v in row] for row in rows]
    # Spark's showString enforces a minimum column width of 3
    widths = [
        max(3, len(h), *[len(r[i]) for r in cells]) if cells
        else max(3, len(h))
        for i, h in enumerate(header)
    ]
    sep = "+" + "+".join("-" * w for w in widths) + "+"

    def fmt(vals: "list[str]") -> str:
        pad = (
            (lambda s, w: s.rjust(w)) if truncate > 0
            else (lambda s, w: s.ljust(w))
        )
        return "|" + "|".join(pad(v, w) for v, w in zip(vals, widths)) + "|"

    lines = [sep, fmt(header), sep, *(fmt(r) for r in cells), sep]
    if more:
        lines.append(f"only showing top {n} row" + ("s" if n != 1 else ""))
    return "\n".join(lines) + "\n"
