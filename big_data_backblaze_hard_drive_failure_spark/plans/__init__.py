"""Named query registry — the engine's oracle-checked surface.

Each query is a pure function ``(spark, sf_dir) -> DataFrame``
registered via the ``@query`` decorator, optionally with the
equivalent ANSI SQL for the DuckDB oracle. ``__spark_entry__.py``
exposes these to the driver; ``tests/test_oracle_parity.py`` replays
the same comparison locally.

Conventions (SURVEY.md §7 gotchas):
  * every computed column is aliased identically in Spark and SQL
  * floats rounded on BOTH sides to dodge accumulation-order noise
  * deterministic tie-breakers under every window / limit
  * timestamps reduced to DATE where a raw timestamp isn't the point
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle=None`` means the driver runs
    its weaker rows-only check (sampling / non-SQL-expressible ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    from . import reference  # noqa: F401
    from . import star  # noqa: F401
    from . import datapipe  # noqa: F401
    from . import mlops  # noqa: F401
    from . import io  # noqa: F401


_load_all()
