"""Micro-benchmark: the three model-scoring execution paths.

Quantifies the claim in ml/scorer.py — typed row-wise UDF (the
reference's approach, pickling per row) vs Arrow-batched pandas_udf
vs pure JVM column expression — on the same data and model.

Usage: python scripts/bench_scoring_paths.py [sf_dir|rows:N] [repeats]
``rows:N`` benchmarks on an N-row generated feature frame instead of
the fixture (measurement load only — correctness always runs on the
fixtures). Prints one JSON line with per-path seconds (best of N).
"""

from __future__ import annotations

import json
import sys
import time


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from big_data_backblaze_hard_drive_failure_spark.ml.scorer import (
        score_arrow_udf,
        score_column,
        score_pandas_udf,
        score_row_udf,
    )
    from big_data_backblaze_hard_drive_failure_spark.plans.mlops import (
        MODEL,
        _features,
    )
    from big_data_backblaze_hard_drive_failure_spark.session import get_spark

    spark = get_spark(app_name="bench-scoring")
    spark.sparkContext.setLogLevel("ERROR")
    if sf_dir.startswith("rows:"):
        from pyspark.sql import functions as F

        n = int(sf_dir.split(":", 1)[1])
        base = spark.range(n).select(
            (F.round(F.pmod(F.col("id") * 37, 25000) / 100.0, 2)).alias(
                "value"
            ),
            (F.pmod(F.col("id"), 5) == 0).cast("double").alias("is_error"),
        )
    else:
        base = _features(spark, sf_dir)
    base.persist().count()  # isolate scoring cost from the scan

    paths = {
        "column_expr": lambda df: df.withColumn(
            "p", score_column(MODEL)
        ),
        "pandas_udf": lambda df: df.withColumn(
            "p", score_pandas_udf(spark, MODEL)(*MODEL.features)
        ),
        "arrow_udf": lambda df: df.withColumn(
            "p", score_arrow_udf(MODEL)(*MODEL.features)
        ),
        "row_udf": lambda df: df.withColumn(
            "p", score_row_udf(MODEL)(*MODEL.features)
        ),
    }
    out = {}
    for name, build in paths.items():
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            build(base).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
        print(f"{name}: {best:.3f}s", file=sys.stderr)
    base.unpersist()
    out["row_over_pandas"] = round(out["row_udf"] / out["pandas_udf"], 1)
    out["pandas_over_column"] = round(
        out["pandas_udf"] / out["column_expr"], 1
    )
    print(json.dumps({"metric": "scoring_paths_sec", "sf_dir": sf_dir, **out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
