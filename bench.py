"""Per-query benchmark over the full registered surface.

Runs every query in the registry at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``, forcing full
plan execution through the no-op sink (no driver-side collect, so the
measurement is executor work, not result transfer). Prints exactly ONE
JSON line on stdout:

    {"metric": "sum_query_sec", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}

All progress/log output goes to stderr.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from big_data_backblaze_hard_drive_failure_spark.plans import QUERIES
    from big_data_backblaze_hard_drive_failure_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup on the flagship query (not timed)
    QUERIES["ref_rolling_features"](spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    # Python-crossing warmup (not timed): first use of the Arrow
    # pandas_udf / UDTF serializers pays worker-spawn + pyarrow import
    # (~2-4s); run them once on the smallest fixture so per-query
    # timings measure the operator, not interpreter startup
    smoke_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    warm_dir = smoke_dir if os.path.isdir(smoke_dir) else sf_dir
    for warm in ("datapipe_chunk_udtf", "mlops_score_pandas_udf"):
        QUERIES[warm](spark, warm_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    timings: dict[str, float] = {}
    for name in sorted(QUERIES):
        fn = QUERIES[name]
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            timings[name] = round(dt, 3)
            log(f"{name}: {dt:.3f}s")
        except Exception as exc:  # keep benching even if one query dies
            timings[name] = -1.0
            log(f"{name}: FAILED {type(exc).__name__}: {exc}")

    ok = {k: v for k, v in timings.items() if v >= 0}
    total = round(sum(ok.values()), 3)

    # regression table vs the last committed local baseline: surfaces
    # per-query slowdowns >1.5x (and >0.2s absolute, to skip noise on
    # sub-100ms queries) so each round gets a real prev-round diff
    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL_BASELINE.json"
    )
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            prev_all = json.load(f)
        prev = prev_all.get("queries", {})
        if prev_all.get("sf") != sf:
            log(
                f"baseline sf={prev_all.get('sf')} != run sf={sf}; "
                "skipping regression compare"
            )
            prev = {}
        regressions = [
            (name, prev[name], t)
            for name, t in ok.items()
            if name in prev
            and prev[name] > 0
            and t > prev[name] * 1.5
            and t - prev[name] > 0.2
        ]
        if regressions:
            log("=== PER-QUERY REGRESSIONS vs committed baseline (>1.5x) ===")
            for name, was, now_t in sorted(
                regressions, key=lambda r: r[2] - r[1], reverse=True
            ):
                log(f"  {name}: {was:.3f}s -> {now_t:.3f}s ({now_t / was:.1f}x)")
        else:
            log("no per-query regressions vs committed baseline")
    print(
        json.dumps(
            {
                "metric": "sum_query_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "n_queries": len(timings),
                "n_failed": len(timings) - len(ok),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
