"""Scale-curve evidence: time representative queries at sf0.001,
sf0.01 and sf0.1 (100x data spread) and report the per-query growth
ratio between the two decades.

A query whose plan is linear in the input (scan + map-side work +
key-partitioned shuffle) should show time growing far slower than
10x per decade at these sizes (fixed job-scheduling overhead
dominates small SFs) and certainly not faster. A super-linear ratio
flags a plan that would not survive the 100 TB target — that is what
this script exists to catch. Output: markdown table on stdout; run
``python scripts/scaling_curve.py [names_csv]``.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# One per cost family: scan-agg, shuffle-join, window, prefix-sum rank
# statistic, LSH near-dup, text map, Arrow python, iterative fixpoint,
# python-datasource IO.
DEFAULT = [
    "star_pricing_summary",          # scan + group-by agg
    "star_revenue_by_nation",        # multi-join star
    "tpch_q18_large_volume_customer",  # join + having + topk
    "ref_rolling_features",          # partitioned windows
    "star_gini_spend",               # distributed prefix-sum rank stat
    "datapipe_lsh_buckets",          # minhash + band explode group-by
    "datapipe_neardup_components",   # iterative fixpoint
    "datapipe_lang_id",              # pure JVM text map
    "datapipe_text_stats",           # text aggregate
    "mlops_score_pandas_udf",        # Arrow batch python
    "datapipe_exact_dedup",          # sha256 group-by
    "io_avro_roundtrip",             # python datasource write+read
]

SF_DIRS = [
    ("/root/testdata/sf0.001", 0.001),
    ("/root/testdata/sf0.01", 0.01),
    ("/root/testdata/sf0.1", 0.1),
]

# One more decade when scripts/gen_sf1.py has been run (10x key-shifted
# replication of sf0.1 into the git-ignored scratch dir) — the round-8
# ask: measure, not argue, that the heavy families survive sf1.
_SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "_scratch", "sf1",
)
if os.path.isdir(_SF1):
    SF_DIRS.append((_SF1, 1.0))


def main() -> int:
    from big_data_backblaze_hard_drive_failure_spark.plans import QUERIES
    from big_data_backblaze_hard_drive_failure_spark.session import get_spark

    names = sys.argv[1].split(",") if len(sys.argv) > 1 else DEFAULT
    spark = get_spark(app_name="scaling_curve")
    spark.sparkContext.setLogLevel("ERROR")

    # warm: JVM codegen + python worker spawn, so sf0.001 numbers are
    # not dominated by first-use costs
    for warm in ("ref_rolling_features", "mlops_score_pandas_udf"):
        QUERIES[warm](spark, SF_DIRS[0][0]).write.format("noop").mode(
            "overwrite"
        ).save()

    def run(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(2):  # min-of-2: co-tenant noise floor
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        return best

    hdr_sf = " | ".join(f"sf{sf:g}" for _, sf in SF_DIRS)
    hdr_rx = " | ".join(
        f"x(sf{SF_DIRS[i - 1][1]:g}→sf{SF_DIRS[i][1]:g})"
        for i in range(1, len(SF_DIRS))
    )
    print(f"| query | {hdr_sf} | {hdr_rx} |")
    print("|---" * (1 + len(SF_DIRS) + len(SF_DIRS) - 1) + "|")
    for name in names:
        ts = [run(name, d) for d, _ in SF_DIRS]
        ratios = [
            ts[i] / ts[i - 1] if ts[i - 1] > 0 else float("nan")
            for i in range(1, len(ts))
        ]
        cells = " | ".join(f"{t:.2f}s" for t in ts)
        rcells = " | ".join(f"{r:.1f}x" for r in ratios)
        print(f"| {name} | {cells} | {rcells} |", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
