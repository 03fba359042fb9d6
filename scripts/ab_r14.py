"""Round-14 interleaved same-session A/B over the touched query paths.

For each (query, toggle-site) pair, runs the OLD plan (site listed in
SPARK_GRAFT_AB_OFF) and the NEW plan (default) alternately in ONE
session — A B A B A B — taking the MIN per variant, the only change
evidence this host's documented ±30% session drift accepts. Stage
caches + the SQL cache are released before every run (the round-14
bench.py methodology), so each run pays its own persists.

Usage: python scripts/ab_r14.py [-n 3] [pair ...]
  pair = query=site   (default: the full round-14 touch list)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The KEPT round-14 sites (losing variants were deleted from the
# query code after measurement — their numbers live in
# OPTIMIZATION_r14.md: woe_stage 0.81x, woe_derive 0.83x, loo_stage
# 0.76x, did_stage 0.87x, novelty_stage 0.87x, cdc_stage 0.71x,
# km_single_stage 0.89x, km_narrow 0.92x).
PAIRS = [
    ("mlops_pr_curve", "pr_curve_narrow_stage"),
    ("star_pagerank_nations", "pr_single_cut"),
    ("datapipe_cosine_neardup", "cosine_neardup_stage"),
    ("datapipe_neardup_components", "cc_fused"),
    ("mlops_propensity_match", "propensity_ev_stage"),
    ("star_mad_robust_stats", "mad_stage"),
    ("mlops_alert_confusion", "alert_narrow_stage"),
]


def main() -> int:
    args = sys.argv[1:]
    n = 3
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    pairs = (
        [tuple(a.split("=", 1)) for a in args] if args else PAIRS
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from big_data_backblaze_hard_drive_failure_spark.operators.staging import (
        release_stage_boundaries,
    )
    from big_data_backblaze_hard_drive_failure_spark.plans import QUERIES
    from big_data_backblaze_hard_drive_failure_spark.session import get_spark

    spark = get_spark(app_name="ab-r14")
    spark.sparkContext.setLogLevel("ERROR")

    smoke = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    warm_dir = smoke if os.path.isdir(smoke) else sf_dir
    for warm in (
        "datapipe_chunk_udtf",
        "mlops_score_pandas_udf",
        "datapipe_audio_decode",
        "datapipe_arrow_native_stats",
        "ref_grouped_zscore",
        "ref_grouped_arrow_stats",
        "ref_grouped_agg_udaf",
        "io_avro_roundtrip",
    ):
        QUERIES[warm](spark, warm_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    def run(name: str, site_off: str | None) -> float:
        if site_off:
            os.environ["SPARK_GRAFT_AB_OFF"] = site_off
        else:
            os.environ.pop("SPARK_GRAFT_AB_OFF", None)
        release_stage_boundaries()
        spark.catalog.clearCache()
        label = "off" if site_off else "on"
        spark.sparkContext.setJobDescription(f"ab:{name}:{label}")
        try:
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            return time.perf_counter() - t0
        finally:
            spark.sparkContext.setJobDescription(None)

    for name, site in pairs:
        # one untimed warm pass per variant so first-plan JIT/codegen
        # noise doesn't land on whichever variant runs first
        run(name, site)
        run(name, None)
        offs, ons = [], []
        for _ in range(n):
            offs.append(run(name, site))
            ons.append(run(name, None))
        o, w = min(offs), min(ons)
        print(
            f"{name} [{site}]: off {o:.3f}s -> on {w:.3f}s "
            f"({o / w:.2f}x)  off=({', '.join(f'{x:.3f}' for x in offs)}) "
            f"on=({', '.join(f'{x:.3f}' for x in ons)})",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
