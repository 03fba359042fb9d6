"""Round-12 watch-item A/B (verdict ask #2), chi-square-precedent
discipline: interleaved reps in ONE session, min-of-N, sibling
comparison.

Watch items (both >=2x vs their BENCH_LOCAL_BASELINE minima in the
round-11 driver bench):

  * mlops_gbt_contributions (2.35x, 1.61s vs 0.686 min). Hypothesis:
    FIT PLACEMENT, not plan cost. ``_gbt_forest`` memoizes the fitted
    forest per (process, sf_dir); bench iterates ``sorted(QUERIES)``,
    so *contributions* (alphabetically before *score*) always pays
    the one-time driver-side MLlib fit in a bench process, while the
    0.686 minimum was merged from a session where the forest was
    already warm. This script times the fit alone, then both queries
    warm, interleaved — if cold ~= fit + warm, the watch item is
    attribution, not regression.

  * datapipe_audio_decode (2.39x, 0.73s vs 0.306 min). Map-only Arrow
    decode, no plan to blame — interleave vs its same-shape sibling
    datapipe_image_phash_dedup: both elevated => host phase; audio
    alone elevated => something real.

Usage: python scripts/watch_ab_r12.py [sf_dir]
"""
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = 6

from big_data_backblaze_hard_drive_failure_spark.plans import QUERIES  # noqa: E402
from big_data_backblaze_hard_drive_failure_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="watch_ab_r12")
spark.sparkContext.setLogLevel("ERROR")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timeit(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


# Python-worker / codegen warmup on the smallest fixture (untimed),
# same discipline as bench.py
smoke = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
for w in ("datapipe_image_phash_dedup", "mlops_score_pandas_udf"):
    noop(QUERIES[w](spark, smoke))

best: dict[str, float] = {}

# ---- Item 1: gbt fit attribution ------------------------------------
# Fit ALONE, on the cold memo (exactly once per process by design).
from big_data_backblaze_hard_drive_failure_spark.plans.mlops import (  # noqa: E402
    _GBT_FORESTS,
    _gbt_forest,
)

fit_s = timeit(lambda: _gbt_forest(spark, SF))
assert os.path.realpath(SF) in _GBT_FORESTS
print(f"gbt_fit_cold: {fit_s:.3f}s (driver-side MLlib fit + extract)")

# Both queries WARM (forest memoized), interleaved min-of-REPS.
for rep in range(REPS):
    for name in ("mlops_gbt_contributions", "mlops_gbt_score"):
        t = timeit(lambda: noop(QUERIES[name](spark, SF)))
        best[name] = min(best.get(name, float("inf")), t)
        print(f"rep{rep} {name}: {t:.3f}s")

# ---- Item 2: audio decode vs same-shape sibling ----------------------
for rep in range(REPS):
    for name in ("datapipe_audio_decode", "datapipe_image_phash_dedup"):
        t = timeit(lambda: noop(QUERIES[name](spark, SF)))
        best[name] = min(best.get(name, float("inf")), t)
        print(f"rep{rep} {name}: {t:.3f}s")

print("---- minima ----")
print(f"gbt_fit_cold: {fit_s:.3f}")
for k, v in sorted(best.items()):
    print(f"{k}: {v:.3f}")
print(
    "cold-contributions prediction (fit + warm): "
    f"{fit_s + best['mlops_gbt_contributions']:.3f}"
)
