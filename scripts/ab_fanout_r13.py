"""Interleaved A/B of the single-split scan fan-out, one session.

For each query: alternate OFF/ON x rounds, report per-variant MIN.
Host wall-clock drifts minute-to-minute (co-tenancy), so only
interleaved same-session pairs are valid evidence.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROUNDS = 3
names = sys.argv[1:]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from big_data_backblaze_hard_drive_failure_spark.plans import QUERIES
from big_data_backblaze_hard_drive_failure_spark.session import get_spark
from big_data_backblaze_hard_drive_failure_spark.operators.staging import (
    release_stage_boundaries,
)

spark = get_spark(app_name="ab-fanout")
spark.sparkContext.setLogLevel("ERROR")

smoke = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
warm_dir = smoke if os.path.isdir(smoke) else sf_dir
for warm in (
    "datapipe_chunk_udtf", "mlops_score_pandas_udf", "datapipe_audio_decode",
    "datapipe_arrow_native_stats", "ref_grouped_zscore",
    "ref_grouped_arrow_stats", "ref_grouped_agg_udaf", "io_avro_roundtrip",
):
    QUERIES[warm](spark, warm_dir).write.format("noop").mode("overwrite").save()


def run(name):
    release_stage_boundaries()  # no cross-variant cache leakage
    t0 = time.perf_counter()
    QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


tot_off = tot_on = 0.0
for name in names:
    offs, ons = [], []
    for _ in range(ROUNDS):
        os.environ["SPARK_GRAFT_NO_FANOUT"] = "1"
        offs.append(run(name))
        os.environ.pop("SPARK_GRAFT_NO_FANOUT", None)
        ons.append(run(name))
    off, on = min(offs), min(ons)
    tot_off += off
    tot_on += on
    print(f"{name}: off={off:.3f} on={on:.3f}  ({off/on:.2f}x)", flush=True)
print(f"TOTAL: off={tot_off:.2f} on={tot_on:.2f} ({tot_off/tot_on:.2f}x)")
