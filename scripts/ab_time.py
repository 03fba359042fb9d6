"""Isolated per-query timing: min over N noop-sink runs per query.

Usage: python scripts/ab_time.py [-n 3] <query> [<query> ...]
Prints "name: min_sec (runs...)" per query. Uses $SPARK_GRAFT_SF_DIR
(default sf0.1) and $SPARK_GRAFT_CPUS like bench.py, warms the same
Python eval types so the first timed query isn't taxed, and (round 14,
matching bench.py) releases stage-boundary caches + clears the SQL
cache before every timed run so each run pays its own persists.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

args = sys.argv[1:]
n = 3
if args and args[0] == "-n":
    n = int(args[1])
    args = args[2:]
names = args

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from big_data_backblaze_hard_drive_failure_spark.plans import QUERIES
from big_data_backblaze_hard_drive_failure_spark.session import get_spark

spark = get_spark(app_name="ab-time")
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
    QUERIES[warm](spark, warm_dir).write.format("noop").mode("overwrite").save()

from big_data_backblaze_hard_drive_failure_spark.operators.staging import (
    release_stage_boundaries,
)

for name in names:
    runs = []
    for _ in range(n):
        release_stage_boundaries()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    print(
        f"{name}: {min(runs):.3f}s  ({', '.join(f'{r:.3f}' for r in runs)})",
        flush=True,
    )
