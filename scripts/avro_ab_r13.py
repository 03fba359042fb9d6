"""Round-13 watch-item A/B (verdict ask #3), chi-square-precedent
discipline: interleaved reps in ONE session, min-of-N, sibling
comparison, first-rep-vs-repeat split.

Watch item: io_avro_roundtrip — 3.25 s in BENCH_r12 vs its 1.154 s
committed minimum (2.82x, the round's only >=2x and the entire bench
sum regression vs r11).

Hypotheses:
  (a) pure-Python Avro codec plan cost (sources/avro_py.py) grew, or
  (b) host I/O phase (all io_* siblings elevated together), or
  (c) the round-12 worker-cache class AGAIN: io_avro_roundtrip is the
      registry's ONLY Python-DataSource query, and Spark caches
      Python workers per EVAL TYPE — bench.py warms 7 Arrow eval
      types but NOT the Python DataSource plan/write/read workers, so
      avro pays the full spawn + pickle-import tax once per bench
      process. Signature: rep0 >> rep1..N within one session while
      parquet/csv siblings sit at their minima.

Usage: python scripts/avro_ab_r13.py [sf_dir]
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

spark = get_spark(app_name="avro_ab_r13")
spark.sparkContext.setLogLevel("ERROR")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timeit(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


# Arrow eval-type warmup exactly as bench.py does it (so this session
# reproduces the bench environment MINUS the missing DataSource warm)
smoke = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
for w in (
    "datapipe_chunk_udtf",
    "mlops_score_pandas_udf",
    "datapipe_audio_decode",
    "datapipe_arrow_native_stats",
    "ref_grouped_zscore",
    "ref_grouped_arrow_stats",
    "ref_grouped_agg_udaf",
):
    noop(QUERIES[w](spark, smoke))

names = ("io_avro_roundtrip", "io_parquet_roundtrip", "io_csv_roundtrip")
times: dict[str, list[float]] = {n: [] for n in names}
for rep in range(REPS):
    for n in names:
        t = timeit(lambda: noop(QUERIES[n](spark, SF)))
        times[n].append(t)
        print(f"rep{rep} {n}: {t:.3f}s")

for n in names:
    ts = times[n]
    print(
        f"{n}: first={ts[0]:.3f}s min_rest={min(ts[1:]):.3f}s "
        f"ratio_first_vs_rest={ts[0] / min(ts[1:]):.2f}"
    )
