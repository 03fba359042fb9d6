"""PySpark-native analytics engine with the capabilities of
``SinghNayanKumar/Big-Data-Backblaze-Hard-Drive-Failure`` (reference read-only at
/root/reference/), rebuilt Spark-first.

The reference is an 8-script daily-batch pipeline over Backblaze SMART
telemetry (see SURVEY.md). This package re-expresses its full operator
surface — ingestion, projection/cast, per-entity windowing (lead label,
rolling stats), chronological splits, downsampling, scoring, alerting,
ops metrics — as a library of composable, testable PySpark query
builders, and extends it with the large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns)
designed for 100 TB scale.

Layout:
    session    — SparkSession factory (AQE on, Arrow on, UTC)
    sources    — table registry over parquet directories
    functions  — reusable column expressions (vectors, text, hashing)
    operators  — composable DataFrame -> DataFrame transforms
    plans      — named query builders, the oracle-checked surface
    ml         — chronological-split / train / score / threshold / alert
    streaming  — Structured Streaming twin of the batch feature pipeline
"""

__version__ = "0.1.0"
