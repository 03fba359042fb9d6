"""CLI: run the reference's full pipeline end-to-end on the engine.

Usage: python scripts/run_pipeline.py [sf_dir] [workdir]
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    workdir = sys.argv[2] if len(sys.argv) > 2 else "_scratch/pipeline"

    from big_data_backblaze_hard_drive_failure_spark.pipeline import (
        run_reference_pipeline,
    )
    from big_data_backblaze_hard_drive_failure_spark.session import get_spark

    spark = get_spark(app_name="reference-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    summary = run_reference_pipeline(spark, sf_dir, workdir)
    print(json.dumps(summary, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
