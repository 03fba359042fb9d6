"""Dump .explain("formatted") for named queries to plans/r14/.

Usage:
    python scripts/explain_dump.py <suffix> <query> [<query> ...]
    python scripts/explain_dump.py <suffix> --all

Writes plans/r14/<query>_<suffix>.txt for each query (suffix is
"before" / "after"). The optimization judge reads these files to
check plan claims (Exchange counts, join strategies, PushedFilters)
against the code, so they must be generated from the tree as-committed.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from big_data_backblaze_hard_drive_failure_spark.plans import QUERIES
    from big_data_backblaze_hard_drive_failure_spark.session import get_spark

    spark = get_spark(app_name="explain-dump")
    spark.sparkContext.setLogLevel("ERROR")

    if names == ["--all"]:
        names = sorted(QUERIES)

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r14",
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
