"""Static-broadcast audit at scale: plan every registered query against
a LARGE fixture (default ``_scratch/sf1`` — build it with
``scripts/gen_sf1.py``) and report each BroadcastExchange whose
subtree's TOPMOST aggregate has non-empty grouping keys, i.e. whose
broadcast cardinality is the aggregate's key domain rather than a
global reduction.

Why this exists (round 10): Catalyst's size estimates for post-explode
frames, pruned-column scans, and cold caches come out far below
reality, and a statically-planned BroadcastHashJoin executes its build
EAGERLY — if the hinted-or-estimated frame actually scales with the
data, the build OOMs before AQE ever sees runtime stats. The
asymmetry that matters: AQE can UPGRADE a static shuffle join to a
broadcast join from accurate runtime stats, but cannot demote an
already-chosen broadcast. So any join-back of an aggregate keyed by a
corpus-scaling domain (token/shingle vocabulary, per-user / per-doc /
per-customer frames, band keys, chunk contents) must carry an explicit
shuffle hint; static broadcast is reserved for frames bounded by
construction (dimension tables, global/1-row reductions, fixed bin /
event-type / calendar keys, top-k limits, query-term filters).

This cannot be a pytest sweep: the signal ("estimate small, truth
big") only exists at scale — at sf0.001 every broadcast is correct.
Run it each round after registry changes; triage any NEW name against
the bounded-key list in the round-10 SCALE.md section.

Usage: python scripts/broadcast_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def indent(line: str) -> int:
    return len(re.match(r"[\s:+\-*]*", line).group(0))


def broadcast_agg_keys(plan_string: str) -> list[str]:
    """Keys of the topmost non-global aggregate under each
    BroadcastExchange (empty-key aggregates are <=1-row reductions —
    bounded by construction, skipped)."""
    lines = plan_string.splitlines()
    finds: list[str] = []
    for i, ln in enumerate(lines):
        if "BroadcastExchange" not in ln:
            continue
        d = indent(ln)
        for j in range(i + 1, len(lines)):
            if indent(lines[j]) <= d and lines[j].strip():
                break
            # TakeOrdered/Limit bound the frame regardless of what
            # sits beneath them
            if re.search(r"TakeOrderedAndProject|GlobalLimit", lines[j]):
                break
            m = re.search(r"HashAggregate\(keys=\[([^\]]*)\]", lines[j])
            if m:
                if m.group(1).strip():
                    finds.append(m.group(1)[:80])
                break
    return sorted(set(finds))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "_scratch", "sf1",
    )
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from big_data_backblaze_hard_drive_failure_spark.operators.staging import (
        release_stage_boundaries,
    )
    from big_data_backblaze_hard_drive_failure_spark.plans import QUERIES

    for name in sorted(QUERIES):
        release_stage_boundaries()
        try:
            s = (
                QUERIES[name](spark, sf)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as ex:  # noqa: BLE001 — audit, not execution
            print(f"{name} PLANERR {str(ex).splitlines()[0][:60]}")
            continue
        keys = broadcast_agg_keys(s)
        if keys:
            print(f"{name} || {' ;; '.join(keys)}")
    print("DONE")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
