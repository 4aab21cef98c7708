"""Executed-scan audit: catch CTE-inlining / re-derivation blowups.

Round-12 lesson: Spark INLINES repeated CTE references, so a shared
WITH text that DuckDB materializes correctly can silently re-derive
its base scans exponentially on the Spark side —
misra_gries_mergeable's 4-stage fold exploded to 112 EXECUTED scans of
the documents table before its fix. Plan-STRING FileScan counts are
only a tripwire (cached-memo subtrees inflate the text without
re-executing: greedy_coverage_select prints ~772 FileScan strings and
executes zero); the verdict is the EXECUTED plan's scan nodes after an
action.

This script runs every batch entry at sf0.001, walks the executed
physical plan for FileSourceScan/BatchScan nodes (cached subtrees are
invisible there — exactly right), and flags entries whose executed
scan-node count exceeds 2× the number of distinct source tables an
entry could legitimately read (a loose bound: unions/self-joins read a
table a few times by design; re-derivation reads it tens of times).

Run:  python scripts/scan_audit.py [sf_dir] [flag_factor]
Takes ~5 min (every entry executes once). Exit code 1 if any entry is
flagged — wire it into a round close when plans changed.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = 10  # region nation customer supplier part orders lineitem events documents embeddings
FLAG_FACTOR = 2


def executed_scan_nodes(df) -> int:
    """Count scan nodes in the EXECUTED plan tree (post-action).

    Cached/memoized subtrees live inside InMemoryRelation and are not
    children of the executed tree, so they are correctly excluded —
    they materialized (at most) once, elsewhere."""
    df.collect()
    n = 0
    stack = [df._jdf.queryExecution().executedPlan()]
    while stack:
        node = stack.pop()
        cls = node.getClass().getSimpleName()
        if "FileSourceScan" in cls or "BatchScan" in cls:
            n += 1
        it = node.children().iterator()
        while it.hasNext():
            stack.append(it.next())
    return n


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    factor = float(sys.argv[2]) if len(sys.argv) > 2 else FLAG_FACTOR
    from clean_census_acs_data_spark.queries import QUERIES
    from clean_census_acs_data_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    bound = int(factor * TABLES)
    flagged, errs = [], []
    for name, fn in QUERIES.items():
        try:
            n = executed_scan_nodes(fn(spark, sf_dir))
        except Exception as ex:  # streaming/source entries that need a sink
            errs.append((name, str(ex)[:80]))
            continue
        if n > bound:
            flagged.append((n, name))
    flagged.sort(reverse=True)
    for n, name in flagged:
        print(f"FLAGGED {name}: {n} executed scan nodes (> {bound})")
    print(
        f"scan_audit: {len(QUERIES) - len(errs)} entries audited, "
        f"{len(flagged)} flagged, {len(errs)} skipped (non-batch/errored)"
    )
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
