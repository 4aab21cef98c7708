"""Capture a registry entry's .explain("formatted") output to a file.

Usage: python scripts/capture_plan.py ENTRY OUTFILE [SF_DIR]

Used for the plans/r12/<query>_{before,after}.txt evidence files: run
from the worktree holding the variant you want (the plan reflects the
CODE of the cwd's package, the data dir only shapes file paths/stats).
Default SF_DIR is sf0.001 — plan SHAPE is scale-invariant here and the
small dir keeps footer reads cheap.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clean_census_acs_data_spark.session import get_spark  # noqa: E402
from clean_census_acs_data_spark.queries import QUERIES  # noqa: E402


def main() -> None:
    entry, outfile = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"
    spark = get_spark(app_name=f"plan:{entry}")
    spark.sparkContext.setLogLevel("ERROR")
    df = QUERIES[entry](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    with open(outfile, "w") as fh:
        fh.write(buf.getvalue())
    print(f"{entry}: {len(buf.getvalue())} bytes -> {outfile}")
    spark.stop()


if __name__ == "__main__":
    main()
