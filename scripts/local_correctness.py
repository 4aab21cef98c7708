"""Run the driver-style correctness sweep over EVERY registered oracle
and write LOCAL_CORRECTNESS.json in the driver's row format.

The driver samples 50 queries per round (the registry's first 50 by
insertion order); the rest only carry evidence inside pytest output.
This script produces the same machine-readable artifact for the WHOLE
registry — per query: rows_match / schema_match / hash_match — using
the driver's comparison semantics (columns sorted by name, rows sorted,
order-insensitive value hash) so an auditor can diff it directly
against any CORRECTNESS_r{N}.json. Entries without an oracle are
recorded as err="no_oracle" with their Spark row count, exactly as the
driver does.

Run:  python scripts/local_correctness.py [sf_dir]   (default sf0.01,
      the driver's gate scale). Takes ~5 min for the full registry.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def value_hash(df) -> str:
    """Order-insensitive value hash over name-sorted columns: stringify
    every cell (floats via repr for full precision), sort the row
    strings, md5 the concatenation."""
    import pandas as pd

    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False, name=None):
        cells = []
        for v in tup:
            if v is None or (not isinstance(v, (list, tuple, dict)) and pd.isna(v)):
                cells.append("\x00")
            elif isinstance(v, float):
                cells.append(repr(v))
            else:
                cells.append(str(v))
        rows.append("\x01".join(cells))
    rows.sort()
    return hashlib.md5("\x02".join(rows).encode()).hexdigest()


from clean_census_acs_data_spark.compare import schema_kinds  # noqa: E402


def main() -> None:
    import duckdb

    from clean_census_acs_data_spark.io import TABLES
    from clean_census_acs_data_spark.queries import ORACLES, QUERIES
    from clean_census_acs_data_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="local_correctness")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    results: dict[str, dict] = {}
    for name in QUERIES:
        row = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            sdf = QUERIES[name](spark, sf_dir).toPandas()
            row["spark_rows"] = int(len(sdf))
            if name not in ORACLES:
                row["err"] = "no_oracle"
            else:
                odf = con.execute(ORACLES[name]).df()
                row["oracle_rows"] = int(len(odf))
                row["rows_match"] = len(sdf) == len(odf)
                row["schema_match"] = schema_kinds(sdf) == schema_kinds(odf)
                row["hash_match"] = (
                    row["rows_match"]
                    and row["schema_match"]
                    and value_hash(sdf) == value_hash(odf)
                )
        except Exception as e:  # noqa: BLE001 — record, don't abort the sweep
            row["err"] = f"{type(e).__name__}: {e}"[:200]
        results[name] = row
        status = (
            "green"
            if row["hash_match"]
            else (row["err"] or "MISMATCH")
        )
        print(f"{name}: {status}", flush=True)

    out_path = os.path.join(REPO, "LOCAL_CORRECTNESS.json")
    from datetime import datetime, timezone

    results["__meta__"] = {
        "sf_dir": sf_dir,
        "n_queries": len(QUERIES),
        "n_oracles": len(ORACLES),
        "generated_utc": datetime.now(timezone.utc).isoformat(timespec="seconds"),
        "format": "driver CORRECTNESS row format; __meta__ key is local-only",
    }
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    rows = [r for k, r in results.items() if k != "__meta__"]
    n_green = sum(1 for r in rows if r["hash_match"])
    n_no = sum(1 for r in rows if r["err"] == "no_oracle")
    n_bad = len(rows) - n_green - n_no
    print(
        f"\nwrote {out_path}: {n_green} hash-green, {n_no} no_oracle, "
        f"{n_bad} failures of {len(rows)}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
