"""Cold first-rep A/B of entry-local caches (VERDICT r8 ask #2a).

The graded bench times each entry ONCE, cold, in one long-lived
session — so a cache whose fill pass costs more than the recompute it
saves is a net LOSS there, even if a warm second rep says otherwise.
This harness measures exactly that metric: one fresh process per
variant, q1 warmup (JVM + parquet footers), then each target entry
once with the bench's noop-sink terminal action.

Usage:
    python scripts/cold_ab.py            # variant A (caches on)
    SPARK_GRAFT_AB_NOCACHE=1 python scripts/cold_ab.py   # variant B

Interleave A B A B on the same box to cancel drift; compare per-entry.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clean_census_acs_data_spark.session import (  # noqa: E402
    get_spark,
    reap_tracked_caches,
)
from clean_census_acs_data_spark.queries import QUERIES  # noqa: E402

TARGETS = [
    "tpch_q2_min_price_supplier",
    "sessionize_lag_cumsum",  # untouched drift sentinel (no local cache)
    "decontaminate_ngram_overlap",
    "token_cooccurrence_pmi",
    "market_basket_lift",
    "bradley_terry_mm",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or TARGETS
    spark = get_spark(app_name="cold_ab")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    QUERIES["q1_pricing_summary"](spark, sf_dir).collect()
    warm = round(time.perf_counter() - t0, 4)
    out: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        out[name] = round(time.perf_counter() - t0, 4)
        reap_tracked_caches()
    print(
        json.dumps(
            {
                "variant": "nocache"
                if os.environ.get("SPARK_GRAFT_AB_NOCACHE") == "1"
                else "cache",
                "warmup": warm,
                "timings": out,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
