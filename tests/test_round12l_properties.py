"""Property tests for vocab_topp_coverage (wave 12). Exact parity runs
in tests/test_oracle_parity.py."""

from __future__ import annotations

import math
from collections import Counter

from clean_census_acs_data_spark.io import load_table
from clean_census_acs_data_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_topp_nucleus_bruteforce_and_minimality(spark):
    docs = load_table(spark, SF, "documents").toPandas()
    got = {r.source: r for r in QUERIES["vocab_topp_coverage"](spark, SF).collect()}
    for src, g in docs.groupby("source"):
        c: Counter = Counter()
        for t in g.text:
            c.update(w for w in t.lower().split(" ") if w)
        total = sum(c.values())
        thresh = math.ceil(0.9 * total)
        assert thresh == (9 * total + 9) // 10  # the integer identity
        ordered = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
        cum = 0
        nucleus = 0
        for _, cnt in ordered:
            if cum >= thresh:
                break
            cum += cnt
            nucleus += 1
        r = got[src]
        assert r.total_tokens == total
        assert r.vocab_size == len(c)
        assert r.nucleus_size == nucleus
        assert r.head_share_ppm == ordered[0][1] * 1_000_000 // total
        # minimality + sufficiency of the nucleus prefix
        prefix_mass = sum(cnt for _, cnt in ordered[:nucleus])
        assert prefix_mass >= thresh
        assert sum(cnt for _, cnt in ordered[: nucleus - 1]) < thresh
        assert 1 <= r.nucleus_size <= r.vocab_size
