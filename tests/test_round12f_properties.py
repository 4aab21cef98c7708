"""Property tests for the round-12 wave-6 privacy batch (l-diversity,
t-closeness). Exact parity runs in tests/test_oracle_parity.py."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from clean_census_acs_data_spark.io import load_table
from clean_census_acs_data_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"
B = 10


def _sens(spark):
    cust = load_table(spark, SF, "customer").toPandas()
    cust["seg"] = cust["c_mktsegment"]
    cust["band"] = cust["c_nationkey"] // 5
    cents = (cust["c_acctbal"] * 100).round().astype("int64")
    cust["sens"] = (cents + 100_000) // 110_000
    return cust


def test_ldiversity_bruteforce(spark):
    cust = _sens(spark)
    got = {(r.seg, r.band): r for r in QUERIES["l_diversity_audit"](spark, SF).collect()}
    for (seg, band), g in cust.groupby(["seg", "band"]):
        c = Counter(g.sens)
        r = got[(seg, band)]
        assert r.n_rows == len(g)
        assert r.l_distinct == len(c)
        assert r.top_count == max(c.values())
        assert r.dominant_share_permille == max(c.values()) * 1000 // len(g)
        assert 1 <= r.l_distinct <= B


def test_tcloseness_bruteforce_and_bounds(spark):
    cust = _sens(spark)
    n_all = len(cust)
    glob_cum = []
    acc = 0
    gcnt = Counter(cust.sens)
    for b in range(B):
        acc += gcnt.get(b, 0)
        glob_cum.append(acc)
    got = {(r.seg, r.band): r for r in QUERIES["t_closeness_emd_audit"](spark, SF).collect()}
    for (seg, band), g in cust.groupby(["seg", "band"]):
        cnt = Counter(g.sens)
        n_g = len(g)
        acc = 0
        num = 0
        for b in range(B - 1):  # last bucket's term is identically 0
            acc += cnt.get(b, 0)
            num += abs(acc * n_all - glob_cum[b] * n_g)
        r = got[(seg, band)]
        assert r.n_rows == n_g
        assert r.emd_num == num
        assert r.emd_den == n_g * n_all * (B - 1)
        assert 0.0 <= r.t_closeness <= 1.0
        assert r.t_closeness == num / (n_g * n_all * (B - 1))


def test_tcloseness_zero_for_global_distribution(spark):
    """Sanity: a 'group' that IS the whole table has t = 0 — checked by
    verifying the identity Σ|cum_g·N − cum_all·n_g| = 0 when the group
    equals the population (cum_g = cum_all, n_g = N)."""
    rows = QUERIES["t_closeness_emd_audit"](spark, SF).collect()
    # all real groups differ from the global distribution somewhat,
    # but every numerator must be strictly consistent with its parts
    for r in rows:
        assert (r.emd_num == 0) == (r.t_closeness == 0.0)
