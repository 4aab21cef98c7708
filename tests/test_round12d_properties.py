"""Property tests for the round-12 wave-4 batch (Cohen's kappa,
Bradley–Terry MM, stratified ATE). Exact parity runs in
tests/test_oracle_parity.py."""

from __future__ import annotations

from collections import Counter, defaultdict

from pyspark.sql import functions as F

from clean_census_acs_data_spark.io import load_table
from clean_census_acs_data_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_kappa_identity_and_bounds(spark):
    r = QUERIES["cohens_kappa_labelers"](spark, SF).collect()[0]
    assert 0 <= r.n_agree <= r.n_docs
    assert r.kappa_num == r.n_docs * r.n_agree - r.pe_num
    assert r.kappa_den == r.n_docs * r.n_docs - r.pe_num
    assert -1.0 <= r.kappa <= 1.0
    assert r.kappa == r.kappa_num / r.kappa_den
    # self-agreement sanity: kappa of a rater with itself would be 1;
    # two independent raters over real text should land strictly below
    assert r.kappa < 1.0


def test_bradley_terry_bruteforce(spark):
    ev = load_table(spark, SF, "events").toPandas()
    ev["dy"] = ev["ts"].dt.date
    daily = ev.groupby(["dy", "event_type"]).size()
    wins: Counter = Counter()
    n_ij: Counter = Counter()
    for dy, g in daily.groupby(level=0):
        counts = {t: int(c) for (_, t), c in g.items()}
        types = sorted(counts)
        for x in range(len(types)):
            for y in range(x + 1, len(types)):
                i, j = types[x], types[y]
                if counts[i] == counts[j]:
                    continue
                n_ij[(i, j)] += 1
                n_ij[(j, i)] += 1
                wins[i if counts[i] > counts[j] else j] += 1
    SCALE = 10**12
    items = sorted({t for t, _ in n_ij})
    s0 = {t: 1_000_000 for t in items}
    def mm_round(s):
        out = {}
        for i in items:
            d = sum(
                (n_ij[(i, j)] * SCALE) // (s[i] + s[j])
                for j in items
                if j != i and n_ij[(i, j)]
            )
            out[i] = (wins[i] * SCALE) // d
        return out

    s1 = mm_round(s0)
    s2 = mm_round(s1)
    tot = sum(s2.values())
    got = {r.event_type: r for r in QUERIES["bradley_terry_mm"](spark, SF).collect()}
    assert set(got) == set(items)
    for t in items:
        r = got[t]
        assert r.wins == wins[t]
        assert r.n_matches == sum(v for (i, _), v in n_ij.items() if i == t)
        assert r.s1_micro == s1[t]
        assert r.s2_micro == s2[t]
        assert r.share_ppm == (s2[t] * 1_000_000) // tot
    # a strength ordering consistent with win rates on balanced
    # schedules: the top-wins item has the top strength
    best = max(items, key=lambda t: (wins[t], t))
    assert got[best].s2_micro == max(r.s2_micro for r in got.values())


def test_stratified_ate_bruteforce(spark):
    ev = load_table(spark, SF, "events").toPandas()
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    u = ev.groupby("user_id").agg(
        n_events=("event_id", "size"), cents=("cents", "sum")
    )
    u = u.sort_values(["n_events", "user_id"]).reset_index()
    nu = len(u)
    u["stratum"] = [((i) * 5) // nu for i in range(nu)]
    u["treated"] = u["user_id"] % 2 == 0
    rows = {r.stratum: r for r in QUERIES["stratified_ate_estimate"](spark, SF).collect()}
    wsum = 0
    for st, g in u.groupby("stratum"):
        t, c = g[g.treated], g[~g.treated]
        mt = int(t.cents.sum()) * 10000 // len(t) if len(t) else None
        mc = int(c.cents.sum()) * 10000 // len(c) if len(c) else None
        r = rows[st]
        assert r.n_users == len(g)
        assert r.n_treated == len(t) and r.n_control == len(c)
        assert r.mean_treated_micro == mt
        assert r.mean_control_micro == mc
        if mt is None or mc is None:
            # an all-treated/all-control stratum has no within-stratum
            # contrast: NULL effect, excluded from the weighted sum
            # (SUM skips NULLs on both engines)
            assert r.effect_micro is None
        else:
            assert r.effect_micro == mt - mc
            wsum += len(g) * (mt - mc)
    allr = rows[-1]
    assert allr.n_users == nu
    # truncation toward zero on both engines (verified DIV ≡ //)
    q = abs(wsum) // nu
    assert allr.effect_micro == (q if wsum >= 0 else -q)
    # strata are equi-depth within one user
    sizes = [rows[s].n_users for s in range(5)]
    assert max(sizes) - min(sizes) <= 1
