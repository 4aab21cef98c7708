"""Property tests for the round-12 wave-9 batch (encoding audits,
polymorphic UDTF). Exact parity runs in tests/test_oracle_parity.py."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from clean_census_acs_data_spark.io import load_table
from clean_census_acs_data_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_dictionary_audit_bruteforce(spark):
    rows = {r.column_name: r for r in QUERIES["dictionary_encoding_audit"](spark, SF).collect()}
    docs = load_table(spark, SF, "documents").toPandas()
    orders = load_table(spark, SF, "orders").toPandas()
    for cname, series in {
        "documents.source": docs.source,
        "documents.lang": docs.lang,
        "orders.o_orderpriority": orders.o_orderpriority,
    }.items():
        r = rows[cname]
        vals = list(series)
        ndv = len(set(vals))
        code = max(1, math.ceil(max(1, (ndv - 1)).bit_length() / 8)) if ndv > 1 else 1
        # bit_length of 0 is 0; ndv=1 -> code 1 byte (the audit's model)
        if ndv == 1:
            code = 1
        assert r.n_rows == len(vals)
        assert r.ndv == ndv
        assert r.raw_bytes == sum(len(v.encode()) for v in vals)
        assert r.dict_bytes == sum(len(v.encode()) for v in set(vals)) + len(vals) * code
        assert r.compression_ratio == r.dict_bytes / r.raw_bytes


def test_delta_varint_bruteforce(spark):
    ev = load_table(spark, SF, "events").toPandas()
    got = {r.user_id: r for r in QUERIES["delta_varint_timestamp_audit"](spark, SF).collect()}

    def vbytes(gap):
        for b, lim in ((1, 1 << 7), (2, 1 << 14), (3, 1 << 21), (4, 1 << 28),
                       (5, 1 << 35), (6, 1 << 42), (7, 1 << 49)):
            if gap < lim:
                return b
        return 9

    for uid, g in ev.groupby("user_id"):
        ts = sorted(zip(g.ts, g.event_id))
        us = [int(t.value // 1000) for t, _ in ts]
        gaps = [us[0]] + [b - a for a, b in zip(us, us[1:])]
        r = got[uid]
        assert r.n_events == len(us)
        assert r.max_gap_us == max(gaps)
        assert r.varint_bytes == sum(vbytes(x) for x in gaps)
        assert r.fixed64_bytes == 8 * len(us)
        # delta+varint must never exceed the fixed encoding by >9/8
        assert r.varint_bytes <= r.fixed64_bytes + len(us)


def test_polymorphic_udtf_schema_and_values(spark):
    df = QUERIES["udtf_ngrams_polymorphic"](spark, SF)
    assert [f.name for f in df.schema.fields] == ["doc_id", "pos", "g1", "g2", "g3"]
    docs = load_table(spark, SF, "documents").toPandas()
    rows = df.collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    sampled = docs[docs.doc_id % 53 == 0]
    for rec in sampled.itertuples():
        toks = rec.text.split(" ")
        expected = [
            (i + 1, toks[i], toks[i + 1], toks[i + 2])
            for i in range(max(0, len(toks) - 2))
        ]
        got = sorted(
            (r.pos, r.g1, r.g2, r.g3) for r in by_doc.get(rec.doc_id, [])
        )
        assert got == expected
