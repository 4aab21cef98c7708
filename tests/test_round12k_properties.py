"""Property tests for consistent_hash_reshard_audit (wave 11). Exact
parity runs in tests/test_oracle_parity.py."""

from __future__ import annotations

import hashlib

from clean_census_acs_data_spark.io import load_table
from clean_census_acs_data_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"
VNODES = 16


def _h55(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) >> 5


def _ring(n_shards: int) -> list[int]:
    return sorted(
        (_h55(f"ring:{k}#{j}") << 3) | k
        for k in range(n_shards)
        for j in range(VNODES)
    )


def _assign(ring: list[int], key: int) -> int:
    for p in ring:  # ring is sorted: first ≥ key is the successor
        if p >= key:
            return p & 7
    return ring[0] & 7


def test_reshard_matrix_bruteforce(spark):
    docs = load_table(spark, SF, "documents").toPandas()
    r4, r5 = _ring(4), _ring(5)
    cells: dict[tuple[int, int], int] = {}
    for doc_id in docs.doc_id:
        key = _h55(f"doc:{doc_id}") << 3
        cell = (_assign(r4, key), _assign(r5, key))
        cells[cell] = cells.get(cell, 0) + 1
    rows = QUERIES["consistent_hash_reshard_audit"](spark, SF).collect()
    got = {(r.shard_old, r.shard_new): r.n_docs for r in rows}
    assert got == cells
    for r in rows:
        assert r.moved == (r.shard_old != r.shard_new)


def test_consistent_hashing_stability_property(spark):
    """The guarantee itself: every moved key moves TO the new shard —
    no key relocates between surviving shards (their ring points are
    identical in both rings; only shard 4's points were inserted)."""
    rows = QUERIES["consistent_hash_reshard_audit"](spark, SF).collect()
    total = sum(r.n_docs for r in rows)
    moved = sum(r.n_docs for r in rows if r.moved)
    for r in rows:
        if r.moved:
            assert r.shard_new == 4
    # expected movement ≈ 1/5; allow a generous band for 500 docs
    assert 0.05 <= moved / total <= 0.40
