"""Honesty lock on LOCAL_CORRECTNESS.json (scripts/local_correctness.py):
every row the committed artifact claims for a CURRENTLY-registered
oracle-backed query must be hash-green, and rows-only entries must say
no_oracle. Tolerant of registry growth (new queries simply aren't in
the artifact yet) so this can't go stale the way the r3 attestation
sync test did — only a red row or a removed-but-claimed query fails."""

from __future__ import annotations

import json
import os

import pytest

from clean_census_acs_data_spark.queries import ORACLES, QUERIES

ARTIFACT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "LOCAL_CORRECTNESS.json",
)


@pytest.mark.skipif(
    not os.path.exists(ARTIFACT), reason="no LOCAL_CORRECTNESS.json committed"
)
def test_artifact_rows_are_green_for_registered_queries():
    with open(ARTIFACT) as f:
        rows = json.load(f)
    rows.pop("__meta__", None)
    stale = [n for n in rows if n not in QUERIES]
    assert not stale, f"artifact claims queries no longer registered: {stale}"
    bad = []
    for name, row in rows.items():
        if row.get("err") == "no_oracle":
            # fine even if the query has since GAINED an oracle — the
            # artifact is a snapshot; regeneration picks it up
            continue
        if row.get("hash_match") and name not in ORACLES:
            bad.append((name, "claims hash-green but has no oracle"))
        elif not row.get("hash_match"):
            bad.append((name, row.get("err") or "recorded mismatch"))
    assert not bad, f"non-green artifact rows: {bad}"
