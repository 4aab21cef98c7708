"""COVERAGE.md stays honest: every backticked query name it mentions
must exist in the registry, and every registry entry must be mentioned."""

from __future__ import annotations

import re
from pathlib import Path

from clean_census_acs_data_spark.queries import QUERIES

DOC = Path(__file__).resolve().parent.parent / "COVERAGE.md"


def _mentioned() -> set[str]:
    text = DOC.read_text()
    names = set(re.findall(r"`([a-z0-9_]+)`", text))
    return {n for n in names if not n.endswith((".py", ".md", ".json"))}


def test_every_mentioned_query_exists():
    ghosts = {
        n
        for n in _mentioned()
        if n in QUERIES or re.fullmatch(r"[a-z0-9]+(_[a-z0-9]+)+", n)
    } - set(QUERIES) - {"queries", "oracle_sql", "tests", "test_coverage_doc"}
    # names that look like query ids (snake_case) must resolve
    ghosts = {g for g in ghosts if not g.startswith("test_")}
    assert not ghosts, f"COVERAGE.md mentions unknown queries: {sorted(ghosts)}"


def test_every_query_is_documented():
    missing = set(QUERIES) - _mentioned()
    assert not missing, f"queries absent from COVERAGE.md: {sorted(missing)}"


def test_driver_attestation_block_in_sync():
    """The generated driver-attestation block must match a fresh
    regeneration from the CORRECTNESS_r*.json rounds the block itself
    records (VERDICT r2 #5, round-robust per VERDICT r3 #1): the driver
    dropping a NEWER artifact after round close must not go red — only
    an edit that desyncs the block from its own declared inputs does."""
    import sys

    sys.path.insert(0, str(DOC.parent / "scripts"))
    import attestation

    text = DOC.read_text()
    assert attestation.BEGIN in text, "attestation block missing"
    rounds = attestation.doc_rounds(text)
    assert rounds, "attestation block lacks a 'Generated from:' round list"
    expected = attestation.render(sorted(QUERIES), rounds)
    start = text.index(attestation.BEGIN)
    end = text.index(attestation.END) + len(attestation.END)
    assert text[start:end] == expected, (
        "COVERAGE.md attestation block stale — run scripts/attestation.py"
    )
