"""The driver samples the first 50 entries of ``queries()`` in
insertion order (verified against CORRECTNESS_r01..r03); the shim must
rotate never-attested entries into that window each round (VERDICT r3
ask #2) without losing or duplicating any registry entry."""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from clean_census_acs_data_spark.queries import ORACLES, QUERIES  # noqa: E402


def _attested() -> set[str]:
    out: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        with open(path) as f:
            out.update(json.load(f).keys())
    return out


def test_rotation_is_a_permutation():
    assert sorted(entrymod.queries()) == sorted(QUERIES)


def test_rotation_fronts_unattested_oracle_backed():
    """Every entry in the driver's 50-wide sample window must be
    oracle-backed and either never attested or due for re-attestation
    (previously sampled but not hash-green), while such entries remain."""
    names = list(entrymod.queries())
    attested = _attested()
    eligible = {
        n
        for n in QUERIES
        if n in ORACLES and (n not in attested or n in names[:1])
    }
    window = names[: min(50, len([n for n in names if n in ORACLES]))][:50]
    for n in window[: min(50, len(eligible))]:
        assert n in ORACLES, f"rows-only entry {n} ahead of oracle-backed ones"


def test_rotation_reattests_formerly_rows_only():
    """approx_distinct_sketch gained an oracle after three no_oracle
    driver rows — it must sit inside the sample window for re-attest."""
    names = list(entrymod.queries())
    if "approx_distinct_sketch" in ORACLES:
        assert names.index("approx_distinct_sketch") < 50


def test_rotation_survives_missing_artifacts(monkeypatch):
    """With NO CORRECTNESS artifacts, every entry is fresh and the
    rotation must return a permutation with oracle-backed entries first
    (actually exercising the empty-`latest` path — the prior version of
    this test ran against the real repo artifacts)."""
    import glob as _glob

    monkeypatch.setattr(_glob, "glob", lambda *a, **k: [])
    order = entrymod._rotation_order(list(QUERIES))
    assert sorted(order) == sorted(QUERIES)
    n_oracle = len([n for n in QUERIES if n in ORACLES])
    assert all(n in ORACLES for n in order[:n_oracle])


def test_rotation_self_advances_across_rounds(monkeypatch, tmp_path):
    """Simulate the driver writing a CORRECTNESS artifact for the
    CURRENT sample window: the next round's window must be disjoint
    from everything attested so far — the self-advancing property the
    attestation-gap fix depends on."""
    import glob as _glob
    import json

    real = {p for p in _glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))}
    current_window = list(entrymod.queries())[:50]
    fake = tmp_path / "CORRECTNESS_r98.json"
    fake.write_text(
        json.dumps(
            {
                n: {
                    "rows_match": True,
                    "schema_match": True,
                    "hash_match": True,
                    "err": None,
                }
                for n in current_window
            }
        )
    )
    monkeypatch.setattr(
        _glob, "glob", lambda *a, **k: sorted(real) + [str(fake)]
    )
    next_window = list(entrymod.queries())[:50]
    already = _attested() | set(current_window)
    fresh_remaining = [
        n for n in QUERIES if n not in already and n in ORACLES
    ]
    overlap = set(next_window) & set(current_window)
    assert not overlap or len(fresh_remaining) < 50, (
        f"window did not advance: {sorted(overlap)[:5]}..."
    )


def test_rotation_survives_unreadable_artifacts(monkeypatch, tmp_path):
    """A corrupt artifact must fall back to registry order, not raise."""
    import glob as _glob

    bad = tmp_path / "CORRECTNESS_r99.json"
    bad.write_text("{not json")
    monkeypatch.setattr(_glob, "glob", lambda *a, **k: [str(bad)])
    order = entrymod._rotation_order(list(QUERIES))
    assert order == list(QUERIES)
