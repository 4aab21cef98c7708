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


def test_rotation_fronts_never_attested_oracle_backed():
    names = list(entrymod.queries())
    attested = _attested()
    fresh_oracle = [n for n in QUERIES if n not in attested and n in ORACLES]
    # as long as enough fresh oracle-backed entries exist, the driver's
    # 50-wide sample window must contain only those
    window = names[: min(50, len(fresh_oracle))]
    assert all(n not in attested and n in ORACLES for n in window), (
        "sample window contains attested or rows-only entries while "
        "fresh oracle-backed entries remain"
    )


def test_rotation_survives_missing_artifacts(monkeypatch, tmp_path):
    # with no CORRECTNESS artifacts, everything is fresh → registry order
    order = entrymod._rotation_order(list(QUERIES))
    assert sorted(order) == sorted(QUERIES)
