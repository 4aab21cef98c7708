"""Deterministic offline fake of the Census API (for tests and demos —
no network). Mirrors the wire format exactly: JSON array-of-arrays,
row 0 = header, all cells strings (Test_census_tract.py:167-168), with
geography columns appended the way the real API does.

Per-chunk variants exercise every edge the reference handles:

- state 05 in chunk  → HTTP 500 every time (dead-letter path)
- state 09 in chunk  → empty result, header only (empty-relation guard)
- state 01 in chunk  → response missing the last requested variable
  (NULL-fill alignment, Test_census_tract.py:171-172)
- state 12 in chunk  → extra unmapped column DPXX_9999E
  (unmapped-diagnostic path, :356-359)
- measure values are f(state, var_index) = state*100 + index, with a
  blank and an ACS sentinel sprinkled on tract 1 (typed-tier paths)

Lives in the package (not tests/) so Spark executors can unpickle the
function by module reference.
"""

from __future__ import annotations

import json


def fake_census_fetcher(url: str, params: dict[str, str]) -> tuple[int, dict[str, str], str]:
    states = params["in"].removeprefix("state:").split(",")
    get_vars = params["get"].split(",")
    if "05" in states:
        return 500, {"X-RateLimit-Remaining": "99"}, "server error"
    header = list(get_vars)
    if "01" in states:
        header = header[:-1]  # drop last requested var
    if "12" in states:
        header = header + ["DPXX_9999E"]
    header = header + ["state", "county", "tract"]
    rows = []
    if "09" not in states:
        for st in states:
            for tract_i in range(2):
                row = []
                for col in header:
                    if col == "NAME":
                        row.append(f"Census Tract {tract_i}, Demo County, State {st}")
                    elif col == "state":
                        row.append(st)
                    elif col == "county":
                        row.append("001")
                    elif col == "tract":
                        row.append(f"{tract_i:06d}")
                    elif col == "DPXX_9999E":
                        row.append("42")
                    else:
                        idx = get_vars.index(col) if col in get_vars else 0
                        if tract_i == 1 and idx == 1:
                            row.append("")  # blank → NULL path
                        elif tract_i == 1 and idx == 2:
                            row.append("-888888888")  # sentinel → NULL path
                        else:
                            row.append(str(int(st) * 100 + idx))
                rows.append(row)
    return 200, {"X-RateLimit-Remaining": "99", "Server": "fake"}, json.dumps([header] + rows)


def fake_zcta_fetcher(url: str, params: dict[str, str]) -> tuple[int, dict[str, str], str]:
    """Offline fake of the ZCTA endpoint: all-ZCTA single response with
    the space-containing geography column (and no separate `state`
    column, matching the probe path of test_final_zcta.py:196-198)."""
    assert "in" not in params, "ZCTA requests carry no in= clause"
    get_vars = params["get"].split(",")
    header = get_vars + ["zip code tabulation area"]
    rows = []
    for z in range(5):
        zcta = f"{50000 + z:05d}"
        row = []
        for col in header:
            if col == "NAME":
                row.append(f"ZCTA5 {zcta}")
            elif col == "zip code tabulation area":
                row.append(zcta)
            else:
                idx = get_vars.index(col)
                row.append(str(z * 1000 + idx))
        rows.append(row)
    return 200, {"X-RateLimit-Remaining": "98"}, json.dumps([header] + rows)


# A variable "retired" from the fake vintage: present in the dp02
# config (Test_census_tract.py:289) but absent from variables.json —
# the exact shape of a vintage rollover.
RETIRED_VARIABLE = "DP02_0068E"


def fake_metadata_fetcher(url: str, params: dict[str, str]) -> tuple[int, dict[str, str], str]:
    """Offline fake of the variables.json metadata endpoint (reference
    filter_available_variables, Test_census_tract.py:125-133): serves
    every configured variable except RETIRED_VARIABLE, then delegates
    data requests to fake_census_fetcher."""
    if url.endswith("/variables.json"):
        from clean_census_acs_data_spark.sources.census import DATASETS

        all_vars = {v for cfg in DATASETS.values() for v in cfg["variables"]}
        all_vars.discard(RETIRED_VARIABLE)
        all_vars |= {"NAME"}
        return (
            200,
            {"X-RateLimit-Remaining": "97"},
            json.dumps({"variables": {v: {"label": v} for v in sorted(all_vars)}}),
        )
    return fake_census_fetcher(url, params)
