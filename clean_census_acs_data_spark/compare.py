"""Cross-engine comparison helpers shared by the local parity test
(tests/test_oracle_parity.py) and the driver-format sweep
(scripts/local_correctness.py) — one definition of "same schema", so
the two verdicts can never silently disagree."""

from __future__ import annotations


def dtype_kind(dtype) -> str:
    """Collapse a pandas dtype to a comparison kind: b=bool, i=int,
    f=float, M=datetime, O=everything else. The driver value-hashes
    raw dtypes, so a DuckDB HUGEINT widened to float64 must read as a
    different kind than Spark's int64 even when values are equal."""
    import pandas as pd

    if pd.api.types.is_bool_dtype(dtype):
        return "b"
    if pd.api.types.is_integer_dtype(dtype):
        return "i"
    if pd.api.types.is_float_dtype(dtype):
        return "f"
    if pd.api.types.is_datetime64_any_dtype(dtype):
        return "M"
    return "O"


def schema_kinds(df) -> list[tuple[str, str]]:
    """Name-sorted (column, kind) pairs for a pandas frame."""
    return [(c, dtype_kind(df[c].dtype)) for c in sorted(df.columns)]
