"""The generated Hilbert SQL must encode a TRUE Hilbert curve:
bijective on the grid and unit-step adjacent between consecutive d —
checked exhaustively on a 16x16 grid through DuckDB (the same SQL text
the Spark side runs)."""

from __future__ import annotations

import duckdb

from clean_census_acs_data_spark.queries_round9 import _hilbert_sql


def _reference_xy2d(n: int, x: int, y: int) -> int:
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_reference_curve_is_hilbert():
    """The Python reference of the unrolled math: bijective + adjacent."""
    n = 16
    pts = {}
    for x in range(n):
        for y in range(n):
            pts[_reference_xy2d(n, x, y)] = (x, y)
    assert len(pts) == n * n
    for d in range(n * n - 1):
        x1, y1 = pts[d]
        x2, y2 = pts[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_sql_matches_reference_on_full_grid():
    """Run the PRODUCTION SQL (n=256) in DuckDB over a diagonal stripe
    of points and compare the raw d values against the Python
    reference — same unrolled expressions, so any drift in the SQL
    generator breaks this."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE orders AS "
        "SELECT CAST(i AS BIGINT) AS o_orderkey, "
        "       CAST((i * 37) % 256 AS DOUBLE) / 100.0 AS o_totalprice "
        "FROM range(0, 1024) t(i)"
    )
    # pull per-point d by rewriting the final agg into a raw projection
    sql = _hilbert_sql("orders")
    head = sql[: sql.index("SELECT CAST(floor(d / 4096.0)")]
    raw = head + "SELECT p8.k AS k, p8.d AS d FROM p8"
    rows = con.execute(raw).fetchall()
    assert len(rows) == 1024
    for k, d in rows:
        x = k % 256
        y = ((k * 37) % 256) % 256
        assert d == _reference_xy2d(256, x, y), (k, x, y, d)


def test_bucket_bbox_locality():
    """Hilbert locality: every 4096-point curve bucket of the FULL grid
    spans exactly a 64x64 bounding box (perfect quadrant locality —
    the property that makes the layout skip files)."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pts AS SELECT CAST(x AS BIGINT) AS x0, CAST(y AS BIGINT) AS y0 "
        "FROM range(0, 256) t(x), range(0, 256) u(y)"
    )
    sql = _hilbert_sql("orders").replace(
        "SELECT o_orderkey AS k, o_orderkey % 256 AS x, "
        "CAST(ROUND(o_totalprice * 100) AS BIGINT) % 256 AS y, "
        "o_orderkey % 256 AS x0, "
        "CAST(ROUND(o_totalprice * 100) AS BIGINT) % 256 AS y0, "
        "CAST(0 AS BIGINT) AS d FROM orders",
        "SELECT x0 * 256 + y0 AS k, x0 AS x, y0 AS y, x0, y0, "
        "CAST(0 AS BIGINT) AS d FROM pts",
    )
    rows = con.execute(sql).fetchall()
    assert len(rows) == 16
    for bucket, n_points, d_min, d_max, bbox in rows:
        assert n_points == 4096
        assert d_max - d_min == 4095
        assert bbox == 64 * 64, f"bucket {bucket} bbox {bbox}"
