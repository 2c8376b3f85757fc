"""Oracle comparison helper mirroring the driver's check:
row-count + column names + order-insensitive value comparison with float
rounding. Used by every per-query parity test."""

from __future__ import annotations

import datetime
import math
from decimal import Decimal


def _norm_cell(v):
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


def assert_matches_oracle(spark_df, duck_con, sql: str, name: str = "query"):
    srows = spark_df.collect()
    scols = spark_df.columns
    rel = duck_con.execute(sql)
    dcols = [d[0] for d in rel.description]
    drows = rel.fetchall()

    assert len(srows) == len(drows), (
        f"{name}: row count spark={len(srows)} duckdb={len(drows)}"
    )
    ncols_s, vals_s = _normalize(scols, [tuple(r) for r in srows])
    ncols_d, vals_d = _normalize(dcols, drows)
    assert ncols_s == ncols_d, f"{name}: columns spark={ncols_s} duckdb={ncols_d}"
    if vals_s != vals_d:
        for i, (a, b) in enumerate(zip(vals_s, vals_d)):
            assert a == b, f"{name}: first differing row {i}: spark={a} duckdb={b}"
    assert vals_s == vals_d, f"{name}: values differ"
