#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 scripts/selfcheck.py <verify_out_dir> <sf_dir> [query ...]

Reads each <out_dir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <out_dir>/oracle_sql.json in DuckDB over the raw
test tables, and compares: schema (column names sorted), row count, and
values (columns sorted by name, rows sorted by all columns, exact match
after canonicalization).
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq


def typename(t):
    """Canonical arrow type name. Int-vs-decimal-vs-float is significant:
    the driver's hash passes int32-vs-int64 (q04 rank() green in r02) but
    fails BIGINT-vs-HUGEINT (q21/q23/q34/q44 red), because DuckDB HUGEINT
    surfaces as decimal128 and canonicalizes to a different value repr.
    String width variants and timestamp unit/tz are not significant."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{typename(t.value_type)}>"
    return str(t)


def schema_sig(tbl):
    return sorted((f.name, typename(f.type)) for f in tbl.schema)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # -0.0 vs +0.0 is significant: the driver's hash distinguishes them
        # (q55 r03 failed on DuckDB round(-0.004)*10 → -0.0) and python ==
        # would hide it, so negative zero gets a distinct marker.
        if v == 0 and math.copysign(1.0, v) < 0:
            return "-0.0"
        return float(v)
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (int, bool, str, bytes)):
        return v
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(
        (x is None, str(type(x)), x if not isinstance(x, tuple) else str(x)) for x in t))


def main():
    out_dir, sf_dir = Path(sys.argv[1]), Path(sys.argv[2])
    only = set(sys.argv[3:])
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())

    con = duckdb.connect()
    for t in TABLES:
        p = sf_dir / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        rd = out_dir / name
        if not rd.exists():
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        tbl = pq.read_table(rd)
        s_cols = list(tbl.column_names)
        s_rows = [tuple(r.values()) for r in tbl.to_pylist()]
        try:
            d_tbl = con.execute(sql).fetch_arrow_table()
            d_cols = list(d_tbl.column_names)
            d_rows = [tuple(r.values()) for r in d_tbl.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        s_sig, d_sig = schema_sig(tbl), schema_sig(d_tbl)
        if s_sig != d_sig:
            diff = [(a, b) for a, b in zip(s_sig, d_sig) if a != b]
            print(f"FAIL {name}: type mismatch spark={diff and [d[0] for d in diff]} "
                  f"duck={diff and [d[1] for d in diff]}")
            n_fail += 1
            continue
        sc, sr = norm_rows(s_cols, s_rows)
        dc, dr = norm_rows(d_cols, d_rows)
        if sc != dc:
            print(f"FAIL {name}: schema spark={sc} duck={dc}")
            n_fail += 1
            continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(sr, dr)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(sr)} rows differ; first @{i}:")
            print(f"  cols : {sc}")
            print(f"  spark: {a}")
            print(f"  duck : {b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
