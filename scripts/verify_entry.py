"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 on Spark AND its
``oracle_sql()`` twin on DuckDB, then compares row count, column names, and
order-insensitive values. Usage:

    python scripts/verify_entry.py [query_name ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from piperider_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_type(t: str) -> str:
    """Collapse engine type names into hash-equivalence classes.

    Calibrated against the driver's CORRECTNESS_r01 behavior: int widths
    (int32 vs int64) hash identically, but DuckDB's HUGEINT (int128 — what
    an un-cast integer ``sum()`` returns) does NOT hash like BIGINT. Keeping
    i128 as its own class is the whole point: round 1's local twin compared
    only python values and masked five driver hash-fails.
    """
    t = str(t).lower()
    if t in ("tinyint", "smallint", "int", "integer", "bigint", "long", "short", "byte"):
        return "i64"
    if t == "hugeint":
        return "i128"
    if t in ("float", "double", "real"):
        return "f64"
    if t in ("varchar", "string", "text"):
        return "str"
    if t.startswith("timestamp"):
        return "ts"
    return t


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v


def norm_rows(cols, rows, types):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    tps = [norm_type(types[i]) for i in order]
    return sorted(cols), sorted(out, key=repr), tps


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_spark("verify_entry", cores=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            s_cols = list(sdf.columns)
            s_types = [f.dataType.simpleString() for f in sdf.schema.fields]
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(s_rows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            rel = con.sql(oracles[name])
            d_cols = list(rel.columns)
            d_types = [str(t) for t in rel.types]
            d_rows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        sc, sr, st = norm_rows(s_cols, s_rows, s_types)
        dc, dr, dt = norm_rows(d_cols, d_rows, d_types)
        status = "ok   "
        if sc != dc:
            status = "FAIL cols"
            print(f"      spark={sc}\n      duck ={dc}")
        elif st != dt:
            status = "FAIL types"
            print(f"      spark={list(zip(sc, st))}\n      duck ={list(zip(dc, dt))}")
        elif len(sr) != len(dr):
            status = f"FAIL rows {len(sr)} vs {len(dr)}"
        elif sr != dr:
            status = "FAIL values"
            for a, b in zip(sr, dr):
                if a != b:
                    print(f"      spark={a}\n      duck ={b}")
                    break
        if status.startswith("FAIL"):
            failures.append(name)
        print(f"{status} {name}: {len(sr)} rows [{time.time()-t0:.1f}s]")
    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
