"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry via Spark and its ``oracle_sql()`` dual via
DuckDB on the same parquet, then compares row count, column names, and an
order-insensitive value representation. Usage:

    python tools/check_parity.py [sf_dir] [query ...]

Exit code 0 iff every checked query matches.
"""

from __future__ import annotations

import math
import sys
from datetime import date, datetime

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from pinterest_data_pipeline_spark.session import TESTDATA_TABLES, get_spark


def _norm(v):
    """Normalize a scalar for cross-engine comparison."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("parity-check")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if sql is None:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle — rows-only check)")
            if len(srows) == 0:
                print(f"      WARNING {name}: 0 rows")
            continue
        try:
            cur = con.execute(sql)
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        ok = True
        if sorted(scols) != sorted(dcols):
            print(f"FAIL  {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
            ok = False
        elif len(srows) != len(drows):
            print(f"FAIL  {name}: rowcount spark={len(srows)} duck={len(drows)}")
            ok = False
        else:
            sset = _rowset(scols, [[r[c] for c in scols] for r in srows])
            dset = _rowset(dcols, drows)
            if sset != dset:
                ok = False
                diff = [(a, b) for a, b in zip(sset, dset) if a != b][:5]
                print(f"FAIL  {name}: value mismatch; first diffs:")
                for a, b in diff:
                    print(f"      spark: {a}")
                    print(f"      duck : {b}")
        if ok:
            print(f"OK    {name}: {len(srows)} rows")
        else:
            failures.append(name)
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
