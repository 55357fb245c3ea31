"""Local replica of the driver's t2 correctness gate.

Runs every `__spark_entry__.queries()` entry on Spark and its
`oracle_sql()` twin on DuckDB (same parquet tables registered as views),
then compares row count, column names, and the order-insensitive multiset of
row values.  Usage:  python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
from collections import Counter
from datetime import date, datetime
from decimal import Decimal

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    """Canonicalize a cell so Spark and DuckDB results compare equal."""
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    try:
        import numpy as np

        if isinstance(v, np.generic):
            return canon(v.item())
        if isinstance(v, np.ndarray):
            return tuple(canon(x) for x in v.tolist())
    except ImportError:
        pass
    return v


def df_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(canon(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from duckdb_faiss_ext_spark.session import get_spark

    spark = get_spark("check-oracle")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {ex}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (rows-only check, no oracle)")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {ex}")
            continue
        ok = True
        if sorted(scols) != sorted(ocols):
            print(f"FAIL  {name}: columns spark={sorted(scols)} duckdb={sorted(ocols)}")
            ok = False
        elif len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount spark={len(srows)} duckdb={len(orows)}")
            ok = False
        else:
            sm = df_to_multiset(scols, srows)
            om = df_to_multiset(ocols, orows)
            if sm != om:
                diff_s = sm - om
                diff_o = om - sm
                print(f"FAIL  {name}: value mismatch "
                      f"({sum(diff_s.values())} spark-only / {sum(diff_o.values())} duckdb-only)")
                for r in list(diff_s)[:3]:
                    print(f"      spark-only:  {r}")
                for r in list(diff_o)[:3]:
                    print(f"      duckdb-only: {r}")
                ok = False
        if ok:
            print(f"ok    {name}: {len(srows)} rows")
        else:
            failures.append(name)
    print()
    if failures:
        print(f"FAILURES ({len(failures)}): {failures}")
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
