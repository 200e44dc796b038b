"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() on DuckDB
over the same sf dir; compare row count, column names, and an
order-insensitive multiset of canonicalized values.

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from collections import Counter

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entry  # noqa: E402
from etlbox_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def df_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(canon(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="check_contract", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    bad = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name:28s} spark error: {str(e)[:200]}")
            bad.append(name)
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name:28s} {len(srows):7d} rows ({dt:4.1f}s)  [no oracle: rows-only]")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name:28s} duckdb error: {str(e)[:200]}")
            bad.append(name)
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} vs {len(orows)}")
        if not problems:
            ms, mo = df_multiset(scols, srows), df_multiset(ocols, orows)
            if ms != mo:
                diff = (ms - mo) + (mo - ms)
                ex = list(diff.items())[:3]
                problems.append(f"values differ ({sum(diff.values())} cells): {ex}")
        if problems:
            print(f"FAIL  {name:28s} {'; '.join(problems)[:300]}")
            bad.append(name)
        else:
            print(f"OK    {name:28s} {len(srows):7d} rows ({dt:4.1f}s)")
    print(f"\n{len(bad)} failing: {bad}" if bad else "\nALL MATCH")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
