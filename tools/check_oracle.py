"""Local replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet, compare row count + schema + order-insensitive
value hash.

Usage: python3 tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from promhouse_spark.schemas import TESTDATA_TABLES  # noqa: E402
from promhouse_spark.session import get_spark  # noqa: E402


def normalize_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(normalize_cell(x) for x in v) + "]"
    return str(v)


def table_hash(columns: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(
        "\x1f".join(normalize_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def duckdb_con(sf_dir: str):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def compare_query(name, fn, sql, spark, con, sf_dir) -> list[str]:
    """Run one query on Spark and its oracle on DuckDB; return problems
    ([] = match). Mirrors the driver's rows+schema+value-hash gate."""
    df = fn(spark, sf_dir)
    srows = [tuple(r) for r in df.collect()]
    scols = df.columns
    res = con.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    problems = []
    if len(srows) != len(orows):
        problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
    if scols != ocols:
        problems.append(f"column order spark={scols} duck={ocols}")
    elif table_hash(scols, srows) != table_hash(ocols, orows):
        problems.append("value-hash mismatch")
        sset = {tuple(normalize_cell(v) for v in r) for r in srows}
        oset = {tuple(normalize_cell(v) for v in r) for r in orows}
        only_s = list(sset - oset)[:3]
        only_o = list(oset - sset)[:3]
        if only_s:
            problems.append(f"spark-only: {only_s}")
        if only_o:
            problems.append(f"duck-only: {only_o}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb_con(sf_dir)
    spark = get_spark(app_name="oracle-check")

    failed = []
    for name, fn in sorted(queries.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        if name not in oracles:
            try:
                n = len(fn(spark, sf_dir).collect())
            except Exception as e:  # noqa: BLE001
                print(f"FAIL  {name}: spark error: {e}")
                failed.append(name)
                continue
            print(f"rows  {name}: {n} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            problems = compare_query(name, fn, oracles[name], spark, con, sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: error: {e}")
            failed.append(name)
            continue
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"OK    {name} [{time.time()-t0:.1f}s]")

    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
