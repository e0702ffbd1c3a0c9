"""Local mirror of the driver's t2 correctness gate.

Runs every ``queries()`` entry at a given sf_dir on Spark AND its
``oracle_sql()`` on DuckDB, then compares row count, column names, and
an order-insensitive value hash.  Usage::

    PYTHONPATH=/root/repo python tools/check_oracles.py [sf_dir] [name ...]
    PYTHONPATH=/root/repo python tools/check_oracles.py --json OUT.json [sf_dir]

``--json`` additionally writes a CORRECTNESS_r{N}.json-shaped record
per query (rows_match/schema_match/hash_match/spark_rows/oracle_rows/
err) — committed each round as ``CORRECTNESS_local_r{N}.json`` so the
driver gate's 50-query prefix cap never leaves a registry entry
without recorded evidence at HEAD (VERDICT r3 #6).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import duckdb

from community_detection_flink_spark import get_spark
from community_detection_flink_spark.sources.tables import TABLES

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry_mod


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    argv = list(sys.argv[1:])
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    records: dict[str, dict] = {}
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if json_out and records:
            _dump(json_out, records)  # checkpoint: survive a mid-sweep kill
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL {name}: SPARK ERROR {type(e).__name__}: {str(e)[:200]}")
            records[name] = dict(
                rows_match=False, schema_match=None, hash_match=None,
                spark_rows=None, oracle_rows=None,
                err=f"spark: {type(e).__name__}",
            )
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(rows)} rows ({time.time()-t0:.1f}s)")
            records[name] = dict(
                rows_match=None, schema_match=None, hash_match=None,
                spark_rows=len(rows), oracle_rows=None, err="no_oracle",
            )
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: ORACLE ERROR {type(e).__name__}: {str(e)[:200]}")
            records[name] = dict(
                rows_match=None, schema_match=None, hash_match=None,
                spark_rows=len(rows), oracle_rows=None,
                err=f"oracle: {type(e).__name__}",
            )
            n_fail += 1
            continue
        problems = []
        if len(rows) != len(orows):
            problems.append(f"rowcount {len(rows)} vs {len(orows)}")
        if sorted(cols) != sorted(ocols):
            problems.append(f"cols {sorted(cols)} vs {sorted(ocols)}")
        if not problems:
            hs, ho = table_hash(rows, cols), table_hash(orows, ocols)
            if hs != ho:
                problems.append(f"valuehash {hs} vs {ho}")
        records[name] = dict(
            rows_match=len(rows) == len(orows),
            schema_match=sorted(cols) == sorted(ocols),
            hash_match=not problems,
            spark_rows=len(rows),
            oracle_rows=len(orows),
            err=None if not problems else "; ".join(problems),
        )
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} ({time.time()-t0:.1f}s)")
            # show a sample diff
            sset = {tuple(map(norm_cell, r)) for r in rows}
            oset = {tuple(map(norm_cell, r)) for r in orows}
            for d in list(sset - oset)[:3]:
                print(f"  spark-only: {d}")
            for d in list(oset - sset)[:3]:
                print(f"  oracle-only: {d}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(rows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if json_out:
        _dump(json_out, records)
        print(f"wrote {json_out} ({len(records)} records)")


def _dump(json_out, records):
    tmp = json_out + ".tmp"
    with open(tmp, "w") as f:
        json.dump(records, f, indent=2)
    os.replace(tmp, json_out)


if __name__ == "__main__":
    main()
