"""Direct cross-engine parity checks for the round-9b primitives.

The oracle sweeps prove parity on the driver tables; these tests
prove it on ADVERSARIAL inputs the tables don't contain — seeded
random strings for the Levenshtein kernel (transpositions, repeats,
prefix/suffix edits) and seeded random longs for the HLL hash/register
split — by running DuckDB in-process next to Spark on the same rows.
A divergence here would mean the oracle greenness was a property of
TPC-H data, not of the operators.
"""

from __future__ import annotations

import random
import string

import duckdb
from pyspark.sql import functions as F


def test_cross_engine_levenshtein_parity(spark):
    rng = random.Random(42)
    alphabet = string.ascii_lowercase + " "
    base = ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 24)))
            for _ in range(60)]
    pairs = []
    for s in base:
        # near variants: delete, insert, substitute, transpose, repeat
        variants = [s]
        if s:
            i = rng.randrange(len(s))
            variants.append(s[:i] + s[i + 1:])
            variants.append(s[:i] + rng.choice(alphabet) + s[i:])
            variants.append(s[:i] + rng.choice(alphabet) + s[i + 1:])
            if len(s) > 1:
                j = max(i - 1, 0)
                variants.append(s[:j] + s[j + 1] + s[j] + s[j + 2:]
                                if j + 2 <= len(s) else s)
        variants.append(s + s)
        pairs.extend((s, v) for v in variants)
    pairs.extend((a, b) for a in base[:10] for b in base[:10])

    sdf = spark.createDataFrame(pairs, "a STRING, b STRING").select(
        "a", "b", F.levenshtein("a", "b").alias("d")
    )
    got = {(r["a"], r["b"]): r["d"] for r in sdf.collect()}
    con = duckdb.connect()
    for (a, b), d in got.items():
        dd = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert dd == d, (a, b, d, dd)


def test_cross_engine_hll_register_parity(spark):
    from community_detection_flink_spark.operators.sketches import hll_portable

    rng = random.Random(7)
    keys = list({rng.randrange(0, 2**62) for _ in range(3000)})
    sdf = spark.createDataFrame([(k,) for k in keys], "k LONG")
    got = sorted(
        (r["register"], r["max_rank"])
        for r in hll_portable(sdf, "k").collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(k BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(k,) for k in keys])
    want = sorted(
        map(
            tuple,
            con.execute(
                """
                WITH h AS (
                  SELECT ((k % 2147483647) * 1103515245 + 12345)
                         % 2147483647 AS h FROM t
                ),
                r AS (
                  SELECT h % 64 AS register,
                    CASE WHEN h // 64 = 0 THEN 26
                         ELSE 26 - length(bin(h // 64)) END AS rank
                  FROM h
                )
                SELECT register, CAST(MAX(rank) AS BIGINT)
                FROM r GROUP BY register
                """
            ).fetchall(),
        )
    )
    assert got == want
