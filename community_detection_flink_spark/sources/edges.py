"""Edge-list sources and graph normalization (SURVEY.md S1-S4).

Reference semantics (re-expressed, not translated):
  * ``CSVGraph.scala:24-40`` — 2-column space-delimited CSV, self-loops
    dropped, undirected graph stored as BOTH directed copies, duplicates
    removed.  The doubled-edge convention is kept engine-wide: every
    undirected edge {u,v} with u != v appears exactly twice, as (u,v)
    and (v,u).  Per-vertex aggregations over ``src`` then see each
    neighbor exactly once — no ÷2 degree fix-ups needed (the reference
    needs one at ``DistributedWCC.scala:128`` because Gelly getDegrees
    counts both directions).
  * ``CSVGraph.scala:43`` — the vertex set is inferred from edge
    endpoints.

Scale notes: symmetrize is a narrow union + one shuffle for the
dedup; the dedup shuffle hash-partitions on (src, dst) which is also
the natural layout for the downstream per-src aggregations, so AQE
reuses it.  Nothing here touches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EDGE_SCHEMA = "src LONG, dst LONG"


def load_edges_csv(spark: SparkSession, path: str, delimiter: str = " ") -> DataFrame:
    """S1 — raw 2-column edge-list scan (``CSVGraph.scala:24-28``)."""
    return spark.read.schema(EDGE_SCHEMA).option("delimiter", delimiter).csv(path)


def symmetrize_edges(raw: DataFrame) -> DataFrame:
    """S2+S3 — drop self-loops, emit both directions, dedup.

    (``CSVGraph.scala:32-40``).  Input may contain duplicates and
    reversed duplicates; output is the canonical doubled-edge set.
    """
    e = raw.where(F.col("src") != F.col("dst"))
    both = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return both.dropDuplicates(["src", "dst"])


def vertices_of(edges: DataFrame) -> DataFrame:
    """S4 — vertex set inferred from edge endpoints (``CSVGraph.scala:43``).

    With symmetrized edges every endpoint appears as ``src``, so one
    projection suffices (no union of both columns needed).
    """
    return edges.select(F.col("src").alias("vId")).distinct()


def co_purchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive an undirected part co-purchase graph from the star schema.

    Two parts are linked iff they appear in the same order (FIXTURES.md
    "graph oracle trick") — gives the engine a DuckDB-checkable graph
    over the driver's parquet.  Already symmetric by construction
    (the self-join emits both directions), self-loops excluded.
    """
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    ).dropDuplicates(["l_orderkey", "l_partkey"])
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst"))
    return (
        a.join(b, "ok")
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .dropDuplicates(["src", "dst"])
    )
