"""Triangle enumeration and per-vertex triangle counts (SURVEY.md I1/A1/A2/A7).

Replaces the reference's 4-superstep Pregel triangle counter
(``CountTriangle.scala:17-117``) with a degree-oriented DataFrame plan —
the same DWCC-paper optimization #1 the reference implements
(``CountTriangle.scala:59-69``: only send adjacency lists "up" the
degree order), but expressed relationally:

  1. orient every undirected edge from its lower-(degree, id) endpoint
     to its higher one — each triangle then has exactly ONE oriented
     wedge apex, so it is enumerated exactly once;
  2. build ORIENTED adjacency lists (only higher-ordered neighbors) —
     a vertex of degree d keeps at most O(sqrt(E)) oriented neighbors
     regardless of d, which bounds skew from heavy hitters;
  3. one self-join + ``array_intersect`` per oriented edge enumerates
     triangles; per-vertex counts are an ``explode`` + hash aggregate.

Everything is built-in JVM expressions (whole-stage codegen); the only
shuffles are the degree aggregate, the orientation joins, and the final
count — all keyed on vertex id, which AQE coalesces/reuses.

Input convention: ``edges`` is the symmetrized doubled-edge set
(``sources/edges.py``), columns ``src``, ``dst``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degrees(edges: DataFrame) -> DataFrame:
    """A2 — per-vertex degree.  With doubled edges, counting per ``src``
    sees each neighbor once (no ÷2: contrast ``DistributedWCC.scala:128``)."""
    return edges.groupBy(F.col("src").alias("vId")).agg(F.count("*").alias("degree"))


def adjacency_lists(edges: DataFrame, sort: bool = False) -> DataFrame:
    """A1 — per-vertex neighbor list (``CountTriangle.scala:21-26``)."""
    adj = F.collect_list("dst")
    if sort:
        adj = F.array_sort(adj)
    return edges.groupBy(F.col("src").alias("vId")).agg(adj.alias("adj"))


def _oriented(edges: DataFrame) -> DataFrame:
    """Orient each undirected edge lower→higher by (degree, id)."""
    deg = degrees(edges)
    e = (
        edges.join(deg.withColumnsRenamed({"vId": "src", "degree": "deg_src"}), "src")
        .join(deg.withColumnsRenamed({"vId": "dst", "degree": "deg_dst"}), "dst")
    )
    lower = F.struct(F.col("deg_src").alias("d"), F.col("src").alias("v"))
    higher = F.struct(F.col("deg_dst").alias("d"), F.col("dst").alias("v"))
    return e.where(lower < higher).select("src", "dst")


def triangles(edges: DataFrame, mat=None) -> DataFrame:
    """Enumerate each triangle exactly once as ``(u, v, w)``.

    ``u < v`` in the (degree, id) order and ``w`` above both; the row
    exists for the oriented edge (u, v) whose oriented adjacency lists
    intersect in ``w``.

    ``mat`` (optional ``plans.Materializer``): materializes the
    oriented edge set, which otherwise recomputes once for the
    adjacency build and once for the pair join.
    """
    oe = _oriented(edges)
    if mat is not None:
        oe = mat.cache(oe, "tri-oriented")
    adjo = oe.groupBy(F.col("src").alias("vId")).agg(F.collect_list("dst").alias("adj"))
    pairs = (
        oe.join(adjo.withColumnsRenamed({"vId": "src", "adj": "adj_u"}), "src")
        .join(adjo.withColumnsRenamed({"vId": "dst", "adj": "adj_v"}), "dst", "left")
        .select(
            F.col("src").alias("u"),
            F.col("dst").alias("v"),
            F.array_intersect("adj_u", F.coalesce("adj_v", F.array())).alias("common"),
        )
    )
    return pairs.select("u", "v", F.explode("common").alias("w"))


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-vertex triangle count ``t`` over ALL vertices (0 included).

    Matches the Pregel result at ``CountTriangle.scala:94-102``.
    """
    tri = triangles(edges)
    t = (
        tri.select(F.explode(F.array("u", "v", "w")).alias("vId"))
        .groupBy("vId")
        .agg(F.count("*").cast("int").alias("t"))
    )
    verts = edges.select(F.col("src").alias("vId")).distinct()
    return verts.join(t, "vId", "left").select(
        "vId", F.coalesce("t", F.lit(0)).alias("t")
    )


def triangle_edges(tri: DataFrame) -> DataFrame:
    """Doubled-edge set of edges participating in ≥1 triangle.

    This is exactly the G1 subgraph edge predicate ("endpoints share a
    neighbor", ``DistributedWCC.scala:109-112``): an edge whose
    endpoints share a neighbor is an edge of some triangle.
    """
    half = (
        tri.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionByName(tri.select(F.col("u").alias("src"), F.col("w").alias("dst")))
        .unionByName(tri.select(F.col("v").alias("src"), F.col("w").alias("dst")))
    )
    both = half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return both.dropDuplicates(["src", "dst"])
