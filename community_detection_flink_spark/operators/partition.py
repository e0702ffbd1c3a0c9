"""P2 initial partition — center election (SURVEY.md I3).

Reference: ``DistributedWCC.performInitialPartition``
(``DistributedWCC.scala:138-255``) — a Gelly vertex-centric iteration
(≤50 supersteps) whose fixed point is the greedy maximal-independent-set
partition over the total vertex order (cc, vt, vId)
(``VertexMessage.scala:46-48``):

  * a vertex is a CENTER  ⟺  no strictly higher-ordered neighbor is a
    center;
  * a non-center joins its highest-ordered center neighbor
    (``DistributedWCC.scala:187-198``).

PySpark has no Pregel (GraphX is JVM-only), so we compute the same
fixed point with an iterative DataFrame loop — the SURVEY.md M4
fallback.  Each round decides every vertex whose higher-ordered
neighborhood is fully decided, so rounds = longest strictly-increasing
path among undecided chains (small for real graphs); capped at 50 like
the reference.

Scale discipline: the "is my neighbor higher-ordered?" join is computed
ONCE (the order never changes), materialized, and each round only joins
that static edge list against the tiny (vId, decided, isCenter) state,
materialized per round via ``plans.Materializer`` (see
``plans/iteration.py`` for why not ``localCheckpoint``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from community_detection_flink_spark.plans.iteration import Materializer

MAX_ITERATIONS = 50  # DistributedWCC.scala:143


def _ord(cc_name, vt_name, id_name):
    """Total vertex order (cc, vt, vId) as a comparable struct
    (``VertexMessage.scala:46-48``).  Field names normalized so struct
    comparison resolves."""
    return F.struct(
        F.col(cc_name).alias("o_cc"),
        F.col(vt_name).alias("o_vt"),
        F.col(id_name).alias("o_id"),
    )


def initial_partition(
    vertices: DataFrame,
    clean_edges: DataFrame,
    max_iterations: int = MAX_ITERATIONS,
    mat: Materializer | None = None,
) -> DataFrame:
    """Return ``vertices`` + ``cId`` column (center election result)."""
    mat = mat or Materializer(vertices.sparkSession)
    v = vertices.select("vId", "t", "vt", "cc")

    key = v.select("vId", "cc", "vt")
    ew = (
        clean_edges.join(
            key.withColumnsRenamed({"vId": "src", "cc": "cc_s", "vt": "vt_s"}), "src"
        ).join(
            key.withColumnsRenamed({"vId": "dst", "cc": "cc_d", "vt": "vt_d"}), "dst"
        )
    )
    # partitioned by src so each round's per-src aggregate is map-side
    # only (the tiny state side broadcasts; the join on dst preserves
    # this layout)
    higher = mat.cache(
        ew.where(_ord("cc_d", "vt_d", "dst") > _ord("cc_s", "vt_s", "src"))
        .select("src", "dst")
        .repartition("src"),
        "higher",
    )

    state = mat(
        v.select("vId", F.lit(False).alias("decided"), F.lit(False).alias("isCenter")),
        "mis-state",
    )

    for _ in range(max_iterations):
        prev_state = state
        nbr = higher.join(
            state.withColumnsRenamed(
                {"vId": "dst", "decided": "d_dec", "isCenter": "d_ctr"}
            ),
            "dst",
        )
        agg = nbr.groupBy(F.col("src").alias("vId")).agg(
            F.max(F.when(~F.col("d_dec"), True).otherwise(False)).alias("anyUndecided"),
            F.max(F.when(F.col("d_dec") & F.col("d_ctr"), True).otherwise(False)).alias(
                "anyCenterHigher"
            ),
        )
        state = (
            state.join(agg, "vId", "left")
            .select(
                "vId",
                F.coalesce("anyUndecided", F.lit(False)).alias("anyUndecided"),
                F.coalesce("anyCenterHigher", F.lit(False)).alias("anyCenterHigher"),
                "decided",
                "isCenter",
            )
            .select(
                "vId",
                (
                    F.col("decided")
                    | F.col("anyCenterHigher")
                    | ~F.col("anyUndecided")
                ).alias("decided"),
                F.when(F.col("decided"), F.col("isCenter"))
                .otherwise(~F.col("anyCenterHigher") & ~F.col("anyUndecided"))
                .alias("isCenter"),
            )
        )
        # convergence count rides along the state write (Observation =
        # accumulator-style metrics, zero extra jobs per round)
        obs = Observation()
        state = state.observe(
            obs, F.sum(F.when(~F.col("decided"), 1).otherwise(0)).alias("undec")
        )
        state = mat(state, "mis-state")
        mat.drop(prev_state)  # superseded round file
        if (obs.get["undec"] or 0) == 0:
            break

    # Assign communities: join each vertex's center neighbors, take the
    # highest-ordered one; adopt it iff it outranks the vertex itself
    # (DistributedWCC.scala:187-198).  Centers fall through to vId.
    centers = state.where("isCenter").select("vId")
    center_nbrs = (
        ew.join(centers.withColumnsRenamed({"vId": "dst"}), "dst")
        .groupBy(F.col("src").alias("vId"))
        .agg(F.max(_ord("cc_d", "vt_d", "dst")).alias("bestCtr"))
    )
    out = (
        v.join(center_nbrs, "vId", "left")
        .select(
            "vId",
            "t",
            "vt",
            "cc",
            F.when(
                F.col("bestCtr").isNotNull()
                & (F.col("bestCtr") > _ord("cc", "vt", "vId")),
                F.col("bestCtr.o_id"),
            )
            .otherwise(F.col("vId"))
            .alias("cId"),
        )
    )
    return out
