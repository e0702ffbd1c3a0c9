"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship WCC run on sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2 +
§2.10 extensions); each callable takes (spark, sf_dir) → DataFrame.
``oracle_sql()`` — exact DuckDB equivalents.  Hashing is portable
(md5-derived), float folds use identical left-fold op order, and sums
of money-like doubles go through DECIMAL — so even MinHash/SimHash/
cosine queries hash-match bit-for-bit.

Graph queries run on the part co-purchase graph derived from
``lineitem`` (FIXTURES.md "graph oracle trick"); deterministic
community labels ``cId = vId % 10`` stand in for a partition when the
operator under test consumes one.  The full WCC pipeline itself
(iterative, not SQL-expressible) is exposed as rows-only queries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from community_detection_flink_spark.sources.edges import co_purchase_edges
from community_detection_flink_spark.sources.tables import load_table
from community_detection_flink_spark.operators.triangles import (
    degrees,
    triangles,
    triangle_counts,
)
from community_detection_flink_spark.operators.preprocess import preprocess
from community_detection_flink_spark.operators.community import (
    community_stats,
    edges_with_communities,
    vertex_community_degrees,
)
from community_detection_flink_spark.operators.refinement import run_wcc
from community_detection_flink_spark.operators import components as C
from community_detection_flink_spark.operators import dedup as D
from community_detection_flink_spark.operators import similarity as S
from community_detection_flink_spark.operators import textual as T
from community_detection_flink_spark.operators import multimodal as M
from community_detection_flink_spark.operators.layout import z_interleave_sql
from community_detection_flink_spark.streaming import windows as W

# ----------------------------------------------------------------------
# shared graph state (per sf_dir, materialized once per session)
# ----------------------------------------------------------------------

_GRAPH_CACHE: dict[str, tuple[DataFrame, DataFrame, DataFrame]] = {}
_TRI_CACHE: dict[str, DataFrame] = {}
_WCC_CACHE: dict[str, object] = {}
_PAIRS_CACHE: dict[str, DataFrame] = {}
_IVF_CACHE: dict[str, object] = {}


_PART_EVENTS_CACHE: dict[str, str] = {}
_BUCKETED_REL_CACHE: dict[str, tuple[str, str]] = {}
_SUPPLIER_COUNT_CACHE: dict[str, int] = {}


def _partsupp(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic ``partsupp`` synthesis (TPC-H dbgen analog).

    The driver testdata ships 9 tables and no partsupp, which blocked
    TPC-H q2/q9/q11/q16/q20 through round 6 (COVERAGE.md).  Instead of
    writing a fixture (testdata is read-only), both engines synthesize
    the SAME table from ``part`` × pure integer arithmetic, mirroring
    dbgen's shape: every part gets exactly 4 suppliers at distinct
    offsets ``i*(S div 4)`` rotated by ``p_partkey div S`` (distinct
    for every tested S: 10/100/1000), an integral availqty in 1..9999,
    and a cents-exact supplycost in 1.00..1000.00 built as an integer
    number of cents then converted through DECIMAL — no float op
    anywhere, so Spark and DuckDB agree bit-for-bit.  The DuckDB twin
    is ``_PS_SQL``.

    At 100 TB this is a generated dimension: narrow (4 rows/part),
    produced by a projection+explode of ``part`` with no shuffle, and
    joins against it hash-partition on (ps_partkey, ps_suppkey) like a
    real partsupp scan would.
    """
    if sf not in _SUPPLIER_COUNT_CACHE:
        _SUPPLIER_COUNT_CACHE[sf] = load_table(spark, sf, "supplier").count()
    s_count = _SUPPLIER_COUNT_CACHE[sf]
    return (
        load_table(spark, sf, "part")
        .select(
            "p_partkey",
            F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("i"),
        )
        .selectExpr(
            "p_partkey AS ps_partkey",
            f"(p_partkey + i * ({s_count} div 4) + (p_partkey div {s_count}))"
            f" % {s_count} AS ps_suppkey",
            "CAST((p_partkey * 47 + i * 31) % 9999 + 1 AS BIGINT)"
            " AS ps_availqty",
            "CAST(CAST((p_partkey * 13 + i * 7) % 99900 + 100"
            " AS DECIMAL(18,4)) / 100 AS DECIMAL(12,2)) AS ps_supplycost",
        )
    )


# DuckDB twin of _partsupp — prepend to any oracle needing partsupp.
_PS_SQL = """
WITH partsupp AS (
  SELECT p_partkey AS ps_partkey,
    (p_partkey + r.i * (sc.s // 4) + (p_partkey // sc.s)) % sc.s
      AS ps_suppkey,
    CAST((p_partkey * 47 + r.i * 31) % 9999 + 1 AS BIGINT) AS ps_availqty,
    CAST(CAST((p_partkey * 13 + r.i * 7) % 99900 + 100 AS DECIMAL(18,4))
         / 100 AS DECIMAL(12,2)) AS ps_supplycost
  FROM part, (SELECT COUNT(*) AS s FROM supplier) sc, UNNEST(range(4)) r(i)
)"""


def _cdc_sql(window: int = 8, divisor: int = 64) -> str:
    """DuckDB twin of dedup.content_defined_chunks — replays the
    identical polynomial roll (cdc_pows literals shared) and the same
    explicit append-end-boundary branch."""
    from community_detection_flink_spark.operators.dedup import cdc_pows

    pw = "[" + ", ".join(str(p) for p in cdc_pows(window)) + "]"
    return f"""
WITH c AS (SELECT doc_id, text, length(text) AS n FROM documents),
b0 AS (
  SELECT doc_id, text, n,
    list_filter(
      range({window}, GREATEST(n + 1, {window})),
      p -> list_reduce(
             list_prepend(CAST(0 AS BIGINT), list_transform(range({window}),
               j -> (CAST(ord(substr(text, CAST(p - j AS INTEGER), 1))
                          AS BIGINT)
                     * ({pw}[CAST(j AS INTEGER) + 1])) % 2147483647)),
             (a, x) -> (a + x) % 2147483647) % {divisor} = 0
    ) AS bounds
  FROM c
),
b AS (
  SELECT doc_id, text, n,
    CASE WHEN list_contains(bounds, n) THEN bounds
         ELSE list_append(bounds, n) END AS bf
  FROM b0
),
cdc_chunks AS (
  SELECT doc_id, CAST(r.i AS BIGINT) AS chunk_no,
    CASE WHEN r.i = 0 THEN CAST(1 AS BIGINT)
         ELSE bf[CAST(r.i AS INTEGER)] + 1 END AS start,
    bf[CAST(r.i AS INTEGER) + 1] AS e,
    text
  FROM b, UNNEST(range(len(bf))) r(i)
),
cdc AS (
  SELECT doc_id, chunk_no, start, e - start + 1 AS chunk_len,
    ('0x' || substr(md5(substr(text, CAST(start AS INTEGER),
                               CAST(e - start + 1 AS INTEGER))), 1, 15)
    )::BIGINT AS chunk_hash
  FROM cdc_chunks
)"""


def _jl_folds(k: int = 16, d: int = 64) -> list[str]:
    """One DuckDB index-ordered fold per projection component, sign
    literals from the same Python matrix Spark's jl_project bakes in."""
    from community_detection_flink_spark.operators.similarity import (
        jl_sign_matrix,
    )

    folds = []
    for j, row in enumerate(jl_sign_matrix(k, d)):
        lst = "[" + ", ".join("1.0" if s > 0 else "-1.0" for s in row) + "]"
        folds.append(
            f"list_reduce(list_prepend(0.0, list_transform(range({d}), "
            f"i -> CAST(embedding[CAST(i AS INTEGER) + 1] AS DOUBLE) * "
            f"({lst}[CAST(i AS INTEGER) + 1]))), (a, x) -> a + x) "
            f"AS p{j:02d}"
        )
    return folds


def _sf_tag(sf_dir: str) -> str:
    import hashlib
    import re

    # basename for readability + a short full-path hash for uniqueness:
    # two sf_dirs with the same basename (/a/sf0.01 vs /b/sf0.01) must
    # not collide on derived table names (ADVICE r3 — the bucketed-table
    # cache is keyed by full path, so colliding names would silently
    # serve the wrong dataset)
    norm = sf_dir.rstrip("/")
    base = re.sub(r"[^0-9a-zA-Z]", "_", norm.rsplit("/", 1)[-1])
    return f"{base}_{hashlib.md5(norm.encode()).hexdigest()[:8]}"


def _partitioned_events(spark: SparkSession, sf_dir: str) -> str:
    """Events landed ONCE per sf_dir as a parquet tree partitioned by
    event_type — the data-lake layout whose directory pruning makes a
    type-filtered scan read 1/5th of the bytes (PartitionFilters in the
    plan; pinned in tests/test_plans.py)."""
    import os

    # revalidate: a cached path may have been cleaned under us
    if sf_dir in _PART_EVENTS_CACHE and not os.path.isdir(_PART_EVENTS_CACHE[sf_dir]):
        del _PART_EVENTS_CACHE[sf_dir]
    if sf_dir not in _PART_EVENTS_CACHE:
        import atexit
        import shutil
        import tempfile

        from community_detection_flink_spark.sources.sinks import write_parquet

        path = tempfile.mkdtemp(prefix=f"cdfs-events-{_sf_tag(sf_dir)}-")
        atexit.register(shutil.rmtree, path, ignore_errors=True)
        write_parquet(
            load_table(spark, sf_dir, "events"), path, partition_by=["event_type"]
        )
        _PART_EVENTS_CACHE[sf_dir] = path
    return _PART_EVENTS_CACHE[sf_dir]


def _bucketed_rel(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """customer + orders bucketed by custkey into the same bucket count
    — built ONCE per sf_dir; the join and the per-customer aggregate
    then plan with ZERO Exchange (pinned in tests/test_plans.py)."""
    if sf_dir not in _BUCKETED_REL_CACHE:
        from community_detection_flink_spark.sources.bucketed import write_bucketed

        tag = _sf_tag(sf_dir)
        ct, ot = f"bk_customer_{tag}", f"bk_orders_{tag}"
        write_bucketed(
            load_table(spark, sf_dir, "customer"), ct, ["c_custkey"], 16,
            sort_keys=["c_custkey"],
        )
        write_bucketed(
            load_table(spark, sf_dir, "orders"), ot, ["o_custkey"], 16,
            sort_keys=["o_custkey"],
        )
        _BUCKETED_REL_CACHE[sf_dir] = (ct, ot)
    return _BUCKETED_REL_CACHE[sf_dir]


_FORMAT_CACHE: dict[tuple[str, str], str] = {}


def _landed_copy(spark: SparkSession, sf_dir: str, fmt: str) -> str:
    """A column subset of a driver table landed ONCE per (sf_dir, fmt)
    as a CSV or JSON directory (S1/S5 source-format coverage): the
    roundtrip queries read it back and aggregate, while the oracle
    aggregates the parquet directly — hash equality proves the
    engine's CSV/JSON sink→source path is lossless for the types
    involved (long/string/double; Java's shortest-repr double
    formatting round-trips exactly in both directions)."""
    import os

    key = (sf_dir, fmt)
    if key in _FORMAT_CACHE and not os.path.isdir(_FORMAT_CACHE[key]):
        del _FORMAT_CACHE[key]
    if key not in _FORMAT_CACHE:
        import atexit
        import shutil
        import tempfile

        path = tempfile.mkdtemp(prefix=f"cdfs-{fmt}-{_sf_tag(sf_dir)}-")
        atexit.register(shutil.rmtree, path, ignore_errors=True)
        if fmt == "csv":
            df = load_table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_orderstatus", "o_totalprice"
            )
            df.write.mode("overwrite").option("header", True).csv(path)
        elif fmt == "orc":
            df = load_table(spark, sf_dir, "lineitem").select(
                "l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice"
            )
            df.write.mode("overwrite").orc(path)
        else:
            df = load_table(spark, sf_dir, "customer").select(
                "c_custkey", "c_mktsegment", "c_acctbal"
            )
            df.write.mode("overwrite").json(path)
        _FORMAT_CACHE[key] = path
    return _FORMAT_CACHE[key]


def _ivf_index(spark: SparkSession, sf_dir: str):
    """Persisted IVF index for the embeddings table, built ONCE per
    sf_dir per session (build = one corpus scan + bucketed-by-cell
    write; every subsequent ANN query batch is pure index reads)."""
    if sf_dir not in _IVF_CACHE:
        import re

        tbl = "ivf_idx_" + re.sub(r"[^0-9a-zA-Z]", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])
        emb = load_table(spark, sf_dir, "embeddings")
        _IVF_CACHE[sf_dir] = S.build_ivf_index(emb, table=tbl)
    return _IVF_CACHE[sf_dir]


def _lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs, shared (like ``_graph``) by the
    pair query and the transitive dedup-groups query — one signature
    computation per sf_dir per session."""
    if sf_dir not in _PAIRS_CACHE:
        from community_detection_flink_spark.operators import dedup as D
        from community_detection_flink_spark.plans.iteration import Materializer

        docs = load_table(spark, sf_dir, "documents")
        _PAIRS_CACHE[sf_dir] = Materializer(spark)(
            D.minhash_lsh_pairs(docs, 8, 4, 3), "entry-lsh-pairs"
        )
    return _PAIRS_CACHE[sf_dir]


def _wcc(spark: SparkSession, sf_dir: str):
    """Full WCC result, shared by wcc_communities / wcc_stats.  Reuses
    the session-cached preprocessed graph (one triangle enumeration
    per sf_dir, not one per query family)."""
    if sf_dir not in _WCC_CACHE:
        e, v, ce = _graph(spark, sf_dir)
        _WCC_CACHE[sf_dir] = run_wcc(e, pre=(_TRI_CACHE[sf_dir], v, ce))
    return _WCC_CACHE[sf_dir]


def _graph(spark: SparkSession, sf_dir: str):
    """(edges, clean_vertices, clean_edges) for the co-purchase graph."""
    if sf_dir not in _GRAPH_CACHE:
        from community_detection_flink_spark.operators.triangles import triangles
        from community_detection_flink_spark.plans.iteration import Materializer

        mat = Materializer(spark)
        edges = mat(co_purchase_edges(spark, sf_dir), "entry-edges")
        tri = mat(triangles(edges, mat=mat), "entry-tri")
        vertices, clean = preprocess(edges, mat=mat, tri=tri)
        _GRAPH_CACHE[sf_dir] = (edges, mat(vertices, "entry-cv"), mat(clean, "entry-ce"))
        _TRI_CACHE[sf_dir] = tri
        mat.release()  # oriented-edge cache
    return _GRAPH_CACHE[sf_dir]


def _labeled(vertices: DataFrame) -> DataFrame:
    """Deterministic community labels for stats-operator tests."""
    return vertices.withColumn("cId", F.col("vId") % 10)


# ----------------------------------------------------------------------
# entry
# ----------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full WCC community detection on the sf0.001 co-purchase
    graph (E1 pipeline: preprocess → center election → refinement)."""
    edges = co_purchase_edges(spark, "/root/testdata/sf0.001")
    return run_wcc(edges).communities


# ----------------------------------------------------------------------
# Spark queries
# ----------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def g_edges(spark, sf):
        e, _, _ = _graph(spark, sf)
        return e

    def g_degrees(spark, sf):
        e, _, _ = _graph(spark, sf)
        return degrees(e).select("vId", F.col("degree").cast("long").alias("degree"))

    def g_triangle_counts(spark, sf):
        e, _, _ = _graph(spark, sf)
        return triangle_counts(e).select("vId", F.col("t").cast("long").alias("t"))

    def g_vertex_metrics(spark, sf):
        _, v, _ = _graph(spark, sf)
        return v.select(
            "vId", F.col("t").cast("long").alias("t"),
            F.col("vt").cast("long").alias("vt"), "cc",
        )

    def g_community_stats(spark, sf):
        _, v, ce = _graph(spark, sf)
        return community_stats(_labeled(v), ce).select(
            "cId", F.col("r").cast("long").alias("r"), "a",
            F.col("b").cast("long").alias("b"), "d",
        )

    def g_vertex_community_degrees(spark, sf):
        _, v, ce = _graph(spark, sf)
        return vertex_community_degrees(_labeled(v), ce).select(
            "vId", "cId", F.col("dIn").cast("long").alias("dIn")
        )

    def g_intra_degree(spark, sf):
        _, v, ce = _graph(spark, sf)
        ewc = edges_with_communities(_labeled(v), ce)
        return (
            ewc.where(F.col("c_src") == F.col("c_dst"))
            .groupBy(F.col("src").alias("vId"))
            .agg(F.count("*").cast("long").alias("vtC"))
        )

    def g_community_triangles(spark, sf):
        _, v, ce = _graph(spark, sf)
        ewc = edges_with_communities(_labeled(v), ce)
        intra = ewc.where(F.col("c_src") == F.col("c_dst")).select("src", "dst")
        tri = triangles(intra)
        return (
            tri.select(F.explode(F.array("u", "v", "w")).alias("vId"))
            .groupBy("vId")
            .agg(F.count("*").cast("long").alias("tC"))
        )

    def wcc_communities(spark, sf):
        return _wcc(spark, sf).communities

    def wcc_stats(spark, sf):
        return _wcc(spark, sf).stats.select(
            "cId", F.col("r").cast("long").alias("r"), "a",
            F.col("b").cast("long").alias("b"), "d",
        )

    def wcc_invariants(spark, sf):
        """SURVEY §5.4 invariants of the WCC result as an exact-oracle
        table (VERDICT r2 #6) — upgrades the iterative wcc_* family
        from bare row counts to a checked gate artifact.  Spark
        computes each check FROM the engine's result; the oracle
        derives the expected value FROM the raw input tables, so a
        broken labeling (missed vertex, duplicate row, dangling cId,
        stats/labeling disagreement, non-monotone accept loop —
        DistributedWCC.scala:308-321 semantics) hash-mismatches."""
        res = _wcc(spark, sf)
        comm = res.communities
        n_rows = comm.count()
        n_vertices = comm.select("vId").distinct().count()
        sum_sizes = int(
            comm.groupBy("cId").count().agg(F.sum("count")).first()[0]
        )
        orphan_cids = (
            comm.select("cId")
            .distinct()
            .join(
                comm.select(F.col("vId").alias("cId")).distinct(),
                "cId",
                "left_anti",
            )
            .count()
        )
        sizes = comm.groupBy("cId").agg(F.count("*").cast("int").alias("n"))
        stats_size_mismatch = (
            res.stats.join(sizes, "cId", "left")
            .where(F.col("n").isNull() | (F.col("n") != F.col("r")))
            .count()
        )
        hist = res.wcc_history or []
        non_monotone = sum(1 for a, b in zip(hist, hist[1:]) if b <= a)
        rows = [
            ("labeled_rows", n_rows),
            ("labeled_distinct_vertices", n_vertices),
            ("sum_community_sizes", sum_sizes),
            ("orphan_cids", orphan_cids),
            ("stats_size_mismatch", stats_size_mismatch),
            ("non_monotone_accepted_rounds", non_monotone),
        ]
        return spark.createDataFrame(
            [(k, int(v)) for k, v in rows], "invariant STRING, value LONG"
        )

    def wcc_incremental(spark, sf):
        """E2 — bulk + incremental micro-batch merge (rows-only)."""
        from community_detection_flink_spark.streaming.incremental_stream import (
            run_edge_batches,
        )

        e, _, _ = _graph(spark, sf)
        state = run_edge_batches(
            e, bulk_to_stream_ratio=0.8, n_batches=1, tri_full=_TRI_CACHE[sf]
        )
        return state.vertices.select("vId", "cId")

    def wcc_cdc(spark, sf):
        """E2 extended with the engine's deletion path (rows-only —
        iterative): bulk 80% → insert the stream batch → delete a
        slice of it again (every batch edge incident to an
        even-numbered vertex).  Exercises incremental_update AND
        incremental_delete end-to-end on driver data."""
        from community_detection_flink_spark.operators.incremental import (
            incremental_delete,
        )
        from community_detection_flink_spark.streaming.incremental_stream import (
            run_edge_batches,
        )

        e, _, _ = _graph(spark, sf)
        state = run_edge_batches(
            e, bulk_to_stream_ratio=0.8, n_batches=1, tri_full=_TRI_CACHE[sf]
        )
        # id ceiling carried on the state (edges are symmetric, so the
        # max src run_edge_batches computed IS the global max) — no
        # extra agg job here
        max_id = state.max_vertex
        dels = e.where(
            (F.col("src") >= F.lit(int(max_id * 0.8)))
            & (F.col("src") % 2 == 0)
        )
        state = incremental_delete(state, dels)
        return state.vertices.select("vId", "cId")

    def cdc_invariants(spark, sf):
        """SURVEY §5.4 invariants of the CDC (insert + delete) path as
        an exact-oracle table (VERDICT r5 #3) — upgrades ``wcc_cdc``
        from a bare row count to a checked gate artifact.  The r5
        ghost-community bug (operators/incremental.py:672) proved this
        path can diverge silently; these rows make that a hash
        mismatch.

        Flow mirrors ``wcc_cdc`` exactly: bulk 80% → insert the stream
        batch → delete every edge incident (either endpoint, the
        delete symmetrizes) to an even vertex ≥ 0.8·max_id.  Checks:

        * structural counts the oracle derives from RAW lineitem
          (vertex coverage — vertices never disappear, so the labeled
          set is the FULL graph's endpoint set; remaining doubled-edge
          count under the same predicate);
        * internal consistency (Σ sizes, orphan cIds, stats-vs-labels
          agreement) — oracle-pinned to 0;
        * insert+delete ≡ direct-recompute parity on everything the
          delete algebra claims exact (tests/test_incremental_delete):
          per-vertex (t, vt, cc), cleaned edges, triangle list.  The
          direct side is derived INDEPENDENTLY of the engine's
          semi-join deltas: an edge {a,b} dies iff an endpoint is bad
          (≥ thr and even), so a triangle survives iff NONE of its
          three corners is bad — a pure filter of the full-graph
          triangle list, fed to a fresh ``preprocess`` of the
          remaining edges."""
        from community_detection_flink_spark.operators.incremental import (
            incremental_delete,
        )
        from community_detection_flink_spark.sources.edges import (
            symmetrize_edges,
        )
        from community_detection_flink_spark.streaming.incremental_stream import (
            run_edge_batches,
        )

        e, _, _ = _graph(spark, sf)
        state = run_edge_batches(
            e, bulk_to_stream_ratio=0.8, n_batches=1, tri_full=_TRI_CACHE[sf]
        )
        thr = int(state.max_vertex * 0.8)
        dels = e.where(
            (F.col("src") >= F.lit(thr)) & (F.col("src") % 2 == 0)
        )
        state = incremental_delete(state, dels)

        def bad(c):
            return (F.col(c) >= F.lit(thr)) & (F.col(c) % 2 == 0)

        # r10 (VERDICT r9 #7): U ops — re-assert a deterministic slice
        # of the SURVIVING edges through the CDC update path (U expands
        # to delete-stale + re-insert inside the batch,
        # streaming.apply_cdc_batch).  On an unweighted edge set a U of
        # an existing edge must be a perfect no-op, so every direct-
        # recompute parity row below now also pins U-parity; the row
        # count of the U batch itself is oracle-pinned so the phase
        # can't silently skip.
        from community_detection_flink_spark.streaming.incremental_stream import (
            apply_cdc_batch,
        )

        ups = e.where(
            ~bad("src") & ~bad("dst")
            & (F.col("src") % 97 == 1) & (F.col("src") < F.col("dst"))
        ).select("src", "dst", F.lit("U").alias("op"))
        n_u = ups.count()
        state = apply_cdc_batch(state, ups)

        comm = state.vertices.select("vId", "cId")
        n_rows = state.vertices.count()
        n_vertices = comm.select("vId").distinct().count()
        sum_sizes = int(
            comm.groupBy("cId").count().agg(F.sum("count")).first()[0]
        )
        orphan_cids = (
            comm.select("cId")
            .distinct()
            .join(
                comm.select(F.col("vId").alias("cId")).distinct(),
                "cId",
                "left_anti",
            )
            .count()
        )
        sizes = (
            state.vertices.where("t > 0")
            .groupBy("cId")
            .agg(F.count("*").cast("int").alias("n"))
        )
        stats_size_mismatch = (
            state.stats.join(sizes, "cId", "full")
            .where(
                F.col("n").isNull()
                | F.col("r").isNull()
                | (F.col("n") != F.col("r"))
            )
            .count()
        )
        deleted_edges_present = state.edges.where(
            bad("src") | bad("dst")
        ).count()
        edge_rows = state.edges.count()

        # ---- independent direct recompute of the remaining graph ----
        remaining = e.join(
            symmetrize_edges(dels), ["src", "dst"], "left_anti"
        )
        tri_direct = _TRI_CACHE[sf].where(
            ~bad("u") & ~bad("v") & ~bad("w")
        )
        v_direct, clean_direct = preprocess(remaining, tri=tri_direct)
        a = state.vertices.select(
            "vId",
            F.col("t").alias("ta"),
            F.col("vt").alias("vta"),
            F.round("cc", 9).alias("cca"),
        )
        b = v_direct.select(
            "vId",
            F.col("t").alias("tb"),
            F.col("vt").alias("vtb"),
            F.round("cc", 9).alias("ccb"),
        )
        vertex_stats_mismatch = (
            a.join(b, "vId", "full")
            .where(
                F.when(
                    F.col("tb").isNull(),
                    # dropped from the cleaned graph ⇒ state must have
                    # reverted it to zeroed stats
                    (F.col("ta") != 0)
                    | (F.col("vta") != 0)
                    | (F.col("cca") != 0.0),
                )
                .when(F.col("ta").isNull(), F.lit(True))
                .otherwise(
                    (F.col("ta") != F.col("tb"))
                    | (F.col("vta") != F.col("vtb"))
                    | (F.col("cca") != F.col("ccb"))
                )
            )
            .count()
        )
        clean_edge_diff = (
            state.clean_edges.join(
                clean_direct, ["src", "dst"], "left_anti"
            ).count()
            + clean_direct.join(
                state.clean_edges, ["src", "dst"], "left_anti"
            ).count()
        )
        def canon_tri(tri):
            # triangle corners are stored in arbitrary orientation —
            # canonicalize to (min, mid, max) before set comparison
            lo = F.least("u", "v", "w")
            hi = F.greatest("u", "v", "w")
            return tri.select(
                lo.alias("u"),
                (F.col("u") + F.col("v") + F.col("w") - lo - hi).alias("v"),
                hi.alias("w"),
            )

        tri_a, tri_b = canon_tri(state.tri), canon_tri(tri_direct)
        tri_diff = (
            tri_a.join(tri_b, ["u", "v", "w"], "left_anti").count()
            + tri_b.join(tri_a, ["u", "v", "w"], "left_anti").count()
        )

        rows = [
            ("labeled_rows", n_rows),
            ("labeled_distinct_vertices", n_vertices),
            ("sum_community_sizes", sum_sizes),
            ("orphan_cids", orphan_cids),
            ("stats_size_mismatch", stats_size_mismatch),
            ("deleted_edges_present", deleted_edges_present),
            ("edge_rows", edge_rows),
            ("vertex_stats_mismatch_vs_direct", vertex_stats_mismatch),
            ("clean_edge_diff_vs_direct", clean_edge_diff),
            ("tri_diff_vs_direct", tri_diff),
            ("u_reassert_edges", n_u),
        ]
        return spark.createDataFrame(
            [(k, int(v)) for k, v in rows], "invariant STRING, value LONG"
        )

    def wcc_delete_invariants(spark, sf):
        """Delete-path invariants in ISOLATION (VERDICT r11 #6).
        ``cdc_invariants`` wraps the delete between an insert batch and
        a U-reassert; this query certifies ``incremental_delete``
        (operators/incremental.py:796) alone: bulk-prepare the FULL
        graph, delete one deterministic batch (every edge with
        ``(src + dst) % 7 == 3`` — symmetric under endpoint swap), and
        compare every carried structure against an INDEPENDENT direct
        recompute of the remaining graph.  The direct side never sees
        the engine's semi-join deltas: a triangle survives iff none of
        its three undirected edges matches the predicate — a pure
        filter of the full-graph triangle list fed to a fresh
        ``preprocess`` of the remaining edges."""
        from community_detection_flink_spark.operators.incremental import (
            incremental_delete,
            prepare,
        )
        from community_detection_flink_spark.sources.edges import (
            symmetrize_edges,
        )

        e, _, _ = _graph(spark, sf)
        state = prepare(e, tri=_TRI_CACHE[sf])
        dels = e.where(
            ((F.col("src") + F.col("dst")) % 7 == 3)
            & (F.col("src") < F.col("dst"))
        )
        n_del_doubled = 2 * dels.count()
        state = incremental_delete(state, dels)

        comm = state.vertices.select("vId", "cId")
        n_rows = state.vertices.count()
        n_vertices = comm.select("vId").distinct().count()
        sum_sizes = int(
            comm.groupBy("cId").count().agg(F.sum("count")).first()[0]
        )
        orphan_cids = (
            comm.select("cId")
            .distinct()
            .join(
                comm.select(F.col("vId").alias("cId")).distinct(),
                "cId",
                "left_anti",
            )
            .count()
        )
        sizes = (
            state.vertices.where("t > 0")
            .groupBy("cId")
            .agg(F.count("*").cast("int").alias("n"))
        )
        stats_size_mismatch = (
            state.stats.join(sizes, "cId", "full")
            .where(
                F.col("n").isNull()
                | F.col("r").isNull()
                | (F.col("n") != F.col("r"))
            )
            .count()
        )
        deleted_edges_present = state.edges.where(
            (F.col("src") + F.col("dst")) % 7 == 3
        ).count()
        edge_rows = state.edges.count()
        # a vertex whose last triangle died must revert to a singleton
        t_zero_label_violations = state.vertices.where(
            (F.col("t") == 0) & (F.col("cId") != F.col("vId"))
        ).count()

        # ---- independent direct recompute of the remaining graph ----
        remaining = e.join(
            symmetrize_edges(dels), ["src", "dst"], "left_anti"
        )

        def edge_dead(a, b):
            return (F.col(a) + F.col(b)) % 7 == 3

        tri_direct = _TRI_CACHE[sf].where(
            ~edge_dead("u", "v") & ~edge_dead("u", "w")
            & ~edge_dead("v", "w")
        )
        v_direct, clean_direct = preprocess(remaining, tri=tri_direct)
        a = state.vertices.select(
            "vId",
            F.col("t").alias("ta"),
            F.col("vt").alias("vta"),
            F.round("cc", 9).alias("cca"),
        )
        b = v_direct.select(
            "vId",
            F.col("t").alias("tb"),
            F.col("vt").alias("vtb"),
            F.round("cc", 9).alias("ccb"),
        )
        vertex_stats_mismatch = (
            a.join(b, "vId", "full")
            .where(
                F.when(
                    F.col("tb").isNull(),
                    (F.col("ta") != 0)
                    | (F.col("vta") != 0)
                    | (F.col("cca") != 0.0),
                )
                .when(F.col("ta").isNull(), F.lit(True))
                .otherwise(
                    (F.col("ta") != F.col("tb"))
                    | (F.col("vta") != F.col("vtb"))
                    | (F.col("cca") != F.col("ccb"))
                )
            )
            .count()
        )
        clean_edge_diff = (
            state.clean_edges.join(
                clean_direct, ["src", "dst"], "left_anti"
            ).count()
            + clean_direct.join(
                state.clean_edges, ["src", "dst"], "left_anti"
            ).count()
        )

        def canon_tri(tri):
            lo = F.least("u", "v", "w")
            hi = F.greatest("u", "v", "w")
            return tri.select(
                lo.alias("u"),
                (F.col("u") + F.col("v") + F.col("w") - lo - hi).alias("v"),
                hi.alias("w"),
            )

        tri_a, tri_b = canon_tri(state.tri), canon_tri(tri_direct)
        tri_diff = (
            tri_a.join(tri_b, ["u", "v", "w"], "left_anti").count()
            + tri_b.join(tri_a, ["u", "v", "w"], "left_anti").count()
        )

        rows = [
            ("labeled_rows", n_rows),
            ("labeled_distinct_vertices", n_vertices),
            ("sum_community_sizes", sum_sizes),
            ("orphan_cids", orphan_cids),
            ("stats_size_mismatch", stats_size_mismatch),
            ("deleted_edge_rows", n_del_doubled),
            ("deleted_edges_present", deleted_edges_present),
            ("edge_rows", edge_rows),
            ("t_zero_label_violations", t_zero_label_violations),
            ("vertex_stats_mismatch_vs_direct", vertex_stats_mismatch),
            ("clean_edge_diff_vs_direct", clean_edge_diff),
            ("tri_diff_vs_direct", tri_diff),
        ]
        return spark.createDataFrame(
            [(k, int(v)) for k, v in rows], "invariant STRING, value LONG"
        )

    def wcc_incremental_localized(spark, sf):
        """E2 with LOCALIZED micro-batches and batch-neighborhood
        (scoped) refinement — rows-only, iterative (VERDICT r3 #2/#3).
        Runs on the clustered-graph fixture
        (``sources.synthetic.clustered_graph``) because that is the
        regime where the scoped path actually engages: the co-purchase
        graph is dense small-world (avg degree ≈ 115), every batch
        neighborhood closes over >50% of it, and the scope probe
        correctly falls back to whole-graph rounds there.  The splice
        algebra behind the returned labels is exactness-pinned by
        tests/test_incremental_localized.py; scope telemetry is
        recorded per bench round (wcc_incremental_localized_clustered
        in BENCH_r{N})."""
        from community_detection_flink_spark.operators.incremental import (
            incremental_update,
            prepare,
        )
        from community_detection_flink_spark.sources.synthetic import clustered_graph
        from community_detection_flink_spark.streaming.incremental_stream import (
            localized_batches,
        )

        state = prepare(clustered_graph(spark, 200, 10))
        state.max_vertex = 200 * 10 - 1
        for batch in localized_batches(state, n_batches=2, new_per_batch=20):
            state = incremental_update(state, batch)
        return state.vertices.select("vId", "cId")

    def rel_csv_roundtrip(spark, sf):
        """S1+S5 source-format parity (round 4): orders landed as CSV
        with header, read back with an explicit schema, aggregated.
        The oracle aggregates the PARQUET directly, so a hash match
        proves the CSV sink→source path loses nothing (the reference
        is CSV-native, ``CSVGraph.scala:23-45`` — this pins the same
        fidelity for the engine's CSV path on typed columns)."""
        path = _landed_copy(spark, sf, "csv")
        o = (
            spark.read.schema(
                "o_orderkey LONG, o_orderstatus STRING, o_totalprice DOUBLE"
            )
            .option("header", True)
            .csv(path)
        )
        return o.groupBy("o_orderstatus").agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
            F.min("o_orderkey").alias("first_order"),
        )

    def rel_json_roundtrip(spark, sf):
        """S5+ JSON source-format parity (round 4): customer landed as
        JSON lines, read back, aggregated; oracle reads the parquet.
        Same lossless-roundtrip contract as ``rel_csv_roundtrip``."""
        path = _landed_copy(spark, sf, "json")
        c = spark.read.schema(
            "c_custkey LONG, c_mktsegment STRING, c_acctbal DOUBLE"
        ).json(path)
        return c.groupBy("c_mktsegment").agg(
            F.count("*").cast("long").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_balance"),
            F.min("c_custkey").alias("first_cust"),
        )

    def rel_grouping_sets(spark, sf):
        """A9+ GROUPING SETS (round 4) — the general form of the
        rollup/cube pair already certified; exercised through the SQL
        surface (`spark.sql`) like a warehouse user would write it."""
        load_table(spark, sf, "orders").createOrReplaceTempView("v_orders_gs")
        return spark.sql(
            """
            SELECT o_orderstatus, o_orderpriority,
                   CAST(COUNT(*) AS LONG) AS n_orders,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
            FROM v_orders_gs
            GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
            """
        )

    def doc_pii_scrub(spark, sf):
        """Text-pipeline PII scrub (round 4, ``textual.pii_scrub``):
        per-doc redaction counts plus an md5 fingerprint of the
        scrubbed text — the fingerprint makes the gate prove the
        REPLACEMENT matches the oracle byte-for-byte, not just the
        counts."""
        return T.pii_scrub(load_table(spark, sf, "documents")).drop("clean_text")

    def g_adjacency(spark, sf):
        """A1 adjacency lists, exploded to (vId, pos, neighbor) scalar
        rows so the oracle hash-check can canonicalize them (pandas
        cannot sort/hash an array<long> column)."""
        e, _, _ = _graph(spark, sf)
        from community_detection_flink_spark.operators.triangles import adjacency_lists

        return (
            adjacency_lists(e, sort=True)
            .select("vId", F.posexplode("adj").alias("pos", "neighbor"))
            .select("vId", F.col("pos").cast("long").alias("pos"), "neighbor")
        )

    def rel_distinct_counts(spark, sf):
        li = load_table(spark, sf, "lineitem")
        return li.groupBy("l_returnflag").agg(
            F.countDistinct("l_partkey").cast("long").alias("n_parts"),
            F.countDistinct("l_suppkey").cast("long").alias("n_supps"),
            F.count("*").cast("long").alias("n_rows"),
        )

    # ---------------- relational (T/J/A operator coverage) ------------

    def rel_pricing_summary(spark, sf):
        li = load_table(spark, sf, "lineitem")
        return (
            li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_base_price"),
                F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")).cast("double").alias("sum_disc_price"),
                F.count("*").cast("long").alias("count_order"),
            )
        )

    def rel_top_orders(spark, sf):
        li = load_table(spark, sf, "lineitem")
        o = load_table(spark, sf, "orders")
        return (
            li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderkey")
            .agg(
                F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")).cast("double").alias("revenue")
            )
            .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
            .limit(10)
        )

    def rel_nation_revenue(spark, sf):
        li = load_table(spark, sf, "lineitem")
        s = load_table(spark, sf, "supplier")
        n = load_table(spark, sf, "nation")
        r = load_table(spark, sf, "region")
        return (
            li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
            .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
            .groupBy("n_name")
            .agg(
                F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")).cast("double").alias("revenue"),
                F.count("*").cast("long").alias("n_items"),
            )
        )

    def rel_window_top_customers(spark, sf):
        from pyspark.sql import Window

        c = load_table(spark, sf, "customer")
        w = Window.partitionBy("c_nationkey").orderBy(
            F.col("c_acctbal").desc(), F.col("c_custkey")
        )
        return (
            c.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3)
            .select(
                F.col("c_custkey").cast("long").alias("c_custkey"),
                F.col("c_nationkey").cast("long").alias("c_nationkey"),
                "c_acctbal",
                F.col("rn").cast("long").alias("rn"),
            )
        )

    def rel_rollup_orders(spark, sf):
        o = load_table(spark, sf, "orders")
        return (
            o.rollup("o_orderpriority", "o_orderstatus")
            .agg(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
                F.count("*").cast("long").alias("n"),
            )
            .select(
                F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
                F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
                "total",
                "n",
            )
        )

    def rel_cube_orders(spark, sf):
        """A9 CUBE — all grouping-set combinations over priority/status."""
        o = load_table(spark, sf, "orders")
        return (
            o.cube("o_orderpriority", "o_orderstatus")
            .agg(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
                F.count("*").cast("long").alias("n"),
            )
            .select(
                F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
                F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
                "total",
                "n",
            )
        )

    def rel_customers_without_orders(spark, sf):
        """J5 anti-join: customers with no 1995 orders.  The year filter
        keeps the fixture non-vacuous (every customer has SOME order at
        every SF, which would make the check verify nothing)."""
        c = load_table(spark, sf, "customer")
        o = load_table(spark, sf, "orders").where(F.year("o_orderdate") == 1995)
        return c.join(
            o, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
        ).select(F.col("c_custkey").cast("long").alias("c_custkey"))

    def rel_parts_in_lineitem(spark, sf):
        p = load_table(spark, sf, "part")
        li = load_table(spark, sf, "lineitem")
        return p.join(
            li, F.col("p_partkey") == F.col("l_partkey"), "left_semi"
        ).select(F.col("p_partkey").cast("long").alias("p_partkey"))

    def rel_parts_intersect(spark, sf):
        """T7 INTERSECT: part keys present in both lineitem and orders'
        building-segment customers' purchases — here simply lineitem ∩ part."""
        p = load_table(spark, sf, "part").select(
            F.col("p_partkey").cast("long").alias("k")
        )
        li = load_table(spark, sf, "lineitem").select(
            F.col("l_partkey").cast("long").alias("k")
        )
        return p.intersect(li)

    def rel_parts_never_ordered(spark, sf):
        """T7 EXCEPT: parts never ordered in bulk (l_quantity > 45).
        The quantity filter keeps the fixture non-vacuous (every part
        appears in lineitem at every SF)."""
        p = load_table(spark, sf, "part").select(
            F.col("p_partkey").cast("long").alias("p_partkey")
        )
        li = (
            load_table(spark, sf, "lineitem")
            .where(F.col("l_quantity") > 45)
            .select(F.col("l_partkey").cast("long").alias("p_partkey"))
        )
        return p.exceptAll(li.distinct()).distinct()

    def ev_user_running(spark, sf):
        """Analytic windows: per-user running total (exact decimal
        accumulation, frame-deterministic) + gap seconds to the
        previous event (lag)."""
        from pyspark.sql import Window

        ev = load_table(spark, sf, "events")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        return ev.select(
            F.col("event_id").cast("long").alias("event_id"),
            F.col("user_id").cast("long").alias("user_id"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .over(run)
            .cast("double")
            .alias("running_value"),
            (
                F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts", 1).over(w))
            ).cast("long").alias("gap_s"),
        )

    # ---------------- events (event-time windows, json) ---------------

    def ev_tumbling(spark, sf):
        return W.tumbling_agg(load_table(spark, sf, "events"), 60)

    def ev_sliding(spark, sf):
        return W.sliding_agg(load_table(spark, sf, "events"), 60, 30)

    def ev_session(spark, sf):
        return W.session_agg(load_table(spark, sf, "events"), 30)

    def ev_json_props(spark, sf):
        return W.json_props(load_table(spark, sf, "events"))

    def ev_asof_prior_purchase(spark, sf):
        """Merge as-of join: each click event joined to the user's most
        recent prior (or simultaneous) purchase event.  One shuffle on
        user_id, in-partition sort, running last() — no range explosion
        (operators/temporal.py::asof_join)."""
        from community_detection_flink_spark.operators import temporal as TP

        ev = load_table(spark, sf, "events")
        clicks = ev.where(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts", "value"
        )
        purchases = ev.where(F.col("event_type") == "purchase").select(
            "user_id", "ts", "value"
        )
        out = TP.asof_join(
            clicks, purchases, on="user_id", how="inner", right_prefix="purchase_"
        )
        return out.select(
            "event_id", "user_id",
            F.unix_micros("ts").alias("ts_us"),
            F.unix_micros("purchase_ts").alias("purchase_ts_us"),
            "purchase_value",
        )

    def ev_funnel(spark, sf):
        """Greedy earliest-match conversion funnel view → click →
        purchase within 7 days of the first view (windowFunnel
        semantics; operators/temporal.py::funnel)."""
        from community_detection_flink_spark.operators.temporal import funnel

        return funnel(
            load_table(spark, sf, "events"),
            ["view", "click", "purchase"],
            within_seconds=7 * 86400,
        )

    def ev_range_recent_purchases(spark, sf):
        """Bucketed band join with NO equi key: per click event, the
        number of purchase events corpus-wide in the preceding hour
        (operators/temporal.py::range_count_join)."""
        from community_detection_flink_spark.operators import temporal as TP

        ev = load_table(spark, sf, "events")
        clicks = ev.where(F.col("event_type") == "click").select("event_id", "ts")
        purchases = ev.where(F.col("event_type") == "purchase").select("ts")
        return TP.range_count_join(
            clicks, purchases, band_seconds=3600, count_name="n_purchases_1h"
        ).select("event_id", "n_purchases_1h")

    # ---------------- documents (dedup + text analysis) ---------------

    def doc_exact_dedup(spark, sf):
        return D.exact_dedup(load_table(spark, sf, "documents"))

    def doc_minhash_signatures(spark, sf):
        """Signatures exploded to scalar rows for the gate hash.  The
        generator explodes the signature EXPRESSION directly: routing
        it through a named column in a prior select was measured ~2×
        slower (8.8s vs 4.8s at sf0.1) — the interpreted-HOF
        re-evaluation family, see dedup.let_col."""
        docs = load_table(spark, sf, "documents")
        sig = D._sig_col(F.col("text"), 8, 3)
        return docs.select(
            "doc_id", F.posexplode(sig).alias("pos", "h")
        ).select("doc_id", F.col("pos").cast("long").alias("pos"), "h")

    def doc_minhash_lsh_pairs(spark, sf):
        return _lsh_pairs(spark, sf)

    def doc_simhash(spark, sf):
        return D.simhash(load_table(spark, sf, "documents"), 32)

    def doc_jaccard_pairs(spark, sf):
        """Exact Jaccard near-dup pairs over word TRIGRAM shingles
        (same shingling as the MinHash pipeline) — unigram sets on the
        synthetic corpus make >70% of all pairs 'similar', which is a
        degenerate workload, not a dedup query."""
        return D.ngram_jaccard_pairs(load_table(spark, sf, "documents"), 0.5, 3)

    def doc_simhash_near_dups(spark, sf):
        return D.simhash_near_dup_pairs(
            load_table(spark, sf, "documents"), bits=32, max_hamming=3, bands=4
        )

    def doc_dedup_groups(spark, sf):
        """Transitive dedup groups: MinHash LSH pairs → distributed
        connected components (large-star/small-star) → per-doc
        canonical group.  Hash-matched against a DuckDB recursive-CTE
        transitive closure — an iterative fixed point WITH an exact
        SQL oracle."""
        docs = load_table(spark, sf, "documents")
        return C.dedup_groups(docs, _lsh_pairs(spark, sf))

    def doc_dedup_keep_best(spark, sf):
        """The dedup pipeline's final decision: one canonical
        representative per transitive near-dup group (longest document
        by n_chars, ties to the smallest doc_id) — every other group
        member is marked for drop."""
        from pyspark.sql import Window

        docs = load_table(spark, sf, "documents")
        groups = C.dedup_groups(docs, _lsh_pairs(spark, sf))
        w = Window.partitionBy("group_id").orderBy(
            F.desc("n_chars"), F.asc("doc_id")
        )
        return (
            groups.join(docs.select("doc_id", "n_chars"), "doc_id")
            .withColumn("rk", F.row_number().over(w))
            .select("doc_id", "group_id", (F.col("rk") == 1).alias("keep"))
        )

    def rel_profile_orders(spark, sf):
        """Data profiling: per-column nulls/distincts/min/max of the
        orders table in ONE fused wide aggregation (4·n_cols
        aggregates share a single scan), unpivoted with stack()."""
        from community_detection_flink_spark.operators.profile import profile_table

        return profile_table(load_table(spark, sf, "orders"))

    def rel_percentiles(spark, sf):
        """Exact distributed percentiles (linear interpolation — the
        same semantics as DuckDB's quantile_cont, hash-matched
        bit-for-bit).  The approximate path for 100 TB is
        percentile_approx over the same plan shape."""
        return (
            load_table(spark, sf, "lineitem")
            .groupBy("l_returnflag")
            .agg(
                F.expr(
                    "percentile(l_extendedprice, array(0.25, 0.5, 0.75, 0.95))"
                ).alias("q")
            )
            .select(
                "l_returnflag",
                F.col("q")[0].alias("p25"),
                F.col("q")[1].alias("p50"),
                F.col("q")[2].alias("p75"),
                F.col("q")[3].alias("p95"),
            )
        )

    def rel_skewed_agg(spark, sf):
        """Two-phase skew-safe aggregation (plans/skew.py::salted_agg)
        as a first-class query: l_returnflag has 3 values over the
        whole lineitem table — the canonical hot-key groupBy.  Results
        are identical to the plain groupBy (the oracle)."""
        from community_detection_flink_spark.plans.skew import salted_agg

        li = load_table(spark, sf, "lineitem").select(
            "l_returnflag", F.col("l_quantity").cast("decimal(18,2)").alias("q")
        )
        out = salted_agg(
            li,
            ["l_returnflag"],
            {"n": ("q", "count"), "sum_qty": ("q", "sum"), "max_qty": ("q", "max")},
            n_salt=16,
        )
        return out.select(
            "l_returnflag",
            "n",
            F.col("sum_qty").cast("double").alias("sum_qty"),
            F.col("max_qty").cast("double").alias("max_qty"),
        )

    def doc_token_stats(spark, sf):
        return T.token_stats(load_table(spark, sf, "documents"))

    def doc_quality(spark, sf):
        return T.quality_score(load_table(spark, sf, "documents"))

    def doc_lang_id(spark, sf):
        return T.lang_id(load_table(spark, sf, "documents"))

    def doc_fingerprint(spark, sf):
        return T.fingerprint(load_table(spark, sf, "documents"))

    def doc_top_ngrams(spark, sf):
        """Corpus-wide top-100 word bigrams (frequency analysis /
        contamination checks)."""
        return T.top_ngrams(load_table(spark, sf, "documents"), n=2, k=100)

    def doc_sample_split(spark, sf):
        """Deterministic md5-hash train/val/test split (80/10/10)."""
        return T.sample_split(load_table(spark, sf, "documents"))

    def doc_contamination(spark, sf):
        """Benchmark decontamination: corpus docs (source != src0)
        sharing any word 5-gram with the src0 'benchmark' set —
        broadcast the benchmark's distinct grams, stream the corpus."""
        docs = load_table(spark, sf, "documents")
        return T.contamination_flags(
            docs.where(F.col("source") != "src0"),
            docs.where(F.col("source") == "src0"),
            5,
        )

    def doc_pack_chunks(spark, sf):
        """GPT-style sequence packing: per-source concatenated token
        stream cut into 512-token training chunks (prefix-sum
        windows — no iteration, shards pack in parallel)."""
        return T.pack_chunks(load_table(spark, sf, "documents"), 512, "source")

    def doc_cross_dedup(spark, sf):
        """Cross-corpus dedup: corpus docs (source != src0) near-
        duplicating any doc of the src0 'reference' corpus — LSH bucket
        candidates, broadcast reference side, exact Jaccard verify."""
        docs = load_table(spark, sf, "documents")
        return D.cross_corpus_near_dups(
            docs.where(F.col("source") != "src0"),
            docs.where(F.col("source") == "src0"),
            8, 4, 3, 0.5,
        )

    def doc_repetition(spark, sf):
        """Gopher-style within-document repetition signals
        (dup-word / top-bigram / dup-trigram fractions + the published
        flag thresholds)."""
        return T.repetition_stats(load_table(spark, sf, "documents"))

    def doc_stratified_sample(spark, sf):
        """Deterministic per-source reservoir: the 10 smallest
        md5(salt, doc_id) docs per source — engine-stable sampling."""
        return T.stratified_sample(load_table(spark, sf, "documents"), 10)

    # ---------------- embeddings (similarity search) ------------------

    def emb_quantize(spark, sf):
        """Int8-range min-max quantization of the embedding store
        (exploded to scalar rows; bit-exact double arithmetic)."""
        return S.quantize_int8(load_table(spark, sf, "embeddings"))

    def emb_cosine_topk(spark, sf):
        emb = load_table(spark, sf, "embeddings")
        return S.cosine_topk(emb, emb.where(F.col("vec_id") < 10), 5)

    def emb_near_dups(spark, sf):
        """Exact cosine near-dup pairs within a blocking key (label):
        the Σ per-block n² shape that replaces corpus n² at scale."""
        emb = load_table(spark, sf, "embeddings")
        return D.embedding_near_dups_blocked(emb, "label", threshold=0.35)

    def emb_lsh_ann(spark, sf):
        emb = load_table(spark, sf, "embeddings")
        return S.ann_topk_lsh(emb, emb.where(F.col("vec_id") < 10), 5)

    def emb_ivf_ann(spark, sf):
        """IVF ANN over the PERSISTED index: the index (centroids +
        cell-bucketed corpus table) is built once per sf_dir per
        session via `_ivf_index`; the query plan reads it with no
        corpus count / centroid sample / cell-assignment stage
        (VERDICT r2 #3; plan asserted in tests/test_ivf_index.py).
        Differential-oracled since r9: the DuckDB oracle recomputes
        the md5 centroid sample, normalization, cell assignment and
        probe routing from scratch (see `_ivf_route_sql`)."""
        emb = load_table(spark, sf, "embeddings")
        idx = _ivf_index(spark, sf)
        return S.ann_topk_ivf(emb, emb.where(F.col("vec_id") < 10), 5, index=idx)

    def emb_ann_quality(spark, sf):
        """The ANN quality CONTRACT as a gate-checkable artifact: both
        approximate paths (multi-probe sign-LSH, persisted-index IVF)
        must clear a measured recall@5 floor against the exact
        `cosine_topk`, and each path's candidate volume must prune
        (LSH: < corpus on isotropic data; IVF: probed-cell fraction).
        All hashing/sampling is deterministic (md5 / fixed planes), so
        the booleans are stable and the oracle is the expected-constant
        table — the recall floor is now RECORDED at the gate rather
        than only in pytest (VERDICT r2 #2)."""
        emb = load_table(spark, sf, "embeddings").cache()
        n = emb.count()
        qs = emb.where(F.col("vec_id") < 10)
        lsh_recall = S.ann_recall(emb, qs, k=5)
        n_cand = S.ann_candidates(emb, qs).count()
        lsh_frac = n_cand / (10 * max(n - 1, 1))
        idx = _ivf_index(spark, sf)
        # probe a FRACTION of the cells, not an absolute count: the
        # index has ~√n cells, so a fixed n_probe probes a shrinking
        # corpus fraction as n grows and recall on isotropic data
        # degrades with SF (measured: probe16 = 16/22 cells at sf0.01
        # holds the 0.85 floor, 16/44 at sf0.1 does not).  70% of
        # cells = the same probe 16 at the sf0.01 gate, and the
        # contract is now scale-invariant (97→98 pass at sf0.1).
        import math

        n_probe = max(1, math.ceil(0.7 * idx.n_cells))
        ivf = S.ivf_recall(emb, qs, k=5, n_probe=n_probe, index=idx)
        ivf_frac = min(n_probe, idx.n_cells) / idx.n_cells
        emb.unpersist()
        # IVF+PQ (VERDICT r4 #5): measured on the CLUSTERED fixture —
        # the geometry where PQ codes mean something — with
        # cell-FRACTION probes (20% of cells, SF-invariant like the
        # 70% rule above).  Two rows: raw ADC scoring is honestly
        # floored at its documented code-resolution ceiling (tight
        # clusters collapse m=4 codes to near-ties, ~0.15 measured,
        # COVERAGE.md), and the production shortlist+exact-re-rank
        # path (rerank=128 > cluster size) restores exact quality and
        # is floored at the same 0.85 as the other ANN paths.
        from community_detection_flink_spark.sources.synthetic import (
            clustered_embeddings,
        )

        embc = clustered_embeddings(spark).cache()
        qc = embc.where(F.col("vec_id") < 10)
        cidx = S.build_ivf_index(embc, table="gate_ivfpq_idx_clus")
        c_probe = max(1, math.ceil(0.2 * cidx.n_cells))
        pq_adc = S.ivfpq_recall(embc, qc, k=5, n_probe=c_probe, index=cidx, m=4)
        pq_rr = S.ivfpq_recall(
            embc, qc, k=5, n_probe=c_probe, index=cidx, m=4, rerank=128
        )
        c_frac = min(c_probe, cidx.n_cells) / cidx.n_cells
        embc.unpersist()
        # IVF append maintenance (r10, VERDICT r9 #8): index built on
        # 90% of the corpus, the last 10% APPENDED against the frozen
        # centroids (similarity.ivf_index_append) — the appended index
        # must still clear the recall floor, and its drift vs the
        # full-rebuild index (the `ivf` value above) is bounded.
        emb90 = load_table(spark, sf, "embeddings").where(
            F.col("vec_id") % 10 != 9
        )
        emb10 = load_table(spark, sf, "embeddings").where(
            F.col("vec_id") % 10 == 9
        )
        aidx = S.build_ivf_index(emb90, table="gate_ivf_appended")
        aidx = S.ivf_index_append(aidx, emb10)
        a_probe = max(1, math.ceil(0.7 * aidx.n_cells))
        emb_full = load_table(spark, sf, "embeddings")
        app_recall = S.ivf_recall(
            emb_full, qs, k=5, n_probe=a_probe, index=aidx
        )
        a_frac = min(a_probe, aidx.n_cells) / aidx.n_cells
        rows = [
            ("lsh", 0.85, bool(lsh_recall >= 0.85), bool(lsh_frac < 1.0)),
            ("ivf_probe_70pct", 0.85, bool(ivf >= 0.85), bool(ivf_frac < 1.0)),
            (
                "ivfpq_adc_probe_20pct_clustered",
                0.10,
                bool(pq_adc >= 0.10),
                bool(c_frac < 1.0),
            ),
            (
                "ivfpq_rerank128_probe_20pct_clustered",
                0.85,
                bool(pq_rr >= 0.85),
                bool(c_frac < 1.0),
            ),
            (
                "ivf_appended_probe_70pct",
                0.85,
                bool(app_recall >= 0.85),
                bool(a_frac < 1.0),
            ),
            (
                "ivf_append_drift_le_10pt",
                0.10,
                bool(abs(ivf - app_recall) <= 0.10),
                bool(a_frac < 1.0),
            ),
        ]
        return spark.createDataFrame(
            rows, "method string, recall_floor double, meets_floor boolean, prunes boolean"
        )

    def g_components_paths(spark, sf):
        """Connected components over the per-customer order-chain
        graph (consecutive orders linked → a union of paths: 1500
        components, diameter up to the longest chain — the workload
        where star-contraction's O(log² n) rounds beat label
        propagation's O(diameter)).  Unlike the dense co-purchase
        graph (`g_connected_components`, rows-only), this one's
        recursive-CTE closure is tiny (Σ chain²), so the iterative
        operator gets a HASH-verified oracle."""
        from pyspark.sql import Window

        o = load_table(spark, sf, "orders")
        w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        seq = o.select(
            F.col("o_orderkey").alias("v"),
            F.lag("o_orderkey").over(w).alias("u"),
        ).where(F.col("u").isNotNull())
        return C.connected_components(
            seq.select("u", "v"), vertices=o.select("o_orderkey")
        ).select("vId", F.col("comp").alias("component"))

    def g_connected_components(spark, sf):
        """Components of the co-purchase graph.  HASH-verified against
        an over-unrolled min-label-propagation oracle
        (``_cc_minlabel_sql`` — idempotent at the fixed point, so
        unrolling past the diameter is exact; VERDICT r3 #4); the
        reach-closure used for ``g_components_paths`` would be
        quadratic on this dense graph."""
        edges, _, _ = _graph(spark, sf)
        return C.connected_components(edges).select(
            "vId", F.col("comp").alias("component")
        )

    # ---------------- multimodal (binary columns) ---------------------

    def mm_blob_meta(spark, sf):
        return M.blob_metadata(load_table(spark, sf, "documents"))

    def mm_decode_features(spark, sf):
        return M.decode_features(load_table(spark, sf, "documents"))

    def mm_frame_sample(spark, sf):
        """REAL video-frame sampling, end-to-end (upgraded from the
        r1-r6 byte-offset stub): synthesize a concatenated Netpbm P6
        frame stream per document (the ffmpeg image2pipe raw-video
        format), decode it with the spec-following stream parser
        (multimodal.py::ppm_frame_sample — whitespace/comment-aware
        headers, truncation-resilient), and keep every 2nd frame.
        Frame count, dimensions, byte offsets, and the exact channel
        means are all closed-form in (doc_id, frame_no) — exact SQL
        oracle."""
        blobs = M.synthesize_ppm_stream_blobs(load_table(spark, sf, "documents"))
        return M.ppm_frame_sample(blobs, every_k=2)

    def mm_wav_roundtrip(spark, sf):
        """REAL audio decode, end-to-end: synthesize a mono 16-bit PCM
        WAV per document (stdlib wave), then parse it back with the
        chunk-walking RIFF decoder (multimodal.py::wav_pcm_stats — not
        a stub).  The decoded header fields are a pure function of
        doc_id, so the roundtrip has an exact SQL oracle."""
        blobs = M.synthesize_wav_blobs(load_table(spark, sf, "documents"))
        return M.wav_pcm_stats(blobs).select(
            "doc_id", "ok", "n_channels", "sample_rate",
            "bits_per_sample", "n_frames",
        )

    def mm_bmp_roundtrip(spark, sf):
        """REAL image decode, end-to-end: synthesize a 24-bit solid-color
        BMP per document (pure struct packing), decode it back with the
        stride/row-order-aware DIB parser (multimodal.py::bmp_stats).
        Dimensions AND exact per-channel means are pure functions of
        doc_id — exact SQL oracle."""
        blobs = M.synthesize_bmp_blobs(load_table(spark, sf, "documents"))
        return M.bmp_stats(blobs)

    def mm_gif_frames(spark, sf):
        """REAL compressed-image decode, end-to-end (r8 — replaces the
        last feasible `_fake_decode` role): synthesize an animated
        GIF89a per document THROUGH the real LZW compressor, then
        decode with the full GIF parser (multimodal.py::
        gif_frame_stats — LZW decompression with clear/KwKwK/width
        bump semantics verified against stock idlelib/Tix GIFs and the
        canonical minimal 1×1 stream, tests/test_gif.py).  Frame
        count, dimensions, and the exact palette-mapped channel means
        are closed-form in (doc_id, frame_no) — exact SQL oracle.
        JPEG/MP4 remain the only stubbed formats (no codec libraries
        in the container)."""
        blobs = M.synthesize_gif_blobs(load_table(spark, sf, "documents"))
        return M.gif_frame_stats(blobs)

    def mm_jpeg_roundtrip(spark, sf):
        """REAL lossy-codec decode, end-to-end (r11 — closes the last
        image-decode stub): synthesize a baseline JFIF per document
        THROUGH the real encoder (FDCT, Annex-K quantization, canonical
        Huffman coding, byte stuffing, per-doc restart intervals), then
        decode with the full baseline decoder (operators/jpeg.py —
        marker/DQT/DHT parsing, bit-level Huffman with RSTn handling,
        dequant + IDCT, YCbCr→RGB).  Images are tiled from constant 8×8
        blocks of EVEN gray values, which survive the lossy pipeline
        BIT-EXACTLY (DC-only blocks, q00=16 — jpeg.py docstring), so
        dimensions, component count, pixel checksum, and mean are all
        closed-form in doc_id — exact SQL oracle.  Even docs exercise
        the 3-component color path, odd docs grayscale; doc_id % 4 is
        the restart interval, so DRI/RSTn handling is gate-certified
        too.  The AC / 4:2:0 paths are pinned by differential tests
        (tests/test_jpeg.py) against an independent numpy
        reconstruction."""
        from community_detection_flink_spark.operators import jpeg as J

        blobs = J.synthesize_jpeg_blobs(load_table(spark, sf, "documents"))
        return J.jpeg_stats(blobs)

    # ---------------- graph metrics beyond the reference ---------------

    def g_pagerank(spark, sf):
        """Fixed-iteration PageRank on the co-purchase graph (5 rounds,
        d=0.85; operators/graph_metrics.py::pagerank).  Exact oracle:
        the same five power-iteration rounds unrolled as CTEs."""
        from community_detection_flink_spark.operators import graph_metrics as GM

        edges, _, _ = _graph(spark, sf)
        return GM.pagerank(edges, iterations=5)

    def g_kcore(spark, sf):
        """k=80 core of the co-purchase graph (iterative peel;
        operators/graph_metrics.py::k_core).  The peel is idempotent at
        its fixed point, so the oracle unrolls MORE rounds than the
        data needs (12 vs the 6 observed at sf0.01) and still matches
        exactly."""
        from community_detection_flink_spark.operators import graph_metrics as GM

        edges, _, _ = _graph(spark, sf)
        return GM.k_core(edges, k=80)

    def rel_pivot_status(spark, sf):
        """Pivot: order counts per priority pivoted across the three
        order statuses (one wide row per priority).  The oracle mirrors
        with CASE-sums, pinning the same reshaping."""
        o = load_table(spark, sf, "orders")
        return (
            o.groupBy("o_orderpriority")
            .pivot("o_orderstatus", ["F", "O", "P"])
            .agg(F.count(F.lit(1)))
            .select(
                "o_orderpriority",
                F.coalesce("F", F.lit(0)).cast("long").alias("n_f"),
                F.coalesce("O", F.lit(0)).cast("long").alias("n_o"),
                F.coalesce("P", F.lit(0)).cast("long").alias("n_p"),
            )
        )

    def rel_unpivot_prices(spark, sf):
        """Unpivot (melt): each order's two numeric measures unpacked
        to (key, metric, value) long format — the inverse reshaping of
        rel_pivot_status, via the native `unpivot` operator."""
        o = load_table(spark, sf, "orders")
        return o.unpivot(
            "o_orderkey",
            [
                F.col("o_totalprice").alias("totalprice"),
                F.col("o_custkey").cast("double").alias("custkey"),
            ],
            "metric",
            "value",
        )

    def rel_snapshot_diff(spark, sf):
        """Snapshot diff (lakehouse change detection): classify every
        order key as added / removed / changed / unchanged between two
        deterministic snapshots of the orders table (cut by order key
        range, price perturbed on a slice).  Full-outer join +
        null-safe comparison — the T7-family op a CDC backfill needs."""
        o = load_table(spark, sf, "orders")
        old = o.where(F.col("o_orderkey") % 10 != 0).select(
            "o_orderkey", F.col("o_totalprice").alias("price")
        )
        new = o.where(F.col("o_orderkey") % 7 != 0).select(
            "o_orderkey",
            F.when(
                F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") + 1.0
            ).otherwise(F.col("o_totalprice")).alias("price"),
        )
        j = old.alias("a").join(
            new.alias("b"), "o_orderkey", "full_outer"
        )
        status = (
            F.when(F.col("a.price").isNull(), "added")
            .when(F.col("b.price").isNull(), "removed")
            .when(~F.col("a.price").eqNullSafe(F.col("b.price")), "changed")
            .otherwise("unchanged")
        )
        return j.select("o_orderkey", status.alias("status"))

    def rel_q3_shipping_priority(spark, sf):
        """TPC-H Q3 analog (shipping priority): revenue of BUILDING-
        segment orders placed before / shipped after the cut date,
        top-10 by revenue.  Classic 3-way star join + decimal-exact
        aggregate + deterministic top-k."""
        cut = "1998-01-01"
        c = load_table(spark, sf, "customer").where(
            F.col("c_mktsegment") == "BUILDING"
        )
        o = load_table(spark, sf, "orders").where(F.col("o_orderdate") < cut)
        li = load_table(spark, sf, "lineitem").where(F.col("l_shipdate") > cut)
        return (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .join(c, o["o_custkey"] == c["c_custkey"])
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                )
                .cast("double")
                .alias("revenue")
            )
            .select(
                "l_orderkey",
                F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
                    "o_orderdate_us"
                ),
                "o_orderpriority",
                "revenue",
            )
            .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
            .limit(10)
        )

    def rel_q18_large_orders(spark, sf):
        """TPC-H Q18 analog (large-volume customers): orders whose
        total quantity exceeds 150, with customer and order context.
        Aggregate-then-semi-join shape — the HAVING subquery never
        re-scans lineitem."""
        li = load_table(spark, sf, "lineitem")
        big = (
            li.groupBy("l_orderkey")
            .agg(F.sum("l_quantity").cast("double").alias("total_qty"))
            .where(F.col("total_qty") > 150)
        )
        o = load_table(spark, sf, "orders")
        c = load_table(spark, sf, "customer")
        return (
            big.join(o, big["l_orderkey"] == o["o_orderkey"])
            .join(c, o["o_custkey"] == c["c_custkey"])
            .select(
                "c_custkey",
                "c_name",
                F.col("l_orderkey").alias("o_orderkey"),
                F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
                    "o_orderdate_us"
                ),
                "o_totalprice",
                "total_qty",
            )
        )

    def rel_sketch_quality(spark, sf):
        """Sketch operators under measured quality contracts
        (operators/sketches.py): HLL++ distinct within 5%, KLL-style
        median within 5%, Bloom no-false-negatives + fp-rate bound.
        The oracle pins the BOOLEANS (emb_ann_quality pattern)."""
        from community_detection_flink_spark.operators import sketches as SK

        li = load_table(spark, sf, "lineitem")
        return (
            SK.distinct_within(li, "l_partkey")
            .unionByName(SK.percentile_within(li, "l_extendedprice", 0.5))
            .unionByName(SK.hll_merge_within(li, "l_partkey", "l_returnflag"))
            .unionByName(SK.kll_quantile_within(li, "l_extendedprice", 0.5))
            .unionByName(SK.cms_heavy_hitters_within(li, "l_partkey"))
        )

    def ev_cms_heavy_hitters(spark, sf):
        """Engine-portable Count-Min sketch audit (r9,
        sketches.cms_portable_topk): explicit universal hashes (the
        Bloom-filter pattern from r8 applied to the frequency
        sketch), exact-vs-estimate rows for the 20 heaviest users —
        overcount >= 0 always, fully replayed by the DuckDB oracle.
        One corpus pass builds the <=512-counter sketch; the probe is
        a broadcast join."""
        from community_detection_flink_spark.operators import sketches as SK

        return SK.cms_portable_topk(
            load_table(spark, sf, "events"), "user_id", k=20, width=128
        ).withColumnRenamed("key", "user_id")

    def doc_mixture_sample(spark, sf):
        """Deterministic dataset-mixture sampling (r9,
        textual.mixture_sample): per-source quotas from
        lexicographic-rank weights (regexp-free, r10 env-proofing) and
        a half-corpus budget, membership a pure int64
        function of doc_id (restart/cluster/engine-stable — no RNG
        state). Sources too small for their quota saturate and the
        shortfall stays visible."""
        from community_detection_flink_spark.operators.textual import (
            mixture_sample,
        )

        return mixture_sample(load_table(spark, sf, "documents"))

    def emb_semantic_dedup(spark, sf):
        """SemDeDup semantic deduplication (r9b,
        similarity.semantic_dedup — Abbas et al. 2023): Voronoi-cell
        partition (md5-sampled centroids, exact JVM-fold assignment),
        within-cell cosine >= tau marks the larger vec_id a duplicate
        of the smaller.  tau=0.3 exercises a real kept/dup mix on
        this synthetic corpus (in-cell cosines top out ~0.47).  No
        numpy anywhere, so the DuckDB oracle replays every assignment
        and every >= tau verdict bit-for-bit."""
        return S.semantic_dedup(load_table(spark, sf, "embeddings"), tau=0.3)

    def emb_knn_graph(spark, sf):
        """Cell-blocked approximate kNN graph (r9b,
        similarity.knn_graph): exact cosine top-3 within each Voronoi
        cell — the kNN-graph pass that seeds graph clustering and
        connected-component semantic dedup.  One shuffle on cell, one
        window; full-precision cosines hash-match the oracle's
        identical left-folds."""
        return S.knn_graph(load_table(spark, sf, "embeddings"), k=3)

    def ev_hll_distinct(spark, sf):
        """Engine-portable HyperLogLog (r9b, sketches.hll_portable):
        64 max-rank registers from an explicit universal hash over
        event_id, merged by MAX, plus the raw alpha*m^2/sum(2^-M)
        estimate audited against the exact distinct count.  All
        terms dyadic-exact (1.0/shiftleft, no pow/ln), so even the
        estimate hash-matches at full precision."""
        from community_detection_flink_spark.operators import sketches as SK

        return SK.hll_portable(load_table(spark, sf, "events"), "event_id", p=6)

    def rel_fuzzy_part_match(spark, sf):
        """Blocked fuzzy record linkage (r9b,
        linkage.fuzzy_join_blocked): part-name pairs within
        (p_brand, p_size) equality blocks at Levenshtein distance
        <= 2, with the length-band necessary-condition filter pruning
        before the O(len^2) DP.  Both engines run unit-cost
        Wagner-Fischer, so the match set is hash-exact."""
        from community_detection_flink_spark.operators.linkage import (
            fuzzy_join_blocked,
        )

        return fuzzy_join_blocked(
            load_table(spark, sf, "part"),
            "p_partkey",
            "p_name",
            ["p_brand", "p_size"],
            max_dist=2,
        )

    def ev_daily_hll_users(spark, sf):
        """Per-day portable-HLL distinct-user estimates (r9b,
        sketches.hll_by_group): ONE pass builds every day's 64
        registers (one (day, register) aggregate, map-side combine),
        exact per-day countDistinct rides along as the audit.  This
        is the shape the sketch exists for at 100 TB — per-shard
        registers MAX-merge without re-touching data."""
        from community_detection_flink_spark.operators import sketches as SK

        ev = load_table(spark, sf, "events").select(
            F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id"
        )
        return SK.hll_by_group(ev, "user_id", ["day"])

    def doc_char_entropy(spark, sf):
        """Per-document character-distribution Shannon entropy (r9b,
        textual.char_entropy) — the Gopher-rules-style repetition/
        quality axis.  One char explode + one (doc, char) aggregate;
        -p*ln p terms round to 9 decimals and sum through
        DECIMAL(28,9) (the unigram_nll exactness contract)."""
        return T.char_entropy(load_table(spark, sf, "documents"))

    def emb_kmeans_refine(spark, sf):
        """Two deterministic Lloyd k-means steps from the md5-sampled
        init (r9b, similarity.kmeans_lloyd, k=8): components quantize
        to int64 once, so recentered means are exact integer sums
        divided once in double — an ITERATIVE algorithm whose final
        (vec_id, cluster) assignment still hash-matches an unrolled
        SQL oracle bit-for-bit."""
        return S.kmeans_lloyd(load_table(spark, sf, "embeddings"), k=8, iters=2)

    def ev_histogram_quantiles(spark, sf):
        """Mergeable equi-width histogram quantiles (r9b,
        sketches.histogram_quantiles): p50/p90/p99 of event value from
        a 256-bin histogram whose counts ADD across shards — the
        engine-portable quantile path next to the KLL quality
        contract.  Every float op is deterministic IEEE, so the bin
        edges hash-match with no rounding."""
        from community_detection_flink_spark.operators import sketches as SK

        return SK.histogram_quantiles(load_table(spark, sf, "events"), "value")

    def emb_dup_clusters(spark, sf):
        """End-to-end semantic dedup clusters (r9b): thresholded
        cell-blocked kNN edges (similarity.knn_graph, cosine >= 0.25)
        transitively closed by star-contraction connected components
        (components.connected_components) — the full pipeline from
        raw embeddings to dedup group ids with sizes, every stage
        reused from certified operators.  Oracle: the same kNN CTEs +
        30 unrolled min-label rounds (>= diameter at gate scale)."""
        from community_detection_flink_spark.operators import components as CC

        emb = load_table(spark, sf, "embeddings")
        g = S.knn_graph(emb, k=3)
        pairs = g.where(F.col("cosine") >= 0.25).select("vec_id", "nb_id")
        comp = CC.connected_components(pairs, vertices=emb.select("vec_id"))
        assign = comp.select(
            F.col("vId").alias("vec_id"), F.col("comp").alias("cluster_id")
        )
        # sizes via ONE window pass (r11): the groupBy-then-join shape
        # executed the CC tail twice; a count window is one shuffle on
        # cluster_id over a single execution of the assignment
        from pyspark.sql import Window

        return assign.select(
            "vec_id",
            "cluster_id",
            F.count("*")
            .over(Window.partitionBy("cluster_id"))
            .cast("long")
            .alias("cluster_size"),
        )

    def g_pagerank_weighted(spark, sf):
        """Weighted PageRank over the co-purchase graph with edge
        weight = number of orders the pair co-occurs in (derived here,
        not the cached distinct graph; graph_metrics.pagerank_weighted).
        Exact oracle: the same five weighted rounds unrolled."""
        from community_detection_flink_spark.operators import graph_metrics as GM

        li = load_table(spark, sf, "lineitem")
        pairs = li.select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
        ).distinct()
        ew = (
            pairs.alias("a")
            .join(pairs.alias("b"), "ok")
            .where(F.col("a.pk") != F.col("b.pk"))
            .groupBy(
                F.col("a.pk").alias("src"), F.col("b.pk").alias("dst")
            )
            .agg(F.count("*").alias("w"))
        )
        return GM.pagerank_weighted(ew, iterations=5)

    def g_modularity(spark, sf):
        """Newman modularity of the deterministic vId%10 labeling on the
        co-purchase graph (graph_metrics.modularity) — a labeling
        scorer usable on ANY partition, oracle-checked exactly."""
        from community_detection_flink_spark.operators import graph_metrics as GM

        edges, _, _ = _graph(spark, sf)
        labels = edges.select(F.col("src").alias("vId")).distinct().withColumn(
            "cId", F.col("vId") % 10
        )
        return GM.modularity(labels, edges)

    def g_bfs(spark, sf):
        """BFS shortest-path distances from the smallest vertex id over
        the co-purchase graph (frontier expansion, parquet-landed
        rounds; operators/graph_metrics.py::bfs_distances).  Oracle:
        depth-capped recursive CTE taking MIN(d) per vertex."""
        from community_detection_flink_spark.operators import graph_metrics as GM

        edges, _, _ = _graph(spark, sf)
        return GM.bfs_distances(edges, max_depth=20)

    # ---------------- retrieval + product analytics --------------------

    def doc_bm25(spark, sf):
        """BM25 top-50 keyword search over documents
        (operators/search.py::bm25_topk)."""
        from community_detection_flink_spark.operators.search import bm25_topk

        return bm25_topk(
            load_table(spark, sf, "documents"), _BM25_TERMS, k=50
        )

    def ev_retention(spark, sf):
        """Weekly retention-cohort triangle over the event stream
        (operators/temporal.py::retention_cohorts)."""
        from community_detection_flink_spark.operators.temporal import (
            retention_cohorts,
        )

        return retention_cohorts(load_table(spark, sf, "events"))

    def doc_tfidf(spark, sf):
        """Per-document top-3 TF-IDF keyword extraction
        (operators/search.py::tfidf_top_terms)."""
        from community_detection_flink_spark.operators.search import (
            tfidf_top_terms,
        )

        return tfidf_top_terms(load_table(spark, sf, "documents"), k=3)

    def rel_scd2(spark, sf):
        """SCD2 dimension build: per-customer order-status history with
        validity intervals (operators/temporal.py::scd2_history);
        timestamps surfaced as unix micros for the gate hash."""
        from community_detection_flink_spark.operators.temporal import scd2_history

        h = scd2_history(
            load_table(spark, sf, "orders"),
            "o_custkey",
            "o_orderdate",
            ["o_orderstatus"],
            tiebreak_col="o_orderkey",
        )
        # o_orderdate arrives TIMESTAMP_NTZ (µs parquet, no UTC
        # adjustment); the UTC session makes the cast an identity on
        # the wall-clock value, matching DuckDB's naive epoch_us
        return h.select(
            "o_custkey",
            "o_orderstatus",
            F.unix_micros(F.col("valid_from").cast("timestamp")).alias(
                "valid_from_us"
            ),
            F.unix_micros(F.col("valid_to").cast("timestamp")).alias(
                "valid_to_us"
            ),
            "is_current",
        )

    def ev_anomalies(spark, sf):
        """Per-event-type z-score outliers (|z| > 3;
        operators/temporal.py::zscore_anomalies)."""
        from community_detection_flink_spark.operators.temporal import (
            zscore_anomalies,
        )

        return zscore_anomalies(load_table(spark, sf, "events"))

    def ev_topk_per_window(spark, sf):
        """Windowed top-k: the 3 busiest users of every tumbling hour
        (time-bucketed count + per-window rank — the batch twin of a
        streaming leaderboard)."""
        from pyspark.sql import Window

        ev = load_table(spark, sf, "events")
        hour = (F.unix_micros(F.col("ts")) / F.lit(3_600_000_000)).cast("long")
        counts = ev.groupBy(hour.alias("hour_bucket"), "user_id").agg(
            F.count("*").cast("long").alias("n_events")
        )
        w = Window.partitionBy("hour_bucket").orderBy(
            F.col("n_events").desc(), F.col("user_id").asc()
        )
        return (
            counts.withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= 3)
        )

    def doc_dup_ratio_by_source(spark, sf):
        """Per-source duplication hygiene: distinct-text ratio per
        source shard — the 'which shard is dirtiest' question every
        crawl pipeline asks before sampling."""
        docs = load_table(spark, sf, "documents")
        return docs.groupBy("source").agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct(F.md5("text")).cast("long").alias("n_distinct"),
            F.round(
                F.countDistinct(F.md5("text")) / F.count("*"), 6
            ).alias("distinct_ratio"),
        )

    def doc_normalize(spark, sf):
        """Canonical text cleanup (control chars, whitespace collapse,
        lowercase; operators/textual.py::normalize_text)."""
        return T.normalize_text(load_table(spark, sf, "documents"))

    def doc_quality_sample(spark, sf):
        """Deterministic quality-weighted importance sampling
        (operators/textual.py::quality_weighted_sample over
        quality_score)."""
        docs = load_table(spark, sf, "documents")
        return T.quality_weighted_sample(docs, T.quality_score(docs), boost=1.2)

    def rel_window_distribution(spark, sf):
        """Distribution window functions in one pass — ntile quartile,
        cume_dist, percent_rank per nation by account balance (engine
        §2.10 window breadth; one shuffle, one sort)."""
        from pyspark.sql import Window

        c = load_table(spark, sf, "customer")
        w = Window.partitionBy("c_nationkey").orderBy(
            F.col("c_acctbal").asc(), F.col("c_custkey").asc()
        )
        return c.select(
            F.col("c_custkey").cast("long").alias("c_custkey"),
            F.col("c_nationkey").cast("long").alias("c_nationkey"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
            F.round(F.cume_dist().over(w), 9).alias("cume"),
            F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        )

    def ev_partition_pruned(spark, sf):
        """Per-user purchase stats off the event-type-partitioned lake
        layout: the filter prunes partition DIRECTORIES (PartitionFilters
        in the scan), reading ~1/5th of the bytes."""
        ev = spark.read.parquet(_partitioned_events(spark, sf))
        return (
            ev.where(F.col("event_type") == "purchase")
            .groupBy("user_id")
            .agg(
                F.count("*").cast("long").alias("n_purchases"),
                F.round(F.avg("value"), 6).alias("avg_value"),
            )
        )

    def rel_bucketed_join(spark, sf):
        """Per-customer order rollup over co-bucketed tables: join AND
        aggregate both run on the bucket key, so the plan has ZERO
        shuffle Exchange — the 100 TB star-join layout
        (sources/bucketed.py)."""
        ct, ot = _bucketed_rel(spark, sf)
        c = spark.table(ct).where(F.col("c_acctbal") > 0)
        o = spark.table(ot)
        return (
            c.join(o, c["c_custkey"] == o["o_custkey"])
            .groupBy("c_custkey")
            .agg(
                F.count("*").cast("long").alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("total_spent"),
            )
        )

    def emb_centroid_assign(spark, sf):
        """Exact nearest-centroid assignment (first 8 vectors as fixed
        centroids; operators/similarity.py::nearest_centroid — the
        oracle-verifiable twin of the IVF index's numpy assignment)."""
        emb = load_table(spark, sf, "embeddings")
        cents = emb.where(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("centroid_id"), "embedding"
        )
        return S.nearest_centroid(emb, cents)

    def rel_q5_local_supplier(spark, sf):
        """TPC-H Q5 analog (local supplier volume): revenue from 1996
        orders where the customer and supplier share a nation, for
        ASIA nations.  Six-way star join — the nation/region dims
        broadcast, the c↔s nation equality rides the supplier join so
        no extra shuffle is introduced."""
        r = load_table(spark, sf, "region").where(F.col("r_name") == "ASIA")
        n = load_table(spark, sf, "nation")
        c = load_table(spark, sf, "customer")
        s = load_table(spark, sf, "supplier")
        o = load_table(spark, sf, "orders").where(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        li = load_table(spark, sf, "lineitem")
        return (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .join(c, o["o_custkey"] == c["c_custkey"])
            .join(
                s,
                (li["l_suppkey"] == s["s_suppkey"])
                & (c["c_nationkey"] == s["s_nationkey"]),
            )
            .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
            .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
            .groupBy("n_name")
            .agg(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                )
                .cast("double")
                .alias("revenue")
            )
        )

    def rel_q10_returned_items(spark, sf):
        """TPC-H Q10 analog (returned-item reporting): top-20 customers
        by lost revenue on returned lineitems for 1996-Q1 orders.
        Lineitem filter pushed to the scan, nation broadcast,
        deterministic top-k tie-broken on c_custkey."""
        c = load_table(spark, sf, "customer")
        o = load_table(spark, sf, "orders").where(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1996-04-01")
        )
        li = load_table(spark, sf, "lineitem").where(F.col("l_returnflag") == "R")
        n = load_table(spark, sf, "nation")
        return (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .join(c, o["o_custkey"] == c["c_custkey"])
            .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
            .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
            .agg(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                )
                .cast("double")
                .alias("revenue")
            )
            .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
            .limit(20)
        )

    def rel_orc_roundtrip(spark, sf):
        """S5+ ORC source-format parity: lineitem columns landed as ORC
        (Spark's second columnar native format), read back, aggregated;
        the oracle aggregates the parquet directly — hash equality
        proves the ORC sink→source path is lossless for
        long/string/double."""
        path = _landed_copy(spark, sf, "orc")
        li = spark.read.orc(path)
        return li.groupBy("l_returnflag").agg(
            F.count("*").cast("long").alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
            F.min("l_orderkey").alias("first_order"),
        )

    def g_link_scores(spark, sf):
        """Link-prediction scores per co-purchase edge — common
        neighbors (edge triangle support), Jaccard, preferential
        attachment (graph_metrics.link_scores).  Wedges close against
        the edge list BEFORE aggregating, so the shuffle carries only
        triangle-supported wedges."""
        from community_detection_flink_spark.operators import graph_metrics as GM

        edges, _, _ = _graph(spark, sf)
        return GM.link_scores(edges)

    def g_assortativity(spark, sf):
        """Degree assortativity of the co-purchase graph
        (graph_metrics.degree_assortativity): one degree join + one
        global integer aggregate — bit-exact, single scalar row."""
        from community_detection_flink_spark.operators import graph_metrics as GM

        edges, _, _ = _graph(spark, sf)
        return GM.degree_assortativity(edges)

    def ev_transitions(spark, sf):
        """Per-user event-type transition matrix with conditional
        probabilities (temporal.transition_counts) — Markov-chain
        estimation over the event stream, one keyed window + one tiny
        aggregate."""
        from community_detection_flink_spark.operators import temporal as TP

        return TP.transition_counts(load_table(spark, sf, "events"))

    def doc_repeated_passages(spark, sf):
        """Cross-document repeated 8-token passages
        (textual.repeated_passages) — the exact-substring dedup
        primitive (Lee et al. 2022); hashes move through the shuffle,
        never the text."""
        return T.repeated_passages(load_table(spark, sf, "documents"), n=8)

    def emb_norm_stats(spark, sf):
        """Per-label L2-norm profile of the embeddings table
        (similarity.norm_stats): min/max bit-exact, sum through
        DECIMAL so the aggregate is order-independent."""
        return S.norm_stats(load_table(spark, sf, "embeddings"))

    def rel_q7_volume_shipping(spark, sf):
        """TPC-H Q7 analog (volume shipping): bilateral trade volume
        between two nations by ship year.  The disjunctive nation
        predicate lands AFTER both broadcast dim joins (where it is a
        cheap filter), never as a join condition that would defeat the
        equi-join planner."""
        n1, n2 = "NATION_1", "NATION_2"
        li = load_table(spark, sf, "lineitem").where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") <= "1997-12-31")
        )
        s = load_table(spark, sf, "supplier")
        o = load_table(spark, sf, "orders")
        c = load_table(spark, sf, "customer")
        n = load_table(spark, sf, "nation")
        ns = n.select(
            F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
        )
        nc = n.select(
            F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
        )
        return (
            li.join(s, li["l_suppkey"] == s["s_suppkey"])
            .join(o, li["l_orderkey"] == o["o_orderkey"])
            .join(c, o["o_custkey"] == c["c_custkey"])
            .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nk"))
            .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nk"))
            .where(
                ((F.col("supp_nation") == n1) & (F.col("cust_nation") == n2))
                | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1))
            )
            .groupBy(
                "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
            )
            .agg(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                )
                .cast("double")
                .alias("revenue")
            )
        )

    def g_label_propagation(spark, sf):
        """Synchronous label propagation with deterministic tie-breaks
        (graph_metrics.label_propagation, 4 rounds) — the cheap
        community baseline beside the WCC pipeline.  Determinism makes
        the whole ITERATION exactly replayable: the oracle unrolls the
        same 4 rounds as CTEs and hash-matches the labeling."""
        from community_detection_flink_spark.operators import graph_metrics as GM

        edges, _, _ = _graph(spark, sf)
        return GM.label_propagation(edges, rounds=4)

    def emb_covariance(spark, sf):
        """Exact upper-triangle covariance matrix of the embedding
        corpus (similarity.covariance_matrix): DECIMAL-summed cross
        products, map-side combined to ≤ d²/2 rows per task."""
        return S.covariance_matrix(load_table(spark, sf, "embeddings"))

    def ev_interval_join(spark, sf):
        """Keyed interval join (streaming/windows.py::interval_join):
        each purchase paired with the same user's clicks in the next
        30 minutes — the attribution correlation shape.  Equi-key +
        explicit time bounds = the exact condition Structured
        Streaming needs for bounded join state; stream/batch parity
        pinned in tests/test_streaming.py."""
        from community_detection_flink_spark.streaming.windows import interval_join

        ev = load_table(spark, sf, "events")
        return interval_join(
            ev.where(F.col("event_type") == "purchase"),
            ev.where(F.col("event_type") == "click"),
            upper_minutes=30,
        )

    def doc_unigram_nll(spark, sf):
        """Per-document unigram negative log-likelihood
        (search.py::unigram_nll) — the CCNet-style perplexity quality
        signal; model + scoring in one pass, vocab broadcast."""
        from community_detection_flink_spark.operators.search import unigram_nll

        return unigram_nll(load_table(spark, sf, "documents"))

    def g_sssp_weighted(spark, sf):
        """Hop-bounded weighted SSSP over the co-occurrence-weighted
        co-purchase graph (graph_metrics.sssp_weighted, 5 Bellman-Ford
        relaxation rounds; integer costs → bit-exact).  Oracle: the
        same 5 relaxations unrolled as CTEs."""
        from community_detection_flink_spark.operators import graph_metrics as GM

        li = load_table(spark, sf, "lineitem")
        pairs = li.select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
        ).distinct()
        ew = (
            pairs.alias("a")
            .join(pairs.alias("b"), "ok")
            .where(F.col("a.pk") != F.col("b.pk"))
            .groupBy(F.col("a.pk").alias("src"), F.col("b.pk").alias("dst"))
            .agg(F.count("*").cast("long").alias("w"))
        )
        return GM.sssp_weighted(ew, rounds=5)

    def g_random_walks(spark, sf):
        """Deterministic (md5-seeded) uniform random walks from every
        vertex — DeepWalk/node2vec positive-pair generation, fully
        replayable (graph_metrics.random_walks: 2 walks × 4 steps).
        The oracle replays the identical md5 index arithmetic."""
        from community_detection_flink_spark.operators import graph_metrics as GM

        edges, _, _ = _graph(spark, sf)
        return GM.random_walks(edges, walks_per_vertex=2, length=4)

    def doc_minhash_quality(spark, sf):
        """MinHash estimation-error contract
        (dedup.minhash_estimate_quality, k=32): signature-overlap
        estimate vs EXACT shingle Jaccard on every LSH candidate pair,
        pinned as booleans (measured at sf0.01: mean 0.017 / p95 0.028
        / max 0.065 against bounds 0.10 / 0.25 / 0.50)."""
        return D.minhash_estimate_quality(load_table(spark, sf, "documents"))

    def emb_product_quantization(spark, sf):
        """Product quantization (similarity.product_quantize, m=4
        subspaces × 8 codewords from the first 8 vectors): d floats →
        m codes + reconstruction error.  Distances and the error fold
        in fixed index order — hash-matched with NO rounding (the
        nearest_centroid convention).  The ``codes`` array is
        serialized to a "-"-joined string for the gate: the driver's
        pandas canonicalizer cannot sort/hash an array column (the
        g_adjacency precedent from round 1)."""
        return S.product_quantize(load_table(spark, sf, "embeddings")).select(
            "vec_id",
            F.concat_ws("-", F.col("codes").cast("array<string>")).alias("codes"),
            "err2",
        )

    def rel_data_quality(spark, sf):
        """Rule-based data-quality audit (the dbt-test / expectation
        suite shape): referential orphans, out-of-range measures,
        duplicate keys, and null rates — each rule one aggregate, the
        orphan rule a distributed anti-join, unioned into a
        (rule, n_violations, passed) report."""
        o = load_table(spark, sf, "orders")
        c = load_table(spark, sf, "customer")
        li = load_table(spark, sf, "lineitem")
        ev = load_table(spark, sf, "events")

        orphans = o.join(
            c.select(F.col("c_custkey").alias("o_custkey")), "o_custkey", "left_anti"
        ).agg(F.count("*").cast("long").alias("n"))
        bad_qty = li.where(
            (F.col("l_quantity") <= 0) | (F.col("l_quantity") > 50)
        ).agg(F.count("*").cast("long").alias("n"))
        dup_keys = (
            o.groupBy("o_orderkey")
            .agg(F.count("*").alias("_c"))
            .where(F.col("_c") > 1)
            .agg(F.count("*").cast("long").alias("n"))
        )
        null_props = ev.where(F.col("props").isNull()).agg(
            F.count("*").cast("long").alias("n")
        )
        neg_price = o.where(F.col("o_totalprice") <= 0).agg(
            F.count("*").cast("long").alias("n")
        )

        def rule(name, df):
            return df.select(
                F.lit(name).alias("rule"),
                F.col("n").alias("n_violations"),
                (F.col("n") == 0).alias("passed"),
            )

        return (
            rule("orders_custkey_in_customer", orphans)
            .unionByName(rule("lineitem_quantity_in_range", bad_qty))
            .unionByName(rule("orders_orderkey_unique", dup_keys))
            .unionByName(rule("events_props_not_null", null_props))
            .unionByName(rule("orders_totalprice_positive", neg_price))
        )

    def g_degree_histogram(spark, sf):
        """Log2-binned degree distribution of the co-purchase graph —
        the heavy-tail fingerprint every graph profile starts with;
        integer bins, exact."""
        edges, _, _ = _graph(spark, sf)
        deg = edges.groupBy("src").agg(F.count("*").alias("dg"))
        return (
            deg.select(
                F.floor(F.log2("dg")).cast("long").alias("bucket")
            )
            .groupBy("bucket")
            .agg(F.count("*").cast("long").alias("n_vertices"))
        )

    def rel_abc_analysis(spark, sf):
        """ABC / Pareto classification of parts by revenue share:
        class A = parts covering the first 80% of cumulative revenue,
        B = next 15%, C = the tail — the inventory-analysis staple.
        One decimal-exact aggregate + one cumulative window ordered
        deterministically by (revenue DESC, partkey); the class
        boundary compares exact decimal-derived doubles, so the
        labeling is bit-stable."""
        from pyspark.sql import Window

        li = load_table(spark, sf, "lineitem")
        rev = li.groupBy("l_partkey").agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            ).alias("_r")
        )
        w = Window.orderBy(F.col("_r").desc(), F.col("l_partkey").asc())
        tot = rev.agg(F.sum("_r").alias("_t"))
        classed = (
            rev.withColumn("_cum", F.sum("_r").over(w))
            .crossJoin(F.broadcast(tot))
            .select(
                F.col("l_partkey").cast("long").alias("l_partkey"),
                F.col("_r").cast("double").alias("revenue"),
                (F.col("_cum").cast("double") / F.col("_t").cast("double")).alias(
                    "cum_share"
                ),
            )
            .withColumn(
                "abc_class",
                F.when(F.col("cum_share") <= 0.80, "A")
                .when(F.col("cum_share") <= 0.95, "B")
                .otherwise("C"),
            )
        )
        return classed.groupBy("abc_class").agg(
            F.count("*").cast("long").alias("n_parts"),
            F.sum(F.col("revenue").cast("decimal(18,6)"))
            .cast("double")
            .alias("class_revenue"),
        )

    def g_rich_club(spark, sf):
        """Rich-club connectivity (Colizza et al. 2006): for degree
        thresholds k ∈ {10, 50, 100}, the density φ(k) of the subgraph
        induced on vertices of degree > k — integer counts end-to-end,
        one row per threshold."""
        edges, _, _ = _graph(spark, sf)
        deg = edges.groupBy("src").agg(F.count("*").cast("long").alias("dg"))
        out = None
        for kk in (10, 50, 100):
            rich = deg.where(F.col("dg") > kk).select(F.col("src").alias("vId"))
            within = (
                edges.where(F.col("src") < F.col("dst"))
                .join(rich.withColumnsRenamed({"vId": "src"}), "src", "left_semi")
                .join(rich.withColumnsRenamed({"vId": "dst"}), "dst", "left_semi")
            )
            row = rich.agg(F.count("*").cast("long").alias("n_rich")).crossJoin(
                within.agg(F.count("*").cast("long").alias("e_rich"))
            ).select(
                F.lit(kk).cast("long").alias("k"),
                "n_rich",
                "e_rich",
                F.try_divide(
                    (2 * F.col("e_rich")).cast("double"),
                    (F.col("n_rich") * (F.col("n_rich") - 1)).cast("double"),
                ).alias("phi"),
            )
            out = row if out is None else out.unionByName(row)
        return out

    def ev_trigrams(spark, sf):
        """Top event-type trigrams per user stream (two LAG windows +
        one count) — the path-analysis n-gram a product-analytics
        pipeline mines for common journeys; ordered deterministically
        by (n DESC, trigram)."""
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        ev = load_table(spark, sf, "events")
        t = ev.select(
            F.lag("event_type", 2).over(w).alias("a"),
            F.lag("event_type", 1).over(w).alias("b"),
            F.col("event_type").alias("c"),
        ).where(F.col("a").isNotNull())
        return (
            t.groupBy("a", "b", "c")
            .agg(F.count("*").cast("long").alias("n"))
            .orderBy(F.col("n").desc(), "a", "b", "c")
            .limit(25)
        )

    def emb_code_dedup(spark, sf):
        """Embedding near-dup blocking by PQ code collision: vectors
        sharing ALL m codes land in one block (code-grid resolution —
        the quantization-based blocking key large-scale embedding
        dedup uses before exact verification).  Groups of ≥2 with
        deterministic representative (min vec_id).  ``codes`` is
        serialized to a "-"-joined string for the gate (the
        g_adjacency precedent — pandas cannot sort an array column)."""
        codes = S.product_quantize(load_table(spark, sf, "embeddings"))
        return (
            codes.groupBy("codes")
            .agg(
                F.min("vec_id").cast("long").alias("rep"),
                F.count("*").cast("long").alias("n_members"),
            )
            .where(F.col("n_members") >= 2)
            .select(
                "rep",
                "n_members",
                F.concat_ws("-", F.col("codes").cast("array<string>")).alias(
                    "codes"
                ),
            )
        )

    def rel_monthly_growth(spark, sf):
        """Month-over-month revenue with growth percent (one LAG over
        the monthly aggregate) — the reporting staple; decimal-exact
        monthly sums, int-free growth ratio rounded to 6."""
        from pyspark.sql import Window

        o = load_table(spark, sf, "orders")
        monthly = o.groupBy(
            F.date_trunc("month", F.col("o_orderdate")).alias("_m")
        ).agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue")
        )
        w = Window.orderBy("_m")
        return monthly.select(
            F.unix_micros(F.col("_m").cast("timestamp")).alias("month_us"),
            "revenue",
            F.round(
                100.0
                * F.try_divide(
                    F.col("revenue") - F.lag("revenue").over(w),
                    F.lag("revenue").over(w),
                ),
                6,
            ).alias("growth_pct"),
        )

    def rel_q15_top_supplier(spark, sf):
        """TPC-H Q15 analog (top supplier): suppliers whose 1996-Q1
        revenue EQUALS the maximum — the all-ties-at-max semantics
        (not top-k), expressed as one aggregate + a rank window so
        the revenue view is computed once."""
        from pyspark.sql import Window

        li = load_table(spark, sf, "lineitem").where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        s = load_table(spark, sf, "supplier")
        rev = (
            li.groupBy("l_suppkey")
            .agg(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                )
                .cast("double")
                .alias("total_revenue")
            )
        )
        w = Window.orderBy(F.col("total_revenue").desc())
        top = rev.withColumn("_rk", F.rank().over(w)).where(F.col("_rk") == 1)
        return (
            top.join(F.broadcast(s), top["l_suppkey"] == s["s_suppkey"])
            .select(
                F.col("s_suppkey").cast("long").alias("s_suppkey"),
                "s_name",
                "total_revenue",
            )
        )

    def doc_passage_locations(spark, sf):
        """Span locations for the cross-document repeated passages:
        (chunk_hash, doc_id, pos) for every occurrence of a window
        that appears in ≥2 docs — the join-back step that turns
        doc_repeated_passages' hashes into removable spans."""
        docs = load_table(spark, sf, "documents")
        toks = T.tokens_col(F.col("text"))
        n = 8
        windows = F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
        occ = docs.select(
            "doc_id", F.posexplode(windows).alias("pos", "chunk")
        ).select(
            "doc_id",
            (F.col("pos") + 1).cast("long").alias("pos"),
            D._hash60(F.col("chunk")).alias("chunk_hash"),
        )
        dup = (
            occ.groupBy("chunk_hash")
            .agg(F.countDistinct("doc_id").alias("_nd"))
            .where(F.col("_nd") >= 2)
            .select("chunk_hash")
        )
        return occ.join(dup, "chunk_hash", "left_semi").select(
            "chunk_hash", "doc_id", "pos"
        )

    def g_ktruss(spark, sf):
        """4-truss of the co-purchase graph (graph_metrics.k_truss):
        the edge-cohesion peel complementing g_kcore.  Converges in 3
        rounds at sf0.01 but 7 at sf0.1 (measured); the oracle
        over-unrolls 10 idempotent rounds (the k-core oracle trick) so
        both sweep SFs sit past the fixed point.  The deeper k=8 peel
        (25 rounds) is pinned semantically on the clique fixture in
        pytest."""
        from community_detection_flink_spark.operators import graph_metrics as GM

        edges, _, _ = _graph(spark, sf)
        return GM.k_truss(edges, k=4)

    def g_snapshot_edges(spark, sf):
        """Temporal graph snapshot: the co-purchase edge set built
        from 1996-H1 shipments only — the time-windowed graph
        construction an evolving-graph pipeline re-runs per window
        (the shipdate filter pushes into the lineitem scan before the
        pair join)."""
        li = load_table(spark, sf, "lineitem").where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-07-01")
        )
        pairs = li.select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
        ).distinct()
        return (
            pairs.alias("a")
            .join(pairs.alias("b"), "ok")
            .where(F.col("a.pk") != F.col("b.pk"))
            .select(F.col("a.pk").alias("src"), F.col("b.pk").alias("dst"))
            .distinct()
        )

    def emb_ivfpq_ann(spark, sf):
        """IVF + PQ composition (similarity.ann_topk_ivfpq): IVF cells
        route, PQ codes score via the broadcast ADC table — the
        production ANN shape.  Differential-oracled since r9 (the
        routing margins dwarf cross-engine float noise — measured in
        `_ivf_route_sql`); plan + candidate-subset + determinism also
        pinned in tests/test_round4_extras.py."""
        emb = load_table(spark, sf, "embeddings")
        return S.ann_topk_ivfpq(
            emb, emb.where("vec_id < 5"), k=5, index=_ivf_index(spark, sf)
        )

    def ev_debounce(spark, sf):
        """Batch debounce dedup: keep events whose gap from the
        previous event of the same (user, type) is ≥ 10 minutes — one
        keyed window, the SQL-expressible cousin of the stateful
        TTL dedup (`streaming/stateful.py::streaming_first_seen`,
        which chains from the last KEPT event instead)."""
        from pyspark.sql import Window

        w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
        ev = load_table(spark, sf, "events")
        gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
        return (
            ev.withColumn("_gap", gap)
            .where(F.col("_gap").isNull() | (F.col("_gap") >= 600_000_000))
            .select(
                F.col("event_id").cast("long").alias("event_id"),
                F.col("user_id").cast("long").alias("user_id"),
                "event_type",
            )
        )

    def emb_pq_ann(spark, sf):
        """PQ asymmetric-distance top-10 search
        (similarity.pq_ann_topk): full-precision queries scored
        against the COMPRESSED corpus via a broadcast m·k distance
        table — m code lookups per corpus vector, the embedding
        column read only at encode time.  Hash-matched exactly (no
        rounding)."""
        return S.pq_ann_topk(load_table(spark, sf, "embeddings"))

    def g_graph_summary(spark, sf):
        """One-row profile of the co-purchase graph: |V|, directed
        |E|, max/avg degree, triangle count, and global transitivity
        (6·tri / Σ d(d−1) — closed-triplet fraction, exact from
        integer sums).  The graph twin of rel_profile_orders."""
        edges, _, _ = _graph(spark, sf)
        tri = _TRI_CACHE[sf]
        deg = edges.groupBy("src").agg(F.count("*").cast("long").alias("dg"))
        dstats = deg.agg(
            F.count("*").cast("long").alias("n_vertices"),
            F.sum("dg").cast("long").alias("n_directed_edges"),
            F.max("dg").cast("long").alias("max_degree"),
            F.sum(F.col("dg") * (F.col("dg") - 1)).cast("long").alias("sum_dd"),
        )
        tstats = tri.agg(F.count("*").cast("long").alias("n_triangles"))
        return dstats.crossJoin(F.broadcast(tstats)).select(
            "n_vertices",
            "n_directed_edges",
            "max_degree",
            (
                F.col("n_directed_edges").cast("double")
                / F.col("n_vertices").cast("double")
            ).alias("avg_degree"),
            "n_triangles",
            (
                6.0
                * F.col("n_triangles").cast("double")
                / F.col("sum_dd").cast("double")
            ).alias("transitivity"),
        )

    def rel_q14_promo_revenue(spark, sf):
        """TPC-H Q14 analog (promotion effect): PROMO parts' share of
        1996 revenue.  One lineitem⋈part join (part is the small side
        — broadcast), two decimal-exact sums, one ratio."""
        li = load_table(spark, sf, "lineitem").where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        p = load_table(spark, sf, "part")
        rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
            "decimal(18,6)"
        )
        return (
            li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
            .agg(
                F.sum(F.when(F.col("p_type") == "PROMO", rev)).alias("_promo"),
                F.sum(rev).alias("_total"),
            )
            .select(
                (
                    100.0
                    * F.col("_promo").cast("double")
                    / F.col("_total").cast("double")
                ).alias("promo_revenue_pct"),
                F.col("_promo").cast("double").alias("promo_revenue"),
                F.col("_total").cast("double").alias("total_revenue"),
            )
        )

    def rel_q8_market_share(spark, sf):
        """TPC-H Q8 analog (national market share): NATION_3 suppliers'
        share of AMERICA-region ECONOMY-part revenue by order year,
        1995-1996.  The widest star in the registry — lineitem fans
        out to part, orders→customer→nation→region on the demand side
        and supplier→nation on the supply side.  Dims (part filter,
        supplier, nation, region) broadcast; the two fact joins
        (orders, customer) shuffle on their keys; decimal-exact sums,
        double ratio at the end (the Q14 discipline)."""
        li = load_table(spark, sf, "lineitem")
        o = load_table(spark, sf, "orders").where(
            (F.col("o_orderdate") >= "1995-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        c = load_table(spark, sf, "customer")
        s = load_table(spark, sf, "supplier")
        p = load_table(spark, sf, "part").where(F.col("p_type") == "ECONOMY")
        n = load_table(spark, sf, "nation")
        r = load_table(spark, sf, "region").where(F.col("r_name") == "AMERICA")
        cust_nation = n.join(
            F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]
        ).select(F.col("n_nationkey").alias("cn_key"))
        supp_nation = n.select(
            F.col("n_nationkey").alias("sn_key"),
            F.col("n_name").alias("supp_nation"),
        )
        rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
            "decimal(18,6)"
        )
        return (
            li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
            .join(o, li["l_orderkey"] == o["o_orderkey"])
            .join(c, o["o_custkey"] == c["c_custkey"])
            .join(F.broadcast(cust_nation), c["c_nationkey"] == F.col("cn_key"))
            .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
            .join(F.broadcast(supp_nation), s["s_nationkey"] == F.col("sn_key"))
            .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
            .agg(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", rev)
                ).alias("_nat"),
                F.sum(rev).alias("_tot"),
            )
            .select(
                "o_year",
                (
                    F.coalesce(F.col("_nat"), F.lit(0).cast("decimal(18,6)"))
                    .cast("double")
                    / F.col("_tot").cast("double")
                ).alias("mkt_share"),
                F.coalesce(F.col("_nat"), F.lit(0).cast("decimal(18,6)"))
                .cast("double")
                .alias("nation_revenue"),
                F.col("_tot").cast("double").alias("total_revenue"),
            )
        )

    def rel_q17_small_qty_revenue(spark, sf):
        """TPC-H Q17 analog (small-quantity-order revenue): yearly
        revenue lost if orders below 20% of a part's average quantity
        were not filled.  The per-part average is exact (quantities
        are integral doubles), computed once and joined back — the
        correlated subquery as an aggregate-then-join."""
        li = load_table(spark, sf, "lineitem")
        pa = li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("_aq"))
        return (
            li.join(pa, "l_partkey")
            .where(F.col("l_quantity") < 0.2 * F.col("_aq"))
            .agg(
                (
                    F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                    .cast("double")
                    / 7.0
                ).alias("avg_yearly"),
                F.count("*").cast("long").alias("n_small"),
            )
        )

    def rel_q2_min_cost_supplier(spark, sf):
        """TPC-H Q2 analog (minimum-cost supplier): for STANDARD parts
        of size ≤ 15, the EUROPE supplier(s) quoting each part's
        minimum supplycost.  ``partsupp`` is the synthesized dimension
        (``_partsupp``); the supplier⋈nation⋈region side and the
        filtered part list are tiny — broadcast; the per-part min is
        an aggregate joined back (the correlated subquery,
        decorrelated)."""
        ps = _partsupp(spark, sf)
        p = (
            load_table(spark, sf, "part")
            .where((F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD"))
            .select("p_partkey")
        )
        s = load_table(spark, sf, "supplier")
        n = load_table(spark, sf, "nation")
        r = load_table(spark, sf, "region").where(F.col("r_name") == "EUROPE")
        sn = (
            s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
            .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
            .select("s_suppkey", "s_name", "s_acctbal", "n_name")
        )
        eu = (
            ps.join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"))
            .drop("p_partkey")
            .join(F.broadcast(sn), F.col("ps_suppkey") == F.col("s_suppkey"))
        )
        mins = eu.groupBy(F.col("ps_partkey").alias("_pk")).agg(
            F.min("ps_supplycost").alias("_minc")
        )
        return (
            eu.join(
                mins,
                (F.col("ps_partkey") == F.col("_pk"))
                & (F.col("ps_supplycost") == F.col("_minc")),
            )
            .select(
                "s_acctbal",
                "s_name",
                "n_name",
                F.col("ps_partkey").alias("p_partkey"),
                F.col("ps_supplycost").cast("double").alias("supplycost"),
            )
            .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
            .limit(100)
        )

    def rel_q9_product_profit(spark, sf):
        """TPC-H Q9 analog (product-type profit): profit by supplier
        nation × order year over ECONOMY parts, profit =
        extendedprice·(1−discount) − ps_supplycost·quantity.  lineitem
        joins the synthesized partsupp on BOTH keys (the composite-key
        join Q9 canonically tests — left unhinted so AQE picks
        broadcast at bench scale and shuffle-hash at 100 TB);
        part/supplier/nation broadcast; money folds through DECIMAL so
        the hash is exact."""
        li = load_table(spark, sf, "lineitem")
        o = load_table(spark, sf, "orders").select("o_orderkey", "o_orderdate")
        p = (
            load_table(spark, sf, "part")
            .where(F.col("p_type") == "ECONOMY")
            .select("p_partkey")
        )
        s = load_table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
        n = load_table(spark, sf, "nation").select("n_nationkey", "n_name")
        ps = _partsupp(spark, sf)
        amount = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
            "decimal(18,6)"
        ) - F.col("ps_supplycost") * F.col("l_quantity").cast("decimal(8,0)")
        return (
            li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
            .join(
                ps,
                (F.col("l_partkey") == F.col("ps_partkey"))
                & (F.col("l_suppkey") == F.col("ps_suppkey")),
            )
            .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
            .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
            .join(o, li["l_orderkey"] == o["o_orderkey"])
            .groupBy("n_name", F.year("o_orderdate").cast("long").alias("o_year"))
            .agg(F.sum(amount).cast("double").alias("profit"))
            .orderBy("n_name", F.col("o_year").desc())
        )

    def rel_q11_important_stock(spark, sf):
        """TPC-H Q11 analog (important stock): per-part inventory
        value sum(supplycost·availqty) over EUROPE suppliers, keeping
        parts whose value exceeds 1.2× the mean per-part value.  (The
        reference query's fixed 0.0001 fraction makes row counts
        SF-dependent; the mean-relative threshold is scale-free.)  The
        threshold compare is multiplication-only — ``v·n > 1.2·total``
        — because decimal DIVISION scales differ between engines.
        Tiny supplier side broadcast; the global total is a 1-row
        broadcast cross join."""
        ps = _partsupp(spark, sf)
        s = load_table(spark, sf, "supplier")
        n = load_table(spark, sf, "nation")
        r = load_table(spark, sf, "region").where(F.col("r_name") == "EUROPE")
        sn = (
            s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
            .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
            .select("s_suppkey")
        )
        v = (
            ps.join(F.broadcast(sn), F.col("ps_suppkey") == F.col("s_suppkey"))
            .groupBy("ps_partkey")
            .agg(
                F.sum(
                    F.col("ps_supplycost")
                    * F.col("ps_availqty").cast("decimal(10,0)")
                ).alias("_v")
            )
        )
        tot = v.agg(
            F.sum("_v").cast("double").alias("_t"),
            F.count("*").cast("long").alias("_c"),
        )
        return (
            v.crossJoin(F.broadcast(tot))
            .where(F.col("_v").cast("double") * F.col("_c") > 1.2 * F.col("_t"))
            .select(
                F.col("ps_partkey").alias("p_partkey"),
                F.col("_v").cast("double").alias("value"),
            )
            .orderBy(F.col("value").desc(), "p_partkey")
        )

    def rel_q16_supplier_part_counts(spark, sf):
        """TPC-H Q16 analog (supplier-part relationship): distinct
        supplier count per (brand, type, size) bucket over square
        sizes, excluding Brand#1, PROMO parts, and negative-balance
        suppliers (the 'customer complaints' exclusion — the slim
        schema has no s_comment).  The exclusion is a broadcast
        anti-join; the distinct-count shuffles once on the grouping
        key."""
        ps = _partsupp(spark, sf)
        p = (
            load_table(spark, sf, "part")
            .where(
                (F.col("p_brand") != "Brand#1")
                & (F.col("p_type") != "PROMO")
                & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
            )
            .select("p_partkey", "p_brand", "p_type", "p_size")
        )
        bad = (
            load_table(spark, sf, "supplier")
            .where(F.col("s_acctbal") < 0)
            .select(F.col("s_suppkey").alias("ps_suppkey"))
        )
        return (
            ps.join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"))
            .join(F.broadcast(bad), "ps_suppkey", "left_anti")
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("ps_suppkey").cast("long").alias("supplier_cnt"))
            .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
        )

    def rel_q20_potential_promotion(spark, sf):
        """TPC-H Q20 analog (potential part promotion): EUROPE
        suppliers holding excess stock — availqty > half the 1996
        shipped quantity of that (part, supplier) — for 'small %'
        parts.  The correlated IN chain decorrelates to
        aggregate-then-join; the filtered part list and the
        supplier⋈nation⋈region side broadcast; the lineitem aggregate
        is the only fact-scale shuffle.  Quantities are integral
        doubles, so the 0.5·sum compare is exact."""
        ps = _partsupp(spark, sf)
        p = (
            load_table(spark, sf, "part")
            .where(F.col("p_name").like("small%"))
            .select("p_partkey")
        )
        li = load_table(spark, sf, "lineitem").where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        shipped = (
            li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
            .groupBy(
                F.col("l_partkey").alias("ps_partkey"),
                F.col("l_suppkey").alias("ps_suppkey"),
            )
            .agg(F.sum("l_quantity").alias("_q"))
        )
        excess = (
            ps.join(shipped, ["ps_partkey", "ps_suppkey"])
            .where(F.col("ps_availqty").cast("double") > 0.5 * F.col("_q"))
            .select(F.col("ps_suppkey").alias("s_suppkey"))
            .distinct()
        )
        s = load_table(spark, sf, "supplier")
        n = load_table(spark, sf, "nation")
        r = load_table(spark, sf, "region").where(F.col("r_name") == "EUROPE")
        return (
            s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
            .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
            .join(excess, "s_suppkey", "left_semi")
            .select("s_suppkey", "s_name")
            .orderBy("s_suppkey")
        )

    def g_landmark_distances(spark, sf):
        """Exact BFS distances from 4 landmark vertices in ONE
        multi-source frontier loop (graph_metrics.landmark_distances)
        — the distance-oracle / structural-embedding table (Potamias
        et al. CIKM'09).  Oracle: multi-source recursive CTE with
        MIN(d) per (landmark, vertex)."""
        from community_detection_flink_spark.operators import graph_metrics as GM

        edges, _, _ = _graph(spark, sf)
        return GM.landmark_distances(edges, n_landmarks=4, max_depth=20)

    def g_centrality_approx(spark, sf):
        """Landmark-approximated closeness + betweenness centrality
        (graph_metrics.approx_centrality; VERDICT r4 #8) with 4
        deterministic landmarks.  Oracle: the landmark-distance
        recursive CTE, then k/Σd per vertex and the
        on-some-shortest-path landmark-pair count."""
        from community_detection_flink_spark.operators import graph_metrics as GM

        edges, _, _ = _graph(spark, sf)
        return GM.approx_centrality(edges, n_landmarks=4, max_depth=20)

    def rel_q4_order_priority(spark, sf):
        """TPC-H Q4 analog (order-priority checking): 1996-Q1 orders
        with at least one lineitem shipped >30 days after the order
        date, counted per priority.  The EXISTS is a distributed
        left-semi join on the orderkey — lineitem is never aggregated,
        orders never re-scanned."""
        o = load_table(spark, sf, "orders").where(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1996-04-01")
        )
        li = load_table(spark, sf, "lineitem")
        late = (
            li.join(
                o.select("o_orderkey", "o_orderdate"),
                li["l_orderkey"] == o["o_orderkey"],
            )
            .where(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 30))
            .select("o_orderkey")
        )
        return (
            o.join(late, "o_orderkey", "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count("*").cast("long").alias("order_count"))
        )

    def rel_q6_forecast_revenue(spark, sf):
        """TPC-H Q6 analog (forecasting revenue change): revenue delta
        from lineitems in 1996 with discount 0.05-0.07 and quantity
        < 24 — the pure scan+filter+aggregate query; every predicate
        must reach the parquet scan (PushedFilters)."""
        li = load_table(spark, sf, "lineitem")
        return (
            li.where(
                (F.col("l_shipdate") >= "1996-01-01")
                & (F.col("l_shipdate") < "1997-01-01")
                & (F.col("l_discount") >= 0.05)
                & (F.col("l_discount") <= 0.07)
                & (F.col("l_quantity") < 24)
            )
            .agg(
                F.sum(
                    (F.col("l_extendedprice") * F.col("l_discount")).cast(
                        "decimal(18,6)"
                    )
                )
                .cast("double")
                .alias("revenue"),
                F.count("*").cast("long").alias("n_items"),
            )
        )

    def ev_rolling_features(spark, sf):
        """Trailing 7-day per-user rolling features (count + exact
        DECIMAL sum of value) for every event — the feature-store
        point-in-time aggregate shape.  One RANGE window over epoch
        seconds: a single user-keyed shuffle + in-partition sort, no
        self-join range explosion."""
        from pyspark.sql import Window

        ev = load_table(spark, sf, "events")
        sec = F.unix_timestamp("ts").cast("long")
        w = (
            Window.partitionBy("user_id")
            .orderBy(sec)
            .rangeBetween(-7 * 86400, 0)
        )
        return ev.select(
            F.col("event_id").cast("long").alias("event_id"),
            F.col("user_id").cast("long").alias("user_id"),
            F.count("*").over(w).cast("long").alias("n_7d"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .over(w)
            .cast("double")
            .alias("sum_value_7d"),
        )

    def rel_q12_late_priority(spark, sf):
        """TPC-H Q12 analog (shipping-priority anomaly check): for
        1996 lineitems delivered late (shipped >60 days after the
        order date — this schema has no commit/receipt dates or ship
        mode, so lateness vs o_orderdate and l_linestatus stand in,
        same convention as rel_q4), count critical-priority
        (1-URGENT / 2-HIGH) vs other orders per line status.  One
        fact-fact join on the orderkey, then a two-conditional-sum
        aggregate — no second pass over either table."""
        o = load_table(spark, sf, "orders").select(
            "o_orderkey", "o_orderdate", "o_orderpriority"
        )
        li = load_table(spark, sf, "lineitem").select(
            "l_orderkey", "l_linestatus", "l_shipdate"
        )
        crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        return (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .where(
                (F.col("o_orderdate") >= "1996-01-01")
                & (F.col("o_orderdate") < "1997-01-01")
                & (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60))
            )
            .groupBy("l_linestatus")
            .agg(
                F.sum(F.when(crit, 1).otherwise(0))
                .cast("long")
                .alias("high_line_count"),
                F.sum(F.when(crit, 0).otherwise(1))
                .cast("long")
                .alias("low_line_count"),
            )
        )

    def rel_q13_customer_distribution(spark, sf):
        """TPC-H Q13 (customer distribution): how many customers
        placed exactly k non-urgent orders, for every k including 0.
        (The reference filter is on o_comment, absent here; the
        1-URGENT exclusion keeps the filtered-left-join shape.)  The
        left join keeps order-less customers; the double aggregation
        is two shuffles, the second one on a tiny domain."""
        c = load_table(spark, sf, "customer").select("c_custkey")
        o = load_table(spark, sf, "orders").where(
            F.col("o_orderpriority") != "1-URGENT"
        )
        per_cust = (
            c.join(o, c["c_custkey"] == o["o_custkey"], "left")
            .groupBy("c_custkey")
            .agg(F.count("o_orderkey").cast("long").alias("c_count"))
        )
        return per_cust.groupBy("c_count").agg(
            F.count("*").cast("long").alias("custdist")
        )

    def rel_q19_discounted_revenue(spark, sf):
        """TPC-H Q19 analog (discounted revenue, disjunctive
        predicates): revenue from three brand/size/quantity windows
        OR-ed together (container and ship-mode columns don't exist
        in this schema; brand+size keep the disjunct shape).  The
        common l_quantity <= 30 bound is factored out so it pushes to
        the lineitem scan; part is broadcast — the disjunction then
        evaluates inside the single stream-side stage."""
        li = load_table(spark, sf, "lineitem").where(F.col("l_quantity") <= 30)
        pa = load_table(spark, sf, "part").select(
            "p_partkey", "p_brand", "p_size"
        )
        j = li.join(
            F.broadcast(pa), li["l_partkey"] == pa["p_partkey"]
        ).where(
            (
                (F.col("p_brand") == "Brand#12")
                & F.col("p_size").between(1, 5)
                & F.col("l_quantity").between(1, 11)
            )
            | (
                (F.col("p_brand") == "Brand#23")
                & F.col("p_size").between(1, 10)
                & F.col("l_quantity").between(10, 20)
            )
            | (
                (F.col("p_brand") == "Brand#34")
                & F.col("p_size").between(1, 15)
                & F.col("l_quantity").between(20, 30)
            )
        )
        return j.agg(
            F.sum(
                (
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).cast("decimal(18,6)")
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").cast("long").alias("n_items"),
        )

    def rel_q21_waiting_suppliers(spark, sf):
        """TPC-H Q21 analog (suppliers who kept orders waiting): on
        finalized ('F') multi-supplier orders, suppliers who were the
        ONLY late one (l_shipdate > o_orderdate + 45 stands in for
        receipt>commit).  The classic EXISTS / NOT-EXISTS pair is
        re-expressed as per-order supplier-count aggregates — two
        orderkey-shuffles instead of two self-joins of lineitem, and
        the verdict join keys stay co-partitioned on the orderkey."""
        o = load_table(spark, sf, "orders").where(
            F.col("o_orderstatus") == "F"
        ).select("o_orderkey", "o_orderdate")
        li = (
            load_table(spark, sf, "lineitem")
            .select("l_orderkey", "l_suppkey", "l_shipdate")
            .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        )
        per_order = li.groupBy("l_orderkey").agg(
            F.countDistinct("l_suppkey").alias("_nsup"),
            F.countDistinct(
                F.when(
                    F.col("l_shipdate")
                    > F.date_add(F.col("o_orderdate"), 45),
                    F.col("l_suppkey"),
                )
            ).alias("_nlate"),
        )
        late_pairs = (
            li.where(
                F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 45)
            )
            .select("l_orderkey", "l_suppkey")
            .distinct()
        )
        s = load_table(spark, sf, "supplier").select("s_suppkey", "s_name")
        return (
            late_pairs.join(
                per_order.where(
                    (F.col("_nsup") >= 2) & (F.col("_nlate") == 1)
                ).select("l_orderkey"),
                "l_orderkey",
            )
            .groupBy("l_suppkey")
            .agg(F.count("*").cast("long").alias("numwait"))
            .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
            .select("s_name", "numwait")
        )

    def rel_q22_global_sales(spark, sf):
        """TPC-H Q22 analog (global sales opportunity): per nation (no
        phone column — c_nationkey <= 6 stands in for the country-code
        list), count lapsed customers (no order since 2000-01-01; in
        this testdata every customer has SOME order, so the original's
        "never ordered" anti-join would be vacuously empty) whose
        balance beats the cohort's average positive balance.  The
        threshold is an exact DECIMAL sum divided once in double so
        Spark and the oracle agree bit-for-bit; it reaches the filter
        as a broadcast 1-row join, never a driver round-trip."""
        c = load_table(spark, sf, "customer").where(
            F.col("c_nationkey") <= 6
        )
        thr = c.where(F.col("c_acctbal") > 0.0).agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count("*")
            ).alias("_avg")
        )
        o = (
            load_table(spark, sf, "orders")
            .where(F.col("o_orderdate") >= "2000-01-01")
            .select("o_custkey")
        )
        return (
            c.join(F.broadcast(thr))
            .where(F.col("c_acctbal") > F.col("_avg"))
            .join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
            .groupBy(F.col("c_nationkey").cast("long").alias("cntrycode"))
            .agg(
                F.count("*").cast("long").alias("numcust"),
                F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                .cast("double")
                .alias("totacctbal"),
            )
        )

    def doc_containment(spark, sf):
        """Asymmetric containment dedup over word trigram shingles:
        ordered pairs where ≥60% of doc_a's distinct trigrams appear
        in doc_b — catches excerpts/quotes that symmetric Jaccard
        misses.  Prefix-filtered candidate generation (AllPairs
        adapted to the asymmetric bound), exact array_intersect
        verify; see operators/dedup.py::containment_pairs."""
        return D.containment_pairs(
            load_table(spark, sf, "documents"), threshold=0.6, shingle_n=3
        )

    def doc_winnowing(spark, sf):
        """Winnowing fingerprints (Schleimer et al., SIGMOD'03 / MOSS)
        over word 4-grams, window 8: the rightmost-minimum hash of
        every window — local fingerprints with a no-gap coverage
        guarantee, for partial-overlap detection.  One window
        aggregate over hash(doc_id) partitions; see
        operators/textual.py::winnowing_fingerprints.  Oracle computes
        the same selection via an independent join-based formulation
        (window-start × position range join + rightmost argmin)."""
        return T.winnowing_fingerprints(
            load_table(spark, sf, "documents"), k=4, w=8
        )

    def ev_cep_strict(spark, sf):
        """CEP strict-contiguity pattern count per user: runs of views
        then clicks ending in a purchase with NO intervening events
        (``v+c+p`` over the encoded per-user type sequence) — the
        complement of ev_funnel's skip-till-next-match semantics.
        See operators/temporal.py::sequence_pattern_matches."""
        from community_detection_flink_spark.operators import temporal as TP

        return TP.sequence_pattern_matches(
            load_table(spark, sf, "events"),
            "v+c+p",
            {
                "view": "v",
                "click": "c",
                "purchase": "p",
                "signup": "s",
                "error": "e",
            },
        )

    # ---------------- round-10 additions ----------------

    def doc_source_caps(spark, sf):
        """Per-source frequency capping (r10, textual.source_caps —
        the RefinedWeb/CCNet domain-cap pipeline stage): keep at most
        10 docs per source in stable Knuth-hash order.  Exact oracle:
        the identical ROW_NUMBER arithmetic."""
        return T.source_caps(load_table(spark, sf, "documents"), cap=10)

    def doc_source_caps_skew(spark, sf):
        """The SKEW-LEVER variant of doc_source_caps (r11,
        textual.source_caps with skew_buckets — the exact bucketed
        rank that spreads a mega-source over B partitions; ~5× on the
        50%-skew fixture when the full ranking is consumed,
        SCALING.md r11).  Hash-identical to the single-window path by
        bucket monotonicity, so it shares doc_source_caps' oracle
        verbatim — the gate certifies the distributed-rank machinery
        (static hash-range buckets, per-(source, bucket) counts
        prefix-summed into offsets, offset + row_number) cross-engine,
        not just the plan shape."""
        return T.source_caps(
            load_table(spark, sf, "documents"), cap=10, skew_buckets=16
        )

    def doc_bpe_pair_counts(spark, sf):
        """Corpus-weighted adjacent-symbol pair counts over the
        char+</w> tokenization of the distinct-word table (r11,
        operators/bpe.py — the first iteration's statistics of BPE
        tokenizer training, Sennrich et al. 2016).  The corpus
        collapses to distinct words FIRST (the trick that makes BPE
        training tractable at 100 TB); one explode + one keyed
        aggregate.  Exact oracle: DuckDB replays the split/explode
        arithmetic verbatim."""
        from community_detection_flink_spark.operators import bpe as B

        return B.pair_counts(
            B.word_counts(load_table(spark, sf, "documents"))
        )

    def doc_bpe_merges(spark, sf):
        """Learned BPE merge rules, 8 ranks (r11, bpe.bpe_learn):
        iterative and data-dependent (each argmax depends on the
        previous merge), so — like the wcc_* family — rows-only at the
        driver gate, with a pure-Python differential oracle pinning
        the merges EXACTLY (tests/test_bpe.py::ref_bpe, run on this
        same corpus at sf0.001 plus a self-overlapping-run edge-case
        fixture).  Since r12 the default ``auto`` strategy learns
        DRIVER-LOCALLY over the collected distinct-word table (one
        corpus-sized Spark pass, then delta pair-count maintenance at
        ~1 ms/merge — the measured fix for the one-Spark-job-per-merge
        ceiling, SCALING.md r12); the distributed loop remains for
        vocabularies past ``local_vocab_limit`` and is pinned equal to
        the local path by tests/test_bpe.py strategy-parity tests."""
        from community_detection_flink_spark.operators import bpe as B

        return B.bpe_learn(
            load_table(spark, sf, "documents"), num_merges=8
        )

    def doc_minhash_store_pairs(spark, sf):
        """LSH pairs from the PERSISTED banded-signature store (r10,
        dedup.build_minhash_store / minhash_store_append /
        minhash_pairs_from_store — the dedup twin of the IVF index
        maintenance path): store built on 90% of the corpus, the last
        10% APPENDED (one scan over the delta only), pairs read
        bucketed and exchange-free.  Signatures are a pure per-doc
        function, so the append is EXACT: the oracle is the full-
        corpus recompute, and a hash match proves build+append ==
        rebuild bit-for-bit."""
        docs = load_table(spark, sf, "documents")
        store = D.build_minhash_store(
            docs.where(F.col("doc_id") % 10 != 9), table="gate_minhash_store"
        )
        store = D.minhash_store_append(
            store, docs.where(F.col("doc_id") % 10 == 9)
        )
        return D.minhash_pairs_from_store(spark, store)

    def mm_mp4_metadata(spark, sf):
        """MP4/ISO-BMFF container metadata via a REAL box walker (r10,
        multimodal._parse_mp4): spec-shaped synthesized MP4s (full
        ftyp/moov/trak/stbl/mdat tree, real stco offsets) parsed for
        timescale/duration/tracks/sample-table — upgrading the r9 'MP4
        is _fake_decode' gap to real container parsing (codec payload
        decode stays the documented stub).  Closed-form oracle."""
        return M.mp4_metadata(
            M.synthesize_mp4_blobs(load_table(spark, sf, "documents"))
        )

    def mm_mp4_frame_sample(spark, sf):
        """Every-2nd-sample extraction through the real sample table
        (stsz sizes + stco offset → mdat slices; multimodal.
        mp4_sample_frames): value/checksum come from the EXTRACTED
        bytes, so a wrong offset or size is a hash mismatch against
        the closed-form oracle."""
        return M.mp4_sample_frames(
            M.synthesize_mp4_blobs(load_table(spark, sf, "documents")),
            every_k=2,
        )

    def mm_video_frame_decode(spark, sf):
        """REAL video frame decode end-to-end (r12, VERDICT r11 #2):
        MJPEG-in-MP4 blobs synthesized by muxing 2+id%4 REAL baseline
        JPEGs (operators/jpeg.py encoder — FDCT, quantization, Huffman,
        per-doc restart intervals) into a real ISO-BMFF box tree with
        one chunk PER SAMPLE and per-sample mdat padding (the full
        stsc→stco mapping on the certified path, not the contiguous
        layout), then decoded by walking the container, slicing each
        every-2nd sample out of mdat, and running the baseline JPEG
        decoder on the payload (multimodal.mp4_video_frame_decode).
        Frames are constant even-gray 8×8 tiles shifted by frame
        number, which survive the lossy pipeline BIT-EXACTLY, so every
        decoded frame's dimensions, component count, checksum, and mean
        are closed-form in (doc_id, sample_no) — exact SQL oracle.
        This demotes ``_fallback_features`` to genuinely-undecodable
        codecs only (H.264 entropy coding)."""
        return M.mp4_video_frame_decode(
            M.synthesize_mjpeg_mp4_blobs(load_table(spark, sf, "documents")),
            every_k=2,
        )

    def mm_h264_ipcm_roundtrip(spark, sf):
        """REAL H.264 decode for the spec's uncompressed mode (r12,
        operators/h264.py): avc1 tracks of I_PCM-only IDR frames built
        by the real encoder (NAL framing with emulation-prevention
        bytes, exp-Golomb ue/se headers, SPS/PPS parameter sets,
        per-macroblock PCM), muxed with a proper VisualSampleEntry +
        avcC record and AVCC length-prefixed samples, then decoded by
        walking the container and parsing every bitstream layer except
        residual entropy coding — which is exactly the boundary that
        remains labeled (`_fallback_features` now stands in for
        CAVLC/CABAC residuals ONLY, not 'H.264').  I_PCM is lossless
        pass-through, so every decoded pixel is closed-form in
        (doc_id, sample_no, macroblock) — exact SQL oracle."""
        return M.mp4_video_frame_decode(
            M.synthesize_avc_mp4_blobs(load_table(spark, sf, "documents")),
            every_k=1,
        )

    # ------------------------------------------------------------------
    # ORDER MATTERS: the driver's correctness gate records exactly the
    # FIRST 50 dict entries.  ROUND 6 executes the rotation VERDICT r4/
    # r5 asked for: behind the three anchors come this round's three
    # NEW queries, the extended emb_ann_quality, the 37 oracle-backed
    # round-4 second-batch queries that had NEVER appeared in a driver
    # artifact, and six r1-r3-certified queries on a 2-round
    # re-certification rotation — 50/50 oracle-backed, 40 first-time
    # rows.  The three rows-only slot-wasters (emb_lsh_ann,
    # emb_ivf_ann, wcc_incremental_localized) move below the cap; their
    # exactness twins (emb_ann_quality, wcc_invariants) stay inside.
    # Everything below the cap keeps committed evidence via
    # CORRECTNESS_r01-r05 and the per-round local sweeps
    # (tools/check_oracles.py --json).
    # ------------------------------------------------------------------

    # ---------------- round-7 additions ----------------

    def doc_cdc_chunks(spark, sf):
        """Content-defined chunking (dedup.content_defined_chunks —
        the LBFS/FastCDC rolling-hash boundary rule, window=8,
        divisor=64): per-chunk rows with 1-based spans and md5-derived
        chunk hashes.  All-JVM higher-order expressions; the oracle
        replays the identical polynomial (cdc_pows literals shared
        between both engines)."""
        return D.content_defined_chunks(load_table(spark, sf, "documents"))

    def doc_cdc_chunk_dedup(spark, sf):
        """Chunk-level dedup over content-defined chunks
        (dedup.cdc_chunk_dedup): recurring chunk contents with
        occurrence/document counts — the aggregate behind
        dedup-by-reference stores and boilerplate scrubbing.  One
        chunk_hash shuffle with map-side combine."""
        return D.cdc_chunk_dedup(load_table(spark, sf, "documents"))

    def emb_jl_projection(spark, sf):
        """Johnson-Lindenstrauss ±1 random projection
        (similarity.jl_project, Achlioptas'03): 64 floats → 16 exact
        double components as SCALAR columns (p00..p15), sign matrix
        injected as literals into both engines.  Pure map — no
        shuffle."""
        return S.jl_project(load_table(spark, sf, "embeddings"))

    def emb_jl_distortion(spark, sf):
        """Measured JL distortion (similarity.jl_distortion): for all
        pairs in the 30-vector prefix, ‖R(xa−xb)‖²/(k·‖xa−xb‖²) — the
        JL lemma says ≈1; the 435 per-pair ratios are exact row-local
        folds (no cross-row float aggregation), rounded to 9."""
        return S.jl_distortion(load_table(spark, sf, "embeddings"))

    def ev_late_audit(spark, sf):
        """Watermark late-data audit (windows.late_data_audit): with a
        10-minute watermark delay and event_id arrival order, how many
        events per type would Structured Streaming drop as late, and
        by how much?  Running-max analytic + one aggregate, integral-µs
        exact."""
        return W.late_data_audit(load_table(spark, sf, "events"), 10)

    def ev_watermark_sizing(spark, sf):
        """Watermark sizing curve (windows.watermark_sizing, r8): drop
        counts for a GRID of candidate delays (1/5/10/30 min) from ONE
        analytic pass — the same disorder column feeds one conditional
        sum per delay, so the whole curve costs a single-delay audit.
        Integral-µs + basis-point arithmetic, oracle-exact."""
        return W.watermark_sizing(load_table(spark, sf, "events"))

    def doc_sliding_chunks(spark, sf):
        """Sliding word-window RAG chunking (textual.sliding_word_chunks,
        r8): 40-word windows every 30 words (10-word overlap) — the
        standard retrieval chunker, complementing pack_chunks (greedy
        budget fill) and cdc_chunks (content-defined boundaries).  All
        JVM higher-order functions, zero shuffle; only ~100-byte chunk
        rows leave the scan stage.  md5 over the joined words gives an
        engine-portable exact oracle."""
        return T.sliding_word_chunks(load_table(spark, sf, "documents"))

    def ev_heartbeat_gaps(spark, sf):
        """Per-user heartbeat/gap audit (temporal.heartbeat_gaps, r8):
        consecutive-event gaps over a 30-minute threshold, per user —
        one keyed window + one aggregate, no self-join, integral-µs
        exact."""
        from community_detection_flink_spark.operators.temporal import (
            heartbeat_gaps,
        )

        return heartbeat_gaps(load_table(spark, sf, "events"))

    def doc_winnow_pairs(spark, sf):
        """MOSS match step (textual.winnowing_overlap_pairs): document
        pairs sharing ≥2 distinct winnowing fingerprints, candidates
        formed only inside fingerprint buckets with the >50-doc
        boilerplate fingerprints dropped first (skew-safe at corpus
        scale)."""
        return T.winnowing_overlap_pairs(load_table(spark, sf, "documents"))

    def ev_resample_ffill(spark, sf):
        """Daily-grid resampling with forward fill
        (temporal.resample_ffill — the date-spine/gap-fill warehouse
        primitive): per user < 50, one row per day of their active
        span carrying the last-at-or-before value (struct-max
        deterministic).  Grid explode + one user-keyed window."""
        from community_detection_flink_spark.operators import temporal as TP

        return TP.resample_ffill(load_table(spark, sf, "events"))

    def ev_attribution(spark, sf):
        """Last-touch attribution (temporal.last_touch_attribution):
        each purchase credited to the most recent preceding
        non-purchase event within 7 days — one analytic window, no
        event×event self-join; struct-MAX so both engines share the
        order-free semantics."""
        from community_detection_flink_spark.operators import temporal as TP

        return TP.last_touch_attribution(load_table(spark, sf, "events"))

    def emb_truncation_recall(spark, sf):
        """Dimension-truncation recall (similarity.
        truncated_cosine_recall, the Matryoshka sizing question):
        exact top-5 overlap between full 64-dim and first-16-dim
        cosine rankings for the 10-query prefix — both rankings
        brute-force, fold-exact, so the metric itself hash-matches."""
        return S.truncated_cosine_recall(load_table(spark, sf, "embeddings"))

    def rel_bloom_prune(spark, sf):
        """Bloom-filter runtime pruning (sketches.bloom_semi_prune,
        r8): suppliers of nations 0-4 hash into a 1024-bit filter
        (k=3 universal multiplicative hashes — engine-portable,
        unlike Murmur3); the lineitem scan tests every l_suppkey and
        ONE row reports pass/member/false-positive counts and the
        measured FPR in basis points.  The 128-byte bitmap broadcasts
        instead of the fact keys shuffling to a semi-join — the
        100 TB runtime-filter pattern, made measurable."""
        from community_detection_flink_spark.operators.sketches import (
            bloom_semi_prune,
        )

        sup = load_table(spark, sf, "supplier").where(F.col("s_nationkey") < 5)
        return bloom_semi_prune(load_table(spark, sf, "lineitem"), sup)

    def doc_phrase_search(spark, sf):
        """Positional phrase search (search.phrase_search, r8): exact
        consecutive-token matches of 'key agg row' via posting-list
        intersection on (doc_id, pos - i) — the inverted-index plan
        (corpus scanned once, joins carry only the 3 query terms'
        postings), vs the oracle's per-query LIKE-style scan."""
        from community_detection_flink_spark.operators.search import (
            phrase_search,
        )

        return phrase_search(load_table(spark, sf, "documents"))

    def emb_dup_threshold_curve(spark, sf):
        """Near-dup census across a cosine-threshold GRID
        (dedup.cosine_dup_threshold_curve, r8): the Σ per-block n²
        cosine pass runs ONCE; every candidate cutoff
        (0.2/0.3/0.35/0.4/0.5) is a conditional sum over the same
        scored rows — the watermark_sizing pattern applied to dedup
        threshold selection."""
        return D.cosine_dup_threshold_curve(load_table(spark, sf, "embeddings"))

    def rel_zorder_prune(spark, sf):
        """Z-order vs linear layout pruning (layout.
        zorder_pruning_stats, r8): would-be file assignment under
        both layouts from pure div/mod arithmetic (the interleave SQL
        is generated once and shared with the oracle), then one
        aggregate reports how many of 16 files a 2-D box predicate
        touches under each — the ZORDER BY effectiveness claim as a
        hash-certified number."""
        from community_detection_flink_spark.operators.layout import (
            zorder_pruning_stats,
        )

        return zorder_pruning_stats(load_table(spark, sf, "orders"))

    def rel_merge_upsert(spark, sf):
        """MERGE INTO semantics (merge.merge_upsert, r8): a
        deterministic CDC batch derived from orders itself (deletes:
        key%13==0; updates: key%7==0 → totalprice+10; inserts:
        key%17==0 re-keyed +10M) applies in ONE broadcast left join +
        an insert union — the copy-on-write MERGE arithmetic of the
        lakehouse write path, output = the exact post-MERGE table
        with an action audit column."""
        from community_detection_flink_spark.operators.merge import (
            merge_upsert,
        )

        key = F.col("o_orderkey")
        base = load_table(spark, sf, "orders").select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
        )
        ch_d = base.where(key % 13 == 0).select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            F.lit("D").alias("op"),
        )
        ch_u = base.where((key % 13 != 0) & (key % 7 == 0)).select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            (F.col("o_totalprice") + F.lit(10.0)).alias("o_totalprice"),
            F.lit("U").alias("op"),
        )
        # insert keys offset by max(o_orderkey): collision-proof at
        # every SF (a fixed +10M offset collides with real orderkeys
        # once max = 6M·SF crosses it, ADVICE r8); broadcast 1-row max
        mx = base.agg(F.max("o_orderkey").alias("_mx"))
        ch_i = (
            base.where(key % 17 == 0)
            .crossJoin(F.broadcast(mx))
            .select(
                (key + F.col("_mx")).alias("o_orderkey"),
                "o_custkey",
                F.lit("N").alias("o_orderstatus"),
                F.lit(100.0).alias("o_totalprice"),
                F.lit("I").alias("op"),
            )
        )
        changes = ch_d.unionByName(ch_u).unionByName(ch_i)
        return merge_upsert(
            base,
            changes,
            "o_orderkey",
            ["o_custkey", "o_orderstatus", "o_totalprice"],
        )

    def ev_ohlc_bars(spark, sf):
        """OHLC downsampling (temporal.ohlc_bars, r8): per event_type
        per hour, open/high/low/close/count with struct-extremum
        open+close (deterministic under ties, no cross-row float
        arithmetic — pure selections, so hashes match exactly).  One
        keyed aggregate with map-side combine."""
        from community_detection_flink_spark.operators.temporal import (
            ohlc_bars,
        )

        return ohlc_bars(load_table(spark, sf, "events"))

    # ------------------------------------------------------------------
    _registry = {
        # --- registry in r9 order; the ACTUAL gate prefix is
        # _R10_PREFIX below (VERDICT r9 #6 rotation) — the return
        # statement reorders so those 50 come first, everything else
        # keeps this order ---
        # anchors: round-over-round continuity, certified every round
        "g_edges": g_edges,
        "wcc_invariants": wcc_invariants,
        "ev_funnel": ev_funnel,
        "cdc_invariants": cdc_invariants,
        "emb_ann_quality": emb_ann_quality,
        # first driver hash-certification: the three late-r8 operators
        # plus the three ANN paths, rows-only through r8 and carrying
        # full differential SQL oracles since r9 (pinned hyperplanes /
        # landed IVF index replayed in DuckDB)
        "emb_dup_threshold_curve": emb_dup_threshold_curve,
        "rel_zorder_prune": rel_zorder_prune,
        "rel_merge_upsert": rel_merge_upsert,
        "emb_lsh_ann": emb_lsh_ann,
        "emb_ivf_ann": emb_ivf_ann,
        "emb_ivfpq_ann": emb_ivfpq_ann,
        # first driver hash-certification: the eleven r9b operators
        # (all hash-green at sf0.001/0.01/0.1 in the committed local
        # sweeps before entering the gate) — they displace the last
        # 11 re-certification rows of the r9 rotation below the cap,
        # which keep per-round local-sweep evidence
        "emb_semantic_dedup": emb_semantic_dedup,
        "emb_knn_graph": emb_knn_graph,
        "emb_kmeans_refine": emb_kmeans_refine,
        "emb_dup_clusters": emb_dup_clusters,
        "ev_hll_distinct": ev_hll_distinct,
        "ev_daily_hll_users": ev_daily_hll_users,
        "ev_histogram_quantiles": ev_histogram_quantiles,
        "ev_cms_heavy_hitters": ev_cms_heavy_hitters,
        "doc_mixture_sample": doc_mixture_sample,
        "doc_char_entropy": doc_char_entropy,
        "rel_fuzzy_part_match": rel_fuzzy_part_match,
        # named r9 rotation block: all 22 entries whose newest driver
        # artifact was CORRECTNESS_r05
        "rel_scd2": rel_scd2,
        "ev_anomalies": ev_anomalies,
        "ev_topk_per_window": ev_topk_per_window,
        "emb_centroid_assign": emb_centroid_assign,
        "rel_window_distribution": rel_window_distribution,
        "ev_partition_pruned": ev_partition_pruned,
        "rel_bucketed_join": rel_bucketed_join,
        "mm_wav_roundtrip": mm_wav_roundtrip,
        "mm_bmp_roundtrip": mm_bmp_roundtrip,
        "rel_sketch_quality": rel_sketch_quality,
        "rel_q3_shipping_priority": rel_q3_shipping_priority,
        "rel_q18_large_orders": rel_q18_large_orders,
        "rel_pivot_status": rel_pivot_status,
        "rel_unpivot_prices": rel_unpivot_prices,
        "rel_snapshot_diff": rel_snapshot_diff,
        "rel_csv_roundtrip": rel_csv_roundtrip,
        "rel_json_roundtrip": rel_json_roundtrip,
        "rel_grouping_sets": rel_grouping_sets,
        "doc_pii_scrub": doc_pii_scrub,
        "doc_quality_sample": doc_quality_sample,
        "doc_dup_ratio_by_source": doc_dup_ratio_by_source,
        "doc_normalize": doc_normalize,
        # oldest remainder: r6-certified entries NOT re-certified by
        # the r8 judge sweep (the 50-slot cap cannot reach the whole
        # r6 cohort; the rest stays covered by the committed
        # full-registry sweeps at sf0.01 + sf0.1 every round)
        "g_centrality_approx": g_centrality_approx,
        "rel_q8_market_share": rel_q8_market_share,
        "rel_q5_local_supplier": rel_q5_local_supplier,
        "rel_q10_returned_items": rel_q10_returned_items,
        "rel_orc_roundtrip": rel_orc_roundtrip,
        "g_link_scores": g_link_scores,
        "g_assortativity": g_assortativity,
        "ev_transitions": ev_transitions,
        "doc_repeated_passages": doc_repeated_passages,
        "emb_norm_stats": emb_norm_stats,
        "rel_q7_volume_shipping": rel_q7_volume_shipping,
        "g_label_propagation": g_label_propagation,
        "emb_covariance": emb_covariance,
        "g_sssp_weighted": g_sssp_weighted,
        "g_random_walks": g_random_walks,
        "doc_minhash_quality": doc_minhash_quality,
        "rel_q4_order_priority": rel_q4_order_priority,
        # --- below the driver cap (covered by the committed
        # full-registry sweeps at sf0.01 + sf0.1 every round; the r8
        # prefix entries rotated out are all r8-gate-green) ---
        "doc_cdc_chunks": doc_cdc_chunks,
        "doc_cdc_chunk_dedup": doc_cdc_chunk_dedup,
        "emb_jl_projection": emb_jl_projection,
        "emb_jl_distortion": emb_jl_distortion,
        "ev_late_audit": ev_late_audit,
        "doc_winnow_pairs": doc_winnow_pairs,
        "emb_truncation_recall": emb_truncation_recall,
        "ev_resample_ffill": ev_resample_ffill,
        "ev_attribution": ev_attribution,
        "mm_gif_frames": mm_gif_frames,
        "ev_watermark_sizing": ev_watermark_sizing,
        "doc_sliding_chunks": doc_sliding_chunks,
        "ev_heartbeat_gaps": ev_heartbeat_gaps,
        "rel_bloom_prune": rel_bloom_prune,
        "doc_phrase_search": doc_phrase_search,
        "ev_ohlc_bars": ev_ohlc_bars,
        "rel_pricing_summary": rel_pricing_summary,
        "rel_top_orders": rel_top_orders,
        "rel_window_top_customers": rel_window_top_customers,
        "rel_rollup_orders": rel_rollup_orders,
        "rel_parts_intersect": rel_parts_intersect,
        "rel_parts_never_ordered": rel_parts_never_ordered,
        "rel_skewed_agg": rel_skewed_agg,
        "rel_percentiles": rel_percentiles,
        "rel_profile_orders": rel_profile_orders,
        "doc_pack_chunks": doc_pack_chunks,
        "doc_contamination": doc_contamination,
        "doc_cross_dedup": doc_cross_dedup,
        "doc_repetition": doc_repetition,
        "doc_stratified_sample": doc_stratified_sample,
        "emb_quantize": emb_quantize,
        "emb_cosine_topk": emb_cosine_topk,
        "emb_near_dups": emb_near_dups,
        "g_connected_components": g_connected_components,
        "g_components_paths": g_components_paths,
        "mm_blob_meta": mm_blob_meta,
        "mm_decode_features": mm_decode_features,
        "g_pagerank": g_pagerank,
        "g_pagerank_weighted": g_pagerank_weighted,
        "g_modularity": g_modularity,
        "g_kcore": g_kcore,
        "g_bfs": g_bfs,
        "doc_bm25": doc_bm25,
        "ev_retention": ev_retention,
        "doc_tfidf": doc_tfidf,
        "rel_q12_late_priority": rel_q12_late_priority,
        "rel_q13_customer_distribution": rel_q13_customer_distribution,
        "rel_q19_discounted_revenue": rel_q19_discounted_revenue,
        "rel_q21_waiting_suppliers": rel_q21_waiting_suppliers,
        "rel_q22_global_sales": rel_q22_global_sales,
        "doc_containment": doc_containment,
        "doc_winnowing": doc_winnowing,
        "ev_cep_strict": ev_cep_strict,
        "rel_q2_min_cost_supplier": rel_q2_min_cost_supplier,
        "rel_q9_product_profit": rel_q9_product_profit,
        "rel_q11_important_stock": rel_q11_important_stock,
        "rel_q16_supplier_part_counts": rel_q16_supplier_part_counts,
        "rel_q20_potential_promotion": rel_q20_potential_promotion,
        "emb_product_quantization": emb_product_quantization,
        "emb_code_dedup": emb_code_dedup,
        "mm_frame_sample": mm_frame_sample,
        "doc_dedup_groups": doc_dedup_groups,
        "doc_dedup_keep_best": doc_dedup_keep_best,
        "doc_exact_dedup": doc_exact_dedup,
        "doc_fingerprint": doc_fingerprint,
        "doc_jaccard_pairs": doc_jaccard_pairs,
        "doc_lang_id": doc_lang_id,
        "doc_minhash_lsh_pairs": doc_minhash_lsh_pairs,
        "doc_minhash_signatures": doc_minhash_signatures,
        "doc_quality": doc_quality,
        "doc_sample_split": doc_sample_split,
        "doc_simhash": doc_simhash,
        "doc_simhash_near_dups": doc_simhash_near_dups,
        "doc_token_stats": doc_token_stats,
        "doc_top_ngrams": doc_top_ngrams,
        "ev_asof_prior_purchase": ev_asof_prior_purchase,
        "ev_json_props": ev_json_props,
        "ev_range_recent_purchases": ev_range_recent_purchases,
        "ev_session": ev_session,
        "ev_sliding": ev_sliding,
        "ev_tumbling": ev_tumbling,
        "ev_user_running": ev_user_running,
        "g_community_triangles": g_community_triangles,
        "g_intra_degree": g_intra_degree,
        "g_vertex_community_degrees": g_vertex_community_degrees,
        "rel_cube_orders": rel_cube_orders,
        "rel_customers_without_orders": rel_customers_without_orders,
        "rel_nation_revenue": rel_nation_revenue,
        "rel_parts_in_lineitem": rel_parts_in_lineitem,
        "ev_interval_join": ev_interval_join,
        "doc_unigram_nll": doc_unigram_nll,
        "rel_q6_forecast_revenue": rel_q6_forecast_revenue,
        "ev_rolling_features": ev_rolling_features,
        "g_landmark_distances": g_landmark_distances,
        "emb_pq_ann": emb_pq_ann,
        "ev_debounce": ev_debounce,
        "g_snapshot_edges": g_snapshot_edges,
        "g_graph_summary": g_graph_summary,
        "rel_q14_promo_revenue": rel_q14_promo_revenue,
        "rel_q17_small_qty_revenue": rel_q17_small_qty_revenue,
        "g_ktruss": g_ktruss,
        "rel_q15_top_supplier": rel_q15_top_supplier,
        "doc_passage_locations": doc_passage_locations,
        "ev_trigrams": ev_trigrams,
        "rel_monthly_growth": rel_monthly_growth,
        "rel_abc_analysis": rel_abc_analysis,
        "g_rich_club": g_rich_club,
        "rel_data_quality": rel_data_quality,
        "g_degree_histogram": g_degree_histogram,
        "g_degrees": g_degrees,
        "g_triangle_counts": g_triangle_counts,
        "g_vertex_metrics": g_vertex_metrics,
        "g_community_stats": g_community_stats,
        "g_adjacency": g_adjacency,
        "rel_distinct_counts": rel_distinct_counts,
        # r10 additions (below the cap this round; local-sweep +
        # pinned-test evidence, r11 rotation candidates)
        "doc_source_caps": doc_source_caps,
        "doc_source_caps_skew": doc_source_caps_skew,
        # r11: distributed BPE tokenizer training
        "doc_bpe_pair_counts": doc_bpe_pair_counts,
        "doc_bpe_merges": doc_bpe_merges,
        "doc_minhash_store_pairs": doc_minhash_store_pairs,
        "mm_mp4_metadata": mm_mp4_metadata,
        "mm_mp4_frame_sample": mm_mp4_frame_sample,
        "mm_video_frame_decode": mm_video_frame_decode,
        "mm_h264_ipcm_roundtrip": mm_h264_ipcm_roundtrip,
        # r11 addition: the real baseline-JPEG codec roundtrip
        "mm_jpeg_roundtrip": mm_jpeg_roundtrip,
        # (the 11 r9/r9b operators moved INTO the gate prefix above
        # for their first driver certification)
        # r12 addition: delete-path certification in isolation
        "wcc_delete_invariants": wcc_delete_invariants,
        "wcc_incremental_localized": wcc_incremental_localized,
        "wcc_communities": wcc_communities,
        "wcc_stats": wcc_stats,
        "wcc_incremental": wcc_incremental,
        "wcc_cdc": wcc_cdc,
    }
    # --- r13 gate prefix (the driver certifies the FIRST 50 entries;
    # composition per VERDICT r12 #8): 5 anchors; the 9 r8-deferred
    # relational mirrors named by the r12 rotation comment
    # (rel_pricing_summary .. rel_window_top_customers + rel_skewed_agg
    # — newest driver artifact r8, the oldest hash-checked cohort);
    # 13 re-certs whose CODE changed this round (the r13 optimization
    # pass touched graph_metrics.py — k-core/BFS/LPA/SSSP/k-truss/
    # landmark/centrality loops, components.py — the CC family and its
    # consumers emb_dup_clusters/doc_dedup_groups/doc_dedup_keep_best,
    # and community/refinement/partition/incremental — covered by the
    # wcc_invariants/cdc_invariants anchors + wcc_delete_invariants);
    # and 23 of the 40-entry r9 cohort (oldest remaining hash-checked
    # artifacts).  The 5 wcc pipeline entries whose newest artifact is
    # r3/r5 (wcc_communities/stats/incremental/cdc/localized) stay
    # BELOW the cap deliberately: they have no hash oracle (err
    # no_oracle at any gate — iterative outputs), so gating them would
    # trade 5 hash-checked slots for 5 null rows; their correctness
    # surface IS the anchored invariant queries
    # (wcc_invariants/cdc_invariants/wcc_delete_invariants, all in the
    # prefix) plus the differential oracles in tests/.
    # doc_bpe_merges stays below the cap deliberately: rows-only at the
    # gate (iterative), pinned instead by the pure-Python differential
    # oracle + strategy-parity tests (tests/test_bpe.py).  Everything
    # rotated below the cap is r9-r12-gate-green and keeps per-round
    # full-sweep evidence. ---
    _R13_PREFIX = [
        # anchors
        "g_edges", "wcc_invariants", "ev_funnel", "cdc_invariants",
        "emb_ann_quality",
        # the r8-deferred relational mirrors (newest artifact r8)
        "rel_pricing_summary", "rel_top_orders", "rel_percentiles",
        "rel_profile_orders", "rel_rollup_orders", "rel_parts_intersect",
        "rel_parts_never_ordered", "rel_window_top_customers",
        "rel_skewed_agg",
        # code changed this round: re-certify
        "g_kcore", "g_bfs", "g_connected_components", "g_components_paths",
        "g_label_propagation", "g_sssp_weighted", "g_ktruss",
        "g_landmark_distances", "g_centrality_approx", "emb_dup_clusters",
        "doc_dedup_groups", "doc_dedup_keep_best", "wcc_delete_invariants",
        # 23 of the r9 cohort (oldest hash-checked artifacts)
        "emb_dup_threshold_curve", "rel_zorder_prune", "rel_merge_upsert",
        "emb_lsh_ann", "emb_ivf_ann", "emb_ivfpq_ann", "ev_hll_distinct",
        "ev_daily_hll_users", "ev_histogram_quantiles",
        "ev_cms_heavy_hitters", "doc_char_entropy", "rel_fuzzy_part_match",
        "rel_scd2", "ev_anomalies", "ev_topk_per_window",
        "emb_centroid_assign", "rel_window_distribution",
        "ev_partition_pruned", "rel_bucketed_join", "mm_wav_roundtrip",
        "mm_bmp_roundtrip", "rel_sketch_quality",
        "rel_q3_shipping_priority",
    ]
    assert len(_R13_PREFIX) == 50 and len(set(_R13_PREFIX)) == 50
    return {**{k: _registry[k] for k in _R13_PREFIX}, **_registry}


# ----------------------------------------------------------------------
# DuckDB oracles
# ----------------------------------------------------------------------

# shared CTE prefixes
_G = """
WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
edges AS (SELECT DISTINCT a.pk AS src, b.pk AS dst FROM li a JOIN li b USING (ok) WHERE a.pk <> b.pk),
tri AS (
  SELECT e1.src AS u, e1.dst AS v, e2.dst AS w
  FROM edges e1
  JOIN edges e2 ON e2.src = e1.dst
  JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
  WHERE e1.src < e1.dst AND e1.dst < e2.dst
),
tcnt AS (
  SELECT x AS vId, CAST(COUNT(*) AS BIGINT) AS t FROM (
    SELECT u AS x FROM tri UNION ALL SELECT v FROM tri UNION ALL SELECT w FROM tri
  ) GROUP BY x
),
tedges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT u AS src, v AS dst FROM tri UNION ALL SELECT v, u FROM tri
    UNION ALL SELECT u, w FROM tri UNION ALL SELECT w, u FROM tri
    UNION ALL SELECT v, w FROM tri UNION ALL SELECT w, v FROM tri
  )
),
vm AS (
  SELECT t.vId, t.t, d.vt,
         CASE WHEN d.vt < 2 THEN 0.0 ELSE 2.0 * t.t / (d.vt * (d.vt - 1)) END AS cc
  FROM tcnt t JOIN (SELECT src AS vId, CAST(COUNT(*) AS BIGINT) AS vt FROM tedges GROUP BY src) d USING (vId)
),
lab AS (SELECT vId, vId % 10 AS cId FROM vm),
ewc AS (
  SELECT e.src, e.dst, ls.cId AS c_src, ld.cId AS c_dst
  FROM tedges e JOIN lab ls ON ls.vId = e.src JOIN lab ld ON ld.vId = e.dst
)
"""

_TOKS = (
    "list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')"
)
_H60 = "CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"

# winnowing fingerprint chain (through the rightmost-min selection)
# shared by doc_winnowing and doc_winnow_pairs
_WINNOW_SQL = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
shl AS (
  SELECT doc_id, unnest(
    CASE WHEN len(tk) < 4
    THEN [struct_pack(p := CAST(1 AS BIGINT), s := array_to_string(tk, ' '))]
    ELSE list_transform(range(len(tk) - 3),
      i -> struct_pack(p := CAST(i + 1 AS BIGINT),
                       s := tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] || ' ' || tk[i+4]))
    END) AS u
  FROM toks
),
sh AS (SELECT doc_id, u.p AS pos, {_H60.format(x='u.s')} AS g FROM shl),
tot AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
starts AS (
  SELECT s.doc_id, s.pos AS j FROM sh s JOIN tot USING (doc_id)
  WHERE s.pos <= greatest(n - 7, 1)
),
wmin AS (
  SELECT st.doc_id, st.j, MIN(p.g) AS mg
  FROM starts st JOIN sh p
    ON p.doc_id = st.doc_id AND p.pos BETWEEN st.j AND st.j + 7
  GROUP BY 1, 2
),
sel AS (
  SELECT w.doc_id, MAX(p.pos) AS pos, w.mg AS fp
  FROM wmin w JOIN sh p
    ON p.doc_id = w.doc_id AND p.pos BETWEEN w.j AND w.j + 7 AND p.g = w.mg
  GROUP BY w.doc_id, w.j, w.mg
)"""


def _simhash_sql(bits: int = 32) -> str:
    votes = ", ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(bits)
    )
    fp = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN (CAST(1 AS BIGINT) << {i}) ELSE 0 END)"
        for i in range(bits)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
),
h AS (SELECT doc_id, {_H60.format(x='tok')} AS h FROM toks),
v AS (SELECT doc_id, {votes} FROM h GROUP BY doc_id)
SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM v
"""


def _minhash_sig_sql(num_hashes: int = 8) -> str:
    coeffs = D.minhash_coeffs(num_hashes)
    a_list = "[" + ", ".join(str(a) for a, _ in coeffs) + "]"
    b_list = "[" + ", ".join(str(b) for _, b in coeffs) + "]"
    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
sh AS (
  SELECT doc_id,
    CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
    ELSE list_transform(range(len(tk) - 2), i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3])
    END AS s
  FROM toks
),
based AS (
  SELECT doc_id, list_transform(s, x -> {_H60.format(x='x')} % {D.MINHASH_MOD}) AS base FROM sh
),
sig AS (
  SELECT doc_id, list_transform(range({num_hashes}), i ->
    list_min(list_transform(base, x -> (x * ({a_list})[i+1] + ({b_list})[i+1]) % {D.MINHASH_MOD}))
  ) AS sig
  FROM based
)
"""



_ORDERS_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


def _profile_sql(table: str, cols: tuple[str, ...]) -> str:
    parts = [
        f"""SELECT '{c}' AS "column", CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
  CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
  CAST(MIN({c}) AS VARCHAR) AS min_value,
  CAST(MAX({c}) AS VARCHAR) AS max_value
FROM {table}"""
        for c in cols
    ]
    return "\nUNION ALL\n".join(parts)


def _dedup_comp_sql() -> str:
    """Shared recursive-CTE prefix for the dedup-group oracles:
    MinHash LSH pairs → transitive closure → per-doc canonical group
    (CTE ``comp``: doc_id, group_id)."""
    return _minhash_sig_sql(8).replace("WITH ", "WITH RECURSIVE ", 1) + """,
banded AS (
  SELECT doc_id, b, md5(array_to_string(sig[b*2+1 : b*2+2], ',')) AS bucket
  FROM sig, UNNEST([0, 1, 2, 3]) AS t(b)
),
pairs AS (
  SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b
  FROM banded a JOIN banded b2 USING (b, bucket)
  WHERE a.doc_id < b2.doc_id GROUP BY 1, 2
),
e AS (SELECT doc_a AS a, doc_b AS b FROM pairs UNION SELECT doc_b, doc_a FROM pairs),
reach(a, b) AS (
  SELECT a, b FROM e
  UNION
  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a
),
comp AS (
  SELECT d.doc_id, least(d.doc_id, COALESCE(MIN(r.b), d.doc_id)) AS group_id
  FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
  GROUP BY d.doc_id
)
"""


_DOT = (
    "list_reduce(list_prepend(0.0, list_transform(range(len({a})), "
    "i -> CAST({a}[i+1] AS DOUBLE) * CAST({b}[i+1] AS DOUBLE))), (x, y) -> x + y)"
)


# shared PQ oracle prefix (m=4 subspaces of 16 dims, 8 codewords from
# the first 8 vectors — the constants the emb_product_quantization /
# emb_pq_ann queries fix for the 64-dim test corpus): cent = codebook,
# rws = corpus subvectors, scored = subspace distances (same left-fold
# as the Spark zip_with), best rn=1 = the assigned code per subspace
_PQ_SQL = """
WITH cent AS (
  SELECT vec_id AS cid, CAST(r.j AS BIGINT) AS j,
         embedding[CAST(r.j AS INTEGER) * 16 + 1 : CAST(r.j AS INTEGER) * 16 + 16] AS cvec
  FROM embeddings, UNNEST(range(4)) r(j) WHERE vec_id < 8
),
rws AS (
  SELECT vec_id, CAST(r.j AS BIGINT) AS j,
         embedding[CAST(r.j AS INTEGER) * 16 + 1 : CAST(r.j AS INTEGER) * 16 + 16] AS sv
  FROM embeddings, UNNEST(range(4)) r(j)
),
scored AS (
  SELECT vec_id, j, cid,
    list_reduce(list_prepend(0.0, list_transform(range(16),
      i -> (CAST(sv[i + 1] AS DOUBLE) - CAST(cvec[i + 1] AS DOUBLE))
           * (CAST(sv[i + 1] AS DOUBLE) - CAST(cvec[i + 1] AS DOUBLE)))),
      (x, y) -> x + y) AS d2
  FROM rws JOIN cent USING (j)
),
best AS (
  SELECT vec_id, j, cid AS code, d2,
    ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d2, cid) AS rn
  FROM scored
)"""


def _ivf_route_sql(qmax: int, n_probe: int = 8) -> str:
    """Shared IVF routing CTE prefix (r9): recomputes the ENTIRE index
    build in SQL — md5 centroid sample (``similarity.ivf_centroids``),
    row-normalized float64 centroids, nearest-cell corpus assignment —
    plus the query-side top-``n_probe`` probe routing, ending in a
    ``cand(query_id, vec_id)`` CTE.

    This is a genuine differential check of the routing, not a replay:
    DuckDB's left-fold dot product and numpy's blocked matmul differ by
    ≤ 4.4e-16 on this data while the smallest routing decision margin
    (top-1 cell and probe-8 boundary) is ≥ 2.4e-05 — eleven orders of
    magnitude of headroom, measured in the r9 session on the sf0.01
    corpus.  Tie-breaks are pinned (score DESC, cell ASC) on both
    sides.
    """
    dot_ec = _DOT.format(a="e.embedding", b="c.cv")
    nrm = _DOT.format(a="embedding", b="embedding")
    return f"""cs AS (
  SELECT vec_id, embedding,
    ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR) || ',42')) - 1 AS cell
  FROM embeddings
  QUALIFY ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR) || ',42'))
    <= GREATEST(4, CAST(FLOOR(SQRT(CAST((SELECT COUNT(*) FROM embeddings) AS DOUBLE))) AS BIGINT))
),
cn AS (
  SELECT cell,
    list_transform(embedding, x -> CAST(x AS DOUBLE) / GREATEST(sqrt({nrm}), 1e-12)) AS cv
  FROM cs
),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY {dot_ec} DESC, c.cell) AS rn
    FROM embeddings e, cn c) WHERE rn = 1
),
probes AS (
  SELECT query_id, cell FROM (
    SELECT e.vec_id AS query_id, c.cell,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY {dot_ec} DESC, c.cell) AS rn
    FROM embeddings e, cn c WHERE e.vec_id < {qmax})
  WHERE rn <= LEAST({n_probe}, (SELECT COUNT(*) FROM cn))
),
cand AS (
  SELECT DISTINCT p.query_id, a.vec_id
  FROM probes p JOIN assign a USING (cell)
  WHERE a.vec_id <> p.query_id
)"""


def _lsh_ann_sql(
    n_planes: int = 6,
    n_tables: int = 16,
    seed: int = 42,
    k: int = 5,
    qmax: int = 10,
    dim: int = 64,
) -> str:
    """Full differential oracle for the multi-probe sign-LSH ANN path
    (r9): the pinned hyperplanes (``similarity._plane_components`` —
    deterministic from (seed, plane, dim), 64-dim test corpus) are
    embedded as DOUBLE[] literals, so DuckDB recomputes corpus AND
    query bucket assignment, the flip-1 multi-probe fan-out, the
    candidate join, and the exact cosine top-k from scratch.  Sign
    decisions have ≥ 6.4e-05 margin vs ≤ 2.2e-15 fold-vs-matmul float
    discrepancy on this data (measured r9), so bucket parity is
    robust, not lucky."""
    from community_detection_flink_spark.operators.similarity import (
        _plane_components,
        _probe_masks,
    )

    rows = []
    for t in range(n_tables):
        for j in range(n_planes):
            comp = _plane_components(t * n_planes + j, dim, seed)
            lit = "[" + ", ".join(repr(c) for c in comp) + "]"
            rows.append(f"({t}, {1 << (n_planes - 1 - j)}, {lit}::DOUBLE[])")
    planes_values = ",\n".join(rows)
    masks = ", ".join(f"({m})" for m in _probe_masks(n_planes, 1))
    dot_ep = _DOT.format(a="e.embedding", b="p.pl")
    cos = (
        _DOT.format(a="qv", b="cv")
        + " / (sqrt(" + _DOT.format(a="qv", b="qv")
        + ") * sqrt(" + _DOT.format(a="cv", b="cv") + "))"
    )
    return f"""
WITH planes(tbl, w, pl) AS (VALUES
{planes_values}),
cb AS (
  SELECT e.vec_id, p.tbl,
    CAST(SUM(CASE WHEN {dot_ep} > 0 THEN p.w ELSE 0 END) AS BIGINT) AS bucket
  FROM embeddings e, planes p
  GROUP BY e.vec_id, p.tbl
),
qprobes AS (
  SELECT vec_id AS query_id, tbl, xor(bucket, CAST(m.m AS BIGINT)) AS bucket
  FROM cb, (VALUES {masks}) m(m) WHERE vec_id < {qmax}
),
cand AS (
  SELECT DISTINCT p.query_id, c.vec_id
  FROM cb c JOIN qprobes p USING (tbl, bucket)
  WHERE c.vec_id <> p.query_id
),
q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {qmax}),
scored AS (
  SELECT query_id, cand.vec_id, {cos} AS cosine
  FROM cand
  JOIN (SELECT vec_id, embedding AS cv FROM embeddings) c ON c.vec_id = cand.vec_id
  JOIN q USING (query_id)
)
SELECT query_id, vec_id, cosine, CAST(rn AS BIGINT) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn
  FROM scored) WHERE rn <= {k}"""


def _ivf_ann_sql(k: int = 5, qmax: int = 10, n_probe: int = 8) -> str:
    """emb_ivf_ann differential oracle: IVF routing CTEs + exact
    cosine re-rank within the probed cells."""
    cos = (
        _DOT.format(a="qv", b="cv")
        + " / (sqrt(" + _DOT.format(a="qv", b="qv")
        + ") * sqrt(" + _DOT.format(a="cv", b="cv") + "))"
    )
    return f"""
WITH {_ivf_route_sql(qmax, n_probe)},
q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {qmax}),
scored AS (
  SELECT query_id, cand.vec_id, {cos} AS cosine
  FROM cand
  JOIN (SELECT vec_id, embedding AS cv FROM embeddings) c ON c.vec_id = cand.vec_id
  JOIN q USING (query_id)
)
SELECT query_id, vec_id, cosine, CAST(rn AS BIGINT) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn
  FROM scored) WHERE rn <= {k}"""


def _ivfpq_ann_sql(k: int = 5, qmax: int = 5, n_probe: int = 8) -> str:
    """emb_ivfpq_ann differential oracle: IVF routing + the proven
    _PQ_SQL code assignment + broadcast-ADC-table scoring (Σ_j of the
    per-subspace squared distance, folded in ascending j order exactly
    like the Spark array_sort+aggregate)."""
    return f"""{_PQ_SQL},
{_ivf_route_sql(qmax, n_probe)},
codes AS (SELECT vec_id, j, code FROM best WHERE rn = 1),
dtab AS (SELECT vec_id AS query_id, j, cid AS code, d2 AS dj
         FROM scored WHERE vec_id < {qmax}),
adc AS (
  SELECT cd.query_id, cd.vec_id,
    list_reduce(list_prepend(0.0, list(dt.dj ORDER BY dt.j)), (x, y) -> x + y)
      AS adc_dist
  FROM cand cd
  JOIN codes co ON co.vec_id = cd.vec_id
  JOIN dtab dt ON dt.query_id = cd.query_id AND dt.j = co.j AND dt.code = co.code
  GROUP BY cd.query_id, cd.vec_id
)
SELECT query_id, vec_id, adc_dist FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc_dist, vec_id) AS rn
  FROM adc) WHERE rn <= {k}"""


def _sssp_sql(rounds: int = 5) -> str:
    """Unrolled Bellman-Ford relaxations over the weighted ``ew`` CTE
    — the exact-oracle twin of ``graph_metrics.sssp_weighted``."""
    parts = [
        "s0 AS (SELECT MIN(src) AS s FROM ew)",
        "d0 AS (SELECT s AS vId, CAST(0 AS BIGINT) AS d FROM s0)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""d{r} AS MATERIALIZED (
  SELECT vId, MIN(d) AS d FROM (
    SELECT vId, d FROM d{r - 1}
    UNION ALL
    SELECT e.dst, x.d + e.w FROM d{r - 1} x JOIN ew e ON e.src = x.vId
  ) GROUP BY vId
)"""
        )
    return ",\n".join(parts)


def _walks_sql(walks_per_vertex: int = 2, length: int = 4) -> str:
    """Unrolled md5-indexed random-walk steps — the exact-oracle twin
    of ``graph_metrics.random_walks`` (same hash arithmetic:
    ``_H60(concat(start:walk:step:cur)) % deg``)."""
    parts = [
        "rw_deg AS (SELECT src AS vId, CAST(COUNT(*) AS BIGINT) AS dg FROM edges GROUP BY src)",
        "rw_adj AS (SELECT src AS vId, dst AS nb, CAST(ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1 AS BIGINT) AS pos FROM edges)",
        f"""w0 AS (
  SELECT d.vId AS start, CAST(r.wk AS BIGINT) AS walk_id,
         CAST(0 AS BIGINT) AS step, d.vId AS vId
  FROM rw_deg d, UNNEST(range({walks_per_vertex})) r(wk)
)""",
    ]
    for s in range(1, length + 1):
        h = _H60.format(
            x=f"concat(w.start, ':', w.walk_id, ':', {s}, ':', w.vId)"
        )
        parts.append(
            f"""w{s} AS MATERIALIZED (
  SELECT w.start, w.walk_id, CAST({s} AS BIGINT) AS step, a.nb AS vId
  FROM w{s - 1} w
  JOIN rw_deg d ON d.vId = w.vId
  JOIN rw_adj a ON a.vId = w.vId AND a.pos = ({h}) % d.dg
)"""
        )
    return ",\n".join(parts)


def _ktruss_sql(k: int = 4, rounds: int = 5) -> str:
    """Over-unrolled k-truss peel rounds (idempotent at the fixed
    point — the k-core oracle trick): each round recomputes per-edge
    triangle support over the surviving set and keeps support ≥ k−2."""
    parts = ["kt0 AS MATERIALIZED (SELECT src, dst FROM edges WHERE src < dst)"]
    for r in range(1, rounds + 1):
        parts.append(
            f"""ks{r} AS MATERIALIZED (
  SELECT src, dst FROM kt{r - 1}
  UNION ALL SELECT dst, src FROM kt{r - 1}
),
kt{r} AS MATERIALIZED (
  SELECT p.src, p.dst
  FROM kt{r - 1} p
  JOIN (
    SELECT a.src AS u, b.src AS v, CAST(COUNT(*) AS BIGINT) AS c
    FROM ks{r} a JOIN ks{r} b ON a.dst = b.dst
    WHERE a.src < b.src GROUP BY 1, 2
  ) w ON w.u = p.src AND w.v = p.dst AND w.c >= {k - 2}
)"""
        )
    return ",\n".join(parts)


def _lpa_sql(rounds: int = 4) -> str:
    """Unrolled synchronous label-propagation rounds (deterministic
    tie-break: count DESC, label ASC) — the exact-oracle twin of
    ``graph_metrics.label_propagation`` (same trick as the unrolled
    PageRank / k-core oracles).  AS MATERIALIZED so DuckDB evaluates
    each round once."""
    parts = [
        "lab0 AS MATERIALIZED (SELECT DISTINCT src AS vId, src AS label FROM edges)"
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""lab{r} AS MATERIALIZED (
  SELECT src AS vId, label FROM (
    SELECT e.src, l.label, COUNT(*) AS c,
      ROW_NUMBER() OVER (PARTITION BY e.src ORDER BY COUNT(*) DESC, l.label ASC) AS rn
    FROM edges e JOIN lab{r - 1} l ON l.vId = e.dst
    GROUP BY e.src, l.label
  ) WHERE rn = 1
)"""
        )
    return ",\n".join(parts)


# query-term bag shared by the doc_bm25 Spark query and its oracle
_BM25_TERMS = ["hash", "merge", "spark", "window"]


def _pagerank_sql(iters: int = 5) -> str:
    """Unrolled power-iteration CTE chain mirroring
    ``graph_metrics.pagerank`` (fixed rounds make PageRank a pure
    function of the input, hence SQL-expressible)."""
    cte = [
        "deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS d FROM edges GROUP BY src)",
        "nv AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg)",
        "p0 AS (SELECT src AS vId, 1.0 / n AS pr FROM deg, nv)",
    ]
    for i in range(1, iters + 1):
        cte.append(
            f"p{i} AS (SELECT e.dst AS vId, (1.0 - 0.85) / n + 0.85 * SUM(p.pr / d.d) AS pr\n"
            f"  FROM edges e JOIN p{i-1} p ON p.vId = e.src JOIN deg d ON d.src = e.src, nv\n"
            f"  GROUP BY e.dst, n)"
        )
    return (
        ",\n".join(cte)
        + f"\nSELECT vId, ROUND(pr, 9) AS pr FROM p{iters}"
    )


def _kcore_sql(k: int = 80, rounds: int = 12) -> str:
    """Unrolled peel mirroring ``graph_metrics.k_core``: the peel is
    idempotent at its fixed point, so unrolling MORE rounds than the
    data needs (12 vs 6 observed at sf0.01) yields the identical
    core."""
    # AS MATERIALIZED: each round references the previous twice (the
    # degree filter and the induced-edge join), so DuckDB's default
    # CTE inlining would expand the chain 2^rounds times
    parts = ["s0 AS MATERIALIZED (SELECT src, dst FROM edges)"]
    for i in range(1, rounds + 1):
        parts.append(
            f"k{i} AS MATERIALIZED (SELECT src FROM s{i-1} GROUP BY src HAVING COUNT(*) >= {k})"
        )
        parts.append(
            f"s{i} AS MATERIALIZED (SELECT s.src, s.dst FROM s{i-1} s "
            f"JOIN k{i} a ON s.src = a.src JOIN k{i} b ON s.dst = b.src)"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT src AS vId, CAST(COUNT(*) AS BIGINT) AS deg FROM s{rounds} GROUP BY src"
    )


def _cc_minlabel_sql(rounds: int = 30) -> str:
    """Exact oracle for ``g_connected_components`` (VERDICT r3 #4):
    min-label propagation over the co-purchase edge set, unrolled a
    FIXED ``rounds`` ≥ diameter.  The update is idempotent at its fixed
    point (labels stop changing), so over-unrolling yields the identical
    assignment — the same trick as ``_kcore_sql``; each round is one
    |E|-sized join (≈231k rows at sf0.01), vastly cheaper than the
    quadratic reach-closure the dense graph forbids.  ``AS
    MATERIALIZED`` stops DuckDB's default CTE inlining from expanding
    the chain exponentially (each round references the previous twice).
    The engine's star-contraction converges in O(log² n) rounds
    regardless of diameter — the oracle may take O(diameter) rounds,
    which is fine at gate scale (measured diameter ≤ 12 at sf0.01;
    30 rounds is the safety margin)."""
    parts = [
        "li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem)",
        "edges AS MATERIALIZED (SELECT DISTINCT a.pk AS src, b.pk AS dst"
        " FROM li a JOIN li b USING (ok) WHERE a.pk <> b.pk)",
        "l0 AS MATERIALIZED (SELECT src AS vId, MIN(LEAST(src, dst)) AS lab"
        " FROM edges GROUP BY src)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"l{i} AS MATERIALIZED (SELECT e.src AS vId, MIN(LEAST(a.lab, b.lab)) AS lab"
            f" FROM edges e JOIN l{i-1} a ON a.vId = e.src JOIN l{i-1} b ON b.vId = e.dst"
            f" GROUP BY e.src)"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT CAST(vId AS BIGINT) AS vId, CAST(lab AS BIGINT) AS component FROM l{rounds}"
    )


def _cells_sql() -> str:
    """Shared Voronoi-cell CTE prefix for the r9b similarity
    operators: replays ``similarity.assign_cells`` — md5-sampled
    centroids (GREATEST(4, floor(sqrt(n))) of them, seed 42) and the
    exact squared-euclidean argmin with (d2, cid) tie-break — ending
    in ``assign(vec_id, cell, embedding)``.  Unlike `_ivf_route_sql`
    (whose Spark twin assigns through a numpy matmul), BOTH sides
    here are the identical left-fold, so assignment parity is
    bit-exact by construction, not by measured margin."""
    d2 = (
        "list_reduce(list_prepend(0.0, list_transform(range(len(e.embedding)), "
        "i -> (CAST(e.embedding[i+1] AS DOUBLE) - CAST(c.cvec[i+1] AS DOUBLE)) "
        "* (CAST(e.embedding[i+1] AS DOUBLE) - CAST(c.cvec[i+1] AS DOUBLE)))), "
        "(x, y) -> x + y)"
    )
    return f"""cs AS (
  SELECT vec_id AS cid, embedding AS cvec
  FROM embeddings
  QUALIFY ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR) || ',42'))
    <= GREATEST(4, CAST(FLOOR(SQRT(CAST((SELECT COUNT(*) FROM embeddings) AS DOUBLE))) AS BIGINT))
),
assign AS (
  SELECT vec_id, cell, embedding FROM (
    SELECT e.vec_id, c.cid AS cell, e.embedding,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY {d2}, c.cid) AS rn
    FROM embeddings e, cs c) WHERE rn = 1
)"""


_PAIR_COS = (
    _DOT.format(a="a.embedding", b="b.embedding")
    + " / (sqrt(" + _DOT.format(a="a.embedding", b="a.embedding")
    + ") * sqrt(" + _DOT.format(a="b.embedding", b="b.embedding") + "))"
)


def _semantic_dedup_sql(tau: float = 0.3) -> str:
    """emb_semantic_dedup differential oracle: cell assignment +
    within-cell >= tau pair scan + keep-lowest-id verdict."""
    return f"""
WITH {_cells_sql()},
dup AS (
  SELECT DISTINCT b.vec_id
  FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE {_PAIR_COS} >= {tau!r}
)
SELECT a.vec_id, a.cell, (d.vec_id IS NOT NULL) AS is_dup
FROM assign a LEFT JOIN dup d ON d.vec_id = a.vec_id"""


def _knn_graph_sql(k: int = 3) -> str:
    """emb_knn_graph differential oracle: cell assignment + exact
    within-cell cosine top-k with (cosine desc, nb_id) tie-break."""
    return f"""
WITH {_cells_sql()},
scored AS (
  SELECT a.vec_id, b.vec_id AS nb_id, {_PAIR_COS} AS cosine
  FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id <> b.vec_id
)
SELECT vec_id, nb_id, cosine, CAST(rn AS BIGINT) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cosine DESC, nb_id) AS rn
  FROM scored) WHERE rn <= {k}"""


def _dup_clusters_sql(k: int = 3, tau: float = 0.25, rounds: int = 30) -> str:
    """emb_dup_clusters exact oracle: the kNN CTEs (cells + within-cell
    top-k + cosine threshold), symmetric closure, then ``rounds``
    unrolled min-label propagations (idempotent past the fixed point —
    the ``_cc_minlabel_sql`` trick; knn-cluster diameters at gate
    scale are far below 30, and a too-low round count would show up as
    a hash mismatch, not a silent wrong answer)."""
    parts = [
        f"""knn AS MATERIALIZED (
  SELECT vec_id, nb_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY cosine DESC, nb_id) AS rn
    FROM scored) WHERE rn <= {k} AND cosine >= {tau!r}
)""",
        """e AS MATERIALIZED (
  SELECT vec_id AS src, nb_id AS dst FROM knn
  UNION SELECT nb_id, vec_id FROM knn
)""",
        "l0 AS MATERIALIZED (SELECT src AS vId, MIN(LEAST(src, dst)) AS lab"
        " FROM e GROUP BY src)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"l{i} AS MATERIALIZED (SELECT e.src AS vId,"
            f" MIN(LEAST(a.lab, b.lab)) AS lab"
            f" FROM e JOIN l{i-1} a ON a.vId = e.src"
            f" JOIN l{i-1} b ON b.vId = e.dst GROUP BY e.src)"
        )
    return f"""
WITH {_cells_sql()},
scored AS (
  SELECT a.vec_id, b.vec_id AS nb_id, {_PAIR_COS} AS cosine
  FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id <> b.vec_id
),
{",".join(parts)},
comp AS (
  SELECT em.vec_id, COALESCE(l.lab, em.vec_id) AS cluster_id
  FROM embeddings em LEFT JOIN l{rounds} l ON l.vId = em.vec_id
)
SELECT vec_id, CAST(cluster_id AS BIGINT) AS cluster_id,
  CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
FROM comp"""


def _kmeans_sql(k: int = 8, iters: int = 2) -> str:
    """emb_kmeans_refine differential oracle: the Lloyd iterations
    unrolled as CTEs — quantize once, assign (d2 argmin, (d2, cid)
    tie-break), recenter as exact int64 sums / count, reassign.
    Bit-exact against ``similarity.kmeans_lloyd`` because every
    float op is the identical fold / single division on both sides."""
    d2 = (
        "list_reduce(list_prepend(0.0, list_transform(range(len(e.dv)), "
        "i -> (e.dv[i+1] - c.cvec[i+1]) * (e.dv[i+1] - c.cvec[i+1]))), "
        "(x, y) -> x + y)"
    )
    parts = [
        (
            "q0 AS (SELECT vec_id, list_transform(embedding, "
            "x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS qv "
            "FROM embeddings)"
        ),
        (
            "qd AS (SELECT vec_id, qv, "
            "list_transform(qv, x -> CAST(x AS DOUBLE)) AS dv FROM q0)"
        ),
        (
            "c0 AS (SELECT vec_id AS cid, dv AS cvec FROM qd "
            "QUALIFY ROW_NUMBER() OVER (ORDER BY "
            f"md5(CAST(vec_id AS VARCHAR) || ',42')) <= {k})"
        ),
    ]
    for it in range(1, iters + 1):
        parts.append(
            f"""a{it} AS (SELECT vec_id, qv, dv, cell FROM (
  SELECT e.vec_id, e.qv, e.dv, c.cid AS cell,
    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY {d2}, c.cid) AS rn
  FROM qd e, c{it - 1} c) WHERE rn = 1)"""
        )
        if it < iters:
            parts.append(
                f"""c{it} AS (SELECT cell AS cid, list(v ORDER BY dim) AS cvec FROM (
  SELECT a.cell, CAST(r.i AS BIGINT) AS dim,
    CAST(SUM(a.qv[CAST(r.i AS INTEGER) + 1]) AS DOUBLE)
      / CAST(COUNT(*) AS DOUBLE) AS v
  FROM a{it} a, UNNEST(range(len(a.qv))) r(i)
  GROUP BY a.cell, r.i) GROUP BY cell)"""
            )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT vec_id, CAST(cell AS BIGINT) AS cluster FROM a{iters}"
    )


def oracle_sql() -> dict[str, str]:
    cosine = (
        _DOT.format(a="qv", b="cv")
        + " / (sqrt("
        + _DOT.format(a="qv", b="qv")
        + ") * sqrt("
        + _DOT.format(a="cv", b="cv")
        + "))"
    )
    return {
        "g_edges": _G + "SELECT src, dst FROM edges",
        # expected invariant values derived from the RAW input tables —
        # the Spark side computes the same quantities from the engine's
        # WCC result, so any labeling defect hash-mismatches
        "wcc_invariants": _G + """,
nv AS (SELECT CAST(COUNT(DISTINCT src) AS BIGINT) AS n FROM edges)
SELECT 'labeled_rows' AS invariant, n AS value FROM nv
UNION ALL SELECT 'labeled_distinct_vertices', n FROM nv
UNION ALL SELECT 'sum_community_sizes', n FROM nv
UNION ALL SELECT 'orphan_cids', CAST(0 AS BIGINT)
UNION ALL SELECT 'stats_size_mismatch', CAST(0 AS BIGINT)
UNION ALL SELECT 'non_monotone_accepted_rounds', CAST(0 AS BIGINT)""",
        # Structural rows derive from RAW lineitem via the same edge
        # CTE: vertices never disappear under deletes, so the labeled
        # set is the FULL endpoint set; edge_rows applies the delete
        # predicate (either endpoint ≥ thr and even — the engine
        # symmetrizes) to the doubled edge list.  Python's
        # int(max*0.8) truncation == FLOOR for positive ids.
        "cdc_invariants": _G + """,
mx AS (SELECT CAST(FLOOR(MAX(GREATEST(src, dst)) * 0.8) AS BIGINT) AS thr FROM edges),
remaining AS (
  SELECT src, dst FROM edges, mx
  WHERE NOT (src >= thr AND src % 2 = 0) AND NOT (dst >= thr AND dst % 2 = 0)
),
nv AS (SELECT CAST(COUNT(DISTINCT src) AS BIGINT) AS n FROM edges),
ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM remaining)
SELECT 'labeled_rows' AS invariant, n AS value FROM nv
UNION ALL SELECT 'labeled_distinct_vertices', n FROM nv
UNION ALL SELECT 'sum_community_sizes', n FROM nv
UNION ALL SELECT 'orphan_cids', CAST(0 AS BIGINT)
UNION ALL SELECT 'stats_size_mismatch', CAST(0 AS BIGINT)
UNION ALL SELECT 'deleted_edges_present', CAST(0 AS BIGINT)
UNION ALL SELECT 'edge_rows', c FROM ne
UNION ALL SELECT 'vertex_stats_mismatch_vs_direct', CAST(0 AS BIGINT)
UNION ALL SELECT 'clean_edge_diff_vs_direct', CAST(0 AS BIGINT)
UNION ALL SELECT 'tri_diff_vs_direct', CAST(0 AS BIGINT)
UNION ALL SELECT 'u_reassert_edges',
  (SELECT CAST(COUNT(*) AS BIGINT) FROM remaining
   WHERE src % 97 = 1 AND src < dst)""",
        # Delete-only variant: the predicate (src+dst)%7=3 is symmetric
        # under endpoint swap, so the doubled deleted-edge count and
        # the remaining doubled-edge count derive directly from the
        # edge CTE; every engine-vs-direct parity row pins to 0.
        "wcc_delete_invariants": _G + """,
nv AS (SELECT CAST(COUNT(DISTINCT src) AS BIGINT) AS n FROM edges),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM edges WHERE (src + dst) % 7 = 3),
ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM edges WHERE (src + dst) % 7 <> 3)
SELECT 'labeled_rows' AS invariant, n AS value FROM nv
UNION ALL SELECT 'labeled_distinct_vertices', n FROM nv
UNION ALL SELECT 'sum_community_sizes', n FROM nv
UNION ALL SELECT 'orphan_cids', CAST(0 AS BIGINT)
UNION ALL SELECT 'stats_size_mismatch', CAST(0 AS BIGINT)
UNION ALL SELECT 'deleted_edge_rows', c FROM nd
UNION ALL SELECT 'deleted_edges_present', CAST(0 AS BIGINT)
UNION ALL SELECT 'edge_rows', c FROM ne
UNION ALL SELECT 't_zero_label_violations', CAST(0 AS BIGINT)
UNION ALL SELECT 'vertex_stats_mismatch_vs_direct', CAST(0 AS BIGINT)
UNION ALL SELECT 'clean_edge_diff_vs_direct', CAST(0 AS BIGINT)
UNION ALL SELECT 'tri_diff_vs_direct', CAST(0 AS BIGINT)""",
        "g_degrees": _G + "SELECT src AS vId, CAST(COUNT(*) AS BIGINT) AS degree FROM edges GROUP BY src",
        "g_triangle_counts": _G + """
SELECT v.vId, COALESCE(t.t, 0) AS t
FROM (SELECT DISTINCT src AS vId FROM edges) v LEFT JOIN tcnt t USING (vId)""",
        "g_vertex_metrics": _G + "SELECT vId, t, vt, cc FROM vm",
        "g_adjacency": _G + """,
adj AS (SELECT src AS vId, list_sort(list(dst)) AS adj FROM edges GROUP BY src)
SELECT vId, CAST(t.i AS BIGINT) AS pos, adj[t.i + 1] AS neighbor
FROM adj, UNNEST(range(len(adj))) AS t(i)""",
        "rel_distinct_counts": """
SELECT l_returnflag,
  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
  CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem GROUP BY l_returnflag""",
        "g_community_stats": _G + """,
sizes AS (SELECT cId, CAST(COUNT(*) AS BIGINT) AS r FROM lab GROUP BY cId),
agg AS (
  SELECT c_src AS cId,
         CAST(SUM(CASE WHEN c_src = c_dst THEN 1 ELSE 0 END) / 2.0 AS DOUBLE) AS a,
         CAST(SUM(CASE WHEN c_src <> c_dst THEN 1 ELSE 0 END) AS BIGINT) AS b
  FROM ewc GROUP BY c_src
)
SELECT s.cId, s.r, COALESCE(a.a, 0.0) AS a, COALESCE(a.b, 0) AS b,
       2.0 * COALESCE(a.a, 0.0) / (CAST(s.r AS DOUBLE) * CAST(s.r AS DOUBLE)) AS d
FROM sizes s LEFT JOIN agg a USING (cId)""",
        "g_vertex_community_degrees": _G + """
SELECT e.src AS vId, ld.cId AS cId, CAST(COUNT(*) AS BIGINT) AS dIn
FROM tedges e JOIN lab ld ON ld.vId = e.dst GROUP BY 1, 2""",
        "g_intra_degree": _G + """
SELECT src AS vId, CAST(COUNT(*) AS BIGINT) AS vtC FROM ewc WHERE c_src = c_dst GROUP BY src""",
        # Same-community triangles WITHOUT touching the shared tri/lab
        # CTEs: the label is vId % 10 (lab's definition), so the
        # community filter pushes INTO the enumeration — restrict to
        # oriented intra-community edges first (~|edges|/20), and the
        # wedge join shrinks ~100×.  Equivalent to filtering tri by
        # labels: a triangle whose three vertices share vId % 10 has
        # all three edges intra, and every triangle edge is in tedges,
        # so the intra-subgraph enumeration finds exactly the same set.
        # The previous tri⋈lab³ form made DuckDB materialize tri plus
        # the 6-way tedges union and spill >80 GB at sf0.1.
        "g_community_triangles": _G + """,
ie AS (SELECT src, dst FROM edges WHERE src < dst AND src % 10 = dst % 10),
tri3 AS (
  SELECT e1.src AS u, e1.dst AS v, e2.dst AS w
  FROM ie e1
  JOIN ie e2 ON e2.src = e1.dst
  JOIN ie e3 ON e3.src = e1.src AND e3.dst = e2.dst
)
SELECT x AS vId, CAST(COUNT(*) AS BIGINT) AS tC FROM (
  SELECT u AS x FROM tri3 UNION ALL SELECT v FROM tri3 UNION ALL SELECT w FROM tri3
) GROUP BY x""",
        # wcc_communities / wcc_stats: iterative fixed point — rows-only check
        "rel_pricing_summary": """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
  CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' GROUP BY l_returnflag, l_linestatus""",
        "rel_top_orders": """
SELECT o_orderkey,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderkey ORDER BY revenue DESC, o_orderkey LIMIT 10""",
        "rel_nation_revenue": """
SELECT n_name,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey
GROUP BY n_name""",
        "rel_window_top_customers": """
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey,
       c_acctbal, CAST(rn AS BIGINT) AS rn
FROM (
  SELECT c_custkey, c_nationkey, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
) WHERE rn <= 3""",
        "rel_rollup_orders": """
SELECT COALESCE(o_orderpriority, 'ALL') AS priority, COALESCE(o_orderstatus, 'ALL') AS status,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
  CAST(COUNT(*) AS BIGINT) AS n
FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)""",
        "rel_cube_orders": """
SELECT COALESCE(o_orderpriority, 'ALL') AS priority, COALESCE(o_orderstatus, 'ALL') AS status,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
  CAST(COUNT(*) AS BIGINT) AS n
FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)""",
        "rel_customers_without_orders": """
SELECT CAST(c_custkey AS BIGINT) AS c_custkey FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND year(o.o_orderdate) = 1995)""",
        "rel_parts_in_lineitem": """
SELECT CAST(p_partkey AS BIGINT) AS p_partkey FROM part p
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)""",
        "rel_parts_never_ordered": """
SELECT CAST(p_partkey AS BIGINT) AS p_partkey FROM part
EXCEPT
SELECT CAST(l_partkey AS BIGINT) FROM lineitem WHERE l_quantity > 45""",
        "rel_parts_intersect": """
SELECT CAST(p_partkey AS BIGINT) AS k FROM part
INTERSECT
SELECT CAST(l_partkey AS BIGINT) FROM lineitem""",
        "ev_user_running": """
SELECT CAST(event_id AS BIGINT) AS event_id, CAST(user_id AS BIGINT) AS user_id,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
  CAST(floor(epoch(ts)) AS BIGINT)
    - CAST(floor(epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT)
    AS gap_s
FROM events""",
        "ev_tumbling": """
SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS window_start, event_type,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2""",
        "ev_sliding": """
WITH e AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events),
cand AS (
  SELECT event_type, (es // 1800) * 1800 AS ws FROM e
  UNION ALL
  SELECT event_type, (es // 1800) * 1800 - 1800 AS ws FROM e
)
SELECT ws AS window_start, event_type, CAST(COUNT(*) AS BIGINT) AS n FROM cand GROUP BY 1, 2""",
        "ev_session": """
WITH s AS (
  SELECT user_id, ts, value,
    CASE WHEN LAG(ts) OVER w IS NULL OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
g AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS grp FROM s)
SELECT user_id, CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM g GROUP BY user_id, grp""",
        "ev_json_props": """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k FROM events""",
        "ev_asof_prior_purchase": """
SELECT l.event_id, l.user_id,
  epoch_us(l.ts) AS ts_us,
  epoch_us(r.ts) AS purchase_ts_us,
  r.value AS purchase_value
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
ASOF JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') r
  ON l.user_id = r.user_id AND l.ts >= r.ts""",
        "ev_range_recent_purchases": """
SELECT l.event_id,
  CAST((SELECT COUNT(*) FROM events r
        WHERE r.event_type = 'purchase'
          AND r.ts <= l.ts
          AND epoch_us(r.ts) > epoch_us(l.ts) - 3600000000) AS BIGINT) AS n_purchases_1h
FROM (SELECT event_id, ts FROM events WHERE event_type = 'click') l""",
        "ev_funnel": """
WITH s1 AS (
  SELECT user_id AS "user", MIN(ts) AS t_1
  FROM events WHERE event_type = 'view' GROUP BY 1
),
d AS (SELECT "user", t_1, t_1 + INTERVAL 604800 SECONDS AS deadline FROM s1),
s2 AS (
  SELECT d."user", d.t_1, d.deadline,
    MIN(CASE WHEN e.ts > d.t_1 AND e.ts <= d.deadline THEN e.ts END) AS t_2
  FROM d LEFT JOIN events e ON e.user_id = d."user" AND e.event_type = 'click'
  GROUP BY 1, 2, 3
),
s3 AS (
  SELECT s2."user", s2.t_1, s2.t_2, s2.deadline,
    MIN(CASE WHEN e.ts > s2.t_2 AND e.ts <= s2.deadline THEN e.ts END) AS t_3
  FROM s2 LEFT JOIN events e ON e.user_id = s2."user" AND e.event_type = 'purchase'
  GROUP BY 1, 2, 3, 4
)
SELECT "user", t_1, t_2, t_3,
  CAST(1 + CAST(t_2 IS NOT NULL AS INT) + CAST(t_3 IS NOT NULL AS INT) AS BIGINT) AS reached,
  t_3 IS NOT NULL AS converted
FROM s3""",
        "doc_exact_dedup": """
SELECT MIN(doc_id) AS representative, CAST(COUNT(*) AS BIGINT) AS n_copies
FROM documents GROUP BY md5(text)""",
        "doc_minhash_signatures": _minhash_sig_sql(8) + """
SELECT doc_id, CAST(t.i AS BIGINT) AS pos, sig.sig[t.i + 1] AS h
FROM sig, UNNEST(range(8)) AS t(i)""",
        "doc_minhash_lsh_pairs": _minhash_sig_sql(8) + """,
banded AS (
  SELECT doc_id, b, md5(array_to_string(sig[b*2+1 : b*2+2], ',')) AS bucket
  FROM sig, UNNEST([0, 1, 2, 3]) AS t(b)
)
SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS n_bands
FROM banded a JOIN banded b2 USING (b, bucket)
WHERE a.doc_id < b2.doc_id GROUP BY 1, 2""",
        # r10: store-built pairs must equal the FULL-corpus recompute —
        # signatures are a pure per-doc function, so build(90%) +
        # append(10%) is exact, and this oracle (identical to
        # doc_minhash_lsh_pairs') proves it by hash
        "doc_minhash_store_pairs": _minhash_sig_sql(8) + """,
banded AS (
  SELECT doc_id, b, md5(array_to_string(sig[b*2+1 : b*2+2], ',')) AS bucket
  FROM sig, UNNEST([0, 1, 2, 3]) AS t(b)
)
SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS n_bands
FROM banded a JOIN banded b2 USING (b, bucket)
WHERE a.doc_id < b2.doc_id GROUP BY 1, 2""",
        "mm_mp4_metadata": """
SELECT doc_id, true AS ok, CAST(1000 AS BIGINT) AS timescale,
  CAST((3 + doc_id % 5) * 100 AS BIGINT) AS duration_ticks,
  CAST(1 AS BIGINT) AS n_tracks,
  CAST(3 + doc_id % 5 AS BIGINT) AS n_samples,
  CAST((3 + doc_id % 5) * (16 + doc_id % 32) AS BIGINT) AS sample_bytes_total,
  'raw ' AS codec
FROM documents""",
        "mm_mp4_frame_sample": """
SELECT doc_id, CAST(i AS BIGINT) AS sample_no,
  CAST(i * (16 + doc_id % 32) AS BIGINT) AS byte_offset,
  CAST(16 + doc_id % 32 AS BIGINT) AS sample_bytes,
  CAST((doc_id * 7 + i * 13) % 256 AS BIGINT) AS value,
  CAST(((doc_id * 7 + i * 13) % 256) * (16 + doc_id % 32) AS BIGINT) AS checksum
FROM documents, UNNEST(range(3 + doc_id % 5)) AS t(i)
WHERE i % 2 = 0""",
        # every decoded MJPEG frame is closed-form: constant even-gray
        # 8x8 tiles survive the lossy encode->decode bit-exactly (DC-only
        # blocks, q00=16), Cb=Cr=128 makes RGB=Y for the color docs
        "mm_video_frame_decode": """
WITH d AS (
  SELECT doc_id, 2 + doc_id % 4 AS nf, 2 + doc_id % 3 AS txn,
    1 + (doc_id // 3) % 3 AS tyn,
    CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END AS ncomp
  FROM documents
),
frames AS (
  SELECT doc_id, txn, tyn, ncomp, f.v AS fno
  FROM d, UNNEST(range(nf)) f(v) WHERE f.v % 2 = 0
),
tiles AS (
  SELECT doc_id, fno, txn, tyn, ncomp,
    ((7 * doc_id + 11 * tx.v + 13 * ty.v + 17 * fno) % 128) * 2 AS val
  FROM frames, UNNEST(range(txn)) tx(v), UNNEST(range(tyn)) ty(v)
),
agg AS (
  SELECT doc_id, fno, txn, tyn, ncomp, SUM(val) AS sv
  FROM tiles GROUP BY ALL
)
SELECT doc_id, CAST(fno AS BIGINT) AS sample_no, TRUE AS ok,
  CAST(8 * txn AS BIGINT) AS width, CAST(8 * tyn AS BIGINT) AS height,
  CAST(ncomp AS BIGINT) AS n_components,
  CAST(sv * 64 * ncomp AS DOUBLE) / CAST(8 * txn * 8 * tyn * ncomp AS DOUBLE)
    AS mean_pixel,
  CAST(sv * 64 * ncomp AS BIGINT) AS checksum
FROM agg""",
        # I_PCM is lossless pass-through with neutral chroma: RGB = Y
        # exactly, so checksum = 3 * 256 * sum of per-MB luma values
        "mm_h264_ipcm_roundtrip": """
WITH d AS (
  SELECT doc_id, 2 + doc_id % 3 AS nf, 1 + doc_id % 3 AS mbw,
    1 + (doc_id // 3) % 2 AS mbh
  FROM documents
),
frames AS (
  SELECT doc_id, mbw, mbh, f.v AS fno
  FROM d, UNNEST(range(nf)) f(v)
),
mbs AS (
  SELECT doc_id, fno, mbw, mbh,
    (5 * doc_id + 7 * mb.v + 11 * fno) % 256 AS val
  FROM frames, UNNEST(range(mbw * mbh)) mb(v)
),
agg AS (
  SELECT doc_id, fno, mbw, mbh, SUM(val) AS sv
  FROM mbs GROUP BY ALL
)
SELECT doc_id, CAST(fno AS BIGINT) AS sample_no, TRUE AS ok,
  CAST(16 * mbw AS BIGINT) AS width, CAST(16 * mbh AS BIGINT) AS height,
  CAST(3 AS BIGINT) AS n_components,
  CAST(sv * 256 * 3 AS DOUBLE) / CAST(16 * mbw * 16 * mbh * 3 AS DOUBLE)
    AS mean_pixel,
  CAST(sv * 256 * 3 AS BIGINT) AS checksum
FROM agg""",
        "doc_source_caps": """
SELECT doc_id, source, pick_rank, pick_rank <= 10 AS kept FROM (
  SELECT doc_id, source,
    CAST(ROW_NUMBER() OVER (
      PARTITION BY source
      ORDER BY (CAST(doc_id AS BIGINT) * 2654435761) % 1048576, doc_id
    ) AS BIGINT) AS pick_rank
  FROM documents)""",
        "doc_bpe_pair_counts": r"""
WITH w AS (
  SELECT word, COUNT(*) AS n FROM (
    SELECT unnest(string_split_regex(lower(text), '\s+')) AS word
    FROM documents
  ) WHERE length(word) > 0 GROUP BY word
),
t AS (
  SELECT n, list_append(string_split(word, ''), '</w>') AS toks FROM w
),
p AS (
  SELECT toks[r.i + 1] AS "left", toks[r.i + 2] AS "right", n
  FROM t, UNNEST(range(len(toks) - 1)) r(i)
)
SELECT "left", "right", CAST(SUM(n) AS BIGINT) AS freq
FROM p GROUP BY ALL""",
        # the skew-lever variant is semantically IDENTICAL — same SQL
        "doc_source_caps_skew": """
SELECT doc_id, source, pick_rank, pick_rank <= 10 AS kept FROM (
  SELECT doc_id, source,
    CAST(ROW_NUMBER() OVER (
      PARTITION BY source
      ORDER BY (CAST(doc_id AS BIGINT) * 2654435761) % 1048576, doc_id
    ) AS BIGINT) AS pick_rank
  FROM documents)""",
        "doc_simhash": _simhash_sql(32),
        "doc_simhash_near_dups": f"""
WITH s AS ({_simhash_sql(32)})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""",
        # iterative connected components WITH an exact SQL oracle: the
        # LSH pair graph is tiny, so a recursive-CTE transitive closure
        # is feasible (the Spark side is large-star/small-star, which
        # is what survives 100 TB)
        "doc_dedup_groups": _dedup_comp_sql() + """
SELECT doc_id, group_id,
  CAST(COUNT(*) OVER (PARTITION BY group_id) AS BIGINT) AS group_size
FROM comp""",
        "doc_dedup_keep_best": _dedup_comp_sql() + """
SELECT c.doc_id, c.group_id,
  (ROW_NUMBER() OVER (PARTITION BY c.group_id ORDER BY d.n_chars DESC, c.doc_id ASC) = 1) AS keep
FROM comp c JOIN documents d ON c.doc_id = d.doc_id""",
        "rel_skewed_agg": """
SELECT l_returnflag,
  CAST(COUNT(l_quantity) AS BIGINT) AS n,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(MAX(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS max_qty
FROM lineitem GROUP BY l_returnflag""",
        "rel_profile_orders": _profile_sql("orders", _ORDERS_COLS),
        "rel_percentiles": """
SELECT l_returnflag,
  quantile_cont(l_extendedprice, 0.25) AS p25,
  quantile_cont(l_extendedprice, 0.50) AS p50,
  quantile_cont(l_extendedprice, 0.75) AS p75,
  quantile_cont(l_extendedprice, 0.95) AS p95
FROM lineitem GROUP BY l_returnflag""",
        # dense-graph star-contraction CC: exact min-label oracle,
        # over-unrolled past the measured diameter (see _cc_minlabel_sql)
        "g_connected_components": _cc_minlabel_sql(30),
        # source-format roundtrips: the oracle reads the PARQUET the
        # engine's CSV/JSON copy was landed from — equality proves the
        # sink→source path lossless
        "rel_csv_roundtrip": """
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
  MIN(o_orderkey) AS first_order
FROM orders GROUP BY o_orderstatus""",
        "rel_json_roundtrip": """
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance,
  MIN(c_custkey) AS first_cust
FROM customer GROUP BY c_mktsegment""",
        "rel_grouping_sets": """
SELECT o_orderstatus, o_orderpriority,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""",
        "doc_pii_scrub": r"""
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(text, '[0-9]{6,}')) AS BIGINT) AS n_longnums,
  md5(regexp_replace(regexp_replace(text,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      '[0-9]{6,}', '<NUM>', 'g')) AS scrub_md5
FROM documents""",
        # iterative star-contraction CC with an exact closure oracle:
        # the order-chain graph is a union of short paths, so the
        # transitive closure is Σ chain² — tiny (contrast the dense
        # co-purchase graph, whose closure is quadratic in |V|)
        "g_components_paths": """
WITH RECURSIVE
seq AS (
  SELECT o_orderkey AS ok,
    LAG(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
  FROM orders
),
e0 AS (SELECT prev AS u, ok AS v FROM seq WHERE prev IS NOT NULL),
edges AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
verts AS (SELECT o_orderkey AS vId FROM orders),
reach(a, b) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.a, e.v FROM reach r JOIN edges e ON r.b = e.u
)
SELECT v.vId, least(v.vId, COALESCE(MIN(r.b), v.vId)) AS component
FROM verts v LEFT JOIN reach r ON r.a = v.vId
GROUP BY v.vId""",
        "doc_jaccard_pairs": f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
sh AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
    ELSE list_transform(range(len(tk) - 2), i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3])
    END)) AS s
  FROM toks
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
  FROM sh a JOIN sh b USING (s) WHERE a.doc_id < b.doc_id GROUP BY 1, 2
)
SELECT doc_a, doc_b,
  CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE) >= 0.5""",
        "doc_token_stats": f"""
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpeish,
  CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) AS punct_ratio,
  CAST(length(text) - length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) AS space_ratio
FROM documents""",
        "doc_quality": f"""
WITH t AS (SELECT doc_id, text, {_TOKS} AS tk FROM documents)
SELECT doc_id,
  0.4 * (CASE WHEN length(text) BETWEEN 100 AND 10000 THEN 1.0 ELSE 0.0 END)
  + 0.3 * greatest(0.0, 1.0 - (CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE)) * 5.0)
  + 0.3 * least(CAST(len(list_intersect(tk, ['the','and','of','to','is','in','that','with'])) AS DOUBLE) / 4.0, 1.0)
  AS quality
FROM t""",
        "doc_lang_id": f"""
WITH t AS (SELECT doc_id, list_distinct({_TOKS}) AS tk FROM documents),
h AS (
  SELECT doc_id,
    len(list_intersect(tk, ['the','and','of','to','is','in','that','with'])) AS h_en,
    len(list_intersect(tk, ['der','die','das','und','ist','nicht','mit','ein'])) AS h_de,
    len(list_intersect(tk, ['le','la','les','et','est','dans','que','pour'])) AS h_fr,
    len(list_intersect(tk, ['el','la','los','y','es','en','que','por'])) AS h_es
  FROM t
)
SELECT doc_id,
  CASE WHEN h_fr >= h_es AND h_fr >= h_en AND h_fr >= h_de AND h_fr > 0 THEN 'fr'
       WHEN h_es >= h_en AND h_es >= h_de AND h_es > 0 THEN 'es'
       WHEN h_en >= h_de AND h_en > 0 THEN 'en'
       WHEN h_de > 0 THEN 'de'
       ELSE 'und' END AS lang_pred
FROM h""",
        "doc_fingerprint": f"""
SELECT doc_id,
  list_reduce(
    list_prepend(CAST(0 AS BIGINT),
      list_transform({_TOKS}, t -> {_H60.format(x='t')} % 1000000007)),
    (acc, h) -> (acc * 131 + h) % 1000000007
  ) AS fingerprint
FROM documents""",
        "doc_top_ngrams": f"""
WITH t AS (SELECT {_TOKS} AS tk FROM documents),
g AS (
  SELECT unnest(CASE WHEN len(tk) < 2 THEN CAST([] AS VARCHAR[])
                ELSE list_transform(range(len(tk) - 1), i -> tk[i+1] || ' ' || tk[i+2])
                END) AS ngram
  FROM t
)
SELECT ngram, CAST(COUNT(*) AS BIGINT) AS cnt
FROM g GROUP BY ngram
ORDER BY cnt DESC, ngram ASC LIMIT 100""",
        "doc_sample_split": f"""
SELECT doc_id,
  CAST(h % 100 AS BIGINT) AS bucket,
  CASE WHEN h % 100 < 80 THEN 'train'
       WHEN h % 100 < 90 THEN 'val'
       ELSE 'test' END AS split
FROM (SELECT doc_id,
        {_H60.format(x="'split-v1' || CAST(doc_id AS VARCHAR)")} AS h
      FROM documents)""",
        "doc_contamination": f"""
WITH toks AS (SELECT doc_id, source, {_TOKS} AS tk FROM documents),
g AS (
  SELECT doc_id, source, unnest(list_distinct(
    CASE WHEN len(tk) < 5 THEN []
    ELSE list_transform(range(len(tk) - 4),
      i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] || ' ' || tk[i+4] || ' ' || tk[i+5])
    END)) AS gram
  FROM toks
),
bg AS (SELECT DISTINCT gram FROM g WHERE source = 'src0'),
hits AS (
  SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM g JOIN bg USING (gram) WHERE g.source <> 'src0' GROUP BY g.doc_id
)
SELECT d.doc_id,
  COALESCE(h.n_shared, 0) > 0 AS contaminated,
  CAST(COALESCE(h.n_shared, 0) AS BIGINT) AS n_shared
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
WHERE d.source <> 'src0'""",
        "doc_pack_chunks": f"""
WITH t AS (
  SELECT doc_id, source AS shard, len({_TOKS}) AS n_tok FROM documents
),
c AS (
  SELECT doc_id, shard, n_tok,
    SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
  FROM t WHERE n_tok > 0
),
s AS (SELECT doc_id, shard, cum - n_tok AS off, cum FROM c)
SELECT doc_id, shard, CAST(ch AS BIGINT) AS chunk_id,
  CAST(greatest(off, ch * 512) AS BIGINT) AS tok_start,
  CAST(least(cum, (ch + 1) * 512) AS BIGINT) AS tok_end
FROM s, UNNEST(range(CAST(off // 512 AS BIGINT), CAST((cum - 1) // 512 + 1 AS BIGINT))) AS u(ch)""",
        "doc_cross_dedup": _minhash_sig_sql(8) + """,
banded AS (
  SELECT s.doc_id, d.source, b, md5(array_to_string(sig[b*2+1 : b*2+2], ',')) AS bucket
  FROM sig s JOIN documents d USING (doc_id), UNNEST([0, 1, 2, 3]) AS t(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_id, r.doc_id AS ref_id
  FROM banded a JOIN banded r USING (b, bucket)
  WHERE a.source <> 'src0' AND r.source = 'src0'
),
arrs AS (SELECT doc_id, list_distinct(s) AS arr FROM sh)
SELECT doc_id, ref_id, jaccard FROM (
  SELECT c.doc_id, c.ref_id,
    CAST(len(list_intersect(x.arr, y.arr)) AS DOUBLE)
      / CAST(len(x.arr) + len(y.arr) - len(list_intersect(x.arr, y.arr)) AS DOUBLE) AS jaccard
  FROM cand c
  JOIN arrs x ON c.doc_id = x.doc_id
  JOIN arrs y ON c.ref_id = y.doc_id
) WHERE jaccard >= 0.5""",
        "doc_repetition": f"""
WITH t AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
b AS (
  SELECT doc_id,
    len(tk) AS n_tok,
    len(list_distinct(tk)) AS n_tok_d,
    CASE WHEN len(tk) < 2 THEN CAST([] AS VARCHAR[])
         ELSE list_transform(range(len(tk) - 1), i -> tk[i+1] || ' ' || tk[i+2]) END AS bg,
    CASE WHEN len(tk) < 3 THEN CAST([] AS VARCHAR[])
         ELSE list_transform(range(len(tk) - 2), i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]) END AS tg
  FROM t
),
m AS (
  SELECT doc_id, MAX(c) AS top_bg FROM (
    SELECT doc_id, g, COUNT(*) AS c
    FROM (SELECT doc_id, unnest(bg) AS g FROM b)
    GROUP BY doc_id, g
  ) GROUP BY doc_id
),
r AS (
  SELECT b.doc_id,
    CASE WHEN n_tok = 0 THEN 0.0
         ELSE 1.0 - CAST(n_tok_d AS DOUBLE) / CAST(n_tok AS DOUBLE) END AS dup_word_frac,
    CASE WHEN len(bg) = 0 OR top_bg IS NULL THEN 0.0
         ELSE CAST(top_bg AS DOUBLE) / CAST(len(bg) AS DOUBLE) END AS top_bigram_frac,
    1.0 - (CASE WHEN len(tg) = 0 THEN 1.0
           ELSE CAST(len(list_distinct(tg)) AS DOUBLE) / CAST(len(tg) AS DOUBLE) END) AS dup_trigram_frac
  FROM b LEFT JOIN m ON b.doc_id = m.doc_id
)
SELECT doc_id, dup_word_frac, top_bigram_frac, dup_trigram_frac,
  (top_bigram_frac > 0.18 OR dup_trigram_frac > 0.30) AS flagged
FROM r""",
        "doc_stratified_sample": """
SELECT doc_id, source AS key, CAST(rnk AS BIGINT) AS rank FROM (
  SELECT doc_id, source,
    ROW_NUMBER() OVER (
      PARTITION BY source
      ORDER BY md5('strat-v1' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
    ) AS rnk
  FROM documents
) WHERE rnk <= 10""",
        "emb_quantize": """
WITH b AS (
  SELECT vec_id, embedding,
    CAST(list_min(embedding) AS DOUBLE) AS mn,
    CAST(list_max(embedding) AS DOUBLE) AS mx
  FROM embeddings
)
SELECT vec_id, CAST(t.i AS BIGINT) AS pos,
  CAST(CASE WHEN mx = mn THEN 0 ELSE
    LEAST(255, FLOOR((CAST(embedding[t.i + 1] AS DOUBLE) - mn) * 256.0 / (mx - mn)))
  END AS BIGINT) AS q
FROM b, UNNEST(range(len(embedding))) AS t(i)""",
        "emb_cosine_topk": f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id, embedding AS cv FROM embeddings),
scored AS (
  SELECT query_id, vec_id, {cosine} AS cosine
  FROM q, c WHERE vec_id <> query_id
)
SELECT query_id, vec_id, cosine, CAST(rn AS BIGINT) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn FROM scored
) WHERE rn <= 5""",
        "emb_near_dups": f"""
WITH a AS (SELECT label AS blk, vec_id AS id_a, embedding AS va FROM embeddings),
b AS (SELECT label AS blk, vec_id AS id_b, embedding AS vb FROM embeddings),
scored AS (
  SELECT id_a, id_b,
    {_DOT.format(a='va', b='vb')} / (sqrt({_DOT.format(a='va', b='va')}) * sqrt({_DOT.format(a='vb', b='vb')})) AS cosine
  FROM a JOIN b USING (blk) WHERE id_a < id_b
)
SELECT id_a, id_b, cosine FROM scored WHERE cosine >= 0.35""",
        # r9: the three ANN paths are now fully differential-oracled —
        # pinned hyperplanes / md5 centroid sample make every routing
        # decision recomputable in SQL, and the measured decision
        # margins (≥ 6.4e-05) dwarf the fold-vs-matmul float
        # discrepancy (≤ 4.4e-16), so the hash comparison is robust.
        # emb_ann_quality below still records the recall contracts.
        "emb_lsh_ann": _lsh_ann_sql(),
        "emb_ivf_ann": _ivf_ann_sql(),
        "emb_ivfpq_ann": _ivfpq_ann_sql(),
        "emb_ann_quality": """
SELECT 'lsh' AS method, CAST(0.85 AS DOUBLE) AS recall_floor, TRUE AS meets_floor, TRUE AS prunes
UNION ALL
SELECT 'ivf_probe_70pct', CAST(0.85 AS DOUBLE), TRUE, TRUE
UNION ALL
SELECT 'ivfpq_adc_probe_20pct_clustered', CAST(0.10 AS DOUBLE), TRUE, TRUE
UNION ALL
SELECT 'ivfpq_rerank128_probe_20pct_clustered', CAST(0.85 AS DOUBLE), TRUE, TRUE
UNION ALL
SELECT 'ivf_appended_probe_70pct', CAST(0.85 AS DOUBLE), TRUE, TRUE
UNION ALL
SELECT 'ivf_append_drift_le_10pt', CAST(0.10 AS DOUBLE), TRUE, TRUE""",
        "mm_blob_meta": """
SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len, sha256(text) AS sha256
FROM documents""",
        "mm_decode_features": """
WITH b AS (SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS bl FROM documents)
SELECT doc_id, bl % 256 AS width, (bl // 256) % 256 AS height,
  CAST(3 AS BIGINT) AS channels, (bl * 2654435761) % 2147483647 AS checksum
FROM b""",
        "mm_frame_sample": """
WITH f AS (
  SELECT doc_id,
    4 + doc_id % 8 AS w, 2 + doc_id % 6 AS h,
    2 + doc_id % 5 AS n_frames
  FROM documents
),
frames AS (
  SELECT doc_id, w, h, r.f AS frame_no FROM f, UNNEST(range(n_frames)) r(f)
)
SELECT doc_id, CAST(frame_no AS BIGINT) AS frame_no,
  CAST(frame_no * (9 + length(CAST(w AS VARCHAR))
                     + length(CAST(h AS VARCHAR)) + w * h * 3)
       AS BIGINT) AS byte_offset,
  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
  CAST((doc_id + 11 * frame_no) % 256 AS DOUBLE) AS mean_r,
  CAST((doc_id * 7 + 3 * frame_no) % 256 AS DOUBLE) AS mean_g,
  CAST((doc_id * 13 + 5 * frame_no) % 256 AS DOUBLE) AS mean_b
FROM frames WHERE frame_no % 2 = 0""",
        "mm_gif_frames": """
WITH f AS (
  SELECT doc_id, 4 + doc_id % 6 AS w, 3 + doc_id % 5 AS h,
    1 + doc_id % 4 AS n_frames
  FROM documents
),
frames AS (
  SELECT doc_id, w, h, r.f AS frame_no,
    (17 * doc_id + 29 * r.f) % 256 AS v
  FROM f, UNNEST(range(n_frames)) r(f)
)
SELECT doc_id, CAST(frame_no AS BIGINT) AS frame_no,
  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
  CAST(v AS DOUBLE) AS mean_r,
  CAST((7 * v) % 256 AS DOUBLE) AS mean_g,
  CAST((13 * v) % 256 AS DOUBLE) AS mean_b
FROM frames""",
        "mm_jpeg_roundtrip": """
WITH d AS (
  SELECT doc_id, 2 + doc_id % 3 AS txn, 1 + (doc_id // 3) % 3 AS tyn,
    CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END AS ncomp
  FROM documents
),
tiles AS (
  SELECT doc_id, txn, tyn, ncomp,
    ((7 * doc_id + 11 * tx.v + 13 * ty.v) % 128) * 2 AS val
  FROM d, UNNEST(range(txn)) tx(v), UNNEST(range(tyn)) ty(v)
),
agg AS (
  SELECT doc_id, txn, tyn, ncomp, SUM(val) AS sv
  FROM tiles GROUP BY ALL
)
SELECT doc_id, TRUE AS ok,
  CAST(8 * txn AS BIGINT) AS width, CAST(8 * tyn AS BIGINT) AS height,
  CAST(ncomp AS BIGINT) AS n_components,
  CAST(sv * 64 * ncomp AS DOUBLE) / CAST(8 * txn * 8 * tyn * ncomp AS DOUBLE)
    AS mean_pixel,
  CAST(sv * 64 * ncomp AS BIGINT) AS checksum
FROM agg""",
        "g_pagerank": _G + ",\n" + _pagerank_sql(5),
        "g_kcore": _G + ",\n" + _kcore_sql(80, 12),
        "g_pagerank_weighted": """
WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
wedges AS (
  SELECT a.pk AS src, b.pk AS dst, CAST(COUNT(*) AS DOUBLE) AS w
  FROM li a JOIN li b USING (ok) WHERE a.pk <> b.pk GROUP BY a.pk, b.pk
),
ws AS (SELECT src, SUM(w) AS wsum FROM wedges GROUP BY src),
nv AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM ws),
p0 AS (SELECT src AS vId, 1.0 / n AS pr FROM ws, nv),
"""
        + ",\n".join(
            f"p{i} AS (SELECT e.dst AS vId, (1.0 - 0.85) / n + 0.85 * SUM(p.pr * e.w / s.wsum) AS pr\n"
            f"  FROM wedges e JOIN p{i-1} p ON p.vId = e.src JOIN ws s ON s.src = e.src, nv\n"
            f"  GROUP BY e.dst, n)"
            for i in range(1, 6)
        )
        + "\nSELECT vId, ROUND(pr, 9) AS pr FROM p5",
        "g_modularity": _G + """,
mlab AS (SELECT DISTINCT src AS vId, src % 10 AS cId FROM edges),
mew AS (
  SELECT l1.cId AS c_src, l2.cId AS c_dst
  FROM edges e JOIN mlab l1 ON l1.vId = e.src JOIN mlab l2 ON l2.vId = e.dst
),
mper AS (
  SELECT c_src,
    SUM(CASE WHEN c_src = c_dst THEN 1 ELSE 0 END) / 2.0 AS a,
    CAST(COUNT(*) AS DOUBLE) AS deg
  FROM mew GROUP BY c_src
),
mm AS (SELECT COUNT(*) / 2.0 AS m FROM edges)
SELECT ROUND(SUM(a / m - POW(deg / (2.0 * m), 2.0)), 9) AS modularity
FROM mper, mm""",
        # UNION (not UNION ALL) bounds the working set at one row per
        # (vertex, depth) pair, so the recursion never explodes on the
        # dense graph; MIN(d) per vertex is the BFS distance
        "g_bfs": _G.replace("WITH li", "WITH RECURSIVE li") + """,
src0 AS (SELECT MIN(src) AS s FROM edges),
walk(vId, d) AS (
  SELECT s, 0 FROM src0
  UNION
  SELECT e.dst, w.d + 1 FROM walk w JOIN edges e ON e.src = w.vId
  WHERE w.d < 20
)
SELECT vId, CAST(MIN(d) AS BIGINT) AS dist FROM walk GROUP BY vId""",
        "doc_bm25": f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
tf AS (
  SELECT doc_id, dl, tok, CAST(COUNT(*) AS DOUBLE) AS tf
  FROM (SELECT doc_id, CAST(len(tk) AS DOUBLE) AS dl, unnest(tk) AS tok FROM toks)
  WHERE tok IN ({", ".join("'" + t + "'" for t in sorted(_BM25_TERMS))})
  GROUP BY doc_id, dl, tok
),
stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(CAST(len(tk) AS DOUBLE)) AS avgdl FROM toks),
dft AS (SELECT tok, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df FROM tf GROUP BY tok)
SELECT doc_id,
  ROUND(SUM(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
            * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 6) AS score
FROM tf JOIN dft USING (tok), stats
GROUP BY doc_id
ORDER BY score DESC, doc_id ASC
LIMIT 50""",
        "ev_retention": """
WITH cohorts AS (
  SELECT user_id AS u, MIN(CAST(date_trunc('week', ts) AS DATE)) AS cohort_week
  FROM events GROUP BY user_id
),
active AS (
  SELECT DISTINCT user_id AS u, CAST(date_trunc('week', ts) AS DATE) AS act_week
  FROM events
)
SELECT cohort_week,
  CAST(date_diff('day', cohort_week, act_week) // 7 AS BIGINT) AS week_offset,
  CAST(COUNT(*) AS BIGINT) AS n_users
FROM active JOIN cohorts USING (u)
GROUP BY cohort_week, week_offset""",
        "doc_tfidf": f"""
WITH tf AS (
  SELECT doc_id, tok AS term, CAST(COUNT(*) AS DOUBLE) AS tf
  FROM (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents)
  GROUP BY doc_id, tok
),
nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
dft AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df FROM tf GROUP BY term),
scored AS (
  SELECT doc_id, term,
    ROUND(tf * (ln((1.0 + n_docs) / (1.0 + df)) + 1.0), 6) AS score
  FROM tf JOIN dft USING (term), nd
)
SELECT doc_id,
  CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS BIGINT) AS rank,
  term, score
FROM scored
QUALIFY rank <= 3""",
        "rel_scd2": """
WITH ordered AS (
  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
    LAG(o_orderstatus) OVER w AS prev,
    LAG(o_orderdate) OVER w AS prev_ts
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
runs AS (
  SELECT * FROM ordered
  WHERE prev_ts IS NULL OR o_orderstatus IS DISTINCT FROM prev
)
SELECT o_custkey, o_orderstatus,
  epoch_us(o_orderdate) AS valid_from_us,
  epoch_us(LEAD(o_orderdate) OVER w2) AS valid_to_us,
  (LEAD(o_orderdate) OVER w2) IS NULL AS is_current
FROM runs
WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""",
        "ev_anomalies": """
WITH s AS (
  SELECT event_type, AVG(value) AS mu, STDDEV_SAMP(value) AS sigma
  FROM events GROUP BY event_type
)
SELECT event_id, event_type, value, ROUND((value - mu) / NULLIF(sigma, 0), 6) AS z
FROM events JOIN s USING (event_type)
WHERE ABS(ROUND((value - mu) / NULLIF(sigma, 0), 6)) > 3.0""",
        "ev_topk_per_window": """
WITH counts AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hour_bucket, user_id,
    CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT hour_bucket, user_id, n_events,
  CAST(ROW_NUMBER() OVER (PARTITION BY hour_bucket ORDER BY n_events DESC, user_id ASC) AS BIGINT) AS rank
FROM counts
QUALIFY rank <= 3""",
        "doc_dup_ratio_by_source": """
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
  ROUND(CAST(COUNT(DISTINCT md5(text)) AS DOUBLE) / COUNT(*), 6) AS distinct_ratio
FROM documents GROUP BY source""",
        "doc_normalize": """
WITH c AS (
  SELECT doc_id, text,
    lower(trim(regexp_replace(regexp_replace(text, '[\\x00-\\x1f\\x7f]', ' ', 'g'), '\\s+', ' ', 'g'))) AS clean_text
  FROM documents
)
SELECT doc_id, clean_text,
  CAST(length(text) - length(clean_text) AS BIGINT) AS n_removed
FROM c""",
        "doc_quality_sample": f"""
WITH t AS (SELECT doc_id, text, {_TOKS} AS tk FROM documents),
q AS (
  SELECT doc_id,
    0.4 * (CASE WHEN length(text) BETWEEN 100 AND 10000 THEN 1.0 ELSE 0.0 END)
    + 0.3 * greatest(0.0, 1.0 - (CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE)) * 5.0)
    + 0.3 * least(CAST(len(list_intersect(tk, ['the','and','of','to','is','in','that','with'])) AS DOUBLE) / 4.0, 1.0)
    AS quality
  FROM t
),
d AS (
  SELECT doc_id, quality,
    CAST({_H60.format(x="'qsample-v1' || CAST(doc_id AS VARCHAR)")} AS DOUBLE) / 1152921504606846976.0 AS draw
  FROM q
)
SELECT doc_id, quality, draw FROM d
WHERE draw < least(1.0, 1.2 * quality)""",
        "emb_centroid_assign": f"""
WITH c AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 8),
s AS (
  SELECT e.vec_id, c.cid,
    list_reduce(list_prepend(0.0, list_transform(range(len(e.embedding)),
      i -> (CAST(e.embedding[i+1] AS DOUBLE) - CAST(c.cvec[i+1] AS DOUBLE))
         * (CAST(e.embedding[i+1] AS DOUBLE) - CAST(c.cvec[i+1] AS DOUBLE)))),
      (x, y) -> x + y) AS dist2
  FROM embeddings e, c
)
SELECT vec_id, cid AS cluster, dist2
FROM s
QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2, cid) = 1""",
        "rel_window_distribution": """
SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
  CAST(c_nationkey AS BIGINT) AS c_nationkey,
  CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
  ROUND(CUME_DIST() OVER w, 9) AS cume,
  ROUND(PERCENT_RANK() OVER w, 9) AS pct_rank
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal ASC, c_custkey ASC)""",
        "ev_partition_pruned": """
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_purchases,
  ROUND(AVG(value), 6) AS avg_value
FROM events WHERE event_type = 'purchase'
GROUP BY user_id""",
        "rel_bucketed_join": """
SELECT c_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
FROM customer JOIN orders ON c_custkey = o_custkey
WHERE c_acctbal > 0
GROUP BY c_custkey""",
        "mm_wav_roundtrip": """
SELECT doc_id, true AS ok, CAST(1 AS BIGINT) AS n_channels,
  CAST(8000 AS BIGINT) AS sample_rate, CAST(16 AS BIGINT) AS bits_per_sample,
  CAST(100 + doc_id % 400 AS BIGINT) AS n_frames
FROM documents""",
        "mm_bmp_roundtrip": """
SELECT doc_id, true AS ok,
  CAST(8 + doc_id % 24 AS BIGINT) AS width,
  CAST(4 + doc_id % 12 AS BIGINT) AS height,
  CAST(24 AS BIGINT) AS bits,
  CAST(doc_id % 256 AS DOUBLE) AS mean_r,
  CAST((doc_id * 7) % 256 AS DOUBLE) AS mean_g,
  CAST((doc_id * 13) % 256 AS DOUBLE) AS mean_b
FROM documents""",
        "rel_sketch_quality": """
SELECT 'hll_distinct_l_partkey_within_5pct' AS metric, true AS ok
UNION ALL SELECT 'approx_p50_l_extendedprice_within_5pct', true
UNION ALL SELECT 'hll_merged_l_partkey_by_l_returnflag_within_5pct', true
UNION ALL SELECT 'kll_p50_l_extendedprice_within_5pct', true
UNION ALL SELECT 'cms_top5_l_partkey_within_eps', true""",
        # full differential replay of the portable CMS: same universal
        # hash family ((k%P)*a+b)%P%w, same d=4 rows, same top-20 order
        "ev_cms_heavy_hitters": """
WITH h(i, a, b) AS (VALUES (0, 2654435761, 97), (1, 40503, 12345),
                           (2, 2246822519, 7919), (3, 1366127, 101159)),
keyed AS (SELECT CAST(user_id AS BIGINT) AS k FROM events),
sketch AS (
  SELECT i, (((k % 2147483647) * a + b) % 2147483647) % 128 AS bucket,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM keyed CROSS JOIN h GROUP BY 1, 2
),
topk AS (
  SELECT k, CAST(COUNT(*) AS BIGINT) AS exact_n FROM keyed GROUP BY 1
  ORDER BY exact_n DESC, k ASC LIMIT 20
),
est AS (
  SELECT t.k, t.exact_n, MIN(s.cnt) AS cms_n
  FROM topk t CROSS JOIN h
  JOIN sketch s
    ON s.i = h.i
   AND s.bucket = (((t.k % 2147483647) * h.a + h.b) % 2147483647) % 128
  GROUP BY 1, 2
)
SELECT k AS user_id, exact_n, cms_n, cms_n - exact_n AS overcount FROM est""",
        # integer-exact replay of the deterministic mixture sampler:
        # lexicographic-rank weights (no regexp — DuckDB-version-proof),
        # half-corpus budget, accept iff
        # (doc_id*2654435761 mod 2^20)*n_s < quota_s*2^20.
        # Every intermediate is CAST to BIGINT so no HUGEINT (whose
        # client-side conversion is version-sensitive) ever surfaces.
        "doc_mixture_sample": """
WITH counts AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(ROW_NUMBER() OVER (ORDER BY source) AS BIGINT) AS w
  FROM documents GROUP BY source
),
tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total,
               CAST(SUM(w) AS BIGINT) AS w_total FROM counts),
quotas AS (
  SELECT source, n_docs,
         CAST(((n_total * 5000 // 10000) * w) // w_total AS BIGINT) AS quota
  FROM counts CROSS JOIN tot
),
flagged AS (
  SELECT d.source, q.n_docs, q.quota, d.n_chars,
         ((CAST(d.doc_id AS BIGINT) * 2654435761) % 1048576) * q.n_docs
           < q.quota * 1048576 AS accept
  FROM documents d JOIN quotas q USING (source)
)
SELECT source, n_docs, quota,
       CAST(COALESCE(SUM(CASE WHEN accept THEN 1 END), 0) AS BIGINT) AS n_sampled,
       CAST(COALESCE(SUM(CASE WHEN accept THEN n_chars END), 0) AS BIGINT)
         AS chars_sampled
FROM flagged GROUP BY 1, 2, 3""",
        "emb_semantic_dedup": _semantic_dedup_sql(0.3),
        "emb_knn_graph": _knn_graph_sql(3),
        "ev_hll_distinct": """
WITH h AS (
  SELECT ((event_id % 2147483647) * 1103515245 + 12345) % 2147483647 AS h
  FROM events
),
regs AS (
  SELECT h % 64 AS register,
    CASE WHEN h // 64 = 0 THEN 26
         ELSE 26 - length(bin(h // 64)) END AS rank
  FROM h
),
br AS (
  SELECT register, CAST(MAX(rank) AS BIGINT) AS max_rank
  FROM regs GROUP BY register
),
summ AS (
  SELECT CAST(64 AS BIGINT) AS m,
    CAST(64 - COUNT(*) AS BIGINT) AS n_zero_regs,
    2904.064 / (SUM(1.0 / CAST((CAST(1 AS BIGINT) << CAST(max_rank AS INTEGER))
                               AS DOUBLE))
                + CAST(64 - COUNT(*) AS DOUBLE)) AS hll_est
  FROM br
),
ex AS (SELECT CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_exact FROM events)
SELECT br.register, br.max_rank, s.m, s.n_zero_regs, ex.n_exact, s.hll_est,
  CAST(FLOOR(ABS(s.hll_est - ex.n_exact) * 10000.0
             / GREATEST(ex.n_exact, 1)) AS BIGINT) AS err_bp
FROM br, summ s, ex""",
        "rel_fuzzy_part_match": """
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b, a.p_brand, a.p_size,
  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
FROM part a JOIN part b
  ON a.p_brand = b.p_brand AND a.p_size = b.p_size
  AND a.p_partkey < b.p_partkey
  AND ABS(length(a.p_name) - length(b.p_name)) <= 2
WHERE levenshtein(a.p_name, b.p_name) <= 2""",
        "ev_daily_hll_users": """
WITH h AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day,
    ((user_id % 2147483647) * 1103515245 + 12345) % 2147483647 AS h
  FROM events
),
regs AS (
  SELECT day, h % 64 AS register,
    CASE WHEN h // 64 = 0 THEN 26
         ELSE 26 - length(bin(h // 64)) END AS rank
  FROM h
),
br AS (
  SELECT day, register, MAX(rank) AS max_rank
  FROM regs GROUP BY day, register
),
est AS (
  SELECT day,
    2904.064 / (SUM(1.0 / CAST((CAST(1 AS BIGINT) << CAST(max_rank AS INTEGER))
                               AS DOUBLE))
                + CAST(64 - COUNT(*) AS DOUBLE)) AS hll_est
  FROM br GROUP BY day
),
ex AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day,
    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM events GROUP BY day
)
SELECT e.day, x.n_exact, e.hll_est,
  CAST(FLOOR(ABS(e.hll_est - x.n_exact) * 10000.0
             / GREATEST(x.n_exact, 1)) AS BIGINT) AS err_bp
FROM est e JOIN ex x USING (day)""",
        "doc_char_entropy": """
WITH ch AS (
  SELECT doc_id, length(text) AS n,
    substring(text, CAST(r.i AS INTEGER), 1) AS c
  FROM documents, UNNEST(range(1, length(text) + 1)) r(i)
  WHERE length(text) >= 1
),
cnt AS (SELECT doc_id, n, c, COUNT(*) AS k FROM ch GROUP BY doc_id, n, c)
SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
  CAST(COUNT(*) AS BIGINT) AS n_unique_chars,
  CAST(SUM(CAST(ROUND(-(CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                      * ln(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)), 9)
                AS DECIMAL(28,9))) AS DOUBLE) AS entropy
FROM cnt GROUP BY doc_id, n""",
        "emb_kmeans_refine": _kmeans_sql(8, 2),
        "ev_histogram_quantiles": """
WITH s AS (
  SELECT MIN(CAST(value AS DOUBLE)) AS lo, MAX(CAST(value AS DOUBLE)) AS hi,
         CAST(COUNT(value) AS BIGINT) AS n
  FROM events WHERE value IS NOT NULL
  HAVING COUNT(value) > 0
),
b AS (
  SELECT CASE WHEN s.hi = s.lo THEN 0
              ELSE LEAST(CAST(FLOOR((CAST(e.value AS DOUBLE) - s.lo)
                                    / ((s.hi - s.lo) / 256.0)) AS BIGINT), 255)
         END AS bin
  FROM events e, s WHERE e.value IS NOT NULL
),
hist AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS k FROM b GROUP BY bin),
cum AS (
  SELECT bin, SUM(k) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum_n
  FROM hist
),
qv AS (SELECT CAST(x AS DOUBLE) AS q FROM (VALUES (0.5), (0.9), (0.99)) t(x)),
hit AS (
  SELECT q, bin, cum_n, ROW_NUMBER() OVER (PARTITION BY q ORDER BY bin) AS rn
  FROM cum, qv, s WHERE CAST(cum_n AS DOUBLE) >= q * CAST(s.n AS DOUBLE)
)
SELECT h.q, h.bin,
  s.lo + CAST(h.bin AS DOUBLE)
    * (CASE WHEN s.hi = s.lo THEN 0.0 ELSE (s.hi - s.lo) / 256.0 END) AS bin_lo,
  s.lo + CAST(h.bin + 1 AS DOUBLE)
    * (CASE WHEN s.hi = s.lo THEN 0.0 ELSE (s.hi - s.lo) / 256.0 END) AS bin_hi,
  CAST(h.cum_n AS BIGINT) AS cum_n, s.n
FROM hit h, s WHERE h.rn = 1""",
        "emb_dup_clusters": _dup_clusters_sql(3, 0.25, 30),
        "rel_q3_shipping_priority": """
SELECT l_orderkey,
  epoch_us(o_orderdate) AS o_orderdate_us,
  o_orderpriority,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10""",
        "rel_q18_large_orders": """
WITH big AS (
  SELECT l_orderkey, CAST(SUM(l_quantity) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING CAST(SUM(l_quantity) AS DOUBLE) > 150
)
SELECT c_custkey, c_name, o_orderkey,
  epoch_us(o_orderdate) AS o_orderdate_us, o_totalprice, total_qty
FROM big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey""",
        "rel_pivot_status": """
SELECT o_orderpriority,
  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
FROM orders GROUP BY o_orderpriority""",
        "rel_unpivot_prices": """
SELECT o_orderkey, 'totalprice' AS metric, o_totalprice AS value FROM orders
UNION ALL
SELECT o_orderkey, 'custkey', CAST(o_custkey AS DOUBLE) FROM orders""",
        "rel_snapshot_diff": """
WITH s_old AS (
  SELECT o_orderkey, o_totalprice AS price FROM orders WHERE o_orderkey % 10 <> 0
),
s_new AS (
  SELECT o_orderkey,
    CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS price
  FROM orders WHERE o_orderkey % 7 <> 0
)
SELECT o_orderkey,
  CASE WHEN o.price IS NULL THEN 'added'
       WHEN n.price IS NULL THEN 'removed'
       WHEN o.price IS DISTINCT FROM n.price THEN 'changed'
       ELSE 'unchanged' END AS status
FROM s_old o FULL OUTER JOIN s_new n USING (o_orderkey)""",
        "rel_q5_local_supplier": """
SELECT n_name,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name""",
        "rel_q10_returned_items": """
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name, c_acctbal, n_name,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20""",
        "rel_orc_roundtrip": """
SELECT l_returnflag,
  CAST(COUNT(*) AS BIGINT) AS n_items,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
  CAST(MIN(l_orderkey) AS BIGINT) AS first_order
FROM lineitem GROUP BY l_returnflag""",
        "g_link_scores": _G + """,
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY src),
p AS (SELECT src, dst FROM edges WHERE src < dst),
cn AS (
  SELECT a.src AS u, b.src AS v, CAST(COUNT(*) AS BIGINT) AS cn
  FROM edges a
  JOIN edges b ON a.dst = b.dst
  JOIN p ON p.src = a.src AND p.dst = b.src
  WHERE a.src < b.src
  GROUP BY 1, 2
)
SELECT p.src, p.dst,
  CAST(COALESCE(cn.cn, 0) AS BIGINT) AS cn,
  CAST(COALESCE(cn.cn, 0) AS DOUBLE)
    / CAST(du.d + dv.d - COALESCE(cn.cn, 0) AS DOUBLE) AS jaccard,
  CAST(du.d * dv.d AS BIGINT) AS pa
FROM p
JOIN deg du ON du.src = p.src
JOIN deg dv ON dv.src = p.dst
LEFT JOIN cn ON cn.u = p.src AND cn.v = p.dst""",
        "g_assortativity": _G + """,
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY src),
ann AS (
  SELECT du.d AS dx, dv.d AS dy
  FROM edges e JOIN deg du ON du.src = e.src JOIN deg dv ON dv.src = e.dst
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(dx) AS BIGINT) AS sx, CAST(SUM(dy) AS BIGINT) AS sy,
         CAST(SUM(dx * dy) AS BIGINT) AS sxy,
         CAST(SUM(dx * dx) AS BIGINT) AS sxx,
         CAST(SUM(dy * dy) AS BIGINT) AS syy
  FROM ann
)
SELECT n, sx, sxy, sxx,
  CAST(n * sxy - sx * sy AS DOUBLE)
    / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
       * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS assortativity
FROM s""",
        "ev_transitions": """
WITH t AS (
  SELECT event_type AS to_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS from_type
  FROM events
),
c AS (
  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM t WHERE from_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n,
  CAST(n AS DOUBLE)
    / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
FROM c""",
        "doc_repeated_passages": f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
win AS (
  SELECT doc_id,
    {_H60.format(x="array_to_string(tk[CAST(i AS INTEGER):CAST(i AS INTEGER) + 7], ' ')")}
      AS chunk_hash
  FROM toks, UNNEST(range(1, len(tk) - 8 + 2)) AS r(i)
  WHERE len(tk) >= 8
)
SELECT chunk_hash,
  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
  CAST(COUNT(*) AS BIGINT) AS n_occ
FROM win GROUP BY chunk_hash
HAVING COUNT(DISTINCT doc_id) >= 2""",
        "emb_norm_stats": f"""
WITH nr AS (
  SELECT label, sqrt({_DOT.format(a="embedding", b="embedding")}) AS nrm
  FROM embeddings
)
SELECT CAST(label AS BIGINT) AS label, CAST(COUNT(*) AS BIGINT) AS n,
  MIN(nrm) AS min_norm, MAX(nrm) AS max_norm,
  CAST(SUM(CAST(nrm AS DECIMAL(28,10))) AS DOUBLE) AS sum_norm,
  CAST(SUM(CAST(nrm AS DECIMAL(28,10))) AS DOUBLE)
    / CAST(COUNT(*) AS DOUBLE) AS mean_norm
FROM nr GROUP BY label""",
        "rel_q7_volume_shipping": """
SELECT supp_nation, cust_nation, CAST(l_year AS INTEGER) AS l_year,
  CAST(SUM(CAST(volume AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM (
  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <= TIMESTAMP '1997-12-31'
    AND ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
      OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
)
GROUP BY supp_nation, cust_nation, l_year""",
        "g_label_propagation": _G + ",\n" + _lpa_sql(4) + "\nSELECT vId, label FROM lab4",
        "emb_covariance": """
WITH pr AS (
  SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
         CAST(embedding[CAST(i AS INTEGER) + 1] AS DOUBLE)
           * CAST(embedding[CAST(j AS INTEGER) + 1] AS DOUBLE) AS xy
  FROM embeddings,
       UNNEST(range(len(embedding))) r(i),
       UNNEST(range(len(embedding))) s(j)
  WHERE j >= i
),
ag AS (
  SELECT i, j, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(xy AS DECIMAL(28,12))) AS sxy
  FROM pr GROUP BY 1, 2
),
dm AS (
  SELECT CAST(i AS BIGINT) AS i,
         SUM(CAST(CAST(embedding[CAST(i AS INTEGER) + 1] AS DOUBLE)
                  AS DECIMAL(28,12))) AS sx
  FROM embeddings, UNNEST(range(len(embedding))) r(i)
  GROUP BY 1
)
SELECT a.i, a.j,
  ROUND((CAST(sxy AS DOUBLE)
     - CAST(si.sx AS DOUBLE) * CAST(sj.sx AS DOUBLE) / CAST(n AS DOUBLE))
    / CAST(n - 1 AS DOUBLE), 9) AS cov
FROM ag a JOIN dm si ON si.i = a.i JOIN dm sj ON sj.i = a.j""",
        "ev_interval_join": """
SELECT CAST(l.user_id AS BIGINT) AS user_id,
  CAST(l.event_id AS BIGINT) AS left_id,
  CAST(r.event_id AS BIGINT) AS right_id,
  epoch_us(r.ts) - epoch_us(l.ts) AS lag_us
FROM events l
JOIN events r
  ON l.user_id = r.user_id
 AND r.ts >= l.ts
 AND r.ts <= l.ts + INTERVAL 30 MINUTE
WHERE l.event_type = 'purchase' AND r.event_type = 'click'""",
        "doc_unigram_nll": f"""
WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS total FROM toks),
vocab AS (
  SELECT tok,
         ROUND(-ln(CAST(COUNT(*) AS DOUBLE) / (SELECT total FROM tot)), 9)
           AS nlp
  FROM toks GROUP BY tok
)
SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
  CAST(SUM(CAST(nlp AS DECIMAL(28,9))) AS DOUBLE) AS nll,
  CAST(SUM(CAST(nlp AS DECIMAL(28,9))) AS DOUBLE)
    / CAST(COUNT(*) AS DOUBLE) AS mean_nll
FROM toks t JOIN vocab v USING (tok)
GROUP BY t.doc_id""",
        "g_sssp_weighted": _G + """,
ew AS (
  SELECT a.pk AS src, b.pk AS dst, CAST(COUNT(*) AS BIGINT) AS w
  FROM li a JOIN li b USING (ok) WHERE a.pk <> b.pk GROUP BY 1, 2
),
"""
        + _sssp_sql(5)
        + "\nSELECT vId, CAST(d AS BIGINT) AS dist FROM d5",
        "g_random_walks": _G + ",\n" + _walks_sql(2, 4) + """
SELECT start, walk_id, step, vId FROM w0
UNION ALL SELECT start, walk_id, step, vId FROM w1
UNION ALL SELECT start, walk_id, step, vId FROM w2
UNION ALL SELECT start, walk_id, step, vId FROM w3
UNION ALL SELECT start, walk_id, step, vId FROM w4""",
        "doc_minhash_quality": """
SELECT 'minhash_mean_abs_err_le_0.1' AS metric, true AS ok
UNION ALL SELECT 'minhash_p95_abs_err_le_0.25', true
UNION ALL SELECT 'minhash_max_abs_err_le_0.5', true
UNION ALL SELECT 'minhash_candidates_nonempty', true""",
        "rel_q4_order_priority": """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o_orderpriority""",
        "ev_rolling_features": """
SELECT CAST(event_id AS BIGINT) AS event_id,
  CAST(user_id AS BIGINT) AS user_id,
  CAST(COUNT(*) OVER w AS BIGINT) AS n_7d,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_value_7d
FROM events
WINDOW w AS (
  PARTITION BY user_id
  ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
  RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW
)""",
        "rel_q6_forecast_revenue": """
SELECT
  CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE)
    AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24""",
        "g_landmark_distances": _G.replace("WITH li", "WITH RECURSIVE li") + """,
lms AS (SELECT src AS lm FROM (SELECT DISTINCT src FROM edges ORDER BY src LIMIT 4)),
mwalk(lm, vId, d) AS (
  SELECT lm, lm, 0 FROM lms
  UNION
  SELECT w.lm, e.dst, w.d + 1 FROM mwalk w JOIN edges e ON e.src = w.vId
  WHERE w.d < 20
)
SELECT lm, vId, CAST(MIN(d) AS BIGINT) AS dist FROM mwalk GROUP BY lm, vId""",
        "g_centrality_approx": _G.replace("WITH li", "WITH RECURSIVE li") + """,
lms AS (SELECT src AS lm FROM (SELECT DISTINCT src FROM edges ORDER BY src LIMIT 4)),
mwalk(lm, vId, d) AS (
  SELECT lm, lm, 0 FROM lms
  UNION
  SELECT w.lm, e.dst, w.d + 1 FROM mwalk w JOIN edges e ON e.src = w.vId
  WHERE w.d < 20
),
dist AS (SELECT lm, vId, CAST(MIN(d) AS BIGINT) AS dist FROM mwalk GROUP BY lm, vId),
agg AS (SELECT vId, COUNT(*) AS k, SUM(dist) AS sumd FROM dist GROUP BY vId),
lmd AS (
  SELECT d.lm AS l1, d.vId AS l2, d.dist AS dll
  FROM dist d JOIN lms ON d.vId = lms.lm WHERE d.lm < d.vId
),
onpath AS (
  SELECT a.vId, CAST(COUNT(*) AS BIGINT) AS betweenness
  FROM lmd p
  JOIN dist a ON a.lm = p.l1
  JOIN dist b ON b.lm = p.l2 AND b.vId = a.vId
  WHERE a.dist + b.dist = p.dll AND a.vId <> p.l1 AND a.vId <> p.l2
  GROUP BY a.vId
)
SELECT agg.vId,
  ROUND(CASE WHEN sumd > 0 THEN CAST(k AS DOUBLE) / CAST(sumd AS DOUBLE) ELSE 0.0 END, 9) AS closeness,
  COALESCE(betweenness, 0) AS betweenness
FROM agg LEFT JOIN onpath ON agg.vId = onpath.vId""",
        "emb_product_quantization": _PQ_SQL + """
SELECT CAST(vec_id AS BIGINT) AS vec_id,
  array_to_string(list(code ORDER BY j), '-') AS codes,
  list_reduce(list_prepend(0.0, list(d2 ORDER BY j)), (x, y) -> x + y) AS err2
FROM best WHERE rn = 1 GROUP BY vec_id""",
        "emb_pq_ann": _PQ_SQL + """,
codes AS (SELECT vec_id, j, code FROM best WHERE rn = 1),
qs AS (
  SELECT vec_id AS qid, CAST(r.j AS BIGINT) AS j,
         embedding[CAST(r.j AS INTEGER) * 16 + 1 : CAST(r.j AS INTEGER) * 16 + 16] AS qv
  FROM embeddings, UNNEST(range(4)) r(j) WHERE vec_id < 3
),
dtable AS (
  SELECT qid, q.j, c.cid AS code,
    list_reduce(list_prepend(0.0, list_transform(range(16),
      i -> (CAST(qv[i + 1] AS DOUBLE) - CAST(cvec[i + 1] AS DOUBLE))
           * (CAST(qv[i + 1] AS DOUBLE) - CAST(cvec[i + 1] AS DOUBLE)))),
      (x, y) -> x + y) AS dj
  FROM qs q JOIN cent c ON c.j = q.j
),
adc AS (
  SELECT d.qid, co.vec_id,
    list_reduce(list_prepend(0.0, list(dj ORDER BY d.j)), (x, y) -> x + y)
      AS adc_dist
  FROM codes co JOIN dtable d ON d.j = co.j AND d.code = co.code
  GROUP BY d.qid, co.vec_id
)
SELECT CAST(qid AS BIGINT) AS qid, CAST(vec_id AS BIGINT) AS vec_id, adc_dist
FROM (
  SELECT qid, vec_id, adc_dist,
    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc_dist, vec_id) AS rn
  FROM adc
) WHERE rn <= 10""",
        "g_graph_summary": _G + """,
gdeg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS dg FROM edges GROUP BY src),
gds AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_vertices,
         CAST(SUM(dg) AS BIGINT) AS n_directed_edges,
         CAST(MAX(dg) AS BIGINT) AS max_degree,
         CAST(SUM(dg * (dg - 1)) AS BIGINT) AS sum_dd
  FROM gdeg
),
gts AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles FROM tri)
SELECT n_vertices, n_directed_edges, max_degree,
  CAST(n_directed_edges AS DOUBLE) / CAST(n_vertices AS DOUBLE) AS avg_degree,
  n_triangles,
  6.0 * CAST(n_triangles AS DOUBLE) / CAST(sum_dd AS DOUBLE) AS transitivity
FROM gds, gts""",
        "rel_q8_market_share": """
WITH f AS (
  SELECT YEAR(o_orderdate) AS o_year,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS rev,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'AMERICA'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1997-01-01'
)
SELECT CAST(o_year AS BIGINT) AS o_year,
  CAST(COALESCE(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev END),
                CAST(0 AS DECIMAL(18,6))) AS DOUBLE)
    / CAST(SUM(rev) AS DOUBLE) AS mkt_share,
  CAST(COALESCE(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev END),
                CAST(0 AS DECIMAL(18,6))) AS DOUBLE) AS nation_revenue,
  CAST(SUM(rev) AS DOUBLE) AS total_revenue
FROM f GROUP BY o_year""",
        "rel_q14_promo_revenue": """
SELECT
  100.0
    * CAST(SUM(CASE WHEN p_type = 'PROMO'
               THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
               END) AS DOUBLE)
    / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
           AS DOUBLE) AS promo_revenue_pct,
  CAST(SUM(CASE WHEN p_type = 'PROMO'
            THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
            END) AS DOUBLE) AS promo_revenue,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
       AS DOUBLE) AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'""",
        "rel_q17_small_qty_revenue": """
WITH pa AS (
  SELECT l_partkey, AVG(l_quantity) AS aq FROM lineitem GROUP BY l_partkey
)
SELECT
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
    AS avg_yearly,
  CAST(COUNT(*) AS BIGINT) AS n_small
FROM lineitem l JOIN pa USING (l_partkey)
WHERE l.l_quantity < 0.2 * aq""",
        "rel_q2_min_cost_supplier": _PS_SQL + """,
sn AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
eu AS (
  SELECT ps.ps_partkey, ps.ps_supplycost, sn.s_name, sn.s_acctbal, sn.n_name
  FROM partsupp ps
  JOIN part p ON ps.ps_partkey = p.p_partkey
   AND p.p_size <= 15 AND p.p_type = 'STANDARD'
  JOIN sn ON ps.ps_suppkey = sn.s_suppkey
),
mins AS (
  SELECT ps_partkey AS _pk, MIN(ps_supplycost) AS _minc
  FROM eu GROUP BY ps_partkey
)
SELECT s_acctbal, s_name, n_name, ps_partkey AS p_partkey,
  CAST(ps_supplycost AS DOUBLE) AS supplycost
FROM eu JOIN mins ON ps_partkey = _pk AND ps_supplycost = _minc
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100""",
        "rel_q9_product_profit": _PS_SQL + """
SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
           - ps_supplycost * CAST(l_quantity AS DECIMAL(8,0)))
       AS DOUBLE) AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN orders ON o_orderkey = l_orderkey
GROUP BY n_name, o_year
ORDER BY n_name, o_year DESC""",
        "rel_q11_important_stock": _PS_SQL + """,
sn AS (
  SELECT s_suppkey FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
v AS (
  SELECT ps_partkey,
    SUM(ps_supplycost * CAST(ps_availqty AS DECIMAL(10,0))) AS _v
  FROM partsupp JOIN sn ON ps_suppkey = s_suppkey
  GROUP BY ps_partkey
),
tot AS (
  SELECT CAST(SUM(_v) AS DOUBLE) AS _t, CAST(COUNT(*) AS BIGINT) AS _c FROM v
)
SELECT ps_partkey AS p_partkey, CAST(_v AS DOUBLE) AS value
FROM v, tot
WHERE CAST(_v AS DOUBLE) * _c > 1.2 * _t
ORDER BY value DESC, p_partkey""",
        "rel_q16_supplier_part_counts": _PS_SQL + """
SELECT p_brand, p_type, p_size,
  CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
FROM partsupp
JOIN part ON ps_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
        "rel_q20_potential_promotion": _PS_SQL + """,
shipped AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
    SUM(l_quantity) AS _q
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_name LIKE 'small%'
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY 1, 2
),
excess AS (
  SELECT DISTINCT ps.ps_suppkey
  FROM partsupp ps JOIN shipped sh USING (ps_partkey, ps_suppkey)
  WHERE CAST(ps_availqty AS DOUBLE) > 0.5 * _q
)
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND s_suppkey IN (SELECT ps_suppkey FROM excess)
ORDER BY s_suppkey""",
        "doc_cdc_chunks": _cdc_sql() + """
SELECT doc_id, chunk_no, start, chunk_len, chunk_hash FROM cdc""",
        "doc_cdc_chunk_dedup": _cdc_sql() + """
SELECT chunk_hash,
  CAST(COUNT(*) AS BIGINT) AS n_occurrences,
  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
  CAST(MIN(doc_id) AS BIGINT) AS first_doc,
  CAST(MIN(chunk_len) AS BIGINT) AS chunk_len
FROM cdc GROUP BY chunk_hash HAVING COUNT(*) >= 2""",
        "emb_jl_projection": (
            "SELECT CAST(vec_id AS BIGINT) AS vec_id,\n  "
            + ",\n  ".join(_jl_folds())
            + "\nFROM embeddings"
        ),
        "emb_jl_distortion": (
            "WITH pr AS (\n  SELECT CAST(vec_id AS BIGINT) AS vec_id,\n  "
            + ",\n  ".join(_jl_folds())
            + "\n  FROM embeddings WHERE vec_id < 30\n),"
            + """
base AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id,
    list_transform(embedding, v -> CAST(v AS DOUBLE)) AS x
  FROM embeddings WHERE vec_id < 30
),
orig AS (
  SELECT a.vec_id AS qa, b.vec_id AS qb,
    list_reduce(list_prepend(0.0, list_transform(range(64),
      i -> (a.x[CAST(i AS INTEGER) + 1] - b.x[CAST(i AS INTEGER) + 1])
         * (a.x[CAST(i AS INTEGER) + 1] - b.x[CAST(i AS INTEGER) + 1]))),
      (acc, v) -> acc + v) AS d2
  FROM base a JOIN base b ON a.vec_id < b.vec_id
)
SELECT o.qa, o.qb,
  ROUND(("""
            + " + ".join(
                f"(pa.p{j:02d} - pb.p{j:02d}) * (pa.p{j:02d} - pb.p{j:02d})"
                for j in range(16)
            )
            + """) / NULLIF(16.0 * d2, 0.0), 9) AS ratio
FROM orig o
JOIN pr pa ON pa.vec_id = o.qa
JOIN pr pb ON pb.vec_id = o.qb"""
        ),
        "ev_resample_ffill": """
WITH ev AS (
  SELECT user_id, ts, event_id, value, date_trunc('day', ts) AS day
  FROM events WHERE user_id < 50
),
daily AS (
  SELECT user_id, day,
    MAX(struct_pack(ts := ts, event_id := event_id, value := value)) AS m
  FROM ev GROUP BY user_id, day
),
span AS (SELECT user_id, MIN(day) AS a, MAX(day) AS b FROM ev GROUP BY user_id),
grid AS (
  SELECT user_id, UNNEST(generate_series(a, b, INTERVAL 1 DAY)) AS day
  FROM span
)
SELECT g.user_id, epoch_us(g.day) // 1000000 AS day_s,
  last_value(d.m.value IGNORE NULLS) OVER (
    PARTITION BY g.user_id ORDER BY g.day
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill
FROM grid g
LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day""",
        "ev_attribution": """
WITH t AS (
  SELECT event_id, user_id, event_type, ts,
    MAX(CASE WHEN event_type <> 'purchase'
        THEN struct_pack(ts := ts, event_id := event_id,
                         event_type := event_type) END)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS tch
  FROM events
)
SELECT event_id, user_id,
  CASE WHEN tch IS NOT NULL
        AND epoch_us(ts) - epoch_us(tch.ts) <= 604800000000
       THEN tch.event_type ELSE 'none' END AS channel,
  CASE WHEN tch IS NOT NULL
        AND epoch_us(ts) - epoch_us(tch.ts) <= 604800000000
       THEN (epoch_us(ts) - epoch_us(tch.ts)) // 1000000 END AS lag_s
FROM t WHERE event_type = 'purchase'""",
        "emb_truncation_recall": """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id, embedding AS cv FROM embeddings),
full_rank AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY {cosine_placeholder} DESC, vec_id) AS rn
    FROM q, c WHERE vec_id <> query_id
  ) WHERE rn <= 5
),
qt AS (SELECT vec_id AS query_id, embedding[1:16] AS qv FROM embeddings WHERE vec_id < 10),
ct AS (SELECT vec_id, embedding[1:16] AS cv FROM embeddings),
trunc_rank AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY {cosine_placeholder} DESC, vec_id) AS rn
    FROM qt q, ct c WHERE vec_id <> query_id
  ) WHERE rn <= 5
),
ov AS (
  SELECT f.query_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
  FROM full_rank f JOIN trunc_rank t USING (query_id, vec_id)
  GROUP BY f.query_id
)
SELECT q2.query_id, COALESCE(n_overlap, 0) AS n_overlap,
  CAST(COALESCE(n_overlap, 0) AS DOUBLE) / 5.0 AS recall
FROM (SELECT vec_id AS query_id FROM embeddings WHERE vec_id < 10) q2
LEFT JOIN ov USING (query_id)""".replace("{cosine_placeholder}", cosine),
        "ev_late_audit": """
WITH t AS (
  SELECT event_type,
    COALESCE(
      MAX(epoch_us(ts)) OVER (ORDER BY event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      - 600000000 - epoch_us(ts), -1) AS _late_us
  FROM events
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CASE WHEN _late_us > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
  GREATEST(MAX(_late_us), 0) // 1000000 AS max_late_s
FROM t GROUP BY event_type""",
        "ev_watermark_sizing": """
WITH e AS (
  SELECT COALESCE(
    MAX(epoch_us(ts)) OVER (ORDER BY event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    - epoch_us(ts), -1) AS dis
  FROM events
),
delays(delay) AS (VALUES (1), (5), (10), (30)),
curve AS (
  SELECT CAST(delay AS BIGINT) AS delay_minutes,
    CAST(COUNT(*) AS BIGINT) AS n_events,
    CAST(SUM(CASE WHEN dis > delay * 60 * 1000000 THEN 1 ELSE 0 END)
         AS BIGINT) AS n_late
  FROM e, delays GROUP BY delay
)
SELECT delay_minutes, n_events, n_late,
  (n_late * 10000) // GREATEST(n_events, 1) AS pct_late_bp
FROM curve""",
        "doc_sliding_chunks": """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
g AS (
  SELECT doc_id, w, CAST(s.s AS BIGINT) AS start
  FROM w, UNNEST(range(0, GREATEST(len(w) - 1, 0) + 1, 30)) s(s)
)
SELECT doc_id,
  start // 30 AS chunk_no,
  start AS start_word,
  CAST(len(list_slice(w, start + 1, start + 40)) AS BIGINT) AS n_words,
  md5(array_to_string(list_slice(w, start + 1, start + 40), ' '))
    AS chunk_md5
FROM g""",
        "rel_bloom_prune": """
WITH sup AS (
  SELECT DISTINCT s_suppkey FROM supplier WHERE s_nationkey < 5
),
pos AS (
  SELECT DISTINCT ((s_suppkey * a + b) % 1048573) % 1024 AS pos
  FROM sup, (VALUES (2654435761, 97), (40503, 12345),
                    (2246822519, 7919)) h(a, b)
),
f AS (
  SELECT l_suppkey,
    ((l_suppkey * 2654435761 + 97) % 1048573) % 1024 AS p0,
    ((l_suppkey * 40503 + 12345) % 1048573) % 1024 AS p1,
    ((l_suppkey * 2246822519 + 7919) % 1048573) % 1024 AS p2
  FROM lineitem
),
m AS (
  SELECT (l_suppkey IN (SELECT s_suppkey FROM sup)) AS member,
    (p0 IN (SELECT pos FROM pos) AND p1 IN (SELECT pos FROM pos)
     AND p2 IN (SELECT pos FROM pos)) AS pass
  FROM f
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM(CASE WHEN member THEN 1 ELSE 0 END) AS BIGINT)
    AS n_member_rows,
  CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
  CAST(SUM(CASE WHEN pass AND NOT member THEN 1 ELSE 0 END) AS BIGINT)
    AS n_false_pos,
  CAST(SUM(CASE WHEN pass AND NOT member THEN 1 ELSE 0 END) * 10000
       AS BIGINT)
    // GREATEST(CAST(SUM(CASE WHEN NOT member THEN 1 ELSE 0 END)
                     AS BIGINT), 1) AS fpr_bp,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM pos) AS n_bits_set
FROM m""",
        "doc_phrase_search": """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
),
occ AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS start
  FROM toks, UNNEST(range(1, len(tk) - 3 + 2)) AS r(i)
  WHERE len(tk) >= 3
    AND array_to_string(
          tk[CAST(i AS INTEGER):CAST(i AS INTEGER) + 2], ' ')
        = 'key agg row'
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches,
  MIN(start) AS first_pos
FROM occ GROUP BY doc_id""",
        "ev_ohlc_bars": """
SELECT event_type,
  (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS bar_ts,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  (MIN(struct_pack(ts := ts, event_id := event_id,
                   value := value))).value AS open,
  MAX(value) AS high, MIN(value) AS low,
  (MAX(struct_pack(ts := ts, event_id := event_id,
                   value := value))).value AS close
FROM events GROUP BY 1, 2""",
        "emb_dup_threshold_curve": f"""
WITH a AS (SELECT label AS blk, vec_id AS id_a, embedding AS va FROM embeddings),
b AS (SELECT label AS blk, vec_id AS id_b, embedding AS vb FROM embeddings),
scored AS (
  SELECT id_a, id_b,
    {_DOT.format(a='va', b='vb')} / (sqrt({_DOT.format(a='va', b='va')}) * sqrt({_DOT.format(a='vb', b='vb')})) AS cosine
  FROM a JOIN b USING (blk) WHERE id_a < id_b
),
ex AS (
  SELECT id_a AS id, cosine FROM scored
  UNION ALL
  SELECT id_b AS id, cosine FROM scored
),
t(threshold) AS (VALUES (CAST(0.2 AS DOUBLE)), (CAST(0.3 AS DOUBLE)),
                        (CAST(0.35 AS DOUBLE)), (CAST(0.4 AS DOUBLE)),
                        (CAST(0.5 AS DOUBLE)))
SELECT threshold,
  CAST(COUNT(CASE WHEN cosine >= threshold THEN 1 END) // 2 AS BIGINT)
    AS n_pairs,
  CAST(COUNT(DISTINCT CASE WHEN cosine >= threshold THEN id END) AS BIGINT)
    AS n_vec_with_dup
FROM ex, t GROUP BY threshold""",
        "rel_merge_upsert": """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
),
u AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
    o_totalprice + 10.0 AS o_totalprice
  FROM base WHERE o_orderkey % 13 <> 0 AND o_orderkey % 7 = 0
)
SELECT b.o_orderkey,
  CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_custkey
       ELSE b.o_custkey END AS o_custkey,
  CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_orderstatus
       ELSE b.o_orderstatus END AS o_orderstatus,
  CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_totalprice
       ELSE b.o_totalprice END AS o_totalprice,
  CASE WHEN u.o_orderkey IS NOT NULL THEN 'U' ELSE 'K' END AS action
FROM base b LEFT JOIN u ON b.o_orderkey = u.o_orderkey
WHERE b.o_orderkey % 13 <> 0
UNION ALL
SELECT o_orderkey + (SELECT MAX(o_orderkey) FROM base), o_custkey, 'N',
  CAST(100.0 AS DOUBLE), 'I'
FROM base WHERE o_orderkey % 17 = 0""",
        "rel_zorder_prune": f"""
WITH d AS (
  SELECT o_custkey % 256 AS x,
    (CAST(o_orderdate AS DATE) - DATE '1970-01-01') % 256 AS y
  FROM orders
),
dz AS (SELECT x, y, {z_interleave_sql('x', 'y', 8, '//')} AS z FROM d),
m AS (
  SELECT x, z,
    (x BETWEEN 0 AND 127 AND y BETWEEN 16 AND 47) AS ok
  FROM dz
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
  CAST(COUNT(DISTINCT CASE WHEN ok THEN z // 4096 END) AS BIGINT)
    AS zorder_files_touched,
  CAST(COUNT(DISTINCT CASE WHEN ok THEN x // 16 END) AS BIGINT)
    AS linear_files_touched,
  CAST(16 AS BIGINT) AS n_files
FROM m""",
        "ev_heartbeat_gaps": """
WITH g AS (
  SELECT user_id,
    epoch_us(ts) - epoch_us(LAG(ts) OVER (
      PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
  FROM events
)
SELECT CAST(user_id AS BIGINT) AS user_id,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CASE WHEN gap_us > 1800000000 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_gaps_over,
  GREATEST(COALESCE(MAX(gap_us), 0), 0) // 1000000 AS max_gap_s
FROM g GROUP BY user_id""",
        "ev_debounce": """
SELECT CAST(event_id AS BIGINT) AS event_id,
  CAST(user_id AS BIGINT) AS user_id, event_type
FROM (
  SELECT event_id, user_id, event_type,
    epoch_us(ts) - epoch_us(LAG(ts) OVER (
      PARTITION BY user_id, event_type ORDER BY ts, event_id)) AS gap
  FROM events
) WHERE gap IS NULL OR gap >= 600000000""",
        "g_snapshot_edges": """
WITH sli AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-07-01'
)
SELECT DISTINCT a.pk AS src, b.pk AS dst
FROM sli a JOIN sli b USING (ok) WHERE a.pk <> b.pk""",
        # 10 rounds: the k=4 peel needs 3 rounds at sf0.01 but 7 at
        # sf0.1 (measured — 5 rounds under-peeled by 25 edges there);
        # extra rounds are idempotent at the fixed point, so over-
        # unrolling is safe and the margin covers the sweep SFs
        "g_ktruss": _G + ",\n" + _ktruss_sql(4, 10) + "\nSELECT src, dst FROM kt10",
        "rel_q15_top_supplier": """
WITH rev AS (
  SELECT l_suppkey,
    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
         AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)""",
        "doc_passage_locations": f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
occ AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
    {_H60.format(x="array_to_string(tk[CAST(i AS INTEGER):CAST(i AS INTEGER) + 7], ' ')")}
      AS chunk_hash
  FROM toks, UNNEST(range(1, len(tk) - 8 + 2)) AS r(i)
  WHERE len(tk) >= 8
),
dup AS (
  SELECT chunk_hash FROM occ
  GROUP BY chunk_hash HAVING COUNT(DISTINCT doc_id) >= 2
)
SELECT o.chunk_hash, o.doc_id, o.pos FROM occ o JOIN dup USING (chunk_hash)""",
        "ev_trigrams": """
WITH t AS (
  SELECT LAG(event_type, 2) OVER w AS a,
         LAG(event_type, 1) OVER w AS b,
         event_type AS c
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT a, b, c, CAST(COUNT(*) AS BIGINT) AS n
FROM t WHERE a IS NOT NULL
GROUP BY a, b, c
ORDER BY n DESC, a, b, c
LIMIT 25""",
        "emb_code_dedup": _PQ_SQL + """,
pcodes AS (
  SELECT vec_id, list(code ORDER BY j) AS codes
  FROM best WHERE rn = 1 GROUP BY vec_id
)
SELECT CAST(MIN(vec_id) AS BIGINT) AS rep,
  CAST(COUNT(*) AS BIGINT) AS n_members,
  array_to_string(codes, '-') AS codes
FROM pcodes GROUP BY codes HAVING COUNT(*) >= 2""",
        "rel_monthly_growth": """
WITH mrev AS (
  SELECT date_trunc('month', o_orderdate) AS _m,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1
)
SELECT epoch_us(CAST(_m AS TIMESTAMP)) AS month_us, revenue,
  ROUND(100.0 * (revenue - LAG(revenue) OVER (ORDER BY _m))
        / LAG(revenue) OVER (ORDER BY _m), 6) AS growth_pct
FROM mrev""",
        "rel_abc_analysis": """
WITH prev AS (
  SELECT l_partkey,
    SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS r
  FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT SUM(r) AS t FROM prev),
cl AS (
  SELECT l_partkey, CAST(r AS DOUBLE) AS revenue,
    CAST(SUM(r) OVER (ORDER BY r DESC, l_partkey ASC) AS DOUBLE)
      / CAST((SELECT t FROM tot) AS DOUBLE) AS cum_share
  FROM prev
)
SELECT CASE WHEN cum_share <= 0.80 THEN 'A'
            WHEN cum_share <= 0.95 THEN 'B'
            ELSE 'C' END AS abc_class,
  CAST(COUNT(*) AS BIGINT) AS n_parts,
  CAST(SUM(CAST(revenue AS DECIMAL(18,6))) AS DOUBLE) AS class_revenue
FROM cl GROUP BY 1""",
        "g_rich_club": _G + """,
rdeg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS dg FROM edges GROUP BY src)
SELECT k, n_rich, e_rich,
  CAST(2 * e_rich AS DOUBLE)
    / CAST(n_rich * (n_rich - 1) AS DOUBLE) AS phi
FROM (
"""
        + "\n  UNION ALL\n".join(
            f"""  SELECT CAST({kk} AS BIGINT) AS k,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM rdeg WHERE dg > {kk}) AS n_rich,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM edges e
       JOIN rdeg a ON a.src = e.src JOIN rdeg b ON b.src = e.dst
       WHERE e.src < e.dst AND a.dg > {kk} AND b.dg > {kk}) AS e_rich"""
            for kk in (10, 50, 100)
        )
        + "\n)",
        "rel_data_quality": """
SELECT 'orders_custkey_in_customer' AS rule,
  CAST((SELECT COUNT(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
    AS n_violations,
  (SELECT COUNT(*) FROM orders o
   WHERE NOT EXISTS (SELECT 1 FROM customer c
                     WHERE c.c_custkey = o.o_custkey)) = 0 AS passed
UNION ALL
SELECT 'lineitem_quantity_in_range',
  CAST((SELECT COUNT(*) FROM lineitem
        WHERE l_quantity <= 0 OR l_quantity > 50) AS BIGINT),
  (SELECT COUNT(*) FROM lineitem
   WHERE l_quantity <= 0 OR l_quantity > 50) = 0
UNION ALL
SELECT 'orders_orderkey_unique',
  CAST((SELECT COUNT(*) FROM (
     SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1
   )) AS BIGINT),
  (SELECT COUNT(*) FROM (
     SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1
   )) = 0
UNION ALL
SELECT 'events_props_not_null',
  CAST((SELECT COUNT(*) FROM events WHERE props IS NULL) AS BIGINT),
  (SELECT COUNT(*) FROM events WHERE props IS NULL) = 0
UNION ALL
SELECT 'orders_totalprice_positive',
  CAST((SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0) AS BIGINT),
  (SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0) = 0""",
        "g_degree_histogram": _G + """,
hdeg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS dg FROM edges GROUP BY src)
SELECT CAST(FLOOR(log2(dg)) AS BIGINT) AS bucket,
  CAST(COUNT(*) AS BIGINT) AS n_vertices
FROM hdeg GROUP BY 1""",
        "rel_q12_late_priority": """
SELECT l_linestatus,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_linestatus""",
        "rel_q13_customer_distribution": """
WITH per_cust AS (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM per_cust GROUP BY c_count""",
        "rel_q19_discounted_revenue": """
SELECT
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
    AS DOUBLE) AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_quantity <= 30 AND (
     (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
      AND l_quantity BETWEEN 1 AND 11)
  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
      AND l_quantity BETWEEN 10 AND 20)
  OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
      AND l_quantity BETWEEN 20 AND 30))""",
        "rel_q21_waiting_suppliers": """
WITH li AS (
  SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
),
per_order AS (
  SELECT l_orderkey,
    COUNT(DISTINCT l_suppkey) AS nsup,
    COUNT(DISTINCT CASE
      WHEN l_shipdate > o_orderdate + INTERVAL 45 DAY
      THEN l_suppkey END) AS nlate
  FROM li GROUP BY l_orderkey
),
late_pairs AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM li
  WHERE l_shipdate > o_orderdate + INTERVAL 45 DAY
)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM late_pairs
JOIN per_order USING (l_orderkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE nsup >= 2 AND nlate = 1
GROUP BY s_name""",
        "rel_q22_global_sales": """
WITH cohort AS (
  SELECT * FROM customer WHERE c_nationkey <= 6
),
thr AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
    / COUNT(*) AS avg_bal
  FROM cohort WHERE c_acctbal > 0.0
)
SELECT CAST(c_nationkey AS BIGINT) AS cntrycode,
  CAST(COUNT(*) AS BIGINT) AS numcust,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM cohort, thr
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (
    SELECT 1 FROM orders WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey""",
        # naive O(pairs) formulation — the oracle needs exactness, not
        # scale; the engine side is the prefix-filtered AllPairs plan
        "doc_containment": f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
sh AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
    ELSE list_transform(range(len(tk) - 2), i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3])
    END)) AS s
  FROM toks
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
  FROM sh a JOIN sh b USING (s) WHERE a.doc_id <> b.doc_id GROUP BY 1, 2
)
SELECT doc_a, doc_b,
  CAST(common AS DOUBLE) / CAST(sa.sz AS DOUBLE) AS containment
FROM inter JOIN sizes sa ON sa.doc_id = doc_a
WHERE CAST(common AS DOUBLE) / CAST(sa.sz AS DOUBLE) >= 0.6""",
        # independent join-based winnowing: window starts × position
        # range join, min per window, rightmost argmin — the engine
        # uses a single window aggregate instead (textual.py)
        "doc_winnowing": _WINNOW_SQL + """
SELECT DISTINCT doc_id, pos, fp FROM sel""",
        "doc_winnow_pairs": _WINNOW_SQL + """,
fps AS (SELECT DISTINCT doc_id, fp FROM sel),
rare AS (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= 50)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  CAST(COUNT(*) AS BIGINT) AS n_shared
FROM fps a JOIN rare USING (fp) JOIN fps b USING (fp)
WHERE a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING COUNT(*) >= 2""",
        "ev_cep_strict": """
WITH e AS (
  SELECT user_id, ts, event_id,
    CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
      WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
      WHEN 'error' THEN 'e' ELSE '_' END AS ch
  FROM events
),
s AS (
  SELECT user_id, array_to_string(list(ch ORDER BY ts, event_id), '') AS seq
  FROM e GROUP BY user_id
)
SELECT user_id, CAST(len(seq) AS BIGINT) AS seq_len,
  CAST(len(regexp_extract_all(seq, 'v+c+p')) AS BIGINT) AS n_matches
FROM s WHERE len(regexp_extract_all(seq, 'v+c+p')) > 0""",
    }
