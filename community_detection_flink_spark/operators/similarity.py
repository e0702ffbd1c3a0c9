"""Similarity search over embedding columns (SURVEY.md §2.10).

Brute-force cosine top-k as the exact baseline, and a
random-hyperplane LSH bucketing as the 100 TB path (candidates from
same-bucket join, exact re-rank within buckets).

All vector math is JVM-side column expressions (``zip_with`` +
``aggregate``) — no Python in the row path.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_col(a: Column, b: Column) -> Column:
    return F.try_divide(dot_col(a, b), norm_col(a) * norm_col(b))


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``emb``/``queries``: vec_id long, embedding array<float>.  The
    query side is broadcast (queries ≪ corpus is the standard shape);
    corpus partitions stream past it, so cost is |corpus|·|queries|
    dot products with NO shuffle of the corpus — the only shuffle is
    the per-query top-k (rows already cut to k·|queries| by a partial
    Window would not help; rely on the final groupBy being tiny).

    Deterministic tie-break: (cosine desc, vec_id asc).
    """
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("vec_id"), F.col("embedding").alias("cv"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            cosine_col(F.col("qv"), F.col("cv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def _bucket_col(n_planes: int, seed: int, dim: int, plane_offset: int = 0) -> Column:
    """Sign-pattern bucket id of ``embedding`` against ``n_planes``
    fixed random hyperplanes, derived deterministically from (seed,
    plane index) — see ``_plane_components`` for why these are
    per-plane Mersenne normals and not a hash-formula sinusoid.

    ``plane_offset`` gives multi-table callers globally unique plane
    indices (a per-table seed used as a phase/offset of a SHARED
    stream would correlate the tables and void OR-amplification).

    Plane components are computed ONCE on the driver and inlined as
    array literals — the executor-side work is pure multiply-adds
    (``zip_with`` + ``aggregate``), nothing transcendental in the row
    path.  Literal size is n_planes × dim doubles: trivial next to
    any broadcast.

    ``dim`` is the embedding length (callers probe it from one row).
    """
    return _bucket_from_planes(
        [
            _plane_components(plane_offset + p, dim, seed)
            for p in range(n_planes)
        ]
    )


def _dim_of(emb: DataFrame) -> int:
    """Embedding dimensionality, probed from one row (array<float>
    carries no static length)."""
    row = emb.select(F.size("embedding").alias("d")).first()
    return int(row["d"]) if row is not None else 0


def _plane_components(plane_idx: int, dim: int, seed: int) -> list[float]:
    """i.i.d. N(0, 1) hyperplane components from a per-plane-seeded
    deterministic Mersenne generator (numpy's RandomState stream is
    frozen by its legacy-compatibility policy, so results reproduce
    across runs and machines without shipping a plane matrix).

    Replaces a GLSL-style sin-hash that was MEASURED degenerate:
    ``sin((φ_p + d·c)·M)`` is linear in ``d`` inside the sine, so
    every plane lay in span{sin(c'd), cos(c'd)} — a 2-D family (mean
    pairwise plane |cos| 0.63, exact duplicates at max 1.0).  That
    capped pruning: clustered-fixture candidate fraction plateaued at
    0.45 no matter how many planes, and isotropic sf0.1 scanned 84%
    of the corpus for recall 0.94 (the r2 verdict's weak-perf flag).
    With honestly-random planes the same clustered fixture prunes to
    ≈ 0.05 candidate fraction at HIGHER recall
    (tests/test_similarity_recall.py pins both points).
    """
    import numpy as np

    rs = np.random.RandomState((seed * 1_000_003 + plane_idx * 7919 + 12345) % (2**32))
    return [float(x) for x in rs.normal(size=dim)]


def _bucket_from_planes(planes: list[list[float]]) -> Column:
    bucket = F.lit(0).cast("long")
    for comp in planes:
        dot = F.aggregate(
            F.zip_with(
                F.col("embedding"), F.lit(comp), lambda x, c: x.cast("double") * c
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket * 2 + F.when(dot > 0, 1).otherwise(0)
    return bucket


def random_hyperplane_buckets(
    emb: DataFrame, n_planes: int = 8, seed: int = 42
) -> DataFrame:
    """Single-table LSH bucketing: ``vec_id, bucket`` (long in
    [0, 2^n_planes)).  Building block for ``lsh_buckets`` /
    ``embedding_near_dups``; the ANN query path uses the multi-table
    variant below."""
    return emb.select("vec_id", _bucket_col(n_planes, seed, _dim_of(emb)).alias("bucket"))


def lsh_buckets(
    emb: DataFrame, n_planes: int = 6, n_tables: int = 16, seed: int = 42
) -> DataFrame:
    """Multi-table LSH: ``vec_id, tbl, bucket`` — one row per hash
    table, all ``n_tables`` bucket ids computed in a single scan pass
    (each table's planes use an independent seed).  OR-amplification
    across tables is what buys recall when neighbor angles are wide
    (single-table sign-LSH caps out: a neighbor at cosine 0.3 crosses
    each plane with p ≈ 0.4).  The (tbl, bucket) join key spreads the
    shuffle uniformly.

    Hashing is a vectorized Arrow-batched pandas UDF: the whole batch
    of vectors hits one numpy matmul against the (n_tables·n_planes ×
    dim) plane matrix — this is the sanctioned Python escape hatch for
    per-row dense linear algebra (SURVEY.md §2.10): the equivalent
    column-expression tree (96 nested ``aggregate``s) costs more in
    Catalyst planning + interpreted evaluation than the math itself.
    The plane matrix is deterministic from (seed, plane, dim), so the
    closure ships ~50 KB and results are reproducible."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    dim = _dim_of(emb)
    total = n_planes * n_tables
    P = np.array(
        [_plane_components(p, dim, seed) for p in range(total)], dtype=np.float64
    )
    weights = 1 << np.arange(n_planes)[::-1].astype(np.int64)

    @pandas_udf("array<long>")
    def _buckets(vecs):
        import pandas as pd

        E = np.vstack(vecs.to_numpy())  # batch × dim
        S = (E @ P.T > 0).astype(np.int64)  # batch × (tables·planes)
        per_tbl = [
            S[:, t * n_planes : (t + 1) * n_planes] @ weights
            for t in range(n_tables)
        ]
        B = np.stack(per_tbl, axis=1)  # batch × tables
        return pd.Series(list(B))

    return (
        emb.select("vec_id", _buckets(F.col("embedding")).alias("bs"))
        .select("vec_id", F.posexplode("bs").alias("tbl", "bucket"))
        .select("vec_id", F.col("tbl").cast("int").alias("tbl"), "bucket")
    )


def _probe_masks(n_planes: int, n_probe_bits: int) -> list[int]:
    """All XOR masks with ≤ n_probe_bits bits set (multi-probe set)."""
    masks = [0]
    if n_probe_bits >= 1:
        masks += [1 << i for i in range(n_planes)]
    if n_probe_bits >= 2:
        masks += [
            (1 << i) | (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    return masks


def ann_candidates(
    emb: DataFrame,
    queries: DataFrame,
    n_planes: int = 6,
    n_tables: int = 16,
    n_probe_bits: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Candidate (query_id, vec_id) pairs: same bucket in ANY table,
    with multi-probe on the query side (each query additionally probes
    every bucket within Hamming distance ``n_probe_bits`` — up to that
    many plane votes flipped).

    The probe fan-out (Σ C(n_planes, i) × n_tables rows per query)
    happens on the tiny broadcast query side; each corpus vector hashes
    once per table in one scan pass and never shuffles.  Distinct
    because a pair can collide in several tables."""
    cb = lsh_buckets(emb, n_planes, n_tables, seed)
    probes = F.array(
        *[
            F.col("bucket").bitwiseXOR(F.lit(m).cast("long"))
            for m in _probe_masks(n_planes, n_probe_bits)
        ]
    )
    qb = (
        lsh_buckets(queries, n_planes, n_tables, seed)
        .withColumnsRenamed({"vec_id": "query_id"})
        .select("query_id", "tbl", F.explode(probes).alias("bucket"))
    )
    return (
        cb.join(F.broadcast(qb), ["tbl", "bucket"])
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )


def ann_topk_lsh(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 6,
    n_tables: int = 16,
    n_probe_bits: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: multi-table multi-probe LSH candidates, exact
    cosine re-rank within the candidate set.

    Defaults (6 planes × 16 tables, flip-1 probing) are tuned for the
    WIDE neighbor angles of the isotropic test embeddings (true top-5
    sit at cosine ≈ 0.32 ⇒ each plane separates them with p ≈ 0.4 —
    near the information-theoretic worst case for sign LSH): measured
    recall@5 = 1.0 at sf0.001 and sf0.1 with ≈ 84% of the corpus
    scanned (``ann_recall`` + the candidate fraction, both reported by
    ``bench.py`` — on isotropic data that scan fraction is the price
    of recall, not an implementation defect).  On clustered
    embeddings — the geometry of real corpora — the same code with
    more planes per table prunes hard: (16 planes × 8 tables) hits
    recall 1.0 scanning 5.4% of the clustered fixture
    (``tests/test_similarity_recall.py`` pins both regimes).

    Recall < 1 by construction; ``ann_recall`` measures it against
    ``cosine_topk`` (bench reports recall@k, pytest pins a floor).
    """
    cand = ann_candidates(emb, queries, n_planes, n_tables, n_probe_bits, seed)
    q = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    scored = (
        cand.join(emb, "vec_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "vec_id",
            cosine_col(F.col("qv"), F.col("embedding")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def ivf_centroids(emb: DataFrame, n_cells: int, seed: int = 42) -> DataFrame:
    """Deterministic IVF "coarse quantizer": ``n_cells`` corpus vectors
    chosen by smallest md5(vec_id, seed) — a reproducible uniform
    sample (no k-means dependency; with isotropic data, sampled
    centroids are the standard cheap initialization and the cell
    geometry is the same Voronoi partition k-means would refine).

    The ORDER BY md5 LIMIT k plan is a TakeOrderedAndProject —
    per-partition top-k then a k-row merge on the driver, no full
    sort/shuffle of the corpus.
    """
    return (
        emb.select("vec_id", "embedding")
        .orderBy(F.md5(F.concat_ws(",", F.col("vec_id"), F.lit(seed))))
        .limit(n_cells)
    )


def _ivf_cell_udf(Cn, top: int):
    """pandas UDF: top-``top`` centroid indices by cosine for a batch
    of vectors (one numpy matmul per Arrow batch — same sanctioned
    escape hatch as ``lsh_buckets``).  ``Cn``: (n_cells, dim) row-
    normalized centroid matrix, shipped once in the task closure."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def _cells(vecs):
        import pandas as pd

        E = np.vstack(vecs.to_numpy())  # batch × dim
        S = E @ Cn.T  # batch × n_cells; row norm > 0 doesn't move argmax order
        if top == 1:
            idx = np.argmax(S, axis=1)[:, None]
        else:
            part = np.argpartition(-S, min(top, S.shape[1] - 1), axis=1)[:, :top]
            order = np.take_along_axis(-S, part, axis=1).argsort(axis=1)
            idx = np.take_along_axis(part, order, axis=1)
        return pd.Series(list(idx.astype(np.int32)))

    return _cells


@dataclass
class IVFIndex:
    """Handle to a BUILT IVF index: the driver-side row-normalized
    centroid matrix plus the catalog name of the persisted
    ``(vec_id, embedding, cell)`` table, bucketed (and sorted) by
    ``cell``.  Build once per corpus with :func:`build_ivf_index`,
    then every query batch is pure index reads — no corpus count, no
    centroid re-sample, no cell re-assignment (VERDICT r2 #3: the
    assignment is an index you build once, not a per-query stage).

    At 100 TB the table lands on the shared catalog (see
    ``sources/bucketed.py``); bucketing by cell means any cell-keyed
    join or per-cell aggregation reads pre-shuffled data.
    """

    table: str
    n_cells: int
    seed: int
    Cn: Any = field(repr=False)  # (n_cells, dim) float64, row-normalized
    n_buckets: int = 0  # bucket spec of the persisted table (0 = look up)

    def corpus(self, spark: SparkSession) -> DataFrame:
        """The indexed corpus ``(vec_id, embedding, cell)``."""
        return spark.table(self.table)


def _centroid_matrix(emb: DataFrame, n_cells: int, seed: int):
    import numpy as np

    cents = ivf_centroids(emb, n_cells, seed).collect()
    C = np.vstack([np.asarray(r["embedding"], dtype=np.float64) for r in cents])
    return C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)


def build_ivf_index(
    emb: DataFrame,
    table: str = "ivf_index",
    n_cells: int | None = None,
    seed: int = 42,
) -> IVFIndex:
    """Build and PERSIST the IVF index for ``emb`` (vec_id, embedding):
    sample √n centroids (deterministic md5 sample), assign every corpus
    vector to its nearest centroid in ONE scan pass (vectorized Arrow
    UDF, one numpy matmul per batch), and write the result as a table
    bucketed by ``cell`` so downstream cell-keyed work is exchange-free.

    This is the once-per-corpus cost; :func:`ann_topk_ivf` with
    ``index=`` skips straight to the probe-and-re-rank stage, whose
    plan contains NO corpus-side Python stage (asserted by
    ``tests/test_ivf_index.py``).
    """
    from community_detection_flink_spark.sources.bucketed import (
        bucket_count,
        write_bucketed,
    )

    n = emb.count()
    if n_cells is None:
        n_cells = max(4, int(math.isqrt(max(n, 1))))
    Cn = _centroid_matrix(emb, n_cells, seed)
    assign = _ivf_cell_udf(Cn, 1)
    corpus = emb.select(
        "vec_id",
        "embedding",
        F.element_at(assign(F.col("embedding")), 1).cast("int").alias("cell"),
    )
    dim = Cn.shape[1]
    est_bytes = n * (dim * 4 + 16)  # float32 vectors + ids/overhead
    nb = bucket_count(est_bytes)
    write_bucketed(corpus, table, ["cell"], nb, sort_keys=["cell"])
    return IVFIndex(table=table, n_cells=n_cells, seed=seed, Cn=Cn, n_buckets=nb)


def ivf_index_append(index: IVFIndex, new_emb: DataFrame) -> IVFIndex:
    """Append new vectors to a PERSISTED IVF index (VERDICT r9 #8): a
    100 TB corpus appends continuously, and a full rebuild is a
    whole-corpus pass — this is one pass over the delta instead.

    New vectors are assigned to the EXISTING cells (the index's frozen
    centroid matrix — no re-sample, no corpus re-scan) and written
    into the bucketed table with the SAME bucket spec, so downstream
    cell-keyed reads stay exchange-free.  The cost of freezing the
    centroids: cell balance drifts as the appended distribution
    shifts, degrading probe recall over time — measured, not assumed:
    ``emb_ann_quality`` carries an append-vs-rebuild recall-drift row,
    and the production answer past tolerable drift is a rebuild (the
    standard IVF maintenance policy).

    Returns the same handle (the table is mutated in place).
    """
    spark = new_emb.sparkSession
    # guard against re-appending vec_ids already in the index (r11,
    # mirrors minhash_store_append): duplicate rows would double-count
    # in cell-keyed reads; the id-set read is an index-only column scan
    existing = spark.table(index.table).select("vec_id").distinct()
    new_emb = new_emb.join(existing, "vec_id", "left_anti")
    assign = _ivf_cell_udf(index.Cn, 1)
    delta = new_emb.select(
        "vec_id",
        "embedding",
        F.element_at(assign(F.col("embedding")), 1).cast("int").alias("cell"),
    )
    nb = index.n_buckets
    if not nb:
        # index handle from an earlier session: bucket spec rides the
        # catalog entry
        desc = spark.sql(f"DESCRIBE EXTENDED {index.table}").collect()
        raw = next(
            (r["data_type"] for r in desc if r["col_name"] == "Num Buckets"),
            None,
        )
        if raw is None:
            raise ValueError(
                f"ivf_index_append: table {index.table!r} has no 'Num "
                "Buckets' row in DESCRIBE EXTENDED — it is not a "
                "bucketed table, so appends cannot preserve the "
                "exchange-free cell-keyed read; rebuild the index with "
                "build_ivf_index"
            )
        nb = int(raw)
    (
        delta.write.mode("append")
        .format("parquet")
        .bucketBy(nb, "cell")
        .sortBy("cell")
        .saveAsTable(index.table)
    )
    return IVFIndex(
        table=index.table, n_cells=index.n_cells, seed=index.seed,
        Cn=index.Cn, n_buckets=nb,
    )


def _ivf_corpus_and_probe(
    emb: DataFrame,
    queries: DataFrame,
    n_cells: int | None,
    n_probe: int,
    seed: int,
    index: IVFIndex | None,
) -> tuple[DataFrame, DataFrame]:
    """Shared IVF front half: ``(corpus(vec_id, embedding, cell),
    probes(query_id, qv, cell))`` — from the persisted index when one
    is passed (no count / sample / assignment), else assigned in-flight
    in one scan."""
    if index is not None:
        Cn = index.Cn
        n_cells = index.n_cells
        corpus = index.corpus(queries.sparkSession)
    else:
        n = emb.count()
        if n_cells is None:
            n_cells = max(4, int(math.isqrt(n)))
        Cn = _centroid_matrix(emb, n_cells, seed)
        assign = _ivf_cell_udf(Cn, 1)
        corpus = emb.select(
            "vec_id",
            "embedding",
            F.element_at(assign(F.col("embedding")), 1).cast("int").alias("cell"),
        )
    probe = _ivf_cell_udf(Cn, min(n_probe, n_cells))
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.explode(probe(F.col("embedding"))).alias("cell"),
    )
    return corpus, q


def ivf_candidates(
    emb: DataFrame,
    queries: DataFrame,
    n_cells: int | None = None,
    n_probe: int = 8,
    seed: int = 42,
    index: IVFIndex | None = None,
) -> DataFrame:
    """Candidate (query_id, vec_id) pairs the IVF path scores — the
    measurement mirror of ``ann_candidates``, used to report the
    scanned fraction (on clustered data candidate volume tracks the
    probed clusters, not a fixed corpus fraction)."""
    corpus, q = _ivf_corpus_and_probe(emb, queries, n_cells, n_probe, seed, index)
    return (
        corpus.join(F.broadcast(q.select("query_id", "cell")), "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )


def ann_topk_ivf(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int | None = None,
    n_probe: int = 8,
    seed: int = 42,
    index: IVFIndex | None = None,
) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) cells: assign every
    corpus vector to its nearest of ``n_cells`` centroids, probe the
    ``n_probe`` nearest cells per query, exact cosine re-rank within
    the probed cells.  The LSH path's sibling — IVF prunes by
    PROXIMITY REGION where sign-LSH prunes by angle pattern, and on
    clustered real-world embeddings its candidate volume tracks the
    cluster containing the query rather than a fixed bucket fraction
    (measured: candidate_frac ≈ n_probe/n_cells ≪ 1 on the clustered
    fixture in ``tests/test_similarity_recall.py``).

    Pass ``index=`` (from :func:`build_ivf_index`) to reuse a
    persisted index: the corpus scan then reads the bucketed
    ``(vec_id, embedding, cell)`` table directly — no count, no
    centroid sample, no assignment stage in the plan.  Without it the
    ad-hoc path below assigns cells in-flight (one scan), the right
    shape for a one-shot query.

    Scale: centroids collect to the driver and ship in the UDF closure
    (n_cells ≈ √n keeps this MBs even at 10⁹ vectors: 2¹⁵ × 768 × 8 ≈
    200 MB would instead argue for a two-level quantizer — documented
    limit, not silently exceeded); corpus vectors hash to a cell in
    one scan pass; the per-query probe fan-out rides the tiny
    broadcast side.  Defaults (√n cells, probe 8) measured on the
    isotropic test embeddings: recall@5 ≈ 0.9 at sf0.01 scanning
    ≈ n_probe/n_cells of the corpus (``ivf_recall`` reports per bench
    round; pytest floors it).
    """
    corpus, q = _ivf_corpus_and_probe(emb, queries, n_cells, n_probe, seed, index)
    scored = (
        corpus.join(F.broadcast(q), "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            cosine_col(F.col("qv"), F.col("embedding")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def ivf_recall(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int | None = None,
    n_probe: int = 8,
    seed: int = 42,
    index: IVFIndex | None = None,
) -> float:
    """Recall@k of ``ann_topk_ivf`` vs exact ``cosine_topk`` (the IVF
    quality gate, mirror of ``ann_recall``)."""
    exact = cosine_topk(emb, queries, k).select("query_id", "vec_id")
    approx = ann_topk_ivf(emb, queries, k, n_cells, n_probe, seed, index).select(
        "query_id", "vec_id"
    )
    total = exact.count()
    if total == 0:
        return 1.0
    hits = exact.join(approx, ["query_id", "vec_id"], "left_semi").count()
    return hits / total


def ivfpq_recall(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 8,
    index: IVFIndex | None = None,
    m: int = 4,
    n_codes: int = 8,
    rerank: int | None = None,
    n_cells: int | None = None,
    seed: int = 42,
) -> float:
    """Recall@k of ``ann_topk_ivfpq`` vs exact ``cosine_topk`` — the
    IVF+PQ quality gate (mirror of ``ivf_recall``; VERDICT r4 #5).
    Pass ``rerank`` to measure the shortlist+exact-re-rank path."""
    exact = cosine_topk(emb, queries, k).select("query_id", "vec_id")
    approx = ann_topk_ivfpq(
        emb,
        queries,
        k,
        n_probe=n_probe,
        index=index,
        m=m,
        n_codes=n_codes,
        n_cells=n_cells,
        seed=seed,
        rerank=rerank,
    ).select("query_id", "vec_id")
    total = exact.count()
    if total == 0:
        return 1.0
    hits = exact.join(approx, ["query_id", "vec_id"], "left_semi").count()
    return hits / total


def ann_recall(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 6,
    n_tables: int = 16,
    n_probe_bits: int = 1,
    seed: int = 42,
) -> float:
    """Recall@k of ``ann_topk_lsh`` against the exact ``cosine_topk``:
    |approx ∩ exact| / |exact| over all queries.  The deliverable
    quality metric for the ANN path — reported by ``bench.py`` and
    floored by ``tests/test_similarity_recall.py``."""
    exact = cosine_topk(emb, queries, k).select("query_id", "vec_id")
    approx = ann_topk_lsh(
        emb, queries, k, n_planes, n_tables, n_probe_bits, seed
    ).select("query_id", "vec_id")
    total = exact.count()
    if total == 0:
        return 1.0
    hits = exact.join(approx, ["query_id", "vec_id"], "left_semi").count()
    return hits / total


def quantize_int8(
    emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Per-vector min-max int8-range quantization — the storage-scale
    companion of the ANN paths (4× smaller than float32 before
    codec compression; at 100 TB the embedding store is usually the
    quantized one, with exact re-rank on the float originals).

    q_i = min(255, floor((x_i − min) · 256 / (max − min))), constant
    vectors map to all-zeros.  All arithmetic in IEEE double with a
    fixed operation order, so the DuckDB oracle matches bit-for-bit.
    Output exploded to scalar rows (vec_id, pos, q) — hashable by the
    driver's canonicalizer (arrays are not).
    """
    x = F.col(vec_col)
    mn = F.array_min(x).cast("double")
    mx = F.array_max(x).cast("double")
    scale = mx - mn
    # constant vector (scale == 0) → all-zeros, stated EXPLICITLY: the
    # earlier coalesce(least(255, NULL), 0) formulation silently relied
    # on both Spark's and DuckDB's LEAST skipping NULLs (which made it
    # all-255, not the documented all-0).  The oracle mirrors this as
    # CASE WHEN mx = mn THEN 0 ... END.
    q_arr = F.transform(
        x,
        lambda v: F.when(scale == 0, F.lit(0))
        .otherwise(
            F.least(
                F.lit(255),
                F.floor((v.cast("double") - mn) * 256.0 / scale),
            )
        )
        .cast("long"),
    )
    return emb.select(
        id_col, F.posexplode(q_arr).alias("pos", "q")
    ).select(id_col, F.col("pos").cast("long").alias("pos"), "q")


def nearest_centroid(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """Exact nearest-centroid assignment, all-JVM: for every vector the
    centroid minimizing squared euclidean distance (ties → smallest
    centroid id).

    ``centroids``: ``(centroid_id, embedding)`` — SMALL (k rows), so it
    broadcasts and the corpus never shuffles; cost is k left-fold dot
    products per row inside the expression engine.  This is the
    oracle-verifiable reference implementation of the assignment step
    the IVF index's Arrow/numpy path (``_ivf_cell_udf``) vectorizes —
    same argmin, k·|corpus| flops either way; at 100 TB you run the
    numpy path and REGRESSION-CHECK it against this one on a sample.

    Output: ``(<id>, cluster, dist2)`` with the fold-ordered distance —
    bit-reproducible across engines (no rounding needed).
    """
    c = F.broadcast(
        centroids.select(
            F.col(centroid_id_col).alias("_cid"), F.col("embedding").alias("_cvec")
        )
    )
    diff2 = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("_cvec"),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = emb.select(id_col, "embedding").crossJoin(c).select(
        id_col, F.col("_cid"), diff2.alias("dist2")
    )
    best = scored.groupBy(id_col).agg(
        F.min(F.struct(F.col("dist2"), F.col("_cid").alias("cluster"))).alias("b")
    )
    return best.select(
        id_col, F.col("b.cluster").alias("cluster"), F.col("b.dist2").alias("dist2")
    )


def norm_stats(emb: DataFrame, group_col: str = "label") -> DataFrame:
    """Per-group L2-norm profile of an embedding column: count,
    min/max norm, exact decimal-summed total and the derived mean.

    The sanity scan every embedding pipeline runs before indexing
    (catching un-normalized batches, zero vectors, fp16 overflow):
    one JVM-side fold per row (``norm_col`` — same left-fold order as
    the DuckDB oracle, so per-row norms are bit-exact) + one hash
    aggregate.  The sum goes through DECIMAL(28,10) so the aggregate
    is order-independent and oracle-hashable; mean is one int-count
    division at the end.
    """
    nm = norm_col(F.col("embedding"))
    return (
        emb.select(F.col(group_col), nm.alias("nrm"))
        .groupBy(group_col)
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("nrm").alias("min_norm"),
            F.max("nrm").alias("max_norm"),
            F.sum(F.col("nrm").cast("decimal(28,10)"))
            .cast("double")
            .alias("sum_norm"),
        )
        .withColumn(
            "mean_norm",
            F.try_divide(F.col("sum_norm"), F.col("n").cast("double")),
        )
    )


def covariance_matrix(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Exact sample covariance matrix of an embedding column — the
    embedding-drift / whitening statistic a training pipeline computes
    before PCA or index retraining.

    One generator expression builds the upper-triangle (i, j, x_i·x_j)
    structs JVM-side (no join, no second explode), and the d²/2-key
    aggregate is map-side combined, so the shuffle carries at most
    d²/2 rows PER TASK regardless of corpus size.  Cross-products and
    per-dimension sums go through DECIMAL(28,12), making the aggregate
    order-independent; the covariance formula is then a scalar
    expression over exact sums — bit-exact, oracle-hashable.

    Output: ``(i, j, cov)`` for i ≤ j (sample covariance, n−1).
    """
    v = F.col(vec_col)
    pairs = F.flatten(
        F.transform(
            v,
            lambda x, i: F.transform(
                # slice(j >= i): upper triangle only — halves the work
                F.slice(v, i + 1, F.size(v) - i),
                lambda y, j: F.struct(
                    i.alias("i"),
                    (i + j).alias("j"),
                    (x.cast("double") * y.cast("double")).alias("xy"),
                ),
            ),
        )
    )
    prods = (
        emb.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.i").cast("long").alias("i"), F.col("p.j").cast("long").alias("j"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("p.xy").cast("decimal(28,12)")).alias("sxy"),
        )
    )
    dims = (
        emb.select(F.posexplode(v).alias("i", "x"))
        .groupBy(F.col("i").cast("long").alias("i"))
        .agg(F.sum(F.col("x").cast("double").cast("decimal(28,12)")).alias("sx"))
    )
    si = dims.select(F.col("i"), F.col("sx").alias("s_i"))
    sj = dims.select(F.col("i").alias("j"), F.col("sx").alias("s_j"))
    return (
        prods.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .select(
            "i",
            "j",
            # rounded to 9 decimals (modularity precedent): the DECIMAL
            # cast of an arbitrary double can land on a .5 tie that
            # Spark (HALF_UP) and DuckDB (half-even) round apart — one
            # such element showed up in practice; 9 absolute decimals
            # is far above the ~1e-17 tie noise and far below any
            # covariance this profile statistic cares about
            F.round(
                (
                    F.col("sxy").cast("double")
                    - F.col("s_i").cast("double")
                    * F.col("s_j").cast("double")
                    / F.col("n").cast("double")
                )
                / (F.col("n") - 1).cast("double"),
                9,
            ).alias("cov"),
        )
    )


def product_quantize(
    emb: DataFrame,
    m: int = 4,
    n_codes: int = 8,
    id_col: str = "vec_id",
    codebook: DataFrame | None = None,
) -> DataFrame:
    """Product quantization (Jégou et al. TPAMI'11) — the vector
    compression behind billion-scale ANN indexes: each embedding is
    split into ``m`` contiguous subvectors and every subvector is
    replaced by the id of its nearest sub-codeword, shrinking d floats
    to ``m`` small codes (+ the reconstruction error for quality
    monitoring).

    Codewords are taken deterministically from the first ``n_codes``
    vectors' subvectors (the ``nearest_centroid`` fixed-centroid
    convention — swap in k-means codebooks for production training).
    Everything is JVM column expressions: the subvector explode is
    m rows per vector, the codebook join is a broadcast of m·k tiny
    rows, the argmin is a struct-min (distance, code) with
    deterministic code tie-breaks, and both the per-subspace distance
    and the error fold in fixed index order — bit-exact, so the DuckDB
    oracle hash-matches with NO rounding.

    Output: ``(vec_id, codes array<long>[m], err2 double)``.
    """
    d = _dim_of(emb)
    sub = d // m
    subs = F.array(
        *[
            F.struct(
                F.lit(j).cast("long").alias("j"),
                F.slice("embedding", j * sub + 1, sub).alias("sv"),
            )
            for j in range(m)
        ]
    )
    if codebook is not None:
        # trained codebook (train_pq_codebook): (j, cid, cvec)
        cents = codebook.select("cid", "j", "cvec")
    else:
        cents = (
            emb.where(F.col(id_col) < n_codes)
            .select(F.col(id_col).cast("long").alias("cid"), F.explode(subs).alias("s"))
            .select("cid", F.col("s.j").alias("j"), F.col("s.sv").alias("cvec"))
        )
    rows = emb.select(
        F.col(id_col).cast("long").alias(id_col), F.explode(subs).alias("s")
    ).select(id_col, F.col("s.j").alias("j"), F.col("s.sv").alias("sv"))
    d2 = F.aggregate(
        F.zip_with(
            "sv",
            "cvec",
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    assigned = (
        rows.join(F.broadcast(cents), "j")
        .select(id_col, "j", F.col("cid"), d2.alias("d2"))
        .groupBy(id_col, "j")
        .agg(F.min(F.struct(F.col("d2"), F.col("cid"))).alias("b"))
    )
    return (
        assigned.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("j"),
                        F.col("b.cid").alias("code"),
                        F.col("b.d2").alias("d2"),
                    )
                )
            ).alias("a")
        )
        .select(
            id_col,
            F.transform("a", lambda x: x["code"]).alias("codes"),
            F.aggregate(
                F.transform("a", lambda x: x["d2"]),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("err2"),
        )
    )


def pq_ann_topk(
    emb: DataFrame,
    n_queries: int = 3,
    m: int = 4,
    n_codes: int = 8,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """PQ asymmetric-distance (ADC) top-k search — the query path that
    makes product quantization an ANN index: the query stays
    full-precision, each corpus vector is scored from its m codes via
    a per-query distance TABLE (m·k entries), so scoring the whole
    corpus costs m lookups + adds per vector instead of d multiplies.

    The distance table is a broadcast of |Q|·m·k tiny rows; corpus
    codes join it on (subspace, code) — the corpus embedding column is
    never read again after encoding.  Subspace distances and the ADC
    sum fold in fixed index order, so the result (top-``k`` per query
    by (adc_dist, vec_id)) hash-matches the DuckDB oracle exactly.

    Queries are the first ``n_queries`` vectors (the fixed-query
    convention of ``cosine_topk``'s gate query).  Output:
    ``(qid, vec_id, adc_dist)``.
    """
    from pyspark.sql import Window

    d = _dim_of(emb)
    sub = d // m
    subs = F.array(
        *[
            F.struct(
                F.lit(j).cast("long").alias("j"),
                F.slice("embedding", j * sub + 1, sub).alias("sv"),
            )
            for j in range(m)
        ]
    )
    codes = product_quantize(emb, m, n_codes, id_col)
    code_rows = codes.select(
        id_col, F.posexplode("codes").alias("j", "code")
    ).select(id_col, F.col("j").cast("long").alias("j"), "code")
    cents = (
        emb.where(F.col(id_col) < n_codes)
        .select(F.col(id_col).cast("long").alias("code"), F.explode(subs).alias("s"))
        .select("code", F.col("s.j").alias("j"), F.col("s.sv").alias("cvec"))
    )
    qs = emb.where(F.col(id_col) < n_queries).select(
        F.col(id_col).cast("long").alias("qid"), F.explode(subs).alias("s")
    ).select("qid", F.col("s.j").alias("j"), F.col("s.sv").alias("qv"))
    dj = F.aggregate(
        F.zip_with(
            "qv",
            "cvec",
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dtable = qs.join(cents, "j").select("qid", "j", "code", dj.alias("dj"))
    adc = (
        code_rows.join(F.broadcast(dtable), ["j", "code"])
        .groupBy("qid", id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("j"), F.col("dj")))
            ).alias("a")
        )
        .select(
            "qid",
            id_col,
            F.aggregate(
                F.transform("a", lambda x: x["dj"]),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("adc_dist"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
    return (
        adc.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("qid", id_col, "adc_dist")
    )


def train_pq_codebook(
    emb: DataFrame,
    m: int = 4,
    n_codes: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
) -> DataFrame:
    """Lloyd (k-means) refinement of the PQ codebook, per subspace —
    the training step that turns the naive first-k codebook into a
    production one (measured here: 2 iterations cut mean
    reconstruction error and lift ADC recall on the test corpus;
    pinned in ``tests/test_round4_extras.py``).

    Each iteration is one assign (broadcast codebook join + struct-min
    argmin, the ``product_quantize`` step) and one update (per-
    dimension mean via posexplode + DECIMAL-summed aggregate — the
    shuffle carries (j, code, dim) keys, never whole vectors twice).
    Empty clusters keep their previous codeword.  Deterministic
    end-to-end, so training is replayable.

    Returns the codebook DataFrame ``(j, cid, cvec)`` accepted by
    ``product_quantize(..., codebook=...)``.
    """
    d = _dim_of(emb)
    sub = d // m
    subs = F.array(
        *[
            F.struct(
                F.lit(j).cast("long").alias("j"),
                F.slice("embedding", j * sub + 1, sub).alias("sv"),
            )
            for j in range(m)
        ]
    )
    rows = emb.select(F.explode(subs).alias("s")).select(
        F.col("s.j").alias("j"), F.col("s.sv").alias("sv")
    )
    cents = (
        emb.where(F.col(id_col) < n_codes)
        .select(F.col(id_col).cast("long").alias("cid"), F.explode(subs).alias("s"))
        .select("cid", F.col("s.j").alias("j"), F.col("s.sv").alias("cvec"))
    )
    d2 = F.aggregate(
        F.zip_with(
            "sv",
            "cvec",
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    for _ in range(int(iterations)):
        assigned = (
            rows.join(F.broadcast(cents), "j")
            .select("j", "sv", F.col("cid"), d2.alias("_d2"))
            .groupBy("j", "sv")
            .agg(F.min(F.struct(F.col("_d2"), F.col("cid"))).alias("b"))
            .select("j", "sv", F.col("b.cid").alias("cid"))
        )
        means = (
            assigned.select("j", "cid", F.posexplode("sv").alias("i", "x"))
            .groupBy("j", "cid", "i")
            .agg(
                (
                    F.sum(F.col("x").cast("double").cast("decimal(28,12)")).cast(
                        "double"
                    )
                    / F.count("*").cast("double")
                ).alias("mx")
            )
            .groupBy("j", "cid")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct(F.col("i"), F.col("mx")))
                ).alias("a")
            )
            .select(
                "j",
                "cid",
                F.transform("a", lambda s: s["mx"]).alias("cvec"),
            )
        )
        # empty clusters keep the previous codeword
        cents = (
            cents.select("j", "cid", F.col("cvec").alias("_old"))
            .join(means, ["j", "cid"], "left")
            .select(
                "j", "cid", F.coalesce(F.col("cvec"), F.col("_old")).alias("cvec")
            )
        )
    return cents.select("j", "cid", "cvec")


def _pq_subs_expr(d: int, m: int):
    sub = d // m
    return F.array(
        *[
            F.struct(
                F.lit(j).cast("long").alias("j"),
                F.slice("embedding", j * sub + 1, sub).alias("sv"),
            )
            for j in range(m)
        ]
    )


def ann_topk_ivfpq(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 8,
    index: IVFIndex | None = None,
    m: int = 4,
    n_codes: int = 8,
    codebook: DataFrame | None = None,
    n_cells: int | None = None,
    seed: int = 42,
    id_col: str = "vec_id",
    rerank: int | None = None,
) -> DataFrame:
    """IVF + PQ — the production ANN composition: IVF cells route each
    query to its ``n_probe`` nearest clusters (coarse quantizer, the
    piece PQ lacks), and the candidates inside are scored from their
    PQ codes via the broadcast ADC distance table (the piece IVF's
    exact re-rank pays d multiplies for).  Embeddings are read at
    ENCODE time only; query-time cost is |probed candidates| × m code
    lookups.

    Quality equals the PQ scorer's (code resolution is the ceiling —
    COVERAGE.md records the measured ~0.3 recall@5 of m=4 codes on
    tight clusters; raise m·k or re-rank survivors exactly for more),
    while the scan fraction is the IVF candidate fraction (measured
    ≈ n_probe/n_cells on clustered data).  Output:
    ``(query_id, vec_id, adc_dist)``, top-``k`` per query,
    deterministic (adc, vec_id) order.

    ``rerank=R`` adds the exact re-rank stage: ADC shortlists the top
    ``R`` candidates per query, their float embeddings are re-read
    (vec_id semi-join, not a corpus scan) and scored exactly; output
    becomes ``(query_id, vec_id, cosine, rank)`` like the exact path.
    """
    from pyspark.sql import Window

    d = _dim_of(emb)
    subs = _pq_subs_expr(d, m)
    cand = ivf_candidates(emb, queries, n_cells, n_probe, seed, index)
    codes = product_quantize(emb, m, n_codes, id_col, codebook=codebook)
    code_rows = codes.select(
        id_col, F.posexplode("codes").alias("j", "code")
    ).select(id_col, F.col("j").cast("long").alias("j"), "code")
    cand_codes = cand.join(code_rows, cand["vec_id"] == code_rows[id_col]).select(
        "query_id", code_rows[id_col].alias("vec_id"), "j", "code"
    )
    if codebook is not None:
        cents = codebook.select(F.col("cid").alias("code"), "j", "cvec")
    else:
        cents = (
            emb.where(F.col(id_col) < n_codes)
            .select(
                F.col(id_col).cast("long").alias("code"),
                F.explode(subs).alias("s"),
            )
            .select("code", F.col("s.j").alias("j"), F.col("s.sv").alias("cvec"))
        )
    qs = queries.select(
        F.col(id_col).cast("long").alias("query_id"), F.explode(subs).alias("s")
    ).select("query_id", F.col("s.j").alias("j"), F.col("s.sv").alias("qv"))
    dj = F.aggregate(
        F.zip_with(
            "qv",
            "cvec",
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dtable = qs.join(cents, "j").select("query_id", "j", "code", dj.alias("dj"))
    adc = (
        cand_codes.join(F.broadcast(dtable), ["query_id", "j", "code"])
        .groupBy("query_id", "vec_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("j"), F.col("dj")))
            ).alias("a")
        )
        .select(
            "query_id",
            "vec_id",
            F.aggregate(
                F.transform("a", lambda x: x["dj"]),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("adc_dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("vec_id").asc()
    )
    if rerank is None:
        return (
            adc.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k)
            .select("query_id", "vec_id", "adc_dist")
        )
    # exact re-rank: ADC shortlists `rerank` candidates per query (its
    # honest job — cheap coarse scoring), then the float embeddings of
    # ONLY those shortlisted rows are read once for an exact cosine
    # top-k.  This is the production ANN shape end-to-end: on tight
    # clusters raw m=4 codes collapse to near-ties (recall@5 ≈ 0.15,
    # COVERAGE.md), while shortlist+rerank restores exact-quality
    # results at shortlist-size cost.  Shortlist rows per query stay
    # O(rerank); the embedding re-read is a vec_id semi-join, not a
    # second corpus scan.
    shortlist = (
        adc.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= int(rerank))
        .select("query_id", "vec_id")
    )
    qvec = queries.select(
        F.col(id_col).cast("long").alias("query_id"),
        F.col("embedding").alias("q_emb"),
    )
    rescored = (
        shortlist.join(
            emb.select(F.col(id_col).cast("long").alias("vec_id"), "embedding"),
            "vec_id",
        )
        .join(F.broadcast(qvec), "query_id")
        .select(
            "query_id",
            "vec_id",
            cosine_col(F.col("q_emb"), F.col("embedding")).alias("cosine"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        rescored.withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= k)
        .select(
            "query_id", "vec_id", "cosine", F.col("rn").cast("long").alias("rank")
        )
    )


# ----------------------------------------------------------------------
# Johnson-Lindenstrauss random projection (round 7)
# ----------------------------------------------------------------------


def jl_sign_matrix(k: int, d: int) -> list[list[float]]:
    """Deterministic ±1 sign matrix for the Achlioptas (2003) database-
    friendly JL projection.  Entries come from a murmur-style integer
    finalizer over (j, i) computed HERE in Python and injected into
    both engines as literals — the matrix is data-independent, so
    baking it into the plan sidesteps cross-engine RNG entirely (and a
    real deployment would broadcast a trained/shared matrix the same
    way)."""
    rows = []
    for j in range(k):
        row = []
        for i in range(d):
            x = (j * 1000003 + i + 12345) & 0xFFFFFFFF
            x ^= x >> 13
            x = (x * 0x5BD1E995) & 0xFFFFFFFF
            x ^= x >> 15
            row.append(1.0 if (x & 1) == 0 else -1.0)
        rows.append(row)
    return rows


def jl_project(emb: DataFrame, k: int = 16, id_col: str = "vec_id") -> DataFrame:
    """Johnson-Lindenstrauss random projection: d floats → k doubles
    via a ±1 sign matrix (Achlioptas'03 — the JL variant that needs no
    gaussian sampling and keeps every op exact-foldable).  Squared
    norms are preserved in expectation up to the factor k/d·? — for an
    unscaled ±1 matrix E‖Rx‖² = k·‖x‖², which ``jl_distortion``
    measures directly.

    Per-component fold: ``zip_with`` the (double-cast) embedding with
    the literal sign row, then ``aggregate`` in fixed index order —
    bit-exact, JVM-only, no shuffle (a pure map over the scan).
    Output columns: ``(vec_id, p00..p{k-1:02d})`` — scalar columns,
    never an array (driver-canonicalizer contract).
    """
    d = _dim_of(emb)
    signs = jl_sign_matrix(k, d)
    x = F.transform(F.col("embedding"), lambda v: v.cast("double"))

    def comp(j):
        row = F.array(*[F.lit(s) for s in signs[j]])
        return F.aggregate(
            F.zip_with(x, row, lambda a, s: a * s),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias(f"p{j:02d}")

    return emb.select(F.col(id_col), *[comp(j) for j in range(k)])


def jl_distortion(
    emb: DataFrame, k: int = 16, max_id: int = 30, id_col: str = "vec_id"
) -> DataFrame:
    """Measured JL distortion on the ``max_id``-vector prefix: for
    every pair a<b, the ratio ‖R(xa−xb)‖² / (k·‖xa−xb‖²) — 1.0 ± ε
    when the projection preserves geometry (the JL lemma's guarantee;
    ±1 matrices satisfy it per Achlioptas).  All folds index-ordered
    and per-ROW (no cross-row float aggregation, which would be
    order-dependent); the ratio is one double division, rounded to 9.

    The pair join is a small-prefix crossJoin by construction (both
    sides ≤ max_id rows) — the corpus never self-joins."""
    pr = jl_project(emb.where(F.col(id_col) < max_id), k, id_col)
    base = emb.where(F.col(id_col) < max_id).select(
        F.col(id_col),
        F.transform(F.col("embedding"), lambda v: v.cast("double")).alias("x"),
    )
    a = base.select(F.col(id_col).alias("qa"), F.col("x").alias("xa"))
    b = base.select(F.col(id_col).alias("qb"), F.col("x").alias("xb"))
    orig = (
        a.crossJoin(b)
        .where(F.col("qa") < F.col("qb"))
        .select(
            "qa",
            "qb",
            F.aggregate(
                F.zip_with("xa", "xb", lambda u, v: (u - v) * (u - v)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("d2"),
        )
    )
    pa = pr.select(
        F.col(id_col).alias("qa"),
        *[F.col(f"p{j:02d}").alias(f"a{j:02d}") for j in range(k)],
    )
    pb = pr.select(
        F.col(id_col).alias("qb"),
        *[F.col(f"p{j:02d}").alias(f"b{j:02d}") for j in range(k)],
    )
    pd2 = None
    for j in range(k):
        term = (F.col(f"a{j:02d}") - F.col(f"b{j:02d}")) * (
            F.col(f"a{j:02d}") - F.col(f"b{j:02d}")
        )
        pd2 = term if pd2 is None else pd2 + term
    return (
        orig.join(pa, "qa")
        .join(pb, "qb")
        .select(
            "qa",
            "qb",
            F.round(
                F.try_divide(pd2, F.lit(float(k)) * F.col("d2")), 9
            ).alias("ratio"),
        )
    )


def truncated_cosine_recall(
    emb: DataFrame,
    dims: int = 16,
    k: int = 5,
    n_queries: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Dimension-truncation recall — the Matryoshka-representation
    sizing question (Kusupati et al. NeurIPS'22): how much of the
    exact cosine top-k survives when the index keeps only the first
    ``dims`` of d dimensions?  Truncation is THE cheapest
    embedding-compression lever (4× storage/bandwidth at dims=16 of
    64), and this measures exactly what it costs in recall before
    anyone commits an index build to it.

    Both rankings are exact brute-force ``cosine_topk`` runs
    (broadcast query side, corpus streams, deterministic
    (cosine desc, vec_id) tie-break) over index-ordered folds, so the
    whole metric is oracle-exact.  Output: ``(query_id, n_overlap,
    recall)`` for every query, zero-overlap queries included.
    """
    queries = emb.where(F.col(id_col) < n_queries)
    full = cosine_topk(emb, queries, k).select("query_id", "vec_id")
    t = emb.select(id_col, F.slice("embedding", 1, dims).alias("embedding"))
    trunc = cosine_topk(
        t, t.where(F.col(id_col) < n_queries), k
    ).select("query_id", "vec_id")
    overlap = (
        full.join(trunc, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count("*").cast("long").alias("n_overlap"))
    )
    return (
        queries.select(F.col(id_col).alias("query_id"))
        .join(overlap, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
            (
                F.coalesce("n_overlap", F.lit(0)).cast("double") / F.lit(float(k))
            ).alias("recall"),
        )
    )


# ---------------------------------------------------------------------------
# Voronoi cell assignment, SemDeDup, and k-NN graph (r9b)
# ---------------------------------------------------------------------------


def assign_cells(
    emb: DataFrame,
    n_cells: int | None = None,
    seed: int = 42,
    id_col: str = "vec_id",
    max_cell_size: int | None = None,
) -> DataFrame:
    """Exact Voronoi-cell assignment carrying the vector along:
    ``(vec_id, embedding, cell)`` where ``cell`` is the vec_id of the
    nearest md5-sampled centroid (``ivf_centroids``; squared-euclidean
    argmin, ties → smallest centroid id — the same rule as
    ``nearest_centroid``, which stays the assignment-only twin).

    All-JVM: the ≤√n centroid rows broadcast, every corpus partition
    streams past them (crossJoin preserves locality, so the
    per-vector argmin collapses map-side and the groupBy shuffles n
    rows, not n·k).  The carried vector means downstream per-cell
    operators (SemDeDup, k-NN graph) need NO join back to the corpus
    — at 100 TB the assignment is one scan + one n-row shuffle keyed
    ready for per-cell work.

    ``max_cell_size`` (r10, VERDICT r9 #4): when set, cells larger
    than the cap are salted into ``ceil(size / cap)`` sub-cells via a
    pure int64 hash of the vector id, and the output gains a ``salt``
    column (0 when unsalted) that per-cell consumers add to their
    blocking key — bounding the per-cell quadratic at ``cap²``
    comparisons per sub-cell.  Pairs split across salts of one
    oversized cell are NOT compared: the standard blocked-dedup
    recall trade, same as the LSH band cap in ``dedup.py``.  The
    per-cell size table is ≤ ``n_cells`` rows (≈√n) — broadcast.
    """
    if n_cells is None:
        # mirror the oracle's GREATEST(4, FLOOR(SQRT(CAST(n AS DOUBLE))))
        # exactly — math.isqrt can differ from floor(sqrt(double)) for n
        # near perfect squares beyond ~2^52 (ADVICE r9)
        n_cells = max(4, int(math.floor(math.sqrt(float(emb.count())))))
    cents = F.broadcast(
        ivf_centroids(emb, n_cells, seed).select(
            F.col(id_col).alias("_cid"), F.col("embedding").alias("_cvec")
        )
    )
    diff2 = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("_cvec"),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = emb.select(id_col, "embedding").crossJoin(cents).select(
        id_col, "embedding", F.col("_cid"), diff2.alias("_d2")
    )
    best = scored.groupBy(id_col).agg(
        F.first("embedding").alias("embedding"),
        F.min(F.struct(F.col("_d2"), F.col("_cid").alias("cell"))).alias("_b"),
    )
    out = best.select(id_col, "embedding", F.col("_b.cell").alias("cell"))
    if max_cell_size is None:
        return out
    cap = int(max_cell_size)
    n_sub = (
        out.groupBy("cell")
        .agg(F.count("*").alias("_n"))
        .select("cell", F.expr(f"(_n + {cap} - 1) div {cap}").alias("_nsub"))
    )
    return out.join(F.broadcast(n_sub), "cell").select(
        id_col,
        "embedding",
        "cell",
        (
            F.pmod(
                F.col(id_col).cast("long") * F.lit(2654435761), F.lit(1 << 20)
            )
            % F.col("_nsub")
        )
        .cast("long")
        .alias("salt"),
    )


def semantic_dedup(
    emb: DataFrame,
    tau: float = 0.3,
    n_cells: int | None = None,
    seed: int = 42,
    id_col: str = "vec_id",
    max_cell_size: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): partition the
    corpus into Voronoi cells, form pairs ONLY within a cell, and mark
    a vector as a semantic duplicate when some same-cell vector with a
    SMALLER id has cosine ≥ ``tau`` — the deterministic
    keep-the-lowest-id reading of "keep one point per ε-ball".

    Output: ``(vec_id, cell, is_dup)`` for every corpus vector.  The
    100 TB shape is the SemDeDup paper's own argument: the only
    quadratic step is per-cell (≈√n·n total pair-cosines for √n
    balanced cells; ``max_cell_size`` enforces the worst-case bound
    by salting oversized cells — see ``assign_cells``), pairs never
    leave their cell's partition, and the verdict join back carries
    NO broadcast hint: at production tau/duplication rates the dup
    set is O(n), so the join must be free to shuffle — AQE broadcasts
    it when runtime stats say it is actually small (VERDICT r9 #4).
    On this synthetic corpus in-cell cosines top out near 0.47, so
    the registry query pins ``tau`` low (0.3) to exercise a real
    kept/dup mix — production embeddings would use 0.95+.

    Fully oracle-exact: assignment and cosine are the same left-folds
    DuckDB replays bit-for-bit (no numpy anywhere), so the ≥ tau
    verdicts carry no float-margin caveat.
    """
    # persist: the assignment feeds both self-join sides and the final
    # verdict join (3 consumers).  MEMORY_AND_DISK and LRU-evictable —
    # the deliberate trade for not recomputing the argmin scan 3×;
    # long multi-query sessions reclaim it via eviction (ADVICE r9).
    v = assign_cells(emb, n_cells, seed, id_col, max_cell_size).persist()
    a, b = v.alias("a"), v.alias("b")
    cos = cosine_col(F.col("a.embedding"), F.col("b.embedding"))
    same_block = F.col("a.cell") == F.col("b.cell")
    if max_cell_size is not None:
        same_block = same_block & (F.col("a.salt") == F.col("b.salt"))
    dup_ids = (
        a.join(
            b,
            same_block & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .where(cos >= F.lit(float(tau)))
        .select(F.col(f"b.{id_col}").alias(id_col))
        .distinct()
        .withColumn("_dup", F.lit(True))
    )
    # no broadcast hint: dup_ids is O(n) on dup-heavy corpora — let
    # AQE pick broadcast only when the runtime size warrants it
    return (
        v.join(dup_ids, id_col, "left")
        .select(
            id_col,
            "cell",
            F.coalesce("_dup", F.lit(False)).alias("is_dup"),
        )
    )


def knn_graph(
    emb: DataFrame,
    k: int = 3,
    n_cells: int | None = None,
    seed: int = 42,
    id_col: str = "vec_id",
    max_cell_size: int | None = None,
) -> DataFrame:
    """Approximate k-nearest-neighbor graph: exact cosine top-``k``
    WITHIN each Voronoi cell (``assign_cells``) — the cell-blocked
    kNN-graph construction that seeds graph clustering and
    connected-component semantic dedup at corpus scale.

    Output: ``(vec_id, nb_id, cosine, rank)``; vectors in singleton
    cells emit no rows, vectors in cells smaller than ``k+1`` emit
    what exists — recall is bounded by cell routing exactly as in IVF
    (probe>1 via ``ann_topk_ivf`` is the recall lever; this operator
    is the bulk all-vectors pass, one shuffle on cell, one window).
    Cosines are fold-ordered and returned at full precision — the
    DuckDB oracle reproduces them bit-for-bit.
    """
    # persist: without it the self-join recomputes the full argmin
    # assignment scan for each side (measured 2× build in the r9
    # emb_dup_clusters path — ADVICE r9); evictable MEMORY_AND_DISK
    v = assign_cells(emb, n_cells, seed, id_col, max_cell_size).persist()
    a, b = v.alias("a"), v.alias("b")
    same_block = F.col("a.cell") == F.col("b.cell")
    if max_cell_size is not None:
        same_block = same_block & (F.col("a.salt") == F.col("b.salt"))
    scored = a.join(
        b,
        same_block & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias(id_col),
        F.col(f"b.{id_col}").alias("nb_id"),
        cosine_col(F.col("a.embedding"), F.col("b.embedding")).alias("cosine"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("cosine").desc(), F.col("nb_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
        .select(id_col, "nb_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def kmeans_lloyd(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    seed: int = 42,
    scale_bits: int = 20,
    id_col: str = "vec_id",
) -> DataFrame:
    """Deterministic distributed k-means: ``iters`` Lloyd assignment
    steps (with a mean-recenter between each) from the md5-sampled
    initialization (``ivf_centroids``), returning the final
    ``(vec_id, cluster)`` assignment — cluster ids are the initial
    centroids' vec_ids, carried through recentering.

    Exactness is by construction, not tolerance: components quantize
    once to integers (``floor(x·2^scale_bits)`` — exact for |x| < 2³¹⁻ˢ
    since scaling by a power of two and floor are both exact IEEE
    ops), so recentered means are exact int64 sums divided ONCE in
    double — bit-identical in any engine and under any partitioning /
    summation order.  That makes an iterative, data-dependent
    algorithm fully hash-comparable against an unrolled SQL oracle —
    the same trick the WCC pipeline cannot use (its per-round state is
    float) and the reason this operator gets an exact oracle while
    ``wcc_communities`` needs a differential one.

    Scale shape per iteration: one broadcast of k centroid rows (the
    corpus NEVER shuffles for assignment — argmin collapses map-side,
    the groupBy moves n rows), one ``posexplode`` to (cell, dim)
    partial sums (map-side combine; shuffle ≤ k·d rows).  Clusters
    that lose all members vanish, as in any Lloyd implementation.
    """
    scale = float(1 << scale_bits)

    def _quantize(col: Column) -> Column:
        return F.transform(
            col, lambda x: F.floor(x.cast("double") * F.lit(scale)).cast("long")
        )

    q = emb.select(
        id_col, _quantize(F.col("embedding")).alias("qv")
    ).withColumn("dv", F.transform("qv", lambda v: v.cast("double")))
    cur = ivf_centroids(emb, k, seed).select(
        F.col(id_col).alias("_cid"),
        F.transform(
            _quantize(F.col("embedding")), lambda v: v.cast("double")
        ).alias("_cvec"),
    )

    def _assign(cents: DataFrame) -> DataFrame:
        d2 = F.aggregate(
            F.zip_with(
                F.col("dv"), F.col("_cvec"), lambda x, y: (x - y) * (x - y)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        scored = q.crossJoin(F.broadcast(cents)).select(
            id_col, "qv", F.col("_cid"), d2.alias("_d2")
        )
        return scored.groupBy(id_col).agg(
            F.first("qv").alias("qv"),
            F.min(F.struct(F.col("_d2"), F.col("_cid").alias("cell"))).alias(
                "_b"
            ),
        ).select(
            id_col,
            "qv",
            F.transform("qv", lambda v: v.cast("double")).alias("dv"),
            F.col("_b.cell").alias("cell"),
        )

    assigned = _assign(cur)
    for _ in range(int(iters) - 1):
        per_dim = (
            assigned.select("cell", F.posexplode("qv").alias("dim", "_qc"))
            .groupBy("cell", "dim")
            .agg(F.sum("_qc").alias("_s"), F.count("*").alias("_c"))
        )
        cur = (
            per_dim.select(
                "cell",
                "dim",
                (F.col("_s").cast("double") / F.col("_c").cast("double")).alias(
                    "_v"
                ),
            )
            .groupBy("cell")
            .agg(
                F.array_sort(F.collect_list(F.struct("dim", "_v"))).alias("_a")
            )
            .select(
                F.col("cell").alias("_cid"),
                F.transform("_a", lambda s: s["_v"]).alias("_cvec"),
            )
        )
        # eagerly land the k centroid rows: without this each Lloyd
        # iteration re-executes ALL prior assignment passes through
        # cur's lineage — quadratic in iters (ADVICE r9).  k rows, so
        # the cache is trivially small and the count is one tiny job.
        cur = cur.persist()
        cur.count()
        assigned = _assign(cur)
    return assigned.select(
        id_col, F.col("cell").cast("long").alias("cluster")
    )
