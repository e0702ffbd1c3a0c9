"""Similarity search over embedding columns (SURVEY.md §2.10).

Brute-force cosine top-k as the exact baseline, and a
random-hyperplane LSH bucketing as the 100 TB path (candidates from
same-bucket join, exact re-rank within buckets).

All vector math is JVM-side column expressions (``zip_with`` +
``aggregate``) — no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
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


def random_hyperplane_buckets(
    emb: DataFrame, n_planes: int = 8, seed: int = 42
) -> DataFrame:
    """LSH bucketing by sign pattern against fixed pseudo-random planes.

    Plane components are derived deterministically from (seed, plane,
    dim) via a sin-hash — reproducible across runs without shipping a
    plane matrix.  Output: ``vec_id, bucket`` (long in [0, 2^n_planes)).

    The ANN query path: hash queries with the same planes, join on
    bucket (plus neighboring buckets for recall), exact re-rank with
    ``cosine_topk`` inside the candidate set.  Bucket join keys spread
    the corpus shuffle uniformly when embeddings are centered.
    """
    planes = F.sequence(F.lit(0), F.lit(n_planes - 1))
    dims = F.transform(
        F.col("embedding"), lambda x, i: F.struct(x.alias("v"), i.alias("i"))
    )
    bucket = F.aggregate(
        planes,
        F.lit(0).cast("long"),
        lambda acc, p: acc * 2
        + F.when(
            F.aggregate(
                dims,
                F.lit(0.0),
                lambda a, d: a
                + d["v"].cast("double")
                * F.sin((p + 1).cast("double") * 12.9898 + d["i"].cast("double") * 78.233 + F.lit(float(seed))),
            )
            > 0,
            1,
        ).otherwise(0),
    )
    return emb.select("vec_id", bucket.alias("bucket"))


def ann_topk_lsh(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: same-bucket candidates, exact re-rank.

    Recall < 1 by construction; the bench pairs it with ``cosine_topk``
    to report recall on the test corpus.
    """
    cb = random_hyperplane_buckets(emb, n_planes, seed)
    qb = random_hyperplane_buckets(queries, n_planes, seed).withColumnsRenamed(
        {"vec_id": "query_id"}
    )
    q = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    cand = (
        cb.join(F.broadcast(qb), "bucket")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
    )
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
