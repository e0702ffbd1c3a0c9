"""Deterministic synthetic fixtures for quality measurement.

The driver-provided test embeddings are near-isotropic — the known
worst case for angle-based pruning (every pair sits near 90°, so ANY
angular partition keeps most of the corpus as candidates).  Real
embedding corpora are clustered, and pruning claims are only honest if
measured on BOTH regimes (VERDICT r2 #4).  This module generates the
clustered regime: a fixed mixture of Gaussians on the unit sphere,
fully determined by ``seed`` (numpy RandomState's stream is frozen by
its compatibility policy, so recall/candidate-fraction numbers are
reproducible everywhere).

Used by ``tests/test_similarity_recall.py`` (floors) and ``bench.py``
(per-round reported numbers) — NOT a query input: gate queries read
only the driver-provided parquet tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def clustered_embeddings(
    spark: SparkSession,
    n: int = 2000,
    dim: int = 32,
    n_clusters: int = 20,
    sigma: float = 0.04,
    seed: int = 7,
) -> DataFrame:
    """``(vec_id long, embedding array<float>)`` drawn from a mixture
    of ``n_clusters`` Gaussians around unit-norm centers: in-cluster
    cosine ≈ 1/(1 + σ²·dim) ≈ 0.95 at the defaults, cross-cluster
    ≈ the centers' (near-orthogonal) cosine — the geometry where an
    ANN index is supposed to prune."""
    import numpy as np

    rng = np.random.RandomState(seed)
    centers = rng.normal(0.0, 1.0, (n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.randint(0, n_clusters, n)
    pts = centers[assign] + rng.normal(0.0, sigma, (n, dim))
    rows = [(int(i), [float(x) for x in pts[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")
