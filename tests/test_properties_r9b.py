"""Property/invariant tests for the round-9b operators.

Hypothesis drives adversarial small inputs; every property is checked
against a pure-Python brute-force model (no shared code with the
operators), so these pin semantics independently of the DuckDB
oracles — the third certification modality next to the gate sweeps
and the hand-fixture tests.
"""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from community_detection_flink_spark.operators.linkage import fuzzy_join_blocked
from community_detection_flink_spark.operators.similarity import (
    kmeans_lloyd,
    knn_graph,
    semantic_dedup,
)
from community_detection_flink_spark.operators.sketches import (
    histogram_quantiles,
    hll_portable,
)
from community_detection_flink_spark.operators.textual import char_entropy

FEW = settings(max_examples=6, deadline=None)


def _lev(a: str, b: str) -> int:
    """Reference Wagner–Fischer, written independently."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[len(b)]


NAMES = st.lists(
    st.text(alphabet="abcx ", min_size=0, max_size=8), min_size=2, max_size=8
)


@given(NAMES)
@FEW
def test_fuzzy_join_vs_bruteforce(spark, names):
    rows = [(i, n, "B", 1) for i, n in enumerate(names)]
    df = spark.createDataFrame(
        rows, "p_partkey LONG, p_name STRING, p_brand STRING, p_size INT"
    )
    out = fuzzy_join_blocked(df, "p_partkey", "p_name", ["p_brand", "p_size"], 2)
    got = {(r["key_a"], r["key_b"]): r["dist"] for r in out.collect()}
    want = {
        (i, j): _lev(names[i], names[j])
        for i in range(len(names))
        for j in range(i + 1, len(names))
        if _lev(names[i], names[j]) <= 2
    }
    assert got == want


VALUES = st.lists(
    st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    ),
    min_size=1,
    max_size=40,
)


@given(VALUES)
@FEW
def test_histogram_quantile_rank_property(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "v DOUBLE")
    rows = histogram_quantiles(df, "v").collect()
    assert {r["q"] for r in rows} == {0.5, 0.9, 0.99}
    lo, hi, n = min(vals), max(vals), len(vals)
    for r in rows:
        # the answered bin must contain the true quantile's rank:
        # cum count reaches q*n AND the previous bin didn't
        assert r["cum_n"] >= r["q"] * n
        # bin edges bracket the data range
        assert r["bin_lo"] >= lo - 1e-9 or hi == lo
        assert r["bin_hi"] <= hi + abs(hi - lo) + 1e-9
        # the true q-th order statistic lies in or before the bin
        idx = min(int(math.ceil(r["q"] * n)) - 1, n - 1)
        kth = sorted(vals)[max(idx, 0)]
        assert kth <= r["bin_hi"] + 1e-9 * max(1.0, abs(r["bin_hi"]))


KEYS = st.lists(st.integers(0, 2**61), min_size=0, max_size=200)


@given(KEYS)
@FEW
def test_hll_registers_vs_bruteforce(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys], "k LONG") if keys else (
        spark.createDataFrame([], "k LONG")
    )
    rows = hll_portable(df, "k").collect()
    # independent model of the hash/register/rank split
    P, A, B = 2147483647, 1103515245, 12345
    regs: dict[int, int] = {}
    for k in keys:
        h = ((k % P) * A + B) % P
        w = h // 64
        rank = 26 if w == 0 else 26 - w.bit_length()
        r = h % 64
        regs[r] = max(regs.get(r, 0), rank)
    got = {(r["register"], r["max_rank"]) for r in rows}
    assert got == set(regs.items())
    if rows:
        assert rows[0]["n_exact"] == len(set(keys))
        # the emitted estimate must equal the model's closed form
        s = sum(2.0 ** -m for m in regs.values()) + (64 - len(regs))
        assert rows[0]["hll_est"] == 0.709 * 64 * 64 / s


VECS = st.lists(
    st.tuples(
        st.floats(min_value=-8, max_value=8, allow_nan=False, width=32),
        st.floats(min_value=-8, max_value=8, allow_nan=False, width=32),
    ),
    min_size=2,
    max_size=12,
    unique=True,
)


def _cos(a, b):
    na = math.sqrt(a[0] ** 2 + a[1] ** 2)
    nb = math.sqrt(b[0] ** 2 + b[1] ** 2)
    if na == 0 or nb == 0:
        return None
    return (a[0] * b[0] + a[1] * b[1]) / (na * nb)


@given(VECS)
@FEW
def test_semantic_dedup_verdicts_vs_bruteforce(spark, vecs):
    vecs = [v for v in vecs if v != (0.0, 0.0)]
    if len(vecs) < 2:
        return
    df = spark.createDataFrame(
        [(i, list(v)) for i, v in enumerate(vecs)],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    tau = 0.9
    out = {r["vec_id"]: r["is_dup"] for r in
           semantic_dedup(df, tau=tau, n_cells=1).collect()}
    # single cell -> dup iff some smaller-id vector has cosine >= tau.
    # Recompute in float32-faithful python: cast to f32 first like the
    # ARRAY<FLOAT> column does.
    import numpy as np

    f32 = [tuple(np.array(v, dtype=np.float32).tolist()) for v in vecs]
    for j in range(len(vecs)):
        want = any(
            (c := _cos(f32[i], f32[j])) is not None and c >= tau - 1e-9
            for i in range(j)
        )
        softly = any(
            (c := _cos(f32[i], f32[j])) is not None and c >= tau + 1e-9
            for i in range(j)
        )
        # allow the +-1e-9 boundary band (float64 vs python rounding);
        # inside the band both verdicts are acceptable
        assert out[j] == want or out[j] == softly


@given(VECS)
@FEW
def test_knn_graph_neighbors_are_true_topk(spark, vecs):
    vecs = [v for v in vecs if v != (0.0, 0.0)]
    if len(vecs) < 2:
        return
    df = spark.createDataFrame(
        [(i, list(v)) for i, v in enumerate(vecs)],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    out = knn_graph(df, k=2, n_cells=1).collect()
    import numpy as np

    f32 = [tuple(np.array(v, dtype=np.float32).tolist()) for v in vecs]
    by_src: dict[int, list] = {}
    for r in out:
        by_src.setdefault(r["vec_id"], []).append(r)
    def cos_or(j, src, default=-2.0):
        c = _cos(f32[src], f32[j])
        return default if c is None else c

    for src, rows in by_src.items():
        rows.sort(key=lambda r: r["rank"])
        want = sorted(
            (j for j in range(len(vecs)) if j != src),
            key=lambda j: (-cos_or(j, src), j),
        )[: len(rows)]
        got = [r["nb_id"] for r in rows]
        # ties at identical cosine may reorder only within equal values
        for g, w in zip(got, want):
            if g != w:
                assert abs(cos_or(g, src) - cos_or(w, src)) < 1e-9


TEXTS = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=12), min_size=1, max_size=6
)


@given(TEXTS)
@FEW
def test_char_entropy_vs_bruteforce(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id LONG, text STRING")
    rows = {r["doc_id"]: r for r in char_entropy(df).collect()}
    from collections import Counter

    for i, t in enumerate(texts):
        if not t:
            assert i not in rows
            continue
        c = Counter(t)
        want = sum(
            round(-(k / len(t)) * math.log(k / len(t)), 9) for k in c.values()
        )
        assert abs(rows[i]["entropy"] - want) < 1e-8
        assert rows[i]["n_unique_chars"] == len(c)
        assert rows[i]["n_chars"] == len(t)


@given(st.integers(2, 9), VECS)
@FEW
def test_kmeans_clusters_partition_the_corpus(spark, k, vecs):
    vecs = [v for v in vecs if v != (0.0, 0.0)]
    if len(vecs) < 2:
        return
    df = spark.createDataFrame(
        [(i, list(v)) for i, v in enumerate(vecs)],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    out = kmeans_lloyd(df, k=min(k, len(vecs)), iters=2).collect()
    # total function: every vector assigned exactly once, cluster ids
    # drawn from the corpus's own vec_ids (sampled centroids)
    assert sorted(r["vec_id"] for r in out) == list(range(len(vecs)))
    ids = {r["vec_id"] for r in out}
    assert all(r["cluster"] in ids for r in out)
