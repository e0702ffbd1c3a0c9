"""Property/invariant tests (SURVEY.md §5.4) over random small graphs.

Hypothesis drives the inputs; each property is checked against a pure
Python brute-force model, so these pin the ENGINE's semantics (the
reference has no tests to port — ``SURVEY.md §5``).  Spark examples are
kept tiny and few: the point is edge-case coverage (self-loops,
duplicates, reversed duplicates, empty graphs), not scale.
"""

from __future__ import annotations

from itertools import combinations

import pytest
from hypothesis import given, settings, strategies as st

from community_detection_flink_spark.operators.dedup import exact_dedup
from community_detection_flink_spark.operators.triangles import triangle_counts
from community_detection_flink_spark.sources.edges import symmetrize_edges

EDGE_LISTS = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=0, max_size=25
)

FEW = settings(max_examples=8, deadline=None)


def _undirected(pairs):
    return {frozenset(p) for p in pairs if p[0] != p[1]}


@given(EDGE_LISTS)
@FEW
def test_symmetrize_invariants(spark, pairs):
    """Doubled-edge canon: no self-loops, symmetric, no duplicates,
    exactly 2 rows per undirected edge of the input."""
    df = spark.createDataFrame(pairs, "src LONG, dst LONG") if pairs else (
        spark.createDataFrame([], "src LONG, dst LONG")
    )
    rows = [(r["src"], r["dst"]) for r in symmetrize_edges(df).collect()]
    assert all(s != d for s, d in rows)
    assert len(rows) == len(set(rows))
    assert {(d, s) for s, d in rows} == set(rows)
    assert len(rows) == 2 * len(_undirected(pairs))


@given(EDGE_LISTS)
@FEW
def test_triangle_counts_vs_bruteforce(spark, pairs):
    """Per-vertex t matches the O(V^3) model; Σt = 3 × #triangles."""
    und = _undirected(pairs)
    if not und:
        return
    adj = {}
    for e in und:
        a, b = tuple(e)
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expect = {v: 0 for v in adj}
    n_tri = 0
    for u, v, w in combinations(sorted(adj), 3):
        if v in adj[u] and w in adj[u] and w in adj[v]:
            n_tri += 1
            for x in (u, v, w):
                expect[x] += 1
    edges = symmetrize_edges(
        spark.createDataFrame([tuple(e) for e in und], "src LONG, dst LONG")
    )
    got = {r["vId"]: r["t"] for r in triangle_counts(edges).collect()}
    assert got == expect
    assert sum(got.values()) == 3 * n_tri


@given(
    st.lists(st.sampled_from(["alpha", "beta", "gamma", ""]), min_size=1, max_size=12)
)
@FEW
def test_exact_dedup_partitions_corpus(spark, texts):
    """Duplicate groups partition the corpus; representative = min id."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    rows = exact_dedup(docs).collect()
    assert sum(r["n_copies"] for r in rows) == len(texts)
    by_text = {}
    for i, t in enumerate(texts):
        by_text.setdefault(t, []).append(i)
    assert {r["representative"] for r in rows} == {min(v) for v in by_text.values()}
    assert sorted(r["n_copies"] for r in rows) == sorted(
        len(v) for v in by_text.values()
    )


@pytest.mark.parametrize("n_hashes", [4, 8])
def test_minhash_identical_texts_share_signature(spark, n_hashes):
    from community_detection_flink_spark.operators.dedup import minhash_signatures

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "the quick brown fox jumps"),
         (3, "a completely different text here")],
        "doc_id LONG, text STRING",
    )
    sigs = {r["doc_id"]: tuple(r["sig"]) for r in
            minhash_signatures(docs, num_hashes=n_hashes).collect()}
    assert sigs[1] == sigs[2]
    assert len(sigs[1]) == n_hashes
    assert sigs[1] != sigs[3]


# ---------------------------------------------------------------------------
# sequence packing invariants (pack_chunks)

PACK_DOCS = st.lists(
    st.tuples(
        st.integers(0, 30),                      # doc length in tokens
        st.sampled_from(["s1", "s2"]),           # shard
    ),
    min_size=0,
    max_size=12,
)


@FEW
@given(PACK_DOCS, st.integers(1, 7))
def test_pack_chunks_tiles_each_shard(spark, docs, capacity):
    """Per shard, the chunk spans tile [0, total_tokens) exactly: no
    gaps, no overlaps, and each doc's spans sum to its token count."""
    from community_detection_flink_spark.operators.textual import pack_chunks

    rows = [
        (i, " ".join(["w"] * n) if n else "", shard)
        for i, (n, shard) in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING, source STRING")
    out = pack_chunks(df, capacity=capacity, shard_col="source").collect()

    per_doc = {}
    per_shard = {}
    for r in out:
        assert 0 <= r.tok_start < r.tok_end, r
        assert r.chunk_id == r.tok_start // capacity
        assert r.tok_end <= (r.chunk_id + 1) * capacity
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + (r.tok_end - r.tok_start)
        per_shard.setdefault(r.shard, []).append((r.tok_start, r.tok_end))
    for i, (n, _) in enumerate(docs):
        assert per_doc.get(i, 0) == n
    for spans in per_shard.values():
        spans.sort()
        pos = 0
        for s, t in spans:
            assert s == pos, spans  # contiguous, gap-free
            pos = t


@FEW
@given(
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=0, max_size=40),
    st.integers(1, 5),
)
def test_salted_agg_matches_model(spark, rows, n_salt):
    """salted_agg == brute-force per-key aggregation for any input."""
    from community_detection_flink_spark.plans.skew import salted_agg

    df = spark.createDataFrame(
        [(k, float(v)) for k, v in rows] or [(0, 0.0)], "k LONG, x DOUBLE"
    )
    if not rows:
        df = df.limit(0)
    got = {
        r.k: (r.n, r.s, r.mn, r.mx)
        for r in salted_agg(
            df, ["k"], {"n": ("x", "count"), "s": ("x", "sum"),
                        "mn": ("x", "min"), "mx": ("x", "max")},
            n_salt=n_salt,
        ).collect()
    }
    model = {}
    for k, v in rows:
        model.setdefault(k, []).append(float(v))
    want = {
        k: (len(vs), sum(vs), min(vs), max(vs)) for k, vs in model.items()
    }
    assert set(got) == set(want)
    for k in want:
        n, s, mn, mx = got[k]
        wn, ws, wmn, wmx = want[k]
        assert (n, mn, mx) == (wn, wmn, wmx)
        assert abs(s - ws) < 1e-9


@given(EDGE_LISTS)
@FEW
def test_link_scores_vs_bruteforce(spark, pairs):
    """cn/jaccard/pa per existing edge match the set-algebra model."""
    from community_detection_flink_spark.operators.graph_metrics import link_scores

    und = _undirected(pairs)
    if not und:
        return
    adj: dict[int, set[int]] = {}
    for e in und:
        a, b = tuple(e)
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    df = spark.createDataFrame(sorted((min(e), max(e)) for e in und), "src LONG, dst LONG")
    got = {(r.src, r.dst): r for r in link_scores(symmetrize_edges(df)).collect()}
    assert set(got) == {(min(e), max(e)) for e in und}
    for (u, v), r in got.items():
        cn = len(adj[u] & adj[v])
        union = len(adj[u] | adj[v])
        assert r.cn == cn
        assert r.pa == len(adj[u]) * len(adj[v])
        assert abs(r.jaccard - cn / union) < 1e-12


@given(EDGE_LISTS)
@FEW
def test_label_propagation_property(spark, pairs):
    """Synchronous LPA with deterministic ties matches the model on
    arbitrary random graphs (not just the hand fixture)."""
    from community_detection_flink_spark.operators.graph_metrics import (
        label_propagation,
    )
    from tests.test_round4_extras import _lpa_model

    und = _undirected(pairs)
    if not und:
        return
    plist = sorted((min(e), max(e)) for e in und)
    df = spark.createDataFrame(plist, "src LONG, dst LONG")
    got = {
        r.vId: r.label
        for r in label_propagation(symmetrize_edges(df), rounds=3).collect()
    }
    assert got == _lpa_model(plist, rounds=3)


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.sampled_from(["a", "b", "c"])),
        min_size=1,
        max_size=20,
    )
)
@FEW
def test_transition_probabilities_sum_to_one(spark, evts):
    """Per-from_type conditional probabilities always sum to 1."""
    import datetime

    from community_detection_flink_spark.operators.temporal import (
        transition_counts,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, u, t, t0 + datetime.timedelta(minutes=i))
        for i, (u, t) in enumerate(evts)
    ]
    df = spark.createDataFrame(
        rows, "event_id LONG, user_id LONG, event_type STRING, ts TIMESTAMP"
    )
    out = transition_counts(df).collect()
    sums: dict[str, float] = {}
    for r in out:
        sums[r.from_type] = sums.get(r.from_type, 0.0) + r.p
    for s in sums.values():
        assert abs(s - 1.0) < 1e-9


WORDS = st.lists(
    st.sampled_from(["a", "b", "c", "key", "agg"]), min_size=0, max_size=20
)


@given(st.lists(WORDS, min_size=1, max_size=6), st.integers(1, 3))
@FEW
def test_phrase_search_vs_bruteforce(spark, docs_words, plen):
    """Occurrence counts and first positions match a pure-Python
    sliding-window scan for random docs and a random phrase."""
    from community_detection_flink_spark.operators.search import phrase_search

    phrase_words = ["key", "agg", "b"][:plen]
    phrase = " ".join(phrase_words)
    rows = [(i, " ".join(w)) for i, w in enumerate(docs_words)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in phrase_search(df, phrase).collect()
    }
    want = {}
    for i, w in enumerate(docs_words):
        # split(' ') on a joined-by-' ' string: empty word list round-
        # trips to [''] — mirror the engine's tokenization exactly
        toks = " ".join(w).split(" ")
        hits = [
            j
            for j in range(len(toks) - plen + 1)
            if toks[j : j + plen] == phrase_words
        ]
        if hits:
            want[i] = (len(hits), hits[0])
    assert got == want


@given(
    st.sets(st.integers(0, 50), min_size=0, max_size=10),
    st.lists(st.integers(0, 60), min_size=0, max_size=30),
)
@FEW
def test_bloom_prune_vs_model(spark, dim_keys, fact_keys):
    """Accounting row equals the pure-Python filter replay for random
    key sets; members always pass."""
    from community_detection_flink_spark.operators.sketches import (
        _BLOOM_HASHES,
        _BLOOM_PRIME,
        bloom_semi_prune,
    )

    def pos(k):
        return {((k * a + b) % _BLOOM_PRIME) % 256 for a, b in _BLOOM_HASHES}

    dim = spark.createDataFrame(
        [(k,) for k in sorted(dim_keys)], "s_suppkey LONG"
    )
    fact = spark.createDataFrame([(k,) for k in fact_keys], "l_suppkey LONG")
    row = bloom_semi_prune(fact, dim, "l_suppkey", "s_suppkey", m_bits=256).first()
    bits = set().union(*[pos(k) for k in dim_keys]) if dim_keys else set()
    n_pass = sum(1 for k in fact_keys if pos(k) <= bits)
    assert row.n_rows == len(fact_keys)
    assert row.n_pass == n_pass
    assert row.n_member_rows == sum(1 for k in fact_keys if k in dim_keys)
    assert row.n_false_pos == sum(
        1 for k in fact_keys if pos(k) <= bits and k not in dim_keys
    )
    assert row.n_bits_set == len(bits)


@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 99), st.integers(0, 400)),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[1],
    )
)
@FEW
def test_ohlc_vs_model(spark, evts):
    """open/high/low/close per (type, hour bucket) match a pure-Python
    model with (ts, event_id) ordering."""
    import datetime

    from community_detection_flink_spark.operators.temporal import ohlc_bars

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (
            eid,
            t0 + datetime.timedelta(minutes=m),
            0,
            f"t{ty}",
            float(eid % 7),
            "{}",
        )
        for ty, eid, m in evts
    ]
    df = spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING,"
        " value DOUBLE, props STRING",
    )
    got = {
        (r.event_type, r.bar_ts): (r.n_events, r.open, r.high, r.low, r.close)
        for r in ohlc_bars(df).collect()
    }
    model = {}
    for eid, ts, _, ty, v, _p in rows:
        bar = int(ts.replace(tzinfo=datetime.timezone.utc).timestamp()) // 3600 * 3600
        model.setdefault((ty, bar), []).append((ts, eid, v))
    want = {}
    for k, items in model.items():
        items.sort()
        vals = [v for _, _, v in items]
        want[k] = (len(items), items[0][2], max(vals), min(vals), items[-1][2])
    assert got == want


@given(st.lists(st.tuples(st.integers(0, 40), st.integers(0, 2)), min_size=0, max_size=25))
@FEW
def test_merge_upsert_vs_model(spark, change_spec):
    """Random I/U/D change sets over a fixed 20-row target match a
    dict-replay of the MERGE contract."""
    from community_detection_flink_spark.operators.merge import merge_upsert

    target_rows = [(k, float(k * 10)) for k in range(20)]
    target = spark.createDataFrame(target_rows, "k LONG, v DOUBLE")
    seen = set()
    changes = []
    for key, opi in change_spec:
        op = "IUD"[opi]
        if key in seen:
            continue
        if op == "I" and key < 20:
            continue  # MERGE precondition: inserts must be new keys
        if op in ("U", "D") and key >= 20:
            continue  # updates/deletes must match existing keys
        seen.add(key)
        changes.append((key, float(key + 1000), op))
    cdf = spark.createDataFrame(changes or [], "k LONG, v DOUBLE, op STRING")
    got = {
        r.k: (r.v, r.action)
        for r in merge_upsert(target, cdf, "k", ["v"]).collect()
    }
    want = {k: (v, "K") for k, v in target_rows}
    for key, payload, op in changes:
        if op == "D":
            want.pop(key, None)
        elif op == "U":
            want[key] = (payload, "U")
        else:
            want[key] = (payload, "I")
    assert got == want
