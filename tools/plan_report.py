"""Generate PLANS.md — physical-plan audit of representative queries.

For each audited query: parquet scans (pushed filters + column subset),
join strategies, Python-eval nodes (must be empty outside the declared
multimodal/ANN Arrow operators), and whole-stage-codegen span count.
The same properties are ASSERTED in tests/test_plans.py; this report
makes them reviewable without running Spark.

Usage: PYTHONPATH=/root/repo python tools/plan_report.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from community_detection_flink_spark import get_spark
from community_detection_flink_spark.plans.explain import (
    executed_codegen_span_count,
    executed_exchange_count,
    join_strategies,
    partition_filters,
    python_eval_nodes,
    scan_summary,
)

import __spark_entry__ as entry_mod

AUDIT = [
    ("rel_nation_revenue", "multi-join star query: dims must broadcast, filters push to scan"),
    ("rel_pricing_summary", "scan-heavy agg: column pruning + filter pushdown"),
    ("rel_percentiles", "exact percentile agg"),
    ("rel_skewed_agg", "salted two-phase aggregation"),
    ("g_triangle_counts", "degree-oriented triangle enumeration"),
    ("g_adjacency", "adjacency build + posexplode"),
    ("doc_minhash_lsh_pairs", "MinHash LSH banding (must stay JVM-side)"),
    ("doc_jaccard_pairs", "prefix-filtered exact Jaccard"),
    ("doc_pack_chunks", "sequence packing windows"),
    ("emb_cosine_topk", "broadcast query side, corpus streams"),
    ("emb_ivf_ann", "IVF over the PERSISTED index: corpus side is a bucketed-table scan, the only Arrow eval is the broadcast probe side"),
    ("mm_decode_features", "the ONE intentional Python operator (Arrow mapInPandas)"),
    ("ev_asof_prior_purchase", "merge as-of join (no range explosion)"),
    ("doc_bm25", "BM25: query-term filter BEFORE the tf shuffle, broadcast df/avgdl"),
    ("doc_tfidf", "TF-IDF: term-keyed tf⋈df join reuses the aggregate exchange"),
    ("g_pagerank", "fixed-round PageRank: cached hash(src) edges, one shuffle per round"),
    ("ev_retention", "retention cohorts: user-keyed agg + distinct, no full-history window"),
    ("rel_scd2", "SCD2: two windows over ONE key-sorted shuffle"),
    ("emb_centroid_assign", "nearest-centroid: broadcast centroids, corpus never shuffles"),
    ("ev_partition_pruned", "lake layout: event_type filter prunes partition DIRECTORIES"),
    ("rel_bucketed_join", "co-bucketed join + aggregate: ZERO shuffle Exchange"),
    ("rel_q3_shipping_priority", "TPC-H Q3 analog: dims broadcast, both date filters pushed"),
    ("rel_snapshot_diff", "snapshot diff: one full-outer join, both snapshot filters pushed"),
    ("rel_csv_roundtrip", "CSV source scan: header read with explicit schema, one agg exchange"),
    ("rel_grouping_sets", "GROUPING SETS via the SQL surface: one Expand + one agg exchange"),
    ("doc_pii_scrub", "regex scrub: pure JVM regexp ops, zero Python, zero shuffle"),
    ("rel_q5_local_supplier", "TPC-H Q5 analog: 6-way star, nation/region broadcast, date filter pushed"),
    ("rel_q10_returned_items", "TPC-H Q10 analog: returnflag filter pushed to scan, broadcast nation"),
    ("g_link_scores", "link-prediction scores: wedge join closed against edges pre-aggregate"),
    ("ev_transitions", "transition matrix: one keyed window shuffle + one tiny aggregate"),
    ("doc_repeated_passages", "repeated passages: JVM window hashing, only (hash, doc_id) shuffles"),
    ("emb_pq_ann", "PQ ADC search: broadcast distance table, zero Python, corpus embeddings read once"),
    ("doc_unigram_nll", "unigram NLL: vocab join unhinted (AQE decides), one token shuffle"),
    ("ev_rolling_features", "trailing RANGE window: one user-keyed shuffle, no self-join"),
    ("rel_q6_forecast_revenue", "TPC-H Q6: all four predicates in PushedFilters"),
    ("rel_q8_market_share", "TPC-H Q8: widest star — dims broadcast, date+type filters pushed, two fact shuffles"),
    ("g_centrality_approx", "landmark centrality: shared BFS table, vId-co-partitioned self-join, broadcast k² pairs"),
    ("rel_q21_waiting_suppliers", "TPC-H Q21: lineitem self-joined 3× on orderkey — AQE reuses the exchange, semi/anti joins stay JVM"),
    ("doc_containment", "asymmetric containment dedup: small-side shingle set broadcast, overlap counted pre-join-explosion"),
    ("doc_winnowing", "winnowing fingerprints: per-doc window minimum entirely in one doc-keyed shuffle"),
    ("ev_cep_strict", "strict-contiguity CEP: one user-keyed sort shuffle, pattern match via window lead()s, no self-join"),
    # round 7
    ("rel_q2_min_cost_supplier", "TPC-H Q2: synthesized partsupp (no-shuffle explode of part), supplier/nation/region + part list broadcast, min-per-part joined back"),
    ("rel_q9_product_profit", "TPC-H Q9: composite-key lineitem⋈partsupp left to AQE, dims broadcast, DECIMAL profit fold"),
    ("rel_q16_supplier_part_counts", "TPC-H Q16: broadcast anti-join exclusion, single grouping-key shuffle for distinct counts"),
    ("doc_cdc_chunks", "content-defined chunking: all-JVM higher-order rolling hash in the scan stage, zero Python, zero shuffle"),
    ("doc_cdc_chunk_dedup", "chunk-level dedup: ONE chunk_hash shuffle with map-side partial agg"),
    ("emb_jl_projection", "JL projection: literal sign matrix, pure map over the scan — zero shuffle, zero Python"),
    ("ev_late_audit", "late-data audit: global running-max analytic (deliberate total-order sort; per-ingest-batch at scale) + one agg"),
    ("mm_frame_sample", "P6 frame-stream decode: Arrow mapInPandas in the scan stage, frame rows only downstream"),
    ("doc_winnow_pairs", "winnowing-overlap pairs: fingerprint-bucket join only, boilerplate fingerprints dropped pre-join"),
    ("emb_truncation_recall", "truncation recall: two broadcast-query brute-force rankings, corpus never self-joins"),
    ("ev_resample_ffill", "daily resample + ffill: per-user span explode + ONE user-keyed window, no event self-join"),
    ("ev_attribution", "last-touch attribution: one analytic window over the event scan, no event x event join"),
    # round 8
    ("mm_gif_frames", "GIF LZW decode: Arrow mapInPandas in the scan stage (blob never shuffles), frame rows only downstream"),
    ("ev_watermark_sizing", "watermark sizing curve: whole delay grid from ONE running-max sort + one aggregate"),
    ("doc_sliding_chunks", "sliding word-window chunking: JVM higher-order fns, zero shuffle, text never leaves the scan stage"),
    ("ev_heartbeat_gaps", "heartbeat-gap audit: one user-keyed window + one aggregate, no self-join"),
    ("rel_bloom_prune", "Bloom runtime filter: 1-row bitmap broadcasts to the fact scan; fact side never shuffles before the final 1-row aggregate"),
    ("doc_phrase_search", "positional phrase search: one pruned (doc_id, text) pass per query term filtered to that term's postings, then (doc_id, start) joins; landed term-bucketed postings make the probe scan-free"),
    ("ev_ohlc_bars", "OHLC bars: ONE keyed hash aggregate with map-side combine, struct-extremum open/close"),
    ("emb_dup_threshold_curve", "threshold grid from ONE blocked cosine pair pass: conditional sums per cutoff, 1-row aggregate + stack unpivot"),
    ("rel_zorder_prune", "Z-order vs linear pruning: pure div/mod interleave in the scan stage, one aggregate, zero joins"),
    ("rel_merge_upsert", "MERGE upsert: ONE broadcast left join of target vs the non-insert changes + insert union — the copy-on-write MERGE arithmetic"),
    # round 9
    ("ev_cms_heavy_hitters", "portable Count-Min audit: one corpus pass builds the ≤512-counter sketch (map-side combine), top-20 probe joins it broadcast"),
    ("doc_mixture_sample", "mixture sampling: per-source quotas broadcast onto the corpus scan, membership a pure int64 map — corpus never shuffles"),
    # round 9b
    ("emb_semantic_dedup", "SemDeDup: ≤√n centroids broadcast (corpus never shuffles for assignment), pairs form ONLY within a cell, dup-id verdict set broadcast back"),
    ("emb_knn_graph", "cell-blocked kNN graph: one cell-keyed self-join + one per-vector window, centroids broadcast"),
    ("ev_hll_distinct", "portable HLL: register aggregate collapses map-side (≤64 rows shuffle), audit row assembled by broadcast crossJoins"),
    ("ev_daily_hll_users", "per-day HLL: ONE (day, register) aggregate builds every day's registers, per-day fold + audit join"),
    ("rel_fuzzy_part_match", "blocked fuzzy linkage: self-join keyed on (brand, size), length band prunes before the levenshtein DP, no cartesian"),
    ("doc_char_entropy", "char entropy: one char explode feeding one (doc, char) aggregate — doc length rides along, zero joins"),
    ("emb_kmeans_refine", "deterministic Lloyd k-means: centroids broadcast every pass (corpus never shuffles for assignment), recenter is a ≤k·d-row partial-sum shuffle"),
    ("ev_histogram_quantiles", "mergeable histogram quantiles: raw scan feeds ONE bin aggregate; bounds + quantile ranks all broadcast over ≤256-row state"),
    ("emb_dup_clusters", "thresholded kNN edges transitively closed by star-contraction CC: cell-keyed joins only, no cartesian, rounds parquet-materialized"),
    ("doc_source_caps", "per-source frequency capping: one source-keyed shuffle feeding one rank window, zero joins"),
    ("doc_minhash_store_pairs", "LSH pairs from the persisted bucketed signature store: the (band,bucket) aggregate reads pre-bucketed files — at most one exchange (the final pair aggregate)"),
    # round 12
    ("doc_source_caps_skew", "exact bucketed rank: per-(source, bucket) counts prefix-sum into offsets (window over ≤B rows/source), offset + in-bucket row_number — the mega-source spreads over B partitions"),
    ("mm_video_frame_decode", "MJPEG-in-MP4 frame decode: two chained Arrow mapInPandas in the scan stage (mux, then demux+JPEG decode), slim stat rows only downstream — blobs never shuffle"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="plan-report", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()

    out = [
        "# PLANS — physical-plan audit (generated by tools/plan_report.py)",
        "",
        f"Input: `{sf_dir}`.  Asserted programmatically in `tests/test_plans.py`;",
        "regenerate with `PYTHONPATH=/root/repo python tools/plan_report.py`.",
        "",
    ]
    for name, why in AUDIT:
        df = queries[name](spark, sf_dir)
        scans = scan_summary(df)
        joins = join_strategies(df)
        py = python_eval_nodes(df)
        spans = executed_codegen_span_count(df)
        pf = [f for f in partition_filters(df) if f]
        # distinct executed exchanges, counted by walking the executed
        # SparkPlan OBJECT tree (plans/explain.py): cache builds count
        # once, AQE's never-executed "== Initial Plan ==" sections are
        # never visited.  Earlier text-regex versions overstated —
        # occurrence-count reprinted cached lineage per read, and the
        # plan_id variant double-counted every shuffle because AQE
        # re-planning gives final-plan exchanges NEW plan_ids while the
        # Initial section keeps the old ones (ADVICE r5).
        xc = executed_exchange_count(df)
        out.append(f"## {name}")
        out.append("")
        out.append(f"*{why}*")
        out.append("")
        for i, s in enumerate(scans):
            cols = ", ".join(s["read_columns"]) or "(none)"
            pushed = s["pushed_filters"] or "(none)"
            out.append(f"- scan {i}: columns `[{cols}]`, pushed filters `{pushed}`")
        if pf:
            out.append(f"- partition filters (directory pruning): `{'; '.join(pf)}`")
        out.append(f"- joins: {', '.join(joins) or '(none)'}")
        out.append(f"- shuffle exchanges: {xc}")
        out.append(f"- python-eval nodes: {', '.join(py) or 'NONE (fully JVM)'}")
        out.append(f"- whole-stage-codegen spans (post-AQE executed plan): {spans}")
        out.append("")
    text = "\n".join(out) + "\n"
    with open("/root/repo/PLANS.md", "w") as f:
        f.write(text)
    print(text)


if __name__ == "__main__":
    main()
