"""Physical-plan regression tests: the scale properties SCALING.md claims
must stay true as queries evolve (pushdown, pruning, broadcast choice,
top-k without global sort).
"""

import pytest

from kafka_stream_spark.registry import load_all

SPECS = load_all()


def plan_of(spark, sf_dir, name: str) -> str:
    df = SPECS[name].build(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_pushdown_and_pruning(spark, sf_dir):
    p = plan_of(spark, sf_dir, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    # column pruning: only the needed 8 columns reach the scan
    assert "l_orderkey" not in p.split("ReadSchema")[1].splitlines()[0]
    assert "HashAggregate" in p  # partial agg before exchange


def test_dim_joins_are_broadcast(spark, sf_dir):
    for name in ("brand_agg_broadcast", "enrich_join_events"):
        p = plan_of(spark, sf_dir, name)
        assert "BroadcastHashJoin" in p, name
        assert "SortMergeJoin" not in p, name


def test_topk_avoids_global_sort(spark, sf_dir):
    p = plan_of(spark, sf_dir, "topk_orders")
    assert "TakeOrderedAndProject" in p


def test_interval_join_is_equi_keyed(spark, sf_dir):
    # the time range must be a residual on an equi-join, not a nested loop
    p = plan_of(spark, sf_dir, "interval_join_events")
    assert "BroadcastNestedLoop" not in p
    assert ("SortMergeJoin" in p) or ("BroadcastHashJoin" in p) or ("ShuffledHashJoin" in p)


def test_ann_corpus_not_shuffled(spark, sf_dir):
    # queries broadcast; corpus side must not exchange before scoring
    p = plan_of(spark, sf_dir, "ann_cosine_topk")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p


def test_semi_anti_planned_natively(spark, sf_dir):
    p = plan_of(spark, sf_dir, "anti_join_customers")
    assert "LeftAnti" in p
    p = plan_of(spark, sf_dir, "semi_join_customers")
    assert "LeftSemi" in p


def test_q19_disjunction_pushed_to_both_scans(spark, sf_dir):
    # the OR-of-ANDs legs must reach BOTH parquet scans as data filters
    p = plan_of(spark, sf_dir, "q19_discounted_revenue")
    part_scan = [l for l in p.splitlines() if "part.parquet" in l and "FileScan" in l]
    li_scan = [l for l in p.splitlines() if "lineitem" in l and "FileScan" in l]
    assert part_scan and "p_brand" in part_scan[0]
    assert li_scan and "l_quantity" in li_scan[0]
    assert "BroadcastHashJoin" in p  # filtered part dim stays broadcast


def test_q9_filtered_part_broadcast(spark, sf_dir):
    # the name-filtered part dim must broadcast; nation always broadcasts
    p = plan_of(spark, sf_dir, "q9_product_profit")
    assert p.count("BroadcastHashJoin") >= 2
    # the p_name LIKE filter is pushed into the part scan
    part_scan = [l for l in p.splitlines() if "part.parquet" in l and "FileScan" in l]
    assert part_scan and ("widget" in part_scan[0] or "StringContains" in part_scan[0])


def test_q13_left_join_preserves_all_customers(spark, sf_dir):
    # outer join must not degrade to inner (the priority filter sits on the
    # orders side BEFORE the join, not as a post-join filter)
    p = plan_of(spark, sf_dir, "q13_customer_distribution")
    assert "LeftOuter" in p
    order_scan = [l for l in p.splitlines() if "orders.parquet" in l and "FileScan" in l]
    assert order_scan and "o_orderpriority" in order_scan[0]


def test_simhash_has_no_cartesian(spark, sf_dir):
    # pigeonhole banding must keep pair generation an equi-join on
    # (band, bandval) — an all-pairs formulation would show up as a
    # nested-loop/cartesian and die at scale
    p = plan_of(spark, sf_dir, "dedup_simhash")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_sessionize_single_data_exchange(spark, sf_dir):
    # lag + running-sum + session agg all share the user_id partitioning:
    # exactly one hash exchange (the trailing range exchange is the
    # presentation orderBy)
    p = plan_of(spark, sf_dir, "sessionize_events")
    hash_exchanges = [
        l for l in p.splitlines() if "Exchange hashpartitioning" in l
    ]
    assert len(hash_exchanges) == 1, p[:2000]
    assert "user_id" in hash_exchanges[0]


def test_cohort_first_activity_broadcasts(spark, sf_dir):
    # the |users|-row first-activity table must broadcast; the event stream
    # must not shuffle for the join
    p = plan_of(spark, sf_dir, "cohort_retention")
    assert "BroadcastExchange" in p


def test_decontaminate_bench_broadcasts(spark, sf_dir):
    p = plan_of(spark, sf_dir, "decontaminate_documents")
    assert "BroadcastHashJoin" in p


def test_q4_exists_is_left_semi(spark, sf_dir):
    p = plan_of(spark, sf_dir, "q4_order_priority_exists")
    assert "LeftSemi" in p  # EXISTS lowered to semi join, no payload dup
    assert "PushedFilters" in p


def test_tfidf_vocab_join_is_broadcast(spark, sf_dir):
    # the idf (vocab) table broadcasts back to TF; the only corpus-sized
    # exchange is the groupBy(doc_id, term) — no sort-merge on the corpus
    p = plan_of(spark, sf_dir, "tfidf_top_terms")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_embedding_outliers_centroids_broadcast(spark, sf_dir):
    # centroids (|labels| rows) broadcast back; the corpus exchanges only
    # for the per-label bottom-k window, never for the scoring join
    p = plan_of(spark, sf_dir, "embedding_outliers")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_asof_join_single_data_exchange(spark, sf_dir):
    # as-of is window-based: exactly ONE hash exchange (user_id) moves
    # data; the only other exchange is the output orderBy (oracle
    # determinism, dropped in a real pipeline). No join operator at all.
    p = plan_of(spark, sf_dir, "asof_join_last_view")
    assert p.count("Exchange hashpartitioning") == 1
    assert "Join" not in p
    assert "CartesianProduct" not in p


def test_phash_candidates_from_equi_join(spark, sf_dir):
    # banded Hamming LSH must generate candidates via an equi-join on
    # (band, bandval); an all-pairs Hamming pass would be a nested loop
    p = plan_of(spark, sf_dir, "multimodal_phash_neardup")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_hybrid_rrf_legs_avoid_global_sort(spark, sf_dir):
    # both retrieval legs reduce to top-k via TakeOrderedAndProject
    # before the fusion join touches anything
    p = plan_of(spark, sf_dir, "hybrid_search_rrf")
    assert p.count("TakeOrderedAndProject") >= 2


def test_lm_bigram_counts_partial_agg(spark, sf_dir):
    # the bigram count build must partial-aggregate map-side (shuffle
    # width = distinct bigrams, not the token stream) and never
    # sort-merge the corpus against the count table
    p = plan_of(spark, sf_dir, "lm_bigram_logprob")
    assert "HashAggregate" in p
    assert "CartesianProduct" not in p


def test_substring_cut_no_range_join(spark, sf_dir):
    # cover positions are exploded then equi-joined (anti); a per-doc
    # BETWEEN probe would plan as a nested loop
    p = plan_of(spark, sf_dir, "substring_dedup_cut")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "LeftAnti" in p


def test_hll_rollup_reuses_cached_registers(spark, sf_dir):
    # hour registers are built once and cached (the stored rollup
    # artifact); BOTH grains must read that cache — raw events are
    # scanned only to build registers (once) and for the exact_day
    # audit column. The plan string still prints the cached subtree's
    # FileScan, so assert the InMemoryTableScan reuse directly.
    p = plan_of(spark, sf_dir, "hll_window_rollup")
    assert p.count("InMemoryTableScan") >= 2, p[:1500]


def test_cms_sketch_joins_broadcast(spark, sf_dir):
    """The d x w sketch table must reach the probe join as a broadcast
    (never shuffle keys against a 1024-row table), with partial
    (map-side) HashAggregate stages on the counter build."""
    p = plan_of(spark, sf_dir, "heavy_hitters_cms")
    assert "BroadcastHashJoin" in p
    assert p.count("HashAggregate") >= 4  # partial+final for sketch+exact


def test_q2_min_cost_join_is_integer_keyed(spark, sf_dir):
    """Q2's correlated-min rewrite: the only cross join allowed is the
    1-row supplier-count broadcast inside partsupp generation; the
    min-cost equality joins on integer cents."""
    p = plan_of(spark, sf_dir, "q2_min_cost_supplier")
    assert "TakeOrderedAndProject" in p
    nlj = [l for l in p.splitlines() if "BroadcastNestedLoopJoin" in l]
    # the partsupp subtree appears in both the costs and mins branches,
    # each with its 1-row supplier-count crossJoin; nothing else may NLJ
    assert len(nlj) <= 2 and all("Cross" in l for l in nlj), p


def test_partsupp_generation_is_map_only(spark, sf_dir):
    """The synthesized dim must not shuffle: part scan -> 1-row count
    broadcast -> explode, all in one stage."""
    from kafka_stream_spark.operators.tpch_partsupp import partsupp_df

    p = partsupp_df(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in p
    assert "Generate explode" in p


def test_semdedup_assignment_map_only_pairs_cluster_bounded(spark, sf_dir):
    """SemDeDup's cluster assignment embeds the k centroids as literals
    and computes the argmax inline — the corpus must NOT shuffle or
    cross-join to be assigned. The near-dup pair stage must be the
    per-cluster grouped matmul (FlatMapGroupsInPandas keyed on cid) —
    within-cluster quadratic, never corpus-wide."""
    p = plan_of(spark, sf_dir, "semdedup_embeddings")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "FlatMapGroupsInPandas" in p  # the blocked-matmul pair stage
    assert "Window" not in p  # assignment argmax is inline, not ranked
    # exactly one data exchange: the groupBy(cid) feeding the pair stage
    # (the anti-join reuses the cached assignment + broadcasts drop ids)
    assert p.count("Exchange hashpartitioning") <= 2


def test_grouping_sets_single_expand_exchange(spark, sf_dir):
    """Four non-hierarchical grouping sets must compile to ONE Expand
    feeding ONE partial-aggregated exchange — not four scans."""
    p = plan_of(spark, sf_dir, "grouping_sets_orders")
    assert p.count("Expand") >= 1
    assert p.count("Scan parquet") == 1
    assert p.count("Exchange hashpartitioning") == 1


def test_quality_classifier_is_map_only(spark, sf_dir):
    """The hashed linear scorer must run at scan speed: no exchange, no
    python runner, no per-token row explosion (the final orderBy's range
    partitioning is presentation, not data-path, so only assert on the
    pre-sort shape)."""
    p = plan_of(spark, sf_dir, "quality_classifier_score")
    assert "Exchange hashpartitioning" not in p
    assert "Generate explode" not in p
    assert "Python" not in p  # no UDF anywhere in the scorer


def test_entity_resolution_blocking_is_equi_join(spark, sf_dir):
    """Candidate generation must be the token posting-list equi-join —
    an all-pairs name comparison would plan as a nested loop."""
    p = plan_of(spark, sf_dir, "entity_resolution_parts")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_bpe_apply_vocab_join_is_broadcast(spark, sf_dir):
    """The BPE apply path must broadcast the vocab symbol table back to
    the exploded corpus — the corpus itself never sort-merges."""
    p = plan_of(spark, sf_dir, "bpe_compression_by_source")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_hard_negatives_corpus_not_shuffled(spark, sf_dir):
    """Queries broadcast against the corpus; no corpus exchange before
    scoring (same contract as ann_cosine_topk)."""
    p = plan_of(spark, sf_dir, "hard_negative_mining")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_markov_model_broadcasts_back(spark, sf_dir):
    """The |types|^2 prediction table must broadcast onto the test
    transitions — the corpus-sized side never sort-merges."""
    p = plan_of(spark, sf_dir, "markov_eval_accuracy")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_forecast_eval_single_window_exchange(spark, sf_dir):
    """Both lags (7 and 1) share one event_type window partitioning:
    exactly one hash exchange on the daily table."""
    p = plan_of(spark, sf_dir, "forecast_eval_mase")
    hash_ex = [l for l in p.splitlines() if "Exchange hashpartitioning" in l]
    assert len(hash_ex) <= 2  # daily groupBy + the shared window


def test_holt_fold_is_calendar_bounded(spark, sf_dir):
    """The sequential Holt fold runs over per-key arrays AFTER the daily
    groupBy — the corpus-sized scan feeds exactly the daily partial agg
    (map-side combine) plus the per-type collect; no joins, no cartesian."""
    p = plan_of(spark, sf_dir, "holt_trend_forecast")
    assert "CartesianProduct" not in p
    assert "Join" not in p  # pure two-level aggregation pipeline
    hash_ex = [l for l in p.splitlines() if "Exchange hashpartitioning" in l]
    assert len(hash_ex) <= 2  # daily groupBy + per-type series groupBy


def test_dow_seasonality_stats_broadcast(spark, sf_dir):
    """The |types|x7 cell stats and |types| totals broadcast back onto
    the daily rows — the daily table never sort-merges."""
    p = plan_of(spark, sf_dir, "dow_seasonality_events")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_bitext_default_plan_is_subquadratic(spark, sf_dir):
    """Round-3 contract: the DEFAULT bitext plan generates candidate
    pairs via the banded-LSH EQUI-join on (band, bval) — no
    BroadcastNestedLoopJoin / crossJoin over two corpus-sized sides
    anywhere; the windowed kNN sums partition the CANDIDATE pair set,
    never re-shuffle the corpus."""
    p = plan_of(spark, sf_dir, "bitext_margin_mining")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_embedding_near_dup_default_plan_is_subquadratic(spark, sf_dir):
    """Round-3 contract: near-dup candidates come from the banded-LSH
    equi-join; exact cosine only re-scores collisions. The all-pairs
    BroadcastNestedLoopJoin exists solely behind exact=True."""
    p = plan_of(spark, sf_dir, "embedding_near_dup")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_embedding_near_dup_exact_flag_restores_baseline(spark, sf_dir):
    """exact=True is the audit baseline: its verified pairs are a
    SUPERSET of the default's (banding only drops candidates, never
    invents them), and values agree on the intersection."""
    from kafka_stream_spark.operators.similarity import embedding_near_dup

    exact = {
        (r.vec_a, r.vec_b): r.cosine
        for r in embedding_near_dup(spark, sf_dir, exact=True).collect()
    }
    default = {
        (r.vec_a, r.vec_b): r.cosine
        for r in embedding_near_dup(spark, sf_dir).collect()
    }
    assert set(default) <= set(exact)
    assert all(exact[k] == v for k, v in default.items())
    assert len(default) > 0


def test_boilerplate_removal_is_broadcast_anti_join(spark, sf_dir):
    """The template set is heavy-hitter sized by construction, so the
    removal join must broadcast it (left-anti hash join) — the corpus is
    never re-shuffled for the filter."""
    p = plan_of(spark, sf_dir, "strip_boilerplate_chunks")
    assert "BroadcastHashJoin" in p and "LeftAnti" in p
    assert "CartesianProduct" not in p


def test_novelty_curve_is_two_gram_shuffles(spark, sf_dir):
    """first-occurrence via min(doc_id) must partial-aggregate before
    its exchange; nothing pairwise, no corpus sort."""
    p = plan_of(spark, sf_dir, "ngram_novelty_curve")
    assert "partial_min" in p  # map-side combine on the gram groupBy
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_equidepth_default_has_no_global_value_sort(spark, sf_dir):
    """Round-3 contract: the default equi-depth plan derives decile
    boundaries from the <=128-row mergeable histogram — no ntile, no
    sort of the events relation by value (the only Sort operates on the
    histogram's bin column). exact=True restores the ntile baseline."""
    from kafka_stream_spark.operators.olap_ext import equidepth_histogram_value

    p = plan_of(spark, sf_dir, "equidepth_histogram_value")
    assert "ntile" not in p
    assert "Sort [value" not in p
    pe = (
        equidepth_histogram_value(spark, sf_dir, exact=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ntile" in pe


def test_equidepth_sketch_tracks_exact_deciles(spark, sf_dir):
    """The sketch buckets must stay equi-depth in practice: every
    bucket population within ±2% of n/10 of the exact ntile split."""
    from kafka_stream_spark.operators.olap_ext import equidepth_histogram_value

    default = {r.bucket: r.n for r in
               equidepth_histogram_value(spark, sf_dir).collect()}
    exact = {r.bucket: r.n for r in
             equidepth_histogram_value(spark, sf_dir, exact=True).collect()}
    total = sum(exact.values())
    assert sum(default.values()) == total  # every row lands in a bucket
    for b in exact:
        assert abs(default.get(b, 0) - exact[b]) <= 0.02 * total / 10 + 2, (
            b, default.get(b), exact[b]
        )


def test_bitext_exact_flag_recall_on_planted_pairs(spark):
    """Recall audit in the regime margin mining targets: plant label-1
    twins (cos ≈ 0.98) for 20 of 30 label-0 vectors plus noise targets.
    Banded-LSH collision probability at cos 0.98 is ~0.99, so the
    default must mine nearly every pair the exact baseline mines. (On
    the sf testdata max cross-pool cosine is ~0.49 — pure noise — where
    exact-vs-approx agreement is meaningless for ANY approximate kNN,
    the paper's own FAISS-backed setup included.)"""
    import random

    from kafka_stream_spark.operators.bitext import mine_bitext

    rng = random.Random(7)
    dims = 64

    def vec():
        return [rng.gauss(0, 1) for _ in range(dims)]

    rows = []
    srcs = [vec() for _ in range(30)]
    for i, e in enumerate(srcs):
        rows.append((i, 0, e))
    for i in range(20):  # twins: src i + small perturbation
        rows.append((1000 + i, 1, [x + rng.gauss(0, 0.04) for x in srcs[i]]))
    for i in range(26):  # noise targets
        rows.append((2000 + i, 1, vec()))
    v = spark.createDataFrame(rows, "vec_id long, label int, e array<double>")

    exact = {(r.src_id, r.tgt_id) for r in mine_bitext(v, exact=True).collect()}
    default = {(r.src_id, r.tgt_id) for r in mine_bitext(v).collect()}
    planted = {(i, 1000 + i) for i in range(20)}
    assert len(exact & planted) >= 18  # exact finds the planted pairs
    # default recovers the planted (high-cos) minings; exact's extra
    # low-cos noise pairings are exactly what banding is meant to skip
    assert len(default & planted) >= 0.9 * len(exact & planted)


def test_containment_verify_shares_jaccard_plan(spark, sf_dir):
    """Containment rides the same posting-list equi-join as
    dedup_ngram_jaccard: shingle-keyed join plus broadcast size dims —
    no nested loop anywhere."""
    p = plan_of(spark, sf_dir, "dedup_containment")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoop" not in p
    assert "BroadcastHashJoin" in p  # the two size-dim joins


def test_minhash_band_join_reads_cached_bands(spark, sf_dir):
    """The LSH band self-join's two sides (broadcast build + streamed
    scan) never share work, so without the bands cache the 16-min
    signature aggregate runs TWICE — the r8 fix for the driver-observed
    8.4s bimodal tail. Pin: the partial 16-min aggregate appears exactly
    ONCE in the plan (both join sides read the cached band table)."""
    # Count FORMATTED-plan detail lines (one block per operator id — the
    # tree-string form reprints a cached relation's child once per scan,
    # which would double-count). incremental_dedup_documents has one
    # extra legitimate partial_min line: the exact layer's min(bdoc).
    for q, want in (("dedup_minhash_lsh", 1), ("dedup_edit_distance", 1),
                    ("incremental_dedup_documents", 2)):
        df = SPECS[q].build(spark, sf_dir)
        p = spark._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        got = sum("partial_min" in l for l in p.splitlines())
        assert got == want, (
            f"{q}: expected {want} partial_min aggregate line(s), got {got}"
        )


def test_incremental_dedup_batch_scales_with_increment(spark, sf_dir):
    """Cross-corpus LSH: band candidates come from an equi-join on
    (band, band_sig) restricted to incoming x corpus — no cartesian, no
    corpus self-join; the exact layer is a hash equi-join."""
    p = plan_of(spark, sf_dir, "incremental_dedup_documents")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoop" not in p


def test_bloom_filter_probes_as_literal_predicate(spark, sf_dir):
    """The 64-word bloom collects once and rides INSIDE the probe
    filter as a literal array of bit tests (r7 shape) — no join sits
    between the orders scan and the membership test; the only
    BroadcastHashJoin left is the exact-membership truth join, and the
    order table never sort-merges."""
    p = plan_of(spark, sf_dir, "bloom_membership_orders")
    # probe = map-only bit math over a literal word array
    assert "element_at" in p and "shiftleft" in p
    # exactly one join (the truth-membership leg), broadcast not SMJ
    assert p.count("BroadcastHashJoin") == 1
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p
    # the bit tests live in a Filter over o_custkey, i.e. on the probe
    # scan side — not inside any join condition
    assert any(
        "element_at" in l and "o_custkey" in l for l in p.splitlines()
    ), "literal-array bit tests not found as a probe-side filter condition"


def test_zorder_audit_demonstrates_secondary_pruning(spark, sf_dir):
    """The audit's whole point: the linear layout cannot skip a single
    bucket for the secondary-dimension predicate, the Z-order layout
    skips most — assert the asymmetry itself, not just the plan."""
    df = SPECS["zorder_pruning_audit"].build(spark, sf_dir)
    rows = {(r.layout, r.predicate): r for r in df.collect()}
    lin_date = rows[("linear", "date_range")]
    z_date = rows[("zorder", "date_range")]
    assert lin_date.n_touched == lin_date.n_buckets  # no pruning at all
    assert z_date.n_touched < z_date.n_buckets * 0.6  # >40% skipped
    p = plan_of(spark, sf_dir, "zorder_pruning_audit")
    assert "CartesianProduct" not in p


def test_prorate_single_order_partitioning(spark, sf_dir):
    """Window sum, remainder rank, leftover sum, and final groupBy all
    share the l_orderkey hash partitioning — one data exchange, no
    joins at all."""
    p = plan_of(spark, sf_dir, "prorate_penny_allocation")
    assert "Join" not in p
    hash_ex = [l for l in p.splitlines() if "Exchange hashpartitioning" in l]
    assert len(hash_ex) <= 1


def test_diversified_topk_avoids_global_sort(spark, sf_dir):
    """Per-customer cap runs in the customer window partitioning; the
    global 25 selects via TakeOrderedAndProject, never a full sort."""
    p = plan_of(spark, sf_dir, "diversified_topk_orders")
    assert "TakeOrderedAndProject" in p


def test_link_prediction_wedge_join_is_equi(spark, sf_dir):
    """Candidates must come from the equi wedge join; the existing-edge
    removal must be a hash anti-join — no nested loop over pair mass."""
    p = plan_of(spark, sf_dir, "link_prediction_parts")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "LeftAnti" in p


def test_user_similarity_posting_join_is_equi(spark, sf_dir):
    """The CF pair stage is a posting-list equi-join on the part key
    (hub-capped), never a user-cross-user plan."""
    p = plan_of(spark, sf_dir, "user_similarity_parts")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_ks_drift_no_single_partition_sort(spark, sf_dir):
    """The KS cumulative step must run per-type over the collapsed cents
    domain: no Exchange SinglePartition before the window (that would be
    the global-sort anti-pattern the sketch histogram replaced)."""
    p = plan_of(spark, sf_dir, "ks_drift_events")
    head, _, tail = p.partition("Window")
    assert tail, "expected a Window node"
    assert "Exchange SinglePartition" not in head


def test_pca_corpus_never_shuffles(spark, sf_dir):
    """The PCA projection pass reads the checkpointed centered corpus
    map-only; the only exchange is the 64-group (or label-group)
    reduction — no corpus-wide repartitioning."""
    p = plan_of(spark, sf_dir, "pca_embeddings")
    assert "CartesianProduct" not in p
    # final plan: per-label partial agg + the broadcast var crossJoin
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p


def test_silhouette_corpus_is_map_side(spark, sf_dir):
    # the k centroids collapse to one broadcast row; a(x)/b(x) are pure
    # map-side array math — no CartesianProduct, no corpus-keyed join
    p = plan_of(spark, sf_dir, "embedding_cluster_silhouette")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_edit_distance_dedup_is_candidate_bounded(spark, sf_dir):
    # verification joins candidates to the 256-char window projection by
    # doc id — equi-joins only, never an all-pairs comparison
    p = plan_of(spark, sf_dir, "dedup_edit_distance")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_skipgram_pairs_are_doc_local(spark, sf_dir):
    # r7: pair generation explodes DOC-LOCALLY from the token array
    # (each token pairs with its <= 2 forward neighbours via slice —
    # linear per token), so the plan carries NO join at all; the only
    # wide operator is the pair-count aggregate's exchange. Never a
    # per-doc quadratic nested loop or cartesian.
    p = plan_of(spark, sf_dir, "skipgram_training_pairs")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "Join" not in p  # the r6 (doc_id, pos) self-join is gone
    assert "Generate" in p  # the doc-local explode
    # top-30 without a global sort of the pair table
    assert "TakeOrderedAndProject" in p


def test_mann_whitney_ranks_over_value_domain(spark, sf_dir):
    # rank window must run over the DISTINCT-cents table, not per event:
    # no exchange keyed on raw event rows after the domain reduction
    p = plan_of(spark, sf_dir, "mann_whitney_ab_test")
    assert "CartesianProduct" not in p
    assert "Window" in p
    # the domain groupBy partial-aggregates map-side before the exchange
    assert "HashAggregate" in p


def test_minhash_calibration_reuses_equi_stages(spark, sf_dir):
    # candidates, signature compare, and exact verify are all equi-joins
    p = plan_of(spark, sf_dir, "minhash_estimate_calibration")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
