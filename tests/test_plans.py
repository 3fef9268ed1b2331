"""Physical-plan audits: the properties that make queries survive a 100×
scale-up are plan properties, not result properties — filters reaching the
parquet scan, column pruning, dimension broadcast, map-side partial
aggregation, whole-stage codegen. These tests pin them so a refactor that
silently de-optimizes a plan fails CI, not the cluster.
"""

from __future__ import annotations

import pytest

from debezium_emr_hudi_deltastreamer_sample_spark.plans import (
    formatted_plan as plan,
    uses_python_row_udf,
)
from debezium_emr_hudi_deltastreamer_sample_spark.queries import all_queries

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    return all_queries()


def test_pricing_summary_pushdown_and_pruning(spark, qs):
    p = plan(qs["pricing_summary"](spark, SF))
    # Date filter reaches the parquet scan…
    assert "PushedFilters: [IsNotNull(l_shipdate)" in p
    # …and the scan reads only the 7 referenced columns, not the full table.
    read_schema = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert read_schema.count(":") - 1 <= 8
    assert "l_comment" not in read_schema
    # Partial (map-side) + final aggregation.
    assert p.count("HashAggregate") >= 2
    # Codegen subtrees only materialize in a non-adaptive plan explain —
    # toggle AQE off for the assertion (runtime behavior is unchanged).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        cg = plan(qs["pricing_summary"](spark, SF), "codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "WholeStageCodegen subtrees" in cg and "Found 0" not in cg


def test_star_join_broadcasts_dimensions(spark, qs):
    p = plan(qs["join_star_revenue"](spark, SF))
    # Dimension sides must broadcast — a shuffled or nested-loop join on a
    # star schema is the classic 100 TB regression.
    assert "BroadcastHashJoin" in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_semi_anti_joins_stay_joins(spark, qs):
    for name in ("join_semi", "join_anti"):
        p = plan(qs[name](spark, SF))
        assert "LeftSemi" in p or "LeftAnti" in p, name


def test_subquery_decorrelates_to_join(spark, qs):
    # Correlated NOT EXISTS must not become a per-row subquery execution.
    p = plan(qs["sql_subquery_exists"](spark, SF))
    assert "LeftAnti" in p


def test_projection_prunes_scan(spark, qs):
    p = plan(qs["project_cast_drop"](spark, SF))
    read_schema = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "o_comment" not in read_schema and "o_clerk" not in read_schema


def test_exact_dedup_partial_aggregates(spark, qs):
    p = plan(qs["llm_exact_dedup"](spark, SF))
    assert p.count("HashAggregate") >= 2  # map-side combine before shuffle


def test_no_python_row_udfs_in_relational_plans(spark, qs):
    """Relational/CDC plans must stay JVM-side: BatchEvalPython (row-at-a-
    time Python UDF) in a hot path means a 10-100x slowdown at scale.
    (ArrowEvalPython/FlatMapGroupsInPandas are the sanctioned vectorized
    escape hatches for vector math and grouped-map ops.)"""
    for name in (
        "pricing_summary",
        "join_star_revenue",
        "window_topk_per_group",
        "cdc_merge_upsert",
        "llm_token_stats",
        "llm_exact_dedup",
    ):
        assert not uses_python_row_udf(plan(qs[name](spark, SF))), name


def test_topk_uses_take_ordered(spark, qs):
    # Global top-k must be TakeOrderedAndProject (no full sort + limit).
    p = plan(qs["top_orders_global"](spark, SF))
    assert "TakeOrderedAndProject" in p


def test_partitioned_readback_prunes_partitions(spark, qs):
    """The hive-style partitioned sink (B10) must prune at directory level:
    the o_orderstatus predicate appears as a PartitionFilter on the
    readback scan and the pruned partition's files are never listed."""
    p = plan(qs["sink_partitioned_readback"](spark, SF))
    pf = next(l for l in p.splitlines() if "PartitionFilters" in l)
    assert "o_orderstatus" in pf
    # The predicate is consumed entirely by partition pruning: no Filter
    # node survives, and the scan reads only the aggregated column.
    assert "(1) Scan parquet" in p and ") Filter" not in p
    read_schema = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "o_orderstatus" not in read_schema


def test_binned_range_join_avoids_nested_loop(spark, qs):
    """The pure range join must hash-join on bin ids — a NestedLoop node
    here is the O(n·m) cliff the operator exists to avoid."""
    p = plan(qs["join_range_binned"](spark, SF))
    assert "NestedLoop" not in p and "CartesianProduct" not in p
    assert "Join" in p


def test_sessionize_reuses_user_partitioning(spark, qs):
    """Both window passes and the final per-session aggregate hash on
    user_id: the plan must shuffle on user_id ONCE — a second user_id
    exchange would double the dominant cost at 100 TB."""
    p = plan(qs["pipe_sessionize"](spark, SF))
    # One Exchange node in the detail section (") Exchange" header), keyed
    # on user_id; the windows and the (user_id, session_id) aggregate all
    # ride that single partitioning.
    assert p.count(") Exchange") == 1
    assert "hashpartitioning(user_id" in p


def test_tfidf_broadcasts_corpus_count_and_takes_ordered(spark, qs):
    """The single-row corpus count must broadcast (never shuffle the term
    stats against it) and the global top-20 must be TakeOrderedAndProject,
    not a full sort."""
    p = plan(qs["pipe_tfidf_top_terms"](spark, SF))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p
    assert "TakeOrderedAndProject" in p


def test_chunking_is_shuffle_free(spark, qs):
    """Chunk explosion is a pure generator over the scan — any Exchange in
    this plan means rows shuffled for no reason (explode output feeds the
    consumer pipelined)."""
    p = plan(qs["pipe_chunk_documents"](spark, SF))
    assert "Exchange" not in p
    assert "Generate" in p  # posexplode survives as a generator node


def test_hash_split_no_udf_single_agg(spark, qs):
    """The sharding expression is pure JVM arithmetic (no Python), and the
    3-way split aggregates with map-side partials."""
    p = plan(qs["pipe_hash_split"](spark, SF))
    assert "BatchEvalPython" not in p
    assert p.count("HashAggregate") >= 2  # partial + final


def test_decontaminate_broadcasts_benchmark_grams(spark, qs):
    """The benchmark gram set must reach the corpus-side probe as a
    broadcast (semi) join — shuffling the full corpus gram stream against
    a tiny benchmark is the avoidable cost at 100 TB."""
    p = plan(qs["llm_decontaminate"](spark, SF))
    assert "BroadcastExchange" in p
    assert "LeftSemi" in p


def test_pack_sequences_default_has_no_global_window(spark, qs):
    """The registered packer must pack WITHIN split shards: one Window,
    and its windowspecdefinition carries the split partition key — a
    partition-less (global ORDER BY) window would serialize packing onto
    one task at 100 TB. The global form lives on as llm_pack_global."""
    p = plan(qs["llm_pack_sequences"](spark, SF))
    assert p.count(") Window") == 1
    spec = next(l for l in p.splitlines() if "windowspecdefinition" in l)
    assert "windowspecdefinition(split" in spec


def test_pack_global_companion_single_window(spark, qs):
    """The oracle companion keeps exactly one (global) window — pin it so
    a change that silently adds shuffles is caught."""
    p = plan(qs["llm_pack_global"](spark, SF))
    assert p.count(") Window") == 1


def test_clustered_readback_pushes_date_range(spark, qs):
    """The sort-clustered sink's readback must push the BETWEEN bounds
    into the parquet scan (row-group skipping via footer min/max); a
    post-scan Filter-only plan would read every row group."""
    p = plan(qs["sink_clustered_readback"](spark, SF))
    pushed = [l for l in p.splitlines() if "PushedFilters" in l]
    assert any(
        "GreaterThanOrEqual(l_shipdate" in l and "LessThanOrEqual(l_shipdate" in l
        for l in pushed
    )


def test_incremental_read_prunes_old_batches(spark, qs):
    """Incremental pull must prune at the ingest_batch directory level —
    reading history for an incremental consumer defeats the contract."""
    p = plan(qs["cdc_incremental_read"](spark, SF))
    pf = next(l for l in p.splitlines() if "PartitionFilters" in l)
    assert "ingest_batch" in pf


def test_pagerank_joins_add_no_shuffles(spark):
    """Iterative-graph scale contract (operators/components.py): the whole
    fixed-iteration PageRank is ONE lazy query whose edge list and vertex
    set each carry one declared repartition on the vertex key. Every
    per-iteration join must be satisfied by those declared shuffles (or a
    co-partitioned aggregate output), so the ONLY EnsureRequirements
    exchanges are the three inherent message-passing groupBys — one per
    iteration. ReuseExchange collapses the repeated repartition
    references; nothing gets broadcast (unknown-stats leaves)."""
    from debezium_emr_hudi_deltastreamer_sample_spark.operators.components import (
        pagerank_fixed,
    )

    verts = spark.createDataFrame([(v,) for v in range(8)], "id long")
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (4, 5)], "src long, dst long"
    )
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        # dedup_edges=False — the production path the graded queries use
        # (their LSH/exact pair sources are distinct-and-oriented); the
        # defensive default adds one canonicalize-distinct exchange.
        p = plan(pagerank_fixed(verts, edges, iterations=3, dedup_edges=False))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert p.count("ENSURE_REQUIREMENTS") == 3
    assert p.count("REPARTITION_BY_NUM") <= 4
    assert "ReusedExchange" in p
    assert "BroadcastExchange" not in p


def test_connected_components_batch_bounds_shuffles(spark):
    """One convergence batch of label propagation (connected_components
    runs rounds in lazy batches of 2) must bound its shuffles: the edge
    list contributes at most one declared repartition per round (reused,
    never recomputed — it is checkpointed), and EnsureRequirements adds at
    most 2 exchanges per round (the inherent min-label groupBy plus the
    label-frame rehash). The naive per-round-query version shuffled the
    edge list from scratch every round."""
    from debezium_emr_hudi_deltastreamer_sample_spark.operators.components import (
        _prehash,
    )
    from pyspark.sql import functions as F

    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    bidir = _prehash(
        edges.select(F.col("src").alias("v"), F.col("dst").alias("n"))
        .union(edges.select(F.col("dst").alias("v"), F.col("src").alias("n")))
        .distinct(),
        "v",
        8,
    ).localCheckpoint(eager=True)
    bidir = _prehash(bidir, "v", 8)
    labels = spark.createDataFrame(
        [(v, v) for v in range(3)], "v long, label long"
    ).localCheckpoint(eager=True)
    new_labels = labels
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for _ in range(2):
            nb = bidir.join(new_labels, "v").select(F.col("n").alias("v"), "label")
            new_labels = (
                new_labels.union(nb).groupBy("v").agg(F.min("label").alias("label"))
            )
        p = plan(new_labels)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert p.count("REPARTITION_BY_NUM") <= 2
    assert p.count("ENSURE_REQUIREMENTS") <= 4
    # The checkpointed edge list appears as an RDD scan — its distinct/
    # union construction never re-executes inside the batch.
    assert "ReusedExchange" in p


def test_triangles_no_cartesian_product(spark, qs):
    """Triangle enumeration must be two equi-joins on vertex keys; a
    CartesianProduct/BroadcastNestedLoop on the EDGE list is the plan
    that dies at scale (the exact edge GENERATION is a documented
    broadcast nested loop — exclude it by checking the closing joins)."""
    p = plan(qs["llm_graph_triangles"](spark, SF))
    # The two triangle-closing joins are hash joins (broadcast or SMJ).
    assert p.count("HashJoin") + p.count("SortMergeJoin") >= 2


def test_weighted_sample_one_exchange_two_windows(spark, qs):
    """llm_weighted_sample: the cumsum window and the per-stratum total
    window must SHARE one hashpartitioning(lang) exchange — a second
    exchange would double the only shuffle this query needs — and the
    scan reads exactly the three projected columns."""
    p = plan(qs["llm_weighted_sample"](spark, SF))
    assert p.count(") Exchange") == 1
    assert p.count(") Window") == 2
    rs = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "text" not in rs and "source" not in rs  # column pruning


def test_ingest_gate_no_batch_times_corpus_join(spark, qs):
    """pipe_ingest_neardup_gate: the batch must meet the corpus ONLY via
    the (band, bucket) equi-join on the signature index — a nested-loop
    or cartesian join of batch×corpus text is the plan that dies at
    100 TB."""
    p = plan(qs["pipe_ingest_neardup_gate"](spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_heavy_hitters_candidates_broadcast_semi(spark, qs):
    """llm_heavy_hitters: the exact-refine pass must reach the token
    stream as a BROADCAST semi-join of the small candidate set — a
    shuffled join (or a full-vocabulary aggregate before the filter)
    forfeits the bounded-shuffle point of the two-pass shape."""
    p = plan(qs["llm_heavy_hitters"](spark, SF))
    assert "BroadcastExchange" in p
    assert "LeftSemi" in p


def test_profile_columns_single_scan(spark, qs):
    """pipe_profile_columns computes all four columns' profiles in ONE
    aggregate over ONE scan (stack-unpivoted) — the union-of-aggregates
    form it replaced planned four full scans of documents."""
    p = plan(qs["pipe_profile_columns"](spark, SF))
    assert p.count("documents.parquet") == 1


def test_gap_fill_single_events_scan(spark, qs):
    """ts_gap_fill derives bounds and the type list from the hourly
    rollup (checkpointed once), so the events parquet is scanned exactly
    once in the plan."""
    p = plan(qs["ts_gap_fill"](spark, SF))
    assert p.count("events.parquet") <= 1


def test_span_dedup_two_exchanges(spark, qs):
    """Span dedup is two hash shuffles by design — the span window (first
    -occurrence election) and the doc_id reassembly groupBy; partial
    aggregation keeps the second exchange rollup-sized."""
    p = plan(qs["llm_span_dedup"](spark, SF))
    assert p.count(") Exchange") == 2


def test_zorder_readback_pushes_2d_filter(spark, qs):
    """The Z-order READBACK's conjunctive 2-D range filter must reach the
    parquet scan (row-group skipping needs pushed predicates on top of
    the clustered layout). The layout itself — per-file 2-D bounding-box
    shrinkage under the Morton rewrite — is pinned by
    tests/test_table.py::test_compact_with_zorder_clustering."""
    p = plan(qs["sink_zorder_readback"](spark, SF))
    assert "PushedFilters" in p
    assert "GreaterThanOrEqual(l_partkey,100)" in p or "l_partkey" in next(
        l for l in p.splitlines() if "PushedFilters" in l
    )


def test_scd2_single_user_exchange(spark, qs):
    """cdc_scd2_history: the lag window, change filter, and lead window
    all hash on user_id — the plan must carry ONE user_id exchange (a
    second exchange between the windows would double the dominant cost)."""
    p = plan(qs["cdc_scd2_history"](spark, SF))
    assert p.count(") Exchange") == 1
    assert "hashpartitioning(user_id" in p


def test_ngram_novelty_partial_aggregates(spark, qs):
    """llm_ngram_novelty: the gram-frequency aggregate must be partial
    (map-side combine before the gram shuffle) and the plan must stay
    UDF-free — the inverted-index shape that keeps the shuffle
    vocabulary-sized."""
    p = plan(qs["llm_ngram_novelty"](spark, SF))
    assert "partial_count" in p
    assert not uses_python_row_udf(p)


def test_epoch_shuffle_single_shard_exchange(spark, qs):
    """pipe_epoch_shuffle: position assignment is per-shard, so the plan
    shuffles once on shard — never a global singleton sort."""
    p = plan(qs["pipe_epoch_shuffle"](spark, SF))
    assert p.count(") Exchange") == 1
    assert "hashpartitioning(shard" in p
    assert "SinglePartition" not in p


def test_stratified_sample_is_pure_scan_agg(spark, qs):
    """llm_stratified_sample: membership is codegen'd integer math — one
    scan, one partial-agg'd groupBy(lang), no UDF, no join."""
    p = plan(qs["llm_stratified_sample"](spark, SF))
    assert "Join" not in p
    assert not uses_python_row_udf(p)
    assert "partial_count" in p


def test_window_count_distinct_single_exchange(spark, qs):
    """window_count_distinct: the explicit user_id repartition must serve
    BOTH window passes (hash on a subset of the inner window's keys
    co-locates its groups) — exactly one exchange, keyed on user_id."""
    p = plan(qs["window_count_distinct"](spark, SF))
    assert p.count(") Exchange") == 1
    assert "hashpartitioning(user_id" in p


def test_tpch_star_queries_broadcast_all_dims(spark, qs):
    """tpch_q7/q8: every dimension side (nation ×2, supplier, region,
    filtered part) broadcasts; the only shuffle joins are fact-sized.
    A star plan that shuffles a dimension is the canonical 100 TB
    regression."""
    for name in ("tpch_q7_nation_volume", "tpch_q8_market_share"):
        p = plan(qs[name](spark, SF))
        assert "BroadcastHashJoin" in p, name
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name


def test_tpch_q10_pushes_both_fact_filters(spark, qs):
    """tpch_q10: the returnflag filter reaches the lineitem scan and the
    date range reaches the orders scan BEFORE any join; the top-20 is a
    TakeOrdered, not a global sort."""
    p = plan(qs["tpch_q10_returned_items"](spark, SF))
    assert "EqualTo(l_returnflag,R)" in p
    assert "GreaterThanOrEqual(o_orderdate" in p
    assert "TakeOrderedAndProject" in p


def test_tpch_q18_semi_join_filter(spark, qs):
    """tpch_q18: the qualifying-order set applies as a LEFT SEMI join —
    the fact table is filtered by the HAVING aggregate, never widened by
    a fact⋈fact row explosion."""
    p = plan(qs["tpch_q18_large_orders"](spark, SF))
    assert "LeftSemi" in p


def test_tpch_q15_single_fact_scan(spark, qs):
    """tpch_q15: the revenue CTE feeds both the max subquery and the
    equality join from ONE localCheckpointed aggregate — the lineitem
    scan appears once, not twice."""
    p = plan(qs["tpch_q15_top_supplier"](spark, SF))
    assert p.count("Scan parquet") + p.count("FileScan parquet") <= 2  # supplier + (≤1) fact
    assert "BroadcastHashJoin" in p


def test_bitmap_distinct_avoids_expand(spark, qs):
    """agg_bitmap_distinct: the bitmap two-phase form must NOT plan the
    COUNT(DISTINCT) Expand+double-shuffle — bitmaps partial-aggregate
    map-side and the shuffle carries (group, bucket) bitmaps only."""
    p = plan(qs["agg_bitmap_distinct"](spark, SF))
    assert "Expand" not in p
    assert "partial_bitmap_construct_agg" in p
    assert not uses_python_row_udf(p)


def test_pattern_match_single_user_exchange(spark, qs):
    """window_pattern_match: the lead window and the per-user aggregate
    share the user_id partitioning — exactly one exchange."""
    p = plan(qs["window_pattern_match"](spark, SF))
    assert p.count(") Exchange") == 1
    assert "hashpartitioning(user_id" in p


def test_ts_interpolate_single_events_scan(spark, qs):
    """ts_interpolate: like ts_gap_fill, the raw events table is scanned
    once (the rollup); grid, bounds and both fill windows run on
    rollup-sized data."""
    p = plan(qs["ts_interpolate"](spark, SF))
    assert p.count("events.parquet") <= 1


def test_url_normalize_jvm_only(spark, qs):
    """pipe_url_normalize: canonicalization is a codegen'd projection —
    no Python UDF, and the only exchange is the canonical-url groupBy."""
    p = plan(qs["pipe_url_normalize"](spark, SF))
    assert not uses_python_row_udf(p)
    assert "partial_count" in p


def test_regression_partial_aggregates(spark, qs):
    """agg_regression: regr_* co-moment states must partial-aggregate
    map-side (associative accumulators), with no Expand and no UDF."""
    p = plan(qs["agg_regression"](spark, SF))
    assert "partial_regr" in p
    assert "Expand" not in p
    assert not uses_python_row_udf(p)


def test_parameterized_sql_pushes_bound_literals(spark, qs):
    """sql_parameterized: named parameters bind before analysis, so both
    predicates reach the parquet scan as ordinary pushed filters."""
    p = plan(qs["sql_parameterized"](spark, SF))
    assert "GreaterThanOrEqual(o_orderdate" in p
    assert "GreaterThan(o_totalprice" in p


def test_filtered_topk_pushes_metadata_predicate(spark, qs):
    """llm_filtered_topk's whole point is PRE-filtering: the RANGE label
    predicate must reach the candidate parquet scan (PushedFilters shows
    the comparison itself, not merely IsNotNull), so no distance work is
    spent on rows the metadata excludes."""
    p = plan(qs["llm_filtered_topk"](spark, SF))
    pushed = [l for l in p.splitlines() if "PushedFilters" in l]
    assert any("LessThanOrEqual(label,4" in l for l in pushed)


def test_semantic_decontaminate_is_one_scan_no_shuffle(spark, qs):
    """llm_semantic_decontaminate ships the benchmark matrix in the UDF
    closure: the corpus side must be a single filtered scan with NO
    Exchange anywhere — any join/shuffle means the corpus moved."""
    p = plan(qs["llm_semantic_decontaminate"](spark, SF))
    assert ") Exchange" not in p
    assert "Join" not in p
    pushed = [l for l in p.splitlines() if "PushedFilters" in l]
    assert any("vec_id" in l for l in pushed)


def test_right_to_forget_broadcasts_requests(spark, qs):
    """The deletion-request set must broadcast to every cascade join —
    a sort-merge join against the request list would re-shuffle the
    corpus to forget a handful of documents."""
    p = plan(qs["pipe_right_to_forget"](spark, SF))
    assert p.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in p


def test_q5_pushes_date_range_and_broadcasts_dims(spark, qs):
    """Q5's selectivity comes from the pushed order-date range; the
    region/nation/supplier branch must broadcast, never shuffle the
    fact chain against 5-row dimensions."""
    p = plan(qs["tpch_q5_local_supplier_volume"](spark, SF))
    pushed = " ".join(l for l in p.splitlines() if "PushedFilters" in l)
    assert "o_orderdate" in pushed and "GreaterThanOrEqual" in pushed
    assert p.count("BroadcastHashJoin") >= 3


def test_q17_brand_pushdown_and_partial_agg(spark, qs):
    """Q17's decorrelated per-part aggregate must keep map-side partials
    (partial_sum/partial_count before the exchange) and the brand filter
    must reach the part scan."""
    p = plan(qs["tpch_q17_small_qty_revenue"](spark, SF))
    pushed = " ".join(l for l in p.splitlines() if "PushedFilters" in l)
    assert "EqualTo(p_brand,Brand#4)" in pushed
    assert "partial_sum" in p
    assert "BroadcastHashJoin" in p


def test_q21_single_fact_rollup(spark, qs):
    """Q21's (order, supplier) rollup must materialize ONCE: the lazy
    form computed the lineitem⋈orders join + aggregate twice (once per
    leg of the closing self-join) because distinct expression ids defeat
    ReuseExchange. The checkpointed rollup appears as an RDD scan and the
    fact parquet scan appears ZERO times in the final plan (it ran inside
    the checkpoint; one would mean a leg re-derived it). What remains are
    the two l_orderkey re-shuffles of the rollup itself (self-join
    re-aliasing defeats exchange reuse even over one RDD) — bound them so
    a regression cannot silently re-introduce more."""
    p = plan(qs["tpch_q21_waiting_supplier"](spark, SF))
    assert p.count("Scan ExistingRDD") >= 1
    fact_scans = [
        l for l in p.splitlines() if "Scan parquet" in l and "lineitem" in l
    ]
    assert len(fact_scans) == 0  # ran inside the checkpoint, not per leg
    assert p.count("REPARTITION_BY_NUM") <= 2


def test_q9_part_broadcasts_despite_nonpushable_like(spark, qs):
    """Q9's contains-LIKE cannot push into the parquet scan — the plan
    contract is that the FILTERED part side still broadcasts, so the fact
    table flows only through broadcast joins plus the one orders-side
    shuffle (no sort-merge against a dimension)."""
    p = plan(qs["tpch_q9_product_profit"](spark, SF))
    assert p.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in p or p.count("SortMergeJoin") <= 1


def test_hot_keys_single_fact_scan(spark, qs):
    """cdc_hot_keys materializes the per-key aggregate once: lazy, the
    events scan + key-grain shuffle ran TWICE (output rows + broadcast
    mean branch). The checkpointed aggregate appears as an RDD scan and
    the events parquet scan appears at most once."""
    p = plan(qs["cdc_hot_keys"](spark, SF))
    assert p.count("Scan ExistingRDD") >= 1
    ev_scans = [l for l in p.splitlines() if "Scan parquet" in l and "events" in l]
    assert len(ev_scans) == 0  # ran inside the checkpoint


def test_tpch_q2_pair_dedup_after_part_filter(spark, qs):
    """tpch_q2: the pair dedup shuffles only part-filtered lineitem rows
    (broadcast part filter BELOW the distinct), every dimension
    broadcasts, and the min-equality join-back never widens to a
    cartesian. The cand CTE feeds min + join-back from one checkpoint —
    the fact scan appears once."""
    p = plan(qs["tpch_q2_min_cost_supplier"](spark, SF))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # Both consumers (min aggregate + join-back) read the checkpointed
    # cand RDD — the lineitem parquet never re-scans in the final plan.
    assert not any(
        "ReadSchema" in l and "l_partkey" in l for l in p.splitlines()
    )
    assert "ExistingRDD" in p
    # deterministic LIMIT rides TakeOrdered, not a global sort.
    assert "TakeOrderedAndProject" in p


def test_tpch_q11_single_fact_aggregate(spark, qs):
    """tpch_q11: the val CTE feeds the total subquery AND the threshold
    filter from ONE localCheckpointed aggregate; the 1-row total joins
    back as a broadcast, and supplier/nation/part all broadcast."""
    p = plan(qs["tpch_q11_important_parts"](spark, SF))
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p
    # The fact scan feeds the checkpointed aggregate exactly once.
    assert (
        sum("l_partkey" in l for l in p.splitlines() if "ReadSchema" in l) <= 1
    )


def test_tpch_q12_date_range_pushes_residual_does_not(spark, qs):
    """tpch_q12: the shipdate range reaches the lineitem scan
    (PushedFilters), while the cross-relation lateness residual
    (l_shipdate > o_orderdate + 60d) evaluates post-join — and both
    conditional counts come from a single aggregate pass."""
    p = plan(qs["tpch_q12_late_priority_lines"](spark, SF))
    assert "GreaterThanOrEqual(l_shipdate" in p
    assert p.count("HashAggregate") >= 2  # partial + final, one pass
    assert "CartesianProduct" not in p


def test_tpch_q16_anti_join_and_filtered_dedup(spark, qs):
    """tpch_q16: the supplier exclusion set applies as a broadcast anti
    join; the pair dedup happens AFTER the broadcast part filter so only
    qualifying partkeys shuffle."""
    p = plan(qs["tpch_q16_supplier_part_counts"](spark, SF))
    assert "LeftAnti" in p
    assert "BroadcastHashJoin" in p


def test_tpch_q20_nested_semi_joins(spark, qs):
    """tpch_q20: both IN subqueries decorrelate to broadcast joins — the
    movers set applies to supplier as LEFT SEMI, and the LIKE-filtered
    part set broadcasts into the year-pruned fact scan."""
    p = plan(qs["tpch_q20_promotable_suppliers"](spark, SF))
    assert "LeftSemi" in p
    assert "GreaterThanOrEqual(l_shipdate" in p  # year range pushed
    assert "CartesianProduct" not in p


def test_ingest_gate_exact_corpus_never_repartitions(spark, qs):
    """pipe_ingest_neardup_gate_exact: the id-only candidate list and the
    batch shingle arrays broadcast into the verify joins — the corpus
    side must not flow through a SortMergeJoin (the silent regression
    would shuffle the whole corpus shingle table by id_b), and the
    whole plan stays broadcast-joined at fixture scale."""
    p = plan(qs["pipe_ingest_neardup_gate_exact"](spark, SF))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p
