"""Plan-shape regression tests: the physical plans the 100 TB design
depends on, pinned so a refactor can't silently regress them.

These assert the *strategy*, not timings: filters reach the parquet
scan (PushedFilters), projections prune the read schema, dimension
tables build while the fact table probes, and window/agg stages stay
inside whole-stage codegen.

AQE leg: a cluster deployment runs with AQE on, where runtime re-plans
(broadcast-threshold demotion, skew splits) could invalidate a pinned
shape. The session fixture reads SPARK_GRAFT_AQE at creation, so the
AQE-on leg is a second pytest invocation:

    SPARK_GRAFT_AQE=1 python -m pytest tests/test_plans.py -q

Both legs are green (r12, recorded in AQE_PLANPIN_r12.json). Pins that
need the finalized adaptive root collect() the DataFrame first — the
Dataset's own QueryExecution finalizes in place; a .write would plan a
fresh execution and leave this one unfinal.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q06_filter_pushdown_reaches_scan(spark, sf_dir):
    from polars_readstat_rs_spark.queries import QUERIES

    plan = _plan(QUERIES["q06_revenue_forecast"](spark, sf_dir))
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "l_shipdate" in pushed and "l_discount" in pushed and "l_quantity" in pushed


def test_q02_projection_prunes_read_schema(spark, sf_dir):
    from polars_readstat_rs_spark.queries import QUERIES

    plan = _plan(QUERIES["q02_filter_project"](spark, sf_dir))
    m = re.search(r"ReadSchema: struct<([^\n]*)", plan)
    assert m, plan
    # the 16-column lineitem scan must skip the columns q02 never touches
    # (the plan string truncates the schema, so assert on the visible
    # prefix: unused early columns must be absent, used ones present)
    visible = m.group(1)
    assert "l_orderkey" in visible and "l_quantity" in visible
    assert "l_partkey" not in visible and "l_suppkey" not in visible


def test_q05_lineitem_probes_never_builds(spark, sf_dir):
    """Every BroadcastExchange in the TPC-H Q5 plan must carry dimension
    columns, never lineitem fact columns (round-3 regression: the
    cust-first join order broadcast-built the whole fact table)."""
    from polars_readstat_rs_spark.queries import QUERIES

    plan = _plan(QUERIES["q05_nation_revenue"](spark, sf_dir))
    for block in plan.split("BroadcastExchange")[1:]:
        head = block.splitlines()[0]
        assert "l_extendedprice" not in head and "l_orderkey" not in head, head


def test_q05_semi_filters_prune_facts_before_shuffle(spark, sf_dir):
    """r11 rewrite pin: the region predicate's derived semi-filters
    (eligible suppliers -> lineitem, eligible customers -> orders) must
    appear as LeftSemi joins so ~60% of both fact tables is cut BEFORE
    the big equi-joins (measured 7.37 -> 3.91 s at sf10). Losing them
    (e.g. a refactor that re-roots the join) silently restores the
    unpruned shuffle volume."""
    from polars_readstat_rs_spark.queries import QUERIES

    plan = _plan(QUERIES["q05_nation_revenue"](spark, sf_dir))
    assert plan.count("LeftSemi") >= 4  # s/c nation semis + suppkey/custkey semis


def test_q01_whole_stage_codegen_covers_agg(spark, sf_dir):
    from polars_readstat_rs_spark.queries import QUERIES

    df = QUERIES["q01_pricing_summary"](spark, sf_dir)
    # collect() executes the Dataset's OWN QueryExecution, so the AQE
    # root is finalized in place and toString shows the real stages
    # (a .write would plan a fresh execution and leave this one unfinal)
    df.collect()
    plan = _plan(df)
    # AQE defaults off in the local factory (r8); when a deployment
    # enables it (SPARK_GRAFT_AQE=1) the executed root must be final
    if "AdaptiveSparkPlan" in plan:
        assert "isFinalPlan=true" in plan
    # '*(n)' prefixes mark operators fused into WholeStageCodegen stages;
    # both the partial and final HashAggregate must carry one
    assert len(re.findall(r"\*\(\d+\) HashAggregate", plan)) >= 2, plan[:900]


def test_salted_join_spreads_shuffle_keys(spark, sf_dir):
    """The salted join's shuffle must hash on (key, salt), not key alone."""
    from polars_readstat_rs_spark.operators import skew
    from polars_readstat_rs_spark.tables import load_table

    orders = load_table(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "custkey")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_nationkey"
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # surface the shuffle
    try:
        plan = _plan(skew.salted_join(orders, cust, "custkey"))
        m = re.search(r"hashpartitioning\(([^)]*)\)", plan)
        assert m and "__salt" in m.group(1), plan[:800]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_fuzzy_and_graph_plans_have_no_cartesian(spark, sf_dir):
    """The fuzzy-match and graph queries must pair rows only through
    equi-joins on block/vertex keys — a CartesianProduct or
    BroadcastNestedLoopJoin means the blocking broke."""
    from polars_readstat_rs_spark.queries import QUERIES

    plan = _plan(QUERIES["q44_fuzzy_match"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    # g01's final crossJoin of three ONE-ROW aggregates legitimately
    # plans as BroadcastNestedLoopJoin (scale-free); the data-sized
    # wedge/close joins must still be key joins.
    plan = _plan(QUERIES["g01_triangle_stats"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    # exactly the two scalar crossJoins, never a data-sized nested loop
    assert plan.count("BroadcastNestedLoopJoin") <= 2, plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan


def test_q46_range_frame_single_exchange(spark, sf_dir):
    """The trailing-window query needs exactly one shuffle (on
    o_custkey); both window aggregates must share it."""
    from polars_readstat_rs_spark.queries import QUERIES

    plan = _plan(QUERIES["q46_moving_window"](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning(o_custkey") == 1, plan
    assert "RunningWindowFunction" in plan or "Window" in plan


def test_p07_importance_sample_is_pure_filter(spark, sf_dir):
    """Importance sampling must stay a scan + filter: no Exchange at
    all in the plan (the 100 TB contract: sampling never shuffles)."""
    from polars_readstat_rs_spark.queries import QUERIES

    plan = _plan(QUERIES["p07_importance_sample"](spark, sf_dir))
    assert "Exchange" not in plan, plan
    assert "Filter" in plan


def test_t13_chunking_is_shuffle_free(spark, sf_dir):
    """Document chunking is per-row explode work — zero shuffles."""
    from polars_readstat_rs_spark.queries import QUERIES

    plan = _plan(QUERIES["t13_chunk_documents"](spark, sf_dir))
    assert "Exchange" not in plan, plan
    assert "Generate explode" in plan


def test_zorder_layout_clusters_both_dimensions(spark, sf_dir, tmp_path):
    """Range-partitioning by the Morton key must give each output file a
    bounding box far smaller than the global domain in BOTH dimensions —
    the property min/max stats pruning depends on. A layout sorted by
    one column alone fails this for the other column."""
    import glob

    from polars_readstat_rs_spark.operators.bucketing import write_zordered
    from polars_readstat_rs_spark.tables import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")).alias("day"),
    )
    path = str(tmp_path / "zorders")
    write_zordered(orders, path, ["o_custkey", "day"], files=8)

    stats = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        df = spark.read.parquet(f).agg(
            F.min("o_custkey"), F.max("o_custkey"), F.min("day"), F.max("day")
        ).collect()[0]
        stats.append(df)
    full = orders.agg(
        F.min("o_custkey"), F.max("o_custkey"), F.min("day"), F.max("day")
    ).collect()[0]
    cust_dom = full[1] - full[0] + 1
    day_dom = full[3] - full[2] + 1
    # average per-file bbox area must be well under the full domain area
    # (a random layout gives ~full area per file)
    areas = [(s[1] - s[0] + 1) * (s[3] - s[2] + 1) for s in stats]
    assert len(areas) >= 4
    assert sum(areas) / len(areas) < 0.5 * cust_dom * day_dom, areas


def test_tpch_suite_fact_never_broadcast(spark, sf_dir):
    """Across the q62-q75 TPC-H adaptation suite, no BroadcastExchange
    may carry lineitem or orders fact columns — dimensions build, facts
    probe (the q05 lesson, pinned for the whole suite)."""
    from polars_readstat_rs_spark.queries import QUERIES

    for name in (
        "q63_volume_shipping",
        "q64_market_share",
        "q65_profit",
        "q66_returned_items",
        "q69_promo_share",
        "q73_or_predicates",
    ):
        plan = _plan(QUERIES[name](spark, sf_dir))
        for block in plan.split("BroadcastExchange")[1:]:
            head = block.splitlines()[0]
            assert "l_extendedprice" not in head and "l_orderkey" not in head, (name, head)


def test_q62_exists_decorrelates_to_semi_join(spark, sf_dir):
    """The correlated EXISTS must become a join (semi / existence), not
    a per-row subquery plan."""
    from polars_readstat_rs_spark.queries import QUERIES

    plan = _plan(QUERIES["q62_priority_exists"](spark, sf_dir))
    assert re.search(r"(LeftSemi|ExistenceJoin)", plan), plan[:1500]


def test_q73_or_predicates_push_part_filters(spark, sf_dir):
    """The OR-branch brand/size predicates must reach the part scan
    (each branch constrains p_brand/p_size, so their disjunction is
    pushable)."""
    from polars_readstat_rs_spark.queries import QUERIES

    plan = _plan(QUERIES["q73_or_predicates"](spark, sf_dir))
    pushed = re.findall(r"PushedFilters: \[([^\]]*)", plan)
    assert any("p_brand" in p for p in pushed), pushed  # part scan: brand OR-branches
    assert any("l_quantity" in p for p in pushed), pushed  # lineitem: qty disjunction


def test_q82_scd2_windows_share_one_exchange(spark, sf_dir):
    """Both SCD2 window passes (change detection, interval stitching)
    partition on the same key, so the physical plan carries exactly ONE
    Exchange — a second one would double the shuffle at scale."""
    from polars_readstat_rs_spark.queries import QUERIES

    plan = _plan(QUERIES["q82_scd2_intervals"](spark, sf_dir))
    assert plan.count("Exchange") - plan.count("BroadcastExchange") == 1, plan[:1500]


def test_q83_pit_join_is_join_free(spark, sf_dir):
    """The point-in-time join must compile to union + window carry-
    forward: NO join operator anywhere (a range join would explode
    intervals at scale)."""
    from polars_readstat_rs_spark.queries import QUERIES

    plan = _plan(QUERIES["q83_point_in_time_join"](spark, sf_dir))
    assert not re.search(r"(SortMergeJoin|BroadcastHashJoin|BroadcastNestedLoopJoin)", plan), (
        plan[:1500]
    )


def test_v10_ann_join_no_cartesian_and_partial_topk(spark, sf_dir):
    """The two-sided ANN join must never plan a cartesian product, and
    the per-query top-k must install a WindowGroupLimit (map-side
    partial top-k) before the final rank filter."""
    from polars_readstat_rs_spark.queries import QUERIES

    plan = _plan(QUERIES["v10_ann_join"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan


def test_p04_pack_sequences_single_exchange(spark, sf_dir):
    """pack_sequences (r9): the pack_pos window partitions by
    (_grp, pack_id), which the cumsum window's hash partitioning on
    (_grp) already clusters — EnsureRequirements must insert exactly ONE
    exchange (the r8 shape re-shuffled on pack_id: two)."""
    from polars_readstat_rs_spark.queries import QUERIES

    plan = _plan(QUERIES["p04_pack_sequences"](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_p06_and_d02_join_on_hashed_shingles(spark, sf_dir):
    """The contamination membership join and the jaccard intersection
    self-join key on xxhash64(shingle) longs, not raw n-gram strings —
    the shuffle-bytes contract for 100 TB corpora (r9)."""
    from polars_readstat_rs_spark.queries import QUERIES

    for q in ("p06_contamination", "d02_dedup_ngram_jaccard"):
        plan = _plan(QUERIES[q](spark, sf_dir))
        assert "xxhash64" in plan, q
        from polars_readstat_rs_spark.operators.dedup import release_cached

        release_cached(QUERIES[q](spark, sf_dir))


def test_q01_cents_aggregation_shape(spark, sf_dir):
    """q01 (r9): level-1 partial aggregation sums LONGS (integer cents),
    not decimals — no Int128/BigDecimal sum buffer in the per-row hot
    stage; the only decimal math sits above the second (tiny) agg."""
    from polars_readstat_rs_spark.queries import QUERIES

    df = QUERIES["q01_pricing_summary"](spark, sf_dir)
    plan = _plan(df)
    # two aggregation levels on the cents columns
    assert plan.count("HashAggregate") >= 4  # partial+final x 2 levels
    # the scan-side stage must carry round(x*100) cents math
    assert "round(" in plan and "cast(round(" in plan


def test_p14_priority_sample_uses_partial_topk(spark, sf_dir):
    """Priority sampling must plan TakeOrderedAndProject (per-partition
    partial top-k, k+1 rows survive per partition) — never a global
    Sort + Limit, which would single-task the whole corpus."""
    from polars_readstat_rs_spark.queries import QUERIES

    plan = _plan(QUERIES["p14_priority_sample"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "GlobalLimit" not in plan


def test_p15_clean_corpus_single_scan(spark, sf_dir):
    """The fused cleaning pipeline must read documents ONCE (the
    operator-join formulation scanned it three times) and keep the
    langid+Gopher filters in the scan stage."""
    from polars_readstat_rs_spark.queries import QUERIES

    plan = _plan(QUERIES["p15_clean_corpus"](spark, sf_dir))
    assert plan.count("Scan parquet") == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    # rank-limit pushdown: the rn=1 dedup window partially deduplicates
    # map-side before the exchange
    assert "WindowGroupLimit" in plan


def test_d16_winnowing_selection_is_map_only(spark, sf_dir):
    """Winnowing fingerprint SELECTION must not shuffle: the only
    exchanges in the pair join belong to the distinct + groupBy on the
    fingerprint/pair keys, and nothing re-sorts whole documents."""
    from polars_readstat_rs_spark.operators import dedup
    from polars_readstat_rs_spark.tables import load_table

    fps = dedup.winnow_fingerprints(load_table(spark, sf_dir, "documents"))
    assert "Exchange" not in _plan(fps)


def test_v15_moments_aggregate_partially(spark, sf_dir):
    """The Gramian pass must partial-aggregate map-side: two
    HashAggregates (partial + final) around ONE exchange, so each task
    ships at most d(d+1)/2 rows regardless of corpus size."""
    from polars_readstat_rs_spark.queries import QUERIES

    plan = _plan(QUERIES["v15_embedding_moments"](spark, sf_dir))
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Exchange") == 1


def test_d17_bloom_probe_broadcasts_bit_table(spark, sf_dir):
    """The Bloom probe must broadcast the bounded bit table — incoming
    batches never sort-merge against history-derived rows."""
    from polars_readstat_rs_spark.queries import QUERIES

    plan = _plan(QUERIES["d17_bloom_membership"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_t24_kmv_uses_partial_topk(spark, sf_dir):
    """The k-smallest-hashes pass must plan TakeOrderedAndProject (k
    rows survive per partition), never a global sort of the distinct
    hash set."""
    from polars_readstat_rs_spark.queries import QUERIES

    plan = _plan(QUERIES["t24_kmv_ndv"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "GlobalLimit" not in plan


def test_t23_cms_sketch_aggregates_partially(spark, sf_dir):
    """Count-min cells must partial-aggregate map-side: a partial and a
    final HashAggregate around the (row, bucket) exchange, so each task
    ships at most k*m cells."""
    from polars_readstat_rs_spark.operators import textstats
    from polars_readstat_rs_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = docs  # cms_token_freq builds everything internally
    plan = _plan(textstats.cms_token_freq(toks))
    assert plan.count("HashAggregate") >= 2


def test_q89_sql_udf_inlines_no_python(spark, sf_dir):
    """Declarative SQL UDFs must inline into codegen — the plan carries
    no Python evaluation node and both aggregate stages stay starred
    (whole-stage codegen)."""
    from polars_readstat_rs_spark.queries import QUERIES

    df = QUERIES["q89_sql_udf"](spark, sf_dir)
    # collect() finalizes the AQE root in place (see q01 pin) so the
    # codegen stars are visible under SPARK_GRAFT_AQE=1 too
    df.collect()
    plan = _plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert re.search(r"\*\(\d+\) HashAggregate", plan), plan[:900]


def test_q88_variant_stays_map_side(spark, sf_dir):
    """The VARIANT column must never shuffle: parse_json + variant_get
    happen in the scan-side projection, and the only exchange carries
    the extracted scalar columns."""
    from polars_readstat_rs_spark.queries import QUERIES

    plan = _plan(QUERIES["q88_variant_extract"](spark, sf_dir))
    assert "BatchEvalPython" not in plan
    # the exchange output must not contain a variant-typed attribute
    for block in plan.split("Exchange")[1:]:
        head = block.splitlines()[0]
        assert "variant" not in head.lower()


def test_m14_probe_is_pure_codegen(spark, sf_dir):
    """probe_media must stay a map-only codegen projection: no Python
    eval node for the probe itself (payload SYNTHESIS is mapInPandas —
    a fixture concern) and no exchange anywhere (header probing is
    embarrassingly parallel)."""
    from polars_readstat_rs_spark.queries import QUERIES

    plan = _plan(QUERIES["m14_media_probe"](spark, sf_dir))
    assert "Exchange" not in plan
    # exactly the synthesis mapInPandas stages (one per format), no more:
    # the probe adds zero Python nodes on top of the fixture generators
    assert plan.count("MapInPandas") == 3


def test_q24_integer_bucket_no_window_struct(spark, sf_dir):
    """q24's tumbling-window agg must group on the integer bucket, not
    the per-row window struct: two-phase hash aggregate around one
    exchange, no 'window(' expression or expand node in the plan."""
    from polars_readstat_rs_spark.queries import QUERIES

    plan = _plan(QUERIES["q24_windowed_agg"](spark, sf_dir))
    assert plan.count("Exchange") == 1
    assert plan.count("HashAggregate") == 2
    assert "window(" not in plan and "Expand" not in plan


def test_v01_kernel_prunes_pair_stream(spark, sf_dir):
    """brute_force_topk's plan: one mapInPandas scoring pass feeding the
    rank window through ONE exchange — the kernel's per-batch top-(k+1)
    pre-selection means no blow-up stage exists between them."""
    from polars_readstat_rs_spark.queries import QUERIES

    plan = _plan(QUERIES["v01_cosine_topk"](spark, sf_dir))
    assert plan.count("MapInPandas") == 1
    assert plan.count("Exchange") == 1


def test_q92_fact_scan_is_dynamically_pruned(spark, sf_dir):
    """q92 pin: the partitioned fact scan must carry a dynamicpruning
    partition filter fed by the broadcast dim (DPP — the mechanism that
    reads O(selected partitions) of a partitioned 100 TB fact). A
    regression to a full 5-partition scan keeps the values right, so
    only this plan pin catches it."""
    from polars_readstat_rs_spark.queries import QUERIES

    df = QUERIES["q92_partition_pruned_join"](spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    m = re.search(r"PartitionFilters: \[([^\n]*)", plan)
    assert m, plan
    assert "dynamicpruning" in m.group(1), m.group(1)
    assert "BroadcastHashJoin" in plan


def test_exact_rerank_is_broadcast_only(spark, sf_dir):
    """exact_rerank pin: both the candidate set and the query matrix
    broadcast into the corpus scan — the only shuffle is the per-query
    rank window. A plan that shuffles the corpus on vec_id would stop
    scaling with corpus size."""
    from polars_readstat_rs_spark.operators import similarity
    from polars_readstat_rs_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    cand = similarity.pq_topk(emb, queries_df, k=40, m=2, ksub=8).select(
        "q_id", "vec_id"
    ).localCheckpoint()
    plan = _plan(similarity.exact_rerank(emb, queries_df, cand, k=10))
    assert plan.count("BroadcastHashJoin") == 2, plan.count("BroadcastHashJoin")
    # one shuffle total: the rank window's partition on q_id
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_m15_collate_window_partitions_on_bucket_and_shard(spark, sf_dir):
    """collate_batches pin: the batching window must partition on
    (bucket_len, shard) — not bucket_len alone — so the per-bucket sort
    parallelism scales with the shard count instead of funnelling the
    corpus through ~n_buckets tasks."""
    from polars_readstat_rs_spark.queries import QUERIES

    plan = _plan(QUERIES["m15_collate_manifest"](spark, sf_dir))
    m = re.search(r"hashpartitioning\(bucket_len[^\)]*\)", plan)
    assert m, plan
    assert "shard" in m.group(0), m.group(0)


def test_q93_join_has_no_key_exchange(spark, sf_dir):
    """q93 pin: the bucketed layout must satisfy both sides' hash
    distribution — the SortMergeJoin runs with NO exchange on custkey
    (the only shuffle left is the tiny mktsegment agg). An exchange on
    custkey means the write-time pre-shuffle stopped being recognized
    and every downstream join pays the full fact shuffle again."""
    from polars_readstat_rs_spark.queries import QUERIES

    plan = _plan(QUERIES["q93_bucketed_colocated_join"](spark, sf_dir))
    assert "SortMergeJoin" in plan
    assert "hashpartitioning(custkey" not in plan, plan


def test_p18_compaction_planner_single_exchange(spark, sf_dir):
    """The compaction planner must plan over ONE exchange on the
    partition key: the eligibility count (unordered window), the
    size-DESC packing window, and the (part, job_idx) job aggregate all
    reuse the part-hash partitioning. A second exchange means the
    manifest is being reshuffled per planning step — wrong at 1e6+
    manifest entries."""
    from polars_readstat_rs_spark.queries import QUERIES

    plan = _plan(QUERIES["p18_compaction_plan"](spark, sf_dir))
    assert plan.count("Exchange") == 1
    assert "BatchEvalPython" not in plan and "Cartesian" not in plan


def test_m16_payload_dedup_is_join_free(spark, sf_dir):
    """The keep-id assignment must be a window min over the checksum
    partitioning — NOT a groupBy+join back (which would shuffle the
    payload table twice and carry a join). Expected shape: one
    checksum exchange for the window, one tiny exchange of map-side
    partially-aggregated per-source rows; no join of any kind."""
    from polars_readstat_rs_spark.queries import QUERIES

    plan = _plan(QUERIES["m16_payload_dedup_manifest"](spark, sf_dir))
    assert "Join" not in plan and "Cartesian" not in plan
    assert plan.count("Exchange") <= 2
    assert "Window" in plan


def test_t29_entropy_two_aggs_no_join(spark, sf_dir):
    """Token entropy is explode -> (doc,tok) agg -> (doc) agg: two
    aggregation levels with map-side partials, no joins, no windows,
    and no more than two exchanges."""
    from polars_readstat_rs_spark.queries import QUERIES

    plan = _plan(QUERIES["t29_token_entropy"](spark, sf_dir))
    assert "Join" not in plan and "Window" not in plan
    assert "Generate explode" in plan
    assert plan.count("HashAggregate") >= 4  # partial+final x 2 levels
    assert plan.count("Exchange") <= 2


def test_r28_local_read_roots_in_local_relation(spark, sf_dir):
    """The local fast path must NOT plan a DataSource scan — its input
    is an Arrow-backed local relation (LocalTableScan), proving no
    planning worker or executor read task is involved."""
    from polars_readstat_rs_spark.queries import QUERIES

    plan = _plan(QUERIES["r28_local_read_parity"](spark, sf_dir))
    assert "LocalTableScan" in plan
    assert "BatchScan" not in plan and "PythonDataSource" not in plan
