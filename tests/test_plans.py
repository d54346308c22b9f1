"""Physical-plan assertions — the 100 TB posture, enforced.

These tests pin the *shape* of the executed plans, not their results:
small dims stay broadcast, filters reach the parquet scans, the hot path
stays inside WholeStageCodegen, and no operator silently falls back to
row-at-a-time Python. A refactor that keeps results correct but regresses
any of these would pass the oracle gate and still be wrong at scale —
this file is what catches it.
"""

from __future__ import annotations

import pytest

from guidance_for_analytics_observability_on_aws_spark.plans.registry import REGISTRY


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


BROADCAST_QUERIES = [
    "star_join_broadcast",
    "tpch_q5_local_supplier",
    "tpch_q3_shipping_priority",
    "promo_revenue_share",
]


@pytest.mark.parametrize("name", BROADCAST_QUERIES)
def test_small_dims_are_broadcast(spark, sf_dir, name):
    plan = _executed_plan(REGISTRY[name].builder(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, f"{name}: no broadcast join in plan"
    assert "SortMergeJoin" not in plan or name in (
        "tpch_q3_shipping_priority",
        "tpch_q5_local_supplier",
    ), f"{name}: unexpected sort-merge join for a dim-join query"


def test_filters_pushed_to_parquet_scan(spark, sf_dir):
    # Q3 filters mktsegment + two date bounds; all should reach the scans.
    df = REGISTRY["tpch_q3_shipping_priority"].builder(spark, sf_dir)
    explained = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters: [" in explained
    pushed = [
        line
        for line in explained.splitlines()
        if "PushedFilters" in line and "PushedFilters: []" not in line
    ]
    assert pushed, "no non-empty PushedFilters on any scan"


def test_scan_prunes_columns(spark, sf_dir):
    # lineitem has 16 columns; Q1 touches 7. ReadSchema must not be SELECT *.
    df = REGISTRY["tpch_q1_pricing_summary"].builder(spark, sf_dir)
    explained = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    schema_lines = [l for l in explained.splitlines() if "ReadSchema" in l]
    assert schema_lines and all("l_comment" not in l for l in schema_lines)


def test_hot_path_stays_in_codegen(spark, sf_dir):
    # Under AQE the codegen stages only appear in the FINAL plan, so run
    # the query first and then read the adaptively-executed plan back.
    df = REGISTRY["tpch_q1_pricing_summary"].builder(spark, sf_dir)
    df.collect()  # a write would plan its own QueryExecution; collect finalizes this one
    plan = _executed_plan(df)
    assert "isFinalPlan=true" in plan
    # "*(n)" is the simple-string marker for a WholeStageCodegen stage.
    assert "*(" in plan, f"no codegen stage in final plan:\n{plan}"


def test_no_row_python_udfs_anywhere(spark, sf_dir):
    """Row-at-a-time Python (BatchEvalPython) is banned in every query.

    Arrow-batched pandas plans (mm_decode_frames) are the one sanctioned
    Python path, per the multimodal spec.
    """
    pandas_sanctioned = {
        "mm_decode_frames",
        "mm_resize",
        "dedup_embedding_cosine_blas",
    }
    for name, spec in REGISTRY.items():
        if name in ("stream_collector_pipeline", "stream_stage_agg"):
            continue  # run streaming jobs on build; covered in test_streaming
        plan = _executed_plan(spec.builder(spark, sf_dir))
        assert "BatchEvalPython" not in plan, f"{name}: row-Python UDF in plan"
        if name not in pandas_sanctioned:
            assert "MapInPandas" not in plan and "FlatMapGroupsInPandas" not in plan, (
                f"{name}: unexpected pandas path"
            )


def test_approx_cardinality_close_to_exact(spark, sf_dir):
    exact = REGISTRY["obs_cardinality"].builder(spark, sf_dir).collect()[0]
    approx = REGISTRY["obs_cardinality_approx"].builder(spark, sf_dir).collect()[0]
    assert approx["n_tasks"] == exact["n_tasks"]  # plain count stays exact
    for tile in ("n_apps", "n_runs", "n_jobs", "n_stages", "n_executors"):
        e, a = exact[tile], approx[tile]
        assert abs(a - e) <= max(2, 0.10 * e), f"{tile}: approx {a} vs exact {e}"


def test_approx_cardinality_is_single_pass(spark, sf_dir):
    # The scale rationale: one partial_aggregate over sketches, no
    # expand/distinct shuffle like the exact multi-countDistinct plan.
    plan = _executed_plan(REGISTRY["obs_cardinality_approx"].builder(spark, sf_dir))
    assert "Expand" not in plan
    exact_plan = _executed_plan(REGISTRY["obs_cardinality"].builder(spark, sf_dir))
    assert "Expand" in exact_plan  # documents what the sketch path avoids


def test_approx_percentiles_close_to_exact(spark, sf_dir):
    exact = {
        r["event_type"]: r.asDict()
        for r in REGISTRY["obs_task_percentiles"].builder(spark, sf_dir).collect()
    }
    approx = {
        r["event_type"]: r.asDict()
        for r in REGISTRY["obs_task_percentiles_approx"].builder(spark, sf_dir).collect()
    }
    assert set(approx) == set(exact)
    # Sketch accuracy is a RANK guarantee, not a value guarantee (a heavy
    # tail makes adjacent order statistics numerically far apart), so check
    # each approx value's rank against the target rank.
    from guidance_for_analytics_observability_on_aws_spark.sources.tables import load_tables
    from guidance_for_analytics_observability_on_aws_spark.sources.telemetry import task_metrics

    vals = (
        task_metrics(load_tables(spark, sf_dir)["events"])
        .select("event_type", "value")
        .toPandas()
    )
    for et, e in exact.items():
        a = approx[et]
        assert a["n_tasks"] == e["n_tasks"]
        group = sorted(vals[vals["event_type"] == et]["value"])
        n = len(group)
        for frac, p in [(0.25, "p25"), (0.5, "p50"), (0.75, "p75"), (0.99, "p99")]:
            rank = sum(1 for v in group if v <= a[p])
            target = frac * n
            assert abs(rank - target) <= max(2, 0.01 * n), (
                f"{et}.{p}: approx {a[p]} has rank {rank}, target {target:.0f} of {n}"
            )


def test_no_cartesian_products(spark, sf_dir):
    """No registered query may degenerate into an unconditional cross join."""
    for name, spec in REGISTRY.items():
        if name in ("stream_collector_pipeline", "stream_stage_agg"):
            continue
        plan = _executed_plan(spec.builder(spark, sf_dir))
        assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """S6: joining two tables bucketed on the join key must plan with ZERO
    shuffles (the write-once-join-many layout for fact⋈fact at scale)."""
    from guidance_for_analytics_observability_on_aws_spark.sources.bucketed import (
        bucketed_join,
        write_bucketed,
    )
    from guidance_for_analytics_observability_on_aws_spark.sources.tables import (
        load_tables,
    )

    t = load_tables(spark, sf_dir)
    write_bucketed(
        t["orders"], "b_orders", str(tmp_path / "b_orders"), "o_custkey", 8
    )
    write_bucketed(
        t["customer"], "b_customer", str(tmp_path / "b_customer"), "c_custkey", 8
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a real SMJ so absence-of-Exchange proves bucket co-location
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "b_orders", "b_customer", "o_custkey", "c_custkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # results still correct vs a plain join
        want = t["orders"].join(
            t["customer"], t["orders"]["o_custkey"] == t["customer"]["c_custkey"]
        ).count()
        assert joined.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_runtime_bloom_filter_injection(spark, sf_dir):
    """The optimizer must inject a runtime bloom filter on the probe side
    of a shuffle join whose build side is selectively filtered — at 100 TB
    this prunes probe rows before the shuffle instead of after the join.
    (Thresholds lowered because the test tables are tiny; the assert pins
    that the capability is wired, not the default trigger sizes.)"""
    from pyspark.sql import functions as F

    from guidance_for_analytics_observability_on_aws_spark.sources.tables import (
        load_tables,
    )

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        t = load_tables(spark, sf_dir)
        j = t["lineitem"].join(
            t["orders"].filter(F.col("o_orderpriority") == "1-URGENT"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = j.groupBy("o_orderstatus").count()._jdf.queryExecution()
        assert "bloom_filter_agg" in plan.optimizedPlan().toString()
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join(spark):
    """AQE must split a skewed shuffle-join partition at runtime (the
    no-code-change answer to hot keys at 100 TB; thresholds lowered to
    provoke it on synthetic data — the assert pins the capability)."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        hot = spark.range(200000).select(
            (F.col("id") * 0).alias("k"), F.col("id").alias("v")
        )
        uniform = spark.range(20000).select(
            (F.col("id") % 100 + 1).alias("k"), F.col("id").alias("v")
        )
        right = spark.range(101).select(
            F.col("id").alias("k"), (F.col("id") * 7).alias("w")
        )
        j = hot.unionAll(uniform).join(right, "k")
        assert len(j.collect()) == 220000
        # same QueryExecution: AQE's final plan shows the skew split
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_metric_log_correlate_is_equi_join(spark, sf_dir):
    """O41's time-range correlation must compile to a HASH EQUI-JOIN on the
    (executor, bucket) composite key with the range predicate as residual —
    never a nested-loop/cartesian fallback (the naive inequality-join shape
    the oracle deliberately states)."""
    plan = _executed_plan(REGISTRY["obs_metric_log_correlate"].builder(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan
    assert "bucket" in plan, "bucketed equi-key missing from join"


def test_decontaminate_broadcasts_benchmark_set(spark, sf_dir):
    """P6: the benchmark shingle dictionary must broadcast; the corpus side
    must never shuffle its exploded shingles for the join."""
    plan = _executed_plan(REGISTRY["decontaminate"].builder(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bench_steal_attribution_helpers():
    """r16: per-region hypervisor-steal attribution in bench.py. The
    jiffies reader must parse /proc/stat's cumulative steal counter on
    Linux and degrade to None (never raise) elsewhere; the rate helper
    folds two reads into jiffies-per-wall-second and rejects degenerate
    regions; probe spacing stays at most 5 runners (a measured r16
    sandbox put steal bursts inside a 10-runner segment whose bracketing
    probes both read clean)."""
    import os

    import bench

    s = bench._steal_jiffies()
    if os.path.exists("/proc/stat"):
        assert isinstance(s, int) and s >= 0
        assert bench._steal_jiffies() >= s  # cumulative counter is monotone
    assert bench._steal_rate(None, 5, 1.0) is None
    assert bench._steal_rate(5, None, 1.0) is None
    assert bench._steal_rate(100, 150, 0.0) is None
    assert bench._steal_rate(100, 150, 2.0) == 25.0
    assert bench._ROWS_PROBE_EVERY <= 5


def test_driver_window_composition():
    """The verification driver samples the FIRST 50 registry entries.
    Pin the window's composition so a registry edit cannot silently
    displace sql-backed entries out of the driver's view."""
    names = list(REGISTRY)
    first50 = names[:50]
    # r16 rotation: an optimization round registers nothing new, so the
    # window is group 2 of the recipe wall-to-wall — the 50 entries whose
    # CODE/plan changed across the r15-r16 optimization commits (shared
    # candidate-graph frames + prefix-filter truth; trained-family
    # cold-path rework; per-glob state sizing incl. the five stateful.py
    # sites; split ingest-gate indexes). 13 are sql-backed (hash-exact
    # checks) — exactly the 13 oracled entries the round's commits
    # touched; the rest are the rows-only trained/streaming runners
    # (see _PRIORITY's comment and SURVEY §2).
    n_sql = sum(1 for n in first50 if REGISTRY[n].oracle is not None)
    assert n_sql == 13, f"{n_sql} sql-backed entries in the driver window"
    head = (
        "corpus_curation_pipeline",
        "corpus_curation_pipeline_v2",
        "corpus_curation_pipeline_v3",
        "dedup_eval_report",
        "similarity_pq",
        "similarity_ivf_pq",
        "similarity_ivf_pq_residual",
        "similarity_ivf_pq_multiprobe",
        "similarity_eval_report",
        "embedding_kmeans",
        "similarity_ivf_trained",
        "dedup_semantic_trained",
        "similarity_index_persist_report",
        "dedup_minhash_lsh",
        "dedup_minhash_estimate",
        "dedup_containment_banded",
        "dup_groups",
        "dup_groups_star",
        "dup_groups_incremental",
        "split_leak_proof",
    )
    assert tuple(first50[: len(head)]) == head
    # spot-check the changed streaming block is inside the window:
    for expected in (
        "stream_ewma_smooth",            # stateful.py site newly sized
        "stream_repeated_spans_scrub",   # split committed-side index
        "stream_prefix_dedup_ingest",    # split committed-side index
        "stream_semantic_dedup_ingest",  # split committed-side index
        "source_incremental_view",       # slot 50, sizing glob change
    ):
        assert expected in first50, f"{expected} fell out of the driver window"
    # and unchanged already-green entries must NOT re-occupy scarce slots
    # (the rotation contract: never-checked, then code-changed, then AGED
    # — the r15 window's entries are all freshly green and rotate out;
    # stream_paragraph_decon_ingest alone re-enters, as a CHANGED entry):
    for fresh_green in (
        "decontaminate_paragraph",      # r15-green, unchanged
        "obs_dashboard_parity",         # r15-green, unchanged
        "decontaminate_eval_report",    # r15-green, unchanged this round
        "dup_groups_nightly",           # r15-green, builder unchanged
        "obs_ewma_smooth",              # r15-green, unchanged (its TWIN
                                        # runner changed, not the batch op)
        "dedup_cdc_chunks",             # r15-green, unchanged
        "obs_alert_rules",              # r15-green, unchanged
        "asof_join_attribution",        # r15-green backfill, unchanged
        "decontaminate_neardup",        # r15-green backfill, unchanged
    ):
        assert fresh_green not in first50, (
            f"{fresh_green} wastes a driver-window slot"
        )


def test_gopher_gates_plan_zero_exchange(spark, sf_dir):
    """X21/X22's 'cheapest gate in the funnel, run it first' claim is a
    PLAN property, not prose: both rule sets must compile to a single
    narrow projection over the scan — zero Exchange anywhere (the line
    re-wrapping in X22 is per-row array algebra, not an explode+groupBy)."""
    for name in ("text_gopher_quality", "text_gopher_line_shape"):
        plan = _executed_plan(REGISTRY[name].builder(spark, sf_dir))
        assert "Exchange" not in plan, f"{name} shuffles: {plan}"


def test_stratified_sample_uses_window_group_limit(spark, sf_dir):
    """P2's rank<=N filter must push into the window sort as
    WindowGroupLimit (partial top-N per partition before the shuffle) —
    the property that keeps the sample cheap at any stratum size."""
    plan = _executed_plan(REGISTRY["sample_stratified"].builder(spark, sf_dir))
    assert "WindowGroupLimit" in plan


def test_banded_dedup_plan_reads_only_checkpoints(spark, sf_dir):
    """D15's scoring join must consume ONLY the two localCheckpoint
    materializations (candidate pairs + candidate-doc shingle base) — a
    parquet scan in the final plan would mean the MinHash/LSH subtree is
    being re-derived per reference (the 41-Exchange regression this
    operator's checkpoints exist to prevent)."""
    plan = _executed_plan(REGISTRY["dedup_containment_banded"].builder(spark, sf_dir))
    assert "Scan parquet" not in plan
    assert "Scan ExistingRDD" in plan  # the checkpointed inputs


def test_banded_dedup_single_corpus_scan(spark, sf_dir, monkeypatch):
    """The (doc_id, toks) shingle base must be DERIVED FROM documents
    exactly once and shared into both the MinHash/LSH pass and the
    candidate-restricted scoring pass — a second _shingle_base call means
    a second full corpus scan at 100 TB."""
    from guidance_for_analytics_observability_on_aws_spark.operators import dedup

    calls = []
    real = dedup._shingle_base

    def counting(documents):
        calls.append(1)
        return real(documents)

    monkeypatch.setattr(dedup, "_shingle_base", counting)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # This pins the COLD build's scan count; since r16 a warm session can
    # serve the whole banded frame from the shared-frame registry (zero
    # scans), so clear it first.
    from guidance_for_analytics_observability_on_aws_spark.operators.similarity import (
        trained_cache_clear,
    )

    trained_cache_clear(loaded_too=False)
    dedup.dedup_containment_banded(docs)
    assert len(calls) == 1, f"_shingle_base derived {len(calls)}× from documents"
    trained_cache_clear(loaded_too=False)


def test_log_sample_uses_window_group_limit(spark, sf_dir):
    """O51's rank<=5 filter must rewrite as WindowGroupLimit so a hot
    (executor, minute) key costs a per-partition partial top-5, not a full
    sorted materialization of every log record in the key."""
    plan = _executed_plan(REGISTRY["obs_log_sample"].builder(spark, sf_dir))
    assert "WindowGroupLimit" in plan


def test_straggler_stats_join_is_broadcast(spark, sf_dir):
    """O50's join-back of per-stage medians against the task table must
    broadcast the stats side (one row per stage << task rows) — a
    shuffle join here would re-shuffle the whole task table at 100 TB."""
    plan = _executed_plan(REGISTRY["obs_straggler_detect"].builder(spark, sf_dir))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_q9_profit_broadcasts_part_and_supplier(spark, sf_dir):
    """T37: the filtered part dim and supplier⋈nation dim must broadcast
    into the lineitem stream — a shuffle join on either would move the
    whole fact table for a dim-sized input."""
    plan = _executed_plan(REGISTRY["tpch_q9_profit"].builder(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2


def test_q11_total_is_broadcast_not_window(spark, sf_dir):
    """T38: the global-total side must reach the per-part frame as a
    broadcast (1-row BroadcastNestedLoopJoin), never a windowless SUM
    that would funnel every per-part row through one partition."""
    plan = _executed_plan(REGISTRY["tpch_q11_important_parts"].builder(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    assert "Window" not in plan


def test_bigram_lift_single_corpus_scan_and_group_limit(spark, sf_dir):
    """X14: the two count tables are checkpointed (each is referenced
    twice downstream), so the final plan reads only ONE parquet scan of
    documents plus checkpoint RDDs; the top-N rank stays WindowGroupLimit."""
    plan = _executed_plan(REGISTRY["text_bigram_lift"].builder(spark, sf_dir))
    assert "WindowGroupLimit" in plan
    assert plan.count("Scan parquet") == 0  # counts come from checkpoints
    assert "Scan ExistingRDD" in plan


def test_top_movers_and_seasonal_span_are_broadcast(spark, sf_dir):
    """O56/O57: the 1-row span frames must reach the fact stream as
    broadcasts (BroadcastNestedLoopJoin for the unconditioned join) —
    a shuffle here would re-partition the whole task table for one row."""
    for name in ("obs_top_movers", "obs_seasonal_baseline"):
        plan = _executed_plan(REGISTRY[name].builder(spark, sf_dir))
        assert "BroadcastNestedLoopJoin" in plan, f"{name}: span not broadcast"


def test_q2_filters_broadcast_into_pair_stream(spark, sf_dir):
    """T41: the region-supplier semi-join and typed-part filter must
    broadcast into lineitem before the pair aggregation."""
    plan = _executed_plan(REGISTRY["tpch_q2_min_cost_supplier"].builder(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2


ORDER_STAT_FAMILY = [
    "task_percentiles",
    "percentile_timeline",
    "anomaly_mad",
    "cusum_drift",
    "tail_sampling",
    "orders_ship_latency",
]


@pytest.mark.parametrize("name", ORDER_STAT_FAMILY)
def test_order_stat_family_distributed_bit_equal(spark, sf_dir, name):
    """r8: every order-statistic operator's ``distributed=True`` path
    (the shared `_ranked_with_n` two-phase rank / `_prefix_sum` running
    sum) must be BIT-identical to the window formulation, and its plan
    must actually avoid the single-partition group sort: the two-phase
    plan carries the `_pid` slice column; the window plan must not."""
    from guidance_for_analytics_observability_on_aws_spark.operators import (
        observability as obs,
    )
    from guidance_for_analytics_observability_on_aws_spark.operators.tpch import (
        orders_ship_latency,
    )
    from guidance_for_analytics_observability_on_aws_spark.sources.tables import (
        load_tables,
    )
    from guidance_for_analytics_observability_on_aws_spark.sources.telemetry import (
        task_metrics,
    )

    tables = load_tables(spark, sf_dir)
    if name == "orders_ship_latency":
        def build(d):
            return orders_ship_latency(tables["lineitem"], tables["orders"], d)
    else:
        tm = task_metrics(tables["events"])

        def build(d):
            return getattr(obs, name)(tm, d)

    win, dist = build(False), build(True)
    rows_w = sorted((tuple(r) for r in win.collect()), key=str)
    rows_d = sorted((tuple(r) for r in dist.collect()), key=str)
    assert rows_w == rows_d, f"{name}: distributed path diverged"
    assert rows_w, f"{name}: empty result"
    plan_w, plan_d = _executed_plan(win), _executed_plan(dist)
    assert "_pid" in plan_d, f"{name}: distributed plan lacks slice ranks"
    assert "_pid" not in plan_w, f"{name}: window plan unexpectedly sliced"


GLOBAL_RANK_FAMILY = [
    "customers_abc_pareto",
    "customers_rfm_segments",
    "vocab_coverage",
    "heavy_hitters_cms",
    "top_movers",
]


@pytest.mark.parametrize("name", GLOBAL_RANK_FAMILY)
def test_global_rank_family_distributed_bit_equal(spark, sf_dir, name):
    """r9: the five operators that rank data-dependent cardinalities
    (customers, vocabulary types, sketch keys, executors — all of which
    GROW with the corpus) now take ``distributed=True`` through the
    shared `_ranked_with_n`/`_prefix_sum` two-phase rank: bit-identical
    to the global-window formulation, and the distributed plan carries
    the `_pid` slice ranks while the window plan must not."""
    from guidance_for_analytics_observability_on_aws_spark.operators.observability import (
        heavy_hitters_cms,
        top_movers,
    )
    from guidance_for_analytics_observability_on_aws_spark.operators.pipeline import (
        vocab_coverage,
    )
    from guidance_for_analytics_observability_on_aws_spark.operators.tpch import (
        customers_abc_pareto,
        customers_rfm_segments,
    )
    from guidance_for_analytics_observability_on_aws_spark.sources.tables import (
        load_tables,
    )
    from guidance_for_analytics_observability_on_aws_spark.sources.telemetry import (
        task_metrics,
    )

    tables = load_tables(spark, sf_dir)
    builders = {
        "customers_abc_pareto": lambda d: customers_abc_pareto(
            tables["orders"], distributed=d
        ),
        "customers_rfm_segments": lambda d: customers_rfm_segments(
            tables["orders"], distributed=d
        ),
        "vocab_coverage": lambda d: vocab_coverage(
            tables["documents"], distributed=d
        ),
        "heavy_hitters_cms": lambda d: heavy_hitters_cms(
            task_metrics(tables["events"]), distributed=d
        ),
        "top_movers": lambda d: top_movers(
            task_metrics(tables["events"]), distributed=d
        ),
    }
    win, dist = builders[name](False), builders[name](True)
    rows_w = sorted((tuple(r) for r in win.collect()), key=str)
    rows_d = sorted((tuple(r) for r in dist.collect()), key=str)
    assert rows_w == rows_d, f"{name}: distributed path diverged"
    assert rows_w, f"{name}: empty result"
    plan_w, plan_d = _executed_plan(win), _executed_plan(dist)
    assert "_pid" in plan_d, f"{name}: distributed plan lacks slice ranks"
    assert "_pid" not in plan_w, f"{name}: window plan unexpectedly sliced"


def test_r8_operator_plan_shapes(spark, sf_dir):
    """Physical-plan pins for the round-8 operators — the shapes their
    docstrings promise at 100 TB:

    - T47 windowFunnel: BOTH window specs share one (user_id) sort —
      exactly 2 Exchanges total (user shuffle + the 1-row global agg),
      2 Window nodes, and NO join anywhere (the whole point vs the
      self-join formulation).
    - O67 EWMA: all nine lags evaluate in ONE Window node.
    - O71 multi-window burn rate: all six trailing sums share ONE Window
      node (same partition/order spec) over the hourly rollup.
    - O63/O74 regression family: no Window node at all — sufficient
      statistics are plain aggregates (nothing funnels a type's rows
      through a sort).
    - D26 KMV: the two-phase k-minimum means NO window is ever
      partitioned by source alone before the bucket phase — every
      row_number sort key includes the bucket or runs on post-phase-1
      bounded data; concretely the plan carries 3 Window nodes and at
      least one Exchange hashpartitioning on (source, bkt).
    """
    from guidance_for_analytics_observability_on_aws_spark.plans.registry import (
        REGISTRY,
    )

    funnel = _executed_plan(
        REGISTRY["events_funnel_windowed"].builder(spark, sf_dir)
    )
    assert funnel.count("Exchange") == 2, funnel.count("Exchange")
    assert funnel.count("Window") == 2
    assert "Join" not in funnel

    ewma = _executed_plan(REGISTRY["obs_ewma_smooth"].builder(spark, sf_dir))
    assert ewma.count("Window") == 1

    burn = _executed_plan(
        REGISTRY["obs_burn_rate_multiwindow"].builder(spark, sf_dir)
    )
    assert burn.count("Window") == 1

    for name in ("obs_trend_regression", "obs_forecast_linear"):
        plan = _executed_plan(REGISTRY[name].builder(spark, sf_dir))
        assert "Window" not in plan, name

    kmv_df = REGISTRY["docs_kmv_overlap"].builder(spark, sf_dir)
    kmv = _executed_plan(kmv_df)
    # the sketch is checkpointed once, so the pairwise phase plans ONE
    # Window (the per-pair union re-rank) — the shingle/rank subtree is
    # never re-planned per reference
    assert kmv.count("Window [") == 1, kmv.count("Window [")
    # downstream of the checkpoint the plan reads the materialized sketch
    assert "Scan ExistingRDD" in kmv


def test_r8_operator_column_pruning(spark, sf_dir):
    """Column pruning must reach the parquet scans for the r8 operators:
    T47 reads exactly (ts, user_id, event_type) of the 6-column events
    table; T46's widest scans read 2 columns each of orders/lineitem; O74
    reads (ts, event_type, value). A scan reading all columns for a
    3-column plan is wrong at 100 TB."""
    import re

    from guidance_for_analytics_observability_on_aws_spark.plans.registry import (
        REGISTRY,
    )

    def schemas(name):
        plan = _executed_plan(REGISTRY[name].builder(spark, sf_dir))
        return re.findall(r"ReadSchema: struct<([^>]*)>", plan)

    funnel = schemas("events_funnel_windowed")
    assert funnel and all(
        sorted(c.split(":")[0] for c in s.split(","))
        == ["event_type", "ts", "user_id"]
        for s in funnel
    ), funnel

    backlog = schemas("orders_backlog_timeline")
    assert backlog and all(len(s.split(",")) <= 2 for s in backlog), backlog

    forecast = schemas("obs_forecast_linear")
    assert forecast and all(len(s.split(",")) <= 3 for s in forecast), forecast


def test_bench_p_group_covers_every_pipeline_sql_entry():
    """bench.py::_P_GROUP is a hand-enumerated list (pipeline-family names
    share prefixes with D's dedup_*); a future pipeline operator left out
    would silently classify as 'T' and skew both groups' bench subtotals.
    Pin: every sql-oracled registry entry whose builder references the
    pipeline module is in _P_GROUP."""
    import bench

    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            continue
        code = getattr(spec.builder, "__code__", None)
        if code is not None and "pipeline" in code.co_names:
            assert name in bench._P_GROUP, (
                f"{name} builds from operators.pipeline but is missing from "
                "bench._P_GROUP — it would misclassify as group T"
            )


def test_repeated_spans_plans_stay_hash_partitioned(spark, sf_dir):
    """D34/D35: never a nested-loop/cartesian plan (the span explode is
    the biggest fan-out in the dedup family; an all-pairs fallback here
    would be quadratic in corpus size), and the span explode must run
    ONCE — the r12 window form (count over span_hash) rides a single
    hash exchange; a regression to the r11 groupBy+join-back shape
    would generate the explode twice (two Generate nodes) and shuffle
    it twice."""
    for name in ("dedup_repeated_spans", "dedup_repeated_spans_scrub"):
        plan = _executed_plan(REGISTRY[name].builder(spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    plan34 = _executed_plan(
        REGISTRY["dedup_repeated_spans"].builder(spark, sf_dir)
    )
    assert plan34.count("Generate") == 1, (
        "D34 must explode spans exactly once (single window shuffle), "
        f"got {plan34.count('Generate')} Generate nodes"
    )
    # the per-doc aggregate still partial-aggregates map-side
    assert "partial" in plan34.lower(), plan34[:500]
