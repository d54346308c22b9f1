#!/usr/bin/env python3
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}. Each query is forced to full
materialization via the noop writer (count() can short-circuit column
evaluation; noop cannot).

Methodology (r14): PROCESS-PER-SECTION. The r13 round spent a judge cycle
on a phantom regression — a single 240-query shared session accumulates
state (memory-sink tables, state stores, Python workers) that inflated
stream runners 2-4x and drifted the first-pass headline 18% with runner
code byte-identical; an in-JVM session swap measured WORSE (r13 run3:
15-18 s/runner). So the HEADLINE core-35 and the rows-only section each
run in their own FRESH PROCESS (reproducible, no residue), while the
extended sql surface keeps the single shared session for the warm
min-pass ratchet. ``value`` is therefore the fresh-process core-35
first pass from r14 on; ``value_shared_session`` carries the old
shared-session number for cross-round continuity.

Driver contract (r16): the FINAL printed JSON line is SELF-CONTAINED —
totals plus the ``queries`` / ``queries_min`` / ``rows_only_sec`` maps.
Through r15 the per-query map was printed on an EARLY line and the final
line carried only totals; the driver keeps the last parseable line, so
its round-over-round per-query comparison was empty (PERF_r15
``n_common: 0`` — the r15 verdict's item 2). A compact totals-only line
is still printed immediately before as a truncation safety net, and the
rows-only section now interleaves 1-rep frozen-control probes every few
runners (``rows_control_probes``) so mid-section host bursts are
attributable per segment.

Host-load normalization (r15): every section first times a FROZEN
control pair (``_control_pair`` — code never changes again);
``host_inflation = control_now / control_best`` measures the machine's
slowdown today, and the headline flag list
(``n_regressed_normalized``) only fires when a query's min-pass
DIVIDED by its section's inflation still exceeds 1.5x its all-time
best. Raw flag lists stay for continuity, but they flag the host, not
the code (r12-r14: ~48 false flags/round under load).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from guidance_for_analytics_observability_on_aws_spark.plans.registry import REGISTRY
from guidance_for_analytics_observability_on_aws_spark.session import get_spark

BENCH_QUERIES = [
    # observability core
    "obs_task_metrics",
    "obs_stage_agg_skewness",
    "obs_app_summary",
    "obs_batch_flush",
    "obs_session_windows",
    "stream_metrics_window",
    # OLAP engine
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "tpch_q10_returned_items",
    "tpch_q4_order_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q18_large_orders",
    "tpch_q21_waiting_supplier",
    "star_join_broadcast",
    "window_running_totals",
    "asof_join_attribution",
    "obs_anomaly_zscore",
    "obs_counter_rate",
    "obs_heavy_hitters_cms",
    "obs_alert_rules",
    "events_transition_matrix",
    # LLM-pipeline
    "dedup_exact",
    "train_val_split",
    "pack_sequences",
    "dup_groups",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine_blas",
    "similarity_topk_bruteforce",
    "similarity_ann_lsh",
    "text_token_count",
    "text_quality_score",
    "text_pii_redact",
    "merge_scd1_customers",
]

#: Queries added after round 1 — reported separately so the headline total
#: stays comparable against BENCH_r01's 35-query set.
BENCH_QUERIES_R3 = [
    "obs_downsample_rollup",
    "obs_metric_log_correlate",
    "obs_input_bytes_percentiles",
    "decontaminate",
    "incremental_dedup",
    "text_repetition_stats",
]

#: Round-4 coverage: every remaining non-streaming operator the verdict
#: called out as untimed, plus the new banded dedup scale path.
BENCH_QUERIES_R4 = [
    "obs_task_percentiles_distributed",
    "obs_executor_concurrency",
    "obs_skew_exemplars",
    "dedup_containment",
    "dedup_containment_banded",
    "mm_shard_manifest",
    "pack_sequences_distributed",
    "merge_scd2_customers",
    "embedding_dup_groups",
    "text_tfidf_topk",
    "corpus_curation_pipeline_v2",
    "obs_alert_debounce",
]

#: Round-5 additions: the sketch-only dedup verdict (timed against the
#: exact-scored banded path it replaces at full scale), the curation
#: analytics pair, and the new dashboard drill-downs.
BENCH_QUERIES_R5 = [
    "dedup_minhash_estimate",
    "dataset_card_report",
    "filter_ablation",
    "obs_straggler_detect",
    "obs_log_sample",
    "obs_latency_heatmap",
    "obs_job_critical_stage",
    "obs_percentile_timeline",
    "tpch_q9_profit",
    "tpch_q11_important_parts",
    "mm_dedup_exact",
    "text_bigram_lift",
    "similarity_range_search",
    "obs_apdex",
    "customers_abc_pareto",
    "vocab_coverage",
    "dup_groups_star",
    "customers_rfm_segments",
    "cross_source_overlap",
    "obs_seasonal_baseline",
    "similarity_pq",
    "tpch_q2_min_cost_supplier",
    "obs_top_movers",
    "events_rolling_wau",
]


#: Round-6 additions: residual-encoded IVF-PQ (timed against D20/D21's
#: global-code passes). The streaming/report runners are timed separately
#: in the rows_only_sec section (one pass each; checkpoint setup dominates
#: at bench SF, so they'd distort the headline steady-state minima).
BENCH_QUERIES_R6 = [
    "similarity_ivf_pq_residual",
]


#: SURVEY §2 group of each timed query, for the per-group bench subtotals
#: (family-level drift — e.g. r9's dedup-trio regression — must be visible
#: in ONE diff of BENCH_PERQUERY.json, not per-query archaeology). Prefix
#: rules cover most names; the P group (pipeline) shares prefixes with D
#: (dedup_*) and has many bare names, so it is enumerated explicitly.
_P_GROUP = {
    "decontaminate", "decontaminate_neardup", "mixture_sample",
    "mixture_epoch_plan", "mixture_soft_dedup", "incremental_dedup",
    "train_val_split", "sample_stratified", "pack_sequences",
    "pack_sequences_distributed", "dup_groups", "dup_groups_star",
    "dup_groups_incremental", "dup_groups_nightly",
    "corpus_curation_pipeline", "corpus_curation_pipeline_v2",
    "split_leak_proof", "dataset_card_report", "filter_ablation",
    "dedup_eval_report", "cross_source_overlap", "vocab_coverage",
    "export_order_plan",
    # r12: the DSIR pair, the composed funnel, semantic decontamination
    "dsir_importance_weights", "dsir_topk_sample",
    "corpus_curation_pipeline_v3", "decontaminate_semantic",
    # r13: the Gumbel-top-k resampler
    "dsir_gumbel_sample",
    # r14: the sqrt-temperature mixture plan, the composed decontamination
    # evaluation report
    "mixture_temperature_plan", "decontaminate_eval_report",
    # r15: the paragraph-granularity decontamination gate
    "decontaminate_paragraph",
}


def query_group(name: str) -> str:
    """SURVEY §2 group letter for a registry entry (O/S/T/D/P/X/M)."""
    if name in _P_GROUP:
        return "P"
    for prefix, grp in (
        ("obs_", "O"), ("skew_", "O"), ("stream_metrics_window", "O"),
        ("source_", "S"),
        ("dedup_", "D"), ("similarity_", "D"), ("embedding_", "D"),
        ("docs_kmv", "D"),
        ("text_", "X"), ("docs_stats", "X"),
        ("mm_", "M"),
    ):
        if name.startswith(prefix):
            return grp
    # tpch_*, star/window/rollup/pivot/cube, events_*, orders_*,
    # customers_*, merge_scd*, set-ops, grouping sets, asof, anti-join
    return "T"


def extended_names() -> list[str]:
    """The full timed list: frozen core + EVERY sql-oracled registry entry.

    Derived from the registry (exactly as ``rows_only_names`` below is) so
    a new SQL operator can never again land untimed — the r7 verdict found
    nine operators invisible to BENCH_r07 because the last hand-maintained
    per-round list (``BENCH_QUERIES_R6``) was never extended. The legacy
    R3-R6 lists are kept only to preserve the historical ordering of the
    per-query timing tails across rounds; any sql entry not in them is
    appended in registry order.
    """
    listed = (
        BENCH_QUERIES
        + BENCH_QUERIES_R3
        + BENCH_QUERIES_R4
        + BENCH_QUERIES_R5
        + BENCH_QUERIES_R6
    )
    seen = set(listed)
    return listed + [
        n for n, spec in REGISTRY.items()
        if spec.oracle is not None and n not in seen
    ]


def _warm(spark, sf_dir: str) -> None:
    """Warm the JVM + parquet footers so timings measure query execution,
    one query per input family: events (codegen+shuffle), documents
    (regexp codegen), embeddings (higher-order fns + Arrow/pandas path),
    plus the shingle→md5→minhash codegen subtree shared by the D/P dedup
    queries — steady-state execution is the number that matters at
    100 TB, not first-compile JIT."""
    for warm in (
        "obs_cardinality",
        "docs_stats_by_source",
        "similarity_ivf",
        "mm_decode_frames",  # spawns the Python/Arrow worker pool
    ):
        REGISTRY[warm].builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    from guidance_for_analytics_observability_on_aws_spark.operators.dedup import (
        dedup_minhash_lsh,
    )
    from guidance_for_analytics_observability_on_aws_spark.sources.tables import (
        load_tables,
    )

    # Full LSH candidate pipeline (signatures + banding self-join + pair
    # dedup) rather than bare signatures: warms the join/exchange shapes
    # every D/P dedup query and the nightly loop reuse (r15 — bare-
    # signature warm left ~4s of first-execution compile in the banding
    # subtree).
    dedup_minhash_lsh(load_tables(spark, sf_dir)["documents"]).write.format(
        "noop"
    ).mode("overwrite").save()
    # First local-rows createDataFrame in a session pays ~2s of
    # Python-to-JVM converter init (measured r15) — absorb it here so
    # driver-dispatched CC/fold paths measure their own work.
    spark.createDataFrame([(0, 0)], "src bigint, group_id bigint").count()


def _control_pair(spark, sf_dir: str) -> dict[str, float]:
    """FROZEN host-load control pair — r15, DO NOT EDIT EVER. The two
    timings below are the normalization denominators every subsequent
    round's regression flags divide by, so they are only comparable
    across rounds if this code never changes (the bench analogue of the
    oracle-frozen operators). Self-contained on purpose: no REGISTRY
    dependency, so no refactor of the engine can touch them.

    - ``control_scan``: trivial scan-agg over events (codegen + one
      narrow shuffle) — tracks raw CPU + parquet-read throughput.
    - ``control_join``: orders⨝lineitem shuffle join + group rollup —
      tracks shuffle/exchange cost, the part host load inflates most.

    Why: three rounds running (r12-r14), a loaded host inflated
    wall-clock 2-10x on UNTOUCHED queries and the builder+judge each
    spent a cycle re-attributing the noise (the repo's documented
    ±35%+ drift). ``host_inflation = control_now / control_best``
    measures the machine, not the code: a query is only flagged when
    its CONTROL-NORMALIZED time regresses. Two reps each, min kept —
    the same defense the query passes use."""
    from pyspark.sql import functions as F

    out: dict[str, float] = {}
    for _ in range(2):
        t0 = time.perf_counter()
        (
            spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
            .groupBy("event_type")
            .agg(F.sum("value"), F.count(F.lit(1)))
            .write.format("noop").mode("overwrite").save()
        )
        out["control_scan"] = min(
            out.get("control_scan", 1e9), round(time.perf_counter() - t0, 3)
        )
        t0 = time.perf_counter()
        (
            spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
            .join(
                spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderpriority", "l_returnflag")
            .agg(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                F.count(F.lit(1)),
            )
            .write.format("noop").mode("overwrite").save()
        )
        out["control_join"] = min(
            out.get("control_join", 1e9), round(time.perf_counter() - t0, 3)
        )
    return out


def _control_probe(spark, sf_dir: str) -> dict[str, float]:
    """ONE-rep in-section control probe (r16, the r15 verdict's item 5):
    the SAME two frozen queries as ``_control_pair`` — kept in literal
    sync with it, never edited apart — timed once each, so the rows-only
    section can interleave cheap probes every few runners and a mid-
    section host burst (the r15 ``stream_ewma_smooth`` 19.8-vs-6.5 s
    class) becomes self-adjudicating instead of a judge cycle.
    ``_control_pair`` itself is frozen and stays the section-head
    ratchet denominator; these probes only attribute WITHIN a section."""
    from pyspark.sql import functions as F

    out: dict[str, float] = {}
    t0 = time.perf_counter()
    (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .groupBy("event_type")
        .agg(F.sum("value"), F.count(F.lit(1)))
        .write.format("noop").mode("overwrite").save()
    )
    out["control_scan"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    (
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        .join(
            spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderpriority", "l_returnflag")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
            F.count(F.lit(1)),
        )
        .write.format("noop").mode("overwrite").save()
    )
    out["control_join"] = round(time.perf_counter() - t0, 3)
    return out


#: Rows-only runners between two in-section control probes. Tightened
#: 10 -> 5 in r16 after a run showed steal bursts finer than the
#: spacing (clean probes bracketing 3-4x-inflated runners); the
#: per-runner steal deltas below are the exact-granularity companion.
_ROWS_PROBE_EVERY = 5


def _steal_jiffies() -> "int | None":
    """Cumulative hypervisor steal time (USER_HZ jiffies summed over all
    CPUs, field 8 of /proc/stat's first line) — None where unavailable
    (non-Linux, restricted /proc). Two reads bracketing a timed region
    attribute hypervisor contention DIRECTLY and for free: the r16
    sandbox showed ~8,100 CPU-seconds of steal land inside one bench
    hour in bursts finer than the in-section probe spacing, so probes
    alone under-attribute; a per-region delta cannot miss."""
    try:
        fields = open("/proc/stat").readline().split()
        return int(fields[8]) if fields and fields[0] == "cpu" else None
    except (OSError, ValueError, IndexError):
        return None


def _steal_rate(s0: "int | None", s1: "int | None", elapsed: float) -> "float | None":
    """Steal jiffies per wall-second across a timed region, None when
    either read failed or the region is degenerate. USER_HZ is 100 on
    every supported platform, so ~32 fully stolen CPUs ≈ 3200/s; values
    ≥ ~100/s mean the region lost at least one CPU to the hypervisor."""
    if s0 is None or s1 is None or elapsed <= 0:
        return None
    return round((s1 - s0) / elapsed, 1)


def _inflation(control_now: dict[str, float], control_best: dict[str, float]) -> float:
    """Section host-inflation factor vs the best-ever control ratchet,
    clamped to ≥1.0 (a faster-than-ever host must update the ratchet,
    never deflate a query's normalized time)."""
    ref = sum(control_best.get(k, control_now[k]) for k in control_now)
    now = sum(control_now.values())
    return max(1.0, round(now / ref, 3)) if ref else 1.0


def _timed_pass(spark, sf_dir: str, names: list[str]) -> dict[str, float]:
    """One timed noop-materialization pass. Builder inside the timed
    section: iterative operators (dup_groups) run actions while building,
    and plan construction is real work too."""
    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = REGISTRY[name].builder(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
    return timings


def _rows_only_names() -> list[str]:
    sql_names = set(extended_names())
    return [
        n for n, spec in REGISTRY.items()
        if spec.oracle is None and n not in sql_names
    ]


def _bench_builders():
    """Bench-only builder overrides: time the PRODUCTION path where an
    operator's registry runner also executes its verification oracle.
    Each override is (builder, note): the note feeds the artifact's
    bench_overrides entry so an override can never silently reintroduce
    an unexplained speedup. Empty since r15 — P23's verify oracle moved
    behind ``verify=False`` BY DEFAULT (verification lives in pytest +
    the SCALE probe), so the registry runner IS the production path."""
    return {}


def section_core(sf_dir: str) -> None:
    """Fresh-process HEADLINE section: warmups + two passes over the
    frozen core-35 only. No other query has run in this process, so the
    first pass is reproducible (the judge's r14 gate: ±10% across runs)."""
    spark = get_spark("gfaooa-bench-core")
    spark.sparkContext.setLogLevel("ERROR")
    _warm(spark, sf_dir)
    control = _control_pair(spark, sf_dir)
    passes = [_timed_pass(spark, sf_dir, BENCH_QUERIES) for _ in range(2)]
    best = {n: min(p[n] for p in passes) for n in BENCH_QUERIES}
    print(json.dumps({"first": passes[0], "min": best, "control": control}))
    spark.stop()


def section_rows(sf_dir: str) -> None:
    """Fresh-process rows-only section (streaming twins via availableNow,
    source/table reports, the trained-ANN family): one timed pass each.
    Fresh process = the timing is the RUNNER's cost (plus per-process
    streaming setup), not 190 queries of session residue — the r13
    2-4x inflation class is out of the number by construction."""
    spark = get_spark("gfaooa-bench-rows")
    spark.sparkContext.setLogLevel("ERROR")
    _warm(spark, sf_dir)
    control = _control_pair(spark, sf_dir)
    builders = _bench_builders()
    rows_only: dict[str, float] = {}
    # In-section control probes (r16): 1-rep frozen-pair timings every
    # _ROWS_PROBE_EVERY runners, recorded as [n_runners_done, probe] —
    # per-SEGMENT host attribution for a section whose head-only control
    # could not see mid-section bursts. Probe time is NOT added to any
    # runner's timing or the section total.
    probes: list = [[0, _control_probe(spark, sf_dir)]]
    # Per-runner steal deltas (r16): hypervisor contention measured
    # ACROSS each runner's own timed region — exact-granularity burst
    # attribution the sampled probes cannot provide. Two /proc/stat
    # reads per runner; the timed region itself is untouched.
    steal_rate: dict[str, float] = {}
    for i, name in enumerate(_rows_only_names(), start=1):
        builder = builders[name][0] if name in builders else REGISTRY[name].builder
        s0 = _steal_jiffies()
        t0 = time.perf_counter()
        df = builder(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        elapsed = time.perf_counter() - t0
        rows_only[name] = round(elapsed, 3)
        rate = _steal_rate(s0, _steal_jiffies(), elapsed)
        if rate is not None:
            steal_rate[name] = rate
        if i % _ROWS_PROBE_EVERY == 0:
            probes.append([i, _control_probe(spark, sf_dir)])
    if probes[-1][0] != len(rows_only):
        probes.append([len(rows_only), _control_probe(spark, sf_dir)])
    print(
        json.dumps(
            {
                "rows_only_sec": rows_only,
                "control": control,
                "control_probes": probes,
                "steal_per_sec": steal_rate,
            }
        )
    )
    spark.stop()


def _run_section(section: str) -> dict:
    """Run a section in a FRESH interpreter/JVM and parse its JSON line."""
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--section", section],
        capture_output=True,
        text=True,
        timeout=3600,
    )
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except ValueError:
            continue
    raise RuntimeError(
        f"bench section {section} emitted no JSON "
        f"(rc={proc.returncode}): stdout tail {proc.stdout[-400:]!r} "
        f"stderr tail {proc.stderr[-400:]!r}"
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    if len(sys.argv) >= 3 and sys.argv[1] == "--section":
        {"core": section_core, "rows": section_rows}[sys.argv[2]](sf_dir)
        return

    # Fresh-process headline section FIRST (it gets the whole machine —
    # no other JVM is live), then the shared-session extended surface for
    # the warm min-pass ratchet. The rows-only fresh process runs AFTER
    # the headline record is printed, so a rows-section crash or timeout
    # can never cost the round its core record (the file's standing
    # invariant).
    # Section-level steal rates (r16): hypervisor contention measured
    # across each section's whole wall window — the coarse companion to
    # the rows section's per-runner deltas, catching "this section was
    # burst-hit" even when the sampled controls land in clean moments.
    section_steal: dict[str, float] = {}
    s0, t0 = _steal_jiffies(), time.perf_counter()
    core = _run_section("core")
    rate = _steal_rate(s0, _steal_jiffies(), time.perf_counter() - t0)
    if rate is not None:
        section_steal["core"] = rate

    spark = get_spark("gfaooa-bench")
    spark.sparkContext.setLogLevel("ERROR")
    _warm(spark, sf_dir)
    control_ext = _control_pair(spark, sf_dir)

    # Two full passes; per-query MIN defends the record against transient
    # machine load (BENCH_r04 was inflated 20-100% by a loaded host while
    # a clean re-run matched r3 to 0.1%). Steady-state minima are also the
    # honest basis for the 100 TB throughput claims.
    all_names = extended_names()
    s0, t0 = _steal_jiffies(), time.perf_counter()
    passes: list[dict[str, float]] = [
        _timed_pass(spark, sf_dir, all_names) for _ in range(2)
    ]
    rate = _steal_rate(s0, _steal_jiffies(), time.perf_counter() - t0)
    if rate is not None:
        section_steal["extended"] = rate

    first = passes[0]
    # The min ratchet folds in the fresh-process core measurements too —
    # a minimum can only get more honest with more clean samples.
    best = {n: min(p[n] for p in passes) for n in all_names}
    for n, v in core["min"].items():
        best[n] = min(best[n], v)
    core_total = round(sum(core["first"][n] for n in BENCH_QUERIES), 3)
    totals = {
        "metric": "headline_queries_total_runtime",
        # Since r14 "value" is the FRESH-PROCESS core-35 first pass (the
        # judge's reproducibility gate); value_shared_session carries the
        # r1-r13 shared-session meaning for cross-round continuity.
        "value": core_total,
        "unit": "sec",
        "value_min": round(sum(best[n] for n in BENCH_QUERIES), 3),
        "value_shared_session": round(
            sum(first[n] for n in BENCH_QUERIES), 3
        ),
        "extended_value": round(sum(first.values()), 3),
        "extended_value_min": round(sum(best.values()), 3),
        "n_queries": len(first),
        "methodology": "core35+rows_only fresh-process; extended shared-session",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "section_steal_per_sec": section_steal,
    }
    # Headline record FIRST, so a timeout/crash inside the (slower)
    # rows-only section below can never cost the round its core record.
    print(json.dumps({**totals, "queries": core["first"], "queries_min": best}))

    # Rows-only runners in their OWN fresh process (see section_rows) —
    # run only now, after the headline record above is safely printed.
    # The shared session sits idle while the subprocess owns the CPUs.
    s0, t0 = _steal_jiffies(), time.perf_counter()
    rows = _run_section("rows")
    rate = _steal_rate(s0, _steal_jiffies(), time.perf_counter() - t0)
    if rate is not None:
        section_steal["rows"] = rate
    rows_only: dict[str, float] = rows["rows_only_sec"]
    controls = {
        "core": core.get("control", {}),
        "extended": control_ext,
        "rows": rows.get("control", {}),
    }
    bench_overrides = {k: note for k, (_, note) in _bench_builders().items()}
    totals["n_rows_only"] = len(rows_only)
    totals["rows_only_total"] = round(sum(rows_only.values()), 3)
    print(json.dumps({**totals, "rows_only_sec": rows_only}))
    # Per-query SQL timings -> a FILE artifact (BENCH_PERQUERY.json).
    # The driver records only the last JSON line + a 2000-char stdout
    # tail, so the 175-entry sql_sec map can never fit there (the r8
    # verdict's "single-query SQL regression is invisible" nit); the file
    # is committed per round and carries its own regression note vs the
    # previous run's minima (minima, not first-pass — first-pass noise is
    # JIT + session churn).
    # Per-scale file: an off-scale run (e.g. a quick sf0.01 check) must
    # never overwrite the committed sf0.1 baseline the regression note
    # compares against — it writes its own suffixed artifact instead.
    fname = (
        "BENCH_PERQUERY.json"
        if totals["sf"] == 0.1
        else f"BENCH_PERQUERY_sf{totals['sf']}.json"
    )
    perquery_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), fname
    )
    prev_min: dict[str, float] = {}
    prev_best: dict[str, float] = {}
    prev_rows_best: dict[str, float] = {}
    prev_ctl_best: dict[str, float] = {}
    prev: dict = {}
    try:
        with open(perquery_path) as fh:
            prev = json.load(fh)
        if prev.get("sf") == totals["sf"]:  # belt-and-braces scale guard
            prev_min = prev.get("sql_sec_min", {})
            prev_best = prev.get("sql_sec_best", prev_min)
            prev_rows_best = prev.get(
                "rows_only_sec_best", prev.get("rows_only_sec", {})
            )
            prev_ctl_best = prev.get("control_sec_best", {})
    except (OSError, ValueError):
        pass

    # Host-load normalization (r15): each section's frozen control pair
    # vs the best-ever control ratchet gives that section's inflation
    # factor — the machine's slowdown today, independent of any code
    # change. The sql min-pass folds the core + extended processes, so
    # its divisor is the BETTER (smaller) of the two sections' factors:
    # a per-query minimum achieved under the less-loaded process must be
    # normalized by that process's inflation, and dividing by less only
    # makes flags MORE likely (conservative direction).
    host_inflation = {
        sec: _inflation(c, prev_ctl_best) for sec, c in controls.items() if c
    }
    infl_sql = max(
        1.0,
        min(host_inflation.get("core", 1.0), host_inflation.get("extended", 1.0)),
    )
    infl_rows = host_inflation.get("rows", 1.0)

    def _regressions(now: dict[str, float], ref: dict[str, float]):
        return sorted(
            (
                (n, ref[n], now[n])
                for n in now
                if n in ref and now[n] > ref[n] * 1.2 and now[n] - ref[n] > 0.3
            ),
            key=lambda t: t[2] - t[1],
            reverse=True,
        )

    # Two regression notes: vs the PREVIOUS run (did this round make it
    # worse?) and vs the BEST-EVER ratchet (is it still worse than the
    # best this machine has demonstrated?). The ratchet is never
    # overwritten upward, so one slow round can never re-baseline the
    # record — the r9/r10 failure mode where dedup_eval_report settled
    # 22% above its r8 best while the prev-only note said "n_regressed: 1".
    regressions = _regressions(best, prev_min)
    best_ever = {n: round(min(v, prev_best.get(n, v)), 3) for n, v in best.items()}
    regressions_vs_best = _regressions(best, prev_best)

    def _norm_regressions(
        now: dict[str, float], ref: dict[str, float], factor: float
    ):
        """Control-normalized flags — the ONLY list that should page a
        builder: a query is flagged when its min-pass, divided by the
        section's host inflation, still exceeds 1.5x its all-time best
        (plus a 0.3s absolute guard against sub-second noise). Raw lists
        above are kept for continuity, but under host load they flag
        dozens of untouched queries (r12-r14, a re-attribution cycle
        each) while this one shrinks to genuinely-changed queries."""
        return sorted(
            (
                (n, ref[n], now[n], round(now[n] / factor, 3))
                for n in now
                if n in ref
                and now[n] / factor > ref[n] * 1.5
                and now[n] / factor - ref[n] > 0.3
            ),
            key=lambda t: t[3] - t[1],
            reverse=True,
        )

    regressions_norm = _norm_regressions(best, prev_best, infl_sql)
    rows_regressions_norm = _norm_regressions(
        rows_only, prev_rows_best, infl_rows
    )
    # Per-SEGMENT rows normalization (r16): each runner divides by the
    # smaller of its two bracketing in-section probes' inflation — the
    # conservative choice (1-rep probes are biased up; dividing by less
    # keeps flags MORE likely), so a runner can only be excused by a
    # burst the probes actually measured around it.
    probes = rows.get("control_probes", [])
    probe_infl = [
        (int(n), _inflation(p, prev_ctl_best)) for n, p in probes if p
    ]
    seg_factor: dict[str, float] = {}
    if len(probe_infl) >= 2:
        bounds = [n for n, _ in probe_infl]
        for idx, name in enumerate(rows_only, start=1):
            for j in range(len(bounds) - 1):
                if bounds[j] < idx <= bounds[j + 1]:
                    seg_factor[name] = max(
                        1.0, min(probe_infl[j][1], probe_infl[j + 1][1])
                    )
                    break
    rows_regressions_segnorm = sorted(
        (
            (n, prev_rows_best[n], rows_only[n],
             round(rows_only[n] / seg_factor.get(n, 1.0), 3))
            for n in rows_only
            if n in prev_rows_best
            and rows_only[n] / seg_factor.get(n, 1.0) > prev_rows_best[n] * 1.5
            and rows_only[n] / seg_factor.get(n, 1.0) - prev_rows_best[n] > 0.3
        ),
        key=lambda t: t[3] - t[1],
        reverse=True,
    )
    # Control ratchet: elementwise min over every section's controls and
    # the stored best — like the query ratchet, it only moves down.
    control_best_new = dict(prev_ctl_best)
    for c in controls.values():
        for k, v in c.items():
            control_best_new[k] = round(min(control_best_new.get(k, v), v), 3)
    rows_best_ever = {
        n: round(min(v, prev_rows_best.get(n, v)), 3) for n, v in rows_only.items()
    }
    # Per-group subtotals (min-pass for sql; rows-only is one bucket —
    # a single timed pass each, not classified by SURVEY group).
    group_totals: dict[str, float] = {}
    for n, v in best.items():
        g = query_group(n)
        group_totals[g] = round(group_totals.get(g, 0.0) + v, 3)
    group_totals["rows_only"] = round(sum(rows_only.values()), 3)
    # Group ratchet: per-group sums of the per-query BEST-EVER values —
    # the stable family floor the current groups are compared against.
    group_best: dict[str, float] = {}
    for n, v in best_ever.items():
        g = query_group(n)
        group_best[g] = round(group_best.get(g, 0.0) + v, 3)
    group_best["rows_only"] = round(sum(rows_best_ever.values()), 3)

    def _group_regressions(
        ref_per_query: dict[str, float],
        rows_ref: dict[str, float],
        label: str,
    ):
        """Group-level note vs a per-query reference map, computed ONLY
        over queries present in BOTH sides — a new operator landing in a
        group must read as coverage growth, not a perf regression.

        Reading the two notes: vs PREV answers "did this round make the
        family worse?" (normally empty); vs BEST is distance-to-floor —
        the reference sums each query's ALL-TIME best (each achieved on
        its own luckiest run), a lower bound no single run matches, so
        expect nonzero entries there and read the MAGNITUDE, not the
        presence. ``rows_ref`` is the rows-only reference for the SAME
        comparison (the previous run's rows_only_sec for vs-prev, the
        ratchet for vs-best) — using the ratchet for both would make the
        vs-prev rows_only entry measure distance-to-floor and falsely
        flag a round no slower than the previous one."""
        now_g: dict[str, float] = {}
        ref_g: dict[str, float] = {}
        for n, v in best.items():
            if n in ref_per_query:
                g = query_group(n)
                now_g[g] = now_g.get(g, 0.0) + v
                ref_g[g] = ref_g.get(g, 0.0) + ref_per_query[n]
        ro_now = sum(v for n, v in rows_only.items() if n in rows_ref)
        ro_ref = sum(v for n, v in rows_ref.items() if n in rows_only)
        if ro_ref:
            now_g["rows_only"], ref_g["rows_only"] = ro_now, ro_ref
        return [
            {"group": g, label: round(ref_g[g], 3), "now": round(v, 3)}
            for g, v in sorted(now_g.items())
            if v > ref_g[g] * 1.15 and v - ref_g[g] > 1.0
        ]

    prev_rows = prev.get("rows_only_sec", {}) if prev.get("sf") == totals["sf"] else {}
    group_regressions = _group_regressions(prev_min, prev_rows, "prev")
    group_regressions_vs_best = _group_regressions(
        prev_best, prev_rows_best, "best"
    )
    with open(perquery_path, "w") as fh:
        json.dump(
            {
                "sf": totals["sf"],
                "sql_sec": first,
                "sql_sec_min": best,
                "sql_sec_best": dict(sorted(best_ever.items())),
                "rows_only_sec": rows_only,
                "rows_only_sec_best": dict(sorted(rows_best_ever.items())),
                "bench_overrides": bench_overrides,
                "group_totals": group_totals,
                "group_totals_best": group_best,
                "regressions_vs_prev": [
                    {"query": n, "prev_min": p, "now_min": c}
                    for n, p, c in regressions
                ],
                "regressions_vs_best": [
                    {"query": n, "best": p, "now_min": c}
                    for n, p, c in regressions_vs_best
                ],
                "group_regressions_vs_prev": group_regressions,
                "group_regressions_vs_best": group_regressions_vs_best,
                "control_sec": controls,
                "control_sec_best": control_best_new,
                "host_inflation": host_inflation,
                "regressions_vs_best_normalized": [
                    {"query": n, "best": p, "now_min": c, "now_normalized": z}
                    for n, p, c, z in regressions_norm
                ],
                "rows_regressions_vs_best_normalized": [
                    {"query": n, "best": p, "now": c, "now_normalized": z}
                    for n, p, c, z in rows_regressions_norm
                ],
                "rows_control_probes": probes,
                "rows_steal_per_sec": rows.get("steal_per_sec", {}),
                "rows_segment_inflation": {
                    n: f for n, f in sorted(seg_factor.items())
                },
                "rows_regressions_vs_best_segment_normalized": [
                    {"query": n, "best": p, "now": c, "now_normalized": z}
                    for n, p, c, z in rows_regressions_segnorm
                ],
            },
            fh,
            indent=1,
        )
    totals["perquery_file"] = fname
    totals["n_regressed"] = len(regressions)
    totals["top_regressions"] = [
        [n, p, c] for n, p, c in regressions[:3]
    ]
    totals["n_regressed_vs_best"] = len(regressions_vs_best)
    totals["top_regressions_vs_best"] = [
        [n, p, c] for n, p, c in regressions_vs_best[:3]
    ]
    # r15 host-load normalization: the headline flag list. Raw counts
    # above stay for cross-round continuity; READ THESE under load.
    totals["host_inflation"] = host_inflation
    totals["n_regressed_normalized"] = len(regressions_norm) + len(
        rows_regressions_norm
    )
    totals["top_regressions_normalized"] = [
        [n, p, z] for n, p, c, z in (regressions_norm + rows_regressions_norm)[:5]
    ]
    totals["n_regressed_segment_normalized"] = len(rows_regressions_segnorm)
    # Compact totals-only safety-net line FIRST (it always parses even if a
    # capture truncates the larger final record), then ONE self-contained
    # FINAL line carrying the totals AND the per-query maps. The driver
    # keeps the last parseable JSON line, and through r15 that line had no
    # "queries" map, leaving PERF_rN's round-over-round per-query
    # comparison empty (n_common: 0 — the r15 verdict's item 2); the
    # driver-facing contract {"metric", "value", "queries", "sf"} is now
    # satisfied by the FINAL line itself.
    print(json.dumps(totals))
    print(
        json.dumps(
            {
                **totals,
                # Core-35 keep their r14/r15 meaning (fresh-process first
                # pass); the extended-only names are ADDED from the
                # shared-session first pass (additions-only: nothing
                # removed or renamed vs the r15 map).
                "queries": {**first, **core["first"]},
                "queries_min": best,
                "rows_only_sec": rows_only,
                # Per-runner hypervisor-steal rates (jiffies/s across each
                # runner's own timed region) — lets a reader of THIS line
                # alone adjudicate which rows timings were burst-hit even
                # when the sampled probes landed in clean moments.
                "rows_steal_per_sec": rows.get("steal_per_sec", {}),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
