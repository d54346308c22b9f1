"""Property-based tests (hypothesis) for formula-critical operators.

The skewness rewrite relies on a float-arithmetic identity — these tests
attack it with adversarial inputs instead of trusting the fixture data.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from guidance_for_analytics_observability_on_aws_spark.operators.observability import (
    stage_agg_skewness,
)

task_bytes = st.lists(
    st.integers(min_value=0, max_value=2**50), min_size=1, max_size=40
)


def _reference_skewness(xs: list[int]) -> float:
    """The literal reference formula (CustomMetricsListener.scala:146-188):
    max(|x - avg|) / range, range==0 -> 1, evaluated per-row like the
    listener's fold over task metrics.

    IEEE-faithful to the engines under test: Spark and DuckDB both compute
    bigint/bigint division by casting EACH operand to double first, so the
    sum is rounded to a double before the divide. Python's ``int / int``
    instead correctly rounds the true rational quotient, which differs once
    the exact sum exceeds 2**53 — ``float(sum(xs))`` reproduces the engines'
    rounding.
    """
    avg = float(sum(xs)) / float(len(xs))
    max_dist = max(abs(float(x) - avg) for x in xs)
    rng = max(xs) - min(xs)
    return max_dist / (rng if rng != 0 else 1)


@settings(max_examples=30, deadline=None)
@given(task_bytes, task_bytes)
def test_single_pass_skewness_matches_reference_formula(spark, ins, shs):
    n = max(len(ins), len(shs))
    ins = (ins * n)[:n]
    shs = (shs * n)[:n]
    rows = [
        ("app", "app-1", 1, 1, i, i, ins[i], shs[i], 1000 + i)
        for i in range(n)
    ]
    tm = spark.createDataFrame(
        rows,
        "app_name string, app_id string, job_id long, stage_id long, "
        "task_id long, partition_id long, input_bytes_read long, "
        "shuffle_bytes_read long, metric_time_ms long",
    )
    out = stage_agg_skewness(tm).collect()
    assert len(out) == 1
    row = out[0]
    assert row["input_bytes_read_skewness"] == _reference_skewness(ins)
    assert row["shuffle_bytes_read_skewness"] == _reference_skewness(shs)
    assert row["max_input_bytes_read"] == max(ins)
    assert row["n_tasks"] == n


import math

from guidance_for_analytics_observability_on_aws_spark.operators.observability import (
    anomaly_zscore,
)

metric_values = st.lists(
    st.integers(min_value=0, max_value=600_000), min_size=20, max_size=40
)


@settings(max_examples=15, deadline=None)
@given(metric_values)
def test_integer_zscore_identity(spark, xs):
    """The cross-multiplied BIGINT inequality must agree with the float
    |z| > 3 definition on every trailing-20 window (sample stddev)."""
    rows = [("e", i, 1000 + i, x) for i, x in enumerate(xs)]
    tm = spark.createDataFrame(
        rows,
        "executor_id string, task_id long, metric_time_ms long, "
        "input_bytes_read long",
    )
    flagged = {r.task_id for r in anomaly_zscore(tm).collect()}
    want = set()
    for i in range(19, len(xs)):
        window = xs[i - 19 : i + 1]
        n = len(window)
        mean = sum(window) / n
        var = sum((v - mean) ** 2 for v in window) / (n - 1)
        if var > 0 and abs(xs[i] - mean) > 3 * math.sqrt(var):
            want.add(i)
    assert flagged == want


from guidance_for_analytics_observability_on_aws_spark.operators.pipeline import (
    _prefix_sum,
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),   # part key
        # negatives included: slice totals must be sign-safe
        st.integers(min_value=-(10**6), max_value=10**6),
    ),
    min_size=1,
    max_size=120,
)


@settings(max_examples=12, deadline=None)
@given(rows_strategy)
def test_two_phase_prefix_sum_equals_single_window(spark, rows):
    """_prefix_sum must equal the single-window cumulative sum for any
    distribution of partition keys and values, at any slice count."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    data = [(i, f"p{p}", v) for i, (p, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "rid long, part string, val long")
    got = {
        (r.part, r.rid): r.cum
        for r in _prefix_sum(df, "part", ["rid"], "val", "cum", n_slices=5).collect()
    }
    w = Window.partitionBy("part").orderBy("rid")
    want = {
        (r.part, r.rid): r.cum
        for r in df.withColumn("cum", F.sum("val").over(w)).collect()
    }
    assert got == want


def test_prefix_sum_invariant_across_slice_counts(spark):
    """The result must be IDENTICAL for any slice count — including the
    session-default (n_slices=None → spark.sql.shuffle.partitions) added
    for 100 TB sizing — since slice count only changes task granularity.
    This invariance is the safety property that makes the dynamic default
    a pure re-tuning, not a semantics change."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    data = [
        (i, f"p{i % 4}", ((i * 37) % 201) - 100)  # negatives included
        for i in range(500)
    ]
    df = spark.createDataFrame(data, "rid long, part string, val long")
    w = Window.partitionBy("part").orderBy("rid")
    want = {
        (r.part, r.rid): r.cum
        for r in df.withColumn("cum", F.sum("val").over(w)).collect()
    }
    for n in (1, 3, 8, 64, None):
        got = {
            (r.part, r.rid): r.cum
            for r in _prefix_sum(df, "part", ["rid"], "val", "cum", n_slices=n).collect()
        }
        assert got == want, f"n_slices={n} diverged"


from guidance_for_analytics_observability_on_aws_spark.operators.observability import (
    executor_concurrency,
)

intervals_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=200),  # end time
        st.integers(min_value=1, max_value=50),   # duration
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=12, deadline=None)
@given(intervals_strategy)
def test_sweep_line_peak_matches_brute_force(spark, ivals):
    """Sweep-line peak concurrency must equal the brute-force maximum
    overlap count over half-open intervals [end-dur, end)."""
    rows = [("e", end, dur) for end, dur in ivals]
    tm = spark.createDataFrame(
        rows, "executor_id string, metric_time_ms long, run_time_ms long"
    )
    got = executor_concurrency(tm).collect()[0].peak_concurrency
    spans = [(end - dur, end) for end, dur in ivals]
    points = sorted({s for s, _ in spans})
    want = max(sum(1 for s, e in spans if s <= p < e) for p in points)
    assert got == want


words = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
)
docs_strategy = st.lists(
    st.lists(words, min_size=3, max_size=12), min_size=2, max_size=16
)


@settings(max_examples=8, deadline=None)
@given(docs_strategy)
def test_banded_dedup_precision_on_random_corpora(spark, token_lists):
    """D15's survivors must be a SUBSET of the exact D2∪D14 survivors on
    ANY corpus — the 'precision 1.0 by construction' claim attacked with
    random small-vocabulary documents (heavy shared-shingle fan-out, the
    adversarial regime for banding), not just the fixture data."""
    from guidance_for_analytics_observability_on_aws_spark.operators.dedup import (
        dedup_containment,
        dedup_containment_banded,
        dedup_ngram_jaccard,
    )

    rows = [
        (i, " ".join(toks), "en", "src1", len(" ".join(toks)))
        for i, toks in enumerate(token_lists)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    exact = {
        (r.doc_a, r.doc_b) for r in dedup_ngram_jaccard(docs).collect()
    } | {(r.doc_a, r.doc_b) for r in dedup_containment(docs).collect()}
    banded = {(r.doc_a, r.doc_b) for r in dedup_containment_banded(docs).collect()}
    assert banded <= exact, f"false positives: {sorted(banded - exact)[:5]}"


run_times = st.lists(
    st.integers(min_value=0, max_value=2**40), min_size=1, max_size=60
)


@settings(max_examples=25, deadline=None)
@given(run_times)
def test_straggler_median_matches_statistics_median(spark, rts):
    """O50's median_x2 (sum of the two middle order statistics) must equal
    2x the textbook median on arbitrary groups, and the flag set must be
    exactly {rt : rt >= 100 and rt > 1.5*median} — attacked with random
    durations instead of trusting the fixture distribution."""
    import statistics

    from guidance_for_analytics_observability_on_aws_spark.operators.observability import (
        straggler_detect,
    )

    rows = [("app", "run", 1, 1, i, "e1", rt) for i, rt in enumerate(rts)]
    tm = spark.createDataFrame(
        rows,
        "app_name string, app_id string, job_id long, stage_id long,"
        " task_id long, executor_id string, run_time_ms long",
    )
    got = {r.task_id: r for r in straggler_detect(tm).collect()}
    srt = sorted(rts)
    n = len(srt)
    median_x2 = srt[(n - 1) // 2] + srt[n // 2]
    # integer-exact expectation: 4*rt > 3*median_x2 (== rt > 1.5*median)
    want = {
        i for i, rt in enumerate(rts) if rt >= 100 and 4 * rt > 3 * median_x2
    }
    assert set(got) == want
    for r in got.values():
        assert r.median_x2 == median_x2
        # cross-check against the stdlib median (float) on modest values
        if srt[-1] < 2**50:
            assert r.median_x2 == round(2 * statistics.median(srt))


revenues = st.lists(
    st.integers(min_value=1, max_value=10**9), min_size=1, max_size=40
)


@settings(max_examples=20, deadline=None)
@given(revenues)
def test_abc_pareto_boundaries_match_reference(spark, revs):
    """T39's cross-multiplied class cuts must equal the textbook
    cumulative-share rule (A while cum/total <= 0.8, B to 0.95) on
    arbitrary revenue distributions — attacked with random integers so
    boundary rows (cum exactly at 80%/95%) are exercised."""
    from guidance_for_analytics_observability_on_aws_spark.operators.tpch import (
        customers_abc_pareto,
    )
    from pyspark.sql import functions as F  # noqa: F401

    rows = [
        (i, f"1995-01-0{1 + i % 9}", "O", rev / 100.0)
        for i, rev in enumerate(revs)
    ]
    orders = spark.createDataFrame(
        rows, "o_custkey long, o_orderdate string, o_orderstatus string, o_totalprice double"
    ).selectExpr(
        "o_custkey",
        "CAST(o_orderdate AS TIMESTAMP) AS o_orderdate",
        "o_orderstatus",
        "o_totalprice",
    )
    got = {r.o_custkey: (r.cum_cents, r.abc_class)
           for r in customers_abc_pareto(orders).collect()}
    total = sum(revs)
    # reference: sort desc by revenue (tie: custkey), exact rational compare
    order = sorted(range(len(revs)), key=lambda i: (-revs[i], i))
    cum = 0
    for i in order:
        cum += revs[i]
        if cum * 5 <= total * 4:
            want = "A"
        elif cum * 20 <= total * 19:
            want = "B"
        else:
            want = "C"
        assert got[i] == (cum, want), (i, got[i], cum, want)


fail_patterns = st.lists(
    st.sampled_from(["ok", "retryable", "nonretryable"]), min_size=1, max_size=80
)


@settings(max_examples=15, deadline=None)
@given(fail_patterns)
def test_batch_flush_matches_client_simulator(spark, pattern):
    """O9's flush/backoff flags must equal a straight-line Python
    simulator of the STATED semantics (fixed add counter, size trigger
    suspended while backing off, suppressed flush deferred to the first
    recovered add) on arbitrary failure patterns — the window-function
    unrolling and the sequential definition can never diverge."""
    from guidance_for_analytics_observability_on_aws_spark.operators.observability import (
        batch_flush,
    )

    BATCH = 3
    # task ids: retryable failures need id % 5 != 0, non-retryable % 5 == 0
    rows = []
    for i, kind in enumerate(pattern):
        if kind == "ok":
            tid = 10 * i + 1  # non-error; id class irrelevant
            et = "view"
        elif kind == "retryable":
            tid = 10 * i + 1  # % 5 != 0
            et = "error"
        else:
            tid = 10 * i + 5  # % 5 == 0
            et = "error"
        rows.append(("e1", tid, 1000 * (i + 1), et))
    tm = spark.createDataFrame(
        rows, "executor_id string, task_id long, metric_time_ms long, event_type string"
    )
    got = {r.task_id: (r.backing_off, r.flushed_by_size)
           for r in batch_flush(tm, batch_size=BATCH).collect()}
    # simulator
    state = 0  # 1 = backing off
    attempt = 0
    pending_flush = False
    for i, kind in enumerate(pattern):
        rn = i + 1
        tid = rows[i][1]
        backing = state == 1
        boundary = rn % BATCH == 0
        if backing and boundary:
            pending_flush = True
            flushed = False
        elif not backing and (boundary or pending_flush):
            flushed = True
            pending_flush = False
        else:
            flushed = False
        assert got[tid] == (backing, flushed), (
            i, kind, got[tid], (backing, flushed))
        # advance client state
        if kind == "ok":
            state, attempt = 0, 0
        elif kind == "nonretryable":
            state, attempt = 0, 0  # abort -> fresh client
        else:
            attempt += 1
            if attempt >= 6:
                state, attempt = 0, 0  # exhaustion abort
            else:
                state = 1


from guidance_for_analytics_observability_on_aws_spark.operators.observability import (
    anomaly_mad,
    cusum_drift,
)

cent_values = st.lists(
    st.integers(min_value=0, max_value=1_000_000), min_size=3, max_size=30
)


@settings(max_examples=15, deadline=None)
@given(cent_values)
def test_mad_matches_pure_python_reference(spark, cents):
    """O58 vs a literal reference: lower-order-statistic median of the
    cents, lower-order-statistic median of absolute deviations (both
    ordered by (value, task_id)), and the 44478/10000 integer fence."""
    rows = [("e", i, c / 100.0) for i, c in enumerate(cents)]
    tm = spark.createDataFrame(rows, "event_type string, task_id long, value double")
    got = anomaly_mad(tm).collect()[0]
    n = len(cents)
    med = sorted(zip(cents, range(n)))[(n - 1) // 2][0]
    devs = [abs(c - med) for c in cents]
    mad = sorted(zip(devs, range(n)))[(n - 1) // 2][0]
    n_out = sum(1 for d in devs if d * 10000 > 44478 * mad)
    assert (got.med_cents, got.mad_cents, got.n_outliers) == (med, mad, n_out)


@settings(max_examples=15, deadline=None)
@given(cent_values)
def test_cusum_extremes_match_pure_python_reference(spark, cents):
    """O59 vs a literal reference: cross-multiplied cumulative deviations
    in event order, extremes and their EARLIEST positions."""
    rows = [("e", i, 1000 * i, c / 100.0) for i, c in enumerate(cents)]
    tm = spark.createDataFrame(
        rows, "event_type string, task_id long, metric_time_ms long, value double"
    )
    got = cusum_drift(tm).collect()[0]
    n, total = len(cents), sum(cents)
    s, series = 0, []
    for c in cents:
        s += n * c - total
        series.append(s)
    peak, trough = max(series), min(series)
    peak_t = 1000 * series.index(peak)
    trough_t = 1000 * series.index(trough)
    assert (got.cum_peak, got.cum_trough) == (peak, trough)
    assert (got.peak_time_ms, got.trough_time_ms) == (peak_t, trough_t)


# --- O67 dyadic EWMA vs a literal Python reference ---------------------------

from guidance_for_analytics_observability_on_aws_spark.operators.observability import (  # noqa: E402
    ewma_smooth,
)

ewma_series = st.lists(
    st.integers(min_value=0, max_value=10_000), min_size=1, max_size=24
)


@settings(max_examples=15, deadline=None)
@given(ewma_series)
def test_ewma_matches_literal_reference(spark, xs):
    """O67 must equal the obvious Python loop: num = Σ x[t-i]·2^(7-i) over
    present lags, den = Σ weights present, ewma = num/den, spike iff
    x·den_prev > 2·num_prev — on arbitrary integer series."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # value*16 floors to run_time_ms: feed value = x/16 so run_ms == x
        (i, t0 + dt.timedelta(minutes=i), 0, "click", x / 16.0, '{"k":1}')
        for i, x in enumerate(xs)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    from guidance_for_analytics_observability_on_aws_spark.sources.telemetry import (
        task_metrics,
    )

    got = sorted(ewma_smooth(task_metrics(ev)).collect(), key=lambda r: r.minute_ms)
    series = [int((x / 16.0) * 16) for x in xs]  # floor(v*16) round-trip
    for t, r in enumerate(got):
        num = series[t] * 128
        den = 128
        for i in range(1, 8):
            if t - i >= 0:
                num += series[t - i] * (1 << (7 - i))
                den += 1 << (7 - i)
        num_p = den_p = 0
        for i in range(1, 9):
            if t - i >= 0:
                num_p += series[t - i] * (1 << (8 - i))
                den_p += 1 << (8 - i)
        assert r.ewma_num == num and r.ewma_den == den
        assert r.ewma == num / den
        assert r.is_spike == (
            1 if den_p > 0 and series[t] * den_p > 2 * num_p else 0
        )


# --- T47 windowFunnel vs brute-force chain search ----------------------------

from guidance_for_analytics_observability_on_aws_spark.operators.tpch import (  # noqa: E402
    events_funnel_windowed,
)

funnel_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),          # user
        st.integers(min_value=0, max_value=500),        # minute
        st.sampled_from(["signup", "click", "purchase", "view"]),
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=15, deadline=None)
@given(funnel_events)
def test_window_funnel_matches_bruteforce_chains(spark, evs):
    """T47's two-window formulation must agree with the O(n³) brute force
    (∃ s<c<p, p ≤ s+W) on arbitrary event soups — including ms ties,
    multiple chains, and order violations."""
    import datetime as dt

    W_MIN = 60
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(minutes=m), u, et, 1.0, "{}")
        for i, (u, m, et) in enumerate(evs)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    got = events_funnel_windowed(ev, window_ms=W_MIN * 60_000).collect()[0]

    by_user: dict = {}
    for u, m, et in evs:
        by_user.setdefault(u, []).append((m, et))
    n2 = n3 = n1 = 0
    for u, items in by_user.items():
        ss = [m for m, e in items if e == "signup"]
        cs = [m for m, e in items if e == "click"]
        ps = [m for m, e in items if e == "purchase"]
        if ss:
            n1 += 1
        if any(s < c <= s + W_MIN for s in ss for c in cs):
            n2 += 1
        if any(
            s < c < p <= s + W_MIN for s in ss for c in cs for p in ps
        ):
            n3 += 1
    assert got.n_users == len(by_user)
    assert got.n_signup == n1
    assert got.n_click_in_window == n2
    assert got.n_full_funnel_in_window == n3


# --- D26 KMV vs exact set arithmetic on small random corpora ------------------

from guidance_for_analytics_observability_on_aws_spark.operators.dedup import (  # noqa: E402
    docs_kmv_overlap,
)

_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]

kmv_docs = st.lists(
    st.tuples(
        st.sampled_from(["sA", "sB"]),
        st.lists(st.sampled_from(_WORDS), min_size=3, max_size=6),
    ),
    min_size=2,
    max_size=8,
)


@settings(max_examples=15, deadline=None)
@given(kmv_docs)
def test_kmv_exact_branch_matches_set_arithmetic(spark, docs):
    """D26 on corpora whose union sketch stays below k: every output
    column must equal the plain set arithmetic over the true shingle sets
    (the estimator's exact degeneration, generalized from the hand case).
    Covers duplicate shingles within/across docs and single-source
    corpora (no output row)."""
    rows = [
        (i, " ".join(words), "en", src, len(" ".join(words)))
        for i, (src, words) in enumerate(docs)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {(r.source_a, r.source_b): r for r in docs_kmv_overlap(df).collect()}

    # reference: true per-source 3-gram shingle sets over the SAME planted
    # corpus convention (corpus() augments with +1M/+2M/+3M variants)
    def shingle_set(words):
        return {
            " ".join(words[j : j + 3]) for j in range(len(words) - 2)
        }

    per_src: dict = {}
    for i, (src, words) in enumerate(docs):
        variants = [words]  # raw doc
        if i % 25 == 0:
            variants.append(words)           # +1M exact copy
        if i % 25 == 5:
            variants.append(list(reversed(words)))  # +2M reversed
        if i % 25 == 10:
            keep = max(1, int(len(words) * 0.9))
            variants.append(words[:keep])    # +3M truncated
        for v in variants:
            if len(v) >= 3:
                per_src.setdefault(src, set()).update(shingle_set(v))
    srcs = sorted(per_src)
    if len(srcs) < 2:
        assert got == {}
        return
    a, b = per_src[srcs[0]], per_src[srcs[1]]
    if not a or not b:
        assert got == {}
        return
    r = got[(srcs[0], srcs[1])]
    union, inter = a | b, a & b
    assert r.k_used == len(union)  # < k=128 always here → exact
    assert r.n_matches == len(inter)
    assert r.union_est == float(len(union))
    assert r.jaccard_est == len(inter) / len(union)


# --- O71 trailing windows vs a literal reference ------------------------------

from guidance_for_analytics_observability_on_aws_spark.operators.observability import (  # noqa: E402
    burn_rate_multiwindow,
)

burn_hours = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=100),  # hour index (gaps likely)
        st.integers(min_value=0, max_value=5),    # errors
        st.integers(min_value=1, max_value=10),   # non-errors
    ),
    min_size=1,
    max_size=15,
    unique_by=lambda t: t[0],
)


@settings(max_examples=15, deadline=None)
@given(burn_hours)
def test_burn_rate_windows_match_literal_reference(spark, hours):
    """O71's RANGE-framed trailing sums and both cross-multiplied flags
    must equal the obvious Python loop over (hour, errors, logs) series —
    including calendar GAPS (a missing hour contributes nothing, it does
    not shift the frame)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h, n_err, n_ok in hours:
        for i in range(n_err):
            rows.append((eid, t0 + dt.timedelta(hours=h, seconds=i), 0, "error", 1.0, '{"k":1}'))
            eid += 1
        for i in range(n_ok):
            rows.append((eid, t0 + dt.timedelta(hours=h, seconds=900 + i), 0, "click", 1.0, '{"k":1}'))
            eid += 1
    from guidance_for_analytics_observability_on_aws_spark.sources.telemetry import (
        task_metrics,
    )

    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    got = {
        int((r.hour_ms - 1704067200000) // 3600000): r
        for r in burn_rate_multiwindow(task_metrics(ev)).collect()
    }
    series = {h: (e, e + o) for h, e, o in hours}
    assert set(got) == set(series)
    for h, r in got.items():
        for span, (ecol, lcol) in [(1, ("errors_1h", "logs_1h")),
                                   (6, ("errors_6h", "logs_6h")),
                                   (72, ("errors_72h", "logs_72h"))]:
            e = sum(series[j][0] for j in series if h - span < j <= h)
            l = sum(series[j][1] for j in series if h - span < j <= h)
            assert getattr(r, ecol) == e and getattr(r, lcol) == l
        page = (r.errors_1h * 100 >= 40 * r.logs_1h) and (
            r.errors_6h * 100 >= 40 * r.logs_6h
        )
        ticket = (r.errors_6h * 100 >= 20 * r.logs_6h) and (
            r.errors_72h * 100 >= 20 * r.logs_72h
        )
        assert r.page_alert == int(page) and r.ticket_alert == int(ticket)


# --- T46 backlog sweep line vs brute-force interval counting ------------------

from guidance_for_analytics_observability_on_aws_spark.operators.tpch import (  # noqa: E402
    orders_backlog_timeline,
)

backlog_orders = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),  # open day
        st.integers(min_value=0, max_value=20),  # ship lag days
        st.integers(min_value=1, max_value=3),   # lineitems
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=15, deadline=None)
@given(backlog_orders)
def test_backlog_sweep_matches_bruteforce_intervals(spark, orders):
    """T46's +1/−1 sweep line must equal brute force: for every emitted
    day, backlog = #orders with open_day ≤ day ≤ close_day (close = max
    lineitem shipdate) — on random order books with overlapping spans."""
    import datetime as dt

    d0 = dt.datetime(2024, 1, 1)
    o_rows, l_rows = [], []
    for i, (open_d, lag, n_li) in enumerate(orders):
        o_rows.append((i, 0, "O", 1.0, d0 + dt.timedelta(days=open_d), "1-URGENT", "c", 0, "x"))
        for j in range(n_li):
            # lineitems ship between open and open+lag
            ship = open_d + (lag * (j + 1)) // n_li
            l_rows.append(
                (i, j + 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
                 d0 + dt.timedelta(days=ship))
            )
    odf = spark.createDataFrame(
        o_rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, "
        "o_orderdate timestamp, o_orderpriority string, o_clerk string, "
        "o_shippriority long, o_comment string",
    )
    ldf = spark.createDataFrame(
        l_rows,
        "l_orderkey long, l_linenumber long, l_quantity long, l_extendedprice double, "
        "l_discount double, l_tax double, l_partkey double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    )
    got = {r.day_num: r.backlog for r in orders_backlog_timeline(ldf, odf).collect()}
    day0 = int(d0.timestamp()) // 86400
    spans = []
    for i, (open_d, lag, n_li) in enumerate(orders):
        close_d = max(open_d + (lag * (j + 1)) // n_li for j in range(n_li))
        spans.append((open_d, close_d))
    for day_num, backlog in got.items():
        d = day_num - day0
        want = sum(1 for o, c in spans if o <= d <= c)
        assert backlog == want, (d, backlog, want)


# --- D29 CDC chunking vs a literal Python reference ---------------------------

from guidance_for_analytics_observability_on_aws_spark.operators.dedup import (  # noqa: E402
    CDC_B,
    CDC_DIVISOR,
    CDC_W,
    dedup_cdc_chunks,
)

cdc_docs = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=3, max_size=20),
    min_size=2,
    max_size=5,
)


@settings(max_examples=10, deadline=None)
@given(cdc_docs)
def test_cdc_chunks_match_literal_reference(spark, docs):
    """D29's window-hash boundaries and shared-chunk counts must equal a
    literal Python re-implementation (md5 token hashes, mod-P polynomial,
    cumulative boundary chunking, md5 span fingerprints) over the same
    planted corpus."""
    import hashlib

    P = 2147483647
    rows = [
        (i, " ".join(words), "en", "sA", len(" ".join(words)))
        for i, words in enumerate(docs)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {
        (r.doc_a, r.doc_b): (r.n_shared_chunks, r.n_a, r.n_b)
        for r in dedup_cdc_chunks(df, min_shared=1).collect()
    }

    def th(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:7], 16)

    def chunks(words):
        hs = [th(w) for w in words]
        cs = [pow(CDC_B, j, P) for j in range(CDC_W)]
        fps, cur = set(), []
        for p0, w in enumerate(words, start=1):
            cur.append(w)
            if p0 >= CDC_W:
                h = sum((hs[p0 - 1 - j] * cs[j]) % P for j in range(CDC_W)) % P
                if h % CDC_DIVISOR == 0:
                    fps.add(int(hashlib.md5(" ".join(cur).encode()).hexdigest()[:13], 16))
                    cur = []
        if cur:
            fps.add(int(hashlib.md5(" ".join(cur).encode()).hexdigest()[:13], 16))
        return fps

    # replicate the corpus() planting
    planted = {}
    for i, words in enumerate(docs):
        planted[i] = words
        if i % 25 == 0:
            planted[i + 1000000] = words
        if i % 25 == 5:
            planted[i + 2000000] = list(reversed(words))
        if i % 25 == 10:
            planted[i + 3000000] = words[: max(1, int(len(words) * 0.9))]
    planted = {k: v for k, v in planted.items() if len(v) >= 3}
    fp_sets = {k: chunks(v) for k, v in planted.items()}
    ids = sorted(fp_sets)
    want = {}
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            shared = len(fp_sets[a] & fp_sets[b])
            if shared >= 1:
                want[(a, b)] = (shared, len(fp_sets[a]), len(fp_sets[b]))
    assert got == want


@settings(max_examples=8, deadline=None)
@given(docs_strategy)
def test_prefix_filter_matches_brute_force(spark, token_lists):
    """D31's lossless-pruning claim attacked with random small-vocabulary
    corpora (maximal shared-shingle fan-out — the regime where a broken
    prefix bound would drop pairs): output must equal a PURE-PYTHON
    all-pairs Jaccard >= 0.8 over the same planted corpus, pair for pair
    including sizes and intersections."""
    from guidance_for_analytics_observability_on_aws_spark.operators.dedup import (
        dedup_prefix_filter,
    )

    docs = spark.createDataFrame(
        [
            (i, " ".join(ws), "en", "s1", len(" ".join(ws)))
            for i, ws in enumerate(token_lists)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {
        (r.doc_a, r.doc_b): (r.intersection_size, r.size_a, r.size_b)
        for r in dedup_prefix_filter(docs).collect()
    }
    # replicate the corpus() planting, then brute-force every pair
    planted = {}
    for i, ws in enumerate(token_lists):
        planted[i] = ws
        if i % 25 == 0:
            planted[i + 1000000] = ws
        if i % 25 == 5:
            planted[i + 2000000] = list(reversed(ws))
        if i % 25 == 10:
            planted[i + 3000000] = ws[: max(1, int(len(ws) * 0.9))]
    sh = {
        k: {" ".join(v[j : j + 3]) for j in range(len(v) - 2)}
        for k, v in planted.items()
        if len(v) >= 3
    }
    ids = sorted(sh)
    want = {}
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sh[a] & sh[b])
            union = len(sh[a]) + len(sh[b]) - inter
            if union and inter / union >= 0.8:
                want[(a, b)] = (inter, len(sh[a]), len(sh[b]))
    assert got == want


minute_series = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=200),  # minute offset (gaps!)
        st.integers(min_value=0, max_value=1),  # firing state
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda t: t[0],
)


@settings(max_examples=20, deadline=None)
@given(minute_series)
def test_alert_flap_tail_matches_literal_loop(spark, series):
    """O77's transition/flap arithmetic vs a literal Python loop on random
    gappy minute series — the trailing-1h RANGE frame must honor calendar
    gaps (a transition 61 minutes ago is outside the window even when only
    3 observed rows separate them), which a rowsBetween frame would get
    wrong."""
    from guidance_for_analytics_observability_on_aws_spark.operators.observability import (
        alert_flap_tail,
    )

    series = sorted(series)
    minute = spark.createDataFrame(
        [(1, "run_time_ms", 3200, "app", m * 60000, f) for m, f in series],
        "rule_id long, metric string, threshold long, app_id string, "
        "minute_ms long, firing int",
    )
    r = alert_flap_tail(minute).collect()[0]
    fires = [f for _, f in series]
    trans = [
        1 if i > 0 and fires[i] != fires[i - 1] else 0
        for i in range(len(series))
    ]
    trail = [
        sum(
            trans[j]
            for j in range(i + 1)
            if series[i][0] - series[j][0] <= 59
        )
        for i in range(len(series))
    ]
    assert r.n_minutes == len(series)
    assert r.n_firing_minutes == sum(fires)
    assert r.n_transitions == sum(trans)
    assert r.max_transitions_1h == max(trail)
    assert r.n_flapping_minutes == sum(1 for t in trail if t >= 4)


hist_values = st.lists(
    st.integers(min_value=0, max_value=5000), min_size=1, max_size=200
)


@settings(max_examples=20, deadline=None)
@given(hist_values)
def test_histogram_percentile_tail_matches_literal_selection(spark, vals):
    """O75's cross-multiplied bin selection vs the literal definition: the
    returned pXX edge must be the bin of the ceil(p*n/100)-th ranked value
    under the same clamped equi-width binning, for random value sets."""
    import math

    from guidance_for_analytics_observability_on_aws_spark.operators.observability import (
        histogram_percentile_tail,
    )

    bins = {}
    for v in vals:
        b = min(v // 100, 31)
        bins[b] = bins.get(b, 0) + 1
    bdf = spark.createDataFrame(
        [("hour", "click", 0, b, n) for b, n in sorted(bins.items())],
        "level string, event_type string, bucket_ms long, bin long, n long",
    )
    r = histogram_percentile_tail(bdf).collect()[0]
    ranked = sorted(min(v // 100, 31) for v in vals)
    n = len(ranked)
    for p, got in ((50, r.p50_lo), (95, r.p95_lo), (99, r.p99_lo)):
        want_bin = ranked[math.ceil(p * n / 100) - 1]
        assert got == want_bin * 100, (p, got, want_bin, vals)
    assert r.n_rows == n and r.n_bins_used == len(bins)


@settings(max_examples=8, deadline=None)
@given(docs_strategy)
def test_sorted_neighborhood_matches_literal_reference(spark, token_lists):
    """D30 vs a literal Python SNM (sort by the 40-char normalized prefix,
    scan a window of 8, exact Jaccard >= 0.8) over the planted corpus —
    attacks the rank/bucket-join rewrite with random small-vocabulary
    docs where many share identical prefixes (maximal rank-tie stress)."""
    from guidance_for_analytics_observability_on_aws_spark.operators.dedup import (
        dedup_sorted_neighborhood,
    )

    docs = spark.createDataFrame(
        [
            (i, " ".join(ws), "en", "s1", len(" ".join(ws)))
            for i, ws in enumerate(token_lists)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {
        (r.doc_a, r.doc_b): (r.rank_gap, r.intersection_size)
        for r in dedup_sorted_neighborhood(docs).collect()
    }
    planted = {}
    for i, ws in enumerate(token_lists):
        planted[i] = ws
        if i % 25 == 0:
            planted[i + 1000000] = ws
        if i % 25 == 5:
            planted[i + 2000000] = list(reversed(ws))
        if i % 25 == 10:
            planted[i + 3000000] = ws[: max(1, int(len(ws) * 0.9))]
    eligible = {k: v for k, v in planted.items() if len(v) >= 3}
    order = sorted(eligible, key=lambda k: (" ".join(eligible[k])[:40], k))
    sh = {
        k: {" ".join(v[j : j + 3]) for j in range(len(v) - 2)}
        for k, v in eligible.items()
    }
    want = {}
    for x in range(len(order)):
        for y in range(x + 1, min(x + 8, len(order))):
            a, b = order[x], order[y]
            inter = len(sh[a] & sh[b])
            union = len(sh[a]) + len(sh[b]) - inter
            if union and inter * 100 >= 80 * union:
                want[(min(a, b), max(a, b))] = (y - x, inter)
    assert got == want


@settings(max_examples=12, deadline=None)
@given(docs_strategy)
def test_vocab_growth_matches_literal_reference(spark, token_lists):
    """X16 vs a literal Python loop: equal-rank decile buckets, first-seen
    type attribution, cumulative totals — on random corpora where many
    docs share the whole vocabulary (the worst case for 'new type'
    bookkeeping)."""
    from guidance_for_analytics_observability_on_aws_spark.operators.textops import (
        vocab_growth,
    )

    docs = spark.createDataFrame(
        [
            (i, " ".join(ws), "en", "s1", len(" ".join(ws)))
            for i, ws in enumerate(token_lists)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {
        r.bucket: (r.n_docs, r.n_tokens, r.new_types, r.cum_types, r.cum_tokens)
        for r in vocab_growth(docs).collect()
    }
    n = len(token_lists)
    seen: set = set()
    buckets: dict = {}
    for rank, (i, ws) in enumerate(
        sorted(enumerate(token_lists), key=lambda t: t[0]), start=1
    ):
        b = (rank - 1) * 10 // n
        d = buckets.setdefault(b, [0, 0, 0])
        d[0] += 1
        d[1] += len(ws)
        for w in ws:
            if w not in seen:
                seen.add(w)
                d[2] += 1
    want = {}
    ct = ck = 0
    for b in sorted(buckets):
        nd, nt, nw = buckets[b]
        ct += nw
        ck += nt
        want[b] = (nd, nt, nw, ct, ck)
    assert got == want


click_purchase_series = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=20 * 86400),  # second offset
        st.sampled_from(["click", "purchase"]),
        st.integers(min_value=0, max_value=100000),  # value cents*? raw value
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda t: t[0],
)


@settings(max_examples=15, deadline=None)
@given(click_purchase_series)
def test_attribution_matches_literal_loop(spark, series):
    """T48 vs a literal Python loop on random event series: lookback
    membership, recency ranks, and the largest-remainder cent split must
    all match — and every purchase's credits must sum to its cents."""
    import datetime as dt

    from guidance_for_analytics_observability_on_aws_spark.operators.tpch import (
        events_attribution_multitouch,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(seconds=s), 1, et, v / 100.0, "{}")
        for i, (s, et, v) in enumerate(sorted(series))
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    got = {
        (r.purchase_event_id, r.click_event_id): (
            r.touch_rank,
            r.n_touches,
            r.credit_cents,
        )
        for r in events_attribution_multitouch(ev).collect()
    }
    import math

    evs = [
        (i, s * 1000, et, math.floor(v / 100.0 * 100 + 0.5))
        for i, (s, et, v) in enumerate(sorted(series))
    ]
    want = {}
    for pid, pms, pet, pcents in evs:
        if pet != "purchase":
            continue
        touches = [
            (cid, cms)
            for cid, cms, cet, _ in evs
            if cet == "click" and cms < pms and cms >= pms - 7 * 86400000
        ]
        touches.sort(key=lambda t: (-t[1], -t[0]))
        n = len(touches)
        for rank, (cid, cms) in enumerate(touches, start=1):
            credit = pcents // n + (1 if rank <= pcents % n else 0)
            want[(pid, cid)] = (rank, n, credit)
    assert got == want


@settings(max_examples=8, deadline=None)
@given(docs_strategy)
def test_decontaminate_neardup_matches_brute_force(spark, token_lists):
    """P22's bipartite prefix filter vs a pure-Python brute force over
    every (train, bench) pair at containment >= 0.8 — attacks the
    bench-side-only prefix bound (the asymmetric variant of the AllPairs
    theorem) with random small-vocabulary corpora."""
    from guidance_for_analytics_observability_on_aws_spark.operators.pipeline import (
        decontaminate_neardup,
    )

    docs = spark.createDataFrame(
        [
            (i, " ".join(ws), "en", "s1", len(" ".join(ws)))
            for i, ws in enumerate(token_lists)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {
        (r.doc_id, r.bench_doc_id): (r.n_shared, r.n_bench_shingles)
        for r in decontaminate_neardup(docs).collect()
    }
    planted = {}
    for i, ws in enumerate(token_lists):
        planted[i] = ws
        if i % 25 == 0:
            planted[i + 1000000] = ws
        if i % 25 == 5:
            planted[i + 2000000] = list(reversed(ws))
        if i % 25 == 10:
            planted[i + 3000000] = ws[: max(1, int(len(ws) * 0.9))]
    sh = {
        k: {" ".join(v[j : j + 3]) for j in range(len(v) - 2)}
        for k, v in planted.items()
        if len(v) >= 3
    }
    bench = {
        i: s
        for i, s in sh.items()
        if i < 1000000 and i % 25 == 0
    }
    train = {i: s for i, s in sh.items() if not (i < 1000000 and i % 25 == 0)}
    want = {}
    for t, ts in train.items():
        for b, bs in bench.items():
            inter = len(ts & bs)
            if inter * 100 >= 80 * len(bs):
                want[(t, b)] = (inter, len(bs))
    assert got == want


@settings(max_examples=12, deadline=None)
@given(st.lists(st.text(alphabet="abcde fgh", min_size=1, max_size=120),
                min_size=1, max_size=10))
def test_mm_frame_dedup_matches_literal_slicing(spark, texts):
    """M10 vs a literal Python slicer: distinct 16-char frame sets per
    video (doc_id % 3 == 2 only, >= 16 chars), pairwise shared counts and
    containments — random texts stress partial final frames (dropped) and
    repeated-frame dedup."""
    from guidance_for_analytics_observability_on_aws_spark.operators.multimodal import (
        mm_frame_dedup,
    )

    rows = [(i, t, "en", "s1", len(t)) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {
        (r.doc_a, r.doc_b): (r.n_shared_frames, r.n_a, r.n_b)
        for r in mm_frame_dedup(docs).collect()
    }
    frames = {}
    for i, t in enumerate(texts):
        if i % 3 != 2 or len(t) < 16:
            continue
        frames[i] = {t[16 * j : 16 * j + 16] for j in range(len(t) // 16)}
    ids = sorted(frames)
    want = {}
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(frames[a] & frames[b])
            if inter >= 1:
                want[(a, b)] = (inter, len(frames[a]), len(frames[b]))
    assert got == want


@settings(max_examples=8, deadline=None)
@given(docs_strategy)
def test_distribution_drift_matches_literal(spark, token_lists):
    """X19 vs a literal Python computation on random corpora: the exact
    integer L1, the churn counts and the TV bound 0 ≤ tv ≤ 1 — documents
    split old/new by index parity so both sides are non-trivial."""
    from collections import Counter

    from guidance_for_analytics_observability_on_aws_spark.operators.textops import (
        text_distribution_drift,
    )

    rows = [
        # ids ≡ 1 (mod 25) on BOTH sides so corpus() plants nothing
        # (plants fire on doc_id % 25 ∈ {0, 5, 10})
        (
            (1_000_101 + 50 * i) if i % 2 else (101 + 50 * i),
            " ".join(toks),
            "en",
            "srcp",
            5,
        )
        for i, toks in enumerate(token_lists)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {r.source: r for r in text_distribution_drift(docs).collect()}
    old_c: Counter = Counter()
    new_c: Counter = Counter()
    for i, toks in enumerate(token_lists):
        (new_c if i % 2 else old_c).update(toks)
    n_old, n_new = sum(old_c.values()), sum(new_c.values())
    vocab = set(old_c) | set(new_c)
    l1 = sum(abs(old_c[t] * n_new - new_c[t] * n_old) for t in vocab)
    r = got["srcp"]
    assert (r.n_old_tokens, r.n_new_tokens) == (n_old, n_new)
    assert r.l1_scaled == l1
    assert r.n_gained_types == sum(1 for t in vocab if not old_c[t])
    assert r.n_lost_types == sum(1 for t in vocab if not new_c[t])
    if n_old and n_new:
        assert 0.0 <= r.tv_distance <= 1.0
        assert abs(r.tv_distance - l1 / (2.0 * n_old * n_new)) == 0.0
    else:
        assert r.tv_distance is None


@settings(max_examples=8, deadline=None)
@given(docs_strategy)
def test_soft_dedup_matches_literal(spark, token_lists):
    """P24 vs a literal Python evaluation of the deterministic keep rule
    on random corpora (including hash-collision-free cluster sizing and
    token-mass reconciliation)."""
    import hashlib as hl
    from collections import Counter

    from guidance_for_analytics_observability_on_aws_spark.operators.pipeline import (
        mixture_soft_dedup,
    )

    rows = [
        # ids ≡ 1 (mod 25) so corpus() plants nothing
        (101 + 50 * i, " ".join(toks), "en", "srcp", 5)
        for i, toks in enumerate(token_lists)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = mixture_soft_dedup(docs).collect()[0]
    texts = {did: t for did, t, _, _, _ in rows}
    sizes = Counter(texts.values())
    kept = {}
    for did, t in texts.items():
        n = sizes[t]
        h = int(hl.md5(f"{did}#{t}".encode()).hexdigest()[:13], 16)
        kept[did] = 1 if h % n == 0 else 0
    n_tok = {did: len(t.split(" ")) for did, t in texts.items()}
    assert got.n_docs == len(rows)
    assert got.n_dup_docs == sum(1 for t in texts.values() if sizes[t] >= 2)
    assert got.n_kept == sum(kept.values())
    assert got.tokens_before == sum(n_tok.values())
    assert got.tokens_after == sum(n_tok[d] * kept[d] for d in kept)
    assert got.all_unique_kept


@settings(max_examples=8, deadline=None)
@given(docs_strategy)
def test_bloom_gate_matches_literal_bloom(spark, token_lists):
    """D32 vs a literal Python Bloom filter on random corpora: the same
    md5-hex position derivation, word layout and probe rule must yield
    identical per-source flag counts — an independent implementation of
    the whole sketch, not just the audit columns."""
    import hashlib as hl
    from collections import Counter

    from guidance_for_analytics_observability_on_aws_spark.operators.dedup import (
        dedup_bloom_gate,
    )

    m = 1 << 20
    rows = [
        # ids ≡ 1 (mod 25) so corpus() plants nothing; even i = corpus,
        # odd i = arriving batch
        (
            (1_000_101 + 50 * i) if i % 2 else (101 + 50 * i),
            " ".join(toks),
            "en",
            "srcp",
            5,
        )
        for i, toks in enumerate(token_lists)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = dedup_bloom_gate(docs).collect()
    texts = {did: t for did, t, _, _, _ in rows}
    old_keys = {
        hl.md5(t.encode()).hexdigest()
        for did, t in texts.items()
        if did < 1_000_000
    }
    bits: set[int] = set()
    for k in old_keys:
        for i in range(4):
            bits.add(int(k[8 * i : 8 * i + 8], 16) % m)
    flags = Counter()
    truth = Counter()
    n_new = 0
    for did, t in texts.items():
        if did < 1_000_000:
            continue
        n_new += 1
        k = hl.md5(t.encode()).hexdigest()
        if all(int(k[8 * i : 8 * i + 8], 16) % m in bits for i in range(4)):
            flags["f"] += 1
        if k in old_keys:
            truth["t"] += 1
    if n_new == 0:
        assert not out
        return
    r = out[0]
    assert (r.n_new, r.n_flagged, r.n_true_dup) == (
        n_new,
        flags["f"],
        truth["t"],
    )
    assert r.all_true_dups_flagged


@settings(max_examples=8, deadline=None)
@given(docs_strategy)
def test_repeated_spans_match_literal(spark, token_lists):
    """D34/D35 vs a literal Python model on random small-vocab corpora
    (8-word alphabet, 3-token spans → dense genuine repeats, the
    adversarial regime for the interval-union and canonical-pick
    algebra): per-doc span counts, exact union masses, and the scrubbed
    text itself must all match; D35's per-doc scrub mass never exceeds
    D34's repeated mass (the canonical copy is exempt)."""
    from guidance_for_analytics_observability_on_aws_spark.operators.dedup import (
        dedup_repeated_spans,
        dedup_repeated_spans_scrub,
    )

    w = 3
    # ids ≡ 1 (mod 25) so corpus() plants nothing
    ids = [101 + 25 * i for i in range(len(token_lists))]
    docs = spark.createDataFrame(
        [(ids[i], " ".join(toks), "en", "srcp")
         for i, toks in enumerate(token_lists)],
        "doc_id long, text string, lang string, source string",
    )
    # literal model
    spans: dict[tuple, list] = {}
    for i, toks in enumerate(token_lists):
        for s in range(1, len(toks) - w + 2):
            spans.setdefault(tuple(toks[s - 1 : s - 1 + w]), []).append(
                (ids[i], s)
            )
    rep_starts: dict[int, list] = {}
    scrub_pos: dict[int, set] = {}
    for occs in spans.values():
        if len(occs) < 2:
            continue
        canon = min(occs)
        for d, s in occs:
            rep_starts.setdefault(d, []).append(s)
            if (d, s) != canon:
                scrub_pos.setdefault(d, set()).update(range(s, s + w))
    want34 = {}
    for i, toks in enumerate(token_lists):
        d = ids[i]
        if d not in rep_starts:
            continue
        cov = set()
        for s in rep_starts[d]:
            cov.update(range(s, s + w))
        want34[d] = (len(toks), len(rep_starts[d]), len(cov),
                     len(cov) / len(toks))
    got34 = {
        r.doc_id: (r.n_tokens, r.n_repeated_spans, r.repeated_token_mass,
                   r.repeated_fraction)
        for r in dedup_repeated_spans(docs, span_tokens=w).collect()
    }
    assert got34 == want34
    want35 = {}
    for i, toks in enumerate(token_lists):
        d = ids[i]
        cov = scrub_pos.get(d, set())
        kept = [t for p, t in enumerate(toks, 1) if p not in cov]
        want35[d] = (len(toks), len(cov), " ".join(kept))
    got35 = {
        r.doc_id: (r.n_tokens, r.n_scrubbed, r.text_clean)
        for r in dedup_repeated_spans_scrub(docs, span_tokens=w).collect()
    }
    assert got35 == want35
    for d, (_, n_scr, _) in want35.items():
        if d in want34:
            assert n_scr <= want34[d][2]  # canonical exemption
        else:
            assert n_scr == 0
