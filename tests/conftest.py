from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from guidance_for_analytics_observability_on_aws_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


#: One oracle-parity spot per SURVEY §2 family for the `-m fast` tier —
#: the driver's pytest capture truncated on the ~30-min full suite two
#: rounds running (VERIFY tests_ok unconfirmable); this tier is the
#: quick driver-confirmable gate (plan pins + one Spark-vs-DuckDB spot
#: per family), NOT a replacement for the full suite.
FAST_ORACLE_SPOTS = {
    "obs_error_budget",            # O: window cascade + rollup
    "obs_task_metrics",            # O: the telemetry projection itself
    "tpch_q1_pricing_summary",     # T: scan-agg
    "tpch_q3_shipping_priority",   # T: join strategy
    "dedup_minhash_lsh",           # D: signature + banding join
    "dedup_containment_banded",    # D: candidate-restricted exact scoring
    "similarity_eval_report",      # D: concurrent-materialization report
    "dup_groups",                  # P: CC over the candidate graph
    "dedup_eval_report",           # P: the composed grading report
    "corpus_curation_pipeline",    # P: the funnel
    "text_token_count",            # X
    "mm_shard_manifest",           # M
}


#: test_plans.py members that sweep the ENTIRE 247-entry registry
#: (~4 min each) — valuable, but they belong to the full gate, not the
#: quick tier.
_SLOW_PLAN_SWEEPS = {"test_no_row_python_udfs_anywhere", "test_no_cartesian_products"}


def pytest_collection_modifyitems(config, items):
    fast_parity = {f"test_parity[{n}]" for n in FAST_ORACLE_SPOTS}
    for item in items:
        is_plan_pin = (
            item.fspath.basename == "test_plans.py"
            and item.originalname not in _SLOW_PLAN_SWEEPS
        )
        if is_plan_pin or item.name in fast_parity:
            item.add_marker(pytest.mark.fast)


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    s = get_spark("gfaooa-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
