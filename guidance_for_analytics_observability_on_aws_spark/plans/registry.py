"""Query registry — the single source of truth behind ``__spark_entry__.py``.

Each :class:`QuerySpec` pairs a Spark DataFrame builder (idiomatic
DataFrame-API plan; Catalyst owns the physical strategy) with an equivalent
DuckDB oracle SQL statement used by the driver's correctness gate. Builders
take ``(spark, sf_dir)`` and must alias every computed column identically to
the oracle.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from ..operators import observability as obs
from ..sources.tables import load_tables
from ..sources.telemetry import task_metrics
from .obs_oracles import OBS_ORACLES


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # DuckDB SQL, None → rows-only check


REGISTRY: dict[str, QuerySpec] = {}


def _register(name: str, builder: Callable[[SparkSession, str], DataFrame],
              oracle: Optional[str]) -> None:
    REGISTRY[name] = QuerySpec(name, builder, oracle)


def _tm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return task_metrics(load_tables(spark, sf_dir)["events"])


# --- Group O: observability core -------------------------------------------
_OBS_BUILDERS = {
    "obs_task_metrics": lambda s, d: obs.task_metrics_table(_tm(s, d)),
    "obs_stage_agg_skewness": lambda s, d: obs.stage_agg_skewness(_tm(s, d)),
    "obs_skew_distribution": lambda s, d: obs.skew_distribution(_tm(s, d)),
    "obs_app_summary": lambda s, d: obs.app_summary(_tm(s, d)),
    "obs_cardinality": lambda s, d: obs.cardinality_tiles(_tm(s, d)),
    "obs_date_histogram": lambda s, d: obs.date_histogram(_tm(s, d)),
    "obs_top_n_skew": lambda s, d: obs.top_n_skew(_tm(s, d)),
    "obs_task_percentiles": lambda s, d: obs.task_percentiles(_tm(s, d)),
    "obs_batch_flush": lambda s, d: obs.batch_flush(_tm(s, d)),
    "obs_retry_backoff": lambda s, d: obs.retry_backoff(_tm(s, d)),
    "obs_log_enrich": lambda s, d: obs.log_enrich(_tm(s, d)),
    "obs_error_rate": lambda s, d: obs.error_rate(_tm(s, d)),
    "obs_executor_utilization": lambda s, d: obs.executor_utilization(_tm(s, d)),
    "obs_session_windows": lambda s, d: obs.session_windows(_tm(s, d)),
    "stream_metrics_window": lambda s, d: obs.stream_metrics_window(_tm(s, d)),
}
for _name, _b in _OBS_BUILDERS.items():
    _register(_name, _b, OBS_ORACLES[_name])
