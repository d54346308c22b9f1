from .tables import TABLES, load_tables
from .telemetry import task_metrics, TELEMETRY_CTE

__all__ = ["TABLES", "load_tables", "task_metrics", "TELEMETRY_CTE"]
