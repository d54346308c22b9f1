"""PySpark-native analytics engine with the query/data-processing surface of
aws-solutions-library-samples/guidance-for-analytics-observability-on-aws.

The reference solution collects Spark task metrics + logs (Scala listener &
log4j appender), aggregates per-stage skewness, batches and routes records to
OpenSearch, and answers dashboard analytics queries. This package re-expresses
that entire surface Spark-first (DataFrame/SQL + Structured Streaming), and
adds large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns). See SURVEY.md for the full inventory.
"""

from .session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
