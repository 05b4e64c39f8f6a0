"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator
from SURVEY.md §2 with its DuckDB oracle twin. Implementation lives in
``flink_precisely_demo_spark/``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flink_precisely_demo_spark.plans import queries as _q
# importing registers additional queries into _q.QUERIES / _q.ORACLES
from flink_precisely_demo_spark.plans import (  # noqa: F401
    ann_queries,
    cdc_queries,
    curation_queries,
    ddl_queries,
    dedup_queries,
    misc_queries,
    multimodal_queries,
    olap_queries,
    reference_sql,
    similarity_queries,
    sketch_queries,
    text_queries,
    window_queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference sql/output.sql re-expressed) on sf0.001."""
    from flink_precisely_demo_spark.plans.flagship import flagship_query
    return flagship_query(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_q.ORACLES)
