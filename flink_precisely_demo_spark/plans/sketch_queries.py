"""Approximate/sketch and iterative queries.

These are the driver contract's "weaker check" category: k-means is
iterative (not SQL-expressible), and approximate sketches are
algorithm-specific (Spark's HLL++ and DuckDB's approx_count_distinct
legitimately disagree) — so they register without oracles and the
unit tests assert accuracy bounds against exact answers instead
(tests/test_sketches.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.kmeans import kmeans_assignments
from ..sources.parquet import load_table
from .queries import query


@query("kmeans_ivf_index")  # rows-only: iterative algorithm
def _kmeans_ivf_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_assignments(emb, k=8, max_iter=3)


@query("approx_sketches")  # rows-only: engine-specific sketch values
def _approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.percentile_approx("value", [0.5, 0.95, 0.99], 10000)
         .alias("value_quantiles"),
        F.count(F.lit(1)).alias("n"))
