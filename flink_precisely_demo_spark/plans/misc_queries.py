"""Third query wave: outer joins with null semantics, INTERSECT,
unpivot, regex extraction, array functions, histogram bucketing,
exact interpolated percentiles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.windowed_agg import sum_exact
from ..sources.parquet import load_table
from .queries import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "full_outer_join_nulls",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey,
           COALESCE(c.c_mktsegment, 'NO_CUSTOMER') AS segment,
           COALESCE(o.o_totalprice, 0.0) AS price
    FROM (SELECT * FROM customer WHERE c_custkey % 3 = 0) c
    FULL OUTER JOIN (SELECT * FROM orders WHERE o_custkey % 2 = 0) o
      ON c.c_custkey = o.o_custkey
    """,
)
def _full_outer_join_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 3 == 0)
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") % 2 == 0)
    j = c.join(o, c.c_custkey == o.o_custkey, "full_outer")
    return j.select(
        "c_custkey", "o_orderkey",
        F.coalesce(F.col("c_mktsegment"), F.lit("NO_CUSTOMER")).alias("segment"),
        F.coalesce(F.col("o_totalprice"), F.lit(0.0)).alias("price"))


@query(
    "intersect_keys",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def _intersect_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "MACHINERY").select("c_custkey")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT") \
        .select(F.col("o_custkey").alias("c_custkey"))
    return c.intersect(o)


@query(
    "unpivot_measures",
    oracle="""
    SELECT l_orderkey, l_linenumber, measure, val
    FROM lineitem
    UNPIVOT (val FOR measure IN (l_quantity, l_extendedprice, l_discount))
    WHERE l_orderkey % 100 = 0
    """,
)
def _unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure", "val")


@query(
    "regex_extract_props",
    oracle="""
    SELECT event_id,
           regexp_extract(props, '"k": (\\d+)', 1) AS k_str,
           CAST(regexp_extract(props, '(\\d+)', 1) AS INT) AS k_num,
           regexp_matches(event_type, '^(click|view)$') AS is_interaction
    FROM events
    """,
)
def _regex_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.regexp_extract("props", r'"k": (\d+)', 1).alias("k_str"),
        F.regexp_extract("props", r"(\d+)", 1).cast("int").alias("k_num"),
        F.col("event_type").rlike(r"^(click|view)$").alias("is_interaction"))


@query(
    "array_functions_embeddings",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           embedding[1] AS first_elem,
           embedding[64] AS last_elem,
           round(CAST(list_aggregate(list_transform(embedding,
                 x -> CAST(x AS DOUBLE)), 'sum') AS DOUBLE), 6) AS elem_sum,
           round(CAST(list_aggregate(list_transform(embedding,
                 x -> CAST(x AS DOUBLE)), 'max') AS DOUBLE), 6) AS elem_max
    FROM embeddings
    """,
)
def _array_functions_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).alias("first_elem"),
        F.element_at("embedding", 64).alias("last_elem"),
        F.round(F.aggregate("embedding", F.lit(0.0),
                            lambda a, x: a + x.cast("double")), 6)
         .alias("elem_sum"),
        F.round(F.array_max(F.transform("embedding", lambda x: x.cast("double"))), 6)
         .alias("elem_max"))


@query(
    "histogram_buckets",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           -- VARCHAR route: correctly-rounded decimal→double (DuckDB's
           -- direct cast is off one ULP above 2^53 scaled — r14 sweep)
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS VARCHAR)
                AS DOUBLE) AS total,
           CASE WHEN floor(o_totalprice / 50000) < 2 THEN 'low'
                WHEN floor(o_totalprice / 50000) < 6 THEN 'mid'
                ELSE 'high' END AS band
    FROM orders
    GROUP BY 1, 4
    """,
)
def _histogram_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50000)
    return (o.groupBy(bucket.cast("long").alias("bucket"),
                      F.when(bucket < 2, "low")
                       .when(bucket < 6, "mid")
                       .otherwise("high").alias("band"))
             .agg(F.count(F.lit(1)).alias("n"),
                  sum_exact("o_totalprice").alias("total"))
             .select("bucket", "n", "total", "band"))


@query(
    "percentile_exact",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.95), 6) AS p95,
           round(CAST(MIN(value) AS DOUBLE), 6) AS v_min,
           round(CAST(MAX(value) AS DOUBLE), 6) AS v_max
    FROM events
    GROUP BY event_type
    """,
)
def _percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles: Spark `percentile` and DuckDB
    `quantile_cont` share the linear-interpolation definition; 6-dp
    rounding absorbs evaluation-order float noise."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        F.round(F.min("value"), 6).alias("v_min"),
        F.round(F.max("value"), 6).alias("v_max"))
