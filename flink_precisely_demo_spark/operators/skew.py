"""Skew mitigation utilities (100 TB design, SURVEY.md §7.4).

AQE's skew-join splitting handles most skew at runtime
(spark.sql.adaptive.skewJoin.enabled, on in session.py). These
utilities cover the two cases AQE cannot:

- salted_grouped_agg: a grouped aggregation whose hottest key
  overwhelms one reducer. Two-phase: aggregate on (key, salt) —
  map-side combine already shrinks this — then re-aggregate on key.
  Only algebraic aggregates (sum/count/min/max) can be salted.
- salted_broadcast_left: a broadcast join where the *stream* side is
  fine but the dim must be replicated per salt (used when a
  downstream stateful op needs the salted partitioning preserved).

`hot_keys` finds keys above a frequency threshold with one cheap
pre-pass so salting can target only the hot keys (salting everything
multiplies shuffle volume for no benefit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .broadcast import hint_broadcast_if_small


def hot_keys(df: DataFrame, key: str,
             min_fraction: float = 0.01) -> DataFrame:
    """Keys holding more than ``min_fraction`` of rows. One exact
    aggregation pass — groupBy(key).count() with map-side combine
    shuffles one row per distinct key, already the cheap shape; a
    sketch pre-pass would save nothing here (a prior ``approx_rsd``
    parameter advertised one without implementing it)."""
    total = df.count()
    return (df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
              .filter(F.col("n") >= total * min_fraction)
              .select(key, "n"))


def salted_grouped_agg(df: DataFrame, key: str, aggs: list[Column],
                       reaggs: list[Column], n_salts: int = 16) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs``: phase-1 aggregates over (key, salt) — e.g.
    ``F.sum('v').alias('partial_sum')``.
    ``reaggs``: phase-2 merge over key — e.g.
    ``F.sum('partial_sum').alias('total')``. Caller guarantees the
    pair is algebraically correct (sum/sum, count/sum, min/min...).
    """
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * n_salts).cast("int"))
    phase1 = salted.groupBy(key, "__salt").agg(*aggs)
    return phase1.groupBy(key).agg(*reaggs)


def salted_broadcast_left(fact: DataFrame, dim: DataFrame, key: str,
                          n_salts: int = 8) -> DataFrame:
    """Equi-join with the fact side salted and the (small) dim side
    replicated across salts, preserving a (key, salt) partitioning
    for downstream stateful operators."""
    fact_s = fact.withColumn(
        "__salt", (F.rand(seed=42) * n_salts).cast("int"))
    dim_s = dim.crossJoin(
        F.broadcast(
            fact.sparkSession.range(n_salts)
                .select(F.col("id").cast("int").alias("__salt"))))
    # the replicated dim is n_salts x dim rows — measured hint, so
    # an oversized dim degrades to a shuffle join on (key, salt)
    # instead of OOM-ing the broadcast
    out = fact_s.join(hint_broadcast_if_small(dim_s), [key, "__salt"])
    return out.drop("__salt")
