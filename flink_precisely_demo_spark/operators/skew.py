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


def _assert_no_salt_col(*dfs: DataFrame) -> None:
    """The salting helpers stage their salt under the fixed name
    ``__salt``; an input that already carries that column would be
    silently clobbered by withColumn / duplicated ambiguously by the
    replication cross join, producing WRONG joins instead of an error
    (r13 advice). Fail loudly instead."""
    for df in dfs:
        if "__salt" in df.columns:
            raise ValueError(
                "input already has a '__salt' column — rename it "
                "before using the skew salting helpers")


def hot_keys(df: DataFrame, key: str,
             min_fraction: float = 0.01) -> DataFrame:
    """Keys holding more than ``min_fraction`` of rows. ONE exact
    aggregation pass over ``df`` — groupBy(key).count() with map-side
    combine shuffles one row per distinct key, already the cheap
    shape; a sketch pre-pass would save nothing here. The per-key
    counts persist (distinct-key-sized — two longs per key) so the
    row total can be summed from them and the threshold filter can
    reuse them WITHOUT a second scan of ``df`` (the prior shape paid
    an extra eager ``df.count()`` full pass — r13 review). Deciding
    hotness is inherently an action, so the total's one small job on
    the aggregated frame runs at call time."""
    counts = (df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
              .persist())
    try:
        total = counts.agg(F.sum("n")).collect()[0][0] or 0
        # at most 1/min_fraction keys can clear the threshold, so the
        # collect is bounded by construction; materializing on the
        # driver lets us unpersist deterministically here instead of
        # pinning the cached counts for the session's lifetime
        # (r13 advice: every hot_cold_split_join / bench sweep call
        # leaked one cached dataset)
        rows = (counts.filter(F.col("n") >= total * min_fraction)
                .select(key, "n").collect())
    finally:
        counts.unpersist()
    schema = counts.select(key, "n").schema
    return df.sparkSession.createDataFrame(rows, schema)


def salted_grouped_agg(df: DataFrame, key: str, aggs: list[Column],
                       reaggs: list[Column], n_salts: int = 16) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs``: phase-1 aggregates over (key, salt) — e.g.
    ``F.sum('v').alias('partial_sum')``.
    ``reaggs``: phase-2 merge over key — e.g.
    ``F.sum('partial_sum').alias('total')``. Caller guarantees the
    pair is algebraically correct (sum/sum, count/sum, min/min...).
    """
    _assert_no_salt_col(df)
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * n_salts).cast("int"))
    phase1 = salted.groupBy(key, "__salt").agg(*aggs)
    return phase1.groupBy(key).agg(*reaggs)


def salted_shuffle_join(fact: DataFrame, other: DataFrame, key: str,
                        salt_on: list[str], n_salts: int = 16) -> DataFrame:
    """Salted SHUFFLE equi-join for a skewed fact against a
    one-row-per-key side too big to broadcast — the explicit fallback
    for the joins AQE's runtime skew split cannot rescue (AQE only
    splits SortMergeJoin/ShuffledHashJoin partitions it can observe:
    a join feeding an operator that REQUIRES the key partitioning, a
    stream-side join, or an engine with AQE off).

    The fact side gains a deterministic salt — ``xxhash64(salt_on) %
    n_salts``, so a hot KEY's rows spread by the entropy of
    ``salt_on`` (pass unique-ish columns; a retried task re-derives
    the same salt, unlike ``rand()``) — and the other side is
    replicated ``n_salts`` times via a broadcast cross join with the
    salt spine. The join then shuffles on (key, salt): the hot key's
    rows land on ``n_salts`` reducers instead of one.

    Correctness requires ``other`` to be unique per ``key`` (each
    replica is identical, so every fact row still matches exactly its
    key's row — result-invariance vs the plain join is oracle-checked
    by the ``skew_salted_join`` pair). Cost: the other side's shuffle
    volume multiplies by ``n_salts`` — the standard salting trade;
    size ``n_salts`` to the hot key's reducer overload, not higher."""
    _assert_no_salt_col(fact, other)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_on]),
                  F.lit(n_salts)).cast("int")
    fact_s = fact.withColumn("__salt", salt)
    spine = (fact.sparkSession.range(n_salts)
             .select(F.col("id").cast("int").alias("__salt")))
    other_s = other.crossJoin(F.broadcast(spine))
    return fact_s.join(other_s, [key, "__salt"]).drop("__salt")


def hot_cold_split_join(fact: DataFrame, other: DataFrame, key: str,
                        min_fraction: float = 0.01) -> DataFrame:
    """Hot/cold split equi-join — the third skew lever, for when the
    hot keys' OTHER-side rows fit in memory: route the hot keys
    around the shuffle entirely instead of spreading them
    (salted_shuffle_join) or splitting them at runtime (AQE).

    One exact pre-pass finds the keys holding more than
    ``min_fraction`` of the fact (:func:`hot_keys` — at most
    ``1/min_fraction`` keys can exist, so the hot-key set is bounded
    by construction and broadcasts legally). The fact then splits:

    - COLD rows join ``other`` on the ordinary key shuffle, which is
      now skew-free — every pathological key left the exchange;
    - HOT rows join the hot slice of ``other`` (≤ ``1/min_fraction``
      keys' worth) as a BROADCAST join: the heaviest rows never
      shuffle at all.

    vs salting: no ``n_salts``× replication of the other side, and
    the hot rows pay zero exchange instead of a 1/n_salts-wide one;
    the price is the extra counting pass and the requirement that
    the hot slice of ``other`` be broadcast-sized (true whenever
    ``other`` is one-row-per-key — the semi-join bound is
    1/min_fraction rows). Result-invariance vs the plain join is
    oracle-checked by the ``skew_hotcold_join`` pair."""
    hot = F.broadcast(hot_keys(fact, key, min_fraction).select(key))
    fact_hot = fact.join(hot, key, "left_semi")
    fact_cold = fact.join(hot, key, "left_anti")
    other_hot = other.join(hot, key, "left_semi")
    cold = fact_cold.join(other, key)
    # other_hot is ≤ 1/min_fraction keys of `other`: bounded, the
    # broadcast is the operator's point
    hot_side = fact_hot.join(F.broadcast(other_hot), key)
    return cold.unionByName(hot_side)


def salted_broadcast_left(fact: DataFrame, dim: DataFrame, key: str,
                          n_salts: int = 8) -> DataFrame:
    """Equi-join with the fact side salted and the (small) dim side
    replicated across salts, preserving a (key, salt) partitioning
    for downstream stateful operators."""
    _assert_no_salt_col(fact, dim)
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
