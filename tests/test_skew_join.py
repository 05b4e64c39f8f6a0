"""Skew-join handling: AQE's runtime split must engage on the
planted hot key, and the salted fallback must produce the identical
result through a (key, salt) shuffle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_precisely_demo_spark.operators.skew import salted_shuffle_join
from flink_precisely_demo_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.01"


def _fold(c):
    return F.when(F.col(c) % 3 == 0, F.lit(0)) \
            .otherwise(F.col(c)).cast("long")


def _sides(spark):
    line = load_table(spark, SF, "lineitem").select(
        _fold("l_orderkey").alias("k"),
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
    right = (load_table(spark, SF, "orders")
             .select(_fold("o_orderkey").alias("k"))
             .groupBy("k")
             .agg(F.count(F.lit(1)).cast("long").alias("n_ord")))
    return line, right


@pytest.fixture()
def skew_confs(spark):
    """Force the shape the plant needs at test SF: no broadcast (the
    rollup side would broadcast here but cannot at 100 TB), and AQE
    skew thresholds scaled down to see a 60k-row table's hot
    partition the way defaults see a multi-GB one."""
    keys = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
    }
    prev = {k: spark.conf.get(k, None) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_the_planted_hot_key(spark, skew_confs, tmp_path):
    """The UNSALTED join of the planted-skew fact: AQE must detect
    the hot partition at runtime and split it (SortMergeJoin(
    skew=true) in the final plan). This is the primary 100 TB path;
    the salted operator below is the fallback for plans AQE cannot
    touch.

    Two real-world preconditions, discovered empirically and pinned
    here because each is a silent no-op otherwise:
    - AQE's split unit is the MAPPER output chunk, so a skewed side
      with one map task (this harness's single-file, single-row-group
      parquet) cannot be split at all; a 100 TB scan always has
      thousands of mappers, simulated with a 16-way pre-repartition.
    - OptimizeSkewedJoin pattern-matches SMJ -> Sort -> shuffle
      stage; a post-shuffle AGGREGATE under the join (our per-key
      rollup built inline) breaks the match, so the rollup is
      materialized first — and the inline-rollup shape is exactly a
      case where the salted fallback is the only lever."""
    line, right = _sides(spark)
    rp = str(tmp_path / "rollup")
    right.write.mode("overwrite").parquet(rp)
    j = line.repartition(16).join(spark.read.parquet(rp), "k")
    j.collect()                        # AQE finalizes during execution
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, f"AQE skew split did not engage:\n{plan}"


def test_salted_join_matches_plain_and_shuffles_on_salt(spark,
                                                        skew_confs):
    line, right = _sides(spark)
    salted = salted_shuffle_join(line, right, "k",
                                 salt_on=["l_orderkey", "l_linenumber"],
                                 n_salts=8)
    plain = line.join(right, "k")
    agg = lambda df: (df.groupBy("l_returnflag")  # noqa: E731
                      .agg(F.count(F.lit(1)).cast("long").alias("n"),
                           F.sum(F.col("l_quantity") * F.col("n_ord"))
                           .alias("s")))
    got = sorted(map(tuple, agg(salted).collect()))
    want = sorted(map(tuple, agg(plain).collect()))
    assert got == want
    # the join's exchanges must hash on (k, __salt): the hot key's
    # rows spread across 8 reducers — that IS the operator's point
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan and "hashpartitioning(k" in plan, plan


def test_hotcold_join_matches_plain_and_splits_paths(spark,
                                                     skew_confs):
    """The hot/cold split must (a) equal the plain join and (b) show
    both physical paths: a BroadcastHashJoin for the hot slice (the
    explicit bounded-set hint survives even with auto-broadcast
    disabled) and a shuffle join for the cold remainder."""
    from flink_precisely_demo_spark.operators.skew import (
        hot_cold_split_join)

    line, right = _sides(spark)
    split = hot_cold_split_join(line, right, "k", min_fraction=0.01)
    plain = line.join(right, "k")
    agg = lambda df: (df.groupBy("l_returnflag")  # noqa: E731
                      .agg(F.count(F.lit(1)).cast("long").alias("n"),
                           F.sum(F.col("l_quantity") * F.col("n_ord"))
                           .alias("s")))
    got = sorted(map(tuple, agg(split).collect()))
    want = sorted(map(tuple, agg(plain).collect()))
    assert got == want
    plan = split._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan     # hot path: no shuffle
    assert "SortMergeJoin" in plan, plan         # cold path: key shuffle


def test_hotcold_hot_set_is_exactly_the_plant(spark):
    from flink_precisely_demo_spark.operators.skew import hot_keys

    line, _ = _sides(spark)
    hot = {r["k"] for r in hot_keys(line, "k", 0.01).collect()}
    assert hot == {0}


def test_salt_is_deterministic(spark):
    """xxhash64-derived salts re-derive identically on retry (unlike
    rand()): two evaluations give byte-identical assignments."""
    line, _ = _sides(spark)
    salt = F.pmod(F.xxhash64("l_orderkey", "l_linenumber"),
                  F.lit(8)).cast("int")
    a = line.select("l_orderkey", "l_linenumber",
                    salt.alias("s")).collect()
    b = line.select("l_orderkey", "l_linenumber",
                    salt.alias("s")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    spread = {r["s"] for r in a}
    assert len(spread) == 8            # the hot key actually spreads
