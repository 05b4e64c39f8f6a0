"""Bucketed-table co-location: the persistent layout must actually
eliminate the join-side shuffles, not just produce correct rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_precisely_demo_spark.plans.layout_queries import bucketed_pair
from flink_precisely_demo_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def no_broadcast(spark):
    """Pin the SortMergeJoin path: at test SF the small side would
    broadcast (also exchange-free, but that path doesn't exist at
    100 TB fact-fact scale — the bucketed contract is what does)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def _join(spark, o, line):
    j = o.join(line, o["o_orderkey"] == line["l_orderkey"])
    return (j.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_items")))


def test_bucketed_join_has_no_join_exchange(spark, no_broadcast):
    o_name, l_name = bucketed_pair(spark, SF)
    plan_b = _join(spark, spark.table(o_name), spark.table(l_name)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan_b, plan_b
    # exactly ONE exchange: the rollup's. The join itself rides the
    # bucket alignment — zero shuffles on either fact side.
    assert plan_b.count("Exchange") == 1, plan_b

    raw = _join(spark,
                load_table(spark, SF, "orders")
                .select("o_orderkey", "o_orderpriority"),
                load_table(spark, SF, "lineitem")
                .select("l_orderkey", "l_extendedprice"))
    plan_r = raw._jdf.queryExecution().executedPlan().toString()
    # the un-bucketed twin pays BOTH join-side shuffles + the rollup
    assert plan_r.count("Exchange") >= 3, plan_r


def test_bucketed_join_rows_match_raw(spark):
    o_name, l_name = bucketed_pair(spark, SF)
    got = _join(spark, spark.table(o_name), spark.table(l_name))
    want = _join(spark,
                 load_table(spark, SF, "orders")
                 .select("o_orderkey", "o_orderpriority"),
                 load_table(spark, SF, "lineitem")
                 .select("l_orderkey", "l_extendedprice"))
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))


def test_one_file_per_bucket(spark):
    """The writer pre-repartitions one task per bucket so each bucket
    is a single pre-sorted file — multi-file buckets force a read-
    side re-sort of every merged bucket."""
    import glob
    import os
    import tempfile

    o_name, _ = bucketed_pair(spark, SF)
    path = os.path.join(tempfile.gettempdir(), o_name)
    files = glob.glob(os.path.join(path, "part-*.parquet"))
    assert 0 < len(files) <= 8, files
