"""Unit tests for batch operators: latest-value enrichment join edge
cases (SURVEY.md §5.2) and tumbling window boundary assignment.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from flink_precisely_demo_spark.operators.enrichment_join import (
    enrich,
    latest_per_key,
)
from flink_precisely_demo_spark.operators.windowed_agg import (
    sum_exact,
    tumbling_window_agg,
)


def test_latest_per_key_picks_max_order(spark):
    dim = spark.createDataFrame(
        [(1, 10, "old"), (1, 20, "new"), (2, 5, "only")],
        "k int, asof int, v string")
    got = {r["k"]: r["v"] for r in latest_per_key(dim, "k", "asof").collect()}
    assert got == {1: "new", 2: "only"}


def test_latest_per_key_tiebreak_deterministic(spark):
    dim = spark.createDataFrame(
        [(1, 10, 100, "a"), (1, 10, 200, "b")],
        "k int, asof int, seq int, v string")
    got = latest_per_key(dim, "k", "asof", tiebreak=["seq"]).collect()
    assert len(got) == 1 and got[0]["v"] == "b"


def test_enrich_inner_semantics_and_key_drop(spark):
    """Facts without a dim match are dropped (EnrichmentJoin emits
    only on match); the dim's key copy is not in the output."""
    fact = spark.createDataFrame([(1, "f1"), (2, "f2"), (9, "orphan")],
                                 "k int, fv string")
    dim = spark.createDataFrame([(1, 1, "d1"), (2, 1, "d2")],
                                "k int, asof int, dv string")
    out = enrich(fact, dim, "k", dim_order_col="asof")
    rows = {r["fv"]: r["dv"] for r in out.collect()}
    assert rows == {"f1": "d1", "f2": "d2"}
    assert out.columns == ["k", "fv", "asof", "dv"]


def test_enrich_case_insensitive_key(spark):
    """Quirk 1: orders joins on 'AddressId' vs address's 'AddressID'
    (StreamingJob.java:113 vs sql/address.sql:2) — intended equi-join
    semantics require case-insensitive key resolution."""
    fact = spark.createDataFrame([(7, "x")], "AddressId int, fv string")
    dim = spark.createDataFrame([(7, "y")], "AddressID int, dv string")
    out = enrich(fact, dim, "AddressId")
    assert out.collect()[0]["dv"] == "y"


def test_enrich_latest_wins_not_all_versions(spark):
    """A fact joins exactly the latest dim version — one output row
    per fact, not one per dim version (ValueState overwrite :65)."""
    fact = spark.createDataFrame([(1, "f")], "k int, fv string")
    dim = spark.createDataFrame(
        [(1, 1, "v1"), (1, 2, "v2"), (1, 3, "v3")],
        "k int, asof int, dv string")
    out = enrich(fact, dim, "k", dim_order_col="asof").collect()
    assert len(out) == 1 and out[0]["dv"] == "v3"


def test_window_boundary_assignment(spark):
    """A row exactly on a 10-minute boundary belongs to the window it
    starts (half-open [start, end) windows)."""
    rows = [
        (datetime(2020, 1, 1, 10, 0, 0), 1.0),    # starts 10:00
        (datetime(2020, 1, 1, 10, 9, 59, 999999), 2.0),   # still 10:00
        (datetime(2020, 1, 1, 10, 10, 0), 4.0),   # starts 10:10
    ]
    df = spark.createDataFrame(rows, "ts timestamp_ntz, v double")
    out = tumbling_window_agg(df, "ts", "10 minutes", [],
                              [sum_exact("v").alias("total")])
    got = {r["window_start"].minute: r["total"] for r in out.collect()}
    assert got == {0: 3.0, 10: 4.0}


def test_sum_exact_order_independent(spark):
    """Decimal accumulation: permuting input order cannot change the
    result (the reason every oracle-compared SUM uses it)."""
    vals = [(i, ((-1) ** i) * (0.1 + i * 1e-3)) for i in range(1000)]
    df = spark.createDataFrame(vals, "i int, v double")
    a = df.orderBy("i").agg(sum_exact("v").alias("s")).first()["s"]
    b = df.orderBy(F.desc("i")).repartition(7).agg(
        sum_exact("v").alias("s")).first()["s"]
    assert a == b

def test_enrich_drops_colliding_dim_columns(spark):
    """Dim columns that collide with fact names are dropped (same rule
    as the streaming twin) — no ambiguous output schema."""
    fact = spark.createDataFrame([(1, 5, "f")], "k int, shared int, fv string")
    dim = spark.createDataFrame([(1, 9, "d")], "k int, shared int, dv string")
    out = enrich(fact, dim, "k")
    assert out.columns == ["k", "shared", "fv", "dv"]
    row = out.collect()[0]
    assert row["shared"] == 5 and row["dv"] == "d"  # fact side wins

def test_enrich_broadcast_false_forbids_broadcast(spark):
    """broadcast_dim=False must pin a sort-merge join even though the
    dim is tiny enough for Catalyst/AQE to auto-broadcast — the MERGE
    hint is a real opt-out, not just a skipped hint."""
    fact = spark.range(1000).select(
        (F.col("id") % 10).alias("k"), F.col("id").alias("fv"))
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(10)],
                                "k long, dv string")
    out = enrich(fact, dim, "k", broadcast_dim=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan, plan
    assert "SortMergeJoin" in plan, plan
    assert out.count() == 1000


def test_bloom_probe_no_false_negatives_and_total(spark):
    """Every build-side member must pass the filter (the bloom
    invariant), every probe row must get a flag (operator totality),
    and non-members must mostly fail at this load factor."""
    from flink_precisely_demo_spark.operators.bloom import (
        bloom_positions,
        bloom_probe,
    )

    members = spark.range(0, 50).withColumnRenamed("id", "k")
    probe = spark.range(0, 2000).withColumnRenamed("id", "k")
    pos = bloom_positions(members, "k", m=512, k=3)
    flagged = bloom_probe(probe, "k", pos, m=512, k=3)
    rows = {r["k"]: r["bloom_pass"] for r in flagged.collect()}
    assert len(rows) == 2000                      # total
    assert all(rows[k] for k in range(50))        # no false negatives
    fp = sum(1 for k in range(50, 2000) if rows[k])
    assert fp / 1950 < 0.30  # 150/512 load, k=3: far below this bound
