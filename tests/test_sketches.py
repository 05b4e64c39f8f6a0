"""Accuracy-bound tests for the no-oracle queries (sketches are
engine-specific; k-means is iterative): the driver only row-counts
these, so the real assertions live here against exact answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_precisely_demo_spark.operators.kmeans import (
    kmeans_assignments,
    kmeans_fit,
)
from flink_precisely_demo_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_within_5pct(spark):
    ev = load_table(spark, SF, "events")
    rows = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx"),
        F.countDistinct("user_id").alias("exact")).collect()
    for r in rows:
        assert abs(r["approx"] - r["exact"]) <= max(0.05 * r["exact"], 2), r


def test_percentile_approx_brackets_exact_median(spark):
    ev = load_table(spark, SF, "events")
    approx = ev.agg(F.percentile_approx("value", 0.5, 10000)
                    .alias("m")).first()["m"]
    exact = ev.agg(F.expr("percentile(value, 0.5)").alias("m")).first()["m"]
    assert abs(approx - exact) <= 0.05 * max(abs(exact), 1.0)


def test_kmeans_converges_and_is_deterministic(spark):
    emb = load_table(spark, SF, "embeddings")
    c1 = kmeans_fit(emb, k=4, max_iter=3)
    c2 = kmeans_fit(emb, k=4, max_iter=3)
    assert [cid for cid, _ in c1] == [0, 1, 2, 3]
    assert c1 == c2  # deterministic init + tiebreaks => reproducible

    assign = kmeans_assignments(emb, k=4, max_iter=3)
    counts = {r["cell_id"]: r["n"] for r in
              assign.groupBy("cell_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == emb.count()
    assert len(counts) >= 2  # corpus actually spreads across cells


def test_kmeans_improves_fit(spark):
    """More iterations should not worsen mean similarity-to-centroid."""
    emb = load_table(spark, SF, "embeddings")
    m0 = kmeans_assignments(emb, k=4, max_iter=1) \
        .agg(F.avg("sim").alias("m")).first()["m"]
    m3 = kmeans_assignments(emb, k=4, max_iter=4) \
        .agg(F.avg("sim").alias("m")).first()["m"]
    assert m3 >= m0 - 1e-9