"""Source/sink breadth: format roundtrips, partitioned writes with
partition pruning, corrupt-input tolerance in the CDC decoder.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_precisely_demo_spark.schemas import ORDERS_PAYLOAD
from flink_precisely_demo_spark.sources.cdc_json import (
    decode_envelope,
    synthesize_orders_envelope,
)
from flink_precisely_demo_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_format_roundtrips(spark, tmp_path):
    ev = load_table(spark, SF, "events").select(
        "event_id", "user_id", "event_type", "value")
    n = ev.count()
    for fmt in ("parquet", "json", "csv", "orc"):
        path = str(tmp_path / fmt)
        w = ev.write.mode("overwrite")
        if fmt == "csv":
            w = w.option("header", "true")
        w.format(fmt).save(path)
        r = spark.read.format(fmt)
        if fmt == "csv":
            r = r.option("header", "true").schema(
                "event_id long, user_id long, event_type string, value double")
        elif fmt == "json":
            r = r.schema("event_id long, user_id long, event_type string, value double")
        back = r.load(path)
        assert back.count() == n, fmt
        total_a = ev.agg(F.sum("event_id")).first()[0]
        total_b = back.agg(F.sum("event_id")).first()[0]
        assert total_a == total_b, fmt


def test_partitioned_write_prunes(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    out = str(tmp_path / "by_type")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)
    back = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = _physical(back)
    # partition filter reaches the scan; only the click directory is read
    assert "PartitionFilters: [isnotnull(event_type" in plan
    clicks = ev.filter(F.col("event_type") == "click").count()
    assert back.count() == clicks


def test_decode_envelope_tolerates_corrupt_lines(spark):
    good = synthesize_orders_envelope(
        load_table(spark, SF, "orders").limit(3))
    corrupt = spark.createDataFrame(
        [("{not json",), ("",), ('{"sv_manip_type": "I"}',)], ["value"])
    env = decode_envelope(good.unionByName(corrupt), ORDERS_PAYLOAD)
    rows = env.collect()
    assert len(rows) == 6  # corrupt lines become null-field rows, not crashes
    ok = [r for r in rows if r["after_image"] is not None]
    assert len(ok) == 3
    partial = [r for r in rows if r["sv_manip_type"] == "I"
               and r["after_image"] is None]
    assert len(partial) == 1  # schema-valid but payload-less record survives


def test_compacted_write_controls_file_count(spark, tmp_path):
    """Small-file control: coalesce on write — the lakehouse hygiene
    knob for 100 TB outputs (many tiny files kill the next scan)."""
    ev = load_table(spark, SF, "events").repartition(16)
    out = str(tmp_path / "compact")
    ev.coalesce(2).write.mode("overwrite").parquet(out)
    import glob
    files = glob.glob(f"{out}/part-*.parquet")
    assert len(files) == 2