"""Streaming CDC upsert sink: incremental foreachBatch materialization
must converge to exactly the batch snapshot, survive out-of-order
history across batches (tombstones), and replay idempotently."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_precisely_demo_spark.operators.cdc_apply import apply_cdc_snapshot
from flink_precisely_demo_spark.plans.cdc_queries import _envelope_rows
from flink_precisely_demo_spark.sources.cdc_json import decode_envelope
from flink_precisely_demo_spark.sources.parquet import load_table
from flink_precisely_demo_spark.streaming.cdc_upsert import (
    _versions,
    cdc_current_state,
    cdc_upsert_sink,
    run_cdc_upsert,
)

SF = "/root/testdata/sf0.001"

PAYLOAD = T.StructType([
    T.StructField("SalesOrderId", T.IntegerType()),
    T.StructField("TotalDue", T.DoubleType()),
    T.StructField("Status", T.IntegerType()),
])


def _change_waves(spark):
    orders = load_table(spark, SF, "orders").filter(F.col("o_orderkey") < 100)
    ins = _envelope_rows(orders, "I", 0, 0.0)
    upd = _envelope_rows(orders.filter(F.col("o_orderkey") % 5 == 0), "U", 1, 1000.0)
    dele = _envelope_rows(orders.filter(F.col("o_orderkey") % 10 == 0), "D", 2, 0.0)
    # out-of-order history: an old (day-1) image of DELETED keys that
    # arrives AFTER the delete — must not resurrect them
    late = _envelope_rows(orders.filter(F.col("o_orderkey") % 10 == 0), "I", 1, 77.0)
    return [ins, upd, dele, late]


def _state_rows(spark, store):
    return sorted(
        (r["SalesOrderId"], r["TotalDue"], r["Status"])
        for r in cdc_current_state(spark, store).collect())


def test_streaming_upsert_converges_to_batch_snapshot(spark, tmp_path):
    waves = _change_waves(spark)
    env_dir, store, ckpt = (str(tmp_path / d) for d in ("env", "store", "ckpt"))

    for i, wave in enumerate(waves):
        wave.select(F.to_json(F.struct(*wave.columns)).alias("value")) \
            .coalesce(1).write.mode("append").text(env_dir)
        stream = decode_envelope(
            spark.readStream.format("text").load(env_dir), PAYLOAD)
        run_cdc_upsert(stream, store, "SalesOrderId", checkpoint=ckpt)

    # each drain ran at least one micro-batch -> multiple store versions
    assert len(_versions(store)) >= 2

    all_changes = waves[0]
    for w in waves[1:]:
        all_changes = all_changes.unionByName(w)
    expected = sorted(
        (r["SalesOrderId"], r["TotalDue"], r["Status"])
        for r in apply_cdc_snapshot(all_changes, "SalesOrderId").collect())
    got = _state_rows(spark, store)
    assert got == expected
    # the deleted keys are really gone despite the late old image
    deleted = {k for (k, _, _) in expected if k % 10 == 0}
    assert deleted == set()
    assert all(k % 10 != 0 for (k, _, _) in got)


def test_upsert_replay_is_idempotent(spark, tmp_path):
    waves = _change_waves(spark)
    store = str(tmp_path / "store")
    sink = cdc_upsert_sink(store, "SalesOrderId")
    sink(waves[0], 0)
    sink(waves[1], 1)
    before = _state_rows(spark, store)
    # crash-replay of batch 1: same input, same batch id -> same state
    sink(waves[1], 1)
    assert _state_rows(spark, store) == before
    # and a duplicate DELIVERY of old data in a NEW batch is also a
    # no-op on the state (latest-wins merge absorbs it)
    sink(waves[0], 2)
    assert _state_rows(spark, store) == before


def test_vacuum_keeps_replay_safe(spark, tmp_path):
    from flink_precisely_demo_spark.streaming.cdc_upsert import vacuum_store

    waves = _change_waves(spark)
    store = str(tmp_path / "store")
    sink = cdc_upsert_sink(store, "SalesOrderId")
    for i, w in enumerate(waves):
        sink(w, i)
    assert _versions(store) == [0, 1, 2, 3]
    state = _state_rows(spark, store)

    removed = vacuum_store(store, keep=2)
    assert removed == [0, 1]
    assert _versions(store) == [2, 3]
    # current state unchanged, and replaying the newest batch still works
    assert _state_rows(spark, store) == state
    sink(waves[3], 3)
    assert _state_rows(spark, store) == state


def test_fresh_checkpoint_against_live_store_fails_fast(spark, tmp_path):
    """A deleted/replaced checkpoint restarts batch ids at 0; merging
    those into a store with newer live versions would silently ignore
    all prior state while readers keep serving the stale max version.
    The sink must refuse instead of diverging."""
    import pytest

    waves = _change_waves(spark)
    store = str(tmp_path / "store")
    sink = cdc_upsert_sink(store, "SalesOrderId")
    sink(waves[0], 0)
    sink(waves[1], 5)
    with pytest.raises(RuntimeError, match="checkpoint"):
        sink(waves[2], 1)  # restarted ids: 1 < live version 5
    # same-version retry is still allowed (idempotent overwrite)
    sink(waves[1], 5)
