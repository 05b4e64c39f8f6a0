"""CDC materialization query: a deterministic I/U/D change stream
synthesized from `orders`, applied to produce current state.

The oracle is ground truth derived directly from the generation rule
(not a re-implementation of the operator) — the strongest form of
differential check:

    every order gets an INSERT at t0;
    keys % 5 == 0 get an UPDATE at t0+1d (TotalDue += 1000);
    keys % 10 == 0 get a DELETE at t0+2d
    => expected state: keys %10==0 absent, %5==0 updated, rest original.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.datetime_fns import format_ts
from ..operators.cdc_apply import apply_cdc_snapshot
from ..sources.parquet import load_table
from .queries import query


def _envelope_rows(orders: DataFrame, manip: str, day_shift: int,
                   total_adj: float) -> DataFrame:
    ts = format_ts(F.col("o_orderdate") + F.expr(f"INTERVAL {day_shift} DAY"), 6)
    # bigint, not the reference envelope's INT: the key derives from
    # o_orderkey, which exceeds int32 beyond ~sf5 (caught by the sf10
    # run — ANSI mode aborts on the overflow). INT-schema parity for
    # the real envelope is pinned by cdc_envelope_decode/schemas.py.
    payload = F.struct(
        F.col("o_orderkey").cast("bigint").alias("SalesOrderId"),
        (F.col("o_totalprice") + total_adj).alias("TotalDue"),
        F.lit(5).alias("Status"))
    return orders.select(
        F.lit(manip).alias("sv_manip_type"),
        F.col("o_orderkey").alias("sv_trans_id"),
        F.lit(1).alias("sv_trans_row_seq"),
        ts.alias("sv_op_timestamp"),
        payload.alias("after_image"))


@query(
    "cdc_apply_snapshot",
    oracle="""
    SELECT CAST(o_orderkey AS BIGINT) AS SalesOrderId,
           CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1000.0
                ELSE o_totalprice END AS TotalDue,
           5 AS Status
    FROM orders
    WHERE o_orderkey % 10 != 0
    """,
)
def _cdc_apply_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    inserts = _envelope_rows(orders, "I", 0, 0.0)
    updates = _envelope_rows(
        orders.filter(F.col("o_orderkey") % 5 == 0), "U", 1, 1000.0)
    deletes = _envelope_rows(
        orders.filter(F.col("o_orderkey") % 10 == 0), "D", 2, 0.0)
    changes = inserts.unionByName(updates).unionByName(deletes)
    return apply_cdc_snapshot(changes, "SalesOrderId")


@query(
    "cdc_state_asof",
    oracle="""
    SELECT CAST(o_orderkey AS BIGINT) AS SalesOrderId,
           CASE WHEN o_orderkey % 5 = 0
                 AND o_orderdate + INTERVAL 1 DAY <= TIMESTAMP '1998-06-15'
                THEN o_totalprice + 1000.0
                ELSE o_totalprice END AS TotalDue,
           5 AS Status
    FROM orders
    WHERE o_orderdate <= TIMESTAMP '1998-06-15'
      AND NOT (o_orderkey % 10 = 0
               AND o_orderdate + INTERVAL 2 DAY <= TIMESTAMP '1998-06-15')
    """,
)
def _cdc_state_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel over the change log: the table state AS OF a global
    cutoff T — filter the envelope stream to ops with op_timestamp <=
    T, then the same latest-per-key materialization. The oracle is
    ground truth from the generation rule again: at T, orders not yet
    inserted are absent, deletes whose day+2 passed are gone, updates
    whose day+1 passed are applied. At 100 TB this is one
    predicate-pushdown filter cheaper than the full snapshot."""
    from ..functions.datetime_fns import parse_ts

    orders = load_table(spark, sf_dir, "orders")
    inserts = _envelope_rows(orders, "I", 0, 0.0)
    updates = _envelope_rows(
        orders.filter(F.col("o_orderkey") % 5 == 0), "U", 1, 1000.0)
    deletes = _envelope_rows(
        orders.filter(F.col("o_orderkey") % 10 == 0), "D", 2, 0.0)
    changes = inserts.unionByName(updates).unionByName(deletes)
    cutoff = F.lit("1998-06-15 00:00:00").cast("timestamp_ntz")
    asof = changes.filter(
        parse_ts("sv_op_timestamp").cast("timestamp_ntz") <= cutoff)
    return apply_cdc_snapshot(asof, "SalesOrderId")


@query(
    "cdc_history_scd2",
    oracle="""
    WITH ch AS (
      SELECT o_orderkey AS k, o_orderdate AS ts, 'I' AS m,
             o_totalprice AS v
      FROM orders
      UNION ALL
      SELECT o_orderkey, o_orderdate + INTERVAL 1 DAY, 'U',
             o_totalprice + 1000.0
      FROM orders WHERE o_orderkey % 5 = 0
      UNION ALL
      SELECT o_orderkey, o_orderdate + INTERVAL 2 DAY, 'D', NULL
      FROM orders WHERE o_orderkey % 10 = 0
    ),
    v AS (
      SELECT k, ts, m, v,
             lead(ts) OVER (PARTITION BY k ORDER BY ts) AS valid_to
      FROM ch
    )
    SELECT CAST(k AS BIGINT) AS SalesOrderId,
           v AS TotalDue,
           ts AS valid_from,
           valid_to,
           (valid_to IS NULL) AS is_current
    FROM v WHERE m != 'D'
    """,
)
def _cdc_history_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension history from the change stream: every I/U
    becomes a VERSION row with a [valid_from, valid_to) interval
    (valid_to = the next change's timestamp, NULL while current);
    a D closes the prior version's interval and emits nothing — so a
    deleted key has no current row, and time-travel is a BETWEEN
    predicate instead of a log replay. One key-partitioned window
    (lead over the per-key change sequence), the same shuffle shape
    as cdc_apply_snapshot — scale-safe at 100 TB because state never
    leaves the key partition. The oracle derives the expected
    history straight from the generation rule, not from a
    re-implementation. Version ordering is by op timestamp alone —
    exact for this feed (the generation rule gives each key distinct
    timestamps); a production stream with same-instant changes would
    extend the window ordering with (sv_trans_id,
    sv_trans_row_seq), the reference's own total-order rule."""
    from ..functions.datetime_fns import parse_ts
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    inserts = _envelope_rows(orders, "I", 0, 0.0)
    updates = _envelope_rows(
        orders.filter(F.col("o_orderkey") % 5 == 0), "U", 1, 1000.0)
    deletes = _envelope_rows(
        orders.filter(F.col("o_orderkey") % 10 == 0), "D", 2, 0.0)
    changes = inserts.unionByName(updates).unionByName(deletes)

    flat = changes.select(
        F.col("after_image.SalesOrderId").alias("SalesOrderId"),
        F.col("sv_manip_type").alias("m"),
        parse_ts("sv_op_timestamp").cast("timestamp_ntz").alias("ts"),
        F.col("after_image.TotalDue").alias("TotalDue"))
    w = Window.partitionBy("SalesOrderId").orderBy("ts")
    versioned = flat.withColumn("valid_to", F.lead("ts").over(w))
    return versioned.filter(F.col("m") != "D").select(
        "SalesOrderId",
        "TotalDue",
        F.col("ts").alias("valid_from"),
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"))


@query(
    "streaming_scd2_replay",
    oracle="""
    WITH ch AS (
      SELECT o_orderkey % 9973 AS key, o_orderkey AS trans_id,
             CAST(o_orderdate AS TIMESTAMP) AS ts,
             'I' AS m, CAST(o_totalprice AS DOUBLE) AS value
      FROM orders
      UNION ALL
      SELECT o_orderkey % 9973, o_orderkey,
             CAST(o_orderdate + INTERVAL 1 DAY AS TIMESTAMP),
             'U', CAST(o_totalprice AS DOUBLE) + 1000.0
      FROM orders WHERE o_orderkey % 5 = 0
      UNION ALL
      SELECT o_orderkey % 9973, o_orderkey,
             CAST(o_orderdate + INTERVAL 2 DAY AS TIMESTAMP),
             'D', NULL
      FROM orders WHERE o_orderkey % 10 = 0
    ),
    -- the incremental maintainer closes the key's open version at
    -- EVERY later change's ts (U overwrites, D closes without
    -- opening), so the closed-version set is exactly: non-D changes
    -- that have a successor, valid_to = that successor's ts; the
    -- application order per key is (ts, trans_id, row_seq) — the
    -- reference envelope's total-order rule — mirrored here with
    -- the SAME row_seq encoding (I=0, U=1, D=2; raw `m` would sort
    -- D first, the opposite order — harmless only while
    -- (ts, trans_id) stays unique per key, r11 advisory)
    v AS (
      SELECT key, ts, m, value,
             LEAD(ts) OVER (
               PARTITION BY key
               ORDER BY ts, trans_id,
                        CASE m WHEN 'I' THEN 0
                               WHEN 'U' THEN 1 ELSE 2 END) AS valid_to
      FROM ch
    )
    SELECT key, value, ts AS valid_from, valid_to
    FROM v WHERE m <> 'D' AND valid_to IS NOT NULL
    """,
)
def _streaming_scd2_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INCREMENTAL SCD2 maintainer (streaming/scd2.py, the
    applyInPandasWithState operator that holds one open version per
    key) driven end to end through Structured Streaming and
    ORACLE-CHECKED — the replay-oracle pattern proved on
    streaming_enrichment_replay, applied to the last stateful
    streaming operator whose semantics rested on pytest alone. The
    same I/U/D generation rule as the batch ``cdc_history_scd2``
    (insert at t0, update at t0+1d for orders %5, delete at t0+2d
    for orders %10), with the state key folded to o_orderkey % 9973
    so several orders' version chains interleave per key, is
    split into 2 trigger files at a global event-time cutoff — a ts
    cutoff preserves per-key log order across triggers, the
    operator's ordering contract — and the emitted stream of CLOSED
    versions is full-hash-compared against a LEAD() window over the
    generation rule. A regression in any state transition
    (open-version overwrite, delete-closes-without-opening,
    cross-trigger state carry) breaks the hash.

    Scale shape: each trigger shuffles only that batch's changes,
    once, on the key; state is one open version per key — the
    minimum any SCD2 maintainer can hold (reference parity:
    EnrichmentJoin.java's ValueState footprint, here for
    version intervals)."""
    import os
    import shutil
    import tempfile

    from ..streaming.pipeline import replay_to_parquet
    from ..streaming.replay_stage import stage_trigger_files
    from ..streaming.scd2 import scd2_stream

    orders = load_table(spark, sf_dir, "orders")
    # the state key folds to a bounded modulus so several orders'
    # version chains INTERLEAVE on one key (richer transitions than
    # one-chain-per-key: a key's open version is overwritten and
    # closed by changes carrying different trans_ids) and so the
    # replay's per-key pandas-group count stays bounded at every SF —
    # applyInPandasWithState pays a Python call per key per trigger,
    # an honest cost of the Python-state port that a replay harness
    # bounds by key design (production sizes state partitions and
    # key domains to its own volume; the operator itself is
    # cardinality-agnostic)
    base = orders.select(
        (F.col("o_orderkey") % 9973).alias("key"),
        F.col("o_orderkey").alias("trans_id"),
        F.col("o_orderdate").cast("timestamp").alias("ts"),
        F.col("o_totalprice").cast("double").alias("value"))
    ins = (base.withColumn("m", F.lit("I"))
           .withColumn("row_seq", F.lit(0)))
    upd = (base.filter(F.col("trans_id") % 5 == 0)
           .withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 DAY"))
           .withColumn("value", F.col("value") + 1000.0)
           .withColumn("m", F.lit("U"))
           .withColumn("row_seq", F.lit(1)))
    dele = (base.filter(F.col("trans_id") % 10 == 0)
            .withColumn("ts", F.col("ts") + F.expr("INTERVAL 2 DAY"))
            .withColumn("value", F.lit(None).cast("double"))
            .withColumn("m", F.lit("D"))
            .withColumn("row_seq", F.lit(2)))
    changes = ins.unionByName(upd).unionByName(dele)

    work = tempfile.mkdtemp(prefix="stream_scd2_replay_")
    # the try starts immediately after mkdtemp so a STAGING failure
    # (disk full, bad sf_dir) also reclaims the tree (r11 advisory)
    try:
        cutoff = F.lit("1995-06-17").cast("timestamp")
        feed_dir = stage_trigger_files(
            changes, work,
            F.when(F.col("ts") < cutoff, 0).otherwise(1), "changes")

        schema = ("key long, ts timestamp, value double, m string, "
                  "row_seq int, trans_id long")
        feed = (spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1).parquet(feed_dir))

        # replay micro-batches are small by construction: size the
        # state store to them, not to core count (the attribution-
        # replay house note — per-batch cost is state-store
        # open/commit PER PARTITION); conf restored after, batch
        # plans built later are unaffected
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "8")
            closed = replay_to_parquet(
                scd2_stream(feed), spark, "scd2_replay",
                checkpoint=os.path.join(work, "ckpt"))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return closed.select(
        "key", "value",
        F.col("valid_from").cast("timestamp_ntz"),
        F.col("valid_to").cast("timestamp_ntz"))
