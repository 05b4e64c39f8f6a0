"""Deterministic trigger-file staging for streaming replay oracles.

A replay query (streaming_enrichment_replay, streaming_scd2_replay)
drives a stateful streaming operator with `maxFilesPerTrigger=1` over
a directory of parquet files whose mtimes pin the trigger order, so
the micro-batch sequence is reproducible and a batch SQL oracle can
model the exact (batch, within-batch order) application sequence.

This helper writes one parquet file per batch value of ``batch_col``
(0..n_batches-1), named ``b{k}.parquet`` with ascending mtimes.
Empty batches still get a (zero-row) file so the trigger count is
stable across scale factors.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame


def staged_feed_rows(feed_dir: str) -> int:
    """Total row count of a staged feed directory, read from the
    parquet footers (metadata only — no Spark job, microseconds)."""
    import pyarrow.parquet as pq

    total = 0
    for name in os.listdir(feed_dir):
        if name.endswith(".parquet"):
            total += pq.ParquetFile(
                os.path.join(feed_dir, name)).metadata.num_rows
    return total


def adaptive_state_partitions(spark, rows: int,
                              rows_per_partition: int,
                              floor: int = 8) -> int:
    """Scale-adaptive state-store partition count for a replay.

    Two costs pull in opposite directions: every partition pays a
    state-store open/commit PER TRIGGER (so tiny replays want few
    partitions — the measured house note behind the old constant 8),
    while per-row/per-group work inside the stateful operator wants
    the full core count once volume is real (measured: the scd2
    replay's per-key Python calls halve in wall-clock from 8 -> 32
    partitions at sf0.1). Deriving the count from the STAGED feed's
    row count keeps both regimes right at every scale factor and
    every ``SPARK_GRAFT_CPUS`` — a production deployment would size
    this to its own per-trigger volume the same way.
    """
    cap = max(floor, spark.sparkContext.defaultParallelism)
    return max(floor, min(cap, rows // max(1, rows_per_partition)))


def stage_trigger_files(df: DataFrame, work: str, batch_col: Column,
                        name: str, n_batches: int = 2) -> str:
    """Write ``df`` into ``n_batches`` single-file parquet batches
    under ``work/name`` ordered by ``batch_col`` (values 0..n-1);
    returns the directory to ``readStream.parquet(...)`` with
    ``maxFilesPerTrigger=1``."""
    staged = os.path.join(work, name + "_staged")
    d = os.path.join(work, name)
    os.makedirs(d)
    (df.withColumn("half", batch_col)
       .repartition("half")
       .write.partitionBy("half").parquet(staged))
    for kk in range(n_batches):
        part = os.path.join(staged, f"half={kk}")
        srcs = ([f for f in os.listdir(part)
                 if f.endswith(".parquet")]
                if os.path.isdir(part) else [])
        dst = os.path.join(d, f"b{kk}.parquet")
        if srcs:
            assert len(srcs) == 1, srcs
            os.rename(os.path.join(part, srcs[0]), dst)
        else:
            (df.limit(0).drop("half") if "half" in df.columns
             else df.limit(0)) \
                .coalesce(1).write.parquet(dst + ".tmp")
            src = next(f for f in os.listdir(dst + ".tmp")
                       if f.endswith(".parquet"))
            os.rename(os.path.join(dst + ".tmp", src), dst)
        os.utime(dst, (1_000_000_000 + 10 * kk,) * 2)
    return d


def stage_trigger_text_files(df: DataFrame, work: str, batch_col: Column,
                             name: str, n_batches: int = 2) -> str:
    """Text-source twin of :func:`stage_trigger_files` for JSON-lines
    feeds: ``df`` must carry a string ``value`` column; each batch
    value of ``batch_col`` (0..n-1) becomes ONE mtime-pinned text
    file for ``readStream.format('text')`` + ``maxFilesPerTrigger=1``."""
    staged = os.path.join(work, name + "_staged")
    d = os.path.join(work, name)
    os.makedirs(d)
    (df.withColumn("half", batch_col)
       .select("value", "half")
       .repartition("half")
       .write.partitionBy("half").text(staged))
    for kk in range(n_batches):
        part = os.path.join(staged, f"half={kk}")
        srcs = ([f for f in os.listdir(part) if f.startswith("part-")]
                if os.path.isdir(part) else [])
        dst = os.path.join(d, f"b{kk}.jsonl")
        if srcs:
            assert len(srcs) == 1, srcs
            os.rename(os.path.join(part, srcs[0]), dst)
        else:
            with open(dst, "w"):
                pass                      # empty trigger file
        os.utime(dst, (1_000_000_000 + 10 * kk,) * 2)
    return d
