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


def adaptive_key_groups(spark, rows: int,
                        rows_per_group: int = 2000,
                        cap: int = 65536) -> int:
    """State-GROUP count for a key-grouped applyInPandasWithState
    operator (streaming/scd2.py). The operator pays a Python call +
    Arrow round-trip per state group per trigger, so groups must be
    few when volume is small; per-group batch memory is rows/groups,
    so groups must grow with volume. Floor of 4x parallelism keeps
    every state partition busy with several groups; ~2k rows/group
    bounds a group's in-flight Python list at any scale."""
    floor = 4 * spark.sparkContext.defaultParallelism
    return max(floor, min(cap, rows // max(1, rows_per_group)))


def adaptive_join_state_partitions(spark, rows: int,
                                   rows_quantum: int = 12000,
                                   floor: int = 4) -> int:
    """Partition count for the NATIVE stream-stream join replays.

    The symmetric hash join keeps FOUR state stores per partition
    (KeyToNumValues / KeyWithIndexToValues x two sides), so its
    per-partition per-trigger machinery cost is several times the
    single-store operators' — measured at sf0.1 (~200k rows,
    3 triggers): 4 partitions 4.1 s, 8 -> 4.9 s, 16 -> 7.9 s.
    Modelling wall as triggers*parts*c_store + work/parts gives the
    optimum at parts ~ sqrt(rows/quantum), which is what this
    returns: sqrt scaling reaches the core count only when per-row
    work genuinely amortizes the stores (sf10 here), instead of the
    linear ramp that over-partitions mid-scale replays."""
    import math

    cap = max(floor, spark.sparkContext.defaultParallelism)
    return max(floor, min(cap, math.isqrt(max(rows, 0)
                                          // max(1, rows_quantum))))


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
