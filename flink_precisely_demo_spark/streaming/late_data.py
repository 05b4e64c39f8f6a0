"""Late-data side output — the Flink ``sideOutputLateData`` twin.

Spark's watermark silently DROPS rows that arrive later than the
allowed lateness (L1); Flink can divert them to a side output for
auditing/backfill. Structured Streaming has no side outputs, but the
pattern is expressible with ``foreachBatch``: maintain the
event-time high watermark as tiny driver state (a JSON file next to
the checkpoint — rewritten atomically per batch, exactly like the
engine's own watermark commit log), split each micro-batch on
``ts < high_watermark - delay``, and route the two halves to
different sinks.

Semantics note (same one-batch lag as the engine): the high
watermark used for batch N is the max event time seen through batch
N-1, so a row is "late" relative to data that arrived in EARLIER
batches — identical to how Spark advances its own watermark, and
proven against `withWatermark`'s drop behavior in the tests.

Scale: the split is a narrow filter on each micro-batch; the only
driver state is one timestamp. Late rows are typically a trickle, so
the side sink's small-file pressure is bounded by trigger frequency,
not data volume.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _read_hwm(path: str) -> str | None:
    try:
        with open(path) as f:
            return json.load(f)["high_watermark"]
    except (FileNotFoundError, KeyError, ValueError):
        return None


def _write_hwm(path: str, value: str) -> None:
    tmp = f"{path}.tmp"
    with open(tmp, "w") as f:
        json.dump({"high_watermark": value}, f)
    os.replace(tmp, path)   # atomic on POSIX


def late_data_splitter(ts_col: str, delay: str, main_sink, late_sink,
                       state_dir: str):
    """Returns a ``foreachBatch`` function that routes each batch's
    rows to ``main_sink(df, batch_id)`` or ``late_sink(df, batch_id)``
    by comparing ``ts_col`` against (high watermark − ``delay``).

    ``delay`` is a SQL interval string (e.g. ``'10 minutes'``),
    matching ``withWatermark``'s argument.
    """
    os.makedirs(state_dir, exist_ok=True)
    hwm_path = os.path.join(state_dir, "high_watermark.json")

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        hwm = _read_hwm(hwm_path)
        if hwm is None:
            on_time, late = batch_df, batch_df.limit(0)
        else:
            threshold = F.lit(hwm).cast("timestamp") - F.expr(f"INTERVAL {delay}")
            is_late = F.col(ts_col) < threshold
            on_time, late = batch_df.filter(~is_late), batch_df.filter(is_late)
        main_sink(on_time, batch_id)
        late_sink(late, batch_id)
        new_max = batch_df.agg(F.max(ts_col).alias("m")).collect()[0]["m"]
        if new_max is not None and (hwm is None or str(new_max) > hwm):
            _write_hwm(hwm_path, str(new_max))
    return apply_batch


def run_with_late_capture(events: DataFrame, ts_col: str, delay: str,
                          main_dir: str, late_dir: str, state_dir: str,
                          checkpoint: str):
    """Drain a streaming DataFrame, writing on-time rows to
    ``main_dir`` and late rows to ``late_dir`` (parquet). Returns the
    StreamingQuery."""
    def _sink(path):
        def write(df: DataFrame, batch_id: int) -> None:
            if df.limit(1).count():
                df.write.mode("append").parquet(path)
        return write

    q = (events.writeStream
         .foreachBatch(late_data_splitter(ts_col, delay,
                                          _sink(main_dir), _sink(late_dir),
                                          state_dir))
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q
