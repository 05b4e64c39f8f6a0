"""Longevity curve for the streaming sessionizer: per-trigger cost
and state size over a long watermark-advancing run.

Drives `sessionize_stream` over N single-file triggers, each carrying
one fresh 30-minute burst per user with event time advancing 2 hours
per batch — so the watermark finalizes and EVICTS every session one
batch after it closes. The evidence sought: per-trigger wall time and
`stateOnCurrentVersionSizeBytes` stay flat as the stream ages,
because live state is bounded by one watermark horizon of sessions,
not by history (streaming/sessionize.py docstring).

Run:  python scripts/sessionize_longevity.py [n_batches] [n_users]
Prints one JSON line; per-trigger detail to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    n_users = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    from pyspark.sql import functions as F

    from flink_precisely_demo_spark.session import get_spark
    from flink_precisely_demo_spark.streaming.sessionize import (
        sessionize_stream,
    )

    spark = get_spark("sessionize-longevity", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="sess_longevity_")
    feed = os.path.join(work, "feed")
    os.makedirs(feed)
    base_us = 1_700_000_000_000_000
    hour_us = 3_600_000_000

    def write_batch(k: int) -> None:
        # per user: a 3-event burst inside 30 min, 2h after the last
        rows = [(u, (base_us + k * 2 * hour_us + j * 600_000_000)
                 // 1_000_000)
                for u in range(n_users) for j in range(3)]
        df = (spark.createDataFrame(rows, "user_id long, epoch long")
              .select("user_id",
                      F.col("epoch").cast("timestamp").alias("ts")))
        part = os.path.join(work, f"part{k}")
        df.coalesce(1).write.parquet(part)
        src = next(f for f in os.listdir(part) if f.endswith(".parquet"))
        os.rename(os.path.join(part, src),
                  os.path.join(feed, f"b{k:04d}.parquet"))
        os.utime(os.path.join(feed, f"b{k:04d}.parquet"),
                 (1_000_000_000 + 10 * k,) * 2)

    for k in range(n_batches):
        write_batch(k)

    stream = (spark.readStream.schema("user_id long, ts timestamp")
              .option("maxFilesPerTrigger", 1).parquet(feed)
              .withWatermark("ts", "10 minutes"))
    q = (sessionize_stream(stream).writeStream.outputMode("update")
         .format("noop")
         .option("checkpointLocation", os.path.join(work, "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(600)

    prog = [json.loads(p.json) for p in q.recentProgress]
    rows = []
    for p in prog:
        if not p.get("stateOperators"):
            continue
        so = p["stateOperators"][0]
        rows.append({
            "batch": p["batchId"],
            "trigger_ms": p["durationMs"].get("triggerExecution"),
            "n_state_keys": so.get("numRowsTotal"),
            "state_bytes": so.get("memoryUsedBytes"),
        })
        print(f"# {rows[-1]}", file=sys.stderr, flush=True)

    half = len(rows) // 2
    mean = lambda xs: sum(xs) / max(len(xs), 1)  # noqa: E731
    bts = [r["state_bytes"] for r in rows if r["state_bytes"]]
    print(json.dumps({
        "n_batches": len(rows),
        "n_users": n_users,
        "mean_trigger_ms_first_half": round(mean(
            [r["trigger_ms"] for r in rows[:half]]), 1),
        "mean_trigger_ms_second_half": round(mean(
            [r["trigger_ms"] for r in rows[half:]]), 1),
        "max_state_keys": max(r["n_state_keys"] for r in rows),
        "max_state_bytes": max(bts) if bts else None,
    }))


if __name__ == "__main__":
    main()
