"""Measure the streaming near-dup dedup per-batch cost curve over a
long run — the evidence that snapshot compaction keeps per-batch work
flat as the stream ages (BASELINE.md longevity note).

Drives near_dup_dedup_sink for N micro-batches of B documents each
(drawn from the sf0.01 documents table, re-keyed per batch so every
batch contributes survivors), recording wall time per sink call. With
compaction every 16 batches the bucket-store read width is bounded at
<= 17 versions, so the per-batch cost should flatten rather than grow
linearly with stream age.

Run:  python scripts/streaming_longevity.py [n_batches] [batch_size]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    from pyspark.sql import functions as F

    from flink_precisely_demo_spark.session import get_spark
    from flink_precisely_demo_spark.streaming.streaming_dedup import (
        near_dup_dedup_sink,
    )

    spark = get_spark("streaming-longevity", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    docs = (spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
            .select("doc_id", "text").limit(batch_size).collect())
    work = tempfile.mkdtemp(prefix="longevity_")
    sink = near_dup_dedup_sink(f"{work}/store", f"{work}/out",
                               compact_every=16)

    times = []
    for i in range(n_batches):
        # re-key so each batch is "new" documents with the same text
        # distribution: near-dups of earlier batches get suppressed,
        # novel docs survive — a steady-state mix
        batch = spark.createDataFrame(
            [(r["doc_id"] + i * 1_000_000, r["text"]) for r in docs],
            "doc_id long, text string")
        t0 = time.time()
        sink(batch, i)
        times.append(round(time.time() - t0, 3))

    def avg(xs):
        return round(sum(xs) / len(xs), 3)

    print(json.dumps({
        "n_batches": n_batches, "batch_size": batch_size,
        "per_batch_sec": times,
        "avg_first10": avg(times[:10]),
        "avg_mid10": avg(times[20:30]),
        "avg_last10": avg(times[-10:]),
    }))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
