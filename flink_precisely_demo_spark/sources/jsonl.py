"""JSONL corpus source — the de-facto interchange format for
pretraining corpora (one JSON document per line).

Scale rules baked in:

- **Explicit schema, never inference.** Schema inference is a full
  extra pass over the data; at 100 TB that doubles the scan. Callers
  pass the StructType/DDL they expect and Spark prunes to it.
- **PERMISSIVE + corrupt-record capture.** One malformed line must
  not abort a 1000-executor job (the reference's parseTs has the same
  poison-row philosophy; Spark 4 ANSI makes this explicit). Bad lines
  land with all schema fields NULL and the raw line preserved in
  ``_corrupt`` for quarantine/audit — per-row typed errors, the same
  contract as the media decoders (operators/multimodal.py).
- **Line-splittable.** Uncompressed (or zstd-framed) JSONL splits on
  newlines, so each executor scans its byte range independently —
  unlike a monolithic JSON array, which serializes the parse.

`write_jsonl_corpus` is the matching sink: `to_json(struct(...))`
fixes field order deterministically, one file per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt"


def read_jsonl_corpus(spark: SparkSession, path: str,
                      schema_ddl: str) -> DataFrame:
    """Read a JSONL corpus with an explicit schema; malformed lines
    survive as rows with the raw text in the ``_corrupt`` column."""
    full = f"{schema_ddl}, {CORRUPT_COL} string"
    return (spark.read.schema(full)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .json(path))


def write_jsonl_corpus(df: DataFrame, path: str,
                       cols: list[str] | None = None) -> None:
    """Write rows as JSONL; field order is pinned by the struct, so
    the byte stream is deterministic given a deterministic row set."""
    cols = cols or df.columns
    (df.select(F.to_json(F.struct(*cols)).alias("value"))
       .write.mode("overwrite").text(path))
