"""Multimodal manifest query with a DuckDB oracle.

The driver ships no media table, so the binary-column PLUMBING is
made oracle-checkable by deriving payloads deterministically from
`documents.text` (utf-8 encode -> binary). Spark's md5 over the
binary equals DuckDB's md5 over the varchar (same bytes), so content
addressing, byte accounting, and content-id dedup of a BinaryType
column are all hash-checked — only the codec stubs
(operators/multimodal.py `_decode_*`) remain untestable here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import binary_manifest
from ..sources.parquet import load_table
from .queries import query


@query(
    "multimodal_manifest",
    oracle="""
    SELECT md5(text) AS content_md5,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_copies,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
    FROM documents
    WHERE text IS NOT NULL
    GROUP BY md5(text)
    """,
)
def _multimodal_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-id dedup + storage accounting over a binary payload
    column (synthesized from text; a real pipeline gets the same
    columns from binaryFile ingest)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"))
    m = binary_manifest(media)
    return (m.groupBy("content_md5")
             .agg(F.min("media_id").alias("keep_id"),
                  F.count(F.lit(1)).alias("n_copies"),
                  F.sum("byte_len").alias("total_bytes")))
