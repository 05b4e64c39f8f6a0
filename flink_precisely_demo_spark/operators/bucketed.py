"""Persistent bucketed layout: co-located, shuffle-free fact joins.

A broadcast join needs a small side; when BOTH sides are fact-scale
(orders ⋈ lineitem at 100 TB), every query pays two full shuffles on
the join key — unless the tables are WRITTEN pre-partitioned on that
key. Spark's persistent form of that contract is the bucketed table
(``write.bucketBy(n, key).sortBy(key).saveAsTable``): each side's
files are hash-bucketed into the same ``n`` buckets, the catalog
records the spec, and the planner joins bucket ``i`` to bucket ``i``
directly — a SortMergeJoin with ZERO Exchange under it, on every
query, forever. The shuffle is paid ONCE at layout time and amortized
across the table's whole query life; this is the single biggest
repeated-join lever at 100 TB (Hive/Trino bucketing and Iceberg's
bucket partition transform make the same trade).

The writer repartitions into one task per bucket first so each bucket
lands in exactly ONE file — with >1 file per bucket Spark must
re-sort the merged bucket at read time; with one pre-sorted file the
``sortBy`` order is trusted and the read-side Sort can be elided.

No counterpart in the reference (extension scope, SURVEY.md §2.3);
the mechanism is Spark's own bucketed-table contract
(`spark.sql.sources.bucketing.enabled`, on by default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def ensure_bucketed_table(df: DataFrame, name: str, path: str,
                          n_buckets: int, key: str,
                          sort: bool = True) -> str:
    """Materialize ``df`` as an external bucketed (and per-bucket
    sorted) parquet table at ``path`` unless this session's catalog
    already knows it; returns the table name to ``spark.table()``.

    The catalog entry is per-session (bucketing metadata lives in the
    catalog, not the files), so a fresh session re-registers by
    rewriting — callers scope ``name``/``path`` per process to keep
    concurrent processes off each other's files. The write costs one
    key shuffle (``repartition(n_buckets, key)`` — the same shuffle a
    single un-bucketed join would pay, here paid once)."""
    spark = df.sparkSession
    if spark.catalog.tableExists(name):
        return name
    writer = (df.repartition(n_buckets, F.col(key))
              .write.mode("overwrite").format("parquet")
              .bucketBy(n_buckets, key))
    if sort:
        writer = writer.sortBy(key)
    writer.option("path", path).saveAsTable(name)
    return name


def drop_bucketed_table(spark: SparkSession, name: str) -> None:
    """Drop the catalog entry (files at ``path`` are external and
    reclaimed by the caller that owns them)."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")
