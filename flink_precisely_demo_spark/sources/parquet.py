"""Parquet table source for the driver test data.

Columnar scan with predicate pushdown and column pruning — the
batch-mode analogue of the reference's schema-driven Kafka JSON
source (S1, reference StreamingJob.java:190-203). At 100 TB the same
call reads a partitioned parquet lake; Catalyst handles partition
pruning and pushes filters/projections into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import TEST_TABLES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table.

    The ``events`` table stores TIMESTAMP(NANOS) — a parquet logical
    type Spark refuses by default. We read nanos as long (runtime SQL
    conf) and rebuild a microsecond TimestampNTZ column; the driver
    data is microsecond-aligned so the conversion is lossless and
    matches DuckDB's nanos->micros read of the same file.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # integer division: truncate ns->us exactly like DuckDB's
        # parquet nanos read (double division would round half-up)
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"))
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TEST_TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TEST_TABLES) -> None:
    """Expose each table to spark.sql() — mirrors the reference's
    createTemporaryView duality (M1, reference StreamingJob.java:128)."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
