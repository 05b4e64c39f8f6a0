"""ORC as a corpus source/sink format.

Parquet is this engine's native interchange, but real lakes carry
ORC-heavy lineages (Hive-era warehouses); Spark reads and writes ORC
natively with the same columnar virtues — column pruning, predicate
pushdown to row-group stats (`PushedFilters` in the scan), split
generation per stripe. These helpers pin the engine's contract for
the format: explicit schema on read (never inference on a 100 TB
lake — schema drift must fail loudly, not silently widen types) and
a schema-preserving writer.

Unlike the text formats (sources/jsonl.py, sources/delimited.py)
there is no per-line corruption lane: ORC is binary-columnar, so a
damaged file fails at the stripe/footer level and is quarantined by
the ingest job's file-level retry, not a row-level poison column.

No reference counterpart (extension scope, SURVEY.md §2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_orc_corpus(df: DataFrame, path: str,
                     columns: list[str] | None = None) -> None:
    """Write the corpus (optionally a column subset) as ORC."""
    if columns is not None:
        df = df.select(*columns)
    df.write.mode("overwrite").orc(path)


def read_orc_corpus(spark: SparkSession, path: str,
                    schema: str) -> DataFrame:
    """Read an ORC corpus under an EXPLICIT schema (positional/name
    binding as Spark's ORC reader defines; missing columns fail
    loudly rather than null-fill silently)."""
    return spark.read.schema(schema).orc(path)
