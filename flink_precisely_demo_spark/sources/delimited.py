"""Delimited-text (CSV / TSV / pipe) source + sink.

Flat delimited files remain the most common interchange format for
tabular ingest feeds (exports from OLTP systems, vendor drops,
TPC-H's own ``|``-delimited tbl files). The reference's ingest path
(SURVEY.md §2.1 S1/S2) consumes JSON envelopes; this module is the
extension-scope equivalent for delimited feeds, with the same scale
rules the JSONL source (sources/jsonl.py) bakes in:

- **Explicit schema, never inference.** ``inferSchema`` is a full
  extra pass over the data; at 100 TB that doubles the scan. Callers
  pass the DDL they expect and Spark parses straight into it.
- **PERMISSIVE + corrupt-record capture by default.** One malformed
  line (wrong field count, unparseable number/date) must not abort a
  1000-executor ingest. Bad lines keep whatever fields did parse,
  land the raw line in ``_corrupt``, and flow to quarantine — the
  same per-row poison contract as the JSONL source and the media
  decoders (operators/multimodal.py). ``DROPMALFORMED`` and
  ``FAILFAST`` are exposed for callers who want silence or a hard
  stop instead.
- **Line-splittable.** ``multiLine`` is pinned ``false`` so each
  executor scans its own byte range independently. The cost is that
  quoted embedded newlines are NOT supported — a record with a
  newline inside a quoted field parses as two malformed lines. That
  is the right trade at scale: ``multiLine=true`` makes every file a
  single-split parse. Feeds with embedded newlines belong in JSONL.

``write_delimited`` is the matching sink. Spark's CSV writer quotes
fields containing the separator/quote automatically; with
numeric/date/code columns (no free text) the byte stream is
deterministic given a deterministic row set.

Two CSV-parser caveats callers must know (empirically pinned in
tests/test_delimited.py, both are documented Spark behavior):

- **Malformation is only detected for fields the query reads.** The
  univocity parser runs under column pruning, so a count()-only scan
  parses zero fields and counts raw lines — DROPMALFORMED drops
  nothing and FAILFAST raises nothing until a real column is
  projected. Audits must project the columns they are auditing.
- **A query may not reference ONLY the corrupt column**
  (``UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN``) —
  quarantine rollups must aggregate it alongside at least one data
  column (plans/crawl_queries.py `csv_ingest_policy` does exactly
  that in a single pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CORRUPT_COL = "_corrupt"

_MODES = ("PERMISSIVE", "DROPMALFORMED", "FAILFAST")


def read_delimited(spark: SparkSession, path: str, schema_ddl: str, *,
                   sep: str = ",", header: bool = False,
                   mode: str = "PERMISSIVE") -> DataFrame:
    """Read delimited files under an explicit schema.

    In ``PERMISSIVE`` mode (default) malformed records survive as
    rows with the raw line preserved in the ``_corrupt`` column and
    unparseable fields NULL; in ``DROPMALFORMED`` they are silently
    skipped (no ``_corrupt`` column is added); ``FAILFAST`` raises on
    the first bad record.
    """
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {_MODES}, got {mode!r}")
    reader = (spark.read
              .option("mode", mode)
              .option("sep", sep)
              .option("header", str(header).lower())
              # byte-range splittability beats quoted-newline support
              # at scale; see module docstring
              .option("multiLine", "false")
              .option("enforceSchema", "true"))
    if mode == "PERMISSIVE":
        reader = (reader
                  .schema(f"{schema_ddl}, {CORRUPT_COL} string")
                  .option("columnNameOfCorruptRecord", CORRUPT_COL))
    else:
        reader = reader.schema(schema_ddl)
    return reader.csv(path)


def write_delimited(df: DataFrame, path: str, *,
                    sep: str = ",", header: bool = False) -> None:
    """Write rows as delimited text, one file per partition."""
    (df.write.mode("overwrite")
       .option("sep", sep)
       .option("header", str(header).lower())
       .csv(path))
