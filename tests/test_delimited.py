"""Delimited source/sink contract (sources/delimited.py): policy
modes, the two documented CSV-parser caveats, and splittability.

The caveats these tests pin are exactly the ones that bit during
development (the 3-column csv_ingest_policy rollup let the
bad-timestamp poison line through): parser column pruning means
malformation is only detected for projected fields, and a query may
not reference ONLY the corrupt column.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from flink_precisely_demo_spark.sources.delimited import (
    CORRUPT_COL,
    read_delimited,
    write_delimited,
)

DDL = ("k long, amount double, ts timestamp, code string")


@pytest.fixture()
def feed_dir(tmp_path):
    d = tmp_path / "feed"
    d.mkdir()
    (d / "good.csv").write_text(
        "1|10.5|1995-01-01T00:00:00.000Z|A\n"
        "2|20.25|1996-02-02T00:00:00.000Z|B\n")
    (d / "bad.csv").write_text(
        "short|row\n"                                        # 2 of 4 fields
        "3|not-a-number|1995-01-01T00:00:00.000Z|A\n"        # bad double
        "4|30.0|not-a-time|B|extra\n")                       # bad ts + 5 fields
    return str(d)


def test_permissive_quarantines_poison_rows(spark, feed_dir):
    df = read_delimited(spark, feed_dir, DDL, sep="|")
    rows = {r.k: r for r in df.collect()}
    corrupt = [r for r in rows.values() if r[CORRUPT_COL] is not None]
    assert len(corrupt) == 3
    # partial parses are kept, raw line preserved
    assert rows[3].amount is None and rows[3].code == "A"
    assert rows[3][CORRUPT_COL].startswith("3|not-a-number")
    assert rows[4].ts is None
    # valid rows parse losslessly
    assert rows[1][CORRUPT_COL] is None and rows[1].amount == 10.5
    assert rows[2].code == "B"


def test_dropmalformed_and_failfast(spark, feed_dir):
    drop = read_delimited(spark, feed_dir, DDL, sep="|",
                          mode="DROPMALFORMED")
    assert CORRUPT_COL not in drop.columns
    # full projection -> all fields validated -> 3 poison rows dropped
    assert sorted(r.k for r in drop.collect()) == [1, 2]
    ff = read_delimited(spark, feed_dir, DDL, sep="|", mode="FAILFAST")
    with pytest.raises(Exception):
        ff.select("k", "amount", "ts", "code").collect()
    with pytest.raises(ValueError):
        read_delimited(spark, feed_dir, DDL, mode="LENIENT")


def test_caveat_pruned_scan_skips_validation(spark, feed_dir):
    """Documented Spark behavior the module warns about: a scan that
    projects no fields (count-only) parses nothing, so DROPMALFORMED
    drops nothing; a scan projecting only `k` misses the bad-double
    and bad-timestamp rows. Audits must project what they audit —
    if this ever starts validating unprojected fields (a Spark
    behavior change), the caveat docs and csv_ingest_policy's
    full-width aggregate deserve a fresh look."""
    drop = read_delimited(spark, feed_dir, DDL, sep="|",
                          mode="DROPMALFORMED")
    assert drop.count() == 5          # raw line count, nothing validated
    only_k = [r.k for r in drop.select("k").collect()]
    assert sorted(x for x in only_k if x is not None) == [1, 2, 3, 4]


def test_caveat_corrupt_only_projection_rejected(spark, feed_dir):
    df = read_delimited(spark, feed_dir, DDL, sep="|")
    with pytest.raises(AnalysisException):
        df.filter(F.col(CORRUPT_COL).isNotNull()).count()


def test_roundtrip_lossless_and_deterministic(spark, tmp_path):
    src = (spark.range(0, 1000)
           .select(F.col("id").alias("k"),
                   (F.col("id") * 1.37e5 + 0.125).alias("amount"),
                   F.timestamp_seconds(F.col("id") * 3600).alias("ts"),
                   F.concat(F.lit("c"), F.col("id") % 7).alias("code")))
    out = str(tmp_path / "rt")
    write_delimited(src, out, sep="|")
    back = read_delimited(spark, out, DDL, sep="|")
    n_bad = back.select(
        F.sum(F.when(F.col(CORRUPT_COL).isNotNull(), 1).otherwise(0))
         .alias("nb"),
        F.count("k").alias("nk")).collect()[0]
    assert (n_bad.nb or 0) == 0 and n_bad.nk == 1000
    # Double.toString roundtrip is exact, incl. values that print in
    # scientific notation; timestamps roundtrip through the default
    # ISO format
    diff = (src.alias("a").join(back.alias("b"), "k")
            .filter((F.col("a.amount") != F.col("b.amount"))
                    | (F.col("a.ts") != F.col("b.ts"))
                    | (F.col("a.code") != F.col("b.code"))))
    assert diff.count() == 0
    assert back.select("k").distinct().count() == 1000


def test_ingest_policy_plan_shape(spark):
    """csv_ingest_policy stays HashAggregate (one scan, map-side
    partials, one exchange of ~6-group partials). A string MIN/MAX
    would silently demote it to SortAggregate — a per-partition sort
    of every feed row at 100 TB — which is why the status audit uses
    ascii(); this pin catches any regression to that shape."""
    import __spark_entry__ as entry_mod
    df = entry_mod.queries()["csv_ingest_policy"](
        spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    assert "SortAggregate" not in plan
    assert plan.count("Exchange") == 1


def test_scan_is_splittable(spark, tmp_path):
    """multiLine=false keeps the scan byte-range-splittable: one big
    file must produce multiple input partitions under a small
    maxPartitionBytes — the property that lets 1000 executors share
    one giant feed file."""
    src = (spark.range(0, 20000).toDF("k")
           .select("k", F.lit(1.0).alias("amount"),
                   F.timestamp_seconds(F.col("k")).alias("ts"),
                   F.lit("x").alias("code"))
           .coalesce(1))
    out = str(tmp_path / "big")
    write_delimited(src, out, sep="|")
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
        back = read_delimited(spark, out, DDL, sep="|")
        nparts = back.select("k").rdd.getNumPartitions()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
    assert nparts > 1
