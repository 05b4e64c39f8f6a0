"""Literal reference-SQL execution: the reference's .sql files run
VERBATIM on Spark.

The reference registers ``parseTs`` as a Flink ScalarFunction
(StreamingJob.java:82) and drives its projections with SQL text files
(sql/orders.sql). Spark 4's SQL scalar functions (CREATE FUNCTION ...
RETURN) let the SAME text run unmodified: ``register_parse_ts_sql``
declares parseTs as a pure-SQL function (identical semantics to
functions/datetime_fns.parse_ts, null-safe on malformed input), and
``reference_sql_orders`` executes the orders.sql projection text
byte-for-byte over a ``cdc_Orders`` view.

The embedded SQL below is the reference's query-surface fixture
(sql/orders.sql:1-12), reproduced verbatim so a user's existing SQL
runs as-is — the engine implementation is unrelated to it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import ORDERS_PAYLOAD
from ..sources.cdc_json import decode_envelope, synthesize_orders_envelope
from ..sources.parquet import load_table
from .queries import query

PARSE_TS_SQL_FUNCTION = """
CREATE OR REPLACE TEMPORARY FUNCTION parseTs(s STRING) RETURNS TIMESTAMP
RETURN timestampadd(MICROSECOND,
                    try_cast(rpad(substring(s, 15, 6), 6, '0') AS BIGINT),
                    try_to_timestamp(substring(s, 1, 14), 'yyyyMMddHHmmss'))
"""

# reference sql/orders.sql, verbatim
REFERENCE_ORDERS_SQL = """SELECT
    after_image.SalesOrderId,
    parseTs(after_image.OrderDate) as OrderDate,
    parseTs(after_image.DueDate) as DueDate,
    parseTs(after_image.ShipDate) as ShipDate,
    after_image.Status,
    after_image.ShipToAddressId as AddressId,
    after_image.SubTotal,
    after_image.TaxAmt,
    after_image.Freight,
    after_image.TotalDue,
    parseTs(sv_op_timestamp) as OrderAsOf
FROM cdc_Orders"""


def register_parse_ts_sql(spark: SparkSession) -> None:
    spark.sql(PARSE_TS_SQL_FUNCTION)


@query(
    "reference_sql_orders",
    oracle="""
    SELECT CAST(o_orderkey AS INT) AS SalesOrderId,
           o_orderdate AS OrderDate,
           o_orderdate AS DueDate,
           o_orderdate AS ShipDate,
           5 AS Status,
           CAST(o_custkey AS INT) AS AddressId,
           o_totalprice AS SubTotal,
           0.0 AS TaxAmt,
           0.0 AS Freight,
           o_totalprice AS TotalDue,
           o_orderdate AS OrderAsOf
    FROM orders
    """,
)
def _reference_sql_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sql/orders.sql executed verbatim: synthesize the cdc-orders
    envelope stream from the orders table, expose it as the
    ``cdc_Orders`` view, register the SQL parseTs, run the file text.
    Timestamp columns are cast to NTZ afterwards (driver-harness
    normalization only — the reference text itself is untouched)."""
    register_parse_ts_sql(spark)
    raw = synthesize_orders_envelope(load_table(spark, sf_dir, "orders"))
    decode_envelope(raw, ORDERS_PAYLOAD).createOrReplaceTempView("cdc_Orders")
    out = spark.sql(REFERENCE_ORDERS_SQL)
    ts_cols = {"OrderDate", "DueDate", "ShipDate", "OrderAsOf"}
    return out.select(*[
        F.col(c).cast("timestamp_ntz").alias(c) if c in ts_cols else F.col(c)
        for c in out.columns])
