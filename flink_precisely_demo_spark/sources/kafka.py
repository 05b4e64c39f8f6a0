"""Kafka source/sink wiring (S1/S3).

Mirrors the reference's Kafka configuration surface
(StreamingJob.java:190-203: topic, startup mode, client properties
prefix-extracted from a properties map — Utils.java:17-30) on
Spark's Kafka connector options. The spark-sql-kafka package and a
broker are not available in this container, so construction is gated:
``kafka_available(spark)`` probes for the data source and callers
fall back to file sources (see streaming/pipeline.py).

Property plumbing parity (M2): ``kafka_options`` accepts a plain
dict of client properties and re-prefixes them the way Spark expects
(``kafka.<client prop>``), the same transformation the reference
performs from its properties file (StreamingJob.java:84-85).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..sources.cdc_json import decode_envelope


def kafka_available(spark: SparkSession) -> bool:
    try:
        spark.readStream.format("kafka") \
            .option("subscribe", "probe") \
            .option("kafka.bootstrap.servers", "localhost:0") \
            .load()
        return True
    except Exception:
        return False


def kafka_options(bootstrap_servers: str, client_props: dict[str, str] | None = None
                  ) -> dict[str, str]:
    """Client properties -> Spark Kafka options (kafka.* prefix)."""
    opts = {"kafka.bootstrap.servers": bootstrap_servers}
    for k, v in (client_props or {}).items():
        opts[k if k.startswith("kafka.") else f"kafka.{k}"] = v
    return opts


def read_cdc_topic(spark: SparkSession, topic: str, payload_schema: T.StructType,
                   bootstrap_servers: str,
                   client_props: dict[str, str] | None = None,
                   starting_offsets: str = "earliest") -> DataFrame:
    """CREATE TABLE ... WITH ('connector.type'='kafka', 'format.type'=
    'json', 'connector.startup-mode'='earliest-offset') equivalent
    (reference StreamingJob.java:153-203): subscribe + schema-driven
    JSON decode into envelope rows."""
    reader = (spark.readStream.format("kafka")
              .option("subscribe", topic)
              .option("startingOffsets", starting_offsets))
    for k, v in kafka_options(bootstrap_servers, client_props).items():
        reader = reader.option(k, v)
    return decode_envelope(reader.load(), payload_schema)


def write_json_topic(df: DataFrame, topic: str, bootstrap_servers: str,
                     checkpoint: str,
                     client_props: dict[str, str] | None = None):
    """INSERT INTO output (JSON Kafka sink, reference
    StreamingJob.java:130-131,142-151). Returns the StreamingQuery."""
    writer = (df.selectExpr("to_json(struct(*)) AS value")
                .writeStream.format("kafka")
                .option("topic", topic)
                .option("checkpointLocation", checkpoint))
    for k, v in kafka_options(bootstrap_servers, client_props).items():
        writer = writer.option(k, v)
    return writer.start()
