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


def reference_default_client_props() -> dict[str, str]:
    """The client properties the reference bakes into every source
    table DDL (StreamingJob.java createTableOptions:
    'connector.properties.group.id'='cdc-raw-read',
    'connector.properties.client.id'='precisely_processed')."""
    return {"group.id": "cdc-raw-read", "client.id": "precisely_processed"}


def cdc_source_options(topic: str, bootstrap_servers: str,
                       client_props: dict[str, str] | None = None,
                       starting_offsets: str = "earliest") -> dict[str, str]:
    """The COMPLETE Spark option map for a CDC source topic — the
    twin of the reference's WITH(...) clause (StreamingJob.java
    createTableOptions): 'connector.topic' -> subscribe,
    'connector.startup-mode'='earliest-offset' -> startingOffsets=
    earliest, 'connector.properties.X' -> kafka.X. Pure function so
    the contract is testable without a broker."""
    props = dict(reference_default_client_props())
    props.update(client_props or {})
    opts = {"subscribe": topic, "startingOffsets": starting_offsets}
    opts.update(kafka_options(bootstrap_servers, props))
    return opts


def read_cdc_topic(spark: SparkSession, topic: str, payload_schema: T.StructType,
                   bootstrap_servers: str,
                   client_props: dict[str, str] | None = None,
                   starting_offsets: str = "earliest") -> DataFrame:
    """CREATE TABLE ... WITH ('connector.type'='kafka', 'format.type'=
    'json', 'connector.startup-mode'='earliest-offset') equivalent
    (reference StreamingJob.java:153-203): subscribe + schema-driven
    JSON decode into envelope rows."""
    reader = spark.readStream.format("kafka")
    for k, v in cdc_source_options(topic, bootstrap_servers, client_props,
                                   starting_offsets).items():
        reader = reader.option(k, v)
    return decode_envelope(reader.load(), payload_schema)


def json_payload(df: DataFrame) -> DataFrame:
    """Row -> single ``value`` string column: the sink's JSON payload
    ('format.type'='json' twin). Field order follows the schema, so
    the serialization is contract-testable in batch."""
    return df.selectExpr("to_json(struct(*)) AS value")


def write_json_topic(df: DataFrame, topic: str, bootstrap_servers: str,
                     checkpoint: str,
                     client_props: dict[str, str] | None = None):
    """INSERT INTO output (JSON Kafka sink, reference
    StreamingJob.java:130-131,142-151). Returns the StreamingQuery."""
    writer = (json_payload(df)
                .writeStream.format("kafka")
                .option("topic", topic)
                .option("checkpointLocation", checkpoint))
    for k, v in kafka_options(bootstrap_servers, client_props).items():
        writer = writer.option(k, v)
    return writer.start()
