"""Kafka contract tests (S1/S3): no broker exists in this container,
so the option-map construction and the sink payload serialization —
the parts a deployment actually gets wrong — are pinned as pure
contracts against the reference's WITH(...) surface
(StreamingJob.java createTableOptions, Utils.java:17-30)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from flink_precisely_demo_spark.sources.kafka import (
    cdc_source_options,
    json_payload,
    kafka_options,
    reference_default_client_props,
)


def test_source_options_mirror_reference_with_clause():
    """connector.topic -> subscribe; 'earliest-offset' startup ->
    startingOffsets=earliest; connector.properties.{group.id,
    client.id} defaults -> kafka.-prefixed client options."""
    opts = cdc_source_options("cdc.raw", "broker1:9092,broker2:9092")
    assert opts == {
        "subscribe": "cdc.raw",
        "startingOffsets": "earliest",
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "kafka.group.id": "cdc-raw-read",
        "kafka.client.id": "precisely_processed",
    }


def test_source_options_user_props_override_defaults():
    opts = cdc_source_options(
        "t", "b:9092",
        client_props={"group.id": "my-group", "security.protocol": "SSL"},
        starting_offsets="latest")
    assert opts["kafka.group.id"] == "my-group"
    assert opts["kafka.security.protocol"] == "SSL"
    assert opts["startingOffsets"] == "latest"
    # untouched defaults survive
    assert opts["kafka.client.id"] == "precisely_processed"


def test_kafka_prefix_extraction_round_trip():
    """Utils.readKafkaProperties strips the kafka. prefix from the
    properties file; Spark wants it back. Already-prefixed keys must
    not be double-prefixed."""
    props = {"kafka.bootstrap.servers": "ignored", "retries": "3"}
    opts = kafka_options("b:9092", props)
    assert opts["kafka.retries"] == "3"
    assert "kafka.kafka.retries" not in opts
    # explicit bootstrap wins over a stray client prop
    assert opts["kafka.bootstrap.servers"] == "ignored"


def test_reference_default_client_props_pinned():
    assert reference_default_client_props() == {
        "group.id": "cdc-raw-read",
        "client.id": "precisely_processed",
    }


def test_sink_payload_is_flat_json_of_all_columns(spark):
    """'format.type'='json' sink twin: one `value` string column,
    every field serialized, schema field order preserved — checked in
    batch (the streaming writer reuses the same expression)."""
    df = spark.createDataFrame(
        [(5, "XX", "Alaska", 42.5)],
        "StateProvinceID int, CountryRegionCode string, Name string, total double")
    out = json_payload(df)
    assert out.columns == ["value"]
    payload = out.collect()[0]["value"]
    assert json.loads(payload) == {
        "StateProvinceID": 5, "CountryRegionCode": "XX",
        "Name": "Alaska", "total": 42.5}
    # field ORDER is part of the wire contract
    assert payload.index("StateProvinceID") < payload.index("CountryRegionCode") \
        < payload.index("Name")


def test_sink_payload_null_handling(spark):
    """Nulls are omitted by to_json — consumers of the reference's
    JSON sink see absent keys, not null literals."""
    df = spark.createDataFrame([(1, None)], "a int, b string")
    payload = json_payload(df).collect()[0]["value"]
    assert json.loads(payload) == {"a": 1}
