"""Config plumbing tests (M2, Utils.java parity)."""

from flink_precisely_demo_spark.config import (
    load_properties_file,
    parse_args,
    read_prefixed_properties,
)


def test_prefix_extraction():
    props = {"kafka.bootstrap.servers": "b:9092", "kafka.group.id": "g",
             "other.key": "x"}
    assert read_prefixed_properties(props, "kafka.") == {
        "bootstrap.servers": "b:9092", "group.id": "g"}
    assert read_prefixed_properties(props, "kafka.", strip=False) == {
        "kafka.bootstrap.servers": "b:9092", "kafka.group.id": "g"}


def test_parse_args_merge_and_flags():
    got = parse_args(["topic=orders", "verbose", "topic=cdc-orders"],
                     defaults={"topic": "default", "retries": "3"})
    assert got == {"topic": "cdc-orders", "retries": "3", "verbose": "true"}


def test_properties_file(tmp_path):
    p = tmp_path / "job.properties"
    p.write_text("# comment\nkafka.bootstrap.servers=b:9092\n\nname = demo \n")
    assert load_properties_file(str(p)) == {
        "kafka.bootstrap.servers": "b:9092", "name": "demo"}
