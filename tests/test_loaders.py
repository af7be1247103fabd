"""Loader row-shaping (KafkaLoader/KafkaUserLoader equivalents) — pure
transforms tested without a database, plus the kafka record shaping.
"""

from __future__ import annotations

import json

from pyspark.sql import Row
from pyspark.sql import functions as F

from isaac_kafka_streaming_spark.sources.jdbc import (
    shape_logged_event,
    shape_user_event,
)
from isaac_kafka_streaming_spark.sources.kafka import to_kafka_records


def test_shape_logged_event_nulls_to_empty(spark):
    rows = spark.createDataFrame(
        [
            (
                "u1",
                None,
                None,
                None,
                '{"k": 1}',
                None,
                "2015-06-01 12:00:00",
            )
        ],
        schema=(
            "user_id string, anonymous_user boolean, event_type string, "
            "event_details_type string, event_details string, "
            "ip_address string, timestamp string"
        ),
    )
    out = shape_logged_event(rows).collect()[0]
    # NullHandler contract (KafkaLoader.java:132-135): null -> ''
    assert out.event_type == ""
    assert out.ip_address == ""
    assert out.anonymous_user is False
    assert out.timestamp == 1433160000000  # epoch ms, UTC session tz


def test_shape_user_event_wraps_profile(spark):
    users = spark.createDataFrame(
        [
            (
                "42",
                "Ada",
                None,
                "STUDENT",
                None,
                "FEMALE",
                "2016-01-02 00:00:00",
                None,
                None,
                "3",
                "VERIFIED",
                "SECRET-MUST-NOT-LEAK",
                "ada@example.com",
            )
        ],
        schema=(
            "user_id string, given_name string, family_name string, "
            "role string, date_of_birth string, gender string, "
            "registration_date string, school_id string, school_other string, "
            "default_level string, email_verification_status string, "
            "password string, email string"
        ),
    )
    out = shape_user_event(users).collect()[0]
    assert out.event_type == "CREATE_UPDATE_USER"
    assert out.anonymous_user is False
    details = json.loads(out.event_details)
    assert details["given_name"] == "Ada"
    assert details["family_name"] == ""  # null -> ''
    # PII exclusion (KafkaUserLoader.java:123,132-137)
    assert "password" not in details and "email" not in details
    assert out.timestamp == 1451692800000


def test_to_kafka_records_key_value(spark):
    df = spark.createDataFrame([Row(user_id=7, event_type="click", value=1.5)])
    out = to_kafka_records(df).collect()[0]
    assert out.key == "7"
    payload = json.loads(out.value)
    # user_id rides in BOTH key and value (KafkaLoader.java:104,112)
    assert payload == {"user_id": 7, "event_type": "click", "value": 1.5}


def test_kafka_parse_roundtrip_and_zero_defaults(spark):
    """S1 contract without a broker: shaped producer records parse back
    through _parse, and missing JSON fields take the reference's
    zero-defaults ('', false, 0 — SURVEY.md §1.2), never null."""
    from isaac_kafka_streaming_spark.sources.kafka import _parse

    good = json.dumps(
        {
            "user_id": "u9",
            "anonymous_user": True,
            "event_type": "VIEW_PAGE",
            "event_details": {"k": 3},
            "timestamp": 1433160000000,
        }
    )
    sparse = json.dumps({"user_id": "u10"})  # everything else missing
    raw = spark.createDataFrame(
        [(b"u9", good.encode()), (b"u10", sparse.encode())],
        schema="key binary, value binary",
    ).withColumn("timestamp", F.current_timestamp())
    out = {r.kafka_key: r for r in _parse(raw).collect()}
    g = out["u9"]
    assert (g.user_id, g.anonymous_user, g.event_type) == (
        "u9",
        True,
        "VIEW_PAGE",
    )
    assert g.event_ts_ms == 1433160000000
    assert g.ts.isoformat().startswith("2015-06-01")
    s = out["u10"]
    assert (s.anonymous_user, s.event_type, s.event_ts_ms) == (False, "", 0)


def test_kafka_serialize_parse_exact_roundtrip(spark):
    """K1/K2 ∘ S1 as a composition: records shaped by to_kafka_records
    parse back through _parse value-identical — the full producer ->
    consumer contract minus the broker itself (none exists in the
    container; see COVERAGE.md S1)."""
    from isaac_kafka_streaming_spark.sources.kafka import _parse

    src = spark.createDataFrame(
        [
            ("u1", False, "VIEW_PAGE", '{"p":"home"}', 1433160000000),
            ("u2", True, "ANSWER_QUESTION", None, 1433163600000),
        ],
        "user_id string, anonymous_user boolean, event_type string, "
        "event_details string, timestamp long",
    )
    wire = to_kafka_records(src)  # key string, value json-string
    back = _parse(wire.withColumn("timestamp", F.current_timestamp()))
    got = sorted(
        (r.user_id, r.anonymous_user, r.event_type, r.event_ts_ms)
        for r in back.collect()
    )
    want = sorted(
        (r.user_id, r.anonymous_user, r.event_type, r.timestamp)
        for r in src.collect()
    )
    assert got == want
    # keys carry the partitioning contract: key == user_id
    assert {r.key for r in wire.collect()} == {"u1", "u2"}


def test_kafka_parse_malformed_json_zero_defaults(spark):
    """A value that is not JSON at all must not poison the stream:
    from_json yields a NULL struct and every field takes its
    zero-default — the reference's Jackson .path() never-null contract
    extended to unparseable payloads."""
    from isaac_kafka_streaming_spark.sources.kafka import _parse

    raw = spark.createDataFrame(
        [(b"k1", b"not{json at all"), (b"k2", b""), (b"k3", None)],
        schema="key binary, value binary",
    ).withColumn("timestamp", F.current_timestamp())
    rows = {r.kafka_key: r for r in _parse(raw).collect()}
    assert len(rows) == 3  # no row dropped
    for r in rows.values():
        assert (r.user_id, r.anonymous_user, r.event_type) == ("", False, "")
        assert r.event_ts_ms == 0 and r.event_details is None


def test_spread_small_scan_guard(spark, sf_smoke):
    """The io-level guard behind every scan spread: raises parallelism
    only for narrower-than-cores batch inputs; wide inputs keep their
    partitioning (no full-corpus shuffle at scale) and streaming
    inputs pass through untouched."""
    from isaac_kafka_streaming_spark.io import read_table, spread_small_scan

    docs = read_table(spark, sf_smoke, "documents")
    target = spark.sparkContext.defaultParallelism

    narrow = docs.coalesce(1)
    assert spread_small_scan(narrow).rdd.getNumPartitions() == target

    wide = docs.repartition(target + 5, "doc_id")
    assert spread_small_scan(wide).rdd.getNumPartitions() == target + 5

    stream = (
        spark.readStream.schema(docs.schema)
        .parquet(sf_smoke)
    )
    assert spread_small_scan(stream) is stream
