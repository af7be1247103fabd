"""An in-process test double for the `kafka` data source format.

The container has no Kafka broker and no spark-sql-kafka artifact, so
the real connector can never run here — but the *format boundary* can:
this module registers a Python Data Source (Spark 4 API) under the name
``kafka`` exposing the real connector's exact read schema (key/value
binary, topic, partition, offset, timestamp, timestampType) and the
options our adapters pass (`kafka.bootstrap.servers`, `subscribe` /
`topic`, `startingOffsets`).  With it registered, the *unmodified*
plans built by `isaac_kafka_streaming_spark.sources.kafka` construct,
analyze, and execute end-to-end — batch read, batch write, streaming
read, streaming write.

The "broker" is a directory: `bootstrap.servers` is interpreted as its
path, each topic is a subdirectory, and each partition a JSON-lines
file of {key, value} records (base64-encoded bytes).  This is a test
double, not a broker — ordering within a partition and append-only
offsets are faithful; consumer groups, rebalancing, and transactions
are out of scope.
"""

from __future__ import annotations

import base64
import json
import os
from datetime import datetime, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# the real spark-sql-kafka read schema, verbatim
KAFKA_READ_SCHEMA = StructType(
    [
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampType()),
        StructField("timestampType", IntegerType()),
    ]
)

N_PARTITIONS = 2
_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _topic_dir(options) -> str:
    root = options.get("kafka.bootstrap.servers")
    topic = options.get("subscribe") or options.get("topic")
    if not root or not topic:
        raise ValueError(
            "kafka test double requires kafka.bootstrap.servers (dir) "
            "and subscribe/topic options"
        )
    return os.path.join(root, topic)


def _partition_file(topic_dir: str, partition: int) -> str:
    return os.path.join(topic_dir, f"partition-{partition}.jsonl")


def _read_partition(topic_dir: str, partition: int, start: int = 0):
    """Yield (key, value, topic, partition, offset, ts, ts_type) rows."""
    path = _partition_file(topic_dir, partition)
    topic = os.path.basename(topic_dir)
    if not os.path.exists(path):
        return
    with open(path) as fh:
        for offset, line in enumerate(fh):
            if offset < start:
                continue
            rec = json.loads(line)
            key = rec["key"]
            yield (
                base64.b64decode(key) if key is not None else None,
                base64.b64decode(rec["value"]),
                topic,
                partition,
                offset,
                _EPOCH,
                0,  # TimestampType.CREATE_TIME
            )


def _end_offsets(topic_dir: str) -> dict:
    out = {}
    for p in range(N_PARTITIONS):
        path = _partition_file(topic_dir, p)
        n = 0
        if os.path.exists(path):
            with open(path) as fh:
                n = sum(1 for _ in fh)
        out[str(p)] = n
    return out


def append_records(topic_dir: str, rows, partition_of=None) -> None:
    """Producer side of the double: append (key: bytes|None, value:
    bytes) pairs, partitioned by key hash (or `partition_of`)."""
    os.makedirs(topic_dir, exist_ok=True)
    handles = {}
    try:
        for key, value in rows:
            if partition_of is not None:
                p = partition_of(key)
            elif key:
                # deterministic digest, NOT hash(): Python salts str/bytes
                # hashing per process (PYTHONHASHSEED), which would make
                # partition layout nondeterministic across runs
                import hashlib

                p = (
                    int.from_bytes(hashlib.md5(key).digest()[:4], "big")
                    % N_PARTITIONS
                )
            else:
                p = 0
            if p not in handles:
                handles[p] = open(_partition_file(topic_dir, p), "a")
            handles[p].write(
                json.dumps(
                    {
                        "key": base64.b64encode(key).decode()
                        if key is not None
                        else None,
                        "value": base64.b64encode(value).decode(),
                    }
                )
                + "\n"
            )
    finally:
        for fh in handles.values():
            fh.close()


class _BatchReader(DataSourceReader):
    def __init__(self, options):
        self.topic_dir = _topic_dir(options)

    def read(self, partition):
        # one spark task per kafka partition, like the real connector
        yield from _read_partition(self.topic_dir, partition.value)

    def partitions(self):
        from pyspark.sql.datasource import InputPartition

        return [InputPartition(p) for p in range(N_PARTITIONS)]


class _StreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.topic_dir = _topic_dir(options)
        self.starting = options.get("startingOffsets", "latest")

    def initialOffset(self) -> dict:
        if self.starting == "earliest":
            return {str(p): 0 for p in range(N_PARTITIONS)}
        return _end_offsets(self.topic_dir)

    def read(self, start: dict):
        end = _end_offsets(self.topic_dir)
        rows = [
            row
            for p in range(N_PARTITIONS)
            for row in _read_partition(
                self.topic_dir, p, int(start.get(str(p), 0))
            )
        ]
        # a list ITERATOR: the harness both next()s it (empty-batch
        # check) and pickles it (prefetch cache); list iterators do both
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        for p in range(N_PARTITIONS):
            lo, hi = int(start.get(str(p), 0)), int(end.get(str(p), 0))
            for i, row in enumerate(_read_partition(self.topic_dir, p, lo)):
                if lo + i >= hi:
                    break
                yield row


class _CommitMsg(WriterCommitMessage):
    """Carries the task's buffered (key, value) pairs to the driver."""

    def __init__(self, pairs):
        self.pairs = pairs


class _Writer(DataSourceWriter):
    """Accepts the real sink contract: key/value columns (binary or
    string), everything else ignored.

    Tasks only BUFFER rows (returned via the commit message); the
    driver-side commit() appends once — so a retried or speculative
    task can't double-append, and concurrent tasks can't interleave
    buffered writes mid-line."""

    def __init__(self, options):
        self.topic_dir = _topic_dir(options)

    def write(self, rows):
        def as_bytes(v):
            if v is None or isinstance(v, (bytes, bytearray)):
                return bytes(v) if v is not None else None
            return str(v).encode()

        return _CommitMsg(
            [(as_bytes(r["key"]), as_bytes(r["value"])) for r in rows]
        )

    def _append(self, messages):
        append_records(
            self.topic_dir,
            (pair for m in messages if m is not None for pair in m.pairs),
        )

    def commit(self, messages):
        self._append(messages)

    def abort(self, messages):
        pass


class _StreamWriter(_Writer, DataSourceStreamWriter):
    # _Writer first so its concrete write() wins the MRO over the
    # abstract DataSourceStreamWriter.write
    def __init__(self, options):
        _Writer.__init__(self, options)

    def commit(self, messages, batchId):
        self._append(messages)

    def abort(self, messages, batchId):
        pass


class KafkaTestDouble(DataSource):
    @classmethod
    def name(cls) -> str:
        # NOT "kafka": DataSource$.lookupDataSource hardwires that name
        # to the curated "deploy spark-sql-kafka" error in its classload
        # Failure branch BEFORE consulting the Python data source
        # registry, so a Python source can never own it.  The adapters
        # in sources/kafka.py take the format name via KAFKA_FORMAT so
        # tests can point the identical plan here.
        return "kafkasim"

    def schema(self):
        return KAFKA_READ_SCHEMA

    def reader(self, schema):
        return _BatchReader(self.options)

    def simpleStreamReader(self, schema):
        return _StreamReader(self.options)

    def writer(self, schema, overwrite):
        return _Writer(self.options)

    def streamWriter(self, schema, overwrite):
        return _StreamWriter(self.options)


def register(spark) -> str:
    """Register the double; returns the format name to use."""
    import sys

    from pyspark import cloudpickle

    # the tests/ dir is not on the executors' import path; ship this
    # module by value inside the pickled data source instead of by name
    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(KafkaTestDouble)
    return KafkaTestDouble.name()
