"""S2/S3 + loaders — JDBC sources and the batch replay pipelines.

The reference's KafkaLoader (KafkaLoader.java:33-130) cursors over a
range-filtered `logged_events` SELECT and produces JSON events row by
row (~1k rows/s, single thread); KafkaUserLoader (KafkaUserLoader.java:
29-169) replays `users` rows as synthetic CREATE_UPDATE_USER events.

Spark form: one declarative job each — read.jdbc (partitioned on the
range column so the scan parallelizes) -> project -> kafka/parquet
write.  The row-shaping halves are pure DataFrame transforms, testable
without a database; only `read_*` touches JDBC.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalars import null_to_empty

# P6 allow-list (KafkaUserLoader.java:119-150). PII columns — email,
# password, secure_salt, reset tokens — are deliberately excluded,
# preserving the reference's redaction contract (:123,132-137).
USER_PROFILE_COLUMNS = (
    "given_name",
    "family_name",
    "user_id",
    "role",
    "date_of_birth",
    "gender",
    "registration_date",
    "school_id",
    "school_other",
    "default_level",
    "email_verification_status",
)


def read_logged_events_jdbc(
    spark: SparkSession,
    url: str,
    lower_ts: str,
    upper_ts: str,
    table: str = "logged_events",
    num_partitions: int = 32,
    properties: Optional[dict] = None,
) -> DataFrame:
    """S2 — range-filtered JDBC read (KafkaLoader.java:87-97).

    The reference hand-writes the WHERE into its SQL; here the range
    is the partition column spec, so Catalyst both pushes the predicate
    AND splits the scan into parallel range queries.

    Uses the option-based DataSource API, not the read.jdbc()
    convenience wrapper: the wrapper int()-coerces lowerBound/upperBound
    and so cannot express TIMESTAMP range bounds (caught by the Derby
    round-trip test, tests/test_jdbc_roundtrip.py).
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("partitionColumn", "timestamp")
        .option("lowerBound", lower_ts)
        .option("upperBound", upper_ts)
        .option("numPartitions", str(num_partitions))
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load().filter(
        (F.col("timestamp") > lower_ts) & (F.col("timestamp") < upper_ts)
    )


def read_users_jdbc(
    spark: SparkSession,
    url: str,
    table: str = "users",
    properties: Optional[dict] = None,
) -> DataFrame:
    """S3 — full-table users read (KafkaUserLoader.java:82-86)."""
    return spark.read.jdbc(url, table, properties=properties or {})


def shape_logged_event(rows: DataFrame) -> DataFrame:
    """P5 — logged_events row -> event record (KafkaLoader.java:100-110):
    7 projected columns, null -> '' string coalescing, epoch-millis
    timestamp from the DB timestamp."""
    return rows.select(
        null_to_empty("user_id").alias("user_id"),
        F.coalesce(F.col("anonymous_user").cast("boolean"), F.lit(False)).alias(
            "anonymous_user"
        ),
        null_to_empty("event_type").alias("event_type"),
        null_to_empty("event_details_type").alias("event_details_type"),
        null_to_empty("event_details").alias("event_details"),
        null_to_empty("ip_address").alias("ip_address"),
        F.unix_millis(F.col("timestamp").cast("timestamp")).alias("timestamp"),
    )


def shape_user_event(users: DataFrame) -> DataFrame:
    """KUL wrap — users row -> synthetic CREATE_UPDATE_USER logged event
    (KafkaUserLoader.java:119-151): profile columns string-coalesced into
    event_details, event timestamp = registration_date."""
    available = [c for c in USER_PROFILE_COLUMNS if c in users.columns]
    details = F.to_json(
        F.struct(*[null_to_empty(c).alias(c) for c in available])
    )
    return users.select(
        null_to_empty("user_id").alias("user_id"),
        F.lit(False).alias("anonymous_user"),
        F.lit("CREATE_UPDATE_USER").alias("event_type"),
        F.lit("").alias("event_details_type"),
        details.alias("event_details"),
        F.lit("").alias("ip_address"),
        F.unix_millis(F.col("registration_date").cast("timestamp")).alias(
            "timestamp"
        ),
    )


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    properties: Optional[dict] = None,
    batchsize: int = 10_000,
    num_partitions: Optional[int] = None,
) -> None:
    """K3/K5 — JDBC sink.  Connection pooling, batching and parallelism
    are writer options (PostgresSqlDb.java:45-76's DBCP pool has no
    Spark equivalent to manage by hand)."""
    props = dict(properties or {})
    props.setdefault("batchsize", str(batchsize))
    out = df.repartition(num_partitions) if num_partitions else df
    out.write.jdbc(url, table, mode=mode, properties=props)
