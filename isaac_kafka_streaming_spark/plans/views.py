"""Derived logical views mapping the driver tables onto the reference's
record shapes (FIXTURES.md §C).

The reference processes `logged_event` records (reconstructed schema in
FIXTURES.md §A1, from /root/reference KafkaLoader.java:100-110) and a user
profile dimension (KafkaUserLoader.java:119-150).  The driver's synthetic
tables play those roles via deterministic derivations; the *same*
expressions are declared as SQL in `plans.oracle` so the DuckDB oracle
sees identical inputs.

Every function here is a pure (spark, sf_dir) -> DataFrame with no
actions; Catalyst sees the full plan of any downstream query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table

# Parameter pinned with plans.oracle: a user is "anonymous" iff
# user_id % 10 == 0 (plays the reference's `anonymous_user` flag,
# LoggedEventsListener.java:83-84).
ANONYMOUS_MODULUS = 10


def logged_events_from(events: DataFrame) -> DataFrame:
    """Pure derivation: events table/stream -> logged-event records (A1).
    Works identically on batch and streaming DataFrames."""
    return events.select(
        "event_id",
        "user_id",
        "event_type",
        F.col("ts").alias("ts"),
        (F.col("user_id") % ANONYMOUS_MODULUS == 0).alias("anonymous_user"),
        "value",
        "props",
    )


def logged_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`events` as the reference's `topic_logged_events` records (A1)."""
    return logged_events_from(read_table(spark, sf_dir, "events"))


def registered_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The registered branch of P1 (LoggedEventsListener.java:81-85)."""
    return logged_events(spark, sf_dir).filter(~F.col("anonymous_user"))


def anonymous_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The anonymous branch of P1, shaped for the K1 sink."""
    return logged_events(spark, sf_dir).filter(F.col("anonymous_user"))


def users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-profile dimension (plays A3 / store_user_data O1 snapshot).

    customer ⋈ nation plays the `users` table of KafkaUserLoader.java:82-86:
    role <- c_mktsegment, nation <- n_name, gender <- deterministic parity.
    PII exclusion contract of KafkaUserLoader.java:123-137 is moot here
    (no PII columns exist), but the projection is still an allow-list.
    """
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_mktsegment").alias("role"),
            F.when(F.col("c_custkey") % 2 == 0, F.lit("MALE"))
            .otherwise(F.lit("FEMALE"))
            .alias("gender"),
            F.col("n_name").alias("nation"),
            F.col("c_acctbal").alias("acctbal"),
        )
    )


def question_attempts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Question-attempt events (A2): derived from registered events.

    questionId = '<page>|<part>' split semantics of DerivedStreams.java:147,
    176-177; `correct` plays event_details.correct (DerivedStreams.java:133).
    FLOOR before the modulus: Spark CAST(double AS INT) truncates while
    DuckDB rounds, so both sides floor first (see plans.oracle).
    """
    return question_attempts_from(registered_events(spark, sf_dir))


def question_attempts_from(ev: DataFrame) -> DataFrame:
    """Pure derivation: registered logged events -> question attempts
    (batch or streaming)."""
    vi = F.floor(F.col("value")).cast("int")
    page = F.concat(F.lit("q"), (vi % 20).cast("string"))
    part = F.concat(F.lit("p"), (vi % 3).cast("string"))
    return ev.select(
        "event_id",
        "user_id",
        page.alias("question_page_id"),
        part.alias("question_part_id"),
        F.concat(page, F.lit("|"), part).alias("question_id"),
        (F.col("value") > 50).alias("correct"),
        F.col("ts").alias("date_attempted"),
    )


def questions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Question dimension (A4 `questions` dim for the U1 enrichment).

    Replaces the reference's per-record HTTP lookup
    (AugmentedQuestionDetailMapper.java:100-134) with a broadcastable
    dimension: part count per question page derived from the attempt
    stream itself, plus a deterministic difficulty level.
    """
    qa = question_attempts(spark, sf_dir)
    # level derives from the numeric page id — engine-specific hash()
    # functions differ between Spark and DuckDB, so don't use them here.
    return (
        qa.groupBy("question_page_id")
        .agg(F.countDistinct("question_part_id").alias("question_part_count"))
        .withColumn(
            "level",
            F.substring(F.col("question_page_id"), 2, 10).cast("int") % 6 + 1,
        )
    )
