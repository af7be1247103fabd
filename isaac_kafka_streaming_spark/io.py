"""Table readers for the driver's synthetic parquet layout.

`read_table(spark, sf_dir, name)` is the only way engine code touches
storage in batch mode; parquet scans get Catalyst's pushdown/pruning for
free. Kafka / JDBC adapters live in `sources/`.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_col: str,
    n_buckets: int = 32,
) -> None:
    """Materialize a table bucketed (and sorted) by the join/group key.

    The 100 TB co-location primitive: two tables bucketed the same way
    join with NO exchange on either side (asserted in
    tests/test_scale_paths.py), and aggregations on the bucket key skip
    their shuffle.  On a cluster the bucket count tracks total cores;
    the sortBy makes the sort-merge join's sort a no-op too.
    """
    (
        df.write.bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .option("path", path)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table_name)
    )


def write_range_partitioned(
    df: DataFrame, path: str, col: str, n_partitions: int = 32
) -> None:
    """Materialize a table range-partitioned AND sorted by `col`, so
    every output file covers a disjoint range of it.

    The time-slice scan primitive at 100 TB: parquet stores per-file /
    per-row-group min-max stats, so a `ts BETWEEN ...` scan over a
    layout sorted this way skips every file outside the slice instead
    of reading 100 TB to filter it.  Complements write_bucketed (which
    co-locates JOIN/GROUP keys): bucket by the equi-key, range-sort by
    the range-predicate key.  tests/test_scale_paths.py asserts the
    disjointness and the bounded file fan-in of a slice query.
    """
    # Spark's default parquet timestamp encoding is legacy INT96, which
    # carries NO column statistics — it silently defeats the entire
    # point of this layout.  TIMESTAMP_MICROS restores min-max stats
    # (and is the non-deprecated encoding).  The conf is scoped to this
    # write: the caller's session keeps whatever encoding it had.
    conf = df.sparkSession.conf
    key = "spark.sql.parquet.outputTimestampType"
    prev = conf.get(key, None)
    conf.set(key, "TIMESTAMP_MICROS")
    try:
        (
            df.repartitionByRange(n_partitions, col)
            .sortWithinPartitions(col)
            .write.mode("overwrite")
            .parquet(path)
        )
    finally:
        conf.set(key, prev) if prev is not None else conf.unset(key)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    # engine semantic, not a tuning knob: event-time bucketing is pinned
    # to UTC so day truncation matches the (timezone-naive) DuckDB
    # oracle on ANY host session, including a driver-owned one that
    # didn't configure it.  Runtime-settable, like nanosAsLong below.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # naive (isAdjustedToUTC=false) parquet timestamps must read as
    # TIMESTAMP_LTZ with the stored micros taken as micros-since-epoch —
    # the same reading DuckDB's epoch_ms applies — not as TIMESTAMP_NTZ,
    # which unix_millis/window() reject.  The generator writes naive UTC
    # wall-clock, so with the session pinned to UTC the two are equal.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    if name == "events":
        # self-sufficient even on a driver-provided session that didn't
        # configure it (the conf is runtime-settable)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # ts is parquet TIMESTAMP(NANOS): read as long nanos
        # (spark.sql.legacy.parquet.nanosAsLong) and truncate to
        # microseconds — the same ns->us truncation DuckDB applies.
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn(
                "ts", F.expr("timestamp_micros(ts div 1000)")
            )
    return df


def spread_small_scan(df: DataFrame, key: str = "doc_id") -> DataFrame:
    """Raise a batch frame's parallelism to the cluster default WHEN
    the scan provided less — and only then.

    A small single-file parquet table reads as ONE split, so every
    downstream per-row computation (signature hashing, codec decode)
    inherits a single task unless re-spread.  Conversely, a real
    corpus arrives with >= cores splits, where an unconditional
    repartition is a full-frame shuffle that buys nothing (or actively
    REDUCES parallelism when splits > cores).  This guard makes the
    "dropped at scale" claim true in code: streaming inputs and
    already-wide inputs pass through untouched; only a
    narrower-than-cores batch input pays the (tiny) hash exchange."""
    if df.isStreaming:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, key)
    return df


def read_documents_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents scan behind spread_small_scan — THE shared entry
    point for every per-row-heavy corpus operator (tokenize, shingle,
    hash folds, regex, codec work).  Round-13 interleaved A/B at sf0.1
    measured 1.3-2.9x wins across the text/dedup/sampling families;
    the measured aggregate-light losers opt out at their call sites
    with a plain read_table and a comment.  No-op at real scale and on
    streaming inputs (the guard's contract)."""
    return spread_small_scan(read_table(spark, sf_dir, "documents"))
