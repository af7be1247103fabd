"""Joins — the reference's single join shape plus the engine's policy.

Reference: one KStream⋈KTable inner equi-join on the record key
(LoggedEventsListener.java:118-134) — a local hash-lookup against the
user-profile state.  Spark-first mapping: an inner equi-join where the
profile side is a *dimension* — small relative to the fact stream — so
we broadcast it explicitly.  At 100 TB of events the dimension (users)
is still ~GBs; broadcast keeps the fact table shuffle-free.  If the
dimension outgrows broadcast, drop the hint and let AQE pick
sort-merge with skew splitting.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich(
    facts: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | str,
    broadcast_dim: bool = True,
    how: str = "inner",
) -> DataFrame:
    """J1 — enrich a fact stream with a keyed dimension (inner by default:
    the reference drops events whose user is unknown)."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return facts.join(d, on=on, how=how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] = (),
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: each left row gets the right row with the
    greatest right_ts <= left_ts for the same key (inclusive), or NULLs
    when no prior right row exists — the time-series/feature-lookup
    join Spark has no native operator for.

    Composition, not correlated subquery: tag both sides, union, sort
    within each key by (ts, tag) — right rows sort before left rows at
    equal timestamps, giving the inclusive match — and carry the last
    non-null right values forward with last(ignorenulls) over a
    running-row window.  Cost shape: ONE shuffle on the key (the
    window sort), linear scan within each key — no range-duplicated
    join, no per-row subquery.  At 100 TB both sides pre-partitioned/
    bucketed on the key sort-merge into the same exchange.

    Right rows that tie on (key, right_ts) are collapsed to one
    deterministic winner (max by value_cols order) before the union, so
    results never depend on physical row order.  DuckDB twin: native
    ASOF JOIN (same greatest-<= semantics), used by the graded query.
    """
    from pyspark.sql import Window

    rv = list(value_cols)
    # deterministic winner per (key, ts) — max_by over the value struct —
    # then ONE carried struct (never per-column carry: a legitimately
    # NULL value column must not be backfilled from an older right row)
    r_tagged = (
        right.groupBy(on, right_ts)
        .agg(F.max(F.struct(*rv)).alias("__r"))
        .select(
            F.col(on),
            F.col(right_ts).alias("__ts"),
            F.lit(0).alias("__tag"),
            "__r",
        )
    )
    null_struct = F.lit(None).cast(r_tagged.schema["__r"].dataType)
    l_tagged = left.select(
        *left.columns,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        null_struct.alias("__r"),
    )
    r_padded = r_tagged.select(
        *[
            F.col(on)
            if c == on
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
        ],
        "__ts",
        "__tag",
        "__r",
    )
    w = (
        Window.partitionBy(on)
        .orderBy("__ts", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_padded).select(
        *left.columns,
        "__tag",
        F.last("__r", ignorenulls=True).over(w).alias("__asof"),
    )
    return carried.filter(F.col("__tag") == 1).select(
        *left.columns,
        *[F.col(f"__asof.{c}").alias(f"{prefix}{c}") for c in rv],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_start: str,
    band_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Banded range join: left rows matched to right rows where
    left_ts lies in [right_start, right_start + band_seconds) for the
    same key — the point-in-interval join Spark would otherwise plan as
    a BroadcastNestedLoop/cartesian on the inequality.

    Shape: both sides are bucketed into band-width time chunks; an
    interval of width == chunk width can only overlap the chunk of its
    start and the next one, so the right side explodes to exactly 2
    chunk keys and the join is a plain EQUI-join on (key, chunk) with
    the exact inequality applied as a post-filter.  One shuffle, 2x
    duplication of the (smaller) interval side, no nested loop at any
    scale — the standard banded-range-join rewrite that engines with a
    range-join optimizer (and DuckDB's IEJoin) do internally.
    """
    chunk_l = F.floor(F.unix_micros(F.col(left_ts)) / (band_seconds * 1_000_000))
    chunk_r = F.floor(
        F.unix_micros(F.col(right_start)) / (band_seconds * 1_000_000)
    )
    l = left.withColumn("__chunk", chunk_l)
    r = right.withColumn(
        "__chunk", F.explode(F.array(chunk_r, chunk_r + 1))
    )
    cond = (
        (F.col(left_ts) >= F.col(right_start))
        & (
            F.col(left_ts)
            < F.col(right_start) + F.expr(f"INTERVAL {band_seconds} SECOND")
        )
    )
    return l.join(r, on=[on, "__chunk"], how=how).filter(cond).drop("__chunk")


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigated shuffle join: spread a hot fact key over n_salts
    shuffle partitions by salting, replicating the (small) dim side per
    salt value.

    When to reach for it at 100 TB: the dim outgrew broadcast AND one
    fact key dominates (a "null user" / bot account).  AQE's skew-join
    splitting handles sort-merge skew after the fact; salting prevents
    the skewed partition from ever forming, and works for shapes AQE
    won't touch (e.g. skewed keys under a hash-partitioned bucketed
    layout).  The salt derives from a per-row hash of all columns, so
    the join RESULT is identical to the unsalted join (asserted in
    tests) — only the shuffle distribution changes.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in facts.columns]), F.lit(n_salts))
    salted_facts = facts.withColumn("__salt", salt)
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    return (
        salted_facts.join(salted_dim, on=[key, "__salt"], how=how)
        .drop("__salt")
    )
