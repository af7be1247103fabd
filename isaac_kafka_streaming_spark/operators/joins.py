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
