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
