"""Partition-safe total-order primitives.

``Window.orderBy(<keys>)`` with no partitionBy funnels EVERY row
through one task — correct on 60k rows, a guaranteed bottleneck (or
OOM) on a corpus-sized frame.  These helpers express the two uses the
engine actually needs — a dense 1..N rank and a running sum over a
total order — as range-partitioned plans: sort WITHIN range partitions
(partition i's keys all precede partition i+1's), then offset each
partition's local result by an aggregate of the partitions before it.
The only single-partition step left is the offsets window over the
per-partition summary frame: #shuffle-partitions rows, never N.
tools/plan_lint.py's single-partition-sort detector enforces that
every live plan either uses these (sorting only the ``__pid`` summary)
or carries an adjudicated bounded-frame reason.

Both helpers REQUIRE ``order_cols`` to be a total order (include a
unique tie-break column), or results are nondeterministic across runs.
The localCheckpoint pins the range partitioning so the summary subtree
and the output subtree read identical partition ids — two
re-executions of a sampled range exchange are not guaranteed to draw
the same boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _range_pinned(df: DataFrame, order_cols: list) -> DataFrame:
    return (
        df.repartitionByRange(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )


def _offsets(part: DataFrame, agg_col) -> DataFrame:
    """Per-partition exclusive prefix of ``agg_col`` over the (tiny)
    partition-summary frame — the one deliberate single-partition sort,
    keyed on __pid."""
    w_off = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        part.groupBy("__pid")
        .agg(agg_col.alias("__n"))
        .withColumn("__off", F.coalesce(F.sum("__n").over(w_off), F.lit(0)))
        .select("__pid", "__off")
    )


def ranked_total_order(
    df: DataFrame, order_cols: list, out_cols: list, rank_alias: str = "rank"
) -> DataFrame:
    """Dense 1..N row_number over a total order, range-partitioned:
    local row index per partition + cumulative-count offsets.

    The local index comes from sortWithinPartitions +
    monotonically_increasing_id — NOT a __pid-partitioned window —
    because the window form would re-shuffle the whole frame on __pid
    (hashpartitioning) just to number rows that are ALREADY clustered
    and sorted by the range exchange.  The id's documented layout
    (partition id in the upper bits, in-partition record index in the
    lower 33) yields both __pid and the 0-based local index without
    moving a row; the checkpoint pins partition contents and stored
    order, so the id assignment is deterministic for both consumers."""
    part = (
        df.repartitionByRange(*order_cols)
        .sortWithinPartitions(*order_cols)
        .localCheckpoint()
    )
    local = (
        part.withColumn("__mid", F.monotonically_increasing_id())
        .withColumn("__pid", F.shiftright("__mid", 33).cast("int"))
        .withColumn(
            "__lr", (F.col("__mid").bitwiseAND((1 << 33) - 1)) + 1
        )
    )
    offsets = _offsets(local, F.count("*"))
    return local.join(F.broadcast(offsets), "__pid").select(
        *out_cols,
        (F.col("__off") + F.col("__lr")).cast("bigint").alias(rank_alias),
    )


def cumsum_total_order(
    df: DataFrame,
    order_cols: list,
    value_col: str,
    alias: str,
    inclusive: bool = False,
) -> DataFrame:
    """Running sum of ``value_col`` over a total order (exclusive
    prefix by default — the "cumulative count of everything strictly
    before me" shape), range-partitioned: local prefix sums per
    partition + cumulative partition-total offsets.  Keeps every input
    column and appends ``alias``."""
    cols = df.columns
    part = _range_pinned(df, order_cols)
    hi = 0 if inclusive else -1
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, hi)
    )
    local = part.withColumn("__lc", F.sum(value_col).over(w_local))
    offsets = _offsets(part, F.sum(value_col))
    return local.join(F.broadcast(offsets), "__pid").select(
        *cols,
        (F.col("__off") + F.coalesce(F.col("__lc"), F.lit(0))).alias(alias),
    )
