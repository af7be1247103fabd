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
from pyspark.sql import types as T

#: Helper columns the two primitives inject.  Callers must not already
#: use these names — a silent clobber would produce wrong ranks/sums,
#: so both entry points check and raise instead (module contract:
#: preconditions are CHECKED, not assumed).
_HELPER_COLS = ("__mid", "__pid", "__lr", "__lc", "__off", "__n")


def _assert_no_helper_collision(df: DataFrame, fn: str) -> None:
    clash = [c for c in df.columns if c in _HELPER_COLS]
    if clash:
        raise ValueError(
            f"{fn}: input columns {clash} collide with internal helper "
            f"columns {_HELPER_COLS}; rename them before calling"
        )


def _offsets(part: DataFrame, agg_col, total_alias: str | None = None
             ) -> DataFrame:
    """Per-partition exclusive prefix of ``agg_col`` over the (tiny)
    partition-summary frame — the one deliberate single-partition sort,
    keyed on __pid.  With ``total_alias``, also carry the grand total
    (an unbounded window over the same #shuffle-partitions rows — free
    relative to a separate full-frame aggregate)."""
    w_off = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    out = (
        part.groupBy("__pid")
        .agg(agg_col.alias("__n"))
        .withColumn("__off", F.coalesce(F.sum("__n").over(w_off), F.lit(0)))
    )
    if total_alias is None:
        return out.select("__pid", "__off")
    w_all = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return out.withColumn(
        total_alias, F.sum("__n").over(w_all)
    ).select("__pid", "__off", total_alias)


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
    _assert_no_helper_collision(df, "ranked_total_order")
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
    total_alias: str | None = None,
) -> DataFrame:
    """Running sum of ``value_col`` over a total order (exclusive
    prefix by default — the "cumulative count of everything strictly
    before me" shape), range-partitioned: local prefix sums per
    partition + cumulative partition-total offsets.  Keeps every input
    column and appends ``alias``.

    The local prefix sum comes from ONE Arrow pass over each
    already-sorted range partition (numpy cumsum per batch + a scalar
    carry across batches) — NOT a ``Window.partitionBy("__pid")``,
    which would plan an Exchange hashpartitioning(__pid) and re-shuffle
    the whole frame the range exchange just clustered (the round-11
    shape this rewrite sheds, mirroring ranked_total_order).  MapInPandas
    preserves partitioning and the checkpoint-pinned row order, so the
    scan is deterministic; it is also the module's one declared Python
    boundary — batched, vectorized, linear, zero shuffle.  NULL values
    contribute 0 to the running sum (the window-sum null-skipping
    semantics the previous implementation had via coalesce).

    ``total_alias``: also append the GRAND total of ``value_col`` as a
    constant column.  The share-of-total shape (cumulative < fraction
    x total) otherwise needs a separate ``df.agg(sum)`` — one more
    broadcast-build job re-reading the frame; here the total rides the
    partition-summary frame the offsets window already aggregates, so
    it costs nothing (measured: one full job removed from
    vocab_coverage)."""
    _assert_no_helper_collision(df, "cumsum_total_order")
    cols = df.columns
    if total_alias is not None and (
        total_alias in cols
        or total_alias in _HELPER_COLS
        or total_alias == alias
    ):
        raise ValueError(
            f"cumsum_total_order: total_alias {total_alias!r} collides "
            "with an input/helper/alias column"
        )
    part = (
        df.repartitionByRange(*order_cols)
        .sortWithinPartitions(*order_cols)
        .localCheckpoint()
    )
    local = part.withColumn(
        "__pid",
        F.shiftright(F.monotonically_increasing_id(), 33).cast("int"),
    )
    # sum() widens the value type exactly as the window form did
    # (int*→long, float*→double, decimal→widened decimal)
    sum_type = part.select(F.sum(value_col).alias("__lc")).schema[0].dataType
    scan_schema = T.StructType(
        local.schema.fields + [T.StructField("__lc", sum_type, True)]
    )
    want_float = isinstance(sum_type, (T.DoubleType, T.FloatType))

    def _scan(batches):
        carry = 0.0 if want_float else 0
        for pdf in batches:
            v = pdf[value_col].fillna(0).to_numpy()
            if not want_float:
                v = v.astype("int64", copy=False)
            run = v.cumsum()
            pdf = pdf.assign(__lc=carry + (run if inclusive else run - v))
            carry += run[-1] if len(run) else 0
            yield pdf

    scanned = local.mapInPandas(_scan, schema=scan_schema)
    offsets = _offsets(local, F.sum(value_col), total_alias)
    out = [*cols, (F.col("__off") + F.col("__lc")).alias(alias)]
    if total_alias is not None:
        out.append(F.col(total_alias))
    return scanned.join(F.broadcast(offsets), "__pid").select(*out)
