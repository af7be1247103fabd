"""T8 — exact threshold-*crossing* emission as a custom stateful operator.

The reference's ThresholdAchievedProcessor (ThresholdAchievedProcessor.
java:49-111) consumes a per-user running count and inserts one
achievement row the moment the count reaches each threshold.  The batch
form (operators.thresholds) recovers crossings from event ranks; this
streaming form is the faithful state machine: per-user state holds the
count so far, each micro-batch advances it and emits exactly the
thresholds crossed by that batch's increments — exactly once per
(user, threshold) across the stream's lifetime.

applyInPandasWithState is the Spark-idiomatic Processor-API equivalent
(SURVEY.md §2.10 T7): init/process = the generator function, punctuate
is unused (empty in the reference too), state = GroupState.
"""

from __future__ import annotations

from typing import Iterator, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.thresholds import ACHIEVEMENT_THRESHOLDS

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("achievement_id", T.StringType()),
        T.StructField("threshold", T.LongType()),
        T.StructField("achieved_at", T.TimestampType()),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("count", T.LongType())])


def threshold_crossing_stream(
    qualifying: DataFrame,
    thresholds: Sequence[int] = ACHIEVEMENT_THRESHOLDS,
    achievement_id: str = "QUESTIONS_ANSWERED_CORRECTLY",
) -> DataFrame:
    """Emit one achievement row per (user, threshold) crossing.

    `qualifying` is the stream of events that increment the measure
    (e.g. correct question attempts) with columns
    (user_id, date_attempted).
    """
    thresholds_set = frozenset(int(t) for t in thresholds)

    def process(
        key: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        count = state.get[0] if state.exists else 0
        out_thresholds = []
        out_ts = []
        for pdf in pdfs:
            for ts in pdf["date_attempted"].sort_values():
                count += 1
                if count in thresholds_set:
                    out_thresholds.append(count)
                    out_ts.append(ts)
        state.update((count,))
        if out_thresholds:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(out_thresholds),
                    "achievement_id": [achievement_id] * len(out_thresholds),
                    "threshold": out_thresholds,
                    "achieved_at": out_ts,
                }
            )

    return (
        qualifying.select("user_id", "date_attempted")
        .groupBy("user_id")
        .applyInPandasWithState(
            process,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
