"""T8 — achievement threshold crossings (ThresholdAchievedProcessor.java:49-111).

Reference semantics: when a user's counted measure *reaches* a threshold
in ACHIEVEMENT_THRESHOLDS (config.properties:17), emit exactly one
achievement row with the timestamp of the attempt that crossed it.

Batch form: rank each user's qualifying events by time; the n-th event
IS the moment count==n, so achievements are simply the rows whose rank
is in the threshold set — no join against a threshold table, no dedup
pass, one shuffle on user_id.  The streaming form (exact old-vs-new
count state machine) lives in streaming/state.py.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# config/config.properties:17 in the reference
ACHIEVEMENT_THRESHOLDS: tuple[int, ...] = (1, 5, 10, 20, 30, 50, 75, 100)


def threshold_crossings(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "date_attempted",
    tiebreak_col: str = "event_id",
    thresholds: Sequence[int] = ACHIEVEMENT_THRESHOLDS,
    achievement_id: str = "QUESTIONS_ANSWERED_CORRECTLY",
) -> DataFrame:
    """One row per (user, threshold) the user has reached.

    Output: (user_id, achievement_id, threshold, achieved_at) — the
    user_achievements sink shape (ThresholdAchievedProcessor.java:80-88).
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(tiebreak_col))
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank").isin(*thresholds))
        .select(
            F.col(user_col),
            F.lit(achievement_id).alias("achievement_id"),
            F.col("__rank").cast("bigint").alias("threshold"),
            F.col(ts_col).alias("achieved_at"),
        )
    )
