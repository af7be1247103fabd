"""Scalar function layer — the reference's F1-F16 surface (SURVEY.md §2.9).

Thin Column helpers over pyspark.sql.functions; everything stays
JVM-side / whole-stage-codegen.  The reference's Jackson `.path()`
missing-field semantics (absent -> ""/0/false, never null) are
reproduced by `json_*` helpers with explicit zero-defaults.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def json_str(col: Column | str, path: str, default: str = "") -> Column:
    """F1/F2 — JSON string field with the reference's ''-default
    (Jackson .path().asText(), e.g. DerivedStreams.java:57)."""
    return F.coalesce(F.get_json_object(F.col(col) if isinstance(col, str) else col, path), F.lit(default))


def json_long(col: Column | str, path: str, default: int = 0) -> Column:
    """F1/F2 — JSON long field with 0-default (.path().asLong())."""
    c = F.get_json_object(F.col(col) if isinstance(col, str) else col, path)
    return F.coalesce(c.cast("bigint"), F.lit(default))


def json_bool(col: Column | str, path: str) -> Column:
    """F1/F2 — JSON boolean field with false-default (.path().asBoolean(),
    LoggedEventsListener.java:83)."""
    c = F.get_json_object(F.col(col) if isinstance(col, str) else col, path)
    return F.coalesce(c.cast("boolean"), F.lit(False))


def before(col: Column | str, delim: str) -> Column:
    """F4 — substring before first delimiter (DerivedStreams.java:147:
    question page id = part of questionId before '|')."""
    return F.substring_index(F.col(col) if isinstance(col, str) else col, delim, 1)


def after(col: Column | str, delim: str) -> Column:
    """F4 — substring after the FIRST delimiter (DerivedStreams.java:172-177
    splits questionId on '|' and takes everything past the first one).

    Not substring_index(col, delim, -1): that returns the part after the
    LAST delimiter, which diverges on values containing the delimiter
    more than once.  locate()-based instead, with the reference's exact
    corner case: Java's indexOf returns -1 when absent, so
    substring(indexOf+1) = substring(0) = the WHOLE string."""
    c = F.col(col) if isinstance(col, str) else col
    pos = F.locate(delim, c)
    return F.when(pos > 0, c.substr(pos + len(delim), F.length(c))).otherwise(c)


def composite_key(*cols: Column | str, sep: str = "-") -> Column:
    """F5 — the reference's '{userId}-{questionPageId}' composite re-key
    (DerivedStreams.java:147).  In relational form keys are just column
    sets; this exists for byte-compat output shaping."""
    return F.concat_ws(sep, *[F.lower(F.col(c)) if isinstance(c, str) else F.lower(c) for c in cols])


def ms_to_ts(col: Column | str) -> Column:
    """F7 — epoch-millis payload time -> timestamp
    (LoggedEventsListener.java:151)."""
    return F.timestamp_millis(F.col(col) if isinstance(col, str) else col)


def day_bucket(col: Column | str) -> Column:
    """F8 — truncate to event-time day midnight (TIMESTAMP-typed, under
    the pinned UTC session timezone)."""
    return F.date_trunc("day", F.col(col) if isinstance(col, str) else col)


def null_to_empty(col: Column | str) -> Column:
    """F10 — NullHandler: null -> '' (KafkaLoader.java:132-135)."""
    return F.coalesce((F.col(col) if isinstance(col, str) else col).cast("string"), F.lit(""))
