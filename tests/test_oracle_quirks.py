"""Engine-coercion quirk parity: Spark try_cast vs the guarded DuckDB
oracle cast, over ADVERSARIAL props.k payloads the generator never
emits.

Round-12 closure of the round-10 advice residual: DuckDB's bare
TRY_CAST coerces scientific notation ('1e3' -> 1000) and decimal
strings ('12.5' -> 13, rounds) that Spark's try_cast maps to NULL, so
props_k_stats / the graph family's k-parse agreed only because the
data generator stayed integer-only.  Every oracle now gates its cast
behind a ^\\s*[+-]?[0-9]+\\s*$ regex + regexp_extract; this suite runs
the REAL query callables and their REAL oracle SQL over a synthetic
events table stuffed with '1e3', '12.5', garbage, overflow and
whitespace keys and requires value-identical results — the same
compare the driver does.
"""

from __future__ import annotations

import json
import os

import duckdb
import pandas as pd
import pytest

ADVERSARIAL_KEYS = [
    "1e3",        # the round-10 residual: DuckDB 1000, Spark NULL
    "1E2",
    "12.5",       # DuckDB rounds to 13, Spark NULL
    "-0.5",
    "42",
    " 42 ",
    "\t7\n",
    "+7",
    "-3",
    "007",
    "",
    "abc",
    "0x1f",
    "1_000",
    "4 2",
    "99999999999999999999",  # overflows BIGINT on both engines
    "2147483648",            # overflows INT, fits BIGINT
    "-2147483648",
    "inf",
    "nan",
]


@pytest.fixture(scope="module")
def quirk_sf_dir(tmp_path_factory):
    """A minimal sf-dir whose events.parquet carries one event per
    adversarial key (plus a few NULL-props / no-k rows), shaped exactly
    like the generated table."""
    root = tmp_path_factory.mktemp("quirk_sf")
    n = len(ADVERSARIAL_KEYS)
    rows = {
        "event_id": list(range(1, n + 4)),
        "ts": pd.to_datetime(
            [1_700_000_000_000 + 1000 * i for i in range(n + 3)], unit="ms"
        ),
        # user_id 1..: none divisible by 10, so every row is a
        # registered (non-anonymous) event and reaches the parse
        "user_id": [1 + i % 9 for i in range(n + 3)],
        "event_type": ["view"] * (n + 3),
        "value": [float(i) for i in range(n + 3)],
        "props": [json.dumps({"k": k}) for k in ADVERSARIAL_KEYS]
        + [json.dumps({"other": 1}), None, json.dumps({"k": None})],
    }
    pd.DataFrame(rows).to_parquet(os.path.join(root, "events.parquet"))
    return str(root)


def _duck_con(sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    return con


def _normalized(pdf: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(pdf.columns)
    return (
        pdf[cols]
        .sort_values(cols)
        .reset_index(drop=True)
        .round(6)
    )


def test_props_k_stats_parity_on_adversarial_keys(spark, quirk_sf_dir):
    import __spark_entry__ as entry_mod

    got = _normalized(
        entry_mod.queries()["props_k_stats"](spark, quirk_sf_dir).toPandas()
    )
    want = _normalized(
        _duck_con(quirk_sf_dir)
        .execute(entry_mod.oracle_sql()["props_k_stats"])
        .fetchdf()
    )
    # the adversarial rows must actually exercise the quirk: exactly
    # the clean-integer keys land in buckets, everything else is the
    # NULL bucket on BOTH engines
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # 42/' 42 ' -> 2; +7/007/'\t7\n' -> 7; -3 -> -3; -2147483648 -> -8
    # (sign follows the dividend on both engines); 2147483648 overflows
    # INT -> NULL
    buckets = set(got["k_bucket"].dropna().astype(int))
    assert buckets == {2, 7, -3, -8}
    null_rows = got[got["k_bucket"].isna()]
    assert int(null_rows["n_events"].iloc[0]) >= len(
        [k for k in ADVERSARIAL_KEYS if k in ("1e3", "1E2", "12.5", "abc")]
    )


def test_graph_k_parse_parity_on_adversarial_keys(spark, quirk_sf_dir):
    """The graph family's BIGINT k-parse (its oracles share one guarded
    CTE shape): Spark's _page_events vs the same guarded SQL."""
    from isaac_kafka_streaming_spark.extensions.graph import _page_events

    got = _normalized(
        _page_events(spark, quirk_sf_dir).select("event_id", "k").toPandas()
    )
    want = _normalized(
        _duck_con(quirk_sf_dir)
        .execute(
            r"""
            SELECT event_id,
                   TRY_CAST(CASE WHEN regexp_matches(
                            json_extract_string(props, '$.k'),
                            '^\s*[+-]?[0-9]+\s*$')
                       THEN regexp_extract(
                            json_extract_string(props, '$.k'),
                            '[+-]?[0-9]+') END AS BIGINT) AS k
            FROM events
            WHERE TRY_CAST(CASE WHEN regexp_matches(
                            json_extract_string(props, '$.k'),
                            '^\s*[+-]?[0-9]+\s*$')
                       THEN regexp_extract(
                            json_extract_string(props, '$.k'),
                            '[+-]?[0-9]+') END AS BIGINT) IS NOT NULL
            """
        )
        .fetchdf()
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # scientific notation / decimals must NOT survive the parse
    assert set(want["k"]) == {42, 7, -3, 2147483648, -2147483648}
