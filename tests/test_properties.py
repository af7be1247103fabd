"""Property-based invariants (SURVEY.md §5.2.5) — hypothesis-generated
event streams checked against operator invariants, shuffle-order
independence included.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from isaac_kafka_streaming_spark.operators.aggregations import latest_per_key
from isaac_kafka_streaming_spark.operators.sessionize import sessionize
from isaac_kafka_streaming_spark.operators.thresholds import (
    ACHIEVEMENT_THRESHOLDS,
    threshold_crossings,
)

BASE = dt.datetime(2024, 1, 1)

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),  # user_id
        st.integers(min_value=0, max_value=10_000_000),  # offset seconds
    ),
    min_size=1,
    max_size=60,
)

_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, pairs):
    rows = [
        (uid, i, BASE + dt.timedelta(seconds=off))
        for i, (uid, off) in enumerate(pairs)
    ]
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp"
    )


@given(pairs=events_strategy)
@_settings
def test_session_count_equals_gaps_plus_one(spark, pairs):
    """Per user: #sessions == 1 + #gaps strictly greater than the
    threshold in the time-sorted event sequence."""
    gap = 3600
    df = _df(spark, pairs)
    got = {
        r.user_id: r.n
        for r in sessionize(df, gap_seconds=gap)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    by_user: dict[int, list[dt.datetime]] = {}
    for uid, off in pairs:
        by_user.setdefault(uid, []).append(BASE + dt.timedelta(seconds=off))
    for uid, tss in by_user.items():
        tss.sort()
        gaps = sum(
            1
            for a, b in zip(tss, tss[1:])
            if (b - a).total_seconds() > gap
        )
        assert got[uid] == gaps + 1


@given(pairs=events_strategy)
@_settings
def test_sessions_partition_events(spark, pairs):
    """Session n_events sum to the input count per user."""
    df = _df(spark, pairs)
    out = (
        sessionize(df, gap_seconds=60)
        .groupBy("user_id")
        .agg(F.sum("n_events").alias("total"))
        .collect()
    )
    want = {}
    for uid, _ in pairs:
        want[uid] = want.get(uid, 0) + 1
    assert {r.user_id: r.total for r in out} == want


@given(pairs=events_strategy)
@_settings
def test_latest_per_key_is_max_ts(spark, pairs):
    df = _df(spark, pairs)
    got = {
        r.user_id: r.ts
        for r in latest_per_key(
            df, ["user_id"], "ts", tiebreak_col="event_id"
        ).collect()
    }
    want: dict[int, dt.datetime] = {}
    for uid, off in pairs:
        ts = BASE + dt.timedelta(seconds=off)
        if uid not in want or ts > want[uid]:
            want[uid] = ts
    assert got == want


@given(pairs=events_strategy)
@_settings
def test_threshold_crossings_match_counts(spark, pairs):
    """A user has exactly the crossings {t in thresholds : t <= n}."""
    df = _df(spark, pairs).withColumnRenamed("ts", "date_attempted")
    got: dict[int, set[int]] = {}
    for r in threshold_crossings(df).collect():
        got.setdefault(r.user_id, set()).add(r.threshold)
    counts: dict[int, int] = {}
    for uid, _ in pairs:
        counts[uid] = counts.get(uid, 0) + 1
    for uid, n in counts.items():
        want = {t for t in ACHIEVEMENT_THRESHOLDS if t <= n}
        assert got.get(uid, set()) == want


@given(pairs=events_strategy, seed=st.integers(0, 3))
@_settings
def test_shuffle_order_independence(spark, pairs, seed):
    """Repartitioning the input arbitrarily never changes sessionize."""
    df = _df(spark, pairs)
    shuffled = df.repartition(4, (F.col("event_id") * (seed + 7)) % 4)
    a = sorted(
        map(tuple, sessionize(df, gap_seconds=120).collect())
    )
    b = sorted(
        map(tuple, sessionize(shuffled, gap_seconds=120).collect())
    )
    assert a == b


@given(pairs=events_strategy)
@_settings
def test_last_seen_overall_is_row_max(spark, pairs):
    """O2: the OVERALL row equals the max over that user's per-type
    rows, for every user, under any input order."""
    from isaac_kafka_streaming_spark.operators.aggregations import last_seen

    df = _df(spark, pairs).withColumn(
        "event_type",
        F.when(F.col("event_id") % 3 == 0, "view")
        .when(F.col("event_id") % 3 == 1, "click")
        .otherwise("error"),
    )
    rows = last_seen(df, "user_id", "event_type", "ts").collect()
    per_type: dict[int, list] = {}
    overall: dict[int, dt.datetime] = {}
    for r in rows:
        if r.event_type == "OVERALL":
            overall[r.user_id] = r.last_seen
        else:
            per_type.setdefault(r.user_id, []).append(r.last_seen)
    assert set(per_type) == set(overall)
    for uid, tss in per_type.items():
        assert overall[uid] == max(tss)


@given(pairs=events_strategy)
@_settings
def test_minhash_identical_docs_always_candidates(spark, pairs):
    """Identical token sequences produce identical signatures, so every
    duplicated doc pair must surface with jaccard == 1."""
    from isaac_kafka_streaming_spark.extensions.dedup import (
        _minhash_signatures,
        _shingles,
        _tokens,
    )

    # two identical docs + one different, derived from generated ints
    words = " ".join(f"w{uid}x{off % 7}" for uid, off in pairs[:12])
    docs = spark.createDataFrame(
        [(1, words), (2, words), (3, words + " extra tail tokens here")],
        "doc_id long, text string",
    )
    shingled = docs.select(
        "doc_id", _shingles(_tokens(F.col("text")), 3).alias("shingles")
    )
    sigs = {
        r.doc_id: tuple(r[f"h{i}"] for i in range(64))
        for r in _minhash_signatures(shingled, 64).collect()
    }
    if 1 in sigs:  # docs with <3 tokens have no shingles/signature
        assert sigs[1] == sigs[2]


joinable_strategy = st.tuples(
    st.lists(  # left probes: (user, offset)
        st.tuples(
            st.integers(min_value=1, max_value=4),
            st.integers(min_value=0, max_value=100_000),
        ),
        min_size=1,
        max_size=30,
    ),
    st.lists(  # right anchors: (user, offset, value)
        st.tuples(
            st.integers(min_value=1, max_value=4),
            st.integers(min_value=0, max_value=100_000),
            st.floats(min_value=-100, max_value=100, allow_nan=False),
        ),
        min_size=1,
        max_size=30,
    ),
)


@given(data=joinable_strategy)
@_settings
def test_asof_join_equals_naive_argmax(spark, data):
    """asof_join == per-left-row argmax over right rows with
    right_ts <= left_ts (same key), on arbitrary generated streams —
    including duplicate timestamps on both sides."""
    from isaac_kafka_streaming_spark.operators.joins import asof_join

    lpairs, rpairs = data
    left = spark.createDataFrame(
        [
            (i, uid, BASE + dt.timedelta(seconds=off))
            for i, (uid, off) in enumerate(lpairs)
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (uid, BASE + dt.timedelta(seconds=off), v)
            for uid, off, v in rpairs
        ],
        "user_id long, ts timestamp, value double",
    )
    got = {
        r.event_id: (r.asof_ts, r.asof_value)
        for r in asof_join(
            left, right, on="user_id", value_cols=["ts", "value"]
        ).collect()
    }
    # naive reference: python argmax with the SAME deterministic
    # tiebreak (max value among equal (key, ts) right rows)
    best = {}
    for uid, off, v in rpairs:
        ts = BASE + dt.timedelta(seconds=off)
        cur = best.get((uid, ts))
        best[(uid, ts)] = v if cur is None else max(cur, v)
    want = {}
    for i, (uid, off) in enumerate(lpairs):
        lts = BASE + dt.timedelta(seconds=off)
        cands = [
            (ts, v) for (u, ts), v in best.items() if u == uid and ts <= lts
        ]
        want[i] = max(cands) if cands else (None, None)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k], (k, got[k], want[k])


@given(data=joinable_strategy)
@_settings
def test_interval_join_equals_naive_inequality(spark, data):
    """Banded rewrite == naive inequality join on arbitrary generated
    streams (band boundaries land wherever hypothesis puts them)."""
    from isaac_kafka_streaming_spark.operators.joins import interval_join

    lpairs, rpairs = data
    band = 7200
    left = spark.createDataFrame(
        [
            (i, uid, BASE + dt.timedelta(seconds=off))
            for i, (uid, off) in enumerate(lpairs)
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (j, uid, BASE + dt.timedelta(seconds=off))
            for j, (uid, off, _) in enumerate(rpairs)
        ],
        "iv_id long, user_id long, start timestamp",
    )
    got = sorted(
        (r.event_id, r.iv_id)
        for r in interval_join(
            left, right, on="user_id", left_ts="ts",
            right_start="start", band_seconds=band,
        ).collect()
    )
    naive = sorted(
        (r.event_id, r.iv_id)
        for r in left.join(right, "user_id")
        .filter(
            (F.col("ts") >= F.col("start"))
            & (F.col("ts") < F.col("start") + F.expr(f"INTERVAL {band} SECOND"))
        )
        .collect()
    )
    assert got == naive


values_strategy = st.lists(
    st.floats(
        min_value=-1e6,
        max_value=1e6,
        allow_nan=False,
        allow_infinity=False,
        width=64,
    ),
    min_size=2,
    max_size=80,
)


@given(values=values_strategy)
@_settings
def test_histogram_quantile_within_one_bin_of_order_statistic(spark, values):
    """Round-7-staged histogram estimator — the PROVABLE guarantee, on
    ANY value distribution: the selected bin contains the ceil(q*n)-th
    order statistic (cum_before < q*n <= cum), and the interpolated
    estimate stays inside that bin, so |est - x_(ceil(q*n))| <= one
    bin width.  (Distance to the *interpolated* percentile is NOT
    bounded by bins alone — with tiny n the interpolation spans
    inter-sample gaps, which is why the exact percentiles ride along
    in the operator's output.)"""
    import math

    from isaac_kafka_streaming_spark.queries import (
        histogram_quantile_estimates,
    )

    df = spark.createDataFrame(
        [("t", float(v)) for v in values], "event_type string, value double"
    )
    (row,) = histogram_quantile_estimates(df).collect()
    width = (max(values) - min(values)) / 64.0
    ordered = sorted(values)
    n = len(values)
    for q, est in ((0.5, row.hist_p50), (0.95, row.hist_p95)):
        stat = ordered[math.ceil(q * n) - 1]
        # + 5e-5: the operator rounds its output to 4 decimals
        assert abs(est - stat) <= width + 5.1e-5, (
            values, q, est, stat, width,
        )


# -- streaming funnel state machine (no SparkSession needed) ---------------

funnel_events_strategy = st.lists(
    st.tuples(
        st.sampled_from(["signup", "view", "click", "purchase", "error"]),
        st.integers(min_value=0, max_value=4 * 86400),  # offset seconds
    ),
    min_size=0,
    max_size=40,
)


class _FakeGroupState:
    """Minimal GroupState double: exists/get/update — enough to drive
    funnel_state_stream's process function without a StreamingQuery."""

    def __init__(self):
        self._val = None

    @property
    def exists(self):
        return self._val is not None

    @property
    def get(self):
        return self._val

    def update(self, v):
        self._val = tuple(v)


def _batch_funnel_reference(events):
    """Brute-force earliest chain: t1 = min signup ts; t{i} = min
    step-i ts in (t{i-1}, t{i-1} + 1 day] — the batch funnel's exact
    per-user semantics, in plain Python."""
    steps = ("signup", "view", "click", "purchase")
    window = dt.timedelta(days=1)
    t = [None] * 4
    for i, s in enumerate(steps):
        cands = [
            ts
            for et, ts in events
            if et == s
            and (
                i == 0
                or (
                    t[i - 1] is not None
                    and t[i - 1] < ts <= t[i - 1] + window
                )
            )
        ]
        t[i] = min(cands) if cands else None
        if t[i] is None:
            break
    return tuple(t)


@given(funnel_events_strategy, st.lists(st.integers(0, 39), max_size=4))
@_settings
def test_funnel_state_machine_equals_reference_chain(events, cut_points):
    """Cross-batch exactness of the T7 funnel state machine: ANY
    in-order split of ANY event sequence through process() yields
    exactly the brute-force batch chain — batching can never change
    the funnel.  (The Spark-level twin pins the wiring; this pins the
    state transition itself over thousands of generated sequences.)"""
    import pandas as pd

    from isaac_kafka_streaming_spark.streaming.state import funnel_process

    timed = sorted(
        (dt.datetime(2024, 1, 1) + dt.timedelta(seconds=off), et)
        for et, off in events
    )
    # split into in-order batches at the (sorted, deduped) cut points
    cuts = sorted({c for c in cut_points if c < len(timed)})
    batches, prev = [], 0
    for c in cuts + [len(timed)]:
        if c > prev:
            batches.append(timed[prev:c])
            prev = c

    state = _FakeGroupState()
    process = funnel_process()
    last = None
    for batch in batches:
        pdf = pd.DataFrame(
            {
                "ts": [pd.Timestamp(ts) for ts, _ in batch],
                "event_type": [et for _, et in batch],
            }
        )
        (last,) = list(process((7,), iter([pdf]), state))
    want = _batch_funnel_reference([(et, ts) for ts, et in timed])
    if last is None:
        assert all(v is None for v in want)
        return
    got = tuple(
        None if pd.isna(last[f"t{i}"].iloc[0])
        else last[f"t{i}"].iloc[0].to_pydatetime()
        for i in range(1, 5)
    )
    assert got == want
    assert last["step_reached"].iloc[0] == sum(v is not None for v in want)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**6),
            st.integers(min_value=1, max_value=10**4),
            st.floats(
                min_value=1e-6,
                max_value=1e12,
                allow_nan=False,
                allow_infinity=False,
            ),
        ),
        max_size=60,
        # doc_id is a key: duplicate ids with equal priorities would
        # make the (q, doc_id) tie-break genuinely ambiguous, which no
        # real corpus exhibits
        unique_by=lambda r: r[0],
    ),
    st.integers(min_value=0, max_value=20),
    st.integers(min_value=0, max_value=60),
)
def test_priority_reservoir_merge_is_order_independent(rows, k, cut):
    """streaming.state._reservoir_merge is associative/commutative:
    folding any prefix first, then merging the rest, equals one merge
    over everything — the algebraic fact that makes the streaming
    priority reservoir's fixed point equal the batch top-(k+1) under
    ANY arrival order / micro-batch split."""
    from isaac_kafka_streaming_spark.streaming.state import _reservoir_merge

    cut = min(cut, len(rows))
    incremental = _reservoir_merge(
        _reservoir_merge(list(rows[:cut]), k) + list(rows[cut:]), k
    )
    oneshot = _reservoir_merge(list(rows), k)
    assert incremental == oneshot
    reversed_fold = _reservoir_merge(
        _reservoir_merge(list(rows[cut:]), k) + list(rows[:cut]), k
    )
    assert reversed_fold == oneshot


@given(
    st.lists(st.integers(min_value=0, max_value=400), max_size=80),
    st.integers(min_value=1, max_value=256),
)
def test_ffd_pack_laws(sizes, ctx):
    """packing._ffd_pack over any size multiset: every doc in exactly
    one bin, no non-oversize bin over capacity, oversize docs isolated
    in solo bins, fills consistent, and the any-fit guarantee — at
    most one non-oversize bin at most half full, hence
    bins <= max(2*ceil(tokens/ctx), 1)."""
    import math

    from isaac_kafka_streaming_spark.extensions.packing import _ffd_pack

    sizes = sorted(sizes, reverse=True)  # the wrapper's FFD order
    bins, oversize, fills = _ffd_pack(sizes, ctx)
    assert len(bins) == len(oversize) == len(sizes)
    by_bin = {}
    for i, b in enumerate(bins):
        by_bin.setdefault(b, []).append(i)
    for b, members in by_bin.items():
        tok = sum(sizes[i] for i in members)
        assert fills[b] == tok
        if any(oversize[i] for i in members):
            assert len(members) == 1
            assert sizes[members[0]] > ctx
        else:
            assert tok <= ctx
    normal_bins = [
        b for b in by_bin
        if not any(oversize[i] for i in by_bin[b])
    ]
    # any-fit: two bins both <= ctx/2 full cannot coexist (the second's
    # contents would have fit the first)
    light = [b for b in normal_bins if 2 * fills[b] <= ctx]
    assert len(light) <= 1 or all(fills[b] == 0 for b in light), (
        fills, light,
    )
    tokens = sum(s for s in sizes if s <= ctx)
    if tokens:
        lo = math.ceil(tokens / ctx)
        assert lo <= len(normal_bins) <= max(2 * lo, 1)


transition_events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),  # page id (small: repeats)
        st.integers(min_value=0, max_value=10**6),  # ts offset seconds
    ),
    max_size=40,
)


@given(transition_events_strategy, st.lists(st.integers(0, 39), max_size=4))
@_settings
def test_page_transition_machine_is_batch_split_invariant(events, cut_points):
    """Cross-batch exactness of the page-transition state machine: ANY
    in-order split of ANY page-visit sequence through process() yields
    exactly the batch lag-window edge counts — consecutive DISTINCT
    pages paired once each, same-page repeats silent, pairs spanning
    batch boundaries counted via the carried last-page state."""
    import pandas as pd

    from isaac_kafka_streaming_spark.streaming.state import (
        page_transition_process,
    )

    # event_id breaks ts ties, exactly like the batch window's order
    timed = sorted(
        (dt.datetime(2024, 1, 1) + dt.timedelta(seconds=off), i, k)
        for i, (k, off) in enumerate(events)
    )
    cuts = sorted({c for c in cut_points if c < len(timed)})
    batches, prev = [], 0
    for c in cuts + [len(timed)]:
        if c > prev:
            batches.append(timed[prev:c])
            prev = c

    state = _FakeGroupState()
    process = page_transition_process()
    got: dict = {}
    for batch in batches:
        pdf = pd.DataFrame(
            {
                "ts": [pd.Timestamp(ts) for ts, _, _ in batch],
                "event_id": [eid for _, eid, _ in batch],
                "k": [k for _, _, k in batch],
            }
        )
        for out in process((7,), iter([pdf]), state):
            for s, d, n in zip(out["src"], out["dst"], out["n"]):
                got[(int(s), int(d))] = got.get((int(s), int(d)), 0) + int(n)

    want: dict = {}
    seq = [k for _, _, k in timed]
    for a, b in zip(seq, seq[1:]):
        if a != b:
            want[(a, b)] = want.get((a, b), 0) + 1
    assert got == want


graph_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),  # src
        st.integers(min_value=0, max_value=6),  # dst
        st.integers(min_value=1, max_value=9),  # weight
    ),
    max_size=25,
)


@given(graph_strategy, st.lists(st.integers(0, 6), max_size=3))
@_settings
def test_pagerank_core_equals_python_replay_on_generated_graphs(
    spark, raw_edges, extra_nodes
):
    """pagerank_from_graph on ARBITRARY generated graphs — self-loops
    dropped, parallel edges summed, isolated/dangling nodes included —
    equals the plain-Python replay of the spec bit-for-bit.  Covers
    the degenerate shapes the event-log tests can't reach: all-dangling
    graphs (empty edge list), single nodes, fully disconnected sets."""
    from isaac_kafka_streaming_spark.extensions.graph import (
        PAGERANK_DAMPING,
        PAGERANK_ITERS,
        pagerank_from_graph,
    )

    edges: dict = {}
    for s_, d_, w_ in raw_edges:
        if s_ != d_:
            edges[(s_, d_)] = edges.get((s_, d_), 0) + w_
    nodes = sorted(
        {v for e in edges for v in e} | set(extra_nodes) | {0}
    )
    n = len(nodes)
    nodes_df = spark.createDataFrame(
        [(v,) for v in nodes], "page_id long"
    )
    if edges:
        edges_df = spark.createDataFrame(
            [(s_, d_, float(w_)) for (s_, d_), w_ in edges.items()],
            "src long, dst long, w double",
        )
    else:
        edges_df = spark.createDataFrame(
            [], "src long, dst long, w double"
        )
    got = {
        r.page_id: (r.pagerank, r.rank)
        for r in pagerank_from_graph(nodes_df, edges_df).collect()
    }

    # Spark's F.round is BigDecimal.valueOf(double) HALF_UP — i.e.
    # HALF_UP on the double's SHORTEST decimal representation (repr).
    # Python's round() is half-even on the exact binary value and
    # diverges on ...5 boundaries (hypothesis found one: a 5-node
    # graph whose node-1 rank is exactly 0.2368475 at 7 significant
    # digits — Spark publishes 0.236848, round() gives 0.236847).
    # The replay must round the way the engine under test rounds.
    from decimal import ROUND_HALF_UP, Decimal

    def spark_round(x: float, scale: int) -> float:
        return float(
            Decimal(repr(x)).quantize(
                Decimal(1).scaleb(-scale), rounding=ROUND_HALF_UP
            )
        )

    outw: dict = {}
    for (s_, _), w_ in edges.items():
        outw[s_] = outw.get(s_, 0.0) + w_
    pr = {v: spark_round(1.0 / n, 12) for v in nodes}
    d = PAGERANK_DAMPING
    for _ in range(PAGERANK_ITERS):
        dang = sum(pr[v] for v in nodes if v not in outw)
        contrib = {v: 0.0 for v in nodes}
        for (s_, d_), w_ in edges.items():
            contrib[d_] += pr[s_] * w_ / outw[s_]
        pr = {
            v: spark_round(
                (1.0 - d) / n + d * (contrib[v] + dang / n), 12
            )
            for v in nodes
        }
    expect = {v: spark_round(pr[v], 6) for v in nodes}
    order = sorted(nodes, key=lambda v: (-expect[v], v))
    ranks = {v: i + 1 for i, v in enumerate(order)}
    assert got == {v: (expect[v], ranks[v]) for v in nodes}


graph_events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),  # user_id
        st.integers(min_value=0, max_value=260_000),  # offset seconds (~3 days)
        st.integers(min_value=1, max_value=4),  # page id k
    ),
    min_size=0,
    max_size=40,
)


@given(triples=graph_events_strategy)
@_settings
def test_transition_edges_split_matches_python_replay(spark, triples):
    """transition_edges_from_events, plain AND split, against an exact
    plain-Python replay on generated timelines: the split variant must
    equal the replay that cuts each user's ordered sequence at every
    bucket boundary — i.e. the undercount is EXACTLY the boundary-
    straddling transitions, not merely bounded by them."""
    from isaac_kafka_streaming_spark.extensions.graph import (
        transition_edges_from_events,
    )

    epoch = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows = [
        (uid, i, epoch + dt.timedelta(seconds=off), k)
        for i, (uid, off, k) in enumerate(triples)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, k long"
    )
    gap_days = 1
    bucket_us = gap_days * 86_400_000_000

    def replay(split):
        by_user = {}
        for uid, eid, ts, k in rows:
            by_user.setdefault(uid, []).append((ts, eid, k))
        edges = {}
        for seq in by_user.values():
            seq.sort()
            for (ts_a, _ea, ka), (ts_b, _eb, kb) in zip(seq, seq[1:]):
                if split:
                    us_a = int(
                        (ts_a - epoch).total_seconds() * 1_000_000
                    ) + int(epoch.timestamp() * 1_000_000)
                    us_b = int(
                        (ts_b - epoch).total_seconds() * 1_000_000
                    ) + int(epoch.timestamp() * 1_000_000)
                    if us_a // bucket_us != us_b // bucket_us:
                        continue  # the boundary-straddling transition
                if ka != kb:
                    edges[(ka, kb)] = edges.get((ka, kb), 0) + 1
        return edges

    for split_gap in (None, gap_days):
        got = {
            (r.src, r.dst): int(r.w)
            for r in transition_edges_from_events(
                df, split_gap_days=split_gap
            ).collect()
        }
        assert got == replay(split_gap is not None), f"split={split_gap}"


warc_text_strategy = st.lists(
    st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs",),  # no lone surrogates (utf-8)
        ),
        max_size=120,
    ),
    min_size=1,
    max_size=12,
)


@given(warc_text_strategy)
@_settings
def test_warc_shard_roundtrip_arbitrary_text(spark, texts):
    """WARC pack -> explode is the identity on ARBITRARY document
    text — control characters, CR/LF runs, blank lines, literal
    'WARC/1.0' headers, full unicode — because blocks are
    Content-Length-delimited, never sentinel-scanned.  Content-Length
    must equal the utf-8 byte length and per-shard rec_no spaces must
    stay dense and doc_id-ordered."""
    from isaac_kafka_streaming_spark.extensions import multimodal as mm

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    out = mm.explode_warc_shards(
        mm.documents_as_warc_shards(docs)
    ).collect()
    assert len(out) == len(texts)
    got = {}
    by_shard = {}
    for r in out:
        doc_id = int(r.record_id.split(":")[-1].rstrip(">"))
        got[doc_id] = r.text
        assert r.content_length == len(r.text.encode("utf-8"))
        assert r.shard_id == doc_id // 8
        by_shard.setdefault(r.shard_id, []).append((r.rec_no, doc_id))
    assert got == {i: t for i, t in enumerate(texts)}
    for recs in by_shard.values():
        recs.sort()
        assert [n for n, _ in recs] == list(range(len(recs)))
        assert [d for _, d in recs] == sorted(d for _, d in recs)


edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=40),
        st.integers(min_value=0, max_value=40),
    ),
    min_size=0,
    max_size=80,
)


@given(pairs=edges_strategy)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_star_cc_matches_union_find(spark, pairs):
    """connected_components_star (the round-15 window-min stars)
    against a plain union-find with component id = min reachable node
    — arbitrary random multigraphs with self-loops and duplicate
    edges, the shapes the graded page graph never guarantees to
    cover."""
    from isaac_kafka_streaming_spark.extensions.dedup import (
        connected_components_star,
    )

    schema = "doc_a long, doc_b long"
    df = (
        spark.createDataFrame(pairs, schema)
        if pairs
        else spark.createDataFrame([], schema)
    )
    got = sorted(
        (r.node, r.comp) for r in connected_components_star(df).collect()
    )

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nodes = set()
    for a, b in pairs:
        if a == b:
            continue
        nodes.add(a)
        nodes.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = sorted((n, find(n)) for n in nodes)
    assert got == want
