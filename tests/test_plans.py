"""Physical-plan guards — the scale discipline, asserted.

These tests pin the plan properties that matter at 100 TB: filters
reach the parquet scan, projections prune the read schema, dimension
joins broadcast, aggregates partial-aggregate map-side, and no Python
row-at-a-time UDF appears in any relational hot path.  A regression
here can stay correct on 60k rows and still be a disaster at scale —
that's why they're tests, not review notes.
"""

from __future__ import annotations

import pytest

from isaac_kafka_streaming_spark.queries import all_queries

REGISTRY = all_queries()


def _executed_plan(spark, name: str, sf_dir: str) -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(spark, name: str, sf_dir: str) -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_q6_filters_pushed_to_scan(spark, sf_smoke):
    plan = _formatted(spark, "tpch_q6", sf_smoke)
    assert "PushedFilters:" in plan
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"


def test_q1_prunes_columns(spark, sf_smoke):
    plan = _formatted(spark, "tpch_q1", sf_smoke)
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    # 7 needed columns, and specifically not the join keys it never uses
    assert "l_orderkey" not in read and "l_partkey" not in read


def test_dimension_joins_broadcast(spark, sf_smoke):
    for name in ("daily_role_counts", "enriched_events", "question_completion"):
        plan = _executed_plan(spark, name, sf_smoke)
        assert "BroadcastHashJoin" in plan, f"{name} lost its broadcast join"
        assert "SortMergeJoin" not in plan, f"{name} fell back to sort-merge"


def test_aggregates_are_partial(spark, sf_smoke):
    """Two-phase hash aggregation: a partial HashAggregate must run
    before the exchange (map-side combine)."""
    plan = _executed_plan(spark, "event_type_counts", sf_smoke)
    first_agg = plan.index("HashAggregate")
    first_exchange = plan.index("Exchange")
    assert plan.count("HashAggregate") >= 2
    assert first_agg < first_exchange or plan.count("Exchange") == 0


def test_no_python_udf_in_relational_paths(spark, sf_smoke):
    """Reference-surface and SQL-checkable queries must stay JVM-side
    (BatchEvalPython/ArrowEvalPython = a Python worker in the plan)."""
    for name, qd in REGISTRY.items():
        if qd.sql is None:
            continue
        plan = _executed_plan(spark, name, sf_smoke)
        assert "EvalPython" not in plan, f"{name} has a Python UDF in plan"


def test_single_exchange_for_sessionize(spark, sf_smoke):
    """Gap-and-island: the two windows + final agg share one shuffle on
    user_id (plus AQE read nodes) — no repeated repartition."""
    plan = _executed_plan(spark, "user_streaks", sf_smoke)
    n_shuffles = plan.count("Exchange hashpartitioning")
    assert n_shuffles <= 1, f"sessionize shuffles {n_shuffles}x"


def test_q18_scans_lineitem_once(spark, sf_smoke):
    """The HAVING-subquery rewrite must not expand into two lineitem
    scans (qualifier + output sum are the same aggregate)."""
    plan = _formatted(spark, "tpch_q18", sf_smoke)
    scans = [
        l for l in plan.splitlines()
        if "lineitem.parquet" in l and "Location" in l
    ]
    assert len(scans) == 1, f"lineitem scanned {len(scans)}x"


def test_concat_chunk_single_exchange(spark, sf_smoke):
    """Packing is ONE shard-partitioned shuffle; chunk ids must stay
    pure projections (no global sort, no second exchange)."""
    plan = _executed_plan(spark, "concat_chunk_plan", sf_smoke)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "rangepartitioning" not in plan  # a global ORDER BY crept in


def test_sketch_summaries_partial_agg_no_expand(spark, sf_smoke):
    """HLL++/GK sketches must partial-aggregate map-side and never fall
    back to the distinct-Expand plan."""
    from isaac_kafka_streaming_spark.queries import _sketch_summaries

    plan = (
        _sketch_summaries(spark, sf_smoke)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" not in plan
    # executedPlan prints top-down: the partial (map-side) sketch agg
    # must sit BELOW the one exchange
    assert plan.index("partial_approx_count_distinct") > plan.index(
        "Exchange"
    )
    assert plan.count("Exchange") == 1


def test_curation_fuses_map_side_tiers(spark, sf_smoke):
    """corpus_curation must scan documents once for the three fused
    map-side flags plus once per repetition grain — never the 4+ scans
    of the naive per-tier join composition."""
    plan = _formatted(spark, "corpus_curation", sf_smoke)
    scans = [
        l for l in plan.splitlines()
        if "documents.parquet" in l and "Location" in l
    ]
    # 1 fused flags scan + repetition's 3 (doc base, token grain,
    # bigram grain); the naive per-tier join composition costs 6
    assert len(scans) <= 4, f"documents scanned {len(scans)}x:\n{plan}"


def test_quantize_has_no_shuffle(spark, sf_smoke):
    """int8 quantization is pure map-side: zero exchanges, zero Python."""
    plan = _executed_plan(spark, "embedding_quantize", sf_smoke)
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan


def test_incoming_dedup_partial_aggregates(spark, sf_smoke):
    """The existing-corpus hash index must collapse map-side (two-phase
    hash aggregation: partial + final) ahead of its single join, and
    stay a single-join plan."""
    plan = _executed_plan(spark, "dedup_incoming", sf_smoke)
    assert plan.count("HashAggregate") >= 2, plan
    assert plan.count("Join") == 1, plan


def test_session_transcripts_single_exchange(spark, sf_smoke):
    """Sequence assembly reuses ONE user_id shuffle for the gap flag,
    the running session sum, and the transcript aggregate."""
    plan = _executed_plan(spark, "session_transcripts", sf_smoke)
    n_shuffles = plan.count("Exchange hashpartitioning")
    assert n_shuffles <= 1, f"transcript assembly shuffles {n_shuffles}x"


def test_epoch_shuffle_single_exchange_no_global_sort(spark, sf_smoke):
    """The epoch permutation must be per-shard: exactly one hash
    exchange on shard, and no rangepartitioning (a global ORDER BY
    would serialize the corpus through one sort)."""
    plan = _executed_plan(spark, "epoch_shuffle", sf_smoke)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "rangepartitioning" not in plan
    assert "SinglePartition" not in plan  # no driver-bottleneck window


def test_bpe_pairs_partial_agg_jvm_side(spark, sf_smoke):
    """The BPE pair count must partial-aggregate map-side before its
    shuffle, and the pair construction (zip_with over slices) must stay
    JVM-side — no Python eval in the plan."""
    plan = _executed_plan(spark, "bpe_pair_counts", sf_smoke)
    assert "partial_count" in plan, plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_media_png_prunes_scan_no_exchange(spark, sf_smoke):
    """The real-decode path is two pipelined MapInPandas stages over a
    doc_id+text scan.  Blob bytes must never reach an exchange: the
    ONLY exchange allowed is the round-13 decode-spread — a hash
    repartition of the tiny (doc_id, text) projection BEFORE any blob
    exists (and none at all when the scan already provides the
    parallelism).  The parquet read schema must exclude every unused
    column."""
    plan = _formatted(spark, "media_png_features", sf_smoke)
    assert plan.count("MapInPandas") >= 2
    # formatted plans name each node once in the tree ("+- Exchange
    # (n)") and once in the details ("(n) Exchange") — count tree nodes
    n_exchanges = plan.count("Exchange (")
    assert n_exchanges <= 1, plan
    if n_exchanges:
        # the spread exchange carries only the pre-decode projection:
        # its child in the tree must be the scan itself (no blob
        # exists yet), never a MapInPandas output
        assert "hashpartitioning(doc_id" in plan, plan
        lines = plan.splitlines()
        (i,) = [k for k, l in enumerate(lines) if "Exchange (" in l]
        assert "Scan parquet" in lines[i + 1], (
            "blob bytes crossed a shuffle:\n" + plan
        )
    schema_line = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "text" in schema_line and "lang" not in schema_line


def test_knn_lsh_corpus_side_not_multiplied(spark, sf_smoke):
    """Multiprobe must stay query-side: the corpus explode feeds the
    join probe side once, and the join build side is the (broadcast)
    query bucket set."""
    from isaac_kafka_streaming_spark.extensions.similarity import knn_lsh

    plan = (
        knn_lsh(spark, sf_smoke)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan


def test_soft_dedup_single_exchange(spark, sf_smoke):
    """Soft dedup is ONE shuffle (group count over the normalized
    hash); the keep decision must stay a map-side projection."""
    plan = _executed_plan(spark, "soft_dedup_sample", sf_smoke)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "rangepartitioning" not in plan


def test_stratified_topk_single_exchange(spark, sf_smoke):
    """Exact-k per stratum: one shuffle on the stratum key, rank
    bounded per stratum — no global sort."""
    plan = _executed_plan(spark, "stratified_topk_sample", sf_smoke)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "rangepartitioning" not in plan
    assert "SinglePartition" not in plan


def test_q13_preserves_left_join(spark, sf_smoke):
    """The orderpriority filter must live in the join condition: a
    WHERE would turn the join inner and silently drop zero-order
    customers."""
    plan = _executed_plan(spark, "tpch_q13", sf_smoke)
    assert "LeftOuter" in plan, plan


def test_q15_scans_lineitem_once(spark, sf_smoke):
    """The max-of-aggregate selection must reuse ONE revenue aggregate
    for both the rows and the scalar max (window over the aggregate) —
    a self-join against rev.agg(max) would scan lineitem twice."""
    plan = _formatted(spark, "tpch_q15", sf_smoke)
    scans = [
        l for l in plan.splitlines()
        if "lineitem.parquet" in l and "Location" in l
    ]
    assert len(scans) == 1, f"lineitem scanned {len(scans)}x"


def test_decontaminate_all_equi_joins(spark, sf_smoke):
    """The naive form of substring decontamination is an all-pairs LIKE
    scan; the rarest-anchor design must keep every join an equi-join —
    a nested-loop or cartesian node here means the candidate generation
    degenerated to eval x train."""
    plan = _executed_plan(spark, "decontaminate_exact", sf_smoke)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dedup_semantic_broadcast_centroids_no_cartesian_pairs(spark, sf_smoke):
    """Centroid assignment broadcasts the tiny centroid side (the one
    legitimate nested-loop join); the within-cell pair join must stay a
    cell_id equi-join — a CartesianProduct means the quadratic escaped
    its cell bound."""
    plan = _executed_plan(spark, "dedup_semantic", sf_smoke)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the broadcast centroid pass


def test_prototype_prune_windows_stay_cell_partitioned(spark, sf_smoke):
    """D4's pruning half shares the broadcast centroid assignment (the
    one legitimate nested-loop); the per-cell rank/count must run as a
    cell_id-hash-partitioned window — rangepartitioning here would
    mean the rank degenerated to a global sort."""
    plan = _executed_plan(spark, "prototype_prune", sf_smoke)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the broadcast centroid pass
    assert "rangepartitioning" not in plan
    assert "hashpartitioning(cell_id" in plan


def test_staged_round7_ops_all_equi_joins(spark, sf_smoke):
    """The round-7-staged operators must already hold the scale
    discipline: no cartesian/nested-loop except broadcast 1-row
    scalars, no Python eval nodes."""
    from isaac_kafka_streaming_spark.extensions.dedup import (
        contained_documents,
    )
    from isaac_kafka_streaming_spark.extensions.text import bigram_perplexity

    for fn in (contained_documents, bigram_perplexity):
        df = fn(spark, sf_smoke)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, fn.__name__
        assert "EvalPython" not in plan, fn.__name__
    # bigram_perplexity's one nested-loop is the broadcast 1-row vocab
    # scalar; contained_documents must have none at all
    cd_plan = (
        contained_documents(spark, sf_smoke)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in cd_plan


def test_staged_tpch_broadcasts_and_pushdown(spark, sf_smoke):
    """Round-7-staged TPC-H shapes: dims stay broadcast, q19's
    part-only disjunct (brand IN ...) reaches the part scan, and no
    cartesian/Python nodes anywhere."""
    from isaac_kafka_streaming_spark.queries import (
        _tpch_q8,
        _tpch_q9,
        _tpch_q12,
        _tpch_q19,
    )

    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for fn in (_tpch_q8, _tpch_q9, _tpch_q12, _tpch_q19):
        df = fn(spark, sf_smoke)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__
        assert "EvalPython" not in plan, fn.__name__
    q19 = _tpch_q19(spark, sf_smoke)._jdf.queryExecution().explainString(mode)
    # Catalyst extracts each table's own disjunct from the OR-of-ANDs
    # and pushes both to their scans: the brand/size brackets to part,
    # the quantity brackets to lineitem
    assert "EqualTo(p_brand,Brand#12)" in q19, q19
    assert "LessThanOrEqual(l_quantity,11.0)" in q19, q19


def test_priority_sample_single_exchange(spark, sf_smoke):
    """Priority sampling is one shuffle on the stratum key — the rank
    and threshold windows reuse the same partitioning."""
    from isaac_kafka_streaming_spark.extensions.sampling import (
        priority_sample,
    )

    plan = (
        priority_sample(spark, sf_smoke)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "EvalPython" not in plan


def test_knn_pq_no_python_no_cartesian(spark, sf_smoke):
    """PQ training + encoding + ADC is all JVM-side; the only
    nested-loop joins are the broadcast codebook passes (64-row build
    sides), never corpus x corpus."""
    from isaac_kafka_streaming_spark.extensions.similarity import knn_pq

    plan = (
        knn_pq(spark, sf_smoke)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_cms_sketch_state_bounded_and_broadcast(spark, sf_smoke):
    """The CMS build aggregate partial-aggregates map-side (the whole
    point: shuffled state is <= d*w counters, not O(vocab)), the probe
    joins the tiny sketch via broadcast, and nothing drops to Python."""
    from isaac_kafka_streaming_spark.extensions.text import (
        cms_heavy_hitters,
    )

    plan = (
        cms_heavy_hitters(spark, sf_smoke)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_hll_witness_register_state_bounded(spark, sf_smoke):
    """The HLL build must partial-aggregate the register maxes map-side
    (shuffled state <= 64 rows per group — the mergeable fixed-size
    property), and stay JVM-side."""
    from isaac_kafka_streaming_spark.queries import _hll_distinct_md5

    plan = (
        _hll_distinct_md5(spark, sf_smoke)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_max" in plan, plan
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_vocab_coverage_shuffle_mode_drops_broadcast(spark, sf_smoke):
    """The 100 TB vocab_join knob must actually change the physical
    join: the default broadcast mode pins the vocab to executors, the
    "shuffle" mode must contain NO broadcast of the vocab side on the
    token-stream join (a vocabulary of millions of strings cannot be
    broadcast) — a sort-merge or shuffled-hash join instead."""
    from isaac_kafka_streaming_spark.extensions.text import vocab_coverage

    def plan(mode: str) -> str:
        df = vocab_coverage(spark, sf_smoke, vocab_join=mode)
        m = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        return df._jdf.queryExecution().explainString(m)

    default = plan("broadcast")
    assert "BroadcastHashJoin" in default
    shuffled = plan("shuffle")
    # the scalar `total` count still broadcasts (1 row); the VOCAB join
    # itself must not — so the shuffle plan needs a non-broadcast join
    # and strictly fewer broadcast joins than the default
    assert (
        "SortMergeJoin" in shuffled or "ShuffledHashJoin" in shuffled
    ), shuffled
    assert shuffled.count("BroadcastHashJoin") < default.count(
        "BroadcastHashJoin"
    )


def test_corpus_report_two_scans_no_doc_join(spark, sf_smoke):
    """The round-8 dejoin: keep_quality is an inline projection, not a
    doc_id self-join against text_quality — the card must cost exactly
    its two rollup branches (per_doc + by_hash), each one documents
    scan, joined per (lang, source) via broadcast."""
    plan = _formatted(spark, "corpus_report", sf_smoke)
    scans = [
        l for l in plan.splitlines()
        if "documents.parquet" in l and "Location" in l
    ]
    assert len(scans) == 2, f"documents scanned {len(scans)}x"
    assert "SortMergeJoin" not in plan


def test_length_bucket_single_scan_partial_agg(spark, sf_smoke):
    """The padding-waste card is one scan + a map-side bucket ladder +
    one tiny two-phase aggregate — no joins, no extra exchanges."""
    plan = _executed_plan(spark, "length_bucket_plan", sf_smoke)
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_nb_quality_two_scans_vocab_join_jvm(spark, sf_smoke):
    """The closed-form NB classifier costs exactly two corpus scans
    (the token explode feeding the cached tf histogram, and the cached
    narrow head frame), its only real join fan-in is the vocab-keyed
    weights join plus 1-row broadcast scalars — no cartesian blowup —
    and every aggregate is two-phase (map-side combinable)."""
    plan = _formatted(spark, "nb_quality_score", sf_smoke)
    scans = [
        l for l in plan.splitlines()
        if "documents.parquet" in l and "Location" in l
    ]
    assert len(scans) == 2, f"documents scanned {len(scans)}x"
    exe = _executed_plan(spark, "nb_quality_score", sf_smoke)
    assert "CartesianProduct" not in exe
    assert exe.count("HashAggregate") >= 2


def test_dsir_takeordered_broadcast_model_two_scans(spark, sf_smoke):
    """DSIR's selection must be TakeOrdered (per-partition heads merged
    on the driver — never a global Sort+Exchange), the <=B-row bucket
    model must ride a broadcast into the scoring join, and the whole
    pipeline costs two corpus scans (feature explode -> cached
    histogram, candidate frame)."""
    exe = _executed_plan(spark, "dsir_select", sf_smoke)
    assert "TakeOrdered" in exe, "global selection lost its top-k form"
    assert "BroadcastHashJoin" in exe, "bucket model join not broadcast"
    assert "CartesianProduct" not in exe
    plan = _formatted(spark, "dsir_select", sf_smoke)
    scans = [
        l for l in plan.splitlines()
        if "documents.parquet" in l and "Location" in l
    ]
    assert len(scans) == 2, f"documents scanned {len(scans)}x"


def test_budget_curve_no_global_sort_broadcast_thresholds(spark, sf_smoke):
    """selection_budget_curve's design claim: membership via a
    broadcast 10-row threshold join, NOT a corpus-wide NTILE/global
    sort (the anti-pattern at 100 TB).  No rangepartitioning anywhere;
    the non-equi threshold join is a BroadcastNestedLoopJoin; no
    Python eval nodes."""
    plan = _executed_plan(spark, "selection_budget_curve", sf_smoke)
    assert "rangepartitioning" not in plan.lower()
    assert "BroadcastNestedLoopJoin" in plan
    assert "EvalPython" not in plan


def test_pagerank_edge_pass_shapes(spark, sf_smoke):
    """pagerank_pages: the rank iteration runs over localCheckpoint-ed
    page-catalog-sized frames (they surface as in-memory scans, so the
    final plan holds NO corpus re-scan of events), the per-round
    contribution join is an equi-join (SortMergeJoin/Hash, never
    cartesian on the edge side), and no Python eval nodes appear."""
    for name in (
        "pagerank_pages", "pagerank_personalized", "label_propagation",
        "page_components",
    ):
        plan = _executed_plan(spark, name, sf_smoke)
        assert "EvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
        # the iteration consumes checkpointed RDD scans, not fresh
        # events.parquet scans — the corpus pass ran exactly once,
        # before the checkpoint
        assert "events.parquet" not in plan, name


def test_graph_final_ranks_partition_safe(spark, sf_smoke):
    """The graph family's published 1..|V| ranks are partition-safe
    (round-11): the row_number window is PARTITIONED on the range-
    partition id (graph._ranked_total_order), and the only single-task
    sort left in the plan feeds the per-partition-counts offsets window
    — keyed on __pid over #shuffle-partitions rows, never the |V| rank
    vector.  The seed top-k plans as TakeOrderedAndProject (distributed
    per-partition top-k), not a global sort + filter."""
    import re

    for name, key in (
        ("pagerank_pages", "pagerank"),
        ("pagerank_personalized", "ppr"),
    ):
        plan = _executed_plan(spark, name, sf_smoke)
        # the published rank derives from monotonically_increasing_id
        # over the range-sorted checkpoint — no window over the |V|
        # frame at all (a row_number window would re-shuffle it on
        # __pid just to number already-clustered rows)
        assert "monotonically_increasing_id" in plan, name
        assert not re.search(
            rf"row_number\(\) windowspecdefinition\([^)]*{key}", plan
        ), name
        # every Sort feeding a SinglePartition exchange sorts __pid only
        for m in re.finditer(
            r"Sort \[([^\]]*)\][^\n]*\n[^\n]*Exchange SinglePartition",
            plan,
        ):
            keys = m.group(1)
            assert key not in keys and "n_purch" not in keys, (name, keys)

    from isaac_kafka_streaming_spark.extensions.graph import _purchase_seeds

    seeds_plan = (
        _purchase_seeds(spark, sf_smoke)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in seeds_plan
    assert "Exchange SinglePartition" not in seeds_plan


def test_scan_spread_wiring(spark, sf_smoke):
    """The round-13 decode/tokenize spread stays wired: heavy per-row
    entries carry the doc_id hash exchange ahead of their first
    corpus-wide stage at single-split scale, while the measured
    aggregate-light opt-outs stay at their pinned shuffle count (their
    own single-exchange guards enforce the rest)."""
    for name in ("winnow_fingerprints", "doc_fingerprints", "pii_scrub"):
        plan = _executed_plan(spark, name, sf_smoke)
        assert "hashpartitioning(doc_id" in plan, name
    # opt-outs: no doc_id pre-exchange beyond what the plan already
    # needs (corpus_report aggregates globally; priority_sample's only
    # exchange is its own sampling shuffle)
    plan = _executed_plan(spark, "priority_sample", sf_smoke)
    assert plan.count("Exchange hashpartitioning") <= 1, plan


def test_warc_explode_readside_exchange_free(spark):
    """The WARC read side — the shape a petabyte shard corpus actually
    exercises (blobs already exist; only the graded fixture ENCODES) —
    must be a stateless 1->N mapInPandas with no Exchange: blob bytes
    never shuffle at any scale."""
    import gzip

    from isaac_kafka_streaming_spark.extensions import multimodal as mm

    rec = (
        b"WARC/1.0\r\nWARC-Record-ID: <urn:doc:1>\r\n"
        b"Content-Length: 2\r\n\r\nhi\r\n\r\n"
    )
    shards = spark.createDataFrame(
        [(1, gzip.compress(rec, mtime=0), 1)], schema=mm.JSONL_SHARD_SCHEMA
    )
    plan = (
        mm.explode_warc_shards(shards)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    assert "MapInPandas" in plan


def test_curation_pipeline_plan_shape(spark, sf_smoke):
    """The end-to-end composition keeps its audited shape: the
    normalized-hash canonical gate runs as a window, the round-15
    scalar chain (totals -> wsum -> budget) runs as unpartitioned
    window aggregates over the |langs|-row rollup — ONE
    SinglePartition exchange, no crossJoin broadcasts left, and no
    sort feeding that exchange (the |langs| rows need no order) — and
    the per-lang rollup stays two-phase hash aggregation."""
    plan = _executed_plan(spark, "curation_pipeline", sf_smoke)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan  # scalar chain gone
    assert "Window" in plan
    assert "Exchange SinglePartition" in plan  # the |langs|-row chain
    assert "HashAggregate" in plan
