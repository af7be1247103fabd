"""End-to-end training-data pipeline composition.

The per-operator suites prove each stage in isolation; this file
proves the stages COMPOSE the way a real corpus build runs them:

    documents -> curation gate -> materialized curated corpus
              -> split assignment -> contamination audit
              -> shard/pack plan

with the cross-stage invariants a user switching their pipeline onto
this engine relies on: the curation gate and dedup-first ordering make
exact eval contamination impossible, identity-keyed splits never
reassign surviving documents, and the packing plan conserves every
curated token exactly once.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

from isaac_kafka_streaming_spark.extensions.packing import (
    concat_chunk_plan,
    corpus_shards,
)
from isaac_kafka_streaming_spark.extensions.sampling import (
    corpus_split,
    split_contamination,
)
from isaac_kafka_streaming_spark.extensions.text import corpus_curation
from isaac_kafka_streaming_spark.io import read_table

CTX = 512


def _materialize_curated(spark, sf_dir, out_dir) -> None:
    """Stage boundary: the curated corpus materialized as its own
    documents table — the 'feature table computed once, reused for
    every downstream decision' shape corpus_curation's docstring
    prescribes."""
    kept_ids = corpus_curation(spark, sf_dir).filter(F.col("keep"))
    curated = read_table(spark, sf_dir, "documents").join(
        kept_ids.select("doc_id"), "doc_id"
    )
    tmp = str(out_dir) + "_tmp"
    curated.coalesce(1).write.mode("overwrite").parquet(tmp)
    os.makedirs(out_dir, exist_ok=True)
    (src,) = glob.glob(f"{tmp}/part-*.parquet")
    shutil.copy(src, os.path.join(out_dir, "documents.parquet"))


def test_pipeline_curate_split_pack(spark, sf_smoke, tmp_path):
    curated_dir = str(tmp_path / "curated")
    _materialize_curated(spark, sf_smoke, curated_dir)

    full = read_table(spark, sf_smoke, "documents")
    curated = read_table(spark, curated_dir, "documents")
    n_full, n_curated = full.count(), curated.count()
    assert 0 < n_curated < n_full, (n_curated, n_full)

    # 1. the gate actually deduplicated: normalized hashes are unique
    norm = F.sha2(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), 256
    )
    assert (
        curated.select(norm.alias("h")).distinct().count() == n_curated
    ), "curation kept two docs with the same normalized text"

    # 2. identity-keyed split: every surviving doc keeps the split it
    # had in the full corpus (curation can never reshuffle eval sets)
    before = corpus_split(spark, sf_smoke).select("doc_id", "split")
    after = corpus_split(spark, curated_dir).select(
        "doc_id", F.col("split").alias("split_after")
    )
    moved = (
        after.join(before, "doc_id")
        .filter(F.col("split") != F.col("split_after"))
        .count()
    )
    assert moved == 0, f"{moved} docs changed split across curation"
    # and all three splits are non-empty on the curated corpus
    split_sizes = {
        r.split: r.n
        for r in after.groupBy(F.col("split_after").alias("split"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(split_sizes) == {"train", "val", "test"}, split_sizes

    # 3. dedup-before-split => ZERO exact eval contamination, by
    # construction (one canonical copy per hash can only sit in one
    # split)...
    assert split_contamination(spark, curated_dir).count() == 0
    # ...and the audit is not vacuous: inject one duplicate of a train
    # doc under a fresh doc_id whose md5 bucket lands in an eval split,
    # and the audit must flag exactly that pair.
    import hashlib

    def bucket(doc_id: int) -> int:
        return int(
            hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16
        ) % 100

    train_row = (
        curated.join(
            corpus_split(spark, curated_dir)
            .filter(F.col("split") == "train")
            .select("doc_id"),
            "doc_id",
        )
        .orderBy("doc_id")
        .first()
    )
    taken = {r.doc_id for r in curated.select("doc_id").collect()}
    leak_id = next(
        i
        for i in range(10**6, 10**6 + 10_000)
        if bucket(i) < 10 and i not in taken
    )
    leaked_dir = str(tmp_path / "leaked")
    leaked = curated.unionByName(
        spark.createDataFrame(
            [(leak_id, train_row.text, train_row.lang,
              train_row.source, train_row.n_chars)],
            curated.schema,
        )
    )
    tmp2 = leaked_dir + "_tmp"
    leaked.coalesce(1).write.mode("overwrite").parquet(tmp2)
    os.makedirs(leaked_dir, exist_ok=True)
    (src2,) = glob.glob(f"{tmp2}/part-*.parquet")
    shutil.copy(src2, os.path.join(leaked_dir, "documents.parquet"))
    flagged = split_contamination(spark, leaked_dir).collect()
    assert [(r.eval_doc_id, r.train_doc_id) for r in flagged] == [
        (leak_id, train_row.doc_id)
    ], flagged

    # 4. pack: every curated doc lands in exactly one shard slot...
    shards = corpus_shards(spark, curated_dir)
    assert shards.count() == n_curated
    assert shards.select("doc_id").distinct().count() == n_curated
    per_shard = {
        r.shard: r
        for r in shards.groupBy("shard")
        .agg(F.count("*").alias("n"), F.max("position").alias("maxp"))
        .collect()
    }
    for s, r in per_shard.items():
        assert r.maxp == r.n, f"shard {s}: positions not dense 1..n"

    # ...and the chunk plan conserves tokens exactly: per shard, the
    # final doc's offset+len equals the token sum, and the chunk count
    # it implies is ceil(shard_tokens / CTX)
    plan = concat_chunk_plan(spark, curated_dir, ctx=CTX)
    agg = plan.groupBy("shard").agg(
        F.sum("n_tokens").alias("tok_sum"),
        F.max(F.col("tok_offset") + F.col("n_tokens")).alias("tok_end"),
        F.max("chunk_last").alias("last_chunk"),
    )
    for r in agg.collect():
        assert r.tok_sum == r.tok_end, f"shard {r.shard} lost tokens"
        assert r.last_chunk == (r.tok_sum - 1) // CTX, r

    # 5. chunk ranges tile each shard: doc i+1 starts where doc i ended
    w_rows = plan.select(
        "shard", "tok_offset", "n_tokens"
    ).collect()
    by_shard: dict = {}
    for r in w_rows:
        by_shard.setdefault(r.shard, []).append((r.tok_offset, r.n_tokens))
    for s, offs in by_shard.items():
        offs.sort()
        pos = 0
        for off, n in offs:
            assert off == pos, f"shard {s}: gap at offset {off} != {pos}"
            pos = off + n
