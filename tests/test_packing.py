"""Packing invariants — properties the oracle hash can't see.

The parity test proves Spark == DuckDB row-for-row; these pin the
semantics both engines are supposed to share: dense per-shard
positions, prefix-sum offsets, and chunk ranges that tile each shard's
token stream exactly.
"""

from __future__ import annotations

import math

from isaac_kafka_streaming_spark.extensions.packing import (
    CTX_TOKENS,
    N_SHARDS,
    concat_chunk_plan,
    corpus_shards,
)


def test_corpus_shards_dense_positions(spark, sf_smoke):
    pdf = corpus_shards(spark, sf_smoke).toPandas()
    assert pdf.doc_id.is_unique
    assert pdf.shard.between(0, N_SHARDS - 1).all()
    for _, g in pdf.groupby("shard"):
        assert sorted(g.position) == list(range(1, len(g) + 1))


def test_concat_chunk_tiles_each_shard(spark, sf_smoke):
    pdf = concat_chunk_plan(spark, sf_smoke).toPandas()
    assert pdf.doc_id.is_unique
    assert (pdf.n_tokens >= 0).all()
    for shard, g in pdf.groupby("shard"):
        g = g.sort_values("tok_offset")
        total = int(g.n_tokens.sum())
        # offsets are the exclusive prefix sum of token counts
        assert list(g.tok_offset) == [
            int(c) for c in ([0] + list(g.n_tokens.cumsum()[:-1]))
        ]
        nonzero = g[g.n_tokens > 0]
        if total:
            # chunk ids tile [0, ceil(total/ctx)) with no gaps
            assert int(nonzero.chunk_last.max()) == math.ceil(
                total / CTX_TOKENS
            ) - 1
            covered = set()
            for r in nonzero.itertuples():
                assert r.chunk_first == r.tok_offset // CTX_TOKENS
                assert r.n_chunks == r.chunk_last - r.chunk_first + 1
                covered.update(range(r.chunk_first, r.chunk_last + 1))
            assert covered == set(range(math.ceil(total / CTX_TOKENS)))
        # zero-token docs occupy no chunk
        assert (g[g.n_tokens == 0].n_chunks == 0).all()


def test_overlap_chunks_long_doc(spark, tmp_path_factory):
    """Multi-window docs: stride-96/len-128 windows tile a 300-token
    doc as starts 1,97,193 with the last window partial; every token
    is covered and consecutive windows overlap by chunk-stride."""
    from isaac_kafka_streaming_spark.extensions.packing import (
        overlap_chunk_plan,
    )

    base = tmp_path_factory.mktemp("ovl")
    rows = [
        (0, " ".join(f"t{i}" for i in range(300))),
        (1, "short doc"),
        (2, ""),  # tokenless: no chunks
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(base / "documents.parquet")
    )
    out = overlap_chunk_plan(spark, str(base)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_id, r.start_tok, r.chunk_len))
    assert 2 not in by_doc
    assert by_doc[1] == [(0, 1, 2)]
    got = sorted(by_doc[0])
    assert got == [(0, 1, 128), (1, 97, 128), (2, 193, 108)]
    # full coverage: last window reaches token 300 exactly
    assert got[-1][1] + got[-1][2] - 1 == 300
    # overlap between consecutive windows = chunk - stride = 32
    assert got[0][1] + got[0][2] - got[1][1] == 32

    import pytest

    with pytest.raises(ValueError, match="stride"):
        overlap_chunk_plan(spark, str(base), chunk_tokens=64, stride=65)
