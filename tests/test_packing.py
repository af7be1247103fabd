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


def test_pack_samples_invariants(spark, sf_smoke):
    """FFD no-split packing: capacity respected, documents intact (one
    bin each), oversize flagged into solo bins, bin_fill consistent,
    and the any-fit bin-count guarantee per shard (after setting the
    oversize solo bins aside: at most one open bin can be under half
    full, so bins <= 2*ceil(tokens/ctx) and >= ceil(tokens/ctx))."""
    from isaac_kafka_streaming_spark.extensions.packing import pack_samples

    CTX = 128
    rows = pack_samples(spark, sf_smoke, ctx=CTX).collect()
    assert rows
    fills: dict = {}
    for r in rows:
        fills.setdefault((r.shard, r.bin), []).append(r)
    for (shard, b), members in fills.items():
        tok = sum(r.n_tokens for r in members)
        assert all(r.bin_fill == tok for r in members), (shard, b)
        if any(r.oversize for r in members):
            assert len(members) == 1, "oversize doc shares a bin"
            assert members[0].n_tokens > CTX
        else:
            assert tok <= CTX, f"bin {(shard, b)} over capacity: {tok}"
    # per-shard any-fit bounds over the non-oversize docs
    per_shard: dict = {}
    for r in rows:
        if not r.oversize:
            per_shard.setdefault(r.shard, []).append(r)
    import math

    for shard, members in per_shard.items():
        tokens = sum(r.n_tokens for r in members)
        n_bins = len({r.bin for r in members})
        lo = math.ceil(tokens / CTX) if tokens else 0
        assert lo <= n_bins <= max(2 * lo, 1), (shard, tokens, n_bins)
    # determinism
    again = pack_samples(spark, sf_smoke, ctx=CTX).collect()
    assert {(r.doc_id, r.bin) for r in again} == {
        (r.doc_id, r.bin) for r in rows
    }


def test_pack_samples_hand_case(spark, tmp_path):
    """Hand-computed FFD on one shard: docs of 100/90/50/30/20/10
    tokens at ctx=128 pack as [100+20], [90+30], [50+10] (+ a 200-token
    oversize solo bin) — first-fit-decreasing order, not next-fit."""
    import pandas as pd

    from isaac_kafka_streaming_spark.extensions.packing import pack_samples

    def words(n, tag):
        return " ".join(f"{tag}{i}" for i in range(n))

    sizes = {1: 100, 2: 90, 3: 50, 4: 30, 5: 20, 6: 10, 7: 200}
    pd.DataFrame(
        {
            "doc_id": list(sizes),
            "text": [words(n, f"d{d}w") for d, n in sizes.items()],
            "lang": ["en"] * len(sizes),
            "source": ["s"] * len(sizes),
            "n_chars": [1] * len(sizes),
        }
    ).to_parquet(tmp_path / "documents.parquet")

    rows = pack_samples(spark, str(tmp_path), ctx=128, n_shards=1).collect()
    by_doc = {r.doc_id: r for r in rows}
    assert by_doc[7].oversize and by_doc[7].bin_fill == 200
    groups = {}
    for r in rows:
        if not r.oversize:
            groups.setdefault(r.bin, set()).add(r.doc_id)
    assert sorted(groups.values(), key=min) == [{1, 5}, {2, 4}, {3, 6}]
