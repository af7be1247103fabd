"""Scale guards on the dedup tiers, asserted as behavior, not prose.

Round-1 verdict flagged two documented-but-unimplemented caps:
  - ngram_jaccard_pairs: hot-shingle document-frequency cap (one
    boilerplate shingle shared by d docs puts d^2/2 pairs on ONE key);
  - minhash_lsh_pairs: band-bucket width cap (a clique of
    near-identical docs lands in the same bucket in EVERY band);
plus the unguarded label-block quadratic in embedding_cosine_pairs.
These tests pin all three: caps OFF == round-1 exact semantics; caps
ON bound the per-key fan-out on a corpus built to be pathological.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from isaac_kafka_streaming_spark.extensions.dedup import (
    embedding_cosine_pairs,
    embedding_srp_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    unpersist_deps,
)

BOILERPLATE = "the quick brown fox jumps over the lazy dog again and again"


@pytest.fixture(scope="module")
def boiler_dir(spark, tmp_path_factory) -> str:
    """A corpus whose ONLY cross-doc shingles are one shared boilerplate
    phrase: every doc = boilerplate + a unique disjoint tail, so all
    pair candidates are manufactured by the hot shingles alone."""
    base = tmp_path_factory.mktemp("boiler")
    docs = [
        (i, f"{BOILERPLATE} unique{i}a tail{i}b filler{i}c word{i}d end{i}e")
        for i in range(8)
    ]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(base / "documents.parquet")
    )
    return str(base)


def _pairs(df):
    return sorted((r.doc_a, r.doc_b, r.jaccard) for r in df.collect())


# -- ngram hot-shingle cap -------------------------------------------------


def test_ngram_cap_off_matches_uncapped(spark, sf_smoke):
    """cutoff=inf is the identity: byte-identical pairs to no cap."""
    uncapped = _pairs(ngram_jaccard_pairs(spark, sf_smoke))
    capped = _pairs(ngram_jaccard_pairs(spark, sf_smoke, max_shingle_df=10**9))
    assert capped == uncapped and uncapped  # non-vacuous


def test_ngram_cap_bounds_fanout(spark, boiler_dir):
    """With the cap below the boilerplate df, the hot shingles leave the
    index entirely — bounded per-key fan-out AND no manufactured pairs."""
    # uncapped: boilerplate shingles (df=8) generate candidate pairs
    assert _pairs(ngram_jaccard_pairs(spark, boiler_dir, threshold=0.1))
    # capped: no surviving shingle is shared by more than the cutoff
    docs = spark.read.parquet(f"{boiler_dir}/documents.parquet")
    from isaac_kafka_streaming_spark.extensions.dedup import _shingles, _tokens

    sh = docs.select(
        "doc_id", F.explode(_shingles(_tokens(F.col("text")))).alias("shingle")
    )
    hot_df = sh.groupBy("shingle").count().agg(F.max("count")).first()[0]
    assert hot_df == 8  # the pathology is real: one shingle in every doc
    capped = _pairs(ngram_jaccard_pairs(spark, boiler_dir, threshold=0.1,
                                        max_shingle_df=4))
    assert capped == []  # unique tails share nothing once hot rows drop


# -- LSH bucket-width cap --------------------------------------------------


def test_lsh_cap_off_matches_uncapped(spark, sf_smoke):
    a = minhash_lsh_pairs(spark, sf_smoke)
    b = minhash_lsh_pairs(spark, sf_smoke, max_bucket_size=10**9)
    try:
        assert _pairs(a) == _pairs(b) and _pairs(a)
    finally:
        unpersist_deps(a)
        unpersist_deps(b)


def test_lsh_cap_bounds_bucket_width(spark, tmp_path_factory):
    """A clique of identical docs fills one bucket per band; capping
    below the clique size drops those buckets (the exact/normalized
    tiers own ultra-common dups), leaving zero candidate fan-out."""
    base = tmp_path_factory.mktemp("clique")
    same = "identical boilerplate document body with enough tokens to shingle"
    rows = [(i, same) for i in range(6)] + [
        (10 + i, f"totally different text number {i} with its own words here")
        for i in range(3)
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(base / "documents.parquet")
    )
    uncapped = minhash_lsh_pairs(spark, str(base), threshold=0.9)
    capped = minhash_lsh_pairs(spark, str(base), threshold=0.9, max_bucket_size=4)
    try:
        # the clique is found without the cap (6 choose 2 pairs) ...
        assert len(_pairs(uncapped)) == 15
        # ... and its width-6 buckets are excised with cap=4
        assert _pairs(capped) == []
    finally:
        unpersist_deps(uncapped)
        unpersist_deps(capped)


def test_lsh_unpersist_deps_releases_cache(spark, sf_smoke):
    """The cache contract: deps are attached, and unpersist_deps drops
    their storage level back to NONE."""
    df = minhash_lsh_pairs(spark, sf_smoke)
    deps = df._cached_deps
    assert len(deps) == 2
    df.count()  # materialize -> caches populated
    assert all(d.storageLevel.useMemory for d in deps)
    unpersist_deps(df)
    assert not any(d.storageLevel.useMemory for d in deps)


# -- embedding label-block guard ------------------------------------------


def test_embedding_guard_passes_within_cap(spark, sf_smoke):
    """Driver data blocks are far under the default cap — identical
    result with the guard on and off."""
    guarded = embedding_cosine_pairs(spark, sf_smoke)
    unguarded = embedding_cosine_pairs(spark, sf_smoke, max_block_size=None)
    key = lambda df: sorted(  # noqa: E731
        (r.vec_a, r.vec_b, r.label, r.cosine) for r in df.collect()
    )
    assert key(guarded) == key(unguarded) and key(guarded)


def test_embedding_srp_subset_and_recall(spark, sf_smoke):
    """The SRP sub-blocked tier returns a SUBSET of the exact
    label-blocked pairs (same cosine values), with recall no worse than
    the few-planes SRP collision floor on driver data."""
    exact = {
        (r.vec_a, r.vec_b): r.cosine
        for r in embedding_cosine_pairs(spark, sf_smoke).collect()
    }
    srp = {
        (r.vec_a, r.vec_b): r.cosine
        for r in embedding_srp_pairs(spark, sf_smoke).collect()
    }
    assert srp  # non-vacuous
    assert set(srp) <= set(exact)
    assert all(exact[k] == v for k, v in srp.items())
    recall = len(srp) / len(exact)
    assert recall >= 0.1, f"recall {recall:.2f} below floor"
    # fewer planes -> strictly more candidates -> recall monotone
    srp1 = {
        (r.vec_a, r.vec_b)
        for r in embedding_srp_pairs(spark, sf_smoke, num_planes=1).collect()
    }
    assert set(srp) <= srp1 <= set(exact)


def test_embedding_guard_trips_on_dominant_label(spark, tmp_path_factory):
    """A label block wider than the cap must FAIL the query, not
    silently run an all-pairs join."""
    base = tmp_path_factory.mktemp("domlabel")
    rows = [(i, "hot", [1.0, 0.0, 1.0]) for i in range(6)] + [
        (100, "cold", [0.0, 1.0, 0.0])
    ]
    spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    ).write.parquet(str(base / "embeddings.parquet"))
    with pytest.raises(Exception, match="exceeds max_block_size"):
        embedding_cosine_pairs(spark, str(base), max_block_size=4).collect()


# -- ngram-contamination hot-shingle cap -----------------------------------


def test_contamination_cap_off_is_identity(spark, sf_smoke):
    """max_shingle_df=inf must be byte-identical to no cap."""
    from isaac_kafka_streaming_spark.extensions.sampling import (
        ngram_contamination,
    )

    base = sorted(
        map(tuple, ngram_contamination(spark, sf_smoke).collect())
    )
    capped = sorted(
        map(
            tuple,
            ngram_contamination(
                spark, sf_smoke, max_shingle_df=10**9
            ).collect(),
        )
    )
    assert base == capped and base


def test_contamination_cap_drops_boilerplate_leaks(
    spark, tmp_path_factory
):
    """Boilerplate shared by every doc counts as leakage uncapped, but
    with the cap below its df it stops counting — the held-out docs'
    leak_frac over their remaining (unique) shingles drops to 0."""
    import hashlib

    from isaac_kafka_streaming_spark.extensions.sampling import (
        ngram_contamination,
    )

    def bucket(doc_id: int) -> int:
        h = hashlib.md5(str(doc_id).encode()).hexdigest()
        return int(h[:4], 16) % 100

    train_ids = [i for i in range(1000) if bucket(i) >= 10][:6]
    eval_ids = [i for i in range(1000) if bucket(i) < 10][:2]
    base = tmp_path_factory.mktemp("boiler_contam")
    docs = [
        (i, f"{BOILERPLATE} unique{i}a tail{i}b filler{i}c word{i}d end{i}e")
        for i in train_ids + eval_ids
    ]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(base / "documents.parquet")
    )

    uncapped = {
        r.eval_doc_id: r.leak_frac
        for r in ngram_contamination(spark, str(base)).collect()
    }
    # the 12-token boilerplate prefix yields shared 5-gram shingles in
    # every doc -> both held-out docs show leakage without the cap
    assert set(uncapped) == set(eval_ids)
    assert all(f > 0 for f in uncapped.values())
    capped = {
        r.eval_doc_id: r.leak_frac
        for r in ngram_contamination(
            spark, str(base), max_shingle_df=4
        ).collect()
    }
    assert capped and all(f == 0.0 for f in capped.values())


# -- incremental near-dup (LSH band probe) ---------------------------------


def test_incoming_minhash_finds_cross_slice_near_dups(
    spark, tmp_path_factory
):
    """A near-identical (incoming, existing) pair must be detected; an
    identical incoming x incoming pair must NOT pair with itself (the
    candidate space is strictly incoming x existing)."""
    import hashlib

    from isaac_kafka_streaming_spark.extensions.dedup import (
        dedup_incoming_minhash,
        unpersist_deps,
    )

    def bucket(doc_id: int) -> int:
        h = hashlib.md5(("inc" + str(doc_id)).encode()).hexdigest()
        return int(h[:4], 16) % 100

    existing_ids = [i for i in range(1000) if bucket(i) < 90]
    incoming_ids = [i for i in range(1000) if bucket(i) >= 90]
    base_text = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    fresh = "one two three four five six seven eight nine ten eleven twelve"
    rows = [
        (existing_ids[0], base_text),
        (incoming_ids[0], base_text + " phi"),   # near-dup of existing
        (incoming_ids[1], fresh),                # novel
        (incoming_ids[2], fresh),                # identical to the OTHER incoming
    ]
    base = tmp_path_factory.mktemp("inc_minhash")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(base / "documents.parquet")
    )
    out = dedup_incoming_minhash(spark, str(base), threshold=0.5)
    got = {r.doc_id: r for r in out.collect()}
    unpersist_deps(out)
    assert set(got) == {incoming_ids[0]}, got
    assert got[incoming_ids[0]].near_dup_of == existing_ids[0]
    assert got[incoming_ids[0]].jaccard >= 0.5


def test_incoming_minhash_md5_witness_matches_mechanism(
    spark, tmp_path_factory
):
    """The md5 witness runs the identical incoming-probe pipeline:
    same planted behavior as the production xxhash tier (cross-slice
    near-dup found, incoming x incoming ignored), same slice split,
    AND it hash-matches its DuckDB oracle on the planted corpus — the
    end-to-end check the engine-specific production tier cannot have."""
    import hashlib

    import duckdb

    from isaac_kafka_streaming_spark.extensions.dedup import (
        dedup_incoming_minhash_md5,
        register,
        unpersist_deps,
    )

    def bucket(doc_id: int) -> int:
        h = hashlib.md5(("inc" + str(doc_id)).encode()).hexdigest()
        return int(h[:4], 16) % 100

    existing_ids = [i for i in range(1000) if bucket(i) < 90]
    incoming_ids = [i for i in range(1000) if bucket(i) >= 90]
    base_text = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    fresh = "one two three four five six seven eight nine ten eleven twelve"
    rows = [
        (existing_ids[0], base_text),
        (incoming_ids[0], base_text + " phi"),
        (incoming_ids[1], fresh),
        (incoming_ids[2], fresh),
    ]
    base = tmp_path_factory.mktemp("inc_minhash_md5")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(base / "documents.parquet")
    )
    out = dedup_incoming_minhash_md5(spark, str(base), threshold=0.5)
    got = {r.doc_id: (r.near_dup_of, r.jaccard) for r in out.collect()}
    unpersist_deps(out)
    assert set(got) == {incoming_ids[0]}, got
    assert got[incoming_ids[0]][0] == existing_ids[0]
    assert got[incoming_ids[0]][1] >= 0.5

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{base}/documents.parquet/*.parquet')"
    )
    sql = register()["dedup_incoming_minhash_md5"].sql
    want = {r[0]: (r[1], r[2]) for r in con.execute(sql).fetchall()}
    assert got == want


# -- simhash wide-document ANSI-overflow guard -----------------------------


def test_simhash_wide_doc_no_ansi_overflow(spark, tmp_path_factory):
    """A doc with > 2^15 distinct tokens must produce a signature, not
    throw ARITHMETIC_OVERFLOW mid-aggregation.  With the old 4-per-long
    packing (top field at shift 48) the signed-64 running sum crossed
    Long.MAX at ~2^15 tokens under Spark 4's default ANSI mode, erroring
    before the carry guard ever evaluated; the top 16 bits now live in
    unpacked sums so the packed lanes stay < n_tok * 2^33."""
    from isaac_kafka_streaming_spark.extensions.dedup import simhash_pairs

    base = tmp_path_factory.mktemp("wide")
    wide = " ".join(f"tok{i}" for i in range(40_000))  # 2^15 < 40k < 2^16
    docs = [(0, wide + " endA"), (1, wide + " endB"), (2, "tiny doc")]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(base / "documents.parquet")
    )
    pairs = simhash_pairs(spark, str(base)).collect()
    # the two wide docs differ by one token out of 40k: Hamming ~0
    assert any({r.doc_a, r.doc_b} == {0, 1} for r in pairs)


# -- exact substring decontamination (rarest-anchor containment) -----------


def test_decontaminate_exact_planted_containments(spark, tmp_path_factory):
    """Planted cases spanning every stage of the anchor pipeline:

    * E1 token-contained mid-document in T1        -> flagged, not exact
    * E2 verbatim copy of T2                       -> flagged, exact
    * E6 contained in TWO train docs (one equal)   -> n_train_hits=2, exact
    * E7 every shingle present in T5 but never the full sequence
      (anchor-join candidate that must FAIL verification) -> absent
    * E8 rarest anchor df=0 (pruned pre-join)      -> absent
    """
    import hashlib

    from isaac_kafka_streaming_spark.extensions.sampling import (
        decontaminate_exact,
    )

    def bucket(doc_id: int) -> int:
        h = hashlib.md5(str(doc_id).encode()).hexdigest()
        return int(h[:4], 16) % 100

    train_ids = [i for i in range(1000) if bucket(i) >= 10][:5]
    eval_ids = [i for i in range(1000) if bucket(i) < 10][:5]
    t1, t2, t4a, t4b, t5 = train_ids
    e1, e2, e6, e7, e8 = eval_ids
    rows = [
        (t1, "alpha beta gamma delta epsilon zeta eta"),
        (t2, "quebec romeo sierra tango uniform victor"),
        (t4a, "mike november oscar papa lima"),
        (t4b, "mike november oscar papa lima unrelated1 unrelated2"),
        (t5, "tok1 tok2 tok3 tok4 tok5 brk tok2 tok3 tok4 tok5 tok6"),
        (e1, "beta gamma delta epsilon zeta"),
        (e2, "quebec romeo sierra tango uniform victor"),
        (e6, "mike november oscar papa lima"),
        (e7, "tok1 tok2 tok3 tok4 tok5 tok6"),
        (e8, "foo1 foo2 foo3 foo4 foo5"),
    ]
    base = tmp_path_factory.mktemp("decontam")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(base / "documents.parquet")
    )
    got = {r.eval_doc_id: r for r in decontaminate_exact(spark, str(base)).collect()}
    assert set(got) == {e1, e2, e6}, got
    assert (got[e1].n_train_hits, got[e1].first_train_doc_id) == (1, t1)
    assert got[e1].any_exact is False
    assert (got[e2].n_train_hits, got[e2].first_train_doc_id) == (1, t2)
    assert got[e2].any_exact is True
    assert got[e6].n_train_hits == 2
    assert got[e6].first_train_doc_id == min(t4a, t4b)
    assert got[e6].any_exact is True


# -- SemDeDup within-cell embedding drop -----------------------------------


def test_dedup_semantic_planted_duplicates(spark, tmp_path_factory):
    """One-hot centroids make cell assignment exact: two scaled copies of
    centroid 3's direction must both drop against vec 3 (keep-lowest-id
    reaches across to the centroid itself), while a uniform vector whose
    best centroid cosine (0.25) sits below tau survives.  Centroid rows
    are their own cells' lowest ids, so all 16 stay kept."""
    from isaac_kafka_streaming_spark.extensions.dedup import dedup_semantic

    dim = 16
    rows = []
    for i in range(16):  # centroids: one-hot e_i
        v = [0.0] * dim
        v[i] = 1.0
        rows.append((i, v, 0))
    rows.append((16, [0.0] * 3 + [2.0] + [0.0] * 12, 0))  # 2*e_3
    rows.append((17, [0.0] * 3 + [3.0] + [0.0] * 12, 0))  # 3*e_3
    rows.append((18, [1.0] * dim, 0))  # cos 0.25 to every centroid
    base = tmp_path_factory.mktemp("semdedup")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(base / "embeddings.parquet"))

    got = {r.vec_id: r for r in dedup_semantic(spark, str(base)).collect()}
    assert set(got) == set(range(19))
    for i in range(16):
        assert got[i].kept is True and got[i].dup_of is None
    for i in (16, 17):
        assert got[i].cell_id == 3
        assert got[i].kept is False and got[i].dup_of == 3
    assert got[18].cell_id == 0  # tie on cosine 0.25 -> lowest cell wins
    assert got[18].kept is True and got[18].dup_of is None


def test_prototype_prune_laws(spark, tmp_path_factory):
    """D4's pruning half obeys its defining laws on a planted fixture:
    per cell EXACTLY floor(prune_frac * cell_n) rows are pruned; every
    pruned row is at least as prototypical (rounded centroid cosine)
    as every kept cellmate; prune_frac=0 prunes nothing; and the
    centroid vector itself — maximally prototypical at cosine 1 — is
    always among the pruned when anything is."""
    import math

    from isaac_kafka_streaming_spark.extensions.dedup import (
        prototype_prune,
    )

    dim = 16
    rows = []
    for i in range(16):  # centroids: one-hot e_i
        v = [0.0] * dim
        v[i] = 1.0
        rows.append((i, v, 0))
    # cell 3 gets a graded prototypicality ladder: e_3 + eps*e_4
    # (eps < 1 keeps the argmax on centroid 3 — at eps = 1 the tie
    # breaks to cell 3 but beyond it cell 4 wins)
    for j, eps in enumerate([0.1, 0.25, 0.4, 0.55, 0.7, 0.85]):
        v = [0.0] * dim
        v[3] = 1.0
        v[4] = eps
        rows.append((16 + j, v, 0))
    base = tmp_path_factory.mktemp("proto_prune")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(base / "embeddings.parquet"))

    got = prototype_prune(spark, str(base)).collect()
    assert len(got) == 22
    by_cell = {}
    for r in got:
        by_cell.setdefault(r.cell_id, []).append(r)
    for cell, rs in by_cell.items():
        n = len(rs)
        assert all(r.cell_n == n for r in rs)
        pruned = [r for r in rs if r.pruned]
        kept = [r for r in rs if not r.pruned]
        assert len(pruned) == math.floor(0.25 * n), cell
        if pruned and kept:
            assert min(r.centroid_cos for r in pruned) >= max(
                r.centroid_cos for r in kept
            ), cell
    cell3 = by_cell[3]
    assert len(cell3) == 7  # centroid + the 6-rung ladder
    assert {r.vec_id for r in cell3 if r.pruned} == {3}  # floor(7/4)=1
    none_pruned = prototype_prune(spark, str(base), prune_frac=0.0).collect()
    assert not any(r.pruned for r in none_pruned)


# -- dedup_clusters pair-tier equivalence ----------------------------------


def test_cluster_pair_tiers_agree_on_driver_data(spark, sf_smoke):
    """Both pair tiers verify against the same exact-Jaccard threshold,
    so the LSH tier's pair set is a subset of the exact tier's — and on
    driver data the two are identical, which is what makes swapping the
    graded dedup_clusters onto the oracle-replayable exact tier a
    semantics-preserving change rather than a new operator."""
    from isaac_kafka_streaming_spark.extensions.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        unpersist_deps,
    )

    exact = {(r.doc_a, r.doc_b) for r in ngram_jaccard_pairs(spark, sf_smoke).collect()}
    lsh_df = minhash_lsh_pairs(spark, sf_smoke)
    lsh = {(r.doc_a, r.doc_b) for r in lsh_df.collect()}
    unpersist_deps(lsh_df)
    assert lsh <= exact
    assert lsh == exact  # holds on driver testdata (all SFs checked)


def test_dedup_clusters_tiers_same_clusters(spark, sf_smoke):
    """CC over either pair tier must produce identical clusters on
    driver data (pair sets identical per the test above)."""
    from isaac_kafka_streaming_spark.extensions.dedup import dedup_clusters

    exact = sorted(map(tuple, dedup_clusters(spark, sf_smoke).collect()))
    lsh = sorted(
        map(tuple, dedup_clusters(spark, sf_smoke, pair_tier="lsh").collect())
    )
    assert exact == lsh and exact


def test_minhash_md5_witness_matches_production_tier(spark, sf_smoke):
    """The oracle-checked md5-hash LSH variant and the xxhash64
    production tier must emit the same verified pair set on driver
    data — different hash families, same candidates surviving the same
    exact-Jaccard verification."""
    from isaac_kafka_streaming_spark.extensions.dedup import (
        minhash_lsh_pairs,
        minhash_lsh_pairs_md5,
        unpersist_deps,
    )

    prod_df = minhash_lsh_pairs(spark, sf_smoke)
    prod = {(r.doc_a, r.doc_b, r.jaccard) for r in prod_df.collect()}
    unpersist_deps(prod_df)
    md5_df = minhash_lsh_pairs_md5(spark, sf_smoke)
    md5 = {(r.doc_a, r.doc_b, r.jaccard) for r in md5_df.collect()}
    unpersist_deps(md5_df)
    assert prod == md5 and prod


def test_simhash_md5_witness_finds_planted_near_dup(spark, tmp_path_factory):
    """Same planted contract as the production tier: two docs differing
    by one token out of many must pair at small Hamming distance; an
    unrelated doc must not pair with them."""
    from isaac_kafka_streaming_spark.extensions.dedup import simhash_pairs_md5

    base = tmp_path_factory.mktemp("simhash_md5")
    wide = " ".join(f"tok{i}" for i in range(500))
    docs = [(0, wide + " endA"), (1, wide + " endB"),
            (2, "a completely different tiny document about nothing")]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(base / "documents.parquet")
    )
    pairs = {(r.doc_a, r.doc_b): r.hamming
             for r in simhash_pairs_md5(spark, str(base)).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] <= 6
    assert all({0, 1} >= {a, b} for a, b in pairs), pairs


def test_contained_documents_planted_and_oracle_parity(
    spark, sf_smoke, tmp_path_factory
):
    """Truncation-dup tier: a doc embedded mid-document in a longer one
    is flagged; exact-dup groups keep their lowest id; the staged
    round-7 oracle agrees with Spark on both the planted corpus and the
    full smoke corpus."""
    import duckdb

    from isaac_kafka_streaming_spark.extensions.dedup import (
        CONTAINED_DOCUMENTS_ORACLE_SQL,
        contained_documents,
    )

    rows = [
        (0, "alpha beta gamma delta epsilon"),                      # inner
        (1, "prefix alpha beta gamma delta epsilon suffix words"),  # container
        (2, "quebec romeo sierra tango uniform"),                   # exact dup lo
        (3, "quebec romeo sierra tango uniform"),                   # exact dup hi
        (4, "unrelated text with completely different tokens here"),
    ]
    base = tmp_path_factory.mktemp("contained")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(base / "documents.parquet")
    )
    got = {r.doc_id: r for r in contained_documents(spark, str(base)).collect()}
    assert set(got) == {0, 3}
    assert (got[0].n_containers, got[0].first_container_id, got[0].any_exact) == (
        1, 1, False,
    )
    assert (got[3].n_containers, got[3].first_container_id, got[3].any_exact) == (
        1, 2, True,
    )

    for d in (str(base) + "/documents.parquet/*.parquet",
              sf_smoke + "/documents.parquet"):
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}')")
        want = {
            r[0]: (r[1], r[2], r[3])
            for r in con.execute(CONTAINED_DOCUMENTS_ORACLE_SQL).fetchall()
        }
        src = str(base) if "*" in d else sf_smoke
        have = {
            r.doc_id: (r.n_containers, r.first_container_id, r.any_exact)
            for r in contained_documents(spark, src).collect()
        }
        assert have == want


def test_ngram_capped_unpersist_releases_cached_index(spark, sf_smoke):
    """Regression (round-6 review): with the hot-shingle cap on, the
    attached dep must be the CACHED shingle index, not the anti-joined
    rebinding — unpersist_deps on a never-cached plan is a no-op and
    the index leaks for the session."""
    df = ngram_jaccard_pairs(spark, sf_smoke, max_shingle_df=5)
    (dep,) = df._cached_deps
    df.count()
    assert dep.storageLevel.useMemory
    unpersist_deps(df)
    assert not dep.storageLevel.useMemory


def test_bloom_prefilter_oracle_parity_and_no_false_negatives(
    spark, sf_smoke
):
    """Round-7-staged Bloom prefilter: hash-exact vs the DuckDB replay,
    and the Bloom contract holds — every true duplicate is a bloom hit
    (no false negatives, ever); false positives are explicit rows."""
    import duckdb

    from isaac_kafka_streaming_spark.extensions.dedup import (
        BLOOM_PREFILTER_ORACLE_SQL,
        bloom_prefilter,
    )

    got = bloom_prefilter(spark, sf_smoke).toPandas()
    got = got[sorted(got.columns)].sort_values(
        by=list(sorted(got.columns)), ignore_index=True
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_smoke}/documents.parquet'"
    )
    want = con.execute(BLOOM_PREFILTER_ORACLE_SQL).fetchdf()
    con.close()
    want = want[sorted(want.columns)].sort_values(
        by=list(sorted(want.columns)), ignore_index=True
    )
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) and len(got) > 0
    for col in got.columns:
        assert [None if pd.isna(x) else x for x in got[col]] == [
            None if pd.isna(x) else x for x in want[col]
        ], f"{col} differs"
    # Bloom guarantee: is_dup implies bloom_hit
    assert (~got.is_dup | got.bloom_hit).all()
    # consistency: false_positive is exactly hit-but-not-dup
    assert (got.false_positive == (got.bloom_hit & ~got.is_dup)).all()


def test_passage_scrub_oracle_parity_and_reassembly(spark, sf_smoke):
    """Spark↔DuckDB parity for the repeated-span scrub at the smoke
    SF, plus the reassembly invariant: an unscrubbed document's
    cleaned_text is exactly its normalized token stream rejoined."""
    import duckdb

    from isaac_kafka_streaming_spark.extensions.dedup import (
        PASSAGE_SCRUB_ORACLE_SQL,
        passage_scrub,
    )

    rows = passage_scrub(spark, sf_smoke).collect()
    got = {
        r.doc_id: (r.n_blocks, r.n_scrubbed, r.cleaned_text) for r in rows
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_smoke}/documents.parquet')"
    )
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(PASSAGE_SCRUB_ORACLE_SQL).fetchall()
    }
    assert got == want and len(got) > 100
    assert any(v[1] > 0 for v in got.values()), (
        "no boilerplate span scrubbed anywhere — threshold inert"
    )

    # reassembly invariant on untouched docs
    import re

    texts = dict(
        con.execute("SELECT doc_id, text FROM documents").fetchall()
    )
    untouched = [d for d, v in got.items() if v[1] == 0][:20]
    assert untouched
    for d in untouched:
        norm = " ".join(
            t for t in re.split(r"[^a-z0-9]+", texts[d].lower()) if t
        )
        assert got[d][2] == norm, f"doc {d} reassembly mismatch"


def test_source_overlap_matrix_parity_and_cap(spark, sf_smoke):
    """Spark↔DuckDB parity for the cross-source passage matrix, plus
    cap semantics: with max_sources_per_passage=1 every shared passage
    (by definition in >= 2 sources) is excised, so the matrix is
    empty."""
    import duckdb

    from isaac_kafka_streaming_spark.extensions.dedup import (
        SOURCE_OVERLAP_ORACLE_SQL,
        source_overlap_matrix,
    )

    got = {
        (r.source_a, r.source_b): (r.n_shared, r.passage_jaccard)
        for r in source_overlap_matrix(spark, sf_smoke).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_smoke}/documents.parquet')"
    )
    want = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.execute(SOURCE_OVERLAP_ORACLE_SQL).fetchall()
    }
    assert got == want and len(got) > 5
    assert all(v[0] >= 1 and 0 < v[1] <= 1 for v in got.values())

    capped = source_overlap_matrix(
        spark, sf_smoke, max_sources_per_passage=1
    )
    assert capped.count() == 0


def test_passage_scrub_matches_classic_reference(spark, tmp_path_factory):
    """Third-implementation check for the repeated-span scrub: a plain
    Python block-grid scrub on a seeded corpus with PLANTED shared
    spans must agree with the relational form exactly (counts and
    reassembled text)."""
    import random

    from isaac_kafka_streaming_spark.extensions.dedup import (
        PASSAGE_SCRUB_BLOCK,
        PASSAGE_SCRUB_MAX_DF,
        passage_scrub,
    )

    rng = random.Random(7)
    vocab = "aa bb cc dd ee ff gg hh".split()
    boiler = " ".join(rng.choice(vocab) for _ in range(PASSAGE_SCRUB_BLOCK))
    docs = []
    for d in range(40):
        words = [rng.choice(vocab) for _ in range(rng.randint(5, 40))]
        text = " ".join(words)
        if d % 3 == 0:
            # plant the boilerplate run at a block-aligned offset so it
            # lands as one grid block in >1/3 of docs (df > max_df)
            text = boiler + " " + text
        docs.append((d, text))
    base = tmp_path_factory.mktemp("scrub_ref")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(base / "documents.parquet")
    )

    B = PASSAGE_SCRUB_BLOCK

    def blocks(text):
        toks = [t for t in text.lower().split() if t]
        return [
            " ".join(toks[i : i + B]) for i in range(0, len(toks), B)
        ]

    df = {}
    for _, text in docs:
        for b in set(blocks(text)):
            df[b] = df.get(b, 0) + 1
    hot = {b for b, c in df.items() if c > PASSAGE_SCRUB_MAX_DF}
    assert boiler in hot, "planted span not hot — fixture broken"

    got = {
        r.doc_id: (r.n_blocks, r.n_scrubbed, r.cleaned_text)
        for r in passage_scrub(spark, str(base)).collect()
    }
    for d, text in docs:
        blks = blocks(text)
        kept = [b for b in blks if b not in hot]
        n_scrubbed = len(blks) - len(kept)
        assert got[d] == (len(blks), n_scrubbed, " ".join(kept)), f"doc {d}"
    assert any(v[1] > 0 for v in got.values())


def test_incoming_minhash_bucket_cap_bounds_boilerplate_fanout(
    spark, tmp_path_factory
):
    """Hot-band guard on the incoming probe (round-7): a boilerplate
    cluster spanning both slices lands in the same band bucket in
    every band; with max_bucket_size set those buckets are excised —
    the cluster produces ZERO candidates — while a planted near-dup
    pair in a cold bucket is still found.  With the cap off, the
    boilerplate cluster floods the probe (the quadratic the cap
    exists to prevent)."""
    import hashlib

    from isaac_kafka_streaming_spark.extensions.dedup import (
        dedup_incoming_minhash,
        dedup_incoming_minhash_md5,
        unpersist_deps,
    )

    def bucket(doc_id: int) -> int:
        h = hashlib.md5(("inc" + str(doc_id)).encode()).hexdigest()
        return int(h[:4], 16) % 100

    existing_ids = [i for i in range(3000) if bucket(i) < 90]
    incoming_ids = [i for i in range(3000) if bucket(i) >= 90]
    boiler = (
        "terms of service apply to all users of this site including "
        "liability privacy cookies tracking consent arbitration"
    )
    pair_text = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    rows = [(existing_ids[0], pair_text),
            (incoming_ids[0], pair_text + " phi")]
    # 30 identical boilerplate docs across both slices
    rows += [(existing_ids[1 + i], boiler) for i in range(20)]
    rows += [(incoming_ids[1 + i], boiler) for i in range(10)]
    base = tmp_path_factory.mktemp("inc_cap")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(base / "documents.parquet")
    )
    for fn in (dedup_incoming_minhash, dedup_incoming_minhash_md5):
        uncapped = fn(spark, str(base), threshold=0.5)
        got_all = {r.doc_id for r in uncapped.collect()}
        unpersist_deps(uncapped)
        # uncapped: every incoming boilerplate doc matches the cluster
        assert set(incoming_ids[1:11]) <= got_all and incoming_ids[0] in got_all
        capped = fn(spark, str(base), threshold=0.5, max_bucket_size=8)
        got = {r.doc_id: r.near_dup_of for r in capped.collect()}
        unpersist_deps(capped)
        # capped: the hot cluster is excised, the cold planted pair stays
        assert got == {incoming_ids[0]: existing_ids[0]}, (fn.__name__, got)


def test_anchor_df_cap_bounds_containment_fanout(spark, tmp_path_factory):
    """Hot-anchor guard on the rarest-ngram containment tiers
    (round-7): an exact-dup/boilerplate clique's rarest shingle has
    df = clique size, so each member probes the whole clique; with
    max_anchor_df set the clique is excised (the hash tiers own exact
    dups) while a cold containment pair is still found."""
    import hashlib

    from isaac_kafka_streaming_spark.extensions.dedup import (
        contained_documents,
    )
    from isaac_kafka_streaming_spark.extensions.sampling import (
        decontaminate_exact,
    )

    inner = "omega psi chi phi upsilon tau sigma rho"
    container = f"prefix words here {inner} suffix words there"
    boiler = (
        "terms of service apply to all users of this site including "
        "liability privacy cookies tracking consent arbitration"
    )

    # --- contained_documents: whole-corpus self-referential form ---
    rows = [(0, inner), (1, container)] + [
        (10 + i, boiler) for i in range(12)
    ]
    base = tmp_path_factory.mktemp("anchor_cap")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(base / "documents.parquet")
    )
    uncapped = {
        (r.doc_id, r.first_container_id)
        for r in contained_documents(spark, str(base)).collect()
    }
    # clique members are contained by lower-id equals; pair found too
    assert (0, 1) in uncapped and len(uncapped) > 1
    capped = {
        (r.doc_id, r.first_container_id)
        for r in contained_documents(
            spark, str(base), max_anchor_df=8
        ).collect()
    }
    assert capped == {(0, 1)}

    # --- decontaminate_exact: eval-vs-train form ---
    def bucket(doc_id: int) -> int:
        # split_assignment's rule: md5(doc_id), no salt; < 10 = held out
        h = hashlib.md5(str(doc_id).encode()).hexdigest()
        return int(h[:4], 16) % 100

    train_ids = [i for i in range(3000) if bucket(i) >= 10]
    eval_ids = [i for i in range(3000) if bucket(i) < 10]
    rows2 = [(eval_ids[0], inner), (train_ids[0], container)]
    rows2 += [(train_ids[1 + i], boiler) for i in range(10)]
    rows2 += [(eval_ids[1 + i], boiler) for i in range(4)]
    base2 = tmp_path_factory.mktemp("anchor_cap_decon")
    spark.createDataFrame(rows2, "doc_id long, text string").write.parquet(
        str(base2 / "documents.parquet")
    )
    unc = {r.eval_doc_id for r in decontaminate_exact(spark, str(base2)).collect()}
    assert eval_ids[0] in unc and set(eval_ids[1:5]) <= unc
    cap = {
        r.eval_doc_id
        for r in decontaminate_exact(
            spark, str(base2), max_anchor_df=5
        ).collect()
    }
    assert cap == {eval_ids[0]}
