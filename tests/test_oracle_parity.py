"""Oracle parity — mimics the driver's t2 check locally.

For every registry entry with an oracle: run the Spark query and the
DuckDB SQL on the same parquet, sort columns by name and rows by all
columns, and compare values exactly (floats exactly too — both sides
ROUND their aggregates, so any drift is a real lockstep bug).
"""

from __future__ import annotations

import math
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from isaac_kafka_streaming_spark.io import TABLES
from isaac_kafka_streaming_spark.queries import all_queries

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")

_REGISTRY = all_queries()
_ORACLE_CASES = sorted(n for n, q in _REGISTRY.items() if q.sql is not None)
_ROWS_ONLY = sorted(n for n, q in _REGISTRY.items() if q.sql is None)


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon_cell(v) -> str:
    """Canonical sortable string for container-valued cells (array/map
    columns — e.g. feature_hash_embed's vec) so row ordering works;
    floats via %.6g, matching tools/parity_sweep._norm."""
    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return (
            "{" + ",".join(f"{k}:{_canon_cell(v[k])}" for k in sorted(v)) + "}"
        )
    if isinstance(v, float):
        return f"{v:.6g}"
    return str(v)


def _normalize(df):
    """Sort columns by name, rows by all values, reset index.
    Container-valued columns (ndarray/list/dict cells) sort by their
    canonical string — pandas can't lexsort unhashable cells."""
    df = df[sorted(df.columns)]
    if len(df):
        keys = {}
        for c in df.columns:
            col = df[c]
            if col.dtype == object and col.map(
                lambda v: isinstance(v, (list, tuple, dict, np.ndarray))
            ).any():
                keys[c] = col.map(_canon_cell)
            else:
                keys[c] = col
        order = pd.DataFrame(keys).sort_values(by=list(df.columns)).index
        df = df.loc[order]
    return df.reset_index(drop=True)


def _is_scalar_na(v) -> bool:
    # pd.isna on list-valued cells returns an array; only scalars count.
    if isinstance(v, (list, tuple)) or hasattr(v, "__len__"):
        return False
    return bool(pd.isna(v))


def _values_equal(a, b) -> bool:
    if isinstance(a, np.ndarray):
        a = a.tolist()
    if isinstance(b, np.ndarray):
        b = b.tolist()
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(
            _values_equal(x, y) for x, y in zip(a, b)
        )
    if _is_scalar_na(a) and _is_scalar_na(b):
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


@pytest.mark.parametrize("name", _ORACLE_CASES)
def test_matches_oracle(spark, name):
    qd = _REGISTRY[name]
    got = _normalize(qd.fn(spark, SF_DIR).toPandas())
    con = _duck(SF_DIR)
    want = _normalize(con.execute(qd.sql).fetchdf())
    con.close()

    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    # dtype discipline: numeric kind+width must match exactly (the
    # driver compares schemas; int32-vs-int64 or HUGEINT drift counts);
    # datetimes may differ in unit only.
    for col in got.columns:
        g, w = got[col].dtype, want[col].dtype
        gk, wk = g.kind, w.kind
        if gk == "M" and wk == "M":
            continue
        assert (gk, g.itemsize) == (wk, w.itemsize), (
            f"{name}.{col}: dtype {g} vs oracle {w}"
        )
    assert len(got) == len(want), f"{name}: {len(got)} rows vs oracle {len(want)}"
    for col in got.columns:
        gv, wv = got[col].tolist(), want[col].tolist()
        bad = [
            (i, a, b)
            for i, (a, b) in enumerate(zip(gv, wv))
            if not _values_equal(a, b)
        ][:5]
        assert not bad, f"{name}.{col}: first mismatches {bad}"


def _check_minhash(rows):
    for r in rows:
        assert r.doc_a < r.doc_b
        assert r.jaccard >= 0.35


def _check_simhash(rows):
    for r in rows:
        assert r.doc_a < r.doc_b
        assert 0 <= r.hamming <= 6


def _check_knn_ivf(rows):
    per_query = {}
    for r in rows:
        assert r.query_id < 10 and r.neighbor_id != r.query_id
        per_query.setdefault(r.query_id, []).append(r.rank)
    for q, ranks in per_query.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q


def _check_clusters(rows):
    by_cluster = {}
    for r in rows:
        assert r.cluster_id <= r.doc_id
        assert r.is_canonical == (r.doc_id == r.cluster_id)
        by_cluster.setdefault(r.cluster_id, []).append(r.doc_id)
    for cid, members in by_cluster.items():
        assert cid in members, f"cluster {cid} lost its canonical doc"
        assert len(members) >= 2, f"singleton cluster {cid} (no edge)"


# rows-only ops don't get a DuckDB compare; pin their semantic
# invariants instead so "runs and returns rows" can't silently rot
def _check_kmeans(rows):
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r.cell_id, set()).add(r.pos)
        assert r.n_members >= 1
    for cell, positions in by_cell.items():
        assert positions == set(range(1, 65)), f"cell {cell} wrong dims"
    assert 1 <= len(by_cell) <= 8  # <= k cells, empty cells dropped


_INVARIANTS = {
    "knn_ivf": _check_knn_ivf,
    "dedup_clusters": _check_clusters,
    "kmeans_centroids": _check_kmeans,
}


def test_registry_fully_oracle_backed():
    """Since the round-8 retirement of the six rows-only production
    tiers (each shadowed by a registered hash-checked witness of the
    same mechanism), EVERY graded registry entry must carry a DuckDB
    oracle — a new rows-only registration needs an explicit witness
    story, not a silent `sql=None`."""
    assert _ROWS_ONLY == [], _ROWS_ONLY


@pytest.mark.parametrize("name", sorted(_INVARIANTS))
def test_oracle_entries_semantic_invariants(spark, name):
    """Belt-and-braces on top of the oracle compare for entries whose
    SQL twin replays the implementation closely: pin the semantic shape
    (rank contiguity, canonical-member clusters, centroid dims) that a
    lockstep bug in BOTH engines could otherwise preserve."""
    rows = _REGISTRY[name].fn(spark, SF_DIR).collect()
    assert rows, f"{name}: no rows to check invariants on"
    _INVARIANTS[name](rows)


def _check_incoming_minhash(rows):
    seen = set()
    for r in rows:
        assert r.doc_id != r.near_dup_of
        assert r.jaccard >= 0.5
        assert r.doc_id not in seen, "more than one best match per doc"
        seen.add(r.doc_id)


def _check_knn_lsh(rows):
    per_query = {}
    for r in rows:
        assert r.neighbor_id != r.query_id
        per_query.setdefault(r.query_id, []).append(r.rank)
    for q, ranks in per_query.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q


def _check_ngram_jaccard(rows):
    for r in rows:
        assert r.doc_a < r.doc_b
        assert r.jaccard >= 0.35
    assert len({(r.doc_a, r.doc_b) for r in rows}) == len(rows)


_RETIRED_CHECKS = {
    "dedup_minhash_lsh": _check_minhash,
    "dedup_simhash": _check_simhash,
    "dedup_ngram_jaccard": _check_ngram_jaccard,  # retired round 10;
    # cap semantics + capped-subset pins live in tests/test_dedup_guards.py,
    # and the uncapped pipeline stays hash-checked inside dedup_clusters'
    # closure oracle
    "dedup_incoming_minhash": _check_incoming_minhash,
    "dedup_clusters_lsh": _check_clusters,
    "knn_lsh": _check_knn_lsh,
    "sketch_summaries": lambda rows: None,  # error bounds pinned in
    # tests/test_operators.py::test_sketch_summaries_error_bounds
}


def _retired_tiers():
    from isaac_kafka_streaming_spark.queries import retired_tiers

    tiers = retired_tiers()
    assert set(tiers) == set(_RETIRED_CHECKS), set(tiers) ^ set(_RETIRED_CHECKS)
    return {n: (fn, _RETIRED_CHECKS[n]) for n, fn in tiers.items()}


@pytest.mark.parametrize("name", sorted(_retired_tiers()))
def test_retired_tiers(spark, name):
    """The production tiers retired from the graded registry — six in
    round 8 (engine-specific hashing / implementation-defined sketch
    values -> rows-only under the driver) plus the uncapped n-gram
    Jaccard tier in round 10 (same mechanism as its capped twin, and
    still hash-checked inside dedup_clusters' closure oracle); each
    mechanism is carried by a registered hash-checked witness.
    Direct-call pins so the retired tier itself — not just its witness
    — keeps running and keeps its semantic shape.  sketch_summaries'
    error bounds are pinned separately in tests/test_operators.py."""
    fn, check = _retired_tiers()[name]
    df = fn(spark, SF_DIR)
    rows = df.collect()
    assert len(df.schema.fields) > 0
    assert rows, f"{name}: no rows to check invariants on"
    check(rows)
