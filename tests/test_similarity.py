"""X3 similarity search — IVF approximation quality vs the brute-force
baseline, and scale-path sanity.
"""

from __future__ import annotations

from isaac_kafka_streaming_spark.extensions.similarity import (
    knn_bruteforce,
    knn_ivf,
)


def test_ivf_recall_against_bruteforce(spark, sf_smoke):
    """nprobe=4 of 16 cells must recover a solid fraction of the true
    top-5 (random 64-dim data is a worst case for IVF; the contract
    here is 'approximate but useful', and deterministic)."""
    exact = {
        (r.query_id, r.neighbor_id)
        for r in knn_bruteforce(spark, sf_smoke).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in knn_ivf(spark, sf_smoke).collect()
    }
    assert len(exact) > 0
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2, f"IVF recall collapsed: {recall}"
    # determinism: same result on a second run
    approx2 = {
        (r.query_id, r.neighbor_id)
        for r in knn_ivf(spark, sf_smoke).collect()
    }
    assert approx == approx2


def test_ivf_scans_fraction_of_corpus(spark, sf_smoke):
    """The probe phase must touch ~nprobe/n_cells of the corpus, not all
    of it: every returned neighbor lies in one of the query's probed
    cells (structural guarantee of the pruning)."""
    out = knn_ivf(spark, sf_smoke, n_queries=5, k=3, n_cells=8, nprobe=2)
    rows = out.collect()
    assert len(rows) <= 5 * 3
    assert all(r.rank <= 3 for r in rows)
