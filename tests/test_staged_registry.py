"""Structural pins for the staging mechanism
(queries.staged_queries) — the per-operator parity/invariant tests live
next to their modules; this file keeps the staging mechanism itself
honest.  Since round 7 the staged set is EMPTY (the 30 round-6-staged
entries were registered); the pins below also lock in that the
registration actually happened and that the rotation stays feasible one
round ahead.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

from isaac_kafka_streaming_spark.queries import all_queries, staged_queries

REPO = Path(__file__).resolve().parent.parent

# the 30 entries staged during round 6 and registered at the start of
# round 7 (COVERAGE.md "Registered in round 7" table)
ROUND7_REGISTERED = [
    "tpch_q8", "tpch_q9", "tpch_q19", "tpch_q12", "tpch_q2",
    "tpch_q11", "tpch_q20", "tpch_q21", "hll_distinct_md5",
    "histogram_quantiles", "user_daily_gapfill",
    "funnel_signup_purchase", "cohort_retention", "contained_documents",
    "bloom_prefilter", "passage_scrub", "source_overlap_matrix",
    "priority_sample", "temperature_mixture", "knn_pq",
    "bigram_perplexity", "cms_heavy_hitters", "corpus_report",
    "vocab_coverage", "bpe_learn", "bpe_tokenize_stats",
    "winnow_fingerprints", "pmi_top_pairs", "winnow_probe_incoming",
    "feature_hash_embed",
]


def test_staged_disjoint_from_live_registry():
    """A name must never be both staged and live — registration moves
    it, never copies it (two sources of truth would let the staged
    copy rot unnoticed)."""
    live = set(all_queries())
    staged = set(staged_queries())
    assert not (live & staged), live & staged


def test_staged_entries_all_oracle_backed():
    """Staging exists to land entries FULLY oracle-checked at
    registration; a rows-only staged entry would be a contradiction.
    (Vacuously green while the staged set is empty.)"""
    for name, qd in staged_queries().items():
        assert qd.sql is not None, name
        assert callable(qd.fn), name
        assert qd.doc, name


def test_round7_registration_complete():
    """All 30 round-6-staged entries are live, oracle-backed, and front
    the round-7 driver window (tier T0 — they have no driver rows yet,
    so every one must be in the first 50 of all_queries())."""
    live = all_queries()
    assert len(ROUND7_REGISTERED) == 30
    window = list(live)[:50]
    for name in ROUND7_REGISTERED:
        assert name in live, f"{name} was staged but never registered"
        assert live[name].sql is not None, name
        assert name in window, f"{name} registered but not in-window"


def test_registered_names_cover_coverage_doc():
    """COVERAGE.md's "Registered in round 7" table and
    ROUND7_REGISTERED must list the same operators (the judge reads the
    doc; the registry runs the code)."""
    text = (REPO / "COVERAGE.md").read_text()
    section = text.split("## Registered in round 7", 1)[1]
    doc_names = set(re.findall(r"^\| `([a-z0-9_]+)` \|", section, re.M))
    # the doc table lists the public callable for the mixture entry
    expected_doc = (set(ROUND7_REGISTERED) - {"temperature_mixture"}) | {
        "temperature_mixture_plan"
    }
    assert doc_names == expected_doc, sorted(doc_names ^ expected_doc)


def test_next_round_window_is_feasible():
    """Rotation look-ahead guard: assuming the current window goes
    green next round, the round after must still be able to satisfy
    the K=3 freshness invariant — entries with no driver row (tier T0,
    including any future staged registrations) plus entries whose last
    green would then be more than K-1 rounds back must fit the 50-slot
    window.  This is the guard that (correctly) failed at round-6 HEAD
    when 30 staged entries exceeded the capacity of the then-K=2
    invariant; it now runs every round so over-staging can never ship
    silently again."""
    from tests.test_registry import DRIVER_WINDOW, _is_green

    hist = {}
    for p in REPO.glob("CORRECTNESS_r*.json"):
        m = re.match(r"CORRECTNESS_r(\d+)\.json", p.name)
        if m:
            hist[int(m.group(1))] = json.loads(p.read_text())
    if not hist:
        return
    latest = max(hist)
    last_green = {}
    for rnd in sorted(hist):
        for name, row in hist[rnd].items():
            if isinstance(row, dict) and _is_green(row):
                last_green[name] = rnd

    live = all_queries()
    # assume the current window goes green in round latest+1
    simulated = latest + 1
    for name in list(live)[:DRIVER_WINDOW]:
        last_green[name] = simulated

    t0 = [n for n in list(live) + list(staged_queries())
          if n not in last_green]
    t1 = [n for n, lg in last_green.items()
          if n in live and lg <= simulated - 2]
    assert len(t0) + len(t1) <= DRIVER_WINDOW, (
        f"round-{simulated + 1} window infeasible: "
        f"{len(t0)} never-checked + {len(t1)} invariant-required "
        f"> {DRIVER_WINDOW}"
    )
