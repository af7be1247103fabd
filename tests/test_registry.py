"""Registry / driver-window rotation invariants.

The grading driver verifies only the first 50 entries of ``all_queries()``
per round, so ``queries._DRIVER_CHECK_ORDER`` rotates least-recently-
verified entries into that window (see the comment block above it).
These tests pin the rotation contract so the rotation can never silently
hide a registry entry from driver verification:

* the window is exactly the first 50 names, no dupes, all registered;
* every registry entry is either in the current window or holds a green
  driver row from one of the last three recorded rounds (K=3 freshness
  — every entry driver-verified at least once every three rounds).

K is 3, not 2, because the invariant is evaluated AFTER the current
round's CORRECTNESS_r{N}.json lands, with the round-N window still in
the tree; green(r_N) ⊆ window(r_N) by construction, so K=2 would
collapse to ``live ⊆ window ∪ green(r_{N-1})`` — a hard 100-entry
registry ceiling that the round-7 registration (99 → 129 live) breaks
for ANY rotation.  K=3 is the cadence tools/plan_window.py's T1 rule
and tests/test_staged_registry.py's feasibility guard were already
written against (their "required next round" tier is lg <= latest-2),
and yields the intended 50 × 3 = 150-entry ceiling documented in
queries.py's capacity note.

No SparkSession needed — these are pure registry-shape checks.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

from isaac_kafka_streaming_spark.queries import _DRIVER_CHECK_ORDER, all_queries

REPO_ROOT = Path(__file__).resolve().parent.parent
DRIVER_WINDOW = 50
FRESHNESS_ROUNDS = 3


def _is_green(row: dict) -> bool:
    """A clean driver row: oracle triple-match, or the declared rows-only
    contract (``err == "no_oracle"`` with a row count recorded).
    Affirmative signals required — an all-None row with no err (a query
    that never actually executed) must NOT count as green."""
    if row.get("err") == "no_oracle":
        return row.get("spark_rows") is not None
    return (
        not row.get("err")
        and row.get("rows_match") is True
        and row.get("schema_match") is True
        and row.get("hash_match") is True
    )


def _correctness_history() -> dict[int, dict]:
    """round number -> parsed CORRECTNESS_r{N}.json contents."""
    hist = {}
    for p in REPO_ROOT.glob("CORRECTNESS_r*.json"):
        m = re.match(r"CORRECTNESS_r(\d+)\.json", p.name)
        if m:
            hist[int(m.group(1))] = json.loads(p.read_text())
    return hist


def test_window_is_subset_no_dupes():
    reg = all_queries()
    assert len(_DRIVER_CHECK_ORDER) == DRIVER_WINDOW
    assert len(set(_DRIVER_CHECK_ORDER)) == len(_DRIVER_CHECK_ORDER), "dupes in window"
    missing = [n for n in _DRIVER_CHECK_ORDER if n not in reg]
    assert not missing, f"window names not in registry: {missing}"
    # all_queries() must actually front-load the window in order
    assert list(reg)[:DRIVER_WINDOW] == _DRIVER_CHECK_ORDER


def test_rotation_coverage():
    """Every registry entry is in-window or driver-green within K rounds."""
    hist = _correctness_history()
    if not hist:  # fresh checkout without driver artifacts
        return
    latest = max(hist)
    recent_green = set()
    for rnd in range(latest - FRESHNESS_ROUNDS + 1, latest + 1):
        for name, row in hist.get(rnd, {}).items():
            if _is_green(row):
                recent_green.add(name)
    window = set(_DRIVER_CHECK_ORDER)
    stale = [n for n in all_queries() if n not in window and n not in recent_green]
    assert not stale, (
        f"registry entries neither in the driver window nor green within the "
        f"last {FRESHNESS_ROUNDS} rounds: {stale}"
    )


def test_failures_rotate_back_in():
    """Any entry with a red/err row in the latest round must be in-window."""
    hist = _correctness_history()
    if not hist:
        return
    latest = hist[max(hist)]
    window = set(_DRIVER_CHECK_ORDER)
    red = [name for name, row in latest.items() if not _is_green(row)]
    out = [n for n in red if n not in window]
    assert not out, f"failed-last-round entries rotated out of the window: {out}"
