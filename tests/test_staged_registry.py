"""Structural pins for the round-7 staged registry
(queries.staged_queries) — the per-operator parity/invariant tests live
next to their modules; this file keeps the staging mechanism itself
honest."""

from __future__ import annotations

from isaac_kafka_streaming_spark.queries import all_queries, staged_queries


def test_staged_disjoint_from_live_registry():
    """A name must never be both staged and live — registration moves
    it, never copies it (two sources of truth would let the staged
    copy rot unnoticed)."""
    live = set(all_queries())
    staged = set(staged_queries())
    assert not (live & staged), live & staged


def test_staged_entries_all_oracle_backed():
    """Staging exists to land entries FULLY oracle-checked in round 7;
    a rows-only staged entry would be a contradiction."""
    for name, qd in staged_queries().items():
        assert qd.sql is not None, name
        assert callable(qd.fn), name
        assert qd.doc, name


def test_staged_names_cover_coverage_doc():
    """COVERAGE.md's staged table and staged_queries() must list the
    same operators (the judge reads the doc; the sweep runs the dict)."""
    import re
    from pathlib import Path

    text = Path(__file__).resolve().parent.parent.joinpath(
        "COVERAGE.md"
    ).read_text()
    section = text.split("## Staged for round-7 registration", 1)[1]
    doc_names = set(re.findall(r"^\| `([a-z0-9_]+)` \|", section, re.M))
    # the doc table lists the public callable for the mixture entry
    expected_doc = (set(staged_queries()) - {"temperature_mixture"}) | {
        "temperature_mixture_plan"
    }
    assert doc_names == expected_doc, (
        sorted(doc_names ^ expected_doc)
    )


def test_round7_registration_fits_the_window():
    """Over-staging guard: assuming the current round-6 window goes
    green, registering every staged entry in round 7 must fit the
    50-slot driver window — staged entries have no driver rows (tier
    T0, must-check) and any live entry whose last green would then be
    two rounds back is also required in-window.  If this fails, too
    much was staged: split registration across rounds."""
    import json
    import re
    from pathlib import Path

    from tests.test_registry import DRIVER_WINDOW, _is_green

    repo = Path(__file__).resolve().parent.parent
    hist = {}
    for p in repo.glob("CORRECTNESS_r*.json"):
        m = re.match(r"CORRECTNESS_r(\d+)\.json", p.name)
        if m:
            hist[int(m.group(1))] = json.loads(p.read_text())
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
