"""Parity sweep for the round-7 STAGED operators (queries.staged_queries)
— the same driver-style compare tools/parity_sweep.py runs for the live
registry (the loop itself is parity_sweep.sweep, shared so the two
gates can never diverge): row count, sorted-column schema,
order-insensitive value hash against each entry's DuckDB oracle.

Run it FROM A NEUTRAL CWD (same executor-import reasoning as
parity_sweep.py):

    cd /tmp && python /root/repo/tools/stage_check.py [sf_dir] [names...]

Exit code 0 iff every staged entry hash-matches.  Round-7 registration
checklist: when a staged entry moves into the live registry, it leaves
staged_queries() and this sweep; until then this IS its driver-shaped
gate at any SF.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from tools.parity_sweep import sweep  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from isaac_kafka_streaming_spark.queries import staged_queries

    staged = staged_queries()
    if only:
        unknown = only - set(staged)
        if unknown:
            print(f"unknown staged names: {sorted(unknown)}")
            return 1
        staged = {n: q for n, q in staged.items() if n in only}

    return sweep(
        {n: (qd.fn, qd.sql) for n, qd in staged.items()},
        sf_dir,
        label=" staged",
    )


if __name__ == "__main__":
    raise SystemExit(main())
