"""Interleaved A/B wall measurement: min-of-5 warm per named query
(the bench.py protocol: noop sink, clearCache + GC between queries),
one JSON line out.  Run alternately against old/new code (git stash
sandwich) in separate processes — absolute numbers from different
sessions are NOT comparable (see SCALE_DESIGN.md ambient-drift notes).

Usage: python tools/ab_wall.py <label> <query> [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from isaac_kafka_streaming_spark.queries import all_queries, retired_tiers  # noqa: E402
from isaac_kafka_streaming_spark.session import get_spark  # noqa: E402


def main() -> int:
    label = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-wall")
    fns = {n: qd.fn for n, qd in all_queries().items()}
    fns.update(retired_tiers())
    fns["event_type_counts"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    out = {}
    for name in names:
        runs = []
        for _ in range(5):
            t0 = time.perf_counter()
            fns[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = min(runs)
        spark.catalog.clearCache()
        spark._jvm.System.gc()
    print(json.dumps({"label": label, "min5": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
