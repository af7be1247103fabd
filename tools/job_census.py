"""Job census: execute each named query with the noop sink and report
how many Spark JOBS it launches plus its wall time — the round-15
optimization lens.  At sf0.1 on local[32] most headline queries are
job-count-bound (~0.1-0.2 s/job scheduling+stage floor), so the board
ranking by job count IS the ranking by optimizable overhead, and at
100 TB every job is at least one synchronization barrier.

Usage:
    python tools/job_census.py [sf_dir] [query ...]
(defaults: /root/testdata/sf0.1, the full bench HEADLINE list)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from isaac_kafka_streaming_spark.queries import all_queries, retired_tiers  # noqa: E402
from isaac_kafka_streaming_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    names = args[1:]
    spark = get_spark("job-census")
    sc = spark.sparkContext
    fns = {n: qd.fn for n, qd in all_queries().items()}
    fns.update(retired_tiers())
    if not names:
        import bench

        names = bench.HEADLINE
    # warmup (uncounted)
    fns["event_type_counts"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    print(f"{'query':<28} {'jobs':>5} {'sec':>7}")
    rows = []
    def next_job_id() -> int:
        # job ids are global and monotonically increasing; the diff of
        # the allocator across a query is exactly the jobs it launched
        # (AQE stage-materialization jobs included)
        # py4j unwraps the AtomicInteger via its toString/int coercion
        # path on some versions; handle both
        nid = sc._jsc.sc().dagScheduler().nextJobId()
        return nid if isinstance(nid, int) else nid.get()

    for name in names:
        j0 = next_job_id()
        t0 = time.perf_counter()
        fns[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        j1 = next_job_id()
        spark.catalog.clearCache()
        rows.append((name, j1 - j0, dt))
        print(f"{name:<28} {j1 - j0:>5} {dt:>7.3f}")
    rows.sort(key=lambda r: -r[1])
    print("\ntop by jobs:")
    for name, jobs, dt in rows[:20]:
        print(f"{name:<28} {jobs:>5} {dt:>7.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
