"""Shuffle census: rank every live + retired query's physical plan by
`Exchange hashpartitioning` count and duplicate partitioning keys —
the follow-up sweep to the round-8 scan census (SCALE_DESIGN.md
"Round 8, late: the shuffle census").

Interpretation discipline (why this is a RANKING, not a lint):

* A duplicate-key exchange over a BOUNDED frame (vocab/lang/bin/user
  histograms, scalar chains) is noise at any scale; a duplicate
  exchange over CORPUS rows is the real finding.  The census can't
  tell the two apart statically — read the top plans.
* Counts are collected from `executedPlan().toString()`, which
  REPRINTS the lineage under InMemoryRelation nodes, so cached plans
  over-count in absolute terms.  Relative ranking survives this; the
  scan census and per-query wall times are the confirming metrics.

Round-8 verdict (recorded in SCALE_DESIGN.md): no corpus-scale
redundancy — the high-exchange plans (bpe_learn 15-17, funnel 10,
histogram/temperature 8-10) all shuffle bounded frames or genuinely
distinct per-round data.

Usage: cd /tmp && python /root/repo/tools/shuffle_census.py [sf_dir]
"""

from __future__ import annotations

import collections
import re
import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from pyspark.sql import SparkSession

    from isaac_kafka_streaming_spark.queries import (
        all_queries,
        retired_tiers,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("shuffle-census")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    entries = {n: qd.fn for n, qd in all_queries().items()}
    entries.update(retired_tiers())
    rows = []
    for name, fn in entries.items():
        try:
            plan = (
                fn(spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as e:  # noqa: BLE001
            rows.append((name, -1, -1, str(e)[:60]))
            continue
        ex = plan.count("Exchange hashpartitioning")
        keys = collections.Counter(
            re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
        )
        dup = sum(c - 1 for c in keys.values() if c > 1)
        rows.append((name, ex, dup, ""))
    rows.sort(key=lambda r: (-r[1], -r[2]))
    for name, ex, dup, err in rows:
        print(f"{ex:3d} exch  {dup:2d} dup-key  {name} {err}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
