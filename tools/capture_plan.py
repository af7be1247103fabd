"""Capture `.explain("formatted")` for named queries into files —
the optimization-round evidence trail (plans/<round>/<query>_{before,
after}.txt).

Usage:
    [PLAN_ROUND=r16] python tools/capture_plan.py <suffix> <query> [query ...]
    # writes plans/$PLAN_ROUND/<query>_<suffix>.txt for each
    # (PLAN_ROUND defaults to r16, the current optimization round)

The sf dir comes from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
so the captured plan is the one the bench executes.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from isaac_kafka_streaming_spark.queries import all_queries, retired_tiers  # noqa: E402
from isaac_kafka_streaming_spark.session import get_spark  # noqa: E402


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("capture-plan")
    fns = {n: qd.fn for n, qd in all_queries().items()}
    fns.update(retired_tiers())
    out_dir = os.path.join(
        REPO, "plans", os.environ.get("PLAN_ROUND", "r16")
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = fns[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
