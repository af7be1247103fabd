"""Measure pagerank_pages' scale split: the corpus-sized edge pass vs
the catalog-sized iteration, as the event log grows.

The scale claim (extensions/graph.py docstring, SCALE_DESIGN.md): the
ONLY cost that grows with the corpus is the edge aggregation (lag
window + groupBy); the five rank rounds run over page-catalog-bounded
frames and their cost is flat.  This script times both halves on the
sf0.1 events table unioned to 1x / 4x / 10x (USER-shifted copies —
each copy offsets user_id/event_id, so the per-user lag window gets
real distinct partitions to sort rather than degenerate duplicate
rows; timestamps are left unchanged, which is fine because the window
partitions by user) and prints one line per multiple — evidence for
the measured-scale-up section of SCALE_DESIGN.md.

Usage: cd /tmp && python /root/repo/tools/pagerank_scaleup.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from isaac_kafka_streaming_spark.extensions.graph import (  # noqa: E402
    pagerank_from_graph,
    page_transition_edges,
)
from isaac_kafka_streaming_spark.io import read_table  # noqa: E402
from isaac_kafka_streaming_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("pagerank-scaleup")
    spark.sparkContext.setLogLevel("ERROR")

    ev = read_table(spark, sf_dir, "events")
    for mult in (1, 4, 10):
        # ts-shifted, user-shifted copies: same page catalog, mult x
        # the transitions — the realistic growth axis (more traffic
        # over the same pages)
        parts = [
            ev.withColumn(
                "user_id", F.col("user_id") + F.lit(i * 10_000_000)
            ).withColumn(
                "event_id", F.col("event_id") + F.lit(i * 10_000_000)
            )
            for i in range(mult)
        ]
        grown = parts[0]
        for p in parts[1:]:
            grown = grown.unionByName(p)
        grown = grown.localCheckpoint()  # materialize outside timing

        t0 = time.perf_counter()
        w = None
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        seq = grown.select(
            "user_id",
            "ts",
            "event_id",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        ).filter(F.col("k").isNotNull())
        edges = (
            seq.select(
                F.col("k").alias("src"), F.lead("k").over(w).alias("dst")
            )
            .filter(
                F.col("dst").isNotNull() & (F.col("dst") != F.col("src"))
            )
            .groupBy("src", "dst")
            .agg(F.count("*").cast("double").alias("w"))
            .localCheckpoint()
        )
        t_edges = time.perf_counter() - t0

        nodes = seq.select(F.col("k").alias("page_id")).distinct()
        t0 = time.perf_counter()
        pagerank_from_graph(nodes, edges).write.format("noop").mode(
            "overwrite"
        ).save()
        t_rank = time.perf_counter() - t0
        n_events = grown.count()
        print(
            f"mult={mult} events={n_events} "
            f"edge_pass={t_edges:.2f}s rank_rounds={t_rank:.2f}s"
        )


if __name__ == "__main__":
    main()
