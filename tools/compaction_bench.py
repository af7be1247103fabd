"""Measure what delta-log compaction buys at read time — evidence for
the round-10 lifecycle claim (SCALE_DESIGN "Round 10: delta-log
compaction"): the graph store accretes one file set per micro-batch,
and the read-time fold pays file listing + per-file open + footer
decode for every one of them forever, until compact_store folds the
log into a snapshot.

Builds a graph store by appending N per-batch edge deltas through the
real ingest writer (manifest protocol and all), times the read-off
fold (edges_from_graph_store -> count) cold at several log lengths,
compacts, and times the same fold over the snapshot.  min-of-2 per
point (the skew_stress discipline).

Usage: cd /tmp && python /root/repo/tools/compaction_bench.py [n_batches]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Row  # noqa: E402


def main() -> int:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 64

    from isaac_kafka_streaming_spark.extensions.graph import (
        append_transitions_to_graph_store,
        compact_graph_store,
        edges_from_graph_store,
    )
    from isaac_kafka_streaming_spark.session import get_spark
    from isaac_kafka_streaming_spark.streaming.topology import (
        _store_files,
        index_ingest_batch_writer,
    )

    spark = get_spark("compaction-bench")
    spark.sparkContext.setLogLevel("ERROR")

    store = "/tmp/compaction_bench_store"
    shutil.rmtree(store, ignore_errors=True)
    writer = index_ingest_batch_writer(
        store, append_transitions_to_graph_store, data_subdir="edges"
    )

    def batch(i: int):
        # ~50 (src, dst) deltas per batch over a 100-page catalog
        return spark.createDataFrame(
            [
                Row(src=(i * 7 + j) % 100, dst=(i * 11 + j * 3 + 1) % 100,
                    n=1 + (i + j) % 5)
                for j in range(50)
                if (i * 7 + j) % 100 != (i * 11 + j * 3 + 1) % 100
            ]
        )

    def time_fold() -> float:
        best = float("inf")
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            edges_from_graph_store(spark, store).count()
            best = min(best, time.perf_counter() - t0)
        return best

    print(f"{'log state':<28} {'files':>6} {'fold s':>8}")
    checkpoints = sorted({n_batches // 4, n_batches // 2, n_batches})
    done = 0
    for point in checkpoints:
        for i in range(done, point):
            writer(batch(i), i)
        done = point
        files = len(_store_files(f"{store}/edges"))
        print(f"{'append-only, ' + str(point) + ' batches':<28} "
              f"{files:>6} {time_fold():>8.2f}")
    stats = compact_graph_store(spark, store)
    files = len(_store_files(f"{store}/edges"))
    print(f"{'compacted snapshot':<28} {files:>6} {time_fold():>8.2f}"
          f"   ({stats['input_files']} -> {stats['output_files']} files)")
    shutil.rmtree(store, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
