"""Parity sweep for the round-7 STAGED operators (queries.staged_queries)
— the same driver-style compare tools/parity_sweep.py runs for the live
registry: row count, sorted-column schema, order-insensitive value hash
against each entry's DuckDB oracle.

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
import time

sys.path.insert(0, "/root/repo")

from tools.parity_sweep import TABLES, _value_hash  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    from pyspark.sql import SparkSession

    from isaac_kafka_streaming_spark.queries import staged_queries

    staged = staged_queries()
    if only:
        unknown = only - set(staged)
        if unknown:
            print(f"unknown staged names: {sorted(unknown)}")
            return 1
        staged = {n: q for n, q in staged.items() if n in only}

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("stage-check")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    failed: list[str] = []
    for name, qd in staged.items():
        t0 = time.perf_counter()
        try:
            df = qd.fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: spark raised {type(e).__name__}: {e}")
            continue
        try:
            res = con.execute(qd.sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: duckdb raised {type(e).__name__}: {e}")
            continue
        problems = []
        if len(rows) != len(orows):
            problems.append(f"rows {len(rows)} != {len(orows)}")
        if sorted(cols) != sorted(ocols):
            problems.append(f"schema {sorted(cols)} != {sorted(ocols)}")
        elif _value_hash(rows, cols) != _value_hash(orows, ocols):
            problems.append("value-hash mismatch")
        if problems:
            failed.append(name)
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(
                f"ok   {name}: {len(rows)} rows match "
                f"({time.perf_counter() - t0:.1f}s)"
            )

    print(
        f"\n{len(staged) - len(failed)}/{len(staged)} staged pass"
        + (f"; FAILED: {', '.join(failed)}" if failed else "")
    )
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
