"""Generate a scaled bench-only dataset by deterministic replication.

    python tools/gen_scaled_sf.py /root/testdata/sf0.1 /root/scaled/sf1 10

Replicates every table R times with key offsets chosen so that all
foreign keys stay consistent (replica i's orders reference replica i's
customers, etc.).  Row-level payloads (text, embeddings, props, dates)
are byte-identical across replicas, so per-key distributions match the
source exactly while every fact-table cardinality scales by R.

BENCH-ONLY: the output is for wall-clock measurement at a larger SF
(the round-15 verdict's item 6 — sf0.1 sits at the per-job scheduling
floor and can no longer resolve optimization wins).  It is NEVER used
for oracle correctness; /root/testdata stays the only parity source.
Fixed dims (region, nation) are copied unchanged; every scaled key is
offset by i * (max_key + 1) of its table so replicas never collide.

Workload notes (what replication does to each family):
  * TPC-H / events analytics: group counts scale by R, group keys and
    per-group distributions unchanged — the intended scale-up.
  * dedup / similarity: replica documents and embeddings are exact
    duplicates, so duplicate-cluster sizes scale by R — heavier (not
    lighter) than organic data for the candidate-pair stages, which is
    the conservative direction for a bench.
  * graph: page ids (events props.k payloads) are unchanged, so |V|
    stays catalog-sized while edge weights scale by R — exactly the
    100 TB shape (the event log is the fact, the page catalog a dim).
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

# per-table key columns to offset: {table: {column: base_table}} —
# a column offsets by i * (max(base_table's own key) + 1) so every
# FK points into the same replica's copy of its target.
COPY_ONLY = {"region", "nation"}
KEYED = {
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
    "part": {"p_partkey": ("part", "p_partkey")},
    "orders": {
        "o_orderkey": ("orders", "o_orderkey"),
        "o_custkey": ("customer", "c_custkey"),
    },
    "lineitem": {
        "l_orderkey": ("orders", "o_orderkey"),
        "l_partkey": ("part", "p_partkey"),
        "l_suppkey": ("supplier", "s_suppkey"),
    },
    "events": {
        "event_id": ("events", "event_id"),
        "user_id": ("events", "user_id"),
    },
    "documents": {"doc_id": ("documents", "doc_id")},
    "embeddings": {"vec_id": ("embeddings", "vec_id")},
}


def main() -> None:
    src, dst, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    # offset base per (table, key): max over the source + 1
    bases: dict[tuple[str, str], int] = {}
    for tab, cols in KEYED.items():
        t = pq.read_table(os.path.join(src, f"{tab}.parquet"))
        for col, (btab, bcol) in cols.items():
            if (btab, bcol) not in bases:
                bt = (
                    t
                    if btab == tab
                    else pq.read_table(os.path.join(src, f"{btab}.parquet"))
                )
                import pyarrow.compute as pc

                bases[(btab, bcol)] = pc.max(bt.column(bcol)).as_py() + 1
    import pyarrow.compute as pc

    for fname in sorted(os.listdir(src)):
        tab = fname.rsplit(".", 1)[0]
        t = pq.read_table(os.path.join(src, fname))
        out = os.path.join(dst, fname)
        if tab in COPY_ONLY:
            pq.write_table(t, out)
            print(f"{tab}: copied ({t.num_rows} rows)")
            continue
        chunks = []
        for i in range(reps):
            if i == 0:
                chunks.append(t)
                continue
            cols = []
            for name in t.column_names:
                col = t.column(name)
                spec = KEYED.get(tab, {}).get(name)
                if spec is not None:
                    off = i * bases[spec]
                    col = pc.add(col, pa.scalar(off, type=col.type))
                cols.append(col)
            chunks.append(pa.table(cols, names=t.column_names))
        scaled = pa.concat_tables(chunks)
        pq.write_table(scaled, out)
        print(f"{tab}: {t.num_rows} -> {scaled.num_rows} rows")


if __name__ == "__main__":
    main()
