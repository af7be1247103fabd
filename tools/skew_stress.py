"""Skew stress harness — MEASURE that the fan-out caps bind where the
docstrings claim (round-7 verdict item 5: the caps were tested for
correctness under manufactured skew in tests/test_dedup_guards.py, but
never timed on a heavy-tail corpus bigger than the graded fixtures).

Builds a deterministic ~10x skewed documents table from sf0.1:
  * every source doc replicated 10x (new doc_ids, per-replica source
    labels -> 200 sources), ~50k docs;
  * a fixed ~30-token boilerplate passage appended to 5% of docs (the
    heavy-tail shared passage: its shingles/fingerprints land in
    ~2,500 documents across all sources);
  * 2% of docs replaced by EXACT copies of the boilerplate alone (the
    pathological clique: every such doc's rarest shingle has df ~1000,
    the shape the hot-anchor cap excises).

Then times each capped operator twice — cap set to 64 vs cap
effectively off — and prints a table for SCALE_DESIGN.md.  (64 is the
shipped default for the source/fingerprint caps; contained_documents'
GRADED entry runs with max_anchor_df=None — cap off is its default
semantics, and the 64 run shows what engaging the guard buys.)

Usage: cd /tmp && python /root/repo/tools/skew_stress.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

BOILERPLATE = (
    "this material is provided as is without warranty of any kind either "
    "express or implied including but not limited to the implied "
    "warranties of merchantability and fitness for a particular purpose "
    "all rights reserved by the publisher"
)

UNCAPPED = 1_000_000_000


def build_skewed(
    src_dir: str,
    out_dir: str,
    clique_mod: int = 50,
    n_sources: int | None = None,
) -> None:
    """clique_mod controls the exact-boilerplate clique share (1/mod of
    all docs): 50 -> 2% (the default heavy tail), 10 -> 10% (the
    pathological wall, --heavy).  n_sources (``--sources N``) relabels
    sources as doc_id % N synthetic feeds — the syndication regime
    where the per-passage source cap actually binds (sources >> cap)."""
    src_expr = (
        "d.source || '_' || CAST(r.rep AS VARCHAR)"
        if n_sources is None
        else f"'feed_' || CAST((d.doc_id * 10 + r.rep) % {n_sources} "
             f"AS VARCHAR)"
    )
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
            WITH r AS (SELECT UNNEST(range(10)) AS rep),
            base AS (
                SELECT d.doc_id * 10 + r.rep AS doc_id,
                       d.text, d.lang,
                       {src_expr} AS source
                FROM '{src_dir}/documents.parquet' d CROSS JOIN r
            ),
            skewed AS (
                SELECT doc_id,
                       CASE
                           WHEN doc_id % {clique_mod} = 7
                               THEN '{BOILERPLATE}'
                           WHEN doc_id % 20 = 3
                               THEN text || ' {BOILERPLATE}'
                           ELSE text
                       END AS text,
                       lang, source
                FROM base
            )
            SELECT doc_id, text, lang, source,
                   CAST(length(text) AS BIGINT) AS n_chars
            FROM skewed ORDER BY doc_id
        ) TO '{out_dir}/documents.parquet' (FORMAT PARQUET)
        """
    )
    n, hot, clique = con.execute(
        f"""
        SELECT COUNT(*),
               COUNT(CASE WHEN doc_id % 20 = 3 AND doc_id % {clique_mod}
                          <> 7 THEN 1 END),
               COUNT(CASE WHEN doc_id % {clique_mod} = 7 THEN 1 END)
        FROM '{out_dir}/documents.parquet'
        """
    ).fetchone()
    print(f"skewed corpus: {n} docs, {hot} boilerplate-suffixed, "
          f"{clique} exact-boilerplate clique docs")


def time_once(fn, *args, **kwargs) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = fn(*args, **kwargs).count()
    return time.perf_counter() - t0, n


def main() -> int:
    argv = sys.argv[1:]
    heavy = "--heavy" in argv
    n_sources = None
    if "--sources" in argv:
        i = argv.index("--sources")
        n_sources = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    args = [a for a in argv if not a.startswith("--")]
    src = args[0] if args else "/root/testdata/sf0.1"
    out = os.environ.get("SKEW_DIR", "/tmp/skewdata")
    build_skewed(
        src, out, clique_mod=10 if heavy else 50, n_sources=n_sources
    )

    from isaac_kafka_streaming_spark.extensions.dedup import (
        contained_documents,
        source_overlap_matrix,
    )
    from isaac_kafka_streaming_spark.extensions.text import (
        winnow_probe_incoming,
    )
    from isaac_kafka_streaming_spark.session import get_spark

    spark = get_spark("skew-stress")
    spark.sparkContext.setLogLevel("ERROR")

    cases = [
        # (name, callable, cap-on kwargs, cap-off kwargs)
        (
            "contained_documents",
            contained_documents,
            {"max_anchor_df": 64},
            {"max_anchor_df": None},
        ),
        (
            "source_overlap_matrix",
            source_overlap_matrix,
            {"max_sources_per_passage": 64},
            {"max_sources_per_passage": UNCAPPED},
        ),
        (
            "winnow_probe_incoming",
            winnow_probe_incoming,
            {"max_corpus_docs_per_fp": 64},
            {"max_corpus_docs_per_fp": UNCAPPED},
        ),
    ]
    print(f"{'operator':<24} {'cap-on s':>9} {'rows':>8} "
          f"{'cap-off s':>10} {'rows':>9} {'speedup':>8}")
    for name, fn, on_kw, off_kw in cases:
        t_on, n_on = time_once(fn, spark, out, **on_kw)
        spark.catalog.clearCache()
        t_off, n_off = time_once(fn, spark, out, **off_kw)
        spark.catalog.clearCache()
        print(f"{name:<24} {t_on:>9.2f} {n_on:>8} "
              f"{t_off:>10.2f} {n_off:>9} {t_off / t_on:>7.1f}x")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
