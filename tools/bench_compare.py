"""Compare two bench result files with the noise discipline applied.

SCALE_DESIGN's round-11 measurement: per-query sub-second mins drift
±10-30% between JVM instances (the floor moves between processes), so
single-query deltas are noise by measurement — the robust comparators
are the total, the r1 subtotal, and FAMILY-level sums.  This tool
reads two BENCH_FULL.json-shaped files (or driver BENCH_r*.json with a
"queries" map) and reports exactly those, flagging only family-level
regressions past a threshold.

Usage: python tools/bench_compare.py OLD.json NEW.json [--threshold 0.15]
Exit 1 iff any family regresses past the threshold.
"""

from __future__ import annotations

import json
import sys

FAMILIES = {
    "tpch": lambda q: q.startswith("tpch_") or q in (
        "revenue_by_nation", "top_orders_per_segment",
        "customers_without_big_orders", "orders_with_returns",
    ),
    "dedup": lambda q: q.startswith("dedup_") or q in (
        "contained_documents", "bloom_prefilter", "passage_scrub",
        "source_overlap_matrix", "duplicate_passages", "prototype_prune",
    ),
    "similarity": lambda q: q.startswith(("knn_", "kmeans", "embedding_"))
    or q in ("mmr_rerank",),
    "graph": lambda q: q.startswith(("pagerank", "label_prop", "page_")),
    "text": lambda q: q.startswith(("bpe_", "winnow", "token", "lang",
                                    "tfidf", "bm25", "pmi", "bigram",
                                    "char_", "vocab", "repetition",
                                    "corpus_", "text_"))
    or q in ("doc_fingerprints",),
    "selection": lambda q: q.startswith(("dsir", "doremi", "mixture",
                                         "temperature", "priority",
                                         "stratified", "soft_dedup",
                                         "epoch", "nb_", "selection_")),
    "media": lambda q: q.startswith("media_"),
    "sketch": lambda q: q.startswith(("cms_", "hll_", "histogram")),
    "events": lambda q: True,  # fallback bucket
}


def _family(q: str) -> str:
    for fam, pred in FAMILIES.items():
        if fam != "events" and pred(q):
            return fam
    return "events"


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 0.15
    if "--threshold" in sys.argv:
        thr = float(sys.argv[sys.argv.index("--threshold") + 1])
    old = json.load(open(args[0]))
    new = json.load(open(args[1]))
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq))
    only_old = sorted(set(oq) - set(nq))
    only_new = sorted(set(nq) - set(oq))

    fams: dict = {}
    for q in shared:
        fams.setdefault(_family(q), []).append(q)

    print(f"{'family':<12} {'n':>3} {'old s':>8} {'new s':>8} {'delta':>7}")
    bad = []
    for fam in sorted(fams):
        qs = fams[fam]
        o = sum(oq[q] for q in qs)
        n = sum(nq[q] for q in qs)
        d = (n - o) / o if o else 0.0
        flag = " <-- REGRESSION" if d > thr else ""
        if d > thr:
            bad.append(fam)
        print(f"{fam:<12} {len(qs):>3} {o:>8.2f} {n:>8.2f} {d:>+6.0%}{flag}")
    o_tot = sum(oq[q] for q in shared)
    n_tot = sum(nq[q] for q in shared)
    print(
        f"{'SHARED':<12} {len(shared):>3} {o_tot:>8.2f} {n_tot:>8.2f} "
        f"{(n_tot - o_tot) / o_tot:>+6.0%}"
    )
    for label, names in (("only-old", only_old), ("only-new", only_new)):
        if names:
            print(f"{label}: {', '.join(names)}")
    if bad:
        print(f"\nfamilies past +{thr:.0%}: {', '.join(bad)} — check "
              "SCALE_DESIGN's noise notes before reading as regression")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
