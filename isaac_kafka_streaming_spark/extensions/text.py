"""X4 — text analysis over the `documents` table.

All SQL-checkable tiers are pure JVM expressions (split/regexp/
higher-order array functions) with DuckDB twins using the same token
definition; nothing here touches Python row-at-a-time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table

_TOKEN_SPLIT = "[^a-z0-9]+"

# language marker stopwords for the n-gram/stopword heuristic language ID
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "es": ("el", "la", "los", "que", "y", "es"),
    "fr": ("le", "les", "et", "des", "est", "une"),
}
_STOPWORDS = tuple(sorted({w for ws in LANG_MARKERS.values() for w in ws}))


def _tokens(col):
    return F.filter(F.split(F.lower(col), _TOKEN_SPLIT), lambda t: t != F.lit(""))


def _n_in(tokens_col, words: tuple[str, ...]):
    """Count of tokens that belong to a fixed word set (JVM-side).
    long-typed to match DuckDB's BIGINT len()."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(
        F.filter(tokens_col, lambda t: F.array_contains(arr, t))
    ).cast("long")


def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token histogram: occurrences + document frequency."""
    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("token"))
    return tok.groupBy("token").agg(
        F.count("*").alias("n_occurrences"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features: token counts (whitespace + BPE-ish
    regex), average token length, punctuation ratio, stopword ratio,
    and a keep/drop quality flag."""
    docs = read_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    ws_tokens = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != F.lit(""))
    # BPE-ish: letter runs, digit runs, or single non-alnum-non-space marks
    bpe = F.regexp_extract_all(
        F.lower(F.col("text")), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0
    )
    n_punct = F.length(F.col("text")) - F.length(
        F.regexp_replace(F.col("text"), r"[.,;:!?]", "")
    )
    d = (
        docs.withColumn("tokens", toks)
        .withColumn("n_tokens", F.size("tokens").cast("long"))
        .withColumn("n_ws_tokens", F.size(ws_tokens).cast("long"))
        .withColumn("n_bpe_tokens", F.size(bpe).cast("long"))
        .withColumn(
            "avg_token_len",
            F.round(
                F.aggregate(
                    F.col("tokens"),
                    F.lit(0.0),
                    lambda acc, t: acc + F.length(t),
                )
                / F.greatest(F.col("n_tokens"), F.lit(1)),
                4,
            ),
        )
        .withColumn(
            "punct_ratio",
            F.round(n_punct / F.greatest(F.length("text"), F.lit(1)), 6),
        )
        .withColumn(
            "stopword_ratio",
            F.round(
                _n_in(F.col("tokens"), _STOPWORDS)
                / F.greatest(F.col("n_tokens"), F.lit(1)),
                6,
            ),
        )
    )
    keep = (
        (F.col("n_tokens") >= 5)
        & (F.col("avg_token_len") >= 2)
        & (F.col("avg_token_len") <= 15)
    )
    return d.select(
        "doc_id",
        "n_tokens",
        "n_ws_tokens",
        "n_bpe_tokens",
        "avg_token_len",
        "punct_ratio",
        "stopword_ratio",
        keep.alias("keep"),
    )


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-stopword language ID with a deterministic argmax
    (fixed preference order en > de > es > fr, 'und' = no markers)."""
    docs = read_table(spark, sf_dir, "documents")
    d = docs.withColumn("tokens", _tokens(F.col("text")))
    for lang, words in LANG_MARKERS.items():
        d = d.withColumn(f"score_{lang}", _n_in(F.col("tokens"), words))
    s = {lang: F.col(f"score_{lang}") for lang in LANG_MARKERS}
    best = F.greatest(*s.values())
    pred = (
        F.when(best == 0, F.lit("und"))
        .when(s["en"] == best, F.lit("en"))
        .when(s["de"] == best, F.lit("de"))
        .when(s["es"] == best, F.lit("es"))
        .otherwise(F.lit("fr"))
    )
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[F.col(f"score_{lang}").alias(f"score_{lang}") for lang in LANG_MARKERS],
        pred.alias("pred_lang"),
    )


def doc_fingerprints(spark: SparkSession, sf_dir: str, width: int = 8) -> DataFrame:
    """Rolling-window document fingerprint: min-md5 over all `width`-char
    shingles of the raw text (a locality-sensitive 'winnowing lite')."""
    docs = read_table(spark, sf_dir, "documents")
    # sequence 1..len-width+1 (Spark, inclusive) == range(1, len-width+2) (DuckDB)
    fp = F.array_min(
        F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.length("text") - (width - 1), F.lit(1))
            ),
            lambda i: F.md5(F.col("text").substr(i, F.lit(width))),
        )
    )
    return docs.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.length("text").cast("long").alias("n_chars_raw"),
    )


def tfidf_top_terms(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Top-k characteristic terms per document by tf*ln(N/df).

    Single tokenization feeds both the per-doc tf and the corpus df;
    the document-frequency side is tiny (one row per distinct token)
    and broadcast into the scoring join.
    """
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df_ = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.select(F.count("*").alias("n_total"))
    scored = (
        tf.join(F.broadcast(df_), "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("n_total") / F.col("df")), 6),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "token", "tf", "df", "tfidf", "rank")
    )


def corpus_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline's end product: per-document keep/drop decision for a
    training corpus — quality gate (text_quality.keep) AND canonical
    survivor of normalized-hash dedup (lowest doc_id per hash).  Both
    tiers are SQL-expressible, so the whole decision is oracle-checked;
    fuzzy tiers (LSH clusters) refine `is_canonical` at scale."""
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents")
    norm_hash = F.sha2(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), 256
    )
    w = Window.partitionBy("text_hash")
    flags = (
        docs.withColumn("text_hash", norm_hash)
        .withColumn(
            "is_canonical", F.col("doc_id") == F.min("doc_id").over(w)
        )
        .select("doc_id", "is_canonical")
    )
    quality = text_quality(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("keep_quality")
    )
    return flags.join(quality, "doc_id").select(
        "doc_id",
        "keep_quality",
        "is_canonical",
        (F.col("keep_quality") & F.col("is_canonical")).alias("keep"),
    )


def lang_source_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition rollup per (lang, source)."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


def register() -> dict:
    from ..queries import QueryDef

    stop_list = ", ".join(f"'{w}'" for w in _STOPWORDS)
    markers_sql = {
        lang: ", ".join(f"'{w}'" for w in words)
        for lang, words in LANG_MARKERS.items()
    }
    return {
        "token_counts": QueryDef(
            token_counts,
            """
            WITH tok AS (
                SELECT doc_id,
                       UNNEST(list_filter(regexp_split_to_array(lower(text),
                           '[^a-z0-9]+'), t -> t <> '')) AS token
                FROM documents
            )
            SELECT token, COUNT(*) AS n_occurrences,
                   COUNT(DISTINCT doc_id) AS n_docs
            FROM tok GROUP BY token
            """,
            "X4 corpus token histogram",
        ),
        "text_quality": QueryDef(
            text_quality,
            f"""
            WITH d AS (
                SELECT doc_id, text,
                       list_filter(regexp_split_to_array(lower(text),
                           '[^a-z0-9]+'), t -> t <> '') AS tokens,
                       list_filter(regexp_split_to_array(text, '\\s+'),
                           t -> t <> '') AS ws_tokens,
                       regexp_extract_all(lower(text),
                           '[a-z]+|[0-9]+|[^a-z0-9\\s]') AS bpe
                FROM documents
            )
            SELECT doc_id,
                   len(tokens) AS n_tokens,
                   len(ws_tokens) AS n_ws_tokens,
                   len(bpe) AS n_bpe_tokens,
                   ROUND(COALESCE(list_sum(list_transform(tokens, t -> length(t))), 0)
                         / GREATEST(len(tokens), 1), 4) AS avg_token_len,
                   ROUND((length(text) - length(regexp_replace(text,
                         '[.,;:!?]', '', 'g')))
                         / GREATEST(length(text), 1), 6) AS punct_ratio,
                   ROUND(len(list_filter(tokens, t -> t IN ({stop_list})))
                         / GREATEST(len(tokens), 1), 6) AS stopword_ratio,
                   (len(tokens) >= 5
                    AND ROUND(COALESCE(list_sum(list_transform(tokens, t -> length(t))), 0)
                        / GREATEST(len(tokens), 1), 4) BETWEEN 2 AND 15)
                       AS keep
            FROM d
            """,
            "X4 per-document quality features",
        ),
        "lang_id": QueryDef(
            lang_id,
            f"""
            WITH d AS (
                SELECT doc_id, lang,
                       list_filter(regexp_split_to_array(lower(text),
                           '[^a-z0-9]+'), t -> t <> '') AS tokens
                FROM documents
            ), scored AS (
                SELECT doc_id, lang,
                       len(list_filter(tokens, t -> t IN ({markers_sql['en']})))
                           AS score_en,
                       len(list_filter(tokens, t -> t IN ({markers_sql['de']})))
                           AS score_de,
                       len(list_filter(tokens, t -> t IN ({markers_sql['es']})))
                           AS score_es,
                       len(list_filter(tokens, t -> t IN ({markers_sql['fr']})))
                           AS score_fr
                FROM d
            )
            SELECT doc_id, lang AS labeled_lang,
                   score_en, score_de, score_es, score_fr,
                   CASE
                     WHEN GREATEST(score_en, score_de, score_es, score_fr) = 0
                       THEN 'und'
                     WHEN score_en = GREATEST(score_en, score_de, score_es,
                                              score_fr) THEN 'en'
                     WHEN score_de = GREATEST(score_en, score_de, score_es,
                                              score_fr) THEN 'de'
                     WHEN score_es = GREATEST(score_en, score_de, score_es,
                                              score_fr) THEN 'es'
                     ELSE 'fr'
                   END AS pred_lang
            FROM scored
            """,
            "X4 marker-stopword language ID",
        ),
        "doc_fingerprints": QueryDef(
            doc_fingerprints,
            """
            SELECT doc_id,
                   list_min([md5(substr(text, i, 8))
                             FOR i IN range(1, GREATEST(length(text) - 7, 1) + 1)])
                       AS fingerprint,
                   length(text) AS n_chars_raw
            FROM documents
            """,
            "X4 rolling min-hash document fingerprint",
        ),
        "tfidf_top_terms": QueryDef(
            tfidf_top_terms,
            """
            WITH tok AS (
                SELECT doc_id,
                       UNNEST(list_filter(regexp_split_to_array(lower(text),
                           '[^a-z0-9]+'), t -> t <> '')) AS token
                FROM documents
            ), tf AS (
                SELECT doc_id, token, COUNT(*) AS tf
                FROM tok GROUP BY doc_id, token
            ), df AS (
                SELECT token, COUNT(DISTINCT doc_id) AS df
                FROM tok GROUP BY token
            ), n AS (SELECT COUNT(*) AS n_total FROM documents),
            scored AS (
                SELECT tf.doc_id, tf.token, tf.tf, df.df,
                       ROUND(tf.tf * ln(n.n_total / df.df), 6) AS tfidf
                FROM tf JOIN df USING (token) CROSS JOIN n
            )
            SELECT doc_id, token, tf, df, tfidf, CAST(rnk AS BIGINT) AS rank
            FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                           ORDER BY tfidf DESC, token) AS rnk
                FROM scored
            )
            WHERE rnk <= 3
            """,
            "X4 tf-idf characteristic terms per document",
        ),
        "corpus_keep_list": QueryDef(
            corpus_keep_list,
            """
            WITH d AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text),
                           '[^a-z0-9]+'), t -> t <> '') AS tokens,
                       MIN(doc_id) OVER (PARTITION BY
                           sha256(TRIM(regexp_replace(lower(text), '\\s+',
                                       ' ', 'g')))) AS canon
                FROM documents
            ), q AS (
                SELECT doc_id,
                       (len(tokens) >= 5
                        AND ROUND(COALESCE(list_sum(list_transform(tokens,
                                t -> length(t))), 0)
                            / GREATEST(len(tokens), 1), 4) BETWEEN 2 AND 15)
                           AS keep_quality,
                       (doc_id = canon) AS is_canonical
                FROM d
            )
            SELECT doc_id, keep_quality, is_canonical,
                   (keep_quality AND is_canonical) AS keep
            FROM q
            """,
            "X2/X4 end-product: training-corpus keep/drop decision",
        ),
        "lang_source_rollup": QueryDef(
            lang_source_rollup,
            """
            SELECT lang, source, COUNT(*) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS total_chars,
                   ROUND(AVG(n_chars), 4) AS avg_chars
            FROM documents GROUP BY lang, source
            """,
            "X4 corpus composition rollup",
        ),
    }
