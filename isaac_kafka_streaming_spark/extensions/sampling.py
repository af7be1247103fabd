"""Reproducible corpus sampling — deterministic md5-bucket assignment.

A training pipeline needs sampling decisions that are (a) stable across
runs and engines, (b) keyed by document identity (not row order, not
partition layout), (c) cheap at 100 TB (pure map-side expressions, no
shuffle).  `rand(seed)` fails (a)/(b) — its stream depends on partition
layout — so buckets derive from md5(doc_id), which both Spark and DuckDB
compute identically: the whole decision is oracle-checkable.

Bucket = first 4 hex digits of md5(CAST(doc_id AS STRING)) mod 100,
a uniform-enough 0-99 label; a salt prefix decorrelates independent
sampling decisions from the split assignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table

# per-language downsampling rates (percent kept) for the stratified
# sample: the dominant language is halved, the rest kept whole — the
# mixture-reweighting shape of real corpus curation
LANG_KEEP_PCT: dict[str, int] = {"en": 50}
DEFAULT_KEEP_PCT = 100


def _bucket(key_col, salt: str = ""):
    """Deterministic 0-99 bucket from md5(salt || key)."""
    h = F.md5(F.concat(F.lit(salt), key_col.cast("string")))
    return (F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % 100).alias(
        "bucket"
    )


def corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test assignment: 5% test, 5% val, 90% train, keyed by
    doc_id alone — adding documents never reassigns existing ones."""
    docs = read_table(spark, sf_dir, "documents")
    b = _bucket(F.col("doc_id"))
    split = (
        F.when(F.col("bucket") < 5, F.lit("test"))
        .when(F.col("bucket") < 10, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return docs.select("doc_id", "lang", "source", b).withColumn(
        "split", split
    )


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic downsampling (mixture reweighting):
    keep md5-bucket < keep_pct(lang).  Salted differently from
    corpus_split so the two decisions are independent."""
    docs = read_table(spark, sf_dir, "documents")
    rate = F.lit(DEFAULT_KEEP_PCT)
    for lang, pct in LANG_KEEP_PCT.items():
        rate = F.when(F.col("lang") == lang, F.lit(pct)).otherwise(rate)
    return (
        docs.select("doc_id", "lang", "source", _bucket(F.col("doc_id"), "s"))
        .withColumn("keep_pct", rate.cast("long"))
        .filter(F.col("bucket") < F.col("keep_pct"))
    )


def split_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-contamination check: held-out (val/test) documents whose
    normalized text also appears in train — the leak a dedup-then-split
    pipeline must prove absent.  Pairs each contaminated eval doc with
    the lowest-id train doc sharing its hash."""
    docs = read_table(spark, sf_dir, "documents")
    norm_hash = F.sha2(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), 256
    )
    hashed = docs.select("doc_id", norm_hash.alias("text_hash")).join(
        corpus_split(spark, sf_dir).select("doc_id", "split"), "doc_id"
    )
    train = hashed.filter(F.col("split") == "train").groupBy("text_hash").agg(
        F.min("doc_id").alias("train_doc_id")
    )
    held_out = hashed.filter(F.col("split") != "train")
    return held_out.join(train, "text_hash").select(
        F.col("doc_id").alias("eval_doc_id"),
        "split",
        "train_doc_id",
    )


def register() -> dict:
    from ..queries import QueryDef

    # DuckDB-side 4-hex-digit value (no conv() there): digit positions
    # in the hex alphabet
    def hx(i: int) -> str:
        return f"(position(substr(h, {i}, 1) IN '0123456789abcdef') - 1)"

    val4 = f"((({hx(1)} * 16 + {hx(2)}) * 16 + {hx(3)}) * 16 + {hx(4)})"

    return {
        "corpus_split": QueryDef(
            corpus_split,
            f"""
            WITH d AS (
                SELECT doc_id, lang, source,
                       md5(CAST(doc_id AS VARCHAR)) AS h
                FROM documents
            ), b AS (
                SELECT doc_id, lang, source,
                       CAST({val4} % 100 AS BIGINT) AS bucket
                FROM d
            )
            SELECT doc_id, lang, source, bucket,
                   CASE WHEN bucket < 5 THEN 'test'
                        WHEN bucket < 10 THEN 'val'
                        ELSE 'train' END AS split
            FROM b
            """,
            "reproducible train/val/test split (md5-bucketed)",
        ),
        "split_contamination": QueryDef(
            split_contamination,
            f"""
            WITH d AS (
                SELECT doc_id,
                       sha256(TRIM(regexp_replace(lower(text), '\\s+', ' ',
                                   'g'))) AS text_hash,
                       md5(CAST(doc_id AS VARCHAR)) AS h
                FROM documents
            ), s AS (
                SELECT doc_id, text_hash,
                       CASE WHEN {val4} % 100 < 5 THEN 'test'
                            WHEN {val4} % 100 < 10 THEN 'val'
                            ELSE 'train' END AS split
                FROM d
            ), train AS (
                SELECT text_hash, MIN(doc_id) AS train_doc_id
                FROM s WHERE split = 'train' GROUP BY text_hash
            )
            SELECT s.doc_id AS eval_doc_id, s.split, train.train_doc_id
            FROM s JOIN train USING (text_hash)
            WHERE s.split <> 'train'
            """,
            "eval-set contamination check (held-out x train overlap)",
        ),
        "stratified_sample": QueryDef(
            stratified_sample,
            f"""
            WITH d AS (
                SELECT doc_id, lang, source,
                       md5('s' || CAST(doc_id AS VARCHAR)) AS h
                FROM documents
            ), b AS (
                SELECT doc_id, lang, source,
                       CAST({val4} % 100 AS BIGINT) AS bucket,
                       CAST(CASE WHEN lang = 'en' THEN 50 ELSE 100 END
                            AS BIGINT) AS keep_pct
                FROM d
            )
            SELECT doc_id, lang, source, bucket, keep_pct
            FROM b WHERE bucket < keep_pct
            """,
            "per-language deterministic downsampling (mixture reweighting)",
        ),
    }
