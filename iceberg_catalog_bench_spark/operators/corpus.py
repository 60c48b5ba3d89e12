"""Corpus-management operators for LLM training-data pipelines.

Companions to `text.py` (SURVEY.md §2.9 extensions): deterministic
train/val/test splitting, deterministic distributed shuffling, PII
redaction, and length profiling over the ``documents`` table. All hash
math uses md5 — the one digest both Spark and DuckDB spell identically
— so every operator carries a full value-hash oracle.

Scale stance (100 TB): none of these ops performs a global sort or
collects to the driver. Splits and shuffle shards derive from per-row
hashes (map-only); the only shuffles are the per-shard window (bounded
by shard count) and the final small-key aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load_table
from .registry import register

# Portable pseudo-random bucket in [0, 100) from a doc_id: two leading
# md5 hex chars → ascii codes → integer. Spark and DuckDB agree on
# every function involved (md5 / substr / ascii), which is what makes
# the split reproducible ACROSS ENGINES — a real pipeline requirement
# (the team re-deriving the split in another system must get the same
# membership).
_BUCKET_SQL = (
    "(ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 256 + "
    "ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 100"
)


def _bucket_col() -> F.Column:
    h = F.md5(F.col("doc_id").cast("string"))
    return (
        F.ascii(F.substring(h, 1, 1)) * 256 + F.ascii(F.substring(h, 2, 1))
    ) % 100


@register(
    "corpus_split_train_val_test",
    oracle=(
        "SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' "
        "ELSE 'test' END AS split, COUNT(*) AS n_docs, "
        "CAST(SUM(n_chars) AS BIGINT) AS n_chars_total "
        f"FROM (SELECT n_chars, {_BUCKET_SQL} AS b FROM documents) "
        "GROUP BY 1"
    ),
)
def corpus_split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by hashed doc_id.

    The split is a pure function of the key — adding documents never
    reassigns existing ones, and any engine can recompute membership.
    Map-only + a 3-key aggregate: scan-bound at any scale.
    """
    b = _bucket_col()
    return (
        load_table(spark, "documents", sf_dir)
        .select(
            F.when(b < 80, "train").when(b < 90, "val").otherwise("test").alias("split"),
            "n_chars",
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars_total"),
        )
    )


# Each shard is sorted by ONE task (Window.partitionBy(shard)), so the
# shard count is the scale knob: size it so a shard is a few GB
# (100 TB / ~32k shards ≈ 3 GB). 64 keeps test-SF shards non-trivial.
_N_SHARDS = 64


@register(
    "corpus_shuffle_shards",
    oracle=(
        "SELECT doc_id, shard, CAST(ROW_NUMBER() OVER ("
        "PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) AS pos_in_shard "
        "FROM (SELECT doc_id, "
        f"CAST(({_BUCKET_SQL}) % {_N_SHARDS} AS INTEGER) AS shard, "
        "md5(CAST(doc_id AS VARCHAR) || '-shuffle42') AS h FROM documents)"
    ),
)
def corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic distributed corpus shuffle: each document lands in
    a pseudo-random shard with a pseudo-random position inside it.

    This is the SCALABLE shape of "shuffle the training data": a global
    ORDER BY rand() is a total sort (one range exchange over 100 TB),
    while shard + pos_in_shard needs only a hash exchange on shard and
    a per-shard sort — and training readers consume shards
    independently anyway. Seeded md5 keys make the permutation
    reproducible across runs and engines.
    """
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id",
        (_bucket_col() % _N_SHARDS).cast("int").alias("shard"),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("-shuffle42"))).alias("h"),
    )
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return docs.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("bigint").alias("pos_in_shard"),
    )


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\d{3}-\d{3}-\d{4}"


@register(
    "text_pii_redaction",
    oracle=(
        "SELECT doc_id, "
        f"CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS INTEGER) AS n_emails, "
        f"CAST(len(regexp_extract_all(text, '{_PHONE_RE}')) AS INTEGER) AS n_phones, "
        f"md5(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'), "
        f"'{_PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5 "
        "FROM documents"
    ),
)
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (emails, phone numbers) with per-doc match counts
    and an md5 of the redacted text.

    The md5 column makes the oracle a byte-identical-transform check:
    Spark's Java regex and DuckDB's RE2 must produce the same redacted
    string for every document (patterns stay in the dialect-shared
    subset). Map-only JVM regexps, no shuffle — scan-bound at 100 TB.
    The synthetic corpus contains no PII, so counts are 0 at test SF;
    the md5 equality still proves both engines ran the same transform.
    """
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE,
        "<PHONE>",
    )
    return load_table(spark, "documents", sf_dir).select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_EMAIL_RE), F.lit(0)))
        .cast("int")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_PHONE_RE), F.lit(0)))
        .cast("int")
        .alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
    )


_HIST_BUCKET_CHARS = 50
_HIST_MAX_BUCKET = 20


@register(
    "doc_length_histogram",
    oracle=(
        "SELECT bucket, "
        f"bucket * {_HIST_BUCKET_CHARS} AS chars_lo, "
        "COUNT(*) AS n_docs, "
        "CAST(MIN(n_chars) AS BIGINT) AS min_chars, "
        "CAST(MAX(n_chars) AS BIGINT) AS max_chars "
        f"FROM (SELECT n_chars, CAST(least(n_chars // {_HIST_BUCKET_CHARS}, "
        f"{_HIST_MAX_BUCKET}) AS BIGINT) AS bucket FROM documents) "
        "GROUP BY bucket"
    ),
)
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length histogram with a clamped overflow bucket — the
    profiling pass every corpus intake runs (spot truncation, spam,
    boilerplate modes). Fixed-width buckets keep it a partial-agg
    groupBy over ≤21 keys: map-side combine collapses 100 TB to
    executor-count × 21 rows before the one tiny shuffle.
    """
    bucket = F.least(
        F.floor(F.col("n_chars") / _HIST_BUCKET_CHARS), F.lit(_HIST_MAX_BUCKET)
    ).cast("bigint")
    return (
        load_table(spark, "documents", sf_dir)
        .select(F.col("n_chars"), bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
        )
        .select(
            "bucket",
            (F.col("bucket") * _HIST_BUCKET_CHARS).alias("chars_lo"),
            "n_docs",
            "min_chars",
            "max_chars",
        )
    )


# UNIFORM salted bucket in [0, 4096) for probability-threshold
# sampling: three md5 hex digits decoded to their values (the raw
# ascii-pair trick above is fine for coarse splits but its codes
# cluster — a threshold sampler needs the full range). hexval(c) =
# ascii%16 + 9 if a-f: '0'-'9' → 0-9, 'a'-'f' → 10-15. Identical
# syntax parses in Spark SQL and DuckDB.


def _hexval_sql(expr: str, i: int) -> str:
    c = f"ascii(substr({expr}, {i}, 1))"
    return f"({c} % 16 + CASE WHEN {c} >= 97 THEN 9 ELSE 0 END)"


_IMP_MD5 = "md5(CAST(doc_id AS VARCHAR) || '-imp42')"
_IMP_BUCKET_SQL = (
    f"({_hexval_sql(_IMP_MD5, 1)} * 256 + {_hexval_sql(_IMP_MD5, 2)} * 16 + "
    f"{_hexval_sql(_IMP_MD5, 3)})"
)


def _imp_bucket_col() -> F.Column:
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("-imp42")))

    def hv(i: int) -> F.Column:
        c = F.ascii(F.substring(h, i, 1))
        return c % 16 + F.when(c >= 97, 9).otherwise(0)

    return hv(1) * 256 + hv(2) * 16 + hv(3)


@register(
    "sample_importance_weighted",
    oracle=(
        # Quality-proportional sampling: accept probability scales with
        # document length (clamped weight), decided by a salted md5
        # bucket so membership is reproducible across engines. The
        # float threshold math is identical IEEE arithmetic on both
        # sides, so the comparison is exact — no rounding boundary.
        "WITH d AS (SELECT doc_id, lang, "
        "len(string_split(trim(text), ' ')) AS n_tokens, "
        f"{_IMP_BUCKET_SQL} AS bkt FROM documents), "
        "p AS (SELECT lang, bkt, "
        "LEAST(1.0, 0.3 * LEAST(2.0, GREATEST(0.2, n_tokens / 200.0))) AS p_accept "
        "FROM d) "
        "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_total, "
        "CAST(SUM(CASE WHEN bkt < p_accept * 4096.0 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_sampled "
        "FROM p GROUP BY lang"
    ),
)
def sample_importance_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-weighted corpus sampling: each document's acceptance
    probability scales with a quality proxy (clamped length weight,
    base rate 0.3), decided deterministically by a salted md5 bucket —
    the shape of quality-proportional data selection (DSIR-style
    importance sampling) where the weights come from a scorer.

    Scale shape: map-only accept/reject per row (no shuffle for the
    decision — the sampler is a filter, not a join), one small-key
    aggregation for the per-language report. Reproducible across
    engines AND across runs: re-running selects the same documents, so
    downstream dedup/packing stay stable."""
    docs = load_table(spark, "documents", sf_dir)
    bkt = _imp_bucket_col()
    n_tokens = F.size(F.split(F.trim("text"), " "))
    p_accept = F.least(
        F.lit(1.0),
        0.3 * F.least(F.lit(2.0), F.greatest(F.lit(0.2), n_tokens / F.lit(200.0))),
    )
    return (
        docs.select(
            "lang",
            (bkt < p_accept * 4096.0).cast("int").alias("accepted"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("accepted").cast("bigint").alias("n_sampled"),
        )
    )
