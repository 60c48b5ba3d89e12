"""Text-analysis operators for LLM training-data pipelines.

Beyond the reference surface (SURVEY.md §2.9): language-ID, quality
scoring, token counting, and document fingerprinting over the
``documents`` table. All are expressed with built-in JVM-side
functions (split / filter / transform / md5 — whole-stage codegen,
no Python in the hot path), so they scale linearly with a 100 TB
corpus: each is a single map-only pass with no shuffle.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves string type hints here

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import shingles_expr
from ..sources import load_table
from .registry import register

# Marker stopwords per language for the n-gram/stopword heuristic.
# Deterministic and reproducible in ANSI SQL (the oracle uses the same
# lists), which is the point — language ID here is a pipeline operator,
# not a model.
_LANG_MARKERS = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "las", "una", "y"),
}

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def _tokens(col: str = "text"):
    return F.split(F.trim(F.col(col)), " ")


@register(
    "text_token_count",
    oracle=(
        "SELECT doc_id, len(string_split(trim(text), ' ')) AS n_tokens, "
        "n_chars, length(text) AS n_chars_check FROM documents"
    ),
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting + char-count validation. Single
    map-only pass, no shuffle; at 100 TB this is scan-bound."""
    return load_table(spark, "documents", sf_dir).select(
        "doc_id",
        F.size(_tokens()).alias("n_tokens"),
        "n_chars",
        F.length("text").alias("n_chars_check"),
    )


# Shared by text_quality_scores AND text_quality_pandas_udf: the two
# are the same operator on different execution paths (JVM built-ins vs
# Arrow pandas_udf), so one oracle gates both — the UDF path gets a
# full value-hash driver row, not just the pytest equality check.
_ORACLE_QUALITY = (
    "SELECT doc_id, "
    "len(string_split(trim(text), ' ')) AS n_tokens, "
    "ROUND(length(text) * 1.0 / len(string_split(trim(text), ' ')), 4) "
    "AS avg_token_len, "
    "ROUND(len(list_filter(string_split(trim(text), ' '), "
    "x -> x IN ('the','a','of','and','to','in','is','it'))) * 1.0 "
    "/ len(string_split(trim(text), ' ')), 4) AS stopword_ratio, "
    "ROUND(len(list_distinct(string_split(trim(text), ' '))) * 1.0 "
    "/ len(string_split(trim(text), ' ')), 4) AS distinct_ratio "
    "FROM documents"
)


@register("text_quality_scores", oracle=_ORACLE_QUALITY)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring: token count, mean token length,
    stopword ratio, type-token (distinct) ratio — the standard cheap
    filters (C4/Gopher-style) before expensive model scoring. All
    built-in higher-order array functions (JVM, codegen)."""
    toks = _tokens()
    n = F.size(toks)
    stop_list = ", ".join(f"'{w}'" for w in _STOPWORDS)
    return load_table(spark, "documents", sf_dir).select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(F.length("text") / n, 4).alias("avg_token_len"),
        F.round(
            F.size(F.expr(f"filter(split(trim(text), ' '), x -> x IN ({stop_list}))")) / n, 4
        ).alias("stopword_ratio"),
        F.round(F.size(F.array_distinct(toks)) / n, 4).alias("distinct_ratio"),
    )


def _lang_score_sql_spark(lang: str) -> F.Column:
    markers = ", ".join(f"'{w}'" for w in _LANG_MARKERS[lang])
    return F.size(F.expr(f"filter(split(trim(text), ' '), x -> x IN ({markers}))"))


@register(
    "text_lang_id",
    oracle=(
        "WITH scored AS (SELECT doc_id, lang, "
        + ", ".join(
            "len(list_filter(string_split(trim(text), ' '), x -> x IN ("
            + ", ".join(f"'{w}'" for w in ws)
            + f"))) AS score_{lang}"
            for lang, ws in _LANG_MARKERS.items()
        )
        + " FROM documents) "
        "SELECT doc_id, lang, CASE "
        "WHEN score_de > score_en AND score_de >= score_fr AND score_de >= score_es THEN 'de' "
        "WHEN score_fr > score_en AND score_fr > score_de AND score_fr >= score_es THEN 'fr' "
        "WHEN score_es > score_en AND score_es > score_de AND score_es > score_fr THEN 'es' "
        "ELSE 'en' END AS predicted_lang FROM scored"
    ),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID (n-gram-heuristic family): score
    each language by marker-token hits, argmax with a deterministic
    tie-break order (de > fr > es > en fallback). Map-only, no
    shuffle; the marker lists live in the closure (no broadcast or
    join needed)."""
    docs = load_table(spark, "documents", sf_dir)
    s = {lang: _lang_score_sql_spark(lang) for lang in _LANG_MARKERS}
    pred = (
        F.when(
            (s["de"] > s["en"]) & (s["de"] >= s["fr"]) & (s["de"] >= s["es"]), F.lit("de")
        )
        .when((s["fr"] > s["en"]) & (s["fr"] > s["de"]) & (s["fr"] >= s["es"]), F.lit("fr"))
        .when((s["es"] > s["en"]) & (s["es"] > s["de"]) & (s["es"] > s["fr"]), F.lit("es"))
        .otherwise(F.lit("en"))
    )
    return docs.select("doc_id", "lang", pred.alias("predicted_lang"))


@register(
    "text_fingerprint",
    oracle=(
        "SELECT doc_id, md5(text) AS doc_md5, "
        "md5(array_to_string(string_split(trim(text), ' ')[1:8], ' ')) AS prefix_md5 "
        "FROM documents"
    ),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: full-text MD5 plus a first-8-token
    prefix fingerprint (rolling-hash family — catches shared-prefix
    boilerplate). Both engines produce identical hex digests, so the
    fingerprints themselves are oracle-checked, not just counts."""
    toks = _tokens()
    return load_table(spark, "documents", sf_dir).select(
        "doc_id",
        F.md5("text").alias("doc_md5"),
        F.md5(F.concat_ws(" ", F.slice(toks, 1, 8))).alias("prefix_md5"),
    )


@register("text_quality_pandas_udf", oracle=_ORACLE_QUALITY)
def text_quality_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same quality metrics as text_quality_scores, computed in an
    Arrow-batched Pandas UDF instead of JVM built-ins. Registered as
    the UDF-path reference point: tests assert value equality with the
    JVM version, and the pairing documents the perf rule — built-ins
    beat row-at-a-time Python by orders of magnitude, and when Python
    is unavoidable, Arrow-vectorized beats per-row. Use this shape only
    for logic the built-ins genuinely can't express."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("n_tokens int, avg_token_len double, stopword_ratio double, distinct_ratio double")
    def quality(texts: pd.Series) -> pd.DataFrame:
        stop = set(_STOPWORDS)
        toks = texts.str.strip().str.split(" ")
        n = toks.str.len()
        return pd.DataFrame(
            {
                "n_tokens": n.astype("int32"),
                "avg_token_len": texts.str.len() / n,
                "stopword_ratio": toks.map(lambda ws: sum(1 for w in ws if w in stop)) / n,
                "distinct_ratio": toks.map(lambda ws: len(set(ws))) / n,
            }
        )

    # round Spark-side so both code paths share one rounding rule
    # (pandas .round is half-to-even; Spark ROUND is half-up)
    docs = load_table(spark, "documents", sf_dir)
    return docs.select("doc_id", quality("text").alias("q")).select(
        "doc_id",
        "q.n_tokens",
        F.round("q.avg_token_len", 4).alias("avg_token_len"),
        F.round("q.stopword_ratio", 4).alias("stopword_ratio"),
        F.round("q.distinct_ratio", 4).alias("distinct_ratio"),
    )


@register(
    "pipeline_training_data",
    oracle=(
        "WITH scored AS ("
        "  SELECT doc_id, text, lang, "
        "  len(string_split(trim(text), ' ')) AS n_tokens, "
        "  len(list_filter(string_split(trim(text), ' '), "
        "      x -> x IN ('the','a','of','and','to','in','is','it'))) * 1.0 "
        "      / len(string_split(trim(text), ' ')) AS stop_ratio, "
        "  ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn "
        "  FROM documents) "
        "SELECT lang, CAST(COUNT(*) AS BIGINT) AS kept_docs, "
        "CAST(SUM(n_tokens) AS BIGINT) AS total_tokens "
        "FROM scored WHERE rn = 1 AND n_tokens >= 30 AND stop_ratio < 0.5 "
        "GROUP BY lang"
    ),
)
def pipeline_training_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data curation pipeline as ONE declarative
    plan: exact dedup (keep lowest doc_id per content hash) → quality
    gate (>=30 tokens, stopword ratio < 0.5) → per-language corpus
    stats. This is the composition the individual operators exist
    for; Catalyst fuses the whole thing into dedup-window + filter +
    aggregate with no intermediate materialization. At 100 TB each
    stage stays distributed: the dedup window shuffles 16-byte
    hashes, the filters are map-side, the final agg is tiny."""
    from pyspark.sql.window import Window

    docs = load_table(spark, "documents", sf_dir)
    toks = _tokens()
    n = F.size(toks)
    stop_list = ", ".join(f"'{w}'" for w in _STOPWORDS)
    stop_ratio = (
        F.size(F.expr(f"filter(split(trim(text), ' '), x -> x IN ({stop_list}))")) / n
    )
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    return (
        docs.select(
            "doc_id", "lang", n.alias("n_tokens"), stop_ratio.alias("stop_ratio"),
            F.row_number().over(w).alias("rn"),
        )
        .filter((F.col("rn") == 1) & (F.col("n_tokens") >= 30) & (F.col("stop_ratio") < 0.5))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("kept_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )


@register(
    "top_tokens",
    oracle=(
        "SELECT token, CAST(COUNT(*) AS BIGINT) AS freq FROM ("
        "SELECT unnest(string_split(trim(text), ' ')) AS token FROM documents) "
        "GROUP BY token ORDER BY freq DESC, token LIMIT 20"
    ),
)
def top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token frequencies via explode (generator) + count + top-20
    — the vocabulary-building pass of a tokenizer pipeline. explode is
    a generator (one pass, no join); the count shuffles (token, n)
    pairs, never documents; top-20 is TakeOrderedAndProject."""
    return (
        load_table(spark, "documents", sf_dir)
        .select(F.explode(_tokens()).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), "token")
        .limit(20)
    )


@register(
    "text_repetition_scores",
    oracle=(
        "WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS w, "
        "len(string_split(trim(text), ' ')) AS n FROM documents) "
        "SELECT doc_id, "
        "CASE WHEN n - 1 > 0 THEN ROUND(1.0 - "
        "len(list_distinct(list_transform(generate_series(1, n - 1), "
        "i -> w[i] || ' ' || w[i+1]))) * 1.0 / (n - 1), 4) ELSE 0.0 END "
        "AS dup_2gram_frac, "
        "CASE WHEN n - 2 > 0 THEN ROUND(1.0 - "
        "len(list_distinct(list_transform(generate_series(1, n - 2), "
        "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) * 1.0 / (n - 2), 4) "
        "ELSE 0.0 END AS dup_3gram_frac "
        "FROM t"
    ),
)
def text_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition scoring (the Gopher/MassiveText
    repetition filters): fraction of duplicate 2-grams and 3-grams per
    document — high values flag boilerplate/spam/looping generations
    before they reach training. dup_frac_n = 1 − distinct_n/total_n.

    Map-only higher-order functions over the token array (total count
    is arithmetic, distinct count reuses the shingle builder): no
    shuffle, no Python — at 100 TB this rides the same scan as every
    other per-doc quality score."""
    from ..functions import shingles_expr

    n_toks = F.size(_tokens())

    def dup_frac(n: int) -> F.Column:
        total = n_toks - (n - 1)
        distinct_n = F.size(F.expr(shingles_expr("text", n)))
        return (
            F.when(total > 0, F.round(1.0 - distinct_n / total, 4))
            .otherwise(F.lit(0.0))
        )

    return load_table(spark, "documents", sf_dir).select(
        "doc_id",
        dup_frac(2).alias("dup_2gram_frac"),
        dup_frac(3).alias("dup_3gram_frac"),
    )


@register(
    "corpus_mixture_weights",
    oracle=(
        "WITH per_lang AS (SELECT lang, COUNT(*) AS n_docs, "
        "CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT) AS lang_tokens "
        "FROM documents GROUP BY lang), "
        "tot AS (SELECT SUM(lang_tokens) AS total_tokens FROM per_lang) "
        "SELECT lang, n_docs, lang_tokens, "
        "ROUND(lang_tokens * 1.0 / total_tokens, 6) AS actual_share, "
        "ROUND(0.2 * total_tokens / lang_tokens, 6) AS sampling_weight "
        "FROM per_lang, tot"
    ),
)
def corpus_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing weights: given a target mixture (uniform 0.2 per
    language here), compute each language's actual token share and the
    sampling weight (target/actual) that rebalances the corpus — the
    number a weighted sampler or dataloader consumes. One partial-agg
    shuffle on a 5-value key plus a broadcast of the 1-row total; the
    weights table is dimension-sized at any corpus scale."""
    per_lang = (
        load_table(spark, "documents", sf_dir)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(_tokens())).alias("lang_tokens"),
        )
    )
    tot = per_lang.agg(F.sum("lang_tokens").alias("total_tokens"))
    return per_lang.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "lang_tokens",
        F.round(F.col("lang_tokens") / F.col("total_tokens"), 6).alias("actual_share"),
        F.round(F.lit(0.2) * F.col("total_tokens") / F.col("lang_tokens"), 6).alias(
            "sampling_weight"
        ),
    )


# Packing windows run one task per (lang, shard): the shard term bounds
# the largest window task no matter how skewed the language mix is
# (80%-English at 100 TB would otherwise sort that whole language in
# ONE task). Shard key = the same engine-portable md5 bucket
# `corpus_shuffle_shards` uses, so membership is reproducible across
# engines. 16 keeps test-SF shards non-trivial; at 100 TB raise it so a
# (lang, shard) cell is a few GB — the documented scale knob.
_N_PACK_SHARDS = 16


def _pack_shard_sql() -> str:
    from .corpus import _BUCKET_SQL

    return f"CAST(({_BUCKET_SQL}) % {_N_PACK_SHARDS} AS INTEGER)"


def _pack_shard_col() -> F.Column:
    from .corpus import _bucket_col

    return (_bucket_col() % _N_PACK_SHARDS).cast("int")


@register(
    "pipeline_pack_sequences",
    oracle=(
        "WITH toks AS (SELECT doc_id, lang, "
        + _pack_shard_sql() + " AS shard, "
        "len(string_split(trim(text), ' ')) AS n_tokens FROM documents), "
        "packed AS (SELECT lang, shard, "
        "CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id "
        "ROWS UNBOUNDED PRECEDING) - n_tokens) / 2048.0) AS BIGINT) AS seq_id, "
        "n_tokens FROM toks) "
        "SELECT lang, shard, seq_id, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens "
        "FROM packed GROUP BY lang, shard, seq_id"
    ),
)
def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — the LLM-training preprocessing step that
    concatenates documents into fixed-capacity (2048-token) training
    sequences: a doc starts in the sequence its running-token offset
    falls into (docs may span a boundary; token-level packing splits
    them downstream). Returns per-sequence document and token counts,
    keyed by (lang, shard, seq_id).

    Scale shape: the running sum is a window PARTITIONED BY
    (lang, shard) — the shard term (md5 bucket, `_N_PACK_SHARDS` is
    the knob) bounds every window task regardless of language skew, so
    no single task ever sorts a whole language. Real pipelines pack per
    shard/stream for exactly this reason; readers consume shards
    independently."""
    from pyspark.sql.window import Window

    docs = load_table(spark, "documents", sf_dir)
    n = F.size(_tokens())
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = docs.select(
        "doc_id", "lang", _pack_shard_col().alias("shard"), n.alias("n_tokens")
    )
    packed = toks.select(
        "lang",
        "shard",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 2048.0).alias("seq_id"),
        "n_tokens",
    )
    return packed.groupBy("lang", "shard", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("seq_tokens"),
    )


@register(
    "sample_stratified_by_lang",
    oracle=(
        "SELECT lang, CAST(COUNT(*) AS BIGINT) AS sampled_docs, "
        "CAST(MIN(doc_id) AS BIGINT) AS min_doc, CAST(MAX(doc_id) AS BIGINT) AS max_doc "
        "FROM documents "
        "WHERE (doc_id * 2654435761) % 100 < "
        "(CASE WHEN lang = 'en' THEN 50 ELSE 20 END) "
        "GROUP BY lang"
    ),
)
def sample_stratified_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling — downsample the dominant
    language (en: 50%) while keeping more of the rest (20%), the
    data-mixing step of corpus curation. The sampler is a pure integer
    hash of the key ((doc_id * K) % 100 < rate): reproducible across
    runs AND engines (no RNG state), map-side only, no shuffle until
    the stats agg. At 100 TB this is a filter pushed into the scan —
    sampling never materializes the unsampled corpus."""
    docs = load_table(spark, "documents", sf_dir)
    slot = (F.col("doc_id") * F.lit(2654435761)) % 100
    rate = F.when(F.col("lang") == "en", 50).otherwise(20)
    return (
        docs.filter(slot < rate)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("sampled_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


@register(
    "corpus_shard_manifest",
    oracle=(
        "SELECT CAST(FLOOR(((doc_id * 2654435761) % 4294967296) / 536870912.0) "
        "AS BIGINT) AS shard, "
        "CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(octet_length(encode(text))) AS BIGINT) AS shard_bytes "
        "FROM documents GROUP BY shard"
    ),
)
def corpus_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Output-shard assignment manifest — the write-planning step of a
    corpus export: hash-assign every document to one of 8 shards and
    report per-shard doc counts and byte sizes (what a writer uses to
    produce balanced training-data files). The shard id is the TOP 3
    bits of a 32-bit multiplicative hash (taking `% 8` directly would
    collapse to `doc_id % 8` because the multiplier is odd): integer
    arithmetic only, identical in both engines, no overflow under ANSI
    mode for ids < 2^31. At scale `shard` becomes the
    repartition/partitionBy key of the actual write, so the manifest
    agg and the write share one shuffle."""
    docs = load_table(spark, "documents", sf_dir)
    shard = F.floor(
        ((F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)) / F.lit(536870912.0)
    ).cast("bigint")
    return docs.groupBy(shard.alias("shard")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.octet_length(F.encode("text", "utf-8"))).alias("shard_bytes"),
    )


_CONTAM_N = 5  # contamination n-gram width (word-level)
_CONTAM_ORACLE_GRAMS = (
    "list_distinct(list_transform("
    "generate_series(1, len(string_split(trim(text), ' ')) - 4), "
    "i -> array_to_string(string_split(trim(text), ' ')[i:i+4], ' ')))"
)


@register(
    "corpus_contamination_check",
    oracle=(
        # eval set = doc_id % 5 = 0; a corpus doc is contaminated if it
        # shares any 5-word n-gram with any eval doc. Reported per doc
        # with the count of distinct overlapping grams.
        "WITH g AS (SELECT doc_id, unnest(" + _CONTAM_ORACLE_GRAMS + ") AS gram "
        "FROM documents), "
        "ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 5 = 0) "
        "SELECT g.doc_id, COUNT(DISTINCT g.gram) AS overlap_grams "
        "FROM g JOIN ev USING (gram) WHERE g.doc_id % 5 <> 0 "
        "GROUP BY g.doc_id"
    ),
)
def corpus_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination detection (the GPT-3/PaLM n-gram-overlap
    protocol): flag training documents that share any 5-word n-gram
    with a held-out eval set, with the distinct-overlap count per doc.

    Scale shape: corpus grams are hashed to 64-bit (xxhash64) so the
    join shuffles 8-byte keys, never gram text; the eval set's gram
    hashes are dimension-sized (eval suites are thousands of docs, the
    corpus is billions) and BROADCAST, so the check is one map-side
    semi-reduction over the corpus — cost O(corpus grams), no
    corpus-side shuffle. The oracle joins the gram STRINGS; equality of
    results rides on xxhash64 collision-freeness at 2^-64."""
    docs = load_table(spark, "documents", sf_dir)
    grams = docs.select(
        "doc_id",
        F.explode(F.expr(shingles_expr("text", _CONTAM_N))).alias("gram"),
    ).select("doc_id", F.xxhash64("gram").alias("gh"))
    ev = (
        grams.filter(F.col("doc_id") % 5 == 0)
        .select("gh").distinct()
    )
    return (
        grams.filter(F.col("doc_id") % 5 != 0)
        .join(F.broadcast(ev), "gh")
        .groupBy("doc_id")
        .agg(F.countDistinct("gh").alias("overlap_grams"))
    )


# Vocabulary cap for the unigram LM: on a 100 TB web corpus the RAW
# vocabulary (typos, URLs, numbers) is billions of rows — broadcasting
# it would OOM the driver. Top-K by (count DESC, token) is a hard bound
# on the broadcast; everything else scores through one shared <unk>
# bucket carrying the dropped mass. 4096 binds at test SF too, so the
# oracle exercises the <unk> path.
_UNIGRAM_VOCAB_K = 4096


@register(
    "text_unigram_logprob",
    oracle=(
        # Corpus-fit unigram LM (top-K vocab + <unk> mass), then
        # per-doc mean negative log-prob — the cheap perplexity proxy
        # used for quality filtering.
        "WITH tok AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token "
        "FROM documents), "
        "freq AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY token), "
        "tot AS (SELECT SUM(c) AS s FROM freq), "
        f"vocab AS (SELECT token, c FROM freq ORDER BY c DESC, token LIMIT {_UNIGRAM_VOCAB_K}), "
        "unk AS (SELECT s - (SELECT SUM(c) FROM vocab) AS unk_c, s FROM tot) "
        "SELECT doc_id, "
        "ROUND(AVG(-ln(COALESCE(v.c, unk.unk_c) * 1.0 / unk.s)), 4) AS avg_neg_logprob "
        "FROM tok LEFT JOIN vocab v USING (token), unk GROUP BY doc_id"
    ),
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality score: fit a unigram LM on the corpus
    (one groupBy over tokens), cap it to the top-`_UNIGRAM_VOCAB_K`
    tokens with a shared <unk> bucket carrying the dropped mass, then
    score each document by its mean negative log-probability — the
    standard cheap stand-in for a model perplexity filter (high score =
    tokens the corpus finds surprising = often junk).

    Scale shape: pass 1 aggregates token counts (map-side partial
    combine, shuffle is vocabulary-sized, not corpus-sized); the LM
    broadcast is then HARD-BOUNDED at K rows (TakeOrderedAndProject —
    a raw web vocabulary is billions of typos/URLs/numbers and would
    OOM unbounded); OOV tokens coalesce to the <unk> probability
    map-side, so the only corpus-wide shuffle is the per-doc average
    keyed by doc_id. Ties at the cut break on (count DESC, token) in
    both engines, keeping vocab membership deterministic."""
    tok = load_table(spark, "documents", sf_dir).select(
        "doc_id", F.explode(F.split(F.trim("text"), " ")).alias("token")
    )
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.sum("c").alias("s"))
    vocab = freq.orderBy(F.desc("c"), "token").limit(_UNIGRAM_VOCAB_K)
    unk = (
        vocab.agg(F.sum("c").alias("vocab_c"))
        .crossJoin(F.broadcast(total))
        .select((F.col("s") - F.col("vocab_c")).alias("unk_c"), "s")
    )
    scored = (
        tok.join(F.broadcast(vocab), "token", "left")
        .crossJoin(F.broadcast(unk))
        .select("doc_id", F.coalesce(F.col("c"), F.col("unk_c")).alias("c_eff"), "s")
    )
    return scored.groupBy("doc_id").agg(
        F.round(F.avg(-F.log(F.col("c_eff") / F.col("s"))), 4).alias("avg_neg_logprob")
    )


@register(
    "pipeline_curate_full",
    oracle=(
        # The full curation chain as one SQL pipeline: drop the eval
        # slice and anything contaminated by it (shared 5-gram), exact-
        # dedup (min doc_id per content hash), quality-gate (>= 30
        # tokens), pack per-lang into 2048-token sequences, report
        # per-lang corpus stats.
        "WITH g AS (SELECT doc_id, unnest(" + _CONTAM_ORACLE_GRAMS + ") AS gram "
        "FROM documents), "
        "ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 5 = 0), "
        "contam AS (SELECT DISTINCT g.doc_id FROM g JOIN ev USING (gram) "
        "WHERE g.doc_id % 5 <> 0), "
        "clean AS (SELECT * FROM documents WHERE doc_id % 5 <> 0 "
        "AND doc_id NOT IN (SELECT doc_id FROM contam)), "
        "dedup AS (SELECT doc_id, lang, text, "
        "ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM clean), "
        "kept AS (SELECT doc_id, lang, "
        + _pack_shard_sql() + " AS shard, "
        "len(string_split(trim(text), ' ')) AS n_tokens FROM dedup "
        "WHERE rn = 1 AND len(string_split(trim(text), ' ')) >= 30), "
        "packed AS (SELECT lang, shard, n_tokens, "
        "CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id "
        "ROWS UNBOUNDED PRECEDING) - n_tokens) / 2048.0) AS BIGINT) AS seq_id "
        "FROM kept) "
        "SELECT lang, CAST(COUNT(DISTINCT (shard, seq_id)) AS BIGINT) AS n_sequences, "
        "CAST(COUNT(*) AS BIGINT) AS kept_docs, "
        "CAST(SUM(n_tokens) AS BIGINT) AS total_tokens "
        "FROM packed GROUP BY lang"
    ),
)
def pipeline_curate_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation capstone as ONE declarative plan:
    benchmark-decontamination (drop the eval slice and every training
    doc sharing a 5-gram with it) → exact dedup → quality gate →
    2048-token sequence packing → per-language corpus stats.

    Catalyst fuses the stages; the scale shape of each: contamination
    is a broadcast anti-join on 64-bit gram hashes (map-side, corpus
    never shuffles for it), dedup shuffles 16-byte digests, the quality
    gate is a map-side filter, packing windows per (lang, shard) so no
    task ever sorts a whole language (the contaminated-id broadcast
    assumes contamination is rare — swap to a shuffled left-anti join
    if an eval suite ever taints a large corpus fraction), the final
    agg is tiny. No stage materializes an intermediate corpus."""
    from pyspark.sql.window import Window

    docs = load_table(spark, "documents", sf_dir)
    grams = docs.select(
        "doc_id", F.explode(F.expr(shingles_expr("text", _CONTAM_N))).alias("gram")
    ).select("doc_id", F.xxhash64("gram").alias("gh"))
    ev_grams = grams.filter(F.col("doc_id") % 5 == 0).select("gh").distinct()
    contaminated = (
        grams.filter(F.col("doc_id") % 5 != 0)
        .join(F.broadcast(ev_grams), "gh")
        .select("doc_id").distinct()
    )
    clean = (
        docs.filter(F.col("doc_id") % 5 != 0)
        .join(F.broadcast(contaminated), "doc_id", "left_anti")
    )
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    n = F.size(F.split(F.trim("text"), " "))
    kept = (
        clean.select("doc_id", "lang", _pack_shard_col().alias("shard"),
                     n.alias("n_tokens"), F.row_number().over(w).alias("rn"))
        .filter((F.col("rn") == 1) & (F.col("n_tokens") >= 30))
    )
    pw = (
        Window.partitionBy("lang", "shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = kept.select(
        "lang", "shard", "n_tokens",
        F.floor((F.sum("n_tokens").over(pw) - F.col("n_tokens")) / 2048.0).alias("seq_id"),
    )
    return packed.groupBy("lang").agg(
        F.countDistinct("shard", "seq_id").alias("n_sequences"),
        F.count(F.lit(1)).alias("kept_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


@register(
    "tokenizer_bpe_pair_counts",
    oracle=(
        # One BPE merge iteration: corpus-weighted adjacent-symbol-pair
        # frequencies at the character level, top 20.
        "WITH words AS (SELECT token AS word, COUNT(*) AS wc FROM ("
        "SELECT unnest(string_split(trim(text), ' ')) AS token FROM documents) "
        "WHERE token <> '' GROUP BY token), "
        "pairs AS (SELECT substr(word, i, 1) AS pair_left, "
        "substr(word, i + 1, 1) AS pair_right, wc "
        "FROM words, unnest(generate_series(1, length(word) - 1)) AS t(i) "
        "WHERE length(word) >= 2) "
        "SELECT pair_left, pair_right, CAST(SUM(wc) AS BIGINT) AS pair_count "
        "FROM pairs GROUP BY pair_left, pair_right "
        "ORDER BY pair_count DESC, pair_left, pair_right LIMIT 20"
    ),
)
def tokenizer_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One iteration of distributed BPE tokenizer training: count
    adjacent character-pair frequencies across the corpus, weighted by
    word frequency — the argmax pair is the next BPE merge. Returns
    the top-20 candidate merges.

    Scale shape (the step Sennrich-BPE trainers distribute): pass 1
    reduces the corpus to the WORD VOCABULARY (map-side partial
    count, shuffle is vocab-sized); pass 2 explodes each vocab entry
    into its symbol pairs — O(vocab × word-length) work on the
    already-reduced table, never on raw documents — and partial-sums
    again. Both shuffles carry (symbol-pair, count), so a 100 TB
    corpus costs one corpus scan plus vocab-sized exchanges; top-20 is
    TakeOrderedAndProject."""
    words = (
        load_table(spark, "documents", sf_dir)
        .select(F.explode(_tokens()).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
        .filter(F.length("word") >= 2)
    )
    pairs = words.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1), "
                "i -> struct(substring(word, i, 1) AS l, substring(word, i + 1, 1) AS r))"
            )
        ).alias("p"),
        "wc",
    )
    return (
        pairs.groupBy(
            F.col("p.l").alias("pair_left"), F.col("p.r").alias("pair_right")
        )
        .agg(F.sum("wc").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "pair_left", "pair_right")
        .limit(20)
    )


@register(
    "stats_gini_grouped_udaf",
    oracle=(
        # Closed-form Gini from ascending ranks: with x sorted asc and
        # 1-based index i, G = 2*Σ(i·x_i)/(n·Σx) − (n+1)/n. Ties don't
        # affect the sum (equal x share the tied index block), so the
        # value is order-deterministic. n_chars are integers → every
        # sum is exact in double → the 6dp round matches bitwise.
        "WITH r AS (SELECT lang, n_chars, "
        "ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars) AS i "
        "FROM documents) "
        "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "ROUND(2.0 * SUM(i * n_chars) / (COUNT(*) * SUM(n_chars)) "
        "- (COUNT(*) + 1.0) / COUNT(*), 6) AS gini_n_chars "
        "FROM r GROUP BY lang"
    ),
)
def stats_gini_grouped_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDAF — the third Arrow surface after
    scalar pandas UDFs (`text_quality_pandas_udf`) and mapInPandas
    (multimodal): a custom aggregate (Gini concentration of document
    lengths per language — the inequality measure data-mixture work
    uses to spot head-heavy sources) that Spark's built-ins can't
    express, computed per group from an Arrow-transferred numpy
    vector. The UDAF is partial-agg-free (whole group to one worker),
    so the docstring rule applies: use it only where groups are
    bounded (languages here); for open-ended keys, decompose to the
    closed-form rank sums the oracle uses — which is also the exact
    equivalence being verified."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def gini(x: pd.Series) -> float:
        v = np.sort(x.to_numpy(dtype=np.float64))
        n = v.size
        i = np.arange(1, n + 1, dtype=np.float64)
        return float(2.0 * np.dot(i, v) / (n * v.sum()) - (n + 1.0) / n)

    # Spark refuses to mix grouped-agg pandas UDFs with JVM aggregates
    # in one agg (INVALID_PANDAS_UDF_PLACEMENT) — the count rides as a
    # second pandas UDAF so the whole group aggregates in one pass.
    @pandas_udf("long")
    def n_docs(x: pd.Series) -> int:
        return len(x)

    docs = load_table(spark, "documents", sf_dir)
    return docs.groupBy("lang").agg(
        n_docs("n_chars").alias("n_docs"),
        F.round(gini("n_chars"), 6).alias("gini_n_chars"),
    )


_CHUNK_WIN = 200     # characters per chunk
_CHUNK_STRIDE = 150  # overlap = WIN - STRIDE = 50 chars


@register(
    "text_chunk_sliding",
    oracle=(
        # Same sliding windows via generate_series + substr.
        "SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx, "
        f"substr(text, CAST(i * {_CHUNK_STRIDE} + 1 AS BIGINT), {_CHUNK_WIN}) "
        "AS chunk_text, "
        f"CAST(length(substr(text, CAST(i * {_CHUNK_STRIDE} + 1 AS BIGINT), "
        f"{_CHUNK_WIN})) AS BIGINT) AS chunk_len "
        "FROM documents, UNNEST(generate_series(0, "
        f"CAST(floor((length(text) - 1) / {_CHUNK_STRIDE}) AS BIGINT))) AS t(i) "
        "WHERE length(text) > 0"
    ),
)
def text_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking — the RAG/embedding-prep shape:
    every document explodes into overlapping fixed-width windows
    (200 chars, stride 150) with a stable (doc_id, chunk_idx) key, so
    chunk embeddings can join back to their source and re-chunking is
    reproducible. Character windows keep the operator deterministic
    across engines (token windows would pin a tokenizer; the BPE and
    token-count operators cover that axis).

    Scale shape: one map-side ``explode(sequence(...))`` + substring —
    pure JVM, zero shuffles, zero UDFs; output partitioning inherits
    the scan, so a downstream embed stage streams chunk batches
    without a repartition. At 100 TB this is the canonical
    narrow-transform: throughput = scan throughput."""
    docs = load_table(spark, "documents", sf_dir).filter(F.length("text") > 0)
    idx = F.explode(
        F.sequence(
            F.lit(0),
            F.floor((F.length("text") - 1) / _CHUNK_STRIDE).cast("bigint"),
        )
    ).alias("chunk_idx")
    out = docs.select("doc_id", "text", idx)
    # substring(col, pos, len) takes only literal pos in the Column
    # API — the expr form accepts the per-row chunk offset
    return out.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.expr(
            f"substring(text, chunk_idx * {_CHUNK_STRIDE} + 1, {_CHUNK_WIN})"
        ).alias("chunk_text"),
        F.length(
            F.expr(
                f"substring(text, chunk_idx * {_CHUNK_STRIDE} + 1, {_CHUNK_WIN})"
            )
        ).cast("bigint").alias("chunk_len"),
    )


_BM25_TERMS = ("hash", "join", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75

# The BM25 scoring pipeline as reusable CTE bodies (everything after
# "WITH "): `bm25` ends as (doc_id, score_micro). Shared by this
# module's registered oracle and similarity.hybrid_search_bm25_rrf's.
BM25_SCORES_CTES = f"""tok AS (
  SELECT doc_id, t AS term
  FROM documents,
       UNNEST(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS u(t)
  WHERE t <> ''
), dl AS (
  SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id
), stats AS (
  SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok
  WHERE term IN ('hash', 'join', 'window')
  GROUP BY doc_id, term
), idf AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term
), parts AS (
  SELECT tf.doc_id,
         CAST(ROUND(
           ln(1 + (stats.n_docs - idf.df + 0.5) / (idf.df + 0.5))
           * tf.tf * ({_BM25_K1} + 1)
           / (tf.tf + {_BM25_K1}
              * (1 - {_BM25_B} + {_BM25_B} * dl.dl / stats.avgdl))
           * 1e6) AS BIGINT) AS part_micro
  FROM tf
  JOIN idf USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
), bm25 AS (
  SELECT doc_id, CAST(SUM(part_micro) AS BIGINT) AS score_micro
  FROM parts
  GROUP BY doc_id
)"""

_ORACLE_BM25 = (
    "WITH " + BM25_SCORES_CTES
    + " SELECT doc_id, score_micro FROM bm25 "
      "ORDER BY score_micro DESC, doc_id LIMIT 10"
)


def bm25_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, score_micro) BM25 relevance of every document matching
    ≥1 query term — the shared scorer behind the registered
    ``text_bm25_keyword_search`` row and the keyword leg of
    ``hybrid_search_bm25_rrf``. See the registered query's docstring
    for the one-shuffle / ReusedExchange plan shape."""
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("term"),
    ).filter(F.col("term") != "")
    per_doc = tok.groupBy("doc_id").agg(
        F.count("*").alias("dl"),
        *[F.sum(F.when(F.col("term") == t, 1).otherwise(0))
          .alias(f"tf_{t}") for t in _BM25_TERMS],
    )
    consts = per_doc.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[F.sum((F.col(f"tf_{t}") > 0).cast("long")).alias(f"df_{t}")
          for t in _BM25_TERMS],
    )

    def _part(t: str):
        tf, df = F.col(f"tf_{t}"), F.col(f"df_{t}")
        idf = F.log(1 + (F.col("n_docs") - df + 0.5) / (df + 0.5))
        norm = (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
        return F.round(
            idf * tf * (_BM25_K1 + 1) / (tf + _BM25_K1 * norm) * 1e6
        ).cast("bigint")

    score = sum((_part(t) for t in _BM25_TERMS), F.lit(0).cast("bigint"))
    matched = sum((F.col(f"tf_{t}") for t in _BM25_TERMS),
                  F.lit(0).cast("bigint"))
    return (
        per_doc.crossJoin(F.broadcast(consts))
        .filter(matched > 0)  # = the oracle's "has a tf row" set
        .select("doc_id", score.alias("score_micro"))
    )


@register("text_bm25_keyword_search", oracle=_ORACLE_BM25)
def text_bm25_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword relevance over the corpus — the lexical leg every
    RAG / retrieval pipeline needs next to the vector ANN family
    (Robertson & Spärck Jones; k1=1.2, b=0.75).

    Spark-first shape, 100 TB story: ONE tokenize-explode pass and ONE
    shuffle build a per-doc row carrying the document length AND every
    query term's frequency as COLUMNS (the term list is a fixed query
    literal, so columnar beats a (doc, term)-keyed second shuffle);
    corpus constants (N, avgdl, per-term document frequencies) are a
    1-row aggregate over that same exchange — Catalyst's
    ReusedExchange makes the corpus scan happen once — broadcast back
    with a nested-loop join; top-k is a TakeOrdered. Per-term
    contributions are micro-rounded BEFORE the sum so the oracle
    compares integers, immune to float-summation order across engines.
    """
    docs = load_table(spark, "documents", sf_dir)
    return (
        bm25_scores(docs)
        .orderBy(F.desc("score_micro"), "doc_id")
        .limit(10)
    )
