"""Similarity search over the ``embeddings`` table (array<float>, 64-d).

Two tiers, as a 100 TB pipeline needs:

- ``knn_brute_force``  : exact cosine top-k — the correctness baseline.
  One broadcast of the query vector, one map-side dot product per row,
  TakeOrderedAndProject for the top-k. Scales linearly; at corpus
  scale this is the re-ranking stage, not the candidate generator.
- ``ann_lsh_buckets``  : multi-table random-hyperplane LSH (OR-of-ANDs
  banding + hamming-1 multiprobe) — each table's sign-bit buckets
  co-locate similar vectors; a miss must escape EVERY table, so recall
  amplifies with table count exactly like the minhash dedup's bands.
  Candidates re-rank exactly; the test asserts recall@10 ≥ 0.9 vs
  brute force. Hyperplanes derive from a seeded generator, so results
  are reproducible without a stored model.

Dot products are JVM higher-order functions (zip_with + aggregate).
Signature computation is the one place Arrow enters: a per-batch BLAS
matmul (``lsh_band_buckets_arrow``) — Spark doesn't codegen
higher-order functions, so the pure-expression variant pays ~10⁴
interpreter steps per row for the same math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import dot_product as _dot
from ..functions import l2_norm as _norm
from ..functions import lsh_band_buckets_arrow as _lsh_buckets
from ..sources import load_table
from .registry import register

_QUERY_VEC_ID = 0
_DIM = 64


@register(
    "knn_brute_force",
    oracle=(
        "WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings "
        f"WHERE vec_id = {_QUERY_VEC_ID}) "
        "SELECT e.vec_id, e.label, "
        "ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 4) AS cos_sim "
        "FROM embeddings e, q "
        f"WHERE e.vec_id <> {_QUERY_VEC_ID} "
        "ORDER BY cos_sim DESC, e.vec_id LIMIT 10"
    ),
)
def knn_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 neighbors of vec_id=0. The query vector is a
    1-row broadcast (crossJoin) — no shuffle of the corpus side; the
    global top-k compiles to TakeOrderedAndProject (per-partition heaps,
    driver merge), never a full sort."""
    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.filter(F.col("vec_id") == _QUERY_VEC_ID).select(
        F.col("embedding").alias("qv")
    )
    cos = _dot("embedding", "qv") / (_norm("embedding") * _norm("qv"))
    return (
        emb.filter(F.col("vec_id") != _QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", F.round(cos, 4).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(10)
    )


# OR-of-ANDs banding: 24 independent tables × 6 sign bits, query-side
# hamming-1 multiprobe (7 of 64 buckets probed per table). Per-neighbor
# hit probability at plane-agreement p: P = 1 − (1 − (p^6 + 6·p^5·(1−p)))^24.
# The synthetic embeddings are near-uniform (true top-10 sit at cos
# ≈ 0.28 → p ≈ 0.55–0.62 → P ≈ 0.99) — the WORST case for any ANN structure;
# measured recall@10 vs brute force: 1.0 at sf0.001/0.01/0.1, asserted
# ≥ 0.9 in tests. On a
# real clustered corpus p is far higher and the same table count holds
# recall with a much smaller probed fraction; (bits, tables) are the
# two knobs trading scan fraction for recall.
_ANN_BITS = 6
_ANN_TABLES = 24


@register("ann_lsh_buckets")  # approximate by design → rows-only check
def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 for vec_id=0 via multi-table hyperplane LSH.

    Corpus side: each vector emits (table, bucket) keys — 24 small ints
    per row, shuffled instead of the vectors themselves. Query side:
    one row explodes to its bucket plus the 6 hamming-1 probes per
    table (168 keys, broadcast). Candidates = bucket equi-join →
    distinct → exact cosine re-rank of the candidate set only. The
    brute-force twin stays the oracle/re-ranker; this is the
    sub-quadratic candidate generator (reference analogue: the
    selective point-lookup KPI, ICEBERG-Interoperability-Test-Spec
    `:97`, at corpus scale)."""
    emb = load_table(spark, "embeddings", sf_dir).withColumn(
        "buckets", _lsh_buckets("embedding", _ANN_TABLES, _ANN_BITS)
    )
    corpus = emb.filter(F.col("vec_id") != _QUERY_VEC_ID).select(
        "vec_id", "label", "embedding",
        F.posexplode("buckets").alias("t", "bucket"),
    )
    q = (
        emb.filter(F.col("vec_id") == _QUERY_VEC_ID)
        .select(F.col("embedding").alias("qv"), F.posexplode("buckets").alias("t", "qb"))
        .select(
            "qv", "t",
            F.explode(
                F.array(
                    F.col("qb"),
                    *[F.col("qb").bitwiseXOR(F.lit(1 << i)) for i in range(_ANN_BITS)],
                )
            ).alias("qbucket"),
        )
    )
    cos = _dot("embedding", "qv") / (_norm("embedding") * _norm("qv"))
    return (
        corpus.join(
            F.broadcast(q),
            (corpus["t"] == q["t"]) & (corpus["bucket"] == q["qbucket"]),
        )
        .dropDuplicates(["vec_id"])
        .select("vec_id", "label", F.round(cos, 4).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(10)
    )


@register(
    "centroid_by_label",
    oracle=(
        "SELECT label, COUNT(*) AS n_vecs, "
        "ROUND(AVG(list_extract(CAST(embedding AS DOUBLE[]), 1)), 4) AS dim0_mean, "
        "ROUND(AVG(list_extract(CAST(embedding AS DOUBLE[]), 64)), 4) AS dim63_mean "
        "FROM embeddings GROUP BY label"
    ),
)
def centroid_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid statistics (clustering/IVF building block —
    the coarse quantizer of an IVF index is exactly 'centroid per
    partition'). Checked on two probe dimensions; the full centroid
    vector is the same aggregate over every dimension."""
    emb = load_table(spark, "embeddings", sf_dir)
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.avg(F.expr("CAST(embedding[0] AS DOUBLE)")), 4).alias("dim0_mean"),
        F.round(F.avg(F.expr("CAST(embedding[63] AS DOUBLE)")), 4).alias("dim63_mean"),
    )
