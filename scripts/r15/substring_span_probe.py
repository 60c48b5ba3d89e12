"""Round-15 probe: duplicate-span dedup at synthetic scale.

Claims under test (dedup_substring_spans): window generation is a
map-side explode; the duplicate test is ONE corpus-sized shuffle on
the window text; everything downstream is O(duplicated occurrences) —
so a CLEAN corpus costs the same shuffle but near-zero tail, and a
DUP-HEAVY corpus's extra cost tracks its duplicated volume, not the
corpus size. Two corpora, same size, different planted-dup rates.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

_L = 8


def _pipeline(docs):
    words = (
        docs.select("doc_id",
                    F.split(F.trim(F.col("text")), r"\s+").alias("w"))
        .withColumn("nw", F.size("w")).filter(F.col("nw") >= _L)
    )
    grams = words.select(
        "doc_id", "nw",
        F.explode(F.expr(
            f"transform(sequence(1, nw - {_L - 1}), "
            f"i -> struct(i AS start, "
            f"concat_ws(' ', slice(w, i, {_L})) AS gram))")).alias("g"),
    ).select("doc_id", "nw", F.col("g.start").alias("start"),
             F.col("g.gram").alias("gram"))
    dup = (grams.groupBy("gram").agg(F.count(F.lit(1)).alias("c"))
           .filter(F.col("c") >= 2).select("gram"))
    occ = grams.join(dup, "gram")
    return (
        occ.select("doc_id", "nw", "start",
                   F.explode(F.expr(
                       f"sequence(start, start + {_L - 1})")).alias("pos"))
        .groupBy("doc_id", "nw")
        .agg(F.count_distinct("start").alias("dup_occurrences"),
             F.count_distinct("pos").alias("covered_tokens"))
    )


def _cut_pipeline(docs):
    words = (
        docs.select("doc_id",
                    F.split(F.trim(F.col("text")), r"\s+").alias("w"))
        .withColumn("nw", F.size("w")).filter(F.col("nw") >= _L)
    )
    grams = words.select(
        "doc_id", "nw",
        F.explode(F.expr(
            f"transform(sequence(1, nw - {_L - 1}), "
            f"i -> struct(i AS start, "
            f"concat_ws(' ', slice(w, i, {_L})) AS gram))")).alias("g"),
    ).select("doc_id", "nw", F.col("g.start").alias("start"),
             (F.col("doc_id") * 100000 + F.col("g.start")).alias("ord"),
             F.col("g.gram").alias("gram"))
    firsts = (grams.groupBy("gram")
              .agg(F.min("ord").alias("first_ord"),
                   F.count(F.lit(1)).alias("c"))
              .filter(F.col("c") >= 2).select("gram", "first_ord"))
    laters = (grams.join(firsts, "gram")
              .filter(F.col("ord") != F.col("first_ord"))
              .select("doc_id", "nw", "start"))
    return (
        laters.select("doc_id", "nw",
                      F.explode(F.expr(
                          f"sequence(start, start + {_L - 1})"))
                      .alias("pos"))
        .groupBy("doc_id", "nw")
        .agg(F.count_distinct("pos").alias("cut_tokens"))
    )


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "12g")
        .config("spark.ui.enabled", "false").getOrCreate()
    )
    n = 200_000
    # ~40 tokens/doc => 6.6M windows over the corpus
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[
            F.concat(F.lit(f"w{i}x"), F.col("id") * (i + 7) + i)
            for i in range(40)
        ]).alias("text"),
    )
    # dup-heavy: 10% of docs REPLACED by one of 50 template texts
    # (every window inside them is duplicated corpus-wide)
    heavy = base.select(
        "doc_id",
        F.when(F.col("doc_id") % 10 == 7, F.concat_ws(" ", *[
            F.concat(F.lit(f"t{i}y"), (F.col("doc_id") % 50) * (i + 3))
            for i in range(40)
        ])).otherwise(F.col("text")).alias("text"),
    )
    spark.range(1 << 20).groupBy((F.col("id") % 7)).count().collect()
    for tag, docs in (("clean", base), ("dup-heavy", heavy)):
        d = docs.cache(); d.count()
        out = _pipeline(d)
        # first materialization IS the measurement — a re-collect in
        # the same session reuses the gram shuffle files (skipped
        # stages) and times nothing
        t0 = time.perf_counter()
        rows = out.collect()
        t1 = time.perf_counter()
        occ = sum(r["dup_occurrences"] for r in rows)
        print(f"{tag:9s} spans {t1 - t0:6.2f}s  docs_hit={len(rows):6d}  "
              f"dup_occurrences={occ}")
        cut = _cut_pipeline(d)
        t0 = time.perf_counter()
        crows = cut.collect()
        t1 = time.perf_counter()
        tot_cut = sum(r["cut_tokens"] for r in crows)
        print(f"{tag:9s} cut   {t1 - t0:6.2f}s  docs_cut={len(crows):6d}  "
              f"cut_tokens={tot_cut}")
        d.unpersist()



if __name__ == "__main__":
    main()
