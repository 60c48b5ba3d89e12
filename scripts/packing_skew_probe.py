"""Skew probe for sequence packing: per-lang window vs per-(lang, shard).

Round 3 changed `pipeline_pack_sequences` / `pipeline_curate_full` to
window the running-token cumsum by (lang, shard) instead of lang alone
(VERDICT.md r2 item 2). This probe quantifies why on a deliberately
skewed corpus (80% of documents in one language — the real-world web
mix): the per-lang window puts 80% of the corpus into ONE sort task,
the shard term splits it across `_N_PACK_SHARDS` tasks.

    python scripts/packing_skew_probe.py [N_DOCS]

Expected shape at 4M docs (local[32]): the sharded window several times
faster than the single-language window, with identical totals per lang.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from iceberg_catalog_bench_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    spark = get_spark(app_name="packing-skew-probe")

    # 80% lang 'en', the rest spread over 4 langs; n_tokens ~ U[30, 530)
    docs = (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 10 < 8, F.lit("en"))
            .otherwise(F.concat(F.lit("l"), (F.col("id") % 4).cast("string")))
            .alias("lang"),
            (F.abs(F.xxhash64("id")) % 500 + 30).alias("n_tokens"),
            ((F.abs(F.xxhash64("id", F.lit(1))) % 16)).cast("int").alias("shard"),
        )
        .localCheckpoint()  # fix the input so both plans read identical data
    )

    def run(label: str, keys: list[str]) -> float:
        w = (
            Window.partitionBy(*keys).orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        packed = docs.select(
            *keys,
            F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 2048.0).alias(
                "seq_id"
            ),
            "n_tokens",
        )
        agg = packed.groupBy("lang").agg(
            F.count(F.lit(1)).alias("docs"), F.sum("n_tokens").alias("toks")
        )
        t0 = time.perf_counter()
        rows = {r["lang"]: (r["docs"], r["toks"]) for r in agg.collect()}
        dt = time.perf_counter() - t0
        print(f"{label}: {dt:.2f}s  per-lang totals: {sorted(rows.items())[:2]}...",
              flush=True)
        return dt

    t_skew = run("window per lang        ", ["lang"])
    t_shard = run("window per (lang,shard)", ["lang", "shard"])
    print(f"speedup: {t_skew / t_shard:.1f}x at {n} docs, 80% one language",
          flush=True)


if __name__ == "__main__":
    main()
