"""Behavioral tests for the LLM-pipeline operators beyond oracle parity:
LSH recall, simhash self-consistency, multimodal frame shapes."""

from pyspark.sql import functions as F

from iceberg_catalog_bench_spark.operators import registry

registry.load_all()


def test_ann_lsh_recall_vs_brute_force(spark, oracle_sf_dir):
    """ANN must recover ≥ 0.9 of the true top-10. The 24-table ×
    6-bit OR-banding with hamming-1 multiprobe measures recall 1.0 on
    this (near-uniform, worst-case-for-LSH) corpus; 0.9 is the
    asserted floor. Everything is deterministic (xxhash64 planes), so
    this is a regression gate, not a flaky statistical test."""
    exact = {
        r["vec_id"]
        for r in registry.QUERIES["knn_brute_force"](spark, oracle_sf_dir).collect()
    }
    approx = {
        r["vec_id"]
        for r in registry.QUERIES["ann_lsh_buckets"](spark, oracle_sf_dir).collect()
    }
    assert len(exact) == 10
    assert len(approx & exact) >= 9, f"recall@10 < 0.9: {sorted(approx & exact)}"


def test_no_cartesian_join_in_pair_operators(spark, oracle_sf_dir):
    """The dedup/similarity pair generators must plan as equi-joins on
    hash buckets — never CartesianProduct / BroadcastNestedLoopJoin
    (the n² shapes that die at corpus scale)."""
    for name in ("dedup_embedding_cosine", "dedup_ngram_jaccard",
                 "dedup_minhash_lsh", "ann_lsh_buckets", "dedup_simhash",
                 "join_asof_last_purchase", "join_range_error_context"):
        plan = (
            registry.QUERIES[name](spark, oracle_sf_dir)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoop" not in plan, name


def test_stop_shingle_cap_drops_boilerplate(spark, tmp_path):
    """A boilerplate shingle shared by every document must not create
    pair candidates: with the df cap, two otherwise-different docs that
    share only the boilerplate text never qualify; true near-dups (high
    overlap in rare shingles) still do."""
    import iceberg_catalog_bench_spark.operators.dedup as dd

    boiler = "subscribe to our newsletter today friends"
    rows = []
    # 30 distinct docs all carrying the same boilerplate prefix
    for i in range(30):
        rows.append((i, f"{boiler} unique body {i} words differ entirely here {i}"))
    # one true near-dup pair (identical long tail, one token changed)
    tail = " ".join(f"tok{j}" for j in range(40))
    rows.append((100, f"alpha {tail}"))
    rows.append((101, f"beta {tail}"))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = str(tmp_path / "docs")
    docs.coalesce(1).write.parquet(out + "/documents.parquet")
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dd.dedup_ngram_jaccard(spark, out).collect()
    }
    assert (100, 101) in pairs, "true near-dup must survive the cap"
    assert all(a >= 100 for a, _ in pairs), (
        f"boilerplate-only docs must not pair: {sorted(pairs)[:5]}"
    )


def test_simhash_near_dups_cover_jaccard_dups(spark, oracle_sf_dir):
    """Every ≥0.9-Jaccard near-dup pair must carry simhash_covered=True
    — the candidate-superset contract the driver oracle also pins."""
    rows = registry.QUERIES["dedup_simhash"](spark, oracle_sf_dir).collect()
    assert rows, "fixture should contain near-dup pairs"
    missed = [r for r in rows if not r["simhash_covered"]]
    assert not missed, f"simhash missed strong near-dups: {missed[:5]}"


def test_multimodal_frame_sample_shape(spark, oracle_sf_dir):
    df = registry.QUERIES["multimodal_frame_sample"](spark, oracle_sf_dir)
    rows = df.collect()
    assert rows, "no frames sampled"
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, frames in per_doc.items():
        idxs = sorted(f["frame_idx"] for f in frames)
        assert idxs == list(range(len(idxs))), f"doc {doc_id} frame idxs not dense"
        assert all(1 <= f["frame_bytes"] <= 256 for f in frames)
        assert len(frames) <= 8


def test_multimodal_real_decoder_is_gated():
    from iceberg_catalog_bench_spark.operators.multimodal import _decode_image_real

    try:
        _decode_image_real(b"xx")
        raise AssertionError("stub should raise")
    except NotImplementedError:
        pass


def test_pandas_udf_matches_jvm_quality_scores(spark, oracle_sf_dir):
    """Arrow-batched Pandas UDF path must agree exactly with the JVM
    built-in path (same rounding, same values)."""
    jvm = registry.QUERIES["text_quality_scores"](spark, oracle_sf_dir).toPandas()
    udf = registry.QUERIES["text_quality_pandas_udf"](spark, oracle_sf_dir).toPandas()
    jvm = jvm.sort_values("doc_id").reset_index(drop=True)
    udf = udf.sort_values("doc_id").reset_index(drop=True)
    assert (jvm["n_tokens"].values == udf["n_tokens"].values).all()
    for c in ("avg_token_len", "stopword_ratio", "distinct_ratio"):
        assert (abs(jvm[c].values - udf[c].values) < 1e-9).all(), c


def test_stateful_sessionize_matches_batch_closed_sessions(spark, oracle_sf_dir):
    """applyInPandasWithState sessionization must agree with the batch
    session_window operator on every CLOSED session (the availableNow
    replay cannot fire the final timeout, so each user's last session
    stays open — excluded from the comparison)."""
    from iceberg_catalog_bench_spark.sources import load_table
    from pyspark.sql import functions as F

    stream = registry.QUERIES["streaming_sessionize_stateful"](spark, oracle_sf_dir)
    got = {
        (r["user_id"], r["session_start_s"], r["n_events"])
        for r in stream.collect()
    }

    ev = load_table(spark, "events", oracle_sf_dir).filter(F.col("user_id") < 40)
    batch = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("sw.start")).alias("start_s"),
            F.unix_timestamp(F.col("sw.end")).alias("end_s"),
            "n_events",
        )
        .collect()
    )
    max_ts = ev.agg(F.max(F.unix_timestamp("ts"))).collect()[0][0]
    # a session's event-time timeout (session end = last_ts + gap) fires
    # once the final watermark (max event ts - 2h delay) passes it; at
    # the exact boundary second the firing depends on sub-second
    # watermark arithmetic, so assert the two-sided contract instead:
    watermark_s = max_ts - 2 * 3600
    all_sessions = {(r["user_id"], r["start_s"], r["n_events"]) for r in batch}
    definitely_closed = {
        (r["user_id"], r["start_s"], r["n_events"])
        for r in batch
        if r["end_s"] < watermark_s - 1
    }
    assert got <= all_sessions, f"fabricated sessions: {got - all_sessions}"
    assert definitely_closed <= got, f"missing closed sessions: {definitely_closed - got}"
    assert len(all_sessions) > len(definitely_closed), "fixture should leave sessions open"


def test_connected_components_path_graph(spark):
    """Pointer jumping must collapse a long path (diameter 11) to one
    component within the round budget, and keep disjoint components
    apart. A plain neighbor-min propagation would need 11 rounds; the
    jump step gets there in O(log n)."""
    from iceberg_catalog_bench_spark.operators.dedup import connected_components

    path = [(i, i + 1) for i in range(100, 111)]       # 100-...-111
    star = [(500, x) for x in (501, 502, 503)]          # star at 500
    pair = [(900, 901)]
    edges = spark.createDataFrame(path + star + pair, "u bigint, v bigint")
    labels = {r["node"]: r["label"] for r in connected_components(edges).collect()}
    assert {labels[n] for n in range(100, 112)} == {100}
    assert {labels[n] for n in (500, 501, 502, 503)} == {500}
    assert labels[900] == labels[901] == 900


def test_ann_ivf_verdict_green(spark, oracle_sf_dir):
    """The IVF driver row must report recall@10 ≥ 0.9 and a sublinear
    scan — deterministic (seeded init + argmin tie-breaks), so this is
    a regression gate on index quality."""
    row = registry.QUERIES["ann_ivf"](spark, oracle_sf_dir).collect()[0]
    assert row["recall_ok"] and row["sublinear_ok"] and row["k_returned"] == 10


def test_knn_pq_adc_verdict_green(spark, oracle_sf_dir):
    """The PQ/ADC driver row must report recall@10 ≥ 0.9 from a
    shortlist under half the corpus — deterministic (lowest-vec_id
    codebook init + struct-min tie-breaks), so this is a regression
    gate on codebook quality; 16-entry codebooks measurably fail it
    (7/10) on this corpus, 128-entry ones hit 10/10."""
    row = registry.QUERIES["knn_pq_adc"](spark, oracle_sf_dir).collect()[0]
    assert row["recall_ok"] and row["shortlist_ok"] and row["k_returned"] == 10


def test_unigram_unk_bucket_scores_oov(spark, tmp_path, monkeypatch):
    """With the vocab capped below the corpus vocabulary, OOV tokens
    must score through the shared <unk> bucket carrying the dropped
    mass — checked against a hand-computed LM on a tiny corpus."""
    import math

    from iceberg_catalog_bench_spark.operators import text as text_ops

    monkeypatch.setattr(text_ops, "_UNIGRAM_VOCAB_K", 4)
    rows = [(1, "a a a a b b b c c d"), (2, "e f g h a")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = str(tmp_path / "docs")
    docs.coalesce(1).write.parquet(out + "/documents.parquet")

    got = {
        r["doc_id"]: r["avg_neg_logprob"]
        for r in text_ops.text_unigram_logprob(spark, out).collect()
    }
    # counts: a=5 b=3 c=2 d=e=f=g=h=1, s=15; top-4 by (c desc, token)
    # = {a,b,c,d}; unk mass = 4 (e,f,g,h).
    s = 15.0
    lp = {"a": 5, "b": 3, "c": 2, "d": 1}
    unk = 4
    doc1 = [lp["a"]] * 4 + [lp["b"]] * 3 + [lp["c"]] * 2 + [lp["d"]]
    doc2 = [unk] * 4 + [lp["a"]]
    for doc_id, toks in ((1, doc1), (2, doc2)):
        want = round(sum(-math.log(c / s) for c in toks) / len(toks), 4)
        assert abs(got[doc_id] - want) < 1e-9, (doc_id, got[doc_id], want)


def test_embedding_cosine_banding_recall_on_planted_dups(spark, tmp_path):
    """Measured (not derived) banding completeness: on a corpus with 20
    planted near-dups (cos ≈ 0.96), the LSH candidate generation +
    exact verify must return exactly the planted pairs as the top-20 —
    recall 1.0 with zero spurious pairs above them."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.normal(size=(200, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, base[i].tolist()) for i in range(200)]
    planted = set()
    for j in range(20):
        v = base[j] + rng.normal(scale=0.05, size=64)
        v /= np.linalg.norm(v)
        rows.append((1000 + j, v.tolist()))
        planted.add((j, 1000 + j))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = str(tmp_path / "emb")
    df.coalesce(1).write.parquet(out + "/embeddings.parquet")

    got = registry.QUERIES["dedup_embedding_cosine"](spark, out).collect()
    top = {(r["vec_a"], r["vec_b"]) for r in got}
    assert top == planted, f"missed: {planted - top}; spurious: {top - planted}"


def test_bm25_ranks_keyword_dense_docs_first(spark, tmp_path):
    """BM25 semantics on a planted corpus: a document saturated with
    the query terms outranks one that merely mentions them once, and a
    term-free document never scores."""
    import pandas as pd

    out = str(tmp_path / "sf")
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            "hash join window hash join window hash join",   # dense
            "hash once in a long tail of other words " + "x " * 40,
            "nothing relevant here at all",
        ],
        "lang": ["en"] * 3,
        "source": ["t"] * 3,
        "n_chars": [10, 10, 10],
    })
    spark.createDataFrame(docs).coalesce(1).write.parquet(
        out + "/documents.parquet")
    rows = registry.QUERIES["text_bm25_keyword_search"](spark, out).collect()
    ranked = [r["doc_id"] for r in rows]
    assert ranked[0] == 1                 # dense doc wins
    assert 3 not in ranked                # no term, no score
    assert rows[0]["score_micro"] > rows[-1]["score_micro"] > 0
