"""Behavioral tests for the LLM-pipeline operators beyond oracle parity:
LSH recall, simhash self-consistency, multimodal frame shapes."""

from pyspark.sql import functions as F

from iceberg_catalog_bench_spark.operators import registry

registry.load_all()


def test_ann_lsh_recall_vs_brute_force(spark, oracle_sf_dir):
    """The ANN bucket scan must recover most of the true top-10
    (random-hyperplane LSH with 8 planes on 64-d data)."""
    exact = {
        r["vec_id"]
        for r in registry.QUERIES["knn_brute_force"](spark, oracle_sf_dir).collect()
    }
    approx = {
        r["vec_id"]
        for r in registry.QUERIES["ann_lsh_buckets"](spark, oracle_sf_dir).collect()
    }
    # in-bucket candidates are a subset of the corpus; recall@10 >= 0.3
    # is the determinism-checked floor for 8 planes (bucket ~1/256 of
    # corpus yet similar vectors collide far more often than random)
    assert len(exact) == 10
    assert len(approx & exact) >= 3, f"recall too low: {approx & exact}"


def test_simhash_near_dups_cover_jaccard_dups(spark, oracle_sf_dir):
    """Documents that are >=0.9-Jaccard near-dups should also collide
    under simhash with small hamming distance (the two detectors agree
    on strong duplicates)."""
    jac = {
        (r["doc_a"], r["doc_b"])
        for r in registry.QUERIES["dedup_ngram_jaccard"](spark, oracle_sf_dir)
        .filter(F.col("jaccard") >= 0.9).collect()
    }
    sim = {
        (r["doc_a"], r["doc_b"])
        for r in registry.QUERIES["dedup_simhash"](spark, oracle_sf_dir).collect()
    }
    assert jac, "fixture should contain near-dup pairs"
    covered = len(jac & sim) / len(jac)
    assert covered >= 0.8, f"simhash missed too many strong near-dups: {covered:.2f}"


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
