"""Structured Streaming: availableNow drain into memory sink must agree
with the equivalent batch plan (exactly-once over a static source)."""

from __future__ import annotations

from optimal_parallel_fp_growth_spark.operators.sessions import sessionize
from optimal_parallel_fp_growth_spark.sources.catalog import load_table
from optimal_parallel_fp_growth_spark.streaming.events import (
    batch_windowed_counts,
    run_to_memory,
    session_counts,
    stream_events,
    windowed_counts,
)


def test_windowed_counts_match_batch(spark, sf_small):
    st = windowed_counts(stream_events(spark, sf_small))
    run_to_memory(st, "wc_stream")
    got = {tuple(r) for r in spark.table("wc_stream").collect()}
    want = {tuple(r) for r in batch_windowed_counts(spark, sf_small).collect()}
    assert got == want and len(want) > 0


def test_session_window_counts_match_batch_sessionize(spark, sf_small):
    st = session_counts(stream_events(spark, sf_small), gap="30 minutes")
    run_to_memory(st, "sess_stream")
    got = spark.table("sess_stream")

    batch = sessionize(load_table(spark, sf_small, "events"), gap_minutes=30)
    # session_window closes at last_event + gap; compare (user, start, n).
    got_set = {(r.user_id, r.start_epoch, r.n_events) for r in got.collect()}
    want_set = {(r.user_id, r.start_epoch, r.n_events) for r in batch.collect()}
    assert got_set == want_set and len(want_set) > 0


def test_sampling_ops_are_streaming_compatible(spark, sf_small):
    # The sampling operators are stateless projections/filters plus a
    # stream-static broadcast join (rates dim), so the same code path
    # must run unchanged under Structured Streaming in append mode.
    from optimal_parallel_fp_growth_spark.operators.sampling import (
        corpus_split,
        mix_sources,
    )

    schema = spark.read.parquet(f"{sf_small}/documents.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_small)
    )
    st = corpus_split(mix_sources(stream, {"src0": 0.5})).select(
        "doc_id", "split"
    )
    run_to_memory(st, "mix_split_stream", output_mode="append")
    got = {tuple(r) for r in spark.table("mix_split_stream").collect()}

    batch = corpus_split(
        mix_sources(load_table(spark, sf_small, "documents"), {"src0": 0.5})
    ).select("doc_id", "split")
    want = {tuple(r) for r in batch.collect()}
    assert got == want and len(want) > 0


def test_windowed_distinct_sketch_matches_exact_batch(spark, sf_small):
    """Per-window user cardinalities at sf0.001 sit in the sketch's
    exact regime, so the streaming HLL estimate equals the exact batch
    count(DISTINCT) — and the stream aggregates sketches, never user
    sets."""
    from optimal_parallel_fp_growth_spark.sources.catalog import load_table
    from optimal_parallel_fp_growth_spark.streaming.events import (
        batch_windowed_distinct,
        windowed_distinct_sketch,
    )

    st = windowed_distinct_sketch(stream_events(spark, sf_small))
    run_to_memory(st, "wds_stream")
    got = {tuple(r) for r in spark.table("wds_stream").collect()}
    ev = load_table(spark, sf_small, "events")
    want = {tuple(r) for r in batch_windowed_distinct(ev).collect()}
    assert got == want and len(want) > 0


def test_enrich_stream_matches_batch_join(spark, sf_small):
    """Stream-static broadcast enrichment == the batch join, across
    micro-batches, including windowed aggregation downstream."""
    from pyspark.sql import functions as F

    from optimal_parallel_fp_growth_spark.streaming.events import enrich_stream

    dim = spark.createDataFrame(
        [(u, f"seg{u % 3}") for u in range(200)], "user_id long, segment string"
    )
    st = enrich_stream(stream_events(spark, sf_small), dim, "user_id")
    agg = st.groupBy("segment", "event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sv")
    )
    run_to_memory(agg, "enriched_stream")
    got = {tuple(r) for r in spark.table("enriched_stream").collect()}

    ev = load_table(spark, sf_small, "events")
    want = {
        tuple(r)
        for r in ev.join(dim, "user_id", "left")
        .groupBy("segment", "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sv"))
        .collect()
    }
    assert got == want and len(want) > 0


def test_correlate_streams_matches_batch_interval_join(spark, sf_small):
    """Native stream-stream interval join (views→purchases within 1h
    per user) == the batch interval join over the same data."""
    from pyspark.sql import functions as F

    from optimal_parallel_fp_growth_spark.streaming.events import (
        correlate_streams,
    )

    st = stream_events(spark, sf_small)
    views = st.where(F.col("event_type") == "view")
    buys = st.where(F.col("event_type") == "purchase")
    out = correlate_streams(views, buys, max_gap="1 hour")
    run_to_memory(out, "corr_stream", output_mode="append")
    got = {tuple(r) for r in spark.table("corr_stream").collect()}

    ev = load_table(spark, sf_small, "events")
    v = ev.where(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("left_event_id"),
        F.col("ts").alias("left_ts"),
    )
    b = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("r_user_id"),
        F.col("event_id").alias("right_event_id"),
        F.col("ts").alias("right_ts"),
    )
    want = {
        tuple(r)
        for r in v.join(
            b,
            (F.col("user_id") == F.col("r_user_id"))
            & (F.col("right_ts") >= F.col("left_ts"))
            & (F.col("right_ts") <= F.col("left_ts") + F.expr("INTERVAL 1 hour")),
        )
        .select(
            "user_id", "left_event_id", "right_event_id",
            F.col("left_ts").cast("long").alias("left_ts"),
            F.col("right_ts").cast("long").alias("right_ts"),
            (
                F.col("right_ts").cast("long") - F.col("left_ts").cast("long")
            ).alias("gap_seconds"),
        )
        .collect()
    }
    assert got == want and len(want) > 0


def test_html_extract_is_streaming_compatible(spark, sf_small):
    """extract_main_text is a stateless Arrow map (mapInPandas runs
    unchanged under Structured Streaming in append mode) — a streamed
    corpus must extract exactly what the batch plan extracts."""
    from optimal_parallel_fp_growth_spark.operators.html import (
        attach_html,
        extract_main_text,
    )

    schema = spark.read.parquet(f"{sf_small}/documents.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_small)
    )
    st = extract_main_text(attach_html(stream)).select(
        "doc_id", "n_kept", "n_chars"
    )
    run_to_memory(st, "html_stream", output_mode="append")
    got = {tuple(r) for r in spark.table("html_stream").collect()}

    batch = extract_main_text(
        attach_html(load_table(spark, sf_small, "documents"))
    ).select("doc_id", "n_kept", "n_chars")
    want = {tuple(r) for r in batch.collect()}
    assert got == want and len(want) > 0


def test_perplexity_scoring_is_streaming_compatible(spark, sf_small):
    """Scoring a stream against a STATIC pre-trained LM: stream-static
    left joins + a per-doc aggregation (complete mode — each doc's
    n-grams come from one row, so the agg state is bounded by the
    batch's doc count). Must equal the batch scorer."""
    from optimal_parallel_fp_growth_spark.operators.lm import (
        score_perplexity,
        train_bigram_lm,
    )

    docs = load_table(spark, sf_small, "documents")
    lm = train_bigram_lm(docs).cache()
    lm.count()

    schema = spark.read.parquet(f"{sf_small}/documents.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_small)
    )
    st = score_perplexity(stream, lm)
    run_to_memory(st, "ppl_stream", output_mode="complete")
    got = {tuple(r) for r in spark.table("ppl_stream").collect()}
    want = {tuple(r) for r in score_perplexity(docs, lm).collect()}
    lm.unpersist()
    assert got == want and len(want) > 0


def test_flac_pipeline_is_streaming_compatible(spark, sf_small):
    """attach_flac_media → extract_flac_stats is a stateless Arrow map
    chain (mapInPandas runs unchanged under Structured Streaming in
    append mode) — a streamed corpus must decode to exactly the batch
    statistics."""
    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        attach_flac_media,
        extract_flac_stats,
    )

    schema = spark.read.parquet(f"{sf_small}/documents.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_small)
    )
    cols = ["doc_id", "codec", "n_frames", "mean", "peak", "md5_ok"]
    st = extract_flac_stats(attach_flac_media(stream)).select(*cols)
    run_to_memory(st, "flac_stream", output_mode="append")
    got = {tuple(r) for r in spark.table("flac_stream").collect()}

    batch = extract_flac_stats(
        attach_flac_media(load_table(spark, sf_small, "documents"))
    ).select(*cols)
    want = {tuple(r) for r in batch.collect()}
    assert got == want and len(want) > 0


def test_video_and_gif_pipelines_are_streaming_compatible(spark, sf_small):
    """attach_{mixed_video,gif}_media → extract_mixed_video_frames is a
    stateless Arrow map chain (the inter-FRAME decoder state lives
    inside one payload's decode, never across rows), so the one-to-many
    frame expansion runs unchanged under Structured Streaming in append
    mode — a streamed corpus must decode to exactly the batch rows."""
    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        attach_gif_media,
        attach_mixed_video_media,
        extract_mixed_video_frames,
    )

    schema = spark.read.parquet(f"{sf_small}/documents.parquet").schema
    for name, attach in (
        ("video", attach_mixed_video_media),
        ("gif", attach_gif_media),
    ):
        stream = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(sf_small)
        )
        st = extract_mixed_video_frames(attach(stream))
        run_to_memory(st, f"{name}_stream", output_mode="append")
        got = {tuple(r) for r in spark.table(f"{name}_stream").collect()}
        batch = extract_mixed_video_frames(
            attach(load_table(spark, sf_small, "documents"))
        )
        want = {tuple(r) for r in batch.collect()}
        assert got == want and len(want) > 0


def test_stream_dedup_key_set_matches_batch_first_touch(spark, sf_small):
    from optimal_parallel_fp_growth_spark.operators.sessions import (
        first_touch,
    )
    from optimal_parallel_fp_growth_spark.streaming.events import stream_dedup

    st = stream_dedup(stream_events(spark, sf_small))
    run_to_memory(st, "dedup_stream", output_mode="append")
    got = {
        (r.user_id, r.event_type)
        for r in spark.table("dedup_stream").collect()
    }
    want = {
        (r.user_id, r.event_type)
        for r in first_touch(load_table(spark, sf_small, "events")).collect()
    }
    assert got == want and len(want) > 0
    # exactly one surviving row per key
    assert spark.table("dedup_stream").count() == len(want)


def test_stream_dedup_drops_cross_batch_duplicates(spark, tmp_path):
    """The load-bearing property: dedup state PERSISTS between
    micro-batches. Two files, one file per trigger: the batch-2
    duplicate of a batch-1 key must be dropped, the batch-2 fresh key
    kept — and the survivor is deterministically the batch-1 row
    (micro-batches execute in file order)."""
    import pathlib

    from pyspark.sql import functions as F

    from optimal_parallel_fp_growth_spark.streaming.events import stream_dedup

    d = pathlib.Path(tmp_path) / "stream"
    d.mkdir()
    b1 = spark.createDataFrame(
        [(1, "view", 10, 1.0)],
        "user_id long, event_type string, event_id long, value double",
    ).withColumn("ts", F.timestamp_seconds(F.lit(1000)))
    b2 = spark.createDataFrame(
        [(1, "view", 20, 2.0), (2, "view", 30, 3.0)],
        "user_id long, event_type string, event_id long, value double",
    ).withColumn("ts", F.timestamp_seconds(F.lit(2000)))
    b1.coalesce(1).write.parquet(str(d / "a_batch1"))
    b2.coalesce(1).write.parquet(str(d / "b_batch2"))
    schema = spark.read.parquet(str(d / "a_batch1")).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*/")
    )
    st = stream_dedup(src, ["user_id", "event_type"], watermark="1 hour")
    run_to_memory(st, "xbatch_dedup", output_mode="append")
    rows = {
        (r.user_id, r.event_type): r.event_id
        for r in spark.table("xbatch_dedup").collect()
    }
    assert rows == {(1, "view"): 10, (2, "view"): 30}
