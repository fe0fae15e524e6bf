"""Streaming LSH near-dup (streaming/neardup.py) vs the batch twin:
same md5 hash family, min-owner-per-bucket semantics under a
doc_id-ordered multi-batch feed."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.operators.dedup import (
    NUM_BANDS,
    NUM_HASHES,
    _band_key_col,
    minhash_signatures,
)
from optimal_parallel_fp_growth_spark.sources.catalog import load_table
from optimal_parallel_fp_growth_spark.streaming.events import run_to_memory
from optimal_parallel_fp_growth_spark.streaming.neardup import streaming_neardup


def _doc_stream(spark, docs, tmp_path, n_parts: int):
    """doc_id-ordered slices written sequentially: arrival order ==
    doc_id order across micro-batches, so stream owners == batch
    min-owners."""
    dst = str(tmp_path / "doc_parts")
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    step = max(1, len(ids) // n_parts)
    bounds = [ids[i] for i in range(step, len(ids), step)][: n_parts - 1]
    lo = float("-inf")
    for hi in [*bounds, float("inf")]:
        chunk = docs.where(
            (F.col("doc_id") > lo) & (F.col("doc_id") <= hi)
        )
        chunk.coalesce(1).write.mode("append").parquet(dst)
        time.sleep(0.05)
        lo = hi
    return (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(dst)
    )


def _batch_twin(docs):
    """(doc_id, dup_of, n_agree) for every non-owner doc per band
    bucket, owner = min doc_id in the bucket."""
    rows = NUM_HASHES // NUM_BANDS
    sigs = minhash_signatures(docs)
    bands = sigs.select(
        "doc_id", "sig", _band_key_col(NUM_BANDS, rows).alias("band_key")
    ).collect()
    buckets: dict[str, list] = {}
    for r in bands:
        buckets.setdefault(r.band_key, []).append((r.doc_id, list(r.sig)))
    want = set()
    for bkey, members in buckets.items():
        members.sort(key=lambda m: m[0])
        owner, osig = members[0]
        for d, s in members[1:]:
            want.add((d, owner, sum(a == b for a, b in zip(s, osig)), bkey))
    return want


def test_stream_matches_batch_min_owner(spark, sf_small, tmp_path):
    docs = load_table(spark, sf_small, "documents").select("doc_id", "text")
    st = streaming_neardup(_doc_stream(spark, docs, tmp_path, 4))
    run_to_memory(st, "neardup_stream", output_mode="update")
    got = {tuple(r) for r in spark.table("neardup_stream").collect()}
    want = _batch_twin(docs)
    assert got == want
    assert len(want) > 0  # the corpus actually has co-bucketed docs


def test_cross_batch_state_carries(spark, tmp_path):
    """A bucket owned in batch 1 must flag duplicates arriving in later
    batches: disjoint-vocabulary originals (every bucket
    singleton-owned by its source) + exact clones in later slices."""
    rows = [
        (i, " ".join(f"w{i}x{j} tok{i}y{j}" for j in range(12)))
        for i in range(12)
    ]
    base = spark.createDataFrame(rows, "doc_id long, text string")
    clones = base.select((F.col("doc_id") + 100).alias("doc_id"), "text")
    docs = base.unionByName(clones)
    st = streaming_neardup(_doc_stream(spark, docs, tmp_path, 4))
    run_to_memory(st, "neardup_clones", output_mode="update")
    out = spark.table("neardup_clones")
    # every clone is flagged with FULL signature agreement vs its
    # source, once per band
    flagged = {
        (r.doc_id, r.dup_of)
        for r in out.where(F.col("n_agree") == NUM_HASHES).collect()
    }
    assert flagged == {(i + 100, i) for i in range(12)}
    per_clone = (
        out.where(F.col("n_agree") == NUM_HASHES)
        .groupBy("doc_id")
        .count()
        .collect()
    )
    assert all(r["count"] == NUM_BANDS for r in per_clone)


def _ts_doc_stream(spark, batches, tmp_path, name):
    """batches: list of lists of (doc_id, text, ts_str); written as
    sequential files so each becomes one micro-batch."""
    dst = str(tmp_path / name)
    schema = "doc_id long, text string, ts timestamp"
    for rows in batches:
        df = spark.createDataFrame(
            [(d, t, ts) for d, t, ts in rows], "doc_id long, text string, ts string"
        ).withColumn("ts", F.to_timestamp("ts"))
        df.coalesce(1).write.mode("append").parquet(dst)
        time.sleep(0.05)
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(dst)
    )


def _crafted(i):
    return " ".join(f"w{i}x{j} tok{i}y{j}" for j in range(12))


def test_ttl_huge_matches_plain(spark, tmp_path):
    batches = [
        [(i, _crafted(i), "2026-01-01 00:00:00") for i in range(6)],
        [(i + 100, _crafted(i), "2026-01-01 01:00:00") for i in range(6)],
    ]
    st = streaming_neardup(
        _ts_doc_stream(spark, batches, tmp_path, "ttl_huge"), ttl="3650 days"
    )
    run_to_memory(st, "neardup_ttl_huge", output_mode="update")
    flagged = {
        (r.doc_id, r.dup_of)
        for r in spark.table("neardup_ttl_huge")
        .where(F.col("n_agree") == NUM_HASHES)
        .collect()
    }
    assert flagged == {(i + 100, i) for i in range(6)}


def test_ttl_expires_and_readmits(spark, tmp_path):
    """Owner admitted at t0; an unrelated batch at t0+5d advances the
    watermark past t0+ttl; the NEXT unrelated batch fires the expired
    timers (a group's timer only fires in a batch where it receives no
    data); clones at t0+15d then re-admit as fresh owners — NO
    candidate rows."""
    batches = [
        [(i, _crafted(i), "2026-01-01 00:00:00") for i in range(6)],
        [(50 + i, _crafted(50 + i), "2026-01-06 00:00:00") for i in range(3)],
        [(60 + i, _crafted(60 + i), "2026-01-11 00:00:00") for i in range(3)],
        [(i + 100, _crafted(i), "2026-01-16 00:00:00") for i in range(6)],
    ]
    st = streaming_neardup(
        _ts_doc_stream(spark, batches, tmp_path, "ttl_exp"), ttl="1 hour"
    )
    run_to_memory(st, "neardup_ttl_exp", output_mode="update")
    assert spark.table("neardup_ttl_exp").count() == 0


def test_num_hashes_mismatch_rejected(spark, tmp_path):
    """minhash_signatures emits exactly NUM_HASHES components, so any
    other num_hashes must fail loudly rather than slice degenerate band
    keys (ADVICE r5)."""
    import pytest

    docs = spark.createDataFrame(
        [(1, "a b c")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="num_hashes"):
        streaming_neardup(docs, num_hashes=NUM_HASHES * 2)
    with pytest.raises(ValueError, match="must divide"):
        streaming_neardup(docs, num_bands=5)  # 5 does not divide 16


def test_owner_redelivery_emits_no_self_candidate(spark, tmp_path):
    """At-least-once redelivery: the admitted bucket owner re-arriving
    in a later micro-batch must NOT emit (owner, owner, 16) — the batch
    tier excludes self-pairs via doc_a < doc_b (ADVICE r5)."""
    rows = [(i, _crafted(i)) for i in range(6)]
    base = spark.createDataFrame(rows, "doc_id long, text string")
    # batch 1 admits owners; batch 2 redelivers the SAME docs
    st = streaming_neardup(_doc_stream(spark, base.unionByName(base), tmp_path, 2))
    run_to_memory(st, "neardup_redeliver", output_mode="update")
    out = spark.table("neardup_redeliver").collect()
    assert all(r.doc_id != r.dup_of for r in out)


def test_owner_redelivery_no_self_candidate_ttl(spark, tmp_path):
    """Same redelivery guard on the TTL state handler."""
    b = [(i, _crafted(i), "2026-01-01 00:00:00") for i in range(6)]
    st = streaming_neardup(
        _ts_doc_stream(spark, [b, b], tmp_path, "redeliver_ttl"),
        ttl="3650 days",
    )
    run_to_memory(st, "neardup_redeliver_ttl", output_mode="update")
    out = spark.table("neardup_redeliver_ttl").collect()
    assert all(r.doc_id != r.dup_of for r in out)
