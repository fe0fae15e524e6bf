"""Exactly-once streaming ingest into versioned tables (round 15,
VERDICT r14 task #2; sources/versioned.py::stream_ingest_to_table):
each micro-batch commits as one manifest version stamped with an
(app_id, epoch) watermark, and a replayed epoch is a no-op — so crash
+ replay yields exactly-once table contents, where stream_to_table is
only at-least-once."""

from __future__ import annotations

import time

import pytest

from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.sources.versioned import (
    append_table,
    create_table,
    last_txn_epoch,
    read_table,
    stream_ingest_to_table,
    table_history,
)


def _write_feed(spark, docs, src):
    """Three parquet files in doc_id thirds (one micro-batch each
    under maxFilesPerTrigger=1)."""
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    third = len(ids) // 3
    bounds = [ids[third], ids[2 * third]]
    lo = float("-inf")
    for hi in [*bounds, float("inf")]:
        docs.where(
            (F.col("doc_id") > lo) & (F.col("doc_id") <= hi)
        ).coalesce(1).write.mode("append").parquet(src)
        time.sleep(0.05)
        lo = hi


@pytest.fixture()
def feed(spark, sf_small, tmp_path):
    from optimal_parallel_fp_growth_spark.sources.catalog import load_table

    docs = load_table(spark, sf_small, "documents").select("doc_id", "text")
    src = str(tmp_path / "feed")
    _write_feed(spark, docs, src)
    return docs, src


def _stream(spark, docs, src):
    return (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def test_stream_ingest_agrees_with_batch_and_versions_per_batch(
    spark, feed, tmp_path
):
    docs, src = feed
    tbl = str(tmp_path / "vtable")
    q = stream_ingest_to_table(
        _stream(spark, docs, src), tbl, str(tmp_path / "ckpt"), app_id="app"
    )
    q.awaitTermination()
    # one atomic version per micro-batch, visible to time travel
    hist = table_history(tbl)
    assert [h["op"] for h in hist] == ["create", "append", "append"]
    # stream-vs-batch agreement: final table == the full batch input
    got = sorted(
        (r.doc_id, r.text) for r in read_table(spark, tbl).collect()
    )
    want = sorted((r.doc_id, r.text) for r in docs.collect())
    assert got == want
    # the watermark recorded the last committed epoch
    assert last_txn_epoch(tbl, "app") == 2
    assert last_txn_epoch(tbl, "other-app") is None


def test_replayed_epoch_is_noop_and_next_epoch_commits(
    spark, feed, tmp_path
):
    docs, src = feed
    tbl = str(tmp_path / "vtable")
    q = stream_ingest_to_table(
        _stream(spark, docs, src), tbl, str(tmp_path / "ckpt"), app_id="app"
    )
    q.awaitTermination()
    n = read_table(spark, tbl).count()
    head = len(table_history(tbl))
    batch = docs.limit(10)
    # a replayed epoch (== watermark, and one below it) commits NOTHING
    for epoch in (2, 0):
        v = append_table(batch, tbl, txn=("app", epoch))
        assert v == head  # returns the current head, no new version
        assert len(table_history(tbl)) == head
        assert read_table(spark, tbl).count() == n
    # a DIFFERENT app's epoch 0 is not shadowed by this app's watermark
    assert append_table(batch, tbl, txn=("other", 0)) == head + 1
    # and the next epoch of the original app commits normally
    assert append_table(batch, tbl, txn=("app", 3)) == head + 2
    assert last_txn_epoch(tbl, "app") == 3
    assert last_txn_epoch(tbl, "other") == 0
    assert read_table(spark, tbl).count() == n + 20


def test_lost_checkpoint_full_replay_is_exactly_once(
    spark, feed, tmp_path
):
    """The failure stream_to_table cannot survive: the batch committed
    but the checkpoint was lost (crash between the two). Replaying the
    WHOLE stream from a fresh checkpoint under the same app_id
    re-delivers every epoch — and every one must no-op."""
    docs, src = feed
    tbl = str(tmp_path / "vtable")
    q = stream_ingest_to_table(
        _stream(spark, docs, src), tbl, str(tmp_path / "ckpt1"), app_id="app"
    )
    q.awaitTermination()
    n = read_table(spark, tbl).count()
    versions = len(table_history(tbl))
    # fresh checkpoint == total checkpoint loss: epochs restart at 0
    q2 = stream_ingest_to_table(
        _stream(spark, docs, src), tbl, str(tmp_path / "ckpt2"), app_id="app"
    )
    q2.awaitTermination()
    assert read_table(spark, tbl).count() == n
    assert len(table_history(tbl)) == versions
    # the baseline sink would have doubled the table here; a DIFFERENT
    # app_id is a genuinely different writer and must append
    q3 = stream_ingest_to_table(
        _stream(spark, docs, src), tbl, str(tmp_path / "ckpt3"), app_id="b"
    )
    q3.awaitTermination()
    assert read_table(spark, tbl).count() == 2 * n


def test_first_batch_create_carries_the_watermark(spark, tmp_path):
    """A replayed FIRST batch (the create) must no-op through the
    append path's watermark check."""
    batch = spark.range(0, 50).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("text")
    )
    tbl = str(tmp_path / "vtable")
    create_table(batch, tbl, txn=("app", 0))
    assert last_txn_epoch(tbl, "app") == 0
    assert append_table(batch, tbl, txn=("app", 0)) == 1
    assert read_table(spark, tbl).count() == 50
    assert [h["op"] for h in table_history(tbl)] == ["create"]


def test_watermark_survives_unrelated_commits(spark, tmp_path):
    """The txns map is inherited commit-to-commit, so an unrelated
    writer between two epochs must not reset replay detection."""
    batch = spark.range(0, 50).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("text")
    )
    tbl = str(tmp_path / "vtable")
    create_table(batch, tbl, txn=("app", 0))
    append_table(batch, tbl)  # plain writer, no txn
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        compact_table,
    )

    compact_table(spark, tbl)
    assert last_txn_epoch(tbl, "app") == 0
    head = len(table_history(tbl))
    assert append_table(batch, tbl, txn=("app", 0)) == head  # still a no-op
    assert append_table(batch, tbl, txn=("app", 1)) == head + 1


def test_merge_table_txn_replay_is_zero_io_noop(spark, tmp_path):
    """merge_table(txn=): a replayed epoch returns the head with NO new
    version and NO file rewrites — stronger than keyed idempotence,
    which re-reads and rewrites the affected files."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        _load_manifest,
        _versions,
        merge_table,
    )

    batch = spark.range(0, 100).select(
        F.col("id").alias("doc_id"), (F.col("id") * 2).alias("v")
    )
    tbl = str(tmp_path / "vtable")
    create_table(batch.repartitionByRange(4, "doc_id"), tbl)
    changes = spark.createDataFrame([(5, -1), (50, -2)], "doc_id long, v long")
    v = merge_table(changes, tbl, "doc_id", txn=("cdc", 0))
    assert v == 2
    files_v2 = _load_manifest(tbl, 2)["files"]
    # the replay: same epoch → no version, files untouched
    assert merge_table(changes, tbl, "doc_id", txn=("cdc", 0)) == 2
    assert _versions(tbl) == [1, 2]
    assert _load_manifest(tbl, 2)["files"] == files_v2
    # next epoch merges normally
    more = spark.createDataFrame([(7, -3)], "doc_id long, v long")
    assert merge_table(more, tbl, "doc_id", txn=("cdc", 1)) == 3
    got = {r.doc_id: r.v for r in read_table(spark, tbl).collect()}
    assert (got[5], got[50], got[7]) == (-1, -2, -3) and len(got) == 100


def test_stream_merge_exactly_once_under_full_replay(
    spark, feed, tmp_path
):
    """stream_merge_to_table(app_id=...): total checkpoint loss +
    full replay leaves versions AND contents unchanged."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        stream_merge_to_table,
    )

    docs, src = feed
    tbl = str(tmp_path / "vtable")
    q = stream_merge_to_table(
        _stream(spark, docs, src), tbl, str(tmp_path / "ck1"), "doc_id",
        app_id="cdc",
    )
    q.awaitTermination()
    n = read_table(spark, tbl).count()
    versions = len(table_history(tbl))
    q2 = stream_merge_to_table(
        _stream(spark, docs, src), tbl, str(tmp_path / "ck2"), "doc_id",
        app_id="cdc",
    )
    q2.awaitTermination()
    assert read_table(spark, tbl).count() == n == docs.count()
    assert len(table_history(tbl)) == versions  # zero replayed commits
