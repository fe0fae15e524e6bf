"""Round-17 lakehouse hardening: bloom bitmaps move OUT of the
single-JSON manifest into lazily-loaded per-file sidecar blobs
(``<file>.parquet.bloom`` — the Iceberg puffin shape; VERDICT r16 task
#2). The manifest carries only (offset, length, m, k) per bloom column,
so it stays KB-scale at any file count and every reader stops paying
O(files × bloom-cols × bitmap) JSON parsing. Blob lifecycle rides data-
file adjacency: vacuum strips blobs with their files, deep clones copy
them, shallow clones resolve them under the source root, and a missing
blob fails OPEN (a kept file is never a wrong answer)."""

from __future__ import annotations

import json
import pathlib

import pytest

from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.sources import versioned as V
from optimal_parallel_fp_growth_spark.sources.versioned import (
    _BLOOM_BLOB_SUFFIX,
    _bloom_blob_path,
    _bloom_entry_bits,
    _load_manifest,
    _manifest_path,
    clone_table,
    create_table,
    files_scanned,
    read_table,
    vacuum_table,
)

N_FILES = 8


def _df(spark, start, n):
    return spark.range(start, start + n).select(
        F.col("id").alias("doc_id"),
        F.md5(F.col("id").cast("string")).alias("h"),
        (F.col("id") * 2).alias("v"),
    )


def _h(i: int) -> str:
    import hashlib

    return hashlib.md5(str(i).encode()).hexdigest()


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "tbl")
    create_table(
        _df(spark, 0, 2000).repartitionByRange(N_FILES, "doc_id"),
        path,
        bloom_cols=["h"],
    )
    return path


def test_manifest_carries_no_inline_bitmaps(table):
    """The scale contract itself: every __bloom entry is a (off, len,
    m, k) reference, the blob file exists adjacent to its data file
    with exactly the referenced bytes, and the manifest JSON is
    KB-scale — smaller than the bitmaps it references, which inline
    base64 could never be."""
    man = _load_manifest(table, 1)
    total_bitmap_bytes = 0
    n_entries = 0
    for f, st in man["file_stats"].items():
        for col, entry in (st.get("__bloom") or {}).items():
            n_entries += 1
            assert "b64" not in entry, (f, col)
            # "v" = position-function version (r17: single-digest v2)
            assert set(entry) == {"off", "len", "m", "k", "v"}, entry
            blob = pathlib.Path(_bloom_blob_path(table, f))
            assert blob.is_file(), blob
            assert blob.stat().st_size >= entry["off"] + entry["len"]
            total_bitmap_bytes += entry["len"]
    assert n_entries == N_FILES  # every file stamped one 'h' bitmap
    manifest_bytes = _manifest_path(table, 1).stat().st_size
    assert manifest_bytes < total_bitmap_bytes, (
        f"manifest {manifest_bytes}B should be smaller than the "
        f"{total_bitmap_bytes}B of bitmaps it references"
    )


def test_missing_blob_fails_open_not_wrong(spark, table):
    """Deleting every blob degrades bloom pruning to fail-open (all
    files survive) but never changes an answer — the posture of
    saturated/absent bitmaps."""
    probe = _h(777)
    assert files_scanned(table, prune=("h", "==", probe)) <= 2
    for f in _load_manifest(table, 1)["files"]:
        pathlib.Path(_bloom_blob_path(table, f)).unlink()
    # fail-open: the scattered key's range check keeps every file
    assert files_scanned(table, prune=("h", "==", probe)) == N_FILES
    got = read_table(spark, table, prune=("h", "==", probe)).where(
        F.col("h") == probe
    ).collect()
    assert len(got) == 1 and got[0].doc_id == 777


def test_truncated_blob_fails_open(spark, table):
    man = _load_manifest(table, 1)
    f = man["files"][0]
    blob = pathlib.Path(_bloom_blob_path(table, f))
    blob.write_bytes(blob.read_bytes()[:10])  # short read → None
    entry = man["file_stats"][f]["__bloom"]["h"]
    assert _bloom_entry_bits(entry, str(blob)) is None
    got = read_table(spark, table, prune=("h", "==", _h(0))).where(
        F.col("h") == _h(0)
    ).collect()
    assert len(got) == 1


def test_legacy_inline_b64_manifest_still_prunes(spark, tmp_path):
    """A pre-r17 manifest with inline base64 bitmaps keeps pruning:
    _bloom_entry_bits decodes "b64" entries in place, no blob needed."""
    import base64

    path = str(tmp_path / "legacy")
    create_table(
        _df(spark, 0, 400).repartitionByRange(2, "doc_id"),
        path,
        bloom_cols=["h"],
    )
    mp = _manifest_path(path, 1)
    man = json.loads(mp.read_text())
    import pyarrow.parquet as pq

    for f, st in man["file_stats"].items():
        entry = st["__bloom"]["h"]
        # a faithful pre-r17 manifest: v1-position bitmap, inline b64,
        # no "v" key (the v-dispatch must default to v1 for it)
        vals = {
            v
            for v in pq.read_table(
                str(pathlib.Path(path) / f), columns=["h"]
            ).column("h").to_pylist()
            if v is not None
        }
        bits = V._bloom_of_values(vals, entry["m"], entry["k"], version=1)
        st["__bloom"]["h"] = {
            "b64": base64.b64encode(bits).decode(),
            "m": entry["m"],
            "k": entry["k"],
        }
        pathlib.Path(_bloom_blob_path(path, f)).unlink()
    mp.write_text(json.dumps(man))
    assert files_scanned(path, prune=("h", "==", "absent-key")) == 0
    opened = files_scanned(path, prune=("h", "==", _h(5)))
    assert 1 <= opened <= 2


def test_deep_clone_carries_blobs(spark, table, tmp_path):
    dst = str(tmp_path / "deep")
    clone_table(table, dst)
    man = _load_manifest(dst, 1)
    for f in man["files"]:
        assert not pathlib.Path(f).is_absolute()
        assert pathlib.Path(_bloom_blob_path(dst, f)).is_file()
    assert files_scanned(dst, prune=("h", "==", "absent-key")) == 0
    assert files_scanned(dst, prune=("h", "==", _h(42))) <= 2


def test_shallow_clone_probes_source_blobs(spark, table, tmp_path):
    dst = str(tmp_path / "shallow")
    clone_table(table, dst, shallow=True)
    man = _load_manifest(dst, 1)
    for f in man["files"]:
        assert pathlib.Path(f).is_absolute()
        # no blob copied into the clone; the absolute key resolves
        # the SOURCE's blob
        assert _bloom_blob_path(dst, f) == f + _BLOOM_BLOB_SUFFIX
    assert files_scanned(dst, prune=("h", "==", "absent-key")) == 0


def test_vacuum_strips_blobs_with_their_files(spark, table):
    """A rewrite (overwrite) obsoletes v1's files; vacuum deletes them
    AND their blobs, plus any blob whose data file is already gone and
    crashed blob-write tmps."""
    v1_files = _load_manifest(table, 1)["files"]
    V.overwrite_table(
        _df(spark, 0, 100).repartitionByRange(2, "doc_id"), table
    )
    droot = pathlib.Path(table) / "data"
    # plant debris: an orphan blob (no data file) and a crashed tmp
    orphan = droot / "v00000001" / ("ghost.parquet" + _BLOOM_BLOB_SUFFIX)
    orphan.write_bytes(b"x")
    tmp = droot / "v00000001" / (
        "part.parquet" + _BLOOM_BLOB_SUFFIX + ".tmp.999"
    )
    tmp.write_bytes(b"y")
    deleted = vacuum_table(table, keep_last=1)
    assert deleted == len(v1_files)  # return value still counts DATA files
    for f in v1_files:
        assert not (pathlib.Path(table) / f).exists()
        assert not pathlib.Path(_bloom_blob_path(table, f)).exists()
    assert not orphan.exists() and not tmp.exists()
    # the live version's blobs survive
    for f in _load_manifest(table, 2)["files"]:
        assert pathlib.Path(_bloom_blob_path(table, f)).is_file()
    assert files_scanned(table, prune=("h", "==", "absent-key")) == 0


def test_distributed_stats_failure_falls_back_to_driver_loop(
    spark, table, monkeypatch
):
    """Advice r16 (low): an executor environment that cannot import the
    package (driver-only sys.path) must not fail the commit — the
    sequential driver loop computes the identical stats."""
    man = _load_manifest(table, 1)
    rel_files = man["files"]
    assert len(rel_files) >= V._STATS_DISTRIBUTE_MIN

    def boom(*a, **k):
        raise RuntimeError("worker import failure")

    monkeypatch.setattr(V, "_file_stats_distributed", boom)
    got = V._file_stats(table, rel_files, spark=spark)
    assert set(got) == set(rel_files)
    for f in rel_files:
        assert got[f]["__bloom"]["h"] == man["file_stats"][f]["__bloom"]["h"]


def _date_df(spark, n_days=64, rows_per_day=8):
    """One row per (day, i): day column is a DATE, ts a TIMESTAMP."""
    return (
        spark.range(n_days * rows_per_day)
        .select(
            F.col("id").alias("doc_id"),
            F.date_add(
                F.lit("2024-01-01").cast("date"),
                (F.col("id") % n_days).cast("int"),
            ).alias("day"),
            (
                F.timestamp_seconds(
                    F.lit(1_700_000_000) + F.col("id") * 3600
                )
            ).alias("ts"),
        )
    )


def test_date_bloom_skips_on_natural_key(spark, tmp_path):
    """VERDICT r16 task #4: a date-partitioned corpus bloom-skips on
    its natural key. Files are range-clustered by day, so each holds a
    narrow day slice — but the bloom must ALSO prune a day that falls
    inside a file's [min, max] yet is absent from it."""
    import datetime

    path = str(tmp_path / "datetbl")
    df = _date_df(spark).where(
        # punch holes: drop every 7th day so in-range absent keys exist
        (F.datediff(F.col("day"), F.lit("2024-01-01").cast("date")) % 7)
        != 3
    )
    V.create_table(
        df.repartitionByRange(8, "doc_id"), path, bloom_cols=["day"]
    )
    man = _load_manifest(path, 1)
    assert any(
        "__bloom" in st and "day" in st["__bloom"]
        for st in man["file_stats"].values()
    )
    present = datetime.date(2024, 1, 2)
    absent = datetime.date(2024, 1, 4)  # day index 3: punched out
    assert files_scanned(path, prune=("day", "==", present)) >= 1
    got = read_table(spark, path, prune=("day", "==", present)).where(
        F.col("day") == present
    )
    assert got.count() == 8
    # the punched-out day is absent from EVERY file: bloom prunes all
    assert files_scanned(path, prune=("day", "==", absent)) == 0
    # ISO-string probes canonicalize identically
    assert files_scanned(path, prune=("day", "==", "2024-01-04")) == 0
    assert files_scanned(
        path, prune=("day", "==", "2024-01-02")
    ) == files_scanned(path, prune=("day", "==", present))
    # a datetime probe on a date column is NO_COERCE: fail-open, the
    # read stays exact
    dt = datetime.datetime(2024, 1, 4, 0, 0)
    assert read_table(spark, path, prune=("day", "==", dt)).where(
        F.col("day") == F.lit("2024-01-04").cast("date")
    ).count() == 0


def test_timestamp_bloom_skips(spark, tmp_path):
    import datetime

    path = str(tmp_path / "tstbl")
    V.create_table(
        _date_df(spark).repartitionByRange(8, "doc_id"),
        path,
        bloom_cols=["ts"],
    )
    present = datetime.datetime.utcfromtimestamp(1_700_000_000 + 5 * 3600)
    absent = present.replace(microsecond=123456)
    assert files_scanned(path, prune=("ts", "==", present)) >= 1
    assert files_scanned(path, prune=("ts", "==", absent)) == 0
    got = read_table(spark, path, prune=("ts", "==", present)).where(
        F.col("ts") == present
    )
    assert got.count() == 1
    # tz-aware probe folds to UTC and still matches
    aware = present.replace(
        tzinfo=datetime.timezone.utc
    ).astimezone(datetime.timezone(datetime.timedelta(hours=2)))
    assert files_scanned(path, prune=("ts", "==", aware)) == files_scanned(
        path, prune=("ts", "==", present)
    )


def test_date_bucket_layout_prunes(spark, tmp_path):
    """bucket_by on a DATE key: manifest-side bucket identity pruning
    opens only the probed day's bucket, matching Spark's murmur3 of
    epoch days (differentially pinned in test_spark_hash.py)."""
    import datetime

    path = str(tmp_path / "datebucket")
    V.create_table(_date_df(spark), path, bucket_by=("day", 8))
    man = _load_manifest(path, 1)
    assert any(
        "__bucket" in (st or {}) for st in man["file_stats"].values()
    )
    probe = datetime.date(2024, 1, 10)
    opened = files_scanned(path, prune=("day", "==", probe))
    assert 1 <= opened < files_scanned(path)
    got = read_table(spark, path, prune=("day", "==", probe)).where(
        F.col("day") == probe
    )
    assert got.count() == 8
    # a non-canonicalizable probe on the bucket key must not crash the
    # bucket math (fail-open there); range stats still exclude it —
    # consistent with Spark, where date_col == 'not-a-date' casts to
    # NULL and matches nothing
    assert files_scanned(path, prune=("day", "==", "not-a-date")) == 0
    import pyspark.sql.utils  # noqa: F401

    assert read_table(
        spark, path, prune=("day", "==", datetime.datetime(2024, 1, 10))
    ).where(F.col("day") == probe).count() == 8  # datetime probe: fail-open


def test_versioned_date_bloom_read_matches_python(spark):
    """GROUND_TRUTH pin for the ``versioned_date_bloom_read`` entry:
    recompute the expected rows in pure python from the raw sf0.001
    parquet — the bijective day mapping means the 3-day lookup must
    return exactly the 3 probed documents' (doc_id, lang, n_chars)."""
    import pyarrow.parquet as pq

    from optimal_parallel_fp_growth_spark.queries_docs import (
        q_versioned_date_bloom_read,
    )

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(
        sf + "/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    rows = list(
        zip(
            t.column("doc_id").to_pylist(),
            t.column("lang").to_pylist(),
            t.column("n_chars").to_pylist(),
        )
    )
    hi = max(r[0] for r in rows)
    P, M = 1_000_003, 2_000_000
    offs = {(i * P) % M for i in (0, hi // 2, hi)}
    want = sorted(r for r in rows if (r[0] * P) % M in offs)
    got = sorted(
        tuple(r) for r in q_versioned_date_bloom_read(spark, sf).collect()
    )
    assert got == want


def test_describe_table_counts_blob_bytes(table):
    d = V.describe_table(table)
    data = sum(
        (pathlib.Path(table) / f).stat().st_size
        for f in _load_manifest(table, 1)["files"]
    )
    blobs = sum(
        pathlib.Path(_bloom_blob_path(table, f)).stat().st_size
        for f in _load_manifest(table, 1)["files"]
    )
    assert blobs > 0
    assert d["size_bytes"] == data + blobs


# ---------------------------------------------------------------------------
# fused write+stats kernel (VERDICT r16 task #3: files are read zero
# times after being written)


def test_fused_write_stats_match_repair_path(spark, tmp_path):
    """The fused kernel's manifest stats (computed from in-memory
    batches at write time) must be BYTE-IDENTICAL to what the
    repair/compat path computes by re-opening each written file —
    fusion is an execution move, not a semantics change."""
    path = str(tmp_path / "tbl")
    df = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        F.md5(F.col("id").cast("string")).alias("h"),
        (F.col("id") / 7.0).alias("x"),
        F.date_add(
            F.lit("2021-01-01").cast("date"), (F.col("id") % 90).cast("int")
        ).alias("d"),
    )
    create_table(df.repartition(6, "doc_id"), path, bloom_cols=["h", "d"])
    man = _load_manifest(path, 1)
    assert len(man["files"]) == 6
    spec = V._table_spec(path)
    bspec = spec.get("bloom") or {}
    sid = spec.get("spec_id")
    for rel in man["files"]:
        repair = V._stats_for_one_file(path, rel, bspec, sid)
        assert man["file_stats"][rel] == repair, rel
        assert "__bloom" in repair and "__nan" in repair


def test_fused_and_legacy_write_paths_agree(spark, tmp_path, monkeypatch):
    """Same (deterministically hash-partitioned) frame written through
    the fused kernel and through the legacy two-pass path: identical
    per-file stats multisets, identical readback."""
    df = spark.range(0, 3000).select(
        F.col("id").alias("doc_id"),
        F.md5(F.col("id").cast("string")).alias("h"),
        (F.col("id") / 3.0).alias("x"),
    ).repartition(5, "doc_id")
    pf = str(tmp_path / "fused")
    create_table(df, pf, bloom_cols=["h"])
    monkeypatch.setenv("OPFPG_FUSED_WRITE", "0")
    pl = str(tmp_path / "legacy")
    create_table(df, pl, bloom_cols=["h"])
    monkeypatch.delenv("OPFPG_FUSED_WRITE")
    mf, ml = _load_manifest(pf, 1), _load_manifest(pl, 1)

    def keyed(man):
        # part index identifies the hash partition in both naming
        # schemes; stats must match partition-for-partition
        out = {}
        for rel in man["files"]:
            idx = pathlib.Path(rel).name.split("-")[1]
            out[idx] = man["file_stats"][rel]
        return out

    assert keyed(mf) == keyed(ml)
    a = sorted(tuple(r) for r in read_table(spark, pf).collect())
    b = sorted(tuple(r) for r in read_table(spark, pl).collect())
    assert a == b


def test_fused_empty_rewrite_keeps_readable_file(spark, tmp_path):
    """A rewrite that empties the table must still commit a readable
    (schema-only) file set, exactly like Spark's writer would."""
    path = str(tmp_path / "tbl")
    create_table(
        spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") / 3.0).alias("v")
        ),
        path,
        bloom_cols=["k"],
    )
    V.delete_where(spark, path, [("k", "<", 1000)])
    man = _load_manifest(path, 2)
    assert len(man["files"]) == 1
    back = read_table(spark, path)
    assert back.count() == 0
    assert set(back.columns) == {"k", "v"}


def test_fused_kernel_failure_falls_back_to_legacy(spark, tmp_path, monkeypatch):
    """An environment where the kernel cannot run (e.g. executors
    can't import the package) must degrade to the legacy two-pass
    write, not fail the commit."""
    def boom(*a, **k):
        raise RuntimeError("no workers")

    monkeypatch.setattr(V, "_write_data_fused", boom)
    path = str(tmp_path / "tbl")
    create_table(_df(spark, 0, 500).coalesce(2), path, bloom_cols=["h"])
    man = _load_manifest(path, 1)
    assert len(man["files"]) == 2
    assert all("__bloom" in s for s in man["file_stats"].values())
    assert read_table(spark, path).count() == 500


def test_fused_bucket_splits_still_stamp(spark, tmp_path):
    """Sorted-bucket writes through the kernel keep the part-index =
    bucket-id naming convention _stamp_buckets fail-closes on, so
    every split file still gets its bucket stamp."""
    path = str(tmp_path / "tbl")
    create_table(
        _df(spark, 0, 4000),
        path,
        bucket_by=("doc_id", 4),
        sort_within_buckets=["doc_id"],
        bucket_file_rows=500,
        bloom_cols=["h"],
    )
    man = _load_manifest(path, 1)
    # 4 buckets, each ~1000 rows split at 500/file -> >=2 files/bucket
    assert len(man["files"]) >= 8
    assert all("__bucket" in s for s in man["file_stats"].values())
    # stamp must equal the murmur3 bucket of the rows inside
    from optimal_parallel_fp_growth_spark.functions.spark_hash import (
        bucket_of,
    )

    for rel, s in man["file_stats"].items():
        lo, hi = s["doc_id"]
        assert bucket_of(int(lo), "bigint", 4) == s["__bucket"]
        assert bucket_of(int(hi), "bigint", 4) == s["__bucket"]


def test_merge_empty_ok_is_a_no_commit_no_op(spark, tmp_path):
    """``empty_ok`` (round 17): CDC appliers used to pay a separate
    isEmpty job per micro-batch before merging; the probe now rides
    the merge's own bounds aggregate. Empty source + empty_ok =
    version unchanged, zero new commits; without the flag the
    pre-existing ValueError contract stands, and all-null keys stay
    an error either way."""
    path = str(tmp_path / "tbl")
    create_table(_df(spark, 0, 100), path)
    empty = _df(spark, 0, 100).where(F.lit(False))
    assert V.merge_table(empty, path, "doc_id", empty_ok=True) == 1
    assert V._versions(path) == [1]  # no-op: nothing committed
    with pytest.raises(ValueError, match="no rows"):
        V.merge_table(empty, path, "doc_id")
    all_null = _df(spark, 0, 5).select(
        F.lit(None).cast("long").alias("doc_id"), "h", "v"
    )
    with pytest.raises(ValueError, match="null"):
        V.merge_table(all_null, path, "doc_id", empty_ok=True)
    # a non-empty merge through the same flag still commits normally
    assert V.merge_table(_df(spark, 0, 10), path, "doc_id", empty_ok=True) == 2
