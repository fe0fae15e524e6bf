"""Round-16 lakehouse hardening (VERDICT r15 tasks #2-#5, ADVICE r15):

* commit-time per-file stats computed IN a Spark job (the Iceberg
  writer-side stats model) — byte-identical to the driver loop;
* ``bloom_bits="auto"`` sizes each file's bitmap from its actual
  distinct count, so bitmaps never silently saturate;
* bloom probes coerce to the column's manifest type (a float probe on
  an int column must hash the int form, not prune matching rows);
* the exactly-once ``txn`` watermark extends to delete_where /
  update_where / overwrite_table / compact_table, and clones KEEP the
  watermark map (a DR fork must not re-commit a replayed epoch).
"""

from __future__ import annotations

import base64

import pytest

from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.sources import versioned as V
from optimal_parallel_fp_growth_spark.sources.versioned import (
    _bloom_may_contain,
    _bloom_of_values,
    _load_manifest,
    _stats_for_one_file,
    _versions,
    append_table,
    bloom_bits_for,
    clone_table,
    compact_table,
    create_table,
    delete_where,
    evolve_table_spec,
    last_txn_epoch,
    overwrite_table,
    read_table,
    table_rowcount,
    update_where,
)


def _df(spark, start, n):
    return spark.range(start, start + n).select(
        F.col("id").alias("doc_id"),
        F.md5(F.col("id").cast("string")).alias("h"),
        (F.col("id") * 2).alias("v"),
    )


# ---------------------------------------------------------------------------
# distributed commit stats


def test_distributed_stats_match_driver_loop(spark, tmp_path):
    """The mapInPandas stats job and the sequential driver loop must
    produce BYTE-IDENTICAL manifests (ranges, __rows, __nan, __bloom
    b64 bitmaps, __spec stamps) — the distribution is an execution
    move, not a semantics change."""
    path = str(tmp_path / "tbl")
    # 8 files ≥ _STATS_DISTRIBUTE_MIN=6 → create's stats pass ran
    # distributed; float col exercises __nan, bloom col the bitmaps
    df = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        F.md5(F.col("id").cast("string")).alias("h"),
        (F.col("id") / 7.0).alias("x"),
    )
    create_table(
        df.repartitionByRange(8, "doc_id"), path, bloom_cols=["h"]
    )
    man = _load_manifest(path, 1)
    assert len(man["files"]) >= V._STATS_DISTRIBUTE_MIN
    spec = V._table_spec(path)
    bspec = spec.get("bloom") or {}
    sid = spec.get("spec_id")
    for rel in man["files"]:
        driver_side = _stats_for_one_file(path, rel, bspec, sid)
        assert man["file_stats"][rel] == driver_side, rel
        assert "__bloom" in driver_side and "__nan" in driver_side


def test_small_commits_stay_on_the_driver(spark, tmp_path):
    """Below the threshold the driver loop runs (no job overhead) and
    the results are the same shape — the two paths share one body."""
    path = str(tmp_path / "tbl")
    create_table(_df(spark, 0, 100).coalesce(1), path, bloom_cols=["h"])
    man = _load_manifest(path, 1)
    assert len(man["files"]) < V._STATS_DISTRIBUTE_MIN
    st = man["file_stats"][man["files"][0]]
    assert st["__rows"] == 100 and "__bloom" in st


# ---------------------------------------------------------------------------
# bloom_bits="auto"


def test_bloom_auto_sizes_per_file_distinct_count(spark, tmp_path):
    """auto width = bloom_bits_for(actual per-file distinct count):
    a small file keeps the 16 Kbit floor, a big one grows — no more
    frozen-width saturation (the 10×-gate lesson from round 15)."""
    path = str(tmp_path / "tbl")
    small = _df(spark, 0, 500).coalesce(1)
    create_table(small, path, bloom_cols=["h"])  # default bits="auto"
    big = _df(spark, 10_000, 5000).coalesce(1)
    append_table(big, path)
    man = _load_manifest(path, 2)
    by_rows = {
        st["__rows"]: st["__bloom"]["h"]["m"]
        for st in man["file_stats"].values()
    }
    assert by_rows[500] == bloom_bits_for(500) == 16384
    assert by_rows[5000] == bloom_bits_for(5000) == 65536
    # and the big file's bitmap actually skips: probe an absent key
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        files_scanned,
    )

    assert files_scanned(path, prune=("h", "==", "no-such-hash")) == 0


def test_bloom_auto_via_evolve_table_spec(spark, tmp_path):
    """evolve_table_spec can add a bloom spec after the fact: old
    files keep no bitmap (fail-open), files of later commits stamp
    auto-sized bitmaps."""
    path = str(tmp_path / "tbl")
    create_table(_df(spark, 0, 300).coalesce(1), path)
    man1 = _load_manifest(path, 1)
    assert "__bloom" not in man1["file_stats"][man1["files"][0]]
    evolve_table_spec(path, bloom_cols=["h"])
    append_table(_df(spark, 1000, 300).coalesce(1), path)
    man3 = _load_manifest(path, 3)
    new_file = [f for f in man3["files"] if f not in man1["files"]][0]
    st = man3["file_stats"][new_file]
    assert st["__bloom"]["h"]["m"] == bloom_bits_for(300)
    # bad bloom args still rejected
    with pytest.raises(ValueError):
        evolve_table_spec(path, bloom_cols=["v"], bloom_bits=32)
    with pytest.raises(ValueError):
        create_table(
            _df(spark, 0, 10), str(tmp_path / "t2"),
            bloom_cols=["h"], bloom_bits=8,
        )


# ---------------------------------------------------------------------------
# bloom probe type coercion (ADVICE r15, medium)


def test_bloom_probe_coerces_float_to_int_column(spark, tmp_path):
    """The reported bug: prune=("doc_id", "==", 5.0) on an int bloom
    column hashed "5.0" vs the stored "5" and silently pruned the
    matching file. Coerced probes must KEEP the file and the read
    must return the row Spark/DuckDB would match."""
    path = str(tmp_path / "tbl")
    create_table(
        _df(spark, 0, 400).repartitionByRange(2, "doc_id"),
        path,
        bloom_cols=["doc_id"],
    )
    got = (
        read_table(spark, path, prune=("doc_id", "==", 5.0))
        .where(F.col("doc_id") == 5)
        .collect()
    )
    assert len(got) == 1 and got[0]["doc_id"] == 5
    # the raw-math repro from the advice, now through the coercion
    entry = {
        "b64": base64.b64encode(_bloom_of_values({1}, 1024, 6)).decode(),
        "m": 1024,
        "k": 6,
    }
    assert V._bloom_probe_value(1.0, "bigint") == 1
    assert _bloom_may_contain(entry, V._bloom_probe_value(1.0, "bigint"))
    # non-coercible probes fall through fail-open
    assert V._bloom_probe_value(5.5, "bigint") is V._BLOOM_NO_COERCE
    assert V._bloom_probe_value(7, "string") is V._BLOOM_NO_COERCE
    assert (
        V._bloom_probe_value(float("nan"), "bigint") is V._BLOOM_NO_COERCE
    )
    # bool probes hash the int form (stored values are ints)
    assert V._bloom_probe_value(True, "int") == 1


def test_bloom_fail_open_on_noncoercible_probe(spark, tmp_path):
    """A 5.5 probe on an int bloom column must not bloom-prune the
    in-range file (fail-open); the read correctly returns no rows."""
    path = str(tmp_path / "tbl")
    create_table(_df(spark, 0, 100).coalesce(1), path, bloom_cols=["doc_id"])
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        files_scanned,
    )

    assert files_scanned(path, prune=("doc_id", "==", 5.5)) == 1
    assert read_table(spark, path, prune=("doc_id", "==", 5.5)).where(
        F.col("doc_id") == 5.5
    ).count() == 0


# ---------------------------------------------------------------------------
# txn watermarks on the remaining writers (VERDICT r15 task #3)


def _mk(spark, tmp_path, name="t"):
    path = str(tmp_path / name)
    create_table(_df(spark, 0, 1000).repartitionByRange(4, "doc_id"), path)
    return path


def test_delete_where_txn_replay_is_noop(spark, tmp_path):
    path = _mk(spark, tmp_path)
    v = delete_where(spark, path, ("doc_id", "<", 100), txn=("gdpr", 1))
    assert v == 2 and table_rowcount(path) == 900
    # replayed epoch: would delete 100 MORE rows if it ran — must not
    v2 = delete_where(spark, path, ("doc_id", "<", 200), txn=("gdpr", 1))
    assert v2 == 2 and _versions(path) == [1, 2]
    assert table_rowcount(path) == 900
    # next epoch commits
    v3 = delete_where(spark, path, ("doc_id", "<", 200), txn=("gdpr", 2))
    assert v3 == 3 and table_rowcount(path) == 800
    assert last_txn_epoch(path, "gdpr") == 2


def test_update_where_txn_replay_is_noop(spark, tmp_path):
    path = _mk(spark, tmp_path)
    v = update_where(
        spark, path, ("doc_id", "<", 10), {"v": F.lit(-1)}, txn=("fix", 5)
    )
    assert v == 2
    neg = read_table(spark, path).where("v = -1").count()
    v2 = update_where(
        spark, path, ("doc_id", "<", 50), {"v": F.lit(-1)}, txn=("fix", 5)
    )
    assert v2 == 2 and _versions(path) == [1, 2]
    assert read_table(spark, path).where("v = -1").count() == neg == 10


def test_overwrite_table_txn_replay_is_noop(spark, tmp_path):
    path = _mk(spark, tmp_path)
    v = overwrite_table(_df(spark, 0, 50), path, txn=("ow", 3))
    assert v == 2 and table_rowcount(path) == 50
    v2 = overwrite_table(_df(spark, 0, 7), path, txn=("ow", 3))
    assert v2 == 2 and table_rowcount(path) == 50
    v3 = overwrite_table(_df(spark, 0, 7), path, txn=("ow", 4))
    assert v3 == 3 and table_rowcount(path) == 7


def test_compact_table_txn_replay_is_noop(spark, tmp_path):
    path = _mk(spark, tmp_path)
    append_table(_df(spark, 5000, 10).coalesce(1), path)
    v = compact_table(spark, path, txn=("maint", 1))
    assert v == 3
    v2 = compact_table(spark, path, txn=("maint", 1))
    assert v2 == 3 and _versions(path) == [1, 2, 3]
    # the partial-compact arm rides the same watermark
    v3 = compact_table(
        spark, path, where=("doc_id", "<", 100), txn=("maint", 2)
    )
    assert v3 == 4
    v4 = compact_table(
        spark, path, where=("doc_id", "<", 500), txn=("maint", 2)
    )
    assert v4 == 4 and _versions(path) == [1, 2, 3, 4]


def test_clone_preserves_txn_watermarks(spark, tmp_path):
    """ADVICE r15: a DR fork must keep replay detection — a
    checkpointed stream repointed at the clone sees its last epoch
    recorded and no-ops the replay instead of re-committing."""
    src = str(tmp_path / "src")
    create_table(_df(spark, 0, 200), src, txn=("ingest", 1))
    append_table(_df(spark, 200, 100), src, txn=("ingest", 7))
    dst = str(tmp_path / "dst")
    clone_table(src, dst)
    assert last_txn_epoch(dst, "ingest") == 7
    n = table_rowcount(dst)
    # the replayed epoch against the CLONE is a no-op
    v = append_table(_df(spark, 200, 100), dst, txn=("ingest", 7))
    assert v == _versions(dst)[-1] and table_rowcount(dst) == n
    # a genuinely new epoch commits
    append_table(_df(spark, 300, 50), dst, txn=("ingest", 8))
    assert table_rowcount(dst) == n + 50
    # shallow clones too
    dst2 = str(tmp_path / "dst2")
    clone_table(src, dst2, shallow=True)
    assert last_txn_epoch(dst2, "ingest") == 7


# ---------------------------------------------------------------------------
# GROUND_TRUTH_PINS for the two r16 registry entries


def test_versioned_txn_dml_matches_python(spark, sf_small):
    """Full-semantics pin for the ``versioned_txn_dml`` entry: the
    final aggregate (delete of the low decile, n_chars := -1 for the
    top decile, each epoch replayed) recomputed in pure python over
    the raw parquet — exact integer arithmetic, duckdb-free."""
    import pyarrow.parquet as pq

    from optimal_parallel_fp_growth_spark.queries_docs import (
        q_versioned_txn_dml,
    )

    got = {
        r.lang: (r.n_docs, r.total_chars)
        for r in q_versioned_txn_dml(spark, sf_small).collect()
    }
    t = pq.read_table(
        sf_small + "/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    rows = list(
        zip(
            t.column("doc_id").to_pylist(),
            t.column("lang").to_pylist(),
            t.column("n_chars").to_pylist(),
        )
    )
    hi = max(d for d, _, _ in rows)
    lo_cut, hi_cut = hi // 10, 9 * (hi // 10)
    want: dict[str, list[int]] = {}
    for d, lang, nc in rows:
        if d < lo_cut:
            continue  # deleted (epoch 1; the replay must NOT widen this)
        w = want.setdefault(lang, [0, 0])
        w[0] += 1
        w[1] += -1 if d >= hi_cut else nc  # epoch-2 correction
    assert got == {k: (v[0], v[1]) for k, v in want.items()}


def test_bloom_evolved_bitmap_matches_python(spark, tmp_path):
    """Full-semantics pin for the ``bloom_evolved_read`` entry's
    mechanism: a bloom spec added via evolve_table_spec with
    bits="auto" stamps, for a post-evolution file, exactly the bitmap
    pure python rebuilds — width from a hand-rolled doubling loop
    (>=10 bits/value, power of two, 16 Kbit floor), positions from
    md5, OR-folded bytes — while pre-evolution files stamp nothing."""
    import hashlib

    from pyspark.sql import functions as F

    path = str(tmp_path / "tbl")
    create_table(_df(spark, 0, 200).coalesce(1), path)
    evolve_table_spec(path, bloom_cols=["h"])
    append_table(_df(spark, 10_000, 3000).coalesce(1), path)
    man = _load_manifest(path, 3)
    old = [f for f in man["files"] if "/v00000001/" in f]
    new = [f for f in man["files"] if "/v00000003/" in f]
    assert old and new
    assert "__bloom" not in man["file_stats"][old[0]]
    entry = man["file_stats"][new[0]]["__bloom"]["h"]
    vals = {hashlib.md5(str(i).encode()).hexdigest() for i in range(10_000, 13_000)}
    # auto width, rebuilt by hand
    need = len(vals) * 10
    m = 16384
    while m < need and m < (1 << 22):
        m <<= 1
    assert entry["m"] == m == 32768
    # r17: entries stamp the v2 single-digest double-hashing positions
    assert int(entry.get("v") or 1) == 2
    bits = bytearray(m // 8)
    for v in sorted(vals):
        d = hashlib.md5(f"bloom:{v}".encode()).digest()
        h1 = int.from_bytes(d[:8], "big")
        h2 = int.from_bytes(d[8:], "big") | 1
        for i in range(entry["k"]):
            p = (h1 + i * h2) % m
            bits[p >> 3] |= 1 << (p & 7)
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        _bloom_blob_path,
        _bloom_entry_bits,
    )

    assert _bloom_entry_bits(
        entry, _bloom_blob_path(path, new[0])
    ) == bytes(bits)
    # and the entry's read-side contract on the real fixture
    from optimal_parallel_fp_growth_spark.queries_docs import (
        q_bloom_evolved_read,
    )
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    got = q_bloom_evolved_read(spark, sf).collect()
    t = pq.read_table(
        sf + "/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    ids = t.column("doc_id").to_pylist()
    k = ids.index(max(ids))
    assert [tuple(r) for r in got] == [
        (
            max(ids),
            t.column("lang").to_pylist()[k],
            t.column("n_chars").to_pylist()[k],
        )
    ]


# ---------------------------------------------------------------------------
# property: random writer/replay interleavings are exactly-once


def test_property_random_replay_sequences_are_exactly_once(spark, tmp_path):
    """Hypothesis over the whole txn-stamped writer matrix: any
    sequence of append/delete/update/compact/merge steps, each
    either a NEW epoch or a REPLAY of the last committed one, must
    leave the table exactly as if every epoch ran once — contents,
    version count, and watermark all first-delivery-only."""
    from hypothesis import given, settings, strategies as st

    from optimal_parallel_fp_growth_spark.sources.versioned import (
        merge_table,
        with_retry,
    )

    step = st.tuples(
        st.sampled_from(["append", "delete", "update", "compact", "merge"]),
        st.booleans(),  # True = replay the previous epoch
    )
    counter = [0]

    @settings(max_examples=5, deadline=None)
    @given(ops=st.lists(step, min_size=1, max_size=5))
    def run(ops):
        counter[0] += 1
        path = str(tmp_path / f"rtbl{counter[0]}")
        create_table(
            spark.createDataFrame(
                [(i, i * 3) for i in range(100)], "doc_id long, v long"
            ).repartitionByRange(2, "doc_id"),
            path,
        )
        expected = {i: i * 3 for i in range(100)}
        nxt, epoch, versions = 100, 0, 1
        for op, replay in ops:
            e = epoch if replay and epoch > 0 else epoch + 1
            effective = e > epoch
            epoch = max(epoch, e)
            if op == "append":
                df = spark.createDataFrame(
                    [(i, i * 3) for i in range(nxt, nxt + 20)],
                    "doc_id long, v long",
                )
                with_retry(
                    lambda: append_table(df, path, txn=("app", e))
                )
                if effective:
                    expected.update(
                        {i: i * 3 for i in range(nxt, nxt + 20)}
                    )
                    nxt += 20
            elif op == "delete":
                lo = min(expected) if expected else 0
                delete_where(
                    spark, path, ("doc_id", "<=", lo), txn=("app", e)
                )
                if effective:
                    expected.pop(lo, None)
            elif op == "update":
                hi = max(expected) if expected else 0
                update_where(
                    spark, path, ("doc_id", ">=", hi),
                    {"v": F.lit(-5).cast("bigint")}, txn=("app", e),
                )
                if effective and expected:
                    expected[hi] = -5
            elif op == "compact":
                compact_table(spark, path, txn=("app", e))
            elif op == "merge":
                k = nxt // 2
                ch = spark.createDataFrame(
                    [(k, -9)], "doc_id long, v long"
                )
                with_retry(
                    lambda: merge_table(ch, path, "doc_id", txn=("app", e))
                )
                if effective:
                    expected[k] = -9
            if effective:
                versions += 1
            assert len(_versions(path)) == versions, (op, replay)
        got = {r.doc_id: r.v for r in read_table(spark, path).collect()}
        assert got == expected
        assert last_txn_epoch(path, "app") == (epoch or None)

    run()


# ---------------------------------------------------------------------------
# overwrite_where — the Delta replaceWhere shape (round 16)


def test_overwrite_where_replaces_slice_atomically(spark, tmp_path):
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        overwrite_where,
        table_history,
    )

    path = str(tmp_path / "tbl")
    create_table(
        spark.createDataFrame(
            [(i, i * 3) for i in range(400)], "doc_id long, v long"
        ).repartitionByRange(4, "doc_id"),
        path,
    )
    man1 = _load_manifest(path, 1)
    repl = spark.createDataFrame(
        [(i, -i) for i in range(100, 150)], "doc_id long, v long"
    )
    v = overwrite_where(
        repl, path, [("doc_id", ">=", 100), ("doc_id", "<", 200)]
    )
    assert v == 2
    assert [h["op"] for h in table_history(path)] == [
        "create", "replace_where",
    ]
    got = {r.doc_id: r.v for r in read_table(spark, path).collect()}
    want = {i: i * 3 for i in range(400) if not 100 <= i < 200}
    want.update({i: -i for i in range(100, 150)})
    assert got == want  # rows 150-199 deleted, 100-149 replaced
    # files outside the slice carry BY REFERENCE, not rewritten
    man2 = _load_manifest(path, 2)
    carried = set(man1["files"]) & set(man2["files"])
    assert len(carried) >= 2, "out-of-slice files must carry by reference"


def test_overwrite_where_fails_closed_on_leaked_rows(spark, tmp_path):
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        overwrite_where,
    )

    path = str(tmp_path / "tbl")
    create_table(
        spark.createDataFrame(
            [(i, i) for i in range(100)], "doc_id long, v long"
        ),
        path,
    )
    # one row outside the slice, one NULL key (NULL never satisfies)
    for bad in ([(50, 1), (999, 2)], [(50, 1), (None, 2)]):
        repl = spark.createDataFrame(bad, "doc_id long, v long")
        with pytest.raises(ValueError, match="do not satisfy"):
            overwrite_where(
                repl, path, [("doc_id", ">=", 0), ("doc_id", "<", 60)]
            )
    assert _versions(path) == [1]  # nothing committed
    assert read_table(spark, path).count() == 100


def test_overwrite_where_txn_replay_is_noop(spark, tmp_path):
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        overwrite_where,
    )

    path = str(tmp_path / "tbl")
    create_table(
        spark.createDataFrame(
            [(i, i) for i in range(100)], "doc_id long, v long"
        ),
        path,
    )
    repl = spark.createDataFrame([(5, -5)], "doc_id long, v long")
    v = overwrite_where(
        repl, path, [("doc_id", ">=", 5), ("doc_id", "<", 10)],
        txn=("bf", 1),
    )
    assert v == 2 and read_table(spark, path).count() == 96
    repl2 = spark.createDataFrame([(20, -20)], "doc_id long, v long")
    v2 = overwrite_where(
        repl2, path, [("doc_id", ">=", 20), ("doc_id", "<", 30)],
        txn=("bf", 1),
    )
    assert v2 == 2 and _versions(path) == [1, 2]
    assert read_table(spark, path).count() == 96
    assert last_txn_epoch(path, "bf") == 1


def test_overwrite_where_respects_bucket_layout(spark, tmp_path):
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        files_scanned,
        overwrite_where,
    )

    path = str(tmp_path / "tbl")
    create_table(
        spark.createDataFrame(
            [(i, i) for i in range(200)], "doc_id long, v long"
        ),
        path,
        bucket_by=("doc_id", 4),
    )
    repl = spark.createDataFrame(
        [(i, -i) for i in range(40, 60)], "doc_id long, v long"
    )
    overwrite_where(
        repl, path, [("doc_id", ">=", 40), ("doc_id", "<", 60)]
    )
    # the rewrite re-bucketed: an equality probe still opens ≤ the
    # per-bucket file count, and finds the REPLACED value
    opened = files_scanned(path, prune=("doc_id", "==", 45))
    assert opened < files_scanned(path)
    rows = read_table(spark, path, prune=("doc_id", "==", 45)).where(
        F.col("doc_id") == 45
    ).collect()
    assert len(rows) == 1 and rows[0].v == -45


def test_replace_where_read_matches_python(spark, sf_small):
    """Full-semantics pin for the ``replace_where_read`` entry: the
    final aggregate (middle [37.5%, 62.5%) doc_id slice replaced with
    negated n_chars, leak attempt aborted, epoch replayed) recomputed
    in pure python over the raw parquet — exact integer arithmetic."""
    import pyarrow.parquet as pq

    from optimal_parallel_fp_growth_spark.queries_docs import (
        q_replace_where_read,
    )

    got = {
        r.lang: (r.n_docs, r.total_chars)
        for r in q_replace_where_read(spark, sf_small).collect()
    }
    t = pq.read_table(
        sf_small + "/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    rows = list(
        zip(
            t.column("doc_id").to_pylist(),
            t.column("lang").to_pylist(),
            t.column("n_chars").to_pylist(),
        )
    )
    hi = max(d for d, _, _ in rows)
    lo_cut, hi_cut = 3 * (hi // 8), 5 * (hi // 8)
    want: dict[str, list[int]] = {}
    for d, lang, nc in rows:
        w = want.setdefault(lang, [0, 0])
        w[0] += 1
        w[1] += -nc if lo_cut <= d < hi_cut else nc
    assert got == {k: (v[0], v[1]) for k, v in want.items()}


def test_bloom_only_evolve_keeps_bucket_layout(spark, tmp_path):
    """Review r16: evolve_table_spec(bloom_cols=...) with NO layout
    arguments used to fire the bare 'no layout args = clear layout'
    rule and silently un-bucket the table — every later append wrote
    unbucketed files and bucket-identity pruning died. A bloom-only
    evolution must carry the current layout into the new era."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        files_scanned,
    )

    path = str(tmp_path / "tbl")
    create_table(
        spark.createDataFrame(
            [(i, f"h{i}") for i in range(400)], "doc_id long, h string"
        ),
        path,
        bucket_by=("doc_id", 4),
    )
    evolve_table_spec(path, bloom_cols=["h"])
    spec = V._table_spec(path)
    assert spec.get("bucket_by") == {"col": "doc_id", "n": 4}
    assert spec.get("bloom", {}).get("cols") == ["h"]
    man = _load_manifest(path, 2)
    assert man["specs"]["1"].get("bucket_by") == {"col": "doc_id", "n": 4}
    # appends still bucket: 4 files, and a point probe opens ~1
    append_table(
        spark.createDataFrame(
            [(i, f"h{i}") for i in range(400, 800)],
            "doc_id long, h string",
        ),
        path,
    )
    man3 = _load_manifest(path, 3)
    new_files = [f for f in man3["files"] if "/v00000003/" in f]
    assert len(new_files) == 4, "append no longer bucketed"
    assert all(
        "__bucket" in man3["file_stats"][f] for f in new_files
    )
    opened = files_scanned(path, prune=("doc_id", "==", 450))
    assert opened <= 2  # one file per era's matching bucket
    # and a bloom-only CLEAR ([]) also keeps the layout
    evolve_table_spec(path, bloom_cols=[])
    assert V._table_spec(path).get("bucket_by") == {
        "col": "doc_id", "n": 4,
    }
    assert "bloom" not in V._table_spec(path)
    # an explicit bare evolve (no args at all) still clears — the
    # documented layout-clear path is untouched
    evolve_table_spec(path)
    assert V._table_spec(path).get("bucket_by") is None
