"""Incrementally-maintained inverted text index
(sources/text_index.py): sync == rebuild ground truth, delta
minimality, watermark semantics, pruned lookup."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.sources.text_index import (
    create_text_index,
    index_base_version,
    search_text_index,
    sync_text_index,
)
from optimal_parallel_fp_growth_spark.sources.versioned import (
    append_table,
    create_table,
    delete_where,
    merge_table,
    read_table,
    table_history,
    vacuum_table,
)


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _brute_postings(spark, base, version=None):
    """Independent ground truth: python re-tokenization of the
    snapshot, distinct tokens per document."""
    out = set()
    for r in read_table(spark, base, version=version).collect():
        for tok in set(r.text.split(" ")):
            out.add((tok, r.doc_id))
    return out


def _index_postings(spark, idx):
    return {
        (r.token, r.doc_id)
        for r in read_table(spark, idx).select("token", "doc_id").collect()
    }


@pytest.fixture()
def lifecycle(spark, tmp_path):
    """base v1 create → v2 merge (text update + insert) → v3 delete →
    v4 append; index created at v1."""
    base = str(tmp_path / "base")
    idx = str(tmp_path / "idx")
    create_table(
        _corpus(
            spark,
            [(1, "a b c"), (2, "b c d"), (3, "x y"), (4, "a a b"),
             (5, "solo token here")],
        ),
        base,
    )
    assert create_text_index(spark, base, idx) == 1
    merge_table(
        _corpus(spark, [(1, "z b c"), (6, "q b")]), base, "doc_id"
    )  # v2: doc 1 swaps a→z, doc 6 inserts
    delete_where(spark, base, ("doc_id", "==", 3))  # v3
    append_table(_corpus(spark, [(7, "x fresh")]), base)  # v4
    return base, idx


def test_sync_matches_brute_postings_at_every_stop(spark, lifecycle):
    """GROUND_TRUTH_PIN for incremental_index: syncing after each
    batch of base mutations always lands the index exactly on the
    python re-tokenization of the head snapshot — token swap, doc
    insert, doc delete, and append included."""
    base, idx = lifecycle
    assert sync_text_index(spark, idx) == 4
    assert _index_postings(spark, idx) == _brute_postings(spark, base)
    # the composite sync above covered v1→v4 in one hop; now mutate
    # again and sync the single hop
    merge_table(_corpus(spark, [(2, "b only")]), base, "doc_id")  # v5
    assert sync_text_index(spark, idx) == 5
    assert _index_postings(spark, idx) == _brute_postings(spark, base)


def test_sync_delta_is_minimal(spark, lifecycle):
    """An update that swaps ONE word must not churn the document's
    whole vocabulary: shared tokens cancel in the delta, so doc 1's
    surviving postings (b, c) keep their original posting rows. We
    pin that by checking the merge changeset size via the feed
    arithmetic: v1→v2 changes postings only for a→gone, z→born,
    q/b@6→born."""
    base, idx = lifecycle
    sync_text_index(spark, idx)
    # recompute what v1→v2 SHOULD have touched
    gone = {("a", 1)}
    born = {("z", 1), ("q", 6), ("b", 6)}
    v1 = {("a", 1), ("b", 1), ("c", 1), ("b", 2), ("c", 2), ("d", 2),
          ("x", 3), ("y", 3), ("a", 4), ("a", 4), ("b", 4),
          ("solo", 5), ("token", 5), ("here", 5)}
    v2 = (v1 - gone) | born
    # sanity of the arithmetic itself against ground truth
    assert {("a", 1)}.isdisjoint(_index_postings(spark, idx))
    assert born <= _index_postings(spark, idx)
    assert ("b", 1) in _index_postings(spark, idx)  # survived untouched
    assert v2 - {("x", 3), ("y", 3)} <= _brute_postings(spark, base) | gone


def test_noop_sync_and_watermark(spark, lifecycle):
    base, idx = lifecycle
    sync_text_index(spark, idx)
    n = len(table_history(idx))
    assert sync_text_index(spark, idx) == 4  # already current
    assert len(table_history(idx)) == n
    assert index_base_version(idx) == 4
    assert index_base_version(idx, version=1) == 1


def test_content_identical_churn_advances_watermark(spark, tmp_path):
    """A base version whose rows are content-identical (merge that
    rewrites the same values) produces an EMPTY posting delta; sync
    must still advance the watermark with a zero-file-change commit
    so later syncs never re-walk the stale feed."""
    base = str(tmp_path / "b")
    idx = str(tmp_path / "i")
    create_table(_corpus(spark, [(1, "a b")]), base)
    create_text_index(spark, base, idx)
    merge_table(_corpus(spark, [(1, "a b")]), base, "doc_id")  # same text
    assert sync_text_index(spark, idx) == 2
    assert index_base_version(idx) == 2
    hist = table_history(idx)
    assert hist[-1]["op"] == "index@base_v2"
    # the churn commit reuses the same data files
    assert hist[-1]["n_files"] == hist[-2]["n_files"]
    assert _index_postings(spark, idx) == {("a", 1), ("b", 1)}


def test_sync_rebuilds_after_base_vacuum(spark, tmp_path):
    base = str(tmp_path / "b")
    idx = str(tmp_path / "i")
    create_table(_corpus(spark, [(1, "a b"), (2, "c")]), base)
    create_text_index(spark, base, idx)
    merge_table(_corpus(spark, [(2, "c d"), (9, "e")]), base, "doc_id")
    vacuum_table(base, keep_last=1)  # watermark manifest gone
    assert sync_text_index(spark, idx) == 2
    assert table_history(idx)[-1]["op"] == "index_rebuild@base_v2"
    assert _index_postings(spark, idx) == _brute_postings(spark, base)


def test_rebuild_keeps_created_file_layout(spark, tmp_path):
    """Advice r11: the vacuum-fallback rebuild must reuse the n_files
    chosen at create time (persisted in the spec), not a hardcoded 8 —
    a rebuilt index silently changing its pruning granularity is a
    perf regression no test would catch."""
    base = str(tmp_path / "b")
    idx = str(tmp_path / "i")
    rows = [(i, f"tok{i:04d}") for i in range(60)]
    create_table(_corpus(spark, rows), base)
    create_text_index(spark, base, idx, n_files=3)
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        files_scanned,
    )

    assert files_scanned(idx) == 3
    merge_table(_corpus(spark, [(0, "zzz")]), base, "doc_id")
    vacuum_table(base, keep_last=1)
    assert sync_text_index(spark, idx) == 2
    assert table_history(idx)[-1]["op"].startswith("index_rebuild")
    assert files_scanned(idx) == 3  # layout preserved across rebuild


def test_posting_ids_unambiguous_for_hostile_string_keys(spark, tmp_path):
    """Advice r11: a bare token:key concat collides for token 'a' +
    key 'b:c' vs token 'a:b' + key 'c' — a sync deleting one posting
    could clobber the other. The length-prefixed encoding keeps them
    distinct through a full update lifecycle."""
    base = str(tmp_path / "b")
    idx = str(tmp_path / "i")
    create_table(
        spark.createDataFrame(
            [("b:c", "a keep"), ("c", "a:b keep")], "k string, text string"
        ),
        base,
    )
    create_text_index(spark, base, idx, key="k")
    post = {
        (r.token, r.k)
        for r in read_table(spark, idx).select("token", "k").collect()
    }
    assert ("a", "b:c") in post and ("a:b", "c") in post
    ids = [r.posting_id for r in read_table(spark, idx).collect()]
    assert len(ids) == len(set(ids))  # no encoded collision
    # drop token 'a' from doc 'b:c' only; doc 'c' must keep 'a:b'
    merge_table(
        spark.createDataFrame([("b:c", "keep")], "k string, text string"),
        base, "k",
    )
    assert sync_text_index(spark, idx) == 2
    post = {
        (r.token, r.k)
        for r in read_table(spark, idx).select("token", "k").collect()
    }
    assert ("a", "b:c") not in post and ("a:b", "c") in post
    assert ("keep", "b:c") in post and ("keep", "c") in post


def test_search_prunes_to_covering_files(spark, tmp_path):
    """The token-clustered layout makes a term lookup touch only the
    file(s) whose manifest token range covers the term."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        files_scanned,
    )

    base = str(tmp_path / "b")
    idx = str(tmp_path / "i")
    rows = [(i, f"tok{i:04d} common") for i in range(200)]
    create_table(_corpus(spark, rows), base)
    create_text_index(spark, base, idx, n_files=8)
    hits = sorted(
        r.doc_id for r in search_text_index(spark, idx, "tok0007").collect()
    )
    assert hits == [7]
    total = files_scanned(idx)
    scanned = files_scanned(idx, prune=("token", "==", "tok0007"))
    assert total >= 4 and scanned < total  # pruning really bites
    # the hot common token is in every doc; search still exact
    assert search_text_index(spark, idx, "common").count() == 200


def test_search_still_prunes_after_wide_sync(spark, tmp_path):
    """A base row-delete emits postings spanning the whole vocabulary,
    so the sync's merge rewrites every index file. The cluster-
    preserving merge write must keep the token ranges disjoint —
    without it a lookup after one wide sync scans the full index."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        delete_rows,
        files_scanned,
    )

    base = str(tmp_path / "b")
    idx = str(tmp_path / "i")
    rows = [(i, f"tok{i:04d} common filler") for i in range(200)]
    create_table(
        _corpus(spark, rows).repartitionByRange(4, "doc_id"), base
    )
    create_text_index(spark, base, idx, n_files=8)
    # row-deletes whose postings span the vocab end to end
    delete_rows(
        spark, base,
        spark.createDataFrame([(0,), (99,), (199,)], "doc_id long"),
        "doc_id",
    )
    assert sync_text_index(spark, idx) == 2
    assert _index_postings(spark, idx) == _brute_postings(spark, base)
    total = files_scanned(idx)
    scanned = files_scanned(idx, prune=("token", "==", "tok0007"))
    assert total >= 4 and scanned < total, (scanned, total)
    assert sorted(
        r.doc_id for r in search_text_index(spark, idx, "tok0007").collect()
    ) == [7]


def test_batched_term_search_matches_per_term_lookups(spark, tmp_path):
    """search_text_index_terms: one pruned scan over the union of the
    terms' covering files equals the per-term lookups, and still scans
    fewer files than the index holds for a clustered term set."""
    from optimal_parallel_fp_growth_spark.sources.text_index import (
        search_text_index_terms,
    )

    base = str(tmp_path / "b")
    idx = str(tmp_path / "i")
    rows = [(i, f"tok{i:04d} common") for i in range(200)]
    create_table(_corpus(spark, rows), base)
    create_text_index(spark, base, idx, n_files=8)
    terms = ["tok0003", "tok0004", "tok0190", "absent_tok"]
    got = {
        (r.token, r.doc_id)
        for r in search_text_index_terms(spark, idx, terms).collect()
    }
    want = set()
    for t in terms:
        for r in search_text_index(spark, idx, t).collect():
            want.add((t, r.doc_id))
    assert got == want
    assert got == {("tok0003", 3), ("tok0004", 4), ("tok0190", 190)}
    # all-absent terms: empty frame, correct shape
    none = search_text_index_terms(spark, idx, ["zz1", "zz2"])
    assert none.columns == ["token", "doc_id"] and none.count() == 0
    with pytest.raises(ValueError, match="at least one"):
        search_text_index_terms(spark, idx, [])
    # executed-plan pin: the batched scan's inputFiles are a strict
    # subset of the index (union of covering files only) — tok0003/4
    # cluster in one file, tok0190 in another
    batched = search_text_index_terms(spark, idx, terms)
    n_read = len(set(batched.inputFiles()))
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        files_scanned,
    )

    assert 0 < n_read <= 2 < files_scanned(idx)


def test_batched_term_search_respects_index_delete_sidecars(
    spark, tmp_path
):
    """Advice r12 (medium): the postings table is itself a versioned
    table, so delete_rows on the INDEX path is public API. The batched
    lookup reads files directly and must subtract the merge-on-read
    sidecars exactly like the single-term path (which goes through
    read_table) — or it resurrects deleted postings."""
    from optimal_parallel_fp_growth_spark.sources.text_index import (
        search_text_index_terms,
    )
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        delete_rows,
    )

    base = str(tmp_path / "b")
    idx = str(tmp_path / "i")
    create_table(
        _corpus(spark, [(1, "a b"), (2, "b c"), (3, "c d")]), base
    )
    create_text_index(spark, base, idx, n_files=2)
    # surgically remove doc 2's 'b' posting from the index itself
    victim = read_table(spark, idx).where(
        (F.col("token") == "b") & (F.col("doc_id") == 2)
    ).select("posting_id")
    delete_rows(spark, idx, victim, "posting_id")
    single = {
        (t, r.doc_id)
        for t in ("b", "c")
        for r in search_text_index(spark, idx, t).collect()
    }
    batched = {
        (r.token, r.doc_id)
        for r in search_text_index_terms(spark, idx, ["b", "c"]).collect()
    }
    assert batched == single
    assert ("b", 2) not in batched and ("b", 1) in batched
    assert ("c", 2) in batched and ("c", 3) in batched
    # the all-pruned branch builds its empty frame from the manifest
    # schema — no data file is listed or read
    none = search_text_index_terms(spark, idx, ["zz_absent"])
    assert none.columns == ["token", "doc_id"] and none.count() == 0
    assert none.inputFiles() == []


def test_index_sync_reconverges_across_restore_over_mor_delete(
    spark, tmp_path
):
    """Advice r11 (high), index edition: a restore that removes a
    delete sidecar re-exposes rows; the sync must re-insert their
    postings through the feed's reappear pass or the index diverges
    from the base forever."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        delete_rows,
        restore_table,
    )

    base = str(tmp_path / "b")
    idx = str(tmp_path / "i")
    create_table(
        _corpus(
            spark, [(1, "a b"), (2, "b c"), (3, "c d")]
        ).repartitionByRange(3, "doc_id"),
        base,
    )
    create_text_index(spark, base, idx)
    delete_rows(
        spark, base, spark.createDataFrame([(2,)], "doc_id long"), "doc_id"
    )
    assert sync_text_index(spark, idx) == 2
    assert _index_postings(spark, idx) == _brute_postings(spark, base)
    assert ("b", 2) not in _index_postings(spark, idx)
    restore_table(base, 1)  # doc 2 reappears
    assert sync_text_index(spark, idx) == 3
    assert _index_postings(spark, idx) == _brute_postings(spark, base)
    assert ("b", 2) in _index_postings(spark, idx)


def test_create_index_guards(spark, tmp_path):
    base = str(tmp_path / "b")
    create_table(_corpus(spark, [(1, "a")]), base)
    idx = str(tmp_path / "i")
    create_text_index(spark, base, idx)
    with pytest.raises(FileExistsError):
        create_text_index(spark, base, idx)
    with pytest.raises(FileNotFoundError):
        sync_text_index(spark, str(tmp_path / "nope"))
    with pytest.raises(FileNotFoundError):
        create_text_index(spark, str(tmp_path / "nobase"), str(tmp_path / "i2"))


def test_index_survives_own_compaction(spark, tmp_path):
    """Compacting the INDEX (a maintenance commit that does not move
    the watermark) must be transparent: the watermark reads through
    the compact commit and the next sync still applies the right
    delta."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        compact_table,
    )

    base = str(tmp_path / "b")
    idx = str(tmp_path / "i")
    create_table(_corpus(spark, [(1, "a b"), (2, "c d"), (3, "e")]), base)
    create_text_index(spark, base, idx, n_files=4)
    compact_table(spark, idx, target_mb=128)
    assert table_history(idx)[-1]["op"] == "compact"
    assert index_base_version(idx) == 1  # reads through the compact
    merge_table(_corpus(spark, [(1, "a z"), (9, "n")]), base, "doc_id")
    assert sync_text_index(spark, idx) == 2
    assert _index_postings(spark, idx) == _brute_postings(spark, base)


def test_property_random_lifecycles_sync_equals_brute(spark, tmp_path):
    """Hypothesis over random merge/COW-delete/append/MOR-delete/
    restore sequences with random small-vocabulary texts, syncing at
    random stops: the index always equals the python re-tokenization
    of the head snapshot, and the watermark always equals the base
    head after a sync. Merges re-insert a previously MOR-deleted key
    when one exists (the sequence rule inside the property), and
    restores roll back to a random retained version (the feed's
    reappear pass inside the property)."""
    from hypothesis import given, settings, strategies as st

    from optimal_parallel_fp_growth_spark.sources.versioned import (
        _versions,
        delete_rows,
        restore_table,
    )

    VOCAB = ["a", "b", "c", "dd", "ee", "ff"]
    text_strat = st.lists(
        st.sampled_from(VOCAB), min_size=1, max_size=4
    ).map(" ".join)
    step_strat = st.lists(
        st.tuples(
            st.sampled_from(
                ["merge", "delete", "append", "mor_delete", "restore"]
            ),
            st.lists(text_strat, min_size=1, max_size=3),
            st.booleans(),  # sync after this step?
            st.integers(min_value=0, max_value=7),  # restore target pick
        ),
        min_size=1,
        max_size=4,
    )
    counter = [0]

    @settings(max_examples=6, deadline=None)
    @given(steps=step_strat)
    def run(steps):
        counter[0] += 1
        base = str(tmp_path / f"pb{counter[0]}")
        idx = str(tmp_path / f"pi{counter[0]}")
        model = {i: f"{VOCAB[i % len(VOCAB)]} seed" for i in range(8)}
        create_table(
            _corpus(spark, sorted(model.items())), base
        )
        create_text_index(spark, base, idx, n_files=2)
        history = {1: dict(model)}  # python model per committed version
        mor_deleted: set[int] = set()
        nxt = 100
        for op, texts, do_sync, pick in steps:
            if op == "merge":
                # update the smallest existing keys + insert fresh ones
                keys = sorted(model)[: len(texts)]
                rows = [(k, t) for k, t in zip(keys, texts)]
                rows += [(nxt + j, t) for j, t in enumerate(texts)]
                if mor_deleted:
                    # sequence rule: re-insert a MOR-deleted key
                    back = sorted(mor_deleted)[0]
                    mor_deleted.discard(back)
                    rows.append((back, texts[0]))
                merge_table(_corpus(spark, rows), base, "doc_id")
                model.update(rows)
                nxt += len(texts)
            elif op == "delete":
                if not model:
                    continue
                cut = sorted(model)[len(model) // 2]
                delete_where(spark, base, ("doc_id", ">=", cut))
                model = {k: v for k, v in model.items() if k < cut}
            elif op == "mor_delete":
                if len(model) < 2:
                    continue
                victims = sorted(model)[:2]
                delete_rows(
                    spark, base,
                    _corpus(spark, [(v, "x") for v in victims]).select(
                        "doc_id"
                    ),
                    "doc_id",
                )
                for v in victims:
                    model.pop(v)
                    mor_deleted.add(v)
            elif op == "restore":
                targets = sorted(history)
                v = targets[pick % len(targets)]
                new_head = restore_table(base, v)
                if new_head == v:
                    continue  # restoring the head is a no-op commit-wise
                model = dict(history[v])
                # keys MOR-deleted after v are visible again at v
                mor_deleted = {k for k in mor_deleted if k not in model}
            else:  # append
                rows = [(nxt + j, t) for j, t in enumerate(texts)]
                append_table(_corpus(spark, rows), base)
                model.update(rows)
                nxt += len(texts)
            history[_versions(base)[-1]] = dict(model)
            if do_sync:
                assert sync_text_index(spark, idx) == _versions(base)[-1]
                want = {
                    (tok, k)
                    for k, t in model.items()
                    for tok in set(t.split(" "))
                }
                assert _index_postings(spark, idx) == want
        # final catch-up regardless of the last step's sync flag
        sync_text_index(spark, idx)
        want = {
            (tok, k) for k, t in model.items() for tok in set(t.split(" "))
        }
        assert _index_postings(spark, idx) == want
        assert _brute_postings(spark, base) == want

    run()


def test_index_sync_over_mor_deleted_base(spark, tmp_path):
    """Completes the composition matrix: the maintained index consumes
    merge-on-read deletes through the same change feed — postings of
    sidecar-masked documents vanish, a re-upserted document's
    postings come back."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        delete_rows,
    )

    base = str(tmp_path / "b")
    idx = str(tmp_path / "i")
    create_table(
        _corpus(spark, [(1, "a b"), (2, "c d"), (3, "e f")]), base
    )
    create_text_index(spark, base, idx)
    delete_rows(
        spark, base, spark.createDataFrame([(1,), (3,)], "doc_id long"),
        "doc_id",
    )
    assert sync_text_index(spark, idx) == 2
    assert _index_postings(spark, idx) == {("c", 2), ("d", 2)}
    merge_table(_corpus(spark, [(3, "e zz")]), base, "doc_id")  # re-insert
    assert sync_text_index(spark, idx) == 3
    assert _index_postings(spark, idx) == _brute_postings(spark, base)
    assert _index_postings(spark, idx) == {("c", 2), ("d", 2), ("e", 3), ("zz", 3)}
