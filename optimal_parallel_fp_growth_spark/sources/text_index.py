"""Incrementally-maintained inverted text index over a versioned table
(engine addition; the secondary-index shape a 100 TB corpus pipeline
needs next to its rollups).

The index is a versioned postings table — rows ``(posting_id, token,
doc key)``, one per DISTINCT token per document (document frequency
semantics, matching ``operators/ngrams.py::inverted_index``'s
whitespace tokenizer) — range-partitioned and sorted by token at
create time so the per-file manifest [min, max] token ranges are
disjoint: a term lookup through ``search_text_index`` prunes to the
file(s) whose range covers the term, never a full postings scan.

Maintenance is the set-valued analogue of ``refresh_aggregate``: a
sync reads the base's change feed (only version-exclusive files),
re-tokenizes the PRE- and POST-images of the changed documents, and
emits one mixed changeset — postings of vanished ``(doc, token)``
pairs flagged for DELETE, postings of new pairs as inserts — applied
by a single :func:`merge_table` call with its ``delete_col`` arm, so
one atomic index version per catch-up. Tokens shared by a document's
pre- and post-image cancel in the delta and are never touched: an
update that edits one word costs two postings, not the document's
whole vocabulary. The base-version watermark rides the index
manifest's ``op`` string (``index@base_v<N>``), exactly the
materialized-view contract; an index whose base was vacuumed past the
watermark rebuilds from the head and records ``index_rebuild@...``.
"""

from __future__ import annotations

import json
import os
import pathlib

from pyspark.sql import DataFrame, SparkSession

from optimal_parallel_fp_growth_spark.sources.versioned import (
    _commit,
    _file_stats,
    _load_manifest,
    _schema_fields,
    _versions,
    _write_data,
    merge_table,
    read_table,
    table_changes,
)

__all__ = [
    "create_text_index",
    "sync_text_index",
    "search_text_index",
    "search_text_index_terms",
    "index_base_version",
]

_INDEX_META = "_index.json"


def _index_spec(index_path: str) -> dict:
    p = pathlib.Path(index_path) / _INDEX_META
    if not p.is_file():
        raise FileNotFoundError(f"no text index at {index_path}")
    return json.loads(p.read_text())


def index_base_version(index_path: str, version: int | None = None) -> int:
    """The base-table version an index version reflects (latest
    branded commit by default — maintenance commits like compaction
    in between are transparent), parsed from the atomically-committed
    manifest op."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        _watermark_at,
    )

    return _watermark_at(index_path, version, "text index")


def _posting_id(token_col, key_col):
    """Unambiguous (token, key) encoding: ``len(token):token:key``.
    A bare ``token:key`` concat is ambiguous when the key is a string
    containing ':' or the token contains ':' (the whitespace tokenizer
    allows both): 'a'+'b:c' and 'a:b'+'c' both encode 'a:b:c', so a
    merge keyed on posting_id could clobber a DIFFERENT posting
    (advice r11). The length prefix makes decoding deterministic:
    leading digits give the token's length, the remainder is the key."""
    from pyspark.sql import functions as F

    return F.concat(
        F.length(token_col).cast("string"), F.lit(":"),
        token_col, F.lit(":"), key_col.cast("string"),
    )


def _postings(df: DataFrame, key: str, text_col: str) -> DataFrame:
    """(posting_id, token, <key>) rows — one per distinct token per
    document; the same whitespace tokenizer as the batch
    ``inverted_index`` operator so both agree on any corpus."""
    from pyspark.sql import functions as F

    return df.select(
        F.col(key),
        F.explode(
            F.array_distinct(F.split(F.col(text_col), " "))
        ).alias("token"),
    ).select(
        _posting_id(F.col("token"), F.col(key)).alias("posting_id"),
        "token",
        key,
    )


def create_text_index(
    spark: SparkSession,
    base_path: str,
    index_path: str,
    key: str = "doc_id",
    text_col: str = "text",
    n_files: int = 8,
) -> int:
    """Build the postings table for ``base_path``'s CURRENT head —
    the index's one full base scan — range-partitioned and sorted by
    token so file stats prune term lookups. Returns the base version
    the index reflects."""
    if _versions(index_path):
        raise FileExistsError(f"text index already exists at {index_path}")
    base_vs = _versions(base_path)
    if not base_vs:
        raise FileNotFoundError(f"no versioned table at {base_path}")
    head = base_vs[-1]
    post = _postings(
        read_table(spark, base_path, version=head), key, text_col
    )
    clustered = post.repartitionByRange(n_files, "token").sortWithinPartitions(
        "token", key
    )
    idir = pathlib.Path(index_path)
    idir.mkdir(parents=True, exist_ok=True)
    spec = {
        "base_path": os.path.abspath(base_path),
        "key": key,
        "text_col": text_col,
        # persisted so a vacuum-fallback rebuild keeps the layout /
        # pruning granularity the index was created with (advice r11)
        "n_files": n_files,
    }
    tmp = idir / f".{_INDEX_META}.tmp.{os.getpid()}"
    tmp.write_text(json.dumps(spec, indent=1))
    os.replace(tmp, idir / _INDEX_META)
    # also record the clustering as a table property so ANY rewrite
    # path over the postings table re-clusters, not just the sync's
    # explicit option
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        _write_table_spec,
    )

    _write_table_spec(index_path, {"cluster_by": ["token", key]})
    files = _write_data(clustered, index_path, 1)
    _commit(
        index_path, 1, files, f"index@base_v{head}",
        _schema_fields(clustered), _file_stats(index_path, files),
    )
    return head


def sync_text_index(spark: SparkSession, index_path: str) -> int:
    """Catch the index up to its base head: tokenize only the CHANGED
    documents' pre- and post-images from the change feed, cancel the
    shared tokens, and apply the residue — vanished pairs as deletes,
    new pairs as inserts — in ONE ``merge_table`` changeset. No-op
    when current; full rebuild (recorded as ``index_rebuild``) when
    the base was vacuumed past the watermark. Returns the base
    version now reflected."""
    from pyspark.sql import functions as F

    spec = _index_spec(index_path)
    base_path, key, text_col = spec["base_path"], spec["key"], spec["text_col"]
    base_vs = _versions(base_path)
    if not base_vs:
        raise FileNotFoundError(f"no versioned table at {base_path}")
    head = base_vs[-1]
    synced = index_base_version(index_path)
    if head == synced:
        return synced
    if head < synced:
        raise ValueError(
            f"index at {index_path} reflects base v{synced} but the base "
            f"head is v{head} — the base table was replaced?"
        )
    cur = _versions(index_path)[-1]
    try:
        feed = table_changes(spark, base_path, synced, head, key)
    except FileNotFoundError:
        post = _postings(
            read_table(spark, base_path, version=head), key, text_col
        )
        clustered = post.repartitionByRange(
            int(spec.get("n_files", 8)), "token"
        ).sortWithinPartitions("token", key)
        files = _write_data(clustered, index_path, cur + 1)
        _commit(
            index_path, cur + 1, files, f"index_rebuild@base_v{head}",
            _schema_fields(clustered), _file_stats(index_path, files),
        )
        return head
    # ONE pass over the feed: tokenize every change row with a signed
    # weight (+1 post-side, -1 pre-side) and net per (token, key).
    # Postings are distinct-per-document per side, so net ∈ {-1,0,+1}:
    # 0 = the unchanged vocabulary of an updated document (cancelled),
    # -1 = vanished pair (delete), +1 = new pair (insert). The earlier
    # two-sided exceptAll form re-derived the feed — and re-read the
    # version-exclusive base files — four times.
    w = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    posts = feed.select(
        w.alias("__w"),
        F.col(key),
        F.explode(
            F.array_distinct(F.split(F.col(text_col), " "))
        ).alias("token"),
    )
    # localCheckpoint, not persist (r18, same A/B as the CDF follow
    # applier in versioned.py): the changeset is referenced by the
    # merge's bounds scan, delete split, anti-join and upsert union,
    # and a plain persist leaves the full feed plan (version-exclusive
    # reads + full-outer join + explode + netting aggregate) under
    # every reference for the driver to re-analyze; the cut
    # materializes the same blocks and truncates the lineage. A lost
    # block fails the sync and the monotone watermark replays it.
    from optimal_parallel_fp_growth_spark.functions.caching import (
        localcheckpoint_rdd_ids,
        persistent_rdd_ids,
        unpersist_blocks,
    )

    seen_ids = persistent_rdd_ids(spark)
    changeset = (
        posts.groupBy("token", key)
        .agg(F.sum("__w").alias("__net"))
        .where(F.col("__net") != 0)
        .select(
            _posting_id(F.col("token"), F.col(key)).alias("posting_id"),
            "token",
            key,
            (F.col("__net") < 0).alias("__delete"),
        )
        .localCheckpoint()
    )
    # exact id off the checkpointed LogicalRDD; the diff window is only
    # the fallback (a diff can race a concurrent thread's checkpoint
    # into the cleanup set — r18 review finding)
    blocks = localcheckpoint_rdd_ids(changeset) or (
        persistent_rdd_ids(spark) - seen_ids
    )
    try:
        # the emptiness probe rides the merge's own bounds aggregate
        # (``empty_ok``) instead of a separate isEmpty job: merge
        # returns the UNCHANGED version when the changeset nets to
        # nothing (content-identical churn), and sync then advances
        # the watermark with a zero-file-change commit so it stays
        # monotone
        new_v = merge_table(
            changeset, index_path, "posting_id",
            delete_col="__delete", op_label=f"index@base_v{head}",
            # re-cluster rewritten files by token so a wide changeset
            # (e.g. a row-delete whose postings span the vocabulary)
            # cannot destroy the disjoint token ranges pruned lookups
            # depend on
            cluster_by=["token", key],
            empty_ok=True,
        )
        if new_v == cur:
            man = _load_manifest(index_path, cur)
            _commit(
                index_path, cur + 1, man["files"], f"index@base_v{head}",
                man.get("schema"), man.get("file_stats"),
            )
        return head
    finally:
        unpersist_blocks(spark, blocks)


def search_text_index(
    spark: SparkSession, index_path: str, term: str
) -> DataFrame:
    """Posting lookup for one term through manifest-stat pruning: only
    index files whose [min, max] token range covers ``term`` are
    read (the token-clustered layout makes that one file in the
    common case). Returns ``(<key>,)`` rows."""
    spec = _index_spec(index_path)
    from pyspark.sql import functions as F

    return (
        read_table(spark, index_path, prune=("token", "==", term))
        .where(F.col("token") == term)
        .select(spec["key"])
    )


def search_text_index_terms(
    spark: SparkSession, index_path: str, terms: list[str]
) -> DataFrame:
    """Batched posting lookup: ONE pruned scan over the union of the
    terms' covering files, instead of one driver-sequenced job per
    term — the shape a query layer fans N terms through. File
    selection is the same manifest-stat survival test per term,
    unioned at the FILE level (each file is read once however many
    terms it covers); rows then filter to the term set. Returns
    ``(token, <key>)`` rows."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        _apply_delete_masks,
        _file_survives,
        _load_manifest,
        _read_files,
        _versions,
    )

    if not terms:
        raise ValueError("terms must name at least one token")
    spec = _index_spec(index_path)
    from pyspark.sql import functions as F

    vs = _versions(index_path)
    if not vs:
        raise FileNotFoundError(f"no text index at {index_path}")
    man = _load_manifest(index_path, vs[-1])
    fstats = man.get("file_stats") or {}
    scan = [
        f
        for f in man["files"]
        if any(_file_survives(fstats.get(f), "token", "==", t) for t in terms)
    ]
    key = spec["key"]
    if not scan:
        # every file pruned: empty result straight from the manifest
        # schema — listing (let alone reading) data files for an empty
        # frame is wasted IO at any scale
        schema = man.get("schema")
        if schema:
            from pyspark.sql.types import _parse_datatype_string

            ddl = ", ".join(f"`{n}` {t}" for n, t in schema)
            empty = spark.createDataFrame([], _parse_datatype_string(ddl))
        else:  # pre-schema manifest: read one file's footer
            empty = _read_files(
                spark, index_path, man["files"][:1], None
            ).limit(0)
        return empty.select("token", key)
    # the index is itself a versioned table, so its manifest can carry
    # merge-on-read delete sidecars (delete_rows on the index path is
    # public API): subtract them exactly as read_table does, or the
    # batched lookup would resurrect deleted postings and diverge from
    # the single-term path (advice r12)
    return (
        _apply_delete_masks(
            spark,
            index_path,
            _read_files(spark, index_path, scan, man.get("schema")),
            man,
        )
        .where(F.col("token").isin(list(terms)))
        .select("token", key)
    )
