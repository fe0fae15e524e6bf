"""Versioned table layout — manifest-committed parquet (engine
addition; the minimal table-format core an incremental 100 TB
pipeline needs, filesystem edition).

A rolling corpus is APPENDED to by every crawl and READ concurrently
by training jobs; bare parquet directories give neither atomicity
(readers list half-written files) nor reproducibility (yesterday's
training run can't be replayed against yesterday's table). The fix is
the manifest pattern every table format shares (Iceberg/Delta/Hudi):
data files are immutable and write-once under ``data/v<N>/``, and a
version is BORN ATOMICALLY by renaming its manifest into place — a
single POSIX ``rename``, so any reader sees either version N or
version N+1, never a mix. History is retained: ``read(version=3)``
replays exactly the files v3 committed, regardless of later appends,
compactions, or overwrites.

Semantics:
- ``create`` → v1; ``append`` → vN+1 = vN's files + the new files;
  ``overwrite`` → vN+1 = only the new files; ``compact`` → vN+1 = the
  same ROWS as vN in fewer files (old versions keep reading the old
  files — nothing is deleted except by ``vacuum``).
- Writers are single-writer-at-a-time (optimistic: the manifest
  rename fails if the version already exists — the loser retries on a
  fresh snapshot). On object stores swap the rename for the store's
  conditional-put; the protocol is unchanged.
- ``vacuum(keep_last=K)`` deletes data files unreferenced by the last
  K manifests — the only destructive operation, explicitly invoked.
"""

from __future__ import annotations

import errno
import json
import os
import pathlib
import shutil
import time
import warnings

from pyspark.sql import DataFrame, SparkSession

# one warning per process when the fused write+stats kernel falls back
# to the legacy two-pass write (see _write_data_and_stats)
_FUSED_FALLBACK_LOGGED = False

__all__ = [
    "create_table",
    "append_table",
    "overwrite_table",
    "compact_table",
    "merge_table",
    "delete_where",
    "delete_rows",
    "update_where",
    "overwrite_where",
    "restore_table",
    "clone_table",
    "read_table",
    "version_at_timestamp",
    "table_changes",
    "aggregate_state",
    "refresh_aggregate",
    "present_aggregate",
    "create_view",
    "sync_view",
    "read_view",
    "view_base_version",
    "files_scanned",
    "table_rowcount",
    "table_minmax",
    "table_history",
    "describe_table",
    "add_constraint",
    "drop_constraint",
    "table_constraints",
    "vacuum_table",
    "purge_deletes",
    "vacuum_orphans",
    "add_column",
    "drop_column",
    "rename_column",
    "stream_to_table",
    "stream_ingest_to_table",
    "last_txn_epoch",
    "evolve_table_spec",
    "bloom_bits_for",
    "stream_merge_to_table",
    "stream_table_changes",
    "stream_changes_to_table",
    "CommitConflict",
    "with_retry",
]

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"


class CommitConflict(FileExistsError):
    """A concurrent writer committed the version this writer was
    building (VERDICT r13 task #5). Raised by BOTH race arbiters — the
    data-directory rename and the manifest hard-link — and ONLY by
    them, so a caller can distinguish the retryable optimistic-
    concurrency loss from a genuinely-fatal FileExistsError ("table
    already exists at ..."), which replaying would never fix.
    Subclasses FileExistsError, so every pre-existing handler keeps
    working."""


def with_retry(fn, retries: int = 5, backoff_s: float = 0.05):
    """Run a versioned-table write closure under optimistic-concurrency
    retry: on :class:`CommitConflict` the closure is simply called
    again — every public writer (``append_table`` / ``merge_table`` /
    ``delete_where`` / ``update_where`` / ...) re-reads the CURRENT
    manifest snapshot at entry, so calling again IS the
    reread-and-replay the protocol asks of a losing writer. Any other
    exception (including the non-conflict FileExistsError from
    ``create_table`` on an existing table) propagates immediately.

    Returns the closure's result (the committed version for the
    built-in writers). After ``retries`` consecutive losses the last
    :class:`CommitConflict` propagates — under that much contention
    the caller should serialize writers instead. Backoff doubles per
    loss (the loser must at minimum re-plan and re-write its files,
    so a tight loop only re-loses).

    Schema-DDL seam: a writer racing a concurrent ``rename_column``/
    ``drop_column`` can lose as a schema ``ValueError`` instead of a
    conflict (its plan was built against the pre-DDL schema). That is
    deliberately NOT retried here — the closure must re-derive its
    frame from the fresh schema, which a blind replay cannot do; put
    the schema read INSIDE the closure and wrap the ValueError at the
    call site if DDL-concurrent writes are expected."""
    attempt = 0
    while True:
        try:
            return fn()
        except CommitConflict:
            if attempt >= retries:
                raise
            time.sleep(backoff_s * (2 ** attempt))
            attempt += 1


def _manifest_path(path: str, version: int) -> pathlib.Path:
    return pathlib.Path(path) / _MANIFEST_DIR / f"v{version:08d}.json"


def _versions(path: str) -> list[int]:
    mdir = pathlib.Path(path) / _MANIFEST_DIR
    if not mdir.is_dir():
        return []
    return sorted(
        int(p.stem[1:]) for p in mdir.glob("v*.json") if p.stem[1:].isdigit()
    )


def _load_manifest(path: str, version: int) -> dict:
    return json.loads(_manifest_path(path, version).read_text())


def _write_data(
    df: DataFrame, path: str, version: int, max_records: int | None = None
) -> list[str]:
    """Write immutable data files under data/v<N>/ and return their
    table-relative paths.

    Concurrency (VERDICT r10 #5, hardened r11): the job writes into a
    WRITER-UNIQUE staging directory and atomically renames it to
    data/v<N>/. A shared target directory would leave a TOCTOU window —
    two writers both pass Spark's mode('error') existence check before
    either creates the path, interleave their part files in one
    directory, and the winner's manifest (built from a directory glob)
    silently absorbs the loser's rows. With staging, the glob only ever
    sees this writer's files and the RENAME is the race arbiter: the
    loser gets the same FileExistsError conflict signal as a losing
    manifest link in ``_commit`` and retries on a fresh snapshot. A
    crashed writer leaves only an orphaned ``.staging`` directory (never
    a half-visible version); on object stores swap the rename for a
    conditional copy-then-delete, as with the manifest link.

    Timestamps are written as INT64 TIMESTAMP_MICROS, not Spark's
    legacy INT96 default: INT96 columns carry NO parquet min/max
    statistics, so every timestamp-keyed manifest stat would be empty
    and time-range pruning — the single most common prune at scale —
    would silently degrade to a full scan."""
    import uuid

    spark = df.sparkSession
    key = "spark.sql.parquet.outputTimestampType"
    prev = spark.conf.get(key, None)
    mkey = "spark.sql.files.maxRecordsPerFile"
    mprev = spark.conf.get(mkey, None)
    data_root = pathlib.Path(path) / _DATA_DIR
    ddir = data_root / f"v{version:08d}"
    stage = data_root / f".v{version:08d}.staging.{uuid.uuid4().hex}"
    try:
        spark.conf.set(key, "TIMESTAMP_MICROS")
        if max_records is not None:
            # sorted-bucket layout: split each bucket's sorted task
            # output into cNNN files of ~max_records rows — because the
            # partition is SORTED, every split file covers a contiguous
            # narrow slice of the sort column, which is what gives the
            # manifest its within-bucket range stats
            spark.conf.set(mkey, str(int(max_records)))
        df.write.mode("error").parquet(str(stage))
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
        if max_records is not None:
            if mprev is None:
                spark.conf.unset(mkey)
            else:
                spark.conf.set(mkey, mprev)
    _publish_stage(stage, ddir, path, version)
    rel = []
    for f in sorted(ddir.glob("*.parquet")):
        rel.append(str(f.relative_to(path)))
    return rel


def _publish_stage(
    stage: pathlib.Path, ddir: pathlib.Path, path: str, version: int
) -> None:
    """Atomically rename a writer-unique staging directory to its
    version directory; the rename is the race arbiter (see
    :func:`_write_data`)."""
    try:
        os.rename(stage, ddir)  # atomic: fails if a racer's vN exists
    except OSError as e:
        shutil.rmtree(stage, ignore_errors=True)
        # only the target-exists errnos ARE the race (review r11):
        # translating every OSError would turn a persistent
        # environmental fault (EACCES, EIO, EXDEV) into a
        # 'retry on a fresh snapshot' signal callers loop on forever
        if e.errno in (errno.EEXIST, errno.ENOTEMPTY):
            raise CommitConflict(
                f"data for version {version} already written at {path} "
                "(concurrent writer, or leftovers of a crashed commit "
                "needing cleanup - vacuum_orphans reclaims those)"
            ) from None
        raise


# distribute the per-file commit-stats pass once a commit writes at
# least this many files: below it, one Spark job costs more than the
# driver loop it replaces. Two thresholds because the per-file work
# differs by an order of magnitude: with BLOOM columns each file pays
# a column read + per-distinct-value hashing (the 20M-row probe
# measured 3.2 s/file driver-side), so the job pays for itself almost
# immediately; without them the pass is footer reads + at most a
# float-column NaN check (~10 ms/file), where a several-hundred-ms
# Spark job round trip only wins on genuinely wide commits — the
# small-commit lifecycle stages (schema_evolution_read,
# bucketed_table_merge, each committing a handful of times) should
# never pay job latency for driver work that costs less than the job
# submission itself.
_STATS_DISTRIBUTE_MIN = 6
_STATS_DISTRIBUTE_MIN_LIGHT = 32
# footer-ONLY commits (no bloom columns, no float columns → no data
# read at all, just a ~1 ms metadata read per file): the driver loop
# beats a Spark job until the file count amortizes the several-hundred-
# ms job round trip (measured r17: the 32-file follow commits paid
# 0.27-0.36 s stats jobs for ~60 ms of driver footer reads)
_STATS_DISTRIBUTE_MIN_FOOTER = 1024


def _file_stats(
    path: str,
    rel_files: list[str],
    bloom_spec: dict | None = None,
    spark: SparkSession | None = None,
) -> dict[str, dict]:
    """Per-file min/max column ranges, read from the parquet FOOTERS of
    the just-written files (no data scan — the writer already computed
    row-group statistics). Only scalar-typed columns with complete
    stats in every row group are recorded; a file with no usable stats
    gets ``{}`` and is never pruned. At cluster scale this is the
    manifest-level pruning index every table format keeps (Iceberg
    ``lower_bounds``/``upper_bounds``): a time-travel read with a
    predicate opens only the files whose range intersects it.

    When ``spark`` is passed and the commit wrote enough files to
    amortize a job (``_STATS_DISTRIBUTE_MIN`` with bloom columns,
    ``_STATS_DISTRIBUTE_MIN_LIGHT`` without — see the thresholds'
    comment), the per-file pass runs AS A SPARK JOB (one task per
    file batch, Arrow-batched ``mapInPandas``)
    instead of a sequential driver loop — the Iceberg writer-side
    stats model (round 16, VERDICT r15 task #2). The expensive parts
    of the pass are per-file COLUMN reads (``__nan`` flags) and
    per-distinct-value bloom hashing; serializing those on the driver
    was the one genuine driver-side bottleneck left in the commit
    path: at a 100 TB commit (thousands of files) the executors do
    O(files) work in parallel while the driver only assembles the
    manifest. The kernel returns each file's stats as one JSON blob —
    a few KB per file — so the collect is manifest-sized, not
    data-sized. Results are byte-identical to the driver loop (same
    ``_stats_for_one_file`` body; pinned by tests/
    test_r16_lakehouse.py::test_distributed_stats_match_driver_loop)."""
    spec = _table_spec(path)  # loaded ONCE per commit (advice r15)
    bspec = bloom_spec if bloom_spec is not None else spec.get("bloom") or {}
    sid = spec.get("spec_id")
    if bspec.get("cols"):
        threshold = _STATS_DISTRIBUTE_MIN
    else:
        # no bloom columns: a float column still means one data-column
        # read per file (__nan flags); without even that, the pass is
        # pure footer metadata and the driver loop wins until the file
        # count is large (see the threshold constants). Peek ONE
        # footer to tell the tiers apart — a ~1 ms read.
        threshold = _STATS_DISTRIBUTE_MIN_LIGHT
        try:
            import pyarrow as pa
            import pyarrow.parquet as pq

            first = str(pathlib.Path(path) / rel_files[0])
            schema = pq.ParquetFile(first).schema_arrow
            if not any(pa.types.is_floating(f.type) for f in schema):
                threshold = _STATS_DISTRIBUTE_MIN_FOOTER
        except Exception:
            pass  # unreadable first footer: keep the light threshold
    if spark is not None and len(rel_files) >= threshold:
        try:
            return _file_stats_distributed(spark, path, rel_files, bspec, sid)
        except Exception:
            # executor Python workers could not run the kernel — most
            # commonly the package is importable on the DRIVER only
            # (sys.path tweak without PYTHONPATH, so cloudpickle's
            # by-reference module import fails in the worker). The
            # sequential driver loop computes the identical result
            # (advice r16, low): correctness first, parallelism when
            # the environment allows it.
            pass
    return {
        rel: _stats_for_one_file(path, rel, bspec, sid) for rel in rel_files
    }


def _file_stats_distributed(
    spark: SparkSession,
    path: str,
    rel_files: list[str],
    bspec: dict,
    sid,
) -> dict[str, dict]:
    """The commit-stats pass as a Spark job: one row per written file,
    ``mapInPandas`` runs :func:`_stats_for_one_file` in the tasks, the
    driver collects {file → stats-JSON} (KB-scale). local-mode and
    cluster-mode alike: file paths must be visible to executors, which
    holds for any shared filesystem / object store the table lives
    on — the same assumption every read already makes."""
    import pandas as _pd

    cap = spark.sparkContext.defaultParallelism or 8

    def kernel(batches):
        for pdf in batches:
            rels = list(pdf["rel"])
            yield _pd.DataFrame(
                {
                    "rel": rels,
                    "stats_json": [
                        json.dumps(_stats_for_one_file(path, r, bspec, sid))
                        for r in rels
                    ],
                }
            )

    rows = (
        spark.createDataFrame([(r,) for r in rel_files], "rel string")
        .repartition(min(len(rel_files), cap))
        .mapInPandas(kernel, "rel string, stats_json string")
        .collect()
    )
    got = {r["rel"]: json.loads(r["stats_json"]) for r in rows}
    # manifest order follows the caller's file order, not task order
    return {rel: got.get(rel, {}) for rel in rel_files}


# target rows per parquet row group in the fused write kernel: arrow
# batches arrive at spark.sql.execution.arrow.maxRecordsPerBatch (10k)
# and writing each as its own row group would bloat footers and gut
# scan throughput; buffering to ~1M rows mirrors the JVM writer's
# 128 MB row-group buffer at comparable memory.
_FUSED_ROWGROUP_ROWS = 1 << 20


def _write_data_and_stats(
    df: DataFrame,
    path: str,
    version: int,
    max_records: int | None = None,
    bloom_spec: dict | None = None,
) -> tuple[list[str], dict[str, dict]]:
    """Write immutable data files AND their commit stats in ONE Spark
    job (round 17, VERDICT r16 task #3 — the Iceberg writer model
    completed): each task writes its partition's parquet itself and
    computes ``__nan`` flags + bloom bitmaps from the IN-MEMORY batches
    as it streams them out, so a data file is read ZERO times after
    being written. The pre-r17 shape (``_write_data`` then
    ``_file_stats``) re-opened every file — footers, float-column
    reads, per-distinct-value bloom hashing — roughly doubling commit
    I/O for bloom tables (measured 34.1 s full commit vs 13.2 s
    write-only at the 20M-row/64-file probe).

    The kernel routes every row through the Python boundary, which
    costs real wall on pure writes (measured: the 20M-row/64-file
    plain write is ~9 s JVM vs ~14 s fused — the arrow transfer is
    irreducible), so fusion engages only when the stats pass would
    otherwise RE-READ data expensively: when the write stamps bloom
    columns (per-distinct-value hashing + a column read per file).
    Footer/NaN-only commits keep the JVM writer and the (cheap)
    two-pass stats. ``OPFPG_FUSED_WRITE`` overrides for A/B:
    ``"0"`` never fuses, ``"always"`` fuses every write.

    Falls back to the legacy two-pass path when the fused kernel
    cannot run (executor workers unable to import the package, an
    arrow-incompatible column type): correctness first, fusion when
    the environment allows it. Either way the returned (files, stats)
    are byte-identical — pinned by
    tests/test_r17_lakehouse.py::test_fused_write_stats_match_repair_path."""
    spec = _table_spec(path)
    bspec = bloom_spec if bloom_spec is not None else spec.get("bloom") or {}
    sid = spec.get("spec_id")
    mode = os.environ.get("OPFPG_FUSED_WRITE", "auto")
    want_fused = (
        mode == "always"
        or (
            mode != "0"
            and any(c in df.columns for c in bspec.get("cols") or [])
        )
    )
    if want_fused:
        try:
            return _write_data_fused(df, path, version, max_records, bspec, sid)
        except CommitConflict:
            raise  # a racer's vN exists: data WAS written — never retry here
        except Exception as e:  # noqa: BLE001 — correctness-first fallback
            # The fallback is correct by construction, but SILENT it
            # would hide a kernel bug that doubles every bloom
            # commit's I/O at scale (VERDICT r17 "what's wrong" #3):
            # one warning per process names the cause.
            global _FUSED_FALLBACK_LOGGED
            if not _FUSED_FALLBACK_LOGGED:
                _FUSED_FALLBACK_LOGGED = True
                warnings.warn(
                    "fused write+stats kernel failed - falling back to "
                    f"the legacy two-pass write ({type(e).__name__}: "
                    f"{str(e)[:200]}); bloom commits now re-read their "
                    "files for stats (correct, but ~2x commit I/O)",
                    RuntimeWarning,
                    stacklevel=2,
                )
    files = _write_data(df, path, version, max_records=max_records)
    return files, _file_stats(
        path, files, bloom_spec=bloom_spec, spark=df.sparkSession
    )


def _write_data_fused(
    df: DataFrame,
    path: str,
    version: int,
    max_records: int | None,
    bspec: dict,
    sid,
) -> tuple[list[str], dict[str, dict]]:
    """The fused kernel behind :func:`_write_data_and_stats`.

    Layout contract: file names are ``part-<pid:05d>-<uuid>-c<seq:03d>
    .parquet`` with the task's PARTITION id as the part number and one
    shared per-write uuid — exactly the convention
    :func:`_stamp_buckets` fail-closes on, so bucket stamping works
    unchanged. Names are deterministic per (write, partition, split):
    a task retry rewrites the same files (tmp + os.replace per file,
    so a speculative twin never interleaves bytes), and
    ``maxRecordsPerFile``-style splits are cut by the kernel itself at
    ``max_records`` rows. Timestamps ride arrow's µs representation
    into TIMESTAMP_MICROS physical parquet — the same choice
    ``_write_data`` forces via ``spark.sql.parquet.outputTimestampType``
    (INT96 would strip min/max stats from every timestamp column).

    Concurrency is the staging protocol of :func:`_write_data`
    verbatim: tasks write into a writer-unique staging directory
    (bloom sidecar blobs ride adjacent to their data files) and the
    driver's atomic rename is the race arbiter."""
    import uuid as _uuid

    spark = df.sparkSession
    data_root = pathlib.Path(path) / _DATA_DIR
    ddir = data_root / f"v{version:08d}"
    stage = data_root / f".v{version:08d}.staging.{_uuid.uuid4().hex}"
    stage.mkdir(parents=True, exist_ok=True)
    stage_s = str(stage)
    uid = str(_uuid.uuid4())
    bspec_ser = {
        "cols": list(bspec.get("cols") or []),
        "bits": bspec.get("bits"),
        "k": bspec.get("k"),
    }
    sid_i = int(sid) if sid else None
    max_rec = int(max_records) if max_records is not None else None

    def kernel(batches):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        out_rel: list[str] = []
        out_js: list[str] = []
        # per-open-file state
        st = {"w": None, "name": None, "rows": 0, "seq": 0,
              "nan": {}, "bsets": {}, "buf": [], "bufrows": 0,
              "fcols": [], "bcols": []}

        def open_file(schema):
            st["name"] = f"part-{pid:05d}-{uid}-c{st['seq']:03d}.parquet"
            st["w"] = pq.ParquetWriter(
                os.path.join(stage_s, f".{st['name']}.tmp"),
                schema,
                compression="snappy",
            )
            st["rows"] = 0
            st["fcols"] = [
                f.name for f in schema if pa.types.is_floating(f.type)
            ]
            st["bcols"] = [
                c for c in bspec_ser["cols"] if c in schema.names
            ]
            st["nan"] = dict.fromkeys(st["fcols"], False)
            st["bsets"] = {c: set() for c in st["bcols"]}

        def flush_rowgroup():
            if st["bufrows"]:
                st["w"].write_table(pa.Table.from_batches(st["buf"]))
                st["buf"], st["bufrows"] = [], 0

        def close_file():
            flush_rowgroup()
            w = st["w"]
            st["w"] = None
            w.close()
            abs_f = os.path.join(stage_s, st["name"])
            os.replace(os.path.join(stage_s, f".{st['name']}.tmp"), abs_f)
            meta = pq.ParquetFile(abs_f).metadata
            # identical stats recipe to _stats_for_one_file, with the
            # data-dependent parts (__nan, bloom sets) taken from the
            # in-memory batches instead of a re-read
            stats, float_cols = _footer_range_stats(meta)
            if float_cols:
                stats["__nan"] = {
                    c: bool(st["nan"].get(c, False)) for c in float_cols
                }
            if st["bcols"] and meta.num_rows:
                entries = _bloom_entries_from_sets(
                    {c: st["bsets"][c] for c in st["bcols"]},
                    bspec_ser,
                    abs_f + _BLOOM_BLOB_SUFFIX,
                )
                if entries:
                    stats["__bloom"] = entries
            if sid_i:
                stats["__spec"] = sid_i
            out_rel.append(st["name"])
            out_js.append(json.dumps(stats))
            st["seq"] += 1

        def accumulate(b):
            for c in st["fcols"]:
                if not st["nan"][c]:
                    st["nan"][c] = bool(
                        pc.any(
                            pc.is_nan(b.column(b.schema.get_field_index(c))),
                            min_count=0,
                        ).as_py()
                    )
            for c in st["bcols"]:
                i = b.schema.get_field_index(c)
                _bloom_canon_add(
                    st["bsets"][c], b.column(i), b.schema.field(i).type
                )
            st["buf"].append(b)
            st["bufrows"] += b.num_rows
            st["rows"] += b.num_rows
            if st["bufrows"] >= _FUSED_ROWGROUP_ROWS:
                flush_rowgroup()

        for b in batches:
            while b.num_rows:
                if st["w"] is None:
                    open_file(b.schema)
                take = b.num_rows
                if max_rec is not None:
                    take = min(take, max_rec - st["rows"])
                part = b if take == b.num_rows else b.slice(0, take)
                accumulate(part)
                b = b.slice(take)
                if max_rec is not None and st["rows"] >= max_rec:
                    close_file()
        if st["w"] is not None:
            close_file()
        if out_rel:
            yield pa.record_batch(
                {
                    "rel": pa.array(out_rel, pa.string()),
                    "stats_json": pa.array(out_js, pa.string()),
                }
            )

    # bigger arrow batches amortize the per-batch boundary cost
    # (measured: 20M rows cross in ~7 s at the 10k default vs ~4 s at
    # 512k); the byte cap (Spark 4) keeps wide binary rows from
    # inflating a batch past worker memory
    _batch_confs = {
        "spark.sql.execution.arrow.maxRecordsPerBatch": "131072",
        "spark.sql.execution.arrow.maxBytesPerBatch": str(64 << 20),
    }
    prev_confs: dict[str, str | None] = {}
    for ck, cv in _batch_confs.items():
        try:
            prev_confs[ck] = spark.conf.get(ck, None)
            spark.conf.set(ck, cv)
        except Exception:
            pass  # conf not in this Spark version
    try:
        rows = df.mapInArrow(kernel, "rel string, stats_json string").collect()
        stats_by_name = {r["rel"]: json.loads(r["stats_json"]) for r in rows}
        if not stats_by_name:
            # zero rows written: Spark's writer emits ONE schema-only
            # file for an empty frame so the version stays readable —
            # replicate (e.g. a delete that empties the table)
            import pyarrow.parquet as pq

            name = f"part-00000-{uid}-c000.parquet"
            pq.write_table(
                df.limit(0).toArrow(), os.path.join(stage_s, name),
                compression="snappy",
            )
            stats_by_name[name] = _stats_for_one_file(
                stage_s, name, bspec_ser, sid_i
            )
    except Exception:
        shutil.rmtree(stage, ignore_errors=True)
        raise
    finally:
        for ck, pv in prev_confs.items():
            if pv is None:
                spark.conf.unset(ck)
            else:
                spark.conf.set(ck, pv)
    _publish_stage(stage, ddir, path, version)
    rel_files: list[str] = []
    stats: dict[str, dict] = {}
    for f in sorted(ddir.glob("*.parquet")):
        r = str(f.relative_to(path))
        rel_files.append(r)
        stats[r] = stats_by_name.get(f.name, {})
    return rel_files, stats


def _footer_range_stats(meta) -> tuple[dict, list[str]]:
    """Per-column [min, max] from a parquet FOOTER plus ``__rows`` —
    the part of the stats that only the written file's row-group
    statistics can provide (no data scan either way). Returns
    (stats, float_cols); float columns need the companion ``__nan``
    flag before their ranges are trustworthy."""
    import pyarrow as pa

    stats: dict = {}
    schema = meta.schema.to_arrow_schema()
    float_cols: list[str] = []
    for ci in range(meta.num_columns):
        col = meta.schema.column(ci)
        if "." in col.path:
            continue  # nested field — no file-level scalar range
        name = col.path
        typ = schema.field(name).type
        if not (
            pa.types.is_integer(typ)
            or pa.types.is_floating(typ)
            or pa.types.is_string(typ)
            or pa.types.is_large_string(typ)
            or pa.types.is_date(typ)
            or pa.types.is_timestamp(typ)
            or pa.types.is_boolean(typ)
        ):
            continue
        if pa.types.is_floating(typ):
            float_cols.append(name)
        lo = hi = None
        ok = True
        for rg in range(meta.num_row_groups):
            s = meta.row_group(rg).column(ci).statistics
            if s is None or not s.has_min_max:
                ok = False
                break
            mn, mx = s.min, s.max
            lo = mn if lo is None or mn < lo else lo
            hi = mx if hi is None or mx > hi else hi
        if ok and lo is not None:
            if pa.types.is_date(typ) or pa.types.is_timestamp(typ):
                # ISO strings: lexicographic == chronological.
                # Timestamp stats come back tz-aware (parquet
                # marks them adjusted-to-UTC); drop to naive
                # UTC so they compare cleanly against naive
                # probe values (_stat_probe) — a trailing
                # '+00:00' would break the <=/>= boundary.
                lo, hi = _iso_naive(lo), _iso_naive(hi)
            stats[name] = [lo, hi]
    if "__rows" not in stats:
        # footer row count (Iceberg record_count): lets a
        # mask-free COUNT(*) answer from the manifest alone
        stats["__rows"] = meta.num_rows
    return stats, float_cols


def _nan_flags_of(table, float_cols: list[str]) -> dict[str, bool]:
    """Per-file NaN flags (round 15, VERDICT r14 task #5 — the Iceberg
    nan_value_counts shape): parquet footer min/max EXCLUDE NaN while
    Spark and DuckDB order NaN above every value, so float range stats
    are only trustworthy when the file provably holds none. Computed
    from an in-memory arrow table — the just-written batch in the
    fused write path, a column read in the repair path; readers treat
    a missing flag as NaN-unknown (prune fail-open, minmax
    fail-closed)."""
    import pyarrow.compute as pc

    return {
        c: bool(
            pc.any(pc.is_nan(table.column(c)), min_count=0).as_py()
        )
        for c in float_cols
    }


def _bloom_entries_of(
    table, bcols: list[str], bspec: dict, blob_abs_path: str
) -> dict | None:
    """Build the per-column bloom bitmaps from an in-memory arrow
    table, write them to the file's SIDECAR BLOB (round 17, VERDICT
    r16 task #2 — the Iceberg puffin shape: inlining base64 bitmaps in
    the single-JSON manifest made every reader parse O(files ×
    bloom-cols × up-to-700KB) on EVERY read; the manifest now carries
    only (off, len, m, k) per column and readers load a blob slice
    lazily, only for probed columns on files that survive range
    pruning), and return the manifest entries — or None when every
    column is empty/saturated (fail-open).

    The blob lives ADJACENT to its data file (<file>.bloom): the
    lifecycle contract — vacuum strips it with the file, clones remap
    it by the same file key, carried-forward files keep the path
    valid. Written atomically (tmp + rename); a commit retry rewrites
    identical bytes, so the replace is idempotent."""
    sets: dict[str, set] = {}
    for c in bcols:
        acc: set = set()
        _bloom_canon_add(acc, table.column(c), table.schema.field(c).type)
        sets[c] = acc
    return _bloom_entries_from_sets(sets, bspec, blob_abs_path)


def _bloom_canon_add(acc: set, column, ctyp) -> None:
    """Add an arrow column's non-null values to ``acc``, canonicalized
    to the bloom hash domain: date → epoch days, timestamp → epoch µs
    (round 17 — the probe side ``_bloom_probe_value`` hashes the same
    integers, making str() a bijection for temporal keys exactly as it
    is for int/string ones); everything else as-is. Shared by the
    whole-table builder and the fused write kernel's per-batch
    accumulation."""
    import pyarrow as pa

    from optimal_parallel_fp_growth_spark.functions.spark_hash import (
        canon_date_days,
        canon_ts_micros,
    )

    vals = (v for v in column.to_pylist() if v is not None)
    if pa.types.is_date(ctyp):
        acc.update(
            d for d in (canon_date_days(v) for v in vals) if d is not None
        )
    elif pa.types.is_timestamp(ctyp):
        acc.update(
            u for u in (canon_ts_micros(v) for v in vals) if u is not None
        )
    else:
        acc.update(vals)


def _bloom_entries_from_sets(
    vals_by_col: dict[str, set], bspec: dict, blob_abs_path: str
) -> dict | None:
    """Assemble the manifest bloom entries + sidecar blob from already
    canonicalized per-column distinct-value sets (the tail half of
    :func:`_bloom_entries_of`, shared verbatim with the fused write
    kernel so both paths produce byte-identical blobs)."""
    bits_spec = bspec.get("bits") or _BLOOM_DEFAULT_BITS
    kk = int(bspec.get("k") or _BLOOM_K)
    blooms: dict[str, bytes] = {}
    widths: dict[str, int] = {}
    for c, vals in vals_by_col.items():
        # bits="auto" (round 16, VERDICT r15 task #4): derive the
        # width from THIS file's actual distinct count — a frozen
        # default silently saturates once files outgrow it (the
        # 10×-gate lesson); the per-entry "m" the reader probes
        # with rides in the manifest, so widths may vary
        # file-to-file and commit-to-commit.
        m = (
            bloom_bits_for(len(vals))
            if bits_spec == "auto"
            else int(bits_spec)
        )
        if not vals or len(vals) > m // 8:
            continue  # empty or saturated: fail-open
        # new bitmaps build with the v2 single-digest positions
        # (1 md5 per value instead of k); the "v" stamp below keeps
        # probes on the matching function per entry
        blooms[c] = _bloom_of_values(vals, m, kk, version=2)
        widths[c] = m
    if not blooms:
        return None
    entries: dict[str, dict] = {}
    blob = bytearray()
    for c in sorted(blooms):
        entries[c] = {
            "off": len(blob),
            "len": len(blooms[c]),
            "m": widths[c],
            "k": kk,
            "v": 2,
        }
        blob += blooms[c]
    bp = blob_abs_path
    tmp = f"{bp}.tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(bytes(blob))
    os.replace(tmp, bp)
    return entries


def _stats_for_one_file(path: str, rel: str, bspec: dict, sid) -> dict:
    """Footer ranges + ``__rows``/``__nan``/``__bloom``/``__spec`` for
    ONE data file — pure function of (file, bloom spec, spec era), so
    the driver loop and the distributed job share it verbatim. This is
    the REPAIR/COMPAT path that re-opens the file; the fused write
    kernel (:func:`_write_data_and_stats`) computes the same stats
    from the in-memory batch at write time and never re-reads."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    stats: dict = {}
    try:
        abs_path = str(pathlib.Path(path) / rel)
        meta = pq.ParquetFile(abs_path).metadata
        schema = meta.schema.to_arrow_schema()
        stats, float_cols = _footer_range_stats(meta)
        if float_cols and meta.num_rows:
            cols = pq.read_table(abs_path, columns=float_cols)
            stats["__nan"] = _nan_flags_of(cols, float_cols)
        elif float_cols:
            stats["__nan"] = {c: False for c in float_cols}
        bcols = [
            c for c in (bspec.get("cols") or []) if c in schema.names
        ]
        if bcols and meta.num_rows:
            cols = pq.read_table(abs_path, columns=[c for c in bcols])
            entries = _bloom_entries_of(
                cols, bcols, bspec, abs_path + _BLOOM_BLOB_SUFFIX
            )
            if entries:
                stats["__bloom"] = entries
        if sid:
            # spec-era stamp (round 15): which partition-spec era
            # this file was written under. Stamped from the SAME
            # _table.json the writer laid the file out by, so the
            # stamp describes what actually happened even in the
            # evolve-commit→spec-file crash window; readers resolve
            # it against the manifest's specs registry. Absent
            # (pre-evolution / never-evolved) means era 0.
            stats["__spec"] = int(sid)
    except (OSError, pa.ArrowException):
        # unreadable/corrupt footer → file stays unprunable, not
        # broken. Programming errors must NOT be swallowed here —
        # a silent {} turns every prune into a full scan (this
        # exact failure shipped once via a pyarrow API rename).
        stats = {}
    return stats


def table_rowcount(path: str, version: int | None = None) -> int:
    """COUNT(*) answered from manifest metadata alone — zero data I/O
    (the Iceberg ``record_count`` shape; at 100 TB a count should cost
    one manifest read, not a scan). Fails CLOSED with ``ValueError``
    whenever metadata cannot be exact: delete sidecars present (masked
    rows are invisible to footer counts — the sequence rule means the
    sidecar's own size is not the masked count either) or any file
    recorded without a footer count (pre-r12 manifest / corrupt
    footer). Callers fall back to ``read_table(...).count()``."""
    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"no versioned table at {path}")
    v = vs[-1] if version is None else version
    if v not in vs:
        raise FileNotFoundError(f"version {v} not in {vs}")
    man = _load_manifest(path, v)
    if man.get("delete_files"):
        raise ValueError(
            f"version {v} of {path} carries merge-on-read delete masks - "
            "metadata rowcounts cannot see masked rows; use "
            "read_table(...).count()"
        )
    fstats = man.get("file_stats") or {}
    total = 0
    for f in man["files"]:
        n = (fstats.get(f) or {}).get("__rows")
        if not isinstance(n, int):
            raise ValueError(
                f"file {f} of {path}@v{v} has no footer rowcount recorded "
                "(pre-rowcount manifest or unreadable footer); use "
                "read_table(...).count()"
            )
        total += n
    return total


def _schema_fields(df: DataFrame) -> list[list[str]]:
    return [[f.name, f.dataType.simpleString()] for f in df.schema.fields]


def _check_schema(df: DataFrame, path: str, version: int) -> None:
    """Appends/merges must be a NAME-MATCHED SUBSET of the table schema
    (Iceberg's writer contract, pinned round 8): the batch may omit
    table columns (readers fill typed nulls via
    :func:`_align_to_schema`, exactly as they do for files written
    before a column evolved in) and column order is irrelevant
    (identity is the name), but a column the table lacks or a type
    change on a shared column is rejected — a renamed column shows up
    as omit+add and still fails loudly, so a silently divergent append
    cannot poison later reads. Overwrite resets the schema;
    ``append_table(evolve=True)`` additionally permits NEW columns via
    :func:`_merge_schema`."""
    want = _load_manifest(path, version).get("schema")
    if want is None:
        return  # pre-schema manifest: nothing to enforce
    got = _schema_fields(df)
    want_types = {n: t for n, t in want}
    problems = []
    # duplicate batch column names would each pass the per-column
    # subset checks below and only blow up later inside the Spark
    # write/union with an opaque error — reject them here by name
    names = [n for n, _ in got]
    for n in sorted({n for n in names if names.count(n) > 1}):
        problems.append(f"batch column {n!r} appears {names.count(n)} times")
    for n, t in got:
        if n not in want_types:
            problems.append(f"batch column {n!r} not in table")
        elif want_types[n] != t:
            problems.append(
                f"column {n!r} type {t} != table type {want_types[n]}"
            )
    if problems:
        raise ValueError(
            f"append schema mismatch at {path}: table has {want}, "
            f"append has {got} ({'; '.join(problems)}; use "
            "overwrite_table to change schema, or "
            "append_table(evolve=True) for additive evolution)"
        )


def _merge_schema(
    want: list[list[str]],
    got: list[list[str]],
    man: dict | None = None,
) -> list[list[str]]:
    """Iceberg-style ADDITIVE schema evolution, name-matched: columns
    shared by table and append must agree on type (a silent type
    change corrupts every reader); append-only columns join the schema
    at the end; table columns missing from the append stay (old AND
    new files simply lack some columns — reads fill nulls). Column
    order in the append is irrelevant: identity is the NAME."""
    want_types = {n: t for n, t in want}
    if man is not None:
        graveyard = (
            {a for a, _ in man.get("renames") or []}
            | {b for _, b in man.get("renames") or []}
            | set(man.get("dropped") or [])
        ) - set(want_types)
        clash = sorted({n for n, _ in got} & graveyard)
        if clash:
            raise ValueError(
                f"evolve append re-adds historical column name(s) "
                f"{clash}: name reuse would resurrect old files' bytes "
                "(pick fresh names)"
            )
    for n, t in got:
        if n in want_types and want_types[n] != t:
            raise ValueError(
                f"schema evolution cannot change column {n!r} from "
                f"{want_types[n]} to {t} (only adding columns is allowed)"
            )
    return [list(f) for f in want] + [
        [n, t] for n, t in got if n not in want_types
    ]


def _align_to_schema(
    df: DataFrame,
    schema: list[list[str]],
    renames: list[list[str]] | None = None,
) -> DataFrame:
    """Project ``df`` to the manifest schema: columns in manifest
    order, absent ones as typed nulls — how a reader sees files
    written before a column existed.

    ``renames`` is the manifest's rename chain (round-14 schema
    evolution): a logical column renamed at version R is physically
    named by its OLD name in files written before R, so the logical
    value is the COALESCE over the column's name history restricted
    to names the merged read actually surfaced. Sound because (a) a
    file carries exactly ONE physical name per logical column, so at
    most one alias is non-null per row, and (b) name REUSE is banned
    at DDL time (the ``dropped`` graveyard + chain-membership checks)
    — no physical name can ever mean two different logical columns."""
    from pyspark.sql import functions as F

    have = set(df.columns)
    ancestors: dict[str, list[str]] = {}
    if renames:
        rev = {to: frm for frm, to in renames}
        for n, _ in schema:
            chain = []
            cur = n
            while cur in rev:
                cur = rev[cur]
                chain.append(cur)
            if chain:
                ancestors[n] = chain
    cols = []
    for n, t in schema:
        names = [c for c in [n, *ancestors.get(n, [])] if c in have]
        if not names:
            cols.append(F.lit(None).cast(t).alias(n))
        elif len(names) == 1:
            cols.append(F.col(names[0]).cast(t).alias(n))
        else:
            cols.append(
                F.coalesce(*[F.col(c) for c in names]).cast(t).alias(n)
            )
    return df.select(*cols)


def _commit(
    path: str,
    version: int,
    files: list[str],
    op: str,
    schema: list[list[str]] | None = None,
    file_stats: dict[str, dict] | None = None,
    delete_files: list[dict] | None = None,
    renames: list[list[str]] | None = None,
    dropped: list[str] | None = None,
    txn: tuple[str, int] | None = None,
    specs: dict | None = None,
    spec_id: int | None = None,
    txns: dict | None = None,
) -> int:
    """Atomically birth ``version`` via an ATOMIC-CREATE-EXCLUSIVE
    primitive; raises FileExistsError on a concurrent commit of the
    same version (the caller retries on a fresh snapshot).

    ``os.link(tmp, target)`` fails with EEXIST if the target exists —
    unlike ``os.rename``, which silently REPLACES on POSIX, so an
    exists()-then-rename sequence would let two concurrent writers
    both "win" and one manifest be lost (TOCTOU). The exists() check
    below is kept only as a fast path; the link is the guarantee. On
    object stores, swap for conditional-put (If-None-Match)."""
    # Reject unparseable file paths at COMMIT time: readers derive the
    # merge-on-read sequence number from the path via an inline
    # regexp_extract whose failure mode is a silent NULL (row kept
    # unmasked), so a malformed path must never reach a manifest.
    for rel in list(files) + [e["file"] for e in (delete_files or [])]:
        _seq_of(rel)
    mdir = pathlib.Path(path) / _MANIFEST_DIR
    mdir.mkdir(parents=True, exist_ok=True)
    # the rename chain, dropped-name graveyard (round-14 schema
    # evolution) and streaming-txn watermark map (round 15) are
    # LOAD-BEARING — renames/dropped for reading pre-rename files, txns
    # for exactly-once replay detection — so they ride IN the manifest:
    # atomic with the commit, never a sidecar property a crash could
    # decouple. Writers don't thread them: each commit inherits its
    # predecessor's unless the DDL (or the stamping writer) overrides.
    try:
        prev = _load_manifest(path, version - 1) if version > 1 else {}
    except FileNotFoundError:
        prev = {}  # first commit of a clone lands mid-sequence
    if renames is None:
        renames = prev.get("renames") or []
    if dropped is None:
        dropped = prev.get("dropped") or []
    # ``txns=`` overrides inheritance for the one commit with no
    # predecessor to inherit from — a clone's first manifest (round
    # 16, advice r15): dropping the source's watermark map would let
    # a checkpointed stream repointed at a DR fork re-commit a
    # replayed epoch.
    txns = dict(txns if txns is not None else prev.get("txns") or {})
    if txn is not None:
        app_id, epoch = txn
        txns[str(app_id)] = int(epoch)
    # partition-spec registry (round 15, the Iceberg spec-evolution
    # shape): the append-only {spec_id: layout} map plus the CURRENT
    # id, inherited like the rename chain; evolve_table_spec extends
    # it, every other commit carries it forward. Only materialized
    # once a table has evolved (never-evolved manifests stay lean and
    # readers fall back to the table-level spec for every file).
    if specs is None:
        specs = prev.get("specs")
        if spec_id is None:
            spec_id = prev.get("spec_id")
    manifest = {
        "version": version,
        "op": op,
        "files": files,
        "schema": schema,
        "file_stats": file_stats or {},
        "delete_files": delete_files or [],
        "renames": renames,
        "dropped": dropped,
        "txns": txns,
        "committed_at": time.time(),
    }
    if specs:
        manifest["specs"] = specs
        manifest["spec_id"] = int(spec_id or 0)
    tmp = mdir / f".v{version:08d}.json.tmp.{os.getpid()}"
    tmp.write_text(json.dumps(manifest, indent=1))
    target = _manifest_path(path, version)
    if target.exists():
        tmp.unlink()
        raise CommitConflict(f"version {version} already committed at {path}")
    try:
        os.link(tmp, target)  # atomic: EEXIST if a racer got there first
    except FileExistsError:
        raise CommitConflict(
            f"version {version} already committed at {path}"
        ) from None
    finally:
        tmp.unlink(missing_ok=True)
    return version


_TABLE_META = "_table.json"


def _table_spec(path: str) -> dict:
    p = pathlib.Path(path) / _TABLE_META
    if not p.is_file():
        return {}
    return json.loads(p.read_text())


def _write_table_spec(path: str, spec: dict) -> None:
    p = pathlib.Path(path) / _TABLE_META
    p.parent.mkdir(parents=True, exist_ok=True)
    tmp = p.parent / f".{_TABLE_META}.tmp.{os.getpid()}"
    tmp.write_text(json.dumps(spec, indent=1))
    os.replace(tmp, p)


_CLUSTER_KINDS = ("range", "zorder")


def _cluster(
    df: DataFrame, cluster_by: list[str], n_files: int, kind: str = "range"
) -> DataFrame:
    missing = [c for c in cluster_by if c not in df.columns]
    if missing:
        raise ValueError(f"cluster_by columns not in table: {missing}")
    n = max(int(n_files), 1)
    if kind == "zorder":
        # Morton-interleave clustering (round 13, the Delta OPTIMIZE
        # ZORDER shape as a recorded property): EVERY listed column's
        # per-file range comes out narrow, so multi-predicate pruning
        # bites on any dimension — a linear range sort only clusters
        # its leading key. The codegen key lives in sinks.zorder_key.
        from optimal_parallel_fp_growth_spark.sources.sinks import (
            zorder_key,
        )

        z = zorder_key(df, tuple(cluster_by))
        return (
            df.withColumn("__zc", z)
            .repartitionByRange(n, "__zc")
            .sortWithinPartitions("__zc")
            .drop("__zc")
        )
    return df.repartitionByRange(n, *cluster_by).sortWithinPartitions(
        *cluster_by
    )


def _spec_cluster(path: str) -> tuple[list[str] | None, str]:
    """The recorded (cluster columns, cluster kind) of a table."""
    spec = _table_spec(path)
    return spec.get("cluster_by"), spec.get("cluster_kind", "range")


def _spec_bucket(path: str) -> tuple[str | None, int]:
    """The recorded (bucket column, bucket count) of a hash-bucketed
    table (round 13), or (None, 0)."""
    b = _table_spec(path).get("bucket_by") or {}
    return b.get("col"), int(b.get("n", 0))


def _spec_bucket_sort(path: str) -> tuple[list[str], int | None]:
    """The recorded within-bucket sort order and target rows-per-file
    of a sorted-bucket table (round 14), or ([], None)."""
    b = _table_spec(path).get("bucket_by") or {}
    rows = b.get("rows")
    return list(b.get("sort") or []), (int(rows) if rows else None)


def _bucket_df(
    df: DataFrame, bn: int, bcol: str, sort_cols: list[str]
) -> DataFrame:
    """Apply the bucket layout to a write: hash-repartition into the
    bucket count, then (sorted-bucket tables) sort each bucket's
    partition on the recorded order so ``maxRecordsPerFile`` splits
    land as contiguous narrow slices of the sort column."""
    df = df.repartition(int(bn), bcol)
    if sort_cols:
        df = df.sortWithinPartitions(*sort_cols)
    return df


def _stamp_buckets(
    stats: dict, files: list[str], n: int, allow_splits: bool = False
) -> dict:
    """Record which hash bucket each just-written file IS: under
    ``df.repartition(n, col)`` the part-file number is the task's
    partition id, and HashPartitioning's partition id is
    ``pmod(murmur3(key), n)`` — the exact function
    ``functions/spark_hash.py`` reimplements and
    ``test_spark_hash.py`` pins against Spark. Mutates and returns
    ``stats``.

    FAIL-CLOSED (VERDICT r13 task #3): the part-number convention is
    exactly "one ``c000`` file per shuffle partition, index < n". If
    the written set deviates in ANY way — an unparsable name, a task
    that emitted multiple files (``cNNN`` > 000, e.g. a
    ``maxRecordsPerFile`` split), a duplicate index, an index ≥ n, or
    more files than buckets — NO file gets a bucket stamp.
    ``_file_passes`` treats a missing ``__bucket`` as unprunable, so
    a violated convention costs pruning, never correctness: a wrong
    bucket stamp is impossible by construction.

    ``allow_splits`` (round 14, the sorted-bucket layout): a
    sorted-bucket write DELIBERATELY splits each bucket's sorted task
    output into ``cNNN`` files via ``maxRecordsPerFile`` — the part
    index is still the shuffle partition id (empirically pinned in
    test_bucketed_table.py), so every split of task i IS bucket i.
    The guard then requires each index's splits to come from ONE task
    attempt (same job uuid) with distinct, zero-based contiguous
    ``cNNN`` — interleaved files from a second job stamp nothing."""
    import re

    seen: dict[str, tuple[int, str, int]] = {}
    for f in files:
        m = re.fullmatch(
            r"part-(\d+)-([0-9a-f-]+)[.-]c(\d+)(\..*)?", pathlib.Path(f).name
        )
        if m is None:
            return stats  # unknown naming: stamp nothing
        idx, uid, cseq = int(m.group(1)), m.group(2), int(m.group(3))
        if idx >= n:
            return stats  # overflow: stamp nothing
        seen[f] = (idx, uid, cseq)
    by_idx: dict[int, list[tuple[str, int]]] = {}
    for idx, uid, cseq in seen.values():
        by_idx.setdefault(idx, []).append((uid, cseq))
    for idx, parts in by_idx.items():
        if not allow_splits and (len(parts) > 1 or parts[0][1] != 0):
            return stats  # split task / duplicate: stamp nothing
        if len({u for u, _ in parts}) > 1:
            return stats  # two jobs' files interleaved: stamp nothing
        if sorted(c for _, c in parts) != list(range(len(parts))):
            return stats  # gap or duplicate cNNN: stamp nothing
    for f, (idx, _, _) in seen.items():
        if f in stats:
            stats[f]["__bucket"] = idx
    return stats


# the key types whose Spark hash the manifest math reproduces and
# whose bloom canonicalization is a bijection. date/timestamp joined
# in round 17 (VERDICT r16 task #4) via epoch-day/epoch-µs
# canonicalization (functions/spark_hash.py::canon_date_days /
# canon_ts_micros) shared by writer stamps, bucket probes and bloom
# probes — a date-partitioned corpus (the most common 100 TB layout)
# can now bloom- and bucket-skip on its natural key.
_BUCKETABLE_TYPES = (
    "tinyint", "smallint", "int", "bigint", "string", "date", "timestamp",
)


_BLOOM_DEFAULT_BITS = 1 << 14  # 16 Kbit ≈ 2.7 KB base64 per file/col
_BLOOM_K = 6


def bloom_bits_for(
    n_per_file: int,
    bits_per_value: int = 10,
    min_bits: int = _BLOOM_DEFAULT_BITS,
    max_bits: int = 1 << 22,
) -> int:
    """Bitmap width for ~``n_per_file`` distinct values per file:
    ≥ ``bits_per_value`` bits each (fpp ≈ 0.8% at k=6), rounded up to
    a power of two — the ``ann_bits_for``/``kmeans_k_for`` recipe
    applied to manifest blooms. The commit-time saturation guard
    stores NOTHING under 8 bits/value, so a frozen width silently
    forfeits skipping once files outgrow it (exactly what the 10×
    gate check caught); derive the width from the expected per-file
    distinct count instead. ``max_bits`` (4 Mbit = 512 KB raw) bounds
    each PER-FILE SIDECAR BLOB (round 17: bitmaps live next to their
    data file, never inline in the manifest, so the manifest stays
    KB-scale at any file count — the worst case is one 512 KB blob
    slice per bloom column per file, loaded lazily and only for
    probed files that survive range pruning); past it, prefer more
    files or a bucket layout."""
    need = max(int(n_per_file), 1) * bits_per_value
    m = int(min_bits)
    while m < need and m < max_bits:
        m <<= 1
    return m


def _check_bloom_bits(bits) -> int | str:
    """Validate a ``bloom_bits`` spec value: the literal ``"auto"``
    (commit derives each file's width from its actual distinct count
    via :func:`bloom_bits_for` — the default since round 16, because a
    frozen width silently saturates once files outgrow it) or an
    explicit width ≥ 64."""
    if bits == "auto":
        return "auto"
    if int(bits) < 64:
        raise ValueError("bloom_bits must be >= 64 (or 'auto')")
    return int(bits)


def _bloom_positions(value, m_bits: int, k: int) -> list[int]:
    """k deterministic bit positions for a probe value — pure python
    (hashlib md5, the engine-common hash family), identical on the
    build (pyarrow column values) and probe (prune predicate) sides.
    Values compare through ``str()``: bloom columns are restricted to
    int/string types, where str() is a bijection on both sides."""
    import hashlib as _hashlib

    s = str(value)
    return [
        int(
            _hashlib.md5(f"bloom:{i}:{s}".encode()).hexdigest()[:16], 16
        ) % m_bits
        for i in range(k)
    ]


def _bloom_positions_v2(value, m_bits: int, k: int) -> list[int]:
    """k positions from ONE md5 digest via Kirsch–Mitzenmacher double
    hashing: ``h_i = (h1 + i·h2) mod m`` with h1/h2 the digest's two
    64-bit halves (h2 forced odd so the stride never degenerates).
    Same fpp guarantees as k independent hashes, 1/k-th the hashing
    cost — the commit-time bitmap build was 6 md5 calls per distinct
    value and measured ~2.5-3 s/file at the 20M-row/64-file probe
    (guide §4.2: make the per-task work cheap once the job shape is
    right). Each manifest entry records which position function built
    its bitmap (``"v": 2``; absent = v1), so pre-r17 blobs keep
    probing with the function that built them — mixing would turn
    false-negative prunes into lost rows."""
    import hashlib as _hashlib

    d = _hashlib.md5(f"bloom:{value}".encode()).digest()
    h1 = int.from_bytes(d[:8], "big")
    h2 = int.from_bytes(d[8:], "big") | 1
    return [(h1 + i * h2) % m_bits for i in range(k)]


def _positions_fn(entry_or_v):
    """The position function for a bloom entry (or a version int)."""
    v = (
        entry_or_v
        if isinstance(entry_or_v, int)
        else int(entry_or_v.get("v") or 1)
    )
    return _bloom_positions_v2 if v >= 2 else _bloom_positions


def _bloom_of_values(
    values, m_bits: int, k: int, version: int = 1
) -> bytes:
    pos = _positions_fn(version)
    bits = bytearray((m_bits + 7) // 8)
    for v in values:
        for p in pos(v, m_bits, k):
            bits[p >> 3] |= 1 << (p & 7)
    return bytes(bits)


_BLOOM_BLOB_SUFFIX = ".bloom"


def _bloom_blob_path(path: str, file_key: str) -> str:
    """The sidecar blob adjacent to a manifest data-file key — table-
    relative keys resolve under ``path``; absolute keys (shallow-clone
    references) resolve as-is, so a clone probes the SOURCE's blobs."""
    p = (
        pathlib.Path(file_key)
        if os.path.isabs(file_key)
        else pathlib.Path(path) / file_key
    )
    return str(p) + _BLOOM_BLOB_SUFFIX


def _bloom_entry_bits(
    entry_col: dict, blob_path: str | None, cache: dict | None = None
) -> bytes | None:
    """The bitmap bytes for one (file, column) bloom entry — a lazy
    ranged read of the per-file sidecar blob (only the probed column's
    slice, only for files that survived range pruning), memoized in
    ``cache`` for the duration of one prune pass. Legacy manifests
    (pre-r17) inlined base64 bitmaps; those decode in place. A
    missing/truncated blob returns None and the caller fails OPEN —
    a kept file is never a wrong answer."""
    if "b64" in entry_col:
        import base64 as _b64

        return _b64.b64decode(entry_col["b64"])
    if blob_path is None:
        return None
    off, ln = int(entry_col["off"]), int(entry_col["len"])
    key = (blob_path, off, ln)
    if cache is not None and key in cache:
        return cache[key]
    bits = None
    try:
        with open(blob_path, "rb") as fh:
            fh.seek(off)
            b = fh.read(ln)
        if len(b) == ln:
            bits = b
    except OSError:
        bits = None
    if cache is not None:
        cache[key] = bits
    return bits


def _bloom_may_contain(
    entry_col: dict,
    value,
    blob_path: str | None = None,
    cache: dict | None = None,
) -> bool:
    bits = _bloom_entry_bits(entry_col, blob_path, cache)
    if bits is None:
        return True  # blob unavailable: fail-open
    m, k = int(entry_col["m"]), int(entry_col["k"])
    # probe with the position function that BUILT this entry's bitmap
    # ("v" in the entry; absent = v1) — never the other one
    for p in _positions_fn(entry_col)(value, m, k):
        if not (bits[p >> 3] >> (p & 7)) & 1:
            return False
    return True


_BLOOM_NO_COERCE = object()  # sentinel: probe not coercible → fail-open


def _bloom_probe_value(value, coltype: str | None):
    """Coerce a probe value to the bloom column's MANIFEST type before
    hashing (advice r15, medium): the bitmap hashed ``str()`` of the
    stored values, so an equality probe with a float on an int column
    (``("doc_id", "==", 5.0)`` — which Spark and DuckDB would match)
    must hash ``"5"``, not ``"5.0"``, or the file is silently pruned
    and matching rows lost. Non-coercible probes (``5.5`` on an int
    column, an int on a string column, NaN) return the
    ``_BLOOM_NO_COERCE`` sentinel and the caller falls through
    FAIL-OPEN — the posture of saturated/absent bitmaps: a kept file
    is never a wrong answer."""
    if coltype in ("tinyint", "smallint", "int", "bigint"):
        if isinstance(value, bool):
            return int(value)
        if isinstance(value, int):
            return value
        if isinstance(value, float) and value.is_integer():
            return int(value)
        return _BLOOM_NO_COERCE
    if coltype == "string":
        return value if isinstance(value, str) else _BLOOM_NO_COERCE
    if coltype == "date":
        # round 17 (VERDICT r16 task #4): date keys canonicalize to
        # EPOCH DAYS — the same integer the writer hashed the stored
        # date32 values through — so probe and bitmap share one domain
        from optimal_parallel_fp_growth_spark.functions.spark_hash import (
            canon_date_days,
        )

        d = canon_date_days(value)
        return d if d is not None else _BLOOM_NO_COERCE
    if coltype in ("timestamp", "timestamp_ntz"):
        from optimal_parallel_fp_growth_spark.functions.spark_hash import (
            canon_ts_micros,
        )

        us = canon_ts_micros(value)
        return us if us is not None else _BLOOM_NO_COERCE
    return _BLOOM_NO_COERCE


def _era_bucket_spec(
    entry: dict | None,
    specs: dict | None,
    bcol: str | None,
    bn: int,
) -> tuple[str | None, int]:
    """The (bucket col, bucket count) a file's ``__bucket`` stamp was
    written under. With no specs registry (never-evolved table) every
    file is the table-level spec's; with one, resolve the file's
    ``__spec`` era (absent = era 0) — an era with no bucket layout
    returns (None, 0), which disables bucket pruning for that file."""
    if specs is None:
        return bcol, bn
    sid = str(int((entry or {}).get("__spec", 0)))
    b = (specs.get(sid) or {}).get("bucket_by") or {}
    return b.get("col"), int(b.get("n") or 0)


def _probe_in_col_domain(val, coltype: str | None):
    """Fold a cross-domain temporal probe into the COLUMN's domain the
    way Spark's comparison would (round 17): a datetime at exact
    midnight probing a DATE column becomes that date (Spark casts the
    date side to a midnight timestamp, so they compare EQUAL — but the
    ISO stat strings "2024-01-10" vs "2024-01-10 00:00:00" do not,
    and at a file's range boundary that mismatch would prune a file
    holding matching rows); a date probing a TIMESTAMP column becomes
    its midnight datetime for the same reason. Non-midnight datetimes
    on a date column keep their form — prefix ordering then agrees
    with chronological order for every strict comparison, and
    equality is impossible."""
    import datetime as _dt

    if coltype == "date" and isinstance(val, _dt.datetime):
        v = (
            val.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            if val.tzinfo is not None
            else val
        )
        if v.time() == _dt.time(0, 0):
            return v.date()
        return val
    if (
        coltype in ("timestamp", "timestamp_ntz")
        and isinstance(val, _dt.date)
        and not isinstance(val, _dt.datetime)
    ):
        return _dt.datetime(val.year, val.month, val.day)
    return val


def _file_passes(
    entry: dict | None,
    preds: list[tuple[str, str, object]],
    bcol: str | None,
    bn: int,
    types: dict[str, str],
    specs: dict | None = None,
    blob_path: str | None = None,
    blob_cache: dict | None = None,
) -> bool:
    """Range-stats survival for every predicate, PLUS bucket-identity
    pruning: an equality on the bucket column skips every file whose
    recorded bucket is not ``pmod(murmur3(value), n)`` — the pruning
    that still works when keys are uuid-shaped and every file spans
    the full key RANGE. Files without a recorded bucket (pre-bucket
    history) are never bucket-pruned.

    Float/double predicates prune ONLY files whose commit-time
    ``__nan`` flag recorded False for the column (round 15): footer
    ranges exclude NaN while Spark and DuckDB treat NaN as larger
    than every value (and equal to itself), so a NaN row in a file
    with max=10 still satisfies ``col > 100`` — pruning it on the
    range would drop a matching row. NaN-unknown (pre-r15 manifest)
    or NaN-holding files survive every float predicate: fail-open is
    a full-file read, never a wrong answer.

    ``specs`` (round 15, spec evolution): the manifest's partition-
    spec registry — when present, each file's bucket stamp is
    interpreted under the spec ERA the file was written in
    (:func:`_era_bucket_spec`), so a table whose bucket count or
    column evolved still bucket-prunes pre-evolution files by the OLD
    spec and post-evolution files by the new one."""
    bcol, bn = _era_bucket_spec(entry, specs, bcol, bn)
    for col, op, val in preds:
        val = (
            [_probe_in_col_domain(v, types.get(col)) for v in val]
            if op == "in"
            else _probe_in_col_domain(val, types.get(col))
        )
        if types.get(col) in ("float", "double"):
            if ((entry or {}).get("__nan") or {}).get(col) is not False:
                continue  # NaN-unknown/NaN-holding: never range-prune
        if not _file_survives(entry, col, op, val):
            return False
        # manifest bloom probe (round 15): equality/IN on a
        # bloom-indexed column can skip a file its range stats keep —
        # a definite non-member prunes; membership or a saturated/
        # absent bitmap falls through (fail-open, never wrong)
        bl = ((entry or {}).get("__bloom") or {}).get(col)
        if bl is not None and op in ("==", "in") and val is not None:
            probes = val if op == "in" else (val,)
            # coerce each probe to the column's manifest type before
            # hashing (advice r15): a float probe on an int column
            # must hash the int form; non-coercible probes keep the
            # file (fail-open), range stats already had their say
            keys = [
                _bloom_probe_value(v, types.get(col))
                for v in probes
                if v is not None
            ]
            if keys and not any(
                k is _BLOOM_NO_COERCE
                or _bloom_may_contain(bl, k, blob_path, blob_cache)
                for k in keys
            ):
                return False
        if bcol is not None and col == bcol and op in ("==", "in"):
            t = types.get(col)
            b = (entry or {}).get("__bucket")
            if t in _BUCKETABLE_TYPES and b is not None and val is not None:
                from optimal_parallel_fp_growth_spark.functions.spark_hash import (
                    bucket_of,
                )

                try:
                    wanted = (
                        {bucket_of(v, t, bn) for v in val}
                        if op == "in"
                        else {bucket_of(val, t, bn)}
                    )
                except (ValueError, TypeError):
                    # probe not canonicalizable to the key type (e.g.
                    # a string on a date bucket column): fail OPEN —
                    # range stats already had their say, and a kept
                    # file is never a wrong answer (round 17)
                    continue
                if b not in wanted:
                    return False
    return True


def _passing_files(
    path: str,
    man: dict,
    files: list[str],
    preds: list[tuple[str, str, object]],
    types: dict[str, str] | None = None,
) -> list[str]:
    """The subset of ``files`` a predicate list cannot exclude — range
    stats, bucket identity, and manifest blooms, sharing one per-pass
    bloom-blob cache so each probed (file, column) slice is read at
    most once. Every stats-pruning call site funnels through here so
    the lazy-sidecar plumbing has a single owner."""
    fstats = man.get("file_stats") or {}
    bcol, bn = _spec_bucket(path)
    if types is None:
        types = dict(man.get("schema") or [])
    cache: dict = {}
    return [
        f
        for f in files
        if _file_passes(
            fstats.get(f), preds, bcol, bn, types, man.get("specs"),
            _bloom_blob_path(path, f), cache,
        )
    ]


def create_table(
    df: DataFrame,
    path: str,
    cluster_by: list[str] | None = None,
    cluster_kind: str = "range",
    bucket_by: tuple[str, int] | None = None,
    sort_within_buckets: list[str] | None = None,
    bucket_file_rows: int | None = None,
    txn: tuple[str, int] | None = None,
    bloom_cols: list[str] | None = None,
    bloom_bits: int | str = "auto",
) -> int:
    """Create a versioned table at ``path`` (must not already be one).
    Returns the committed version (1).

    ``txn=(app_id, epoch)`` stamps the creating commit's ``txns``
    watermark (see :func:`append_table`), so a streaming sink whose
    FIRST batch created the table detects that batch's replay too.

    ``bloom_cols`` (round 15 — the Iceberg puffin / Parquet
    footer-bloom shape): record per-file Bloom bitmaps for the named
    int/string columns at every commit. Point lookups (``==`` / ``in``
    prunes) then skip files whose bitmap proves non-membership — the
    file-skipping tier for SCATTERED keys, where every file's
    [min, max] spans the whole key space and range stats prune
    nothing and no bucket layout was chosen. ``bloom_bits="auto"``
    (the default since round 16) sizes each FILE's bitmap from its
    actual distinct count at commit time (≥10 bits/value, power-of-2,
    capped at 4 Mbit — :func:`bloom_bits_for`), so bitmaps never
    silently saturate as files grow; an explicit integer width caps
    every bitmap at that many bits instead, and a file with more
    distinct values than the cap can hold stores nothing and
    fail-opens. Bitmap BYTES live in a per-file sidecar blob
    (``<file>.parquet.bloom`` — round 17, the puffin shape proper):
    the manifest carries only (offset, length, m, k) per column, so
    it stays KB-scale at any file count, and readers load a blob
    slice lazily — only for probed columns on files that survive
    range pruning. Composes with any layout (the bitmap is per-file
    metadata, not a layout).

    ``cluster_by`` (round 12, the Delta liquid-clustering analog as a
    recorded TABLE property): cluster + sort this write on the named
    columns AND persist the choice in ``_table.json``, so every later
    rewrite — :func:`merge_table`, :func:`compact_table`,
    :func:`overwrite_table`, :func:`update_where` — re-clusters
    automatically. Without a recorded spec one forgotten merge
    silently destroys the disjoint key ranges every pruned read
    depends on (measured: a contiguous-key follow degrades 4.5 →
    13.3 s at 20M rows once a scattered merge has de-clustered the
    layout).

    ``cluster_kind`` (round 13): ``"range"`` (default) linearly
    range-clusters — narrow per-file ranges on the LEADING column
    only; ``"zorder"`` Morton-interleaves 2+ columns so every listed
    dimension's per-file range is narrow and multi-predicate pruning
    (``read_table(prune=[...])``) bites on any of them — the Delta
    OPTIMIZE ZORDER shape, persisted as a property so rewrites keep
    the interleave.

    ``bucket_by=(col, n)`` (round 13, the Iceberg bucket-transform
    shape): hash-partition every write into ``n`` buckets of ``col``
    (murmur3, the same function Spark's shuffle uses) and record each
    file's bucket in the manifest. This is the layout for UUID-shaped
    keys, where range clustering is useless (every file spans the
    whole key space): a MERGE rewrites only the files of the
    changeset's buckets, and an equality read opens exactly the
    matching bucket's file(s). Mutually exclusive with ``cluster_by``;
    the bucket column must be integral or string (the types whose
    Spark hash the manifest math reproduces — fail closed beats a
    wrong bucket).

    ``sort_within_buckets=[cols]`` + ``bucket_file_rows=k`` (round 14,
    VERDICT r13 task #6 — Iceberg's bucket transform COMPOSED with a
    sort order): each bucket's partition is sorted on the listed
    columns and split into files of ~k rows, so every file carries
    BOTH its bucket identity and a narrow range of the sort column.
    A two-predicate lookup (bucket-key equality + sort-column range)
    then opens one file: bucket identity eliminates the other
    buckets, range stats eliminate the matching bucket's sibling
    slices. Every later rewrite re-applies the recorded layout."""
    if _versions(path):
        raise FileExistsError(f"versioned table already exists at {path}")
    if cluster_kind not in _CLUSTER_KINDS:
        raise ValueError(
            f"cluster_kind must be one of {_CLUSTER_KINDS}, got "
            f"{cluster_kind!r}"
        )
    if cluster_kind != "range" and not cluster_by:
        raise ValueError("cluster_kind requires cluster_by columns")
    if bucket_by is not None:
        if cluster_by:
            raise ValueError(
                "bucket_by and cluster_by are mutually exclusive layouts"
            )
        bcol, bn = bucket_by
        if int(bn) < 2:
            raise ValueError("bucket_by needs n >= 2 buckets")
        field = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        if bcol not in field:
            raise ValueError(f"bucket column {bcol!r} not in table")
        if field[bcol] not in _BUCKETABLE_TYPES:
            raise ValueError(
                f"bucket column {bcol!r} is {field[bcol]}: bucket keys "
                f"must be one of {_BUCKETABLE_TYPES} (manifest-side "
                "pruning reproduces Spark's hash for exactly these)"
            )
        if sort_within_buckets:
            missing = [c for c in sort_within_buckets if c not in field]
            if missing:
                raise ValueError(
                    f"sort_within_buckets columns not in table: {missing}"
                )
        if bucket_file_rows is not None:
            if not sort_within_buckets:
                raise ValueError(
                    "bucket_file_rows needs sort_within_buckets - "
                    "splitting an UNSORTED bucket gives every slice the "
                    "bucket's full range and prunes nothing"
                )
            if int(bucket_file_rows) < 1:
                raise ValueError("bucket_file_rows must be >= 1")
    elif sort_within_buckets or bucket_file_rows:
        raise ValueError(
            "sort_within_buckets/bucket_file_rows need bucket_by"
        )
    bloom_spec: dict | None = None
    if bloom_cols:
        field = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        bad = [
            c for c in bloom_cols if field.get(c) not in _BUCKETABLE_TYPES
        ]
        if bad:
            raise ValueError(
                f"bloom columns {bad} must be int/string "
                f"({_BUCKETABLE_TYPES}): the bitmap hashes str(value), "
                "a bijection for exactly these"
            )
        bloom_spec = {
            "cols": list(bloom_cols),
            "bits": _check_bloom_bits(bloom_bits),
            "k": _BLOOM_K,
        }
    # a _table.json with no manifest is debris from a failed earlier
    # create at this path — it must not leak into THIS table's life
    # (advice r12: a stale spec from a failed clustered create poisoned
    # every later rewrite here)
    stale = pathlib.Path(path) / _TABLE_META
    if stale.is_file():
        stale.unlink()
    if cluster_by:
        df = _cluster(
            df, cluster_by, df.rdd.getNumPartitions() or 1, cluster_kind
        )
    if bucket_by is not None:
        df = _bucket_df(
            df, int(bucket_by[1]), bucket_by[0], sort_within_buckets or []
        )
    files, stats = _write_data_and_stats(
        df, path, 1, max_records=bucket_file_rows, bloom_spec=bloom_spec
    )
    if bucket_by is not None:
        _stamp_buckets(
            stats, files, int(bucket_by[1]),
            allow_splits=bool(sort_within_buckets),
        )
    v = _commit(path, 1, files, "create", _schema_fields(df), stats, txn=txn)
    # record the spec only once the create COMMITTED: a failed write
    # must leave no table property behind (advice r12). Crash between
    # commit and this write loses only the property (layout is intact,
    # later rewrites just won't re-cluster) — strictly safer than the
    # reverse order.
    if cluster_by:
        spec = {"cluster_by": list(cluster_by)}
        if cluster_kind != "range":
            spec["cluster_kind"] = cluster_kind
        _write_table_spec(path, spec)
    if bucket_by is not None:
        bspec = {"col": bucket_by[0], "n": int(bucket_by[1])}
        if sort_within_buckets:
            bspec["sort"] = list(sort_within_buckets)
        if bucket_file_rows is not None:
            bspec["rows"] = int(bucket_file_rows)
        _write_table_spec(
            path, {**_table_spec(path), "bucket_by": bspec}
        )
    if bloom_spec is not None:
        # recorded AFTER the commit (same ordering as the layouts):
        # v1's blooms were stamped from the explicit spec above, and a
        # crash here only costs LATER writes their bitmaps (fail-open)
        _write_table_spec(path, {**_table_spec(path), "bloom": bloom_spec})
    return v


def append_table(
    df: DataFrame,
    path: str,
    evolve: bool = False,
    txn: tuple[str, int] | None = None,
) -> int:
    """Append rows as a new version (old files + new files).

    Plain appends follow Iceberg's writer contract (round-8 pin): the
    batch may OMIT table columns (new files read as null there) and
    order columns freely — identity is the name — but may not add
    columns or change a shared column's type. ``evolve=True``
    additionally permits ADDITIVE schema evolution: the append may
    carry columns the table lacks (they join the schema; older files
    read as null). Type changes to an existing column are always
    rejected.

    ``txn=(app_id, epoch)`` (round 15, the Delta ``txnAppId`` /
    ``txnVersion`` idempotent-writer shape): the commit STAMPS the
    manifest's inherited ``txns`` watermark map with
    ``app_id → epoch``, and an append whose epoch is ≤ the recorded
    watermark for its app_id is a NO-OP returning the current head —
    a replayed micro-batch commits nothing, which upgrades
    at-least-once ``foreachBatch`` delivery to exactly-once table
    contents. Race-safe by construction: a concurrent duplicate makes
    this writer lose the version hard-link (:class:`CommitConflict`);
    the :func:`with_retry` replay re-reads the head, sees the epoch
    recorded, and no-ops. Epochs must be monotone per app_id (Spark's
    ``batchId`` is)."""
    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"no versioned table at {path}")
    cur = vs[-1]
    man = _load_manifest(path, cur)
    if _txn_replayed(man, txn):
        return cur  # replayed epoch: already committed, no-op
    if evolve and man.get("schema") is not None:
        schema = _merge_schema(man["schema"], _schema_fields(df), man)
    else:
        _check_schema(df, path, cur)
        schema = man.get("schema") or _schema_fields(df)
    bcol, bn = _spec_bucket(path)
    if bcol is not None and bcol in df.columns:
        scols, srows = _spec_bucket_sort(path)
        df = _bucket_df(df, bn, bcol, scols)  # the batch joins the layout
        files, new_stats = _write_data_and_stats(
            df, path, cur + 1, max_records=srows
        )
    else:
        files, new_stats = _write_data_and_stats(df, path, cur + 1)
    _validate_constraints(df.sparkSession, path, files, cur + 1, schema)
    stats = dict(man.get("file_stats") or {})
    if bcol is not None:
        _stamp_buckets(
            new_stats, files, bn,
            allow_splits=bool(_spec_bucket_sort(path)[0]),
        )
    stats.update(new_stats)
    return _commit(
        path, cur + 1, man["files"] + files, "append",
        schema,
        stats,
        man.get("delete_files"),  # masks still cover the carried files
        txn=txn,
    )


def evolve_table_spec(
    path: str,
    cluster_by: list[str] | None = None,
    cluster_kind: str = "range",
    bucket_by: tuple[str, int] | None = None,
    sort_within_buckets: list[str] | None = None,
    bucket_file_rows: int | None = None,
    bloom_cols: list[str] | None = None,
    bloom_bits: int | str = "auto",
) -> int:
    """METADATA-ONLY partition-spec evolution (round 15, VERDICT r14
    task #7 — the Iceberg spec-evolution shape): change the table's
    recorded layout so it applies to NEW files only. No data is read
    or rewritten — a table that outgrew its bucket count (or wants
    buckets where it had range clustering) evolves in one manifest
    commit instead of a full rewrite, which at 100 TB is the
    difference between milliseconds and a cluster-day.

    ``bloom_cols`` (round 16): add, replace, or clear (``[]``) the
    table's manifest-bloom spec in the same evolution — existing
    files keep whatever bitmaps their commit stamped (each entry
    carries its own width ``m``; readers probe per-entry), new
    commits stamp the new columns. ``bloom_bits`` as in
    :func:`create_table` (default ``"auto"``: per-file width from the
    actual distinct count). A bloom-ONLY call (``bloom_cols`` with no
    layout arguments) CARRIES the current layout into the new era
    instead of clearing it — blooms are per-file metadata, not a
    layout, so "evolve the bloom spec" must never silently destroy a
    bucket/cluster layout (review r16: the bare no-layout-args =
    clear-layout rule used to fire here, un-bucketing every future
    commit of a bucketed table).

    Mechanics: the commit extends the manifest's append-only
    ``specs`` registry ({spec_id: layout}, inherited commit-to-commit
    like the rename chain) and bumps the current id; every data file
    keeps the spec-era stamp it was written under (``__spec`` in its
    stats, absent = era 0), and readers bucket-prune each file by ITS
    OWN era (:func:`_era_bucket_spec`) — pre-evolution files by the
    old spec, post-evolution files by the new one, so pruning never
    lies across the boundary. Rewriting ops (merge, compact,
    overwrite) lay their output down in the CURRENT spec and stamp it,
    migrating the table incrementally; a merge never bucket-skips a
    file from another era. Pass no layout arguments to CLEAR the
    layout for new files. Returns the committed version."""
    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"no versioned table at {path}")
    cur = vs[-1]
    man = _load_manifest(path, cur)
    fields = dict(man.get("schema") or [])
    if cluster_kind not in _CLUSTER_KINDS:
        raise ValueError(
            f"cluster_kind must be one of {_CLUSTER_KINDS}, got "
            f"{cluster_kind!r}"
        )
    if cluster_kind != "range" and not cluster_by:
        raise ValueError("cluster_kind requires cluster_by columns")
    new_layout: dict = {}
    if cluster_by:
        if bucket_by is not None:
            raise ValueError(
                "bucket_by and cluster_by are mutually exclusive layouts"
            )
        missing = [c for c in cluster_by if fields and c not in fields]
        if missing:
            raise ValueError(f"cluster_by columns not in table: {missing}")
        new_layout["cluster_by"] = list(cluster_by)
        if cluster_kind != "range":
            new_layout["cluster_kind"] = cluster_kind
    if bucket_by is not None:
        bcol, bn = bucket_by
        if int(bn) < 2:
            raise ValueError("bucket_by needs n >= 2 buckets")
        if fields and bcol not in fields:
            raise ValueError(f"bucket column {bcol!r} not in table")
        if fields and fields.get(bcol) not in _BUCKETABLE_TYPES:
            raise ValueError(
                f"bucket column {bcol!r} is {fields.get(bcol)}: bucket "
                f"keys must be one of {_BUCKETABLE_TYPES}"
            )
        bspec = {"col": bcol, "n": int(bn)}
        if sort_within_buckets:
            missing = [
                c for c in sort_within_buckets if fields and c not in fields
            ]
            if missing:
                raise ValueError(
                    f"sort_within_buckets columns not in table: {missing}"
                )
            bspec["sort"] = list(sort_within_buckets)
        if bucket_file_rows is not None:
            if not sort_within_buckets:
                raise ValueError(
                    "bucket_file_rows needs sort_within_buckets"
                )
            if int(bucket_file_rows) < 1:
                raise ValueError("bucket_file_rows must be >= 1")
            bspec["rows"] = int(bucket_file_rows)
        new_layout["bucket_by"] = bspec
    elif sort_within_buckets or bucket_file_rows:
        raise ValueError(
            "sort_within_buckets/bucket_file_rows need bucket_by"
        )
    if bloom_cols is not None and not (
        cluster_by
        or bucket_by is not None
        or sort_within_buckets
        or bucket_file_rows
    ):
        # bloom-only evolution: the new era keeps the current layout
        cur_spec = _table_spec(path)
        if cur_spec.get("cluster_by"):
            new_layout["cluster_by"] = list(cur_spec["cluster_by"])
            if cur_spec.get("cluster_kind", "range") != "range":
                new_layout["cluster_kind"] = cur_spec["cluster_kind"]
        if cur_spec.get("bucket_by"):
            new_layout["bucket_by"] = dict(cur_spec["bucket_by"])
    new_bloom: dict | None = None
    if bloom_cols is not None and bloom_cols != []:
        bad = [
            c
            for c in bloom_cols
            if fields and fields.get(c) not in _BUCKETABLE_TYPES
        ]
        if bad:
            raise ValueError(
                f"bloom columns {bad} must be int/string "
                f"({_BUCKETABLE_TYPES})"
            )
        new_bloom = {
            "cols": list(bloom_cols),
            "bits": _check_bloom_bits(bloom_bits),
            "k": _BLOOM_K,
        }
    spec = _table_spec(path)
    specs = dict(man.get("specs") or {})
    if not specs:
        # bootstrap the registry: era 0 is whatever the table-level
        # spec said before the first evolution (files with no __spec
        # stamp resolve here)
        era0: dict = {}
        if spec.get("cluster_by"):
            era0["cluster_by"] = list(spec["cluster_by"])
            if spec.get("cluster_kind", "range") != "range":
                era0["cluster_kind"] = spec["cluster_kind"]
        if spec.get("bucket_by"):
            era0["bucket_by"] = dict(spec["bucket_by"])
        specs["0"] = era0
    new_id = max(int(k) for k in specs) + 1
    specs[str(new_id)] = new_layout
    v = _commit(
        path, cur + 1, man["files"], "evolve-spec",
        man.get("schema"), man.get("file_stats"),
        man.get("delete_files"),
        specs=specs, spec_id=new_id,
    )
    # writer-facing current layout AFTER the commit (create_table's
    # ordering): a crash between the two leaves writers laying out —
    # and stamping — the OLD era, which the registry still describes
    new_spec = {
        k: val
        for k, val in spec.items()
        if k not in ("cluster_by", "cluster_kind", "bucket_by")
    }
    new_spec.update(new_layout)
    new_spec["spec_id"] = new_id
    if bloom_cols is not None:
        new_spec.pop("bloom", None)
        if new_bloom is not None:
            new_spec["bloom"] = new_bloom
    _write_table_spec(path, new_spec)
    return v


def overwrite_table(
    df: DataFrame,
    path: str,
    cluster_by: list[str] | None = None,
    cluster_kind: str | None = None,
    txn: tuple[str, int] | None = None,
) -> int:
    """Replace the table's contents as a new version; history keeps
    the old versions readable. A recorded ``cluster_by`` spec
    re-clusters the replacement; pass ``cluster_by=[...]`` (with an
    optional ``cluster_kind``, default range) to change the recorded
    spec with the rewrite, or ``cluster_by=[]`` to clear it (None
    keeps both). Overwrite is the documented schema-change path
    (see :func:`_check_schema`'s error message), so a replacement that
    DROPS a recorded clustered column RESETS the spec instead of
    failing (advice r12: the spec was previously permanent, wedging
    exactly the workflow the error message recommends). The spec file
    is rewritten only after the commit succeeds.

    ``txn=(app_id, epoch)`` (round 16, VERDICT r15 task #3): the same
    exactly-once replay guard as :func:`append_table` — a
    stream-driven overwrite whose epoch is ≤ the recorded watermark
    for its app_id is a ZERO-IO no-op returning the current head, so
    a replayed ``foreachBatch`` overwrite never doubles a version."""
    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"no versioned table at {path}")
    cur = vs[-1]
    if _txn_replayed(_load_manifest(path, cur), txn):
        return cur  # replayed epoch: already committed, no-op
    spec = _table_spec(path)
    recorded = spec.get("cluster_by")
    recorded_kind = spec.get("cluster_kind", "range")
    if cluster_by is None:
        effective, kind = recorded, recorded_kind
        if effective and any(c not in df.columns for c in effective):
            effective = []  # replacement dropped a clustered column
    else:
        effective = list(cluster_by)
        kind = cluster_kind or "range"
        if kind not in _CLUSTER_KINDS:
            raise ValueError(
                f"cluster_kind must be one of {_CLUSTER_KINDS}, got {kind!r}"
            )
    bcol, bn = _spec_bucket(path)
    srows = None
    if effective:
        if bcol is not None:
            raise ValueError(
                "cannot re-cluster a hash-bucketed table - the bucket "
                "layout is the recorded property"
            )
        df = _cluster(df, effective, df.rdd.getNumPartitions() or 1, kind)
    elif bcol is not None and bcol in df.columns:
        scols, srows = _spec_bucket_sort(path)
        df = _bucket_df(df, bn, bcol, scols)
    files, stats = _write_data_and_stats(
        df, path, cur + 1, max_records=srows
    )
    _validate_constraints(
        df.sparkSession, path, files, cur + 1, _schema_fields(df)
    )
    if bcol is not None:
        _stamp_buckets(
            stats, files, bn,
            allow_splits=bool(_spec_bucket_sort(path)[0]),
        )
    v = _commit(
        path, cur + 1, files, "overwrite", _schema_fields(df), stats,
        txn=txn,
    )
    if (effective or recorded) and (
        effective != recorded or kind != recorded_kind
    ):
        new_spec = dict(spec)
        if effective:
            new_spec["cluster_by"] = effective
            if kind != "range":
                new_spec["cluster_kind"] = kind
            else:
                new_spec.pop("cluster_kind", None)
        else:
            new_spec.pop("cluster_by", None)
            new_spec.pop("cluster_kind", None)
        _write_table_spec(path, new_spec)
    return v


def compact_table(
    spark: SparkSession,
    path: str,
    target_mb: int = 128,
    where=None,
    txn: tuple[str, int] | None = None,
) -> int:
    """Rewrite the CURRENT version's rows into ~target_mb files as a
    new version (narrow coalesce — no shuffle; with a recorded
    ``cluster_by`` spec, a range-repartition — one shuffle — so the
    compacted files keep disjoint cluster ranges: coalesce would glue
    arbitrary neighbors and widen every file's span). Old versions
    still read their original files; reclaim space later with
    :func:`vacuum_table`.

    ``where=`` (round 14, the Delta ``OPTIMIZE ... WHERE`` shape):
    compact ONLY the files whose recorded stats can intersect the
    predicate (same triple / AND-list grammar as ``read_table``'s
    ``prune``) — file granularity, so every row of a selected file
    rewrites and no row outside the selection moves. At 100 TB this
    is how compaction runs at all: the hot tail (today's thousand
    small appended files) folds without touching the cold petabytes.
    Delete sidecars are read through on the rewritten subset (their
    new sequence outranks every sidecar) and KEPT for the carried
    files, unlike the full compact, which materializes them away.

    ``txn=(app_id, epoch)`` (round 16, VERDICT r15 task #3): the same
    exactly-once replay guard as :func:`append_table` — a
    stream-triggered compaction whose epoch is ≤ the recorded
    watermark for its app_id is a ZERO-IO no-op returning the current
    head, so a replayed maintenance batch never doubles a rewrite."""
    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"no versioned table at {path}")
    cur = vs[-1]
    man = _load_manifest(path, cur)
    if _txn_replayed(man, txn):
        return cur  # replayed epoch: already committed, no-op
    preds = _norm_prune(where)
    if preds:
        return _compact_where(
            spark, path, cur, man, preds, target_mb, txn=txn
        )
    total = sum(
        (pathlib.Path(path) / f).stat().st_size for f in man["files"]
    )
    target = max(1, -(-total // (target_mb * 1024 * 1024)))
    spec_cluster, spec_kind = _spec_cluster(path)
    bcol, bn = _spec_bucket(path)
    srows = None
    if spec_cluster:
        df = _cluster(
            read_table(spark, path, version=cur), spec_cluster, target,
            spec_kind,
        )
    elif bcol is not None:
        # a bucketed table compacts INTO its buckets: n files, one per
        # bucket — a coalesce would glue buckets and destroy identity
        # (sorted-bucket tables re-sort and re-split their slices)
        scols, srows = _spec_bucket_sort(path)
        df = _bucket_df(
            read_table(spark, path, version=cur), bn, bcol, scols
        )
    else:
        df = read_table(spark, path, version=cur).coalesce(target)
    files, stats = _write_data_and_stats(
        df, path, cur + 1, max_records=srows
    )
    if bcol is not None:
        _stamp_buckets(
            stats, files, bn,
            allow_splits=bool(_spec_bucket_sort(path)[0]),
        )
    return _commit(
        path, cur + 1, files, "compact",
        man.get("schema") or _schema_fields(df),
        stats,
        txn=txn,
    )


def _compact_where(
    spark: SparkSession,
    path: str,
    cur: int,
    man: dict,
    preds: list[tuple[str, str, object]],
    target_mb: int,
    txn: tuple[str, int] | None = None,
) -> int:
    """The partial-compaction arm of :func:`compact_table`: rewrite
    only the stats-intersecting files, carry the rest by reference."""
    fstats = man.get("file_stats") or {}
    bcol, bn = _spec_bucket(path)
    affected = _passing_files(path, man, man["files"], preds)
    untouched = [f for f in man["files"] if f not in set(affected)]
    if not affected:
        return cur  # nothing intersects: version-free no-op, like purge
    new_files: list[str] = []
    new_stats: dict[str, dict] = {}
    srows = None
    if affected:
        base = _apply_delete_masks(
            spark, path,
            _read_files(
                spark, path, affected, man.get("schema"),
                man.get("renames"),
            ),
            man,
        )
        spec_cluster, spec_kind = _spec_cluster(path)
        size = sum(
            (pathlib.Path(path) / f).stat().st_size for f in affected
        )
        target = max(1, -(-size // (target_mb * 1024 * 1024)))
        if spec_cluster:
            base = _cluster(base, spec_cluster, target, spec_kind)
        elif bcol is not None:
            scols, srows = _spec_bucket_sort(path)
            base = _bucket_df(base, bn, bcol, scols)
        else:
            base = base.coalesce(target)
        new_files, new_stats = _write_data_and_stats(
            base, path, cur + 1, max_records=srows
        )
    stats = {f: s for f, s in fstats.items() if f in set(untouched)}
    if bcol is not None:
        _stamp_buckets(
            new_stats, new_files, bn,
            allow_splits=bool(_spec_bucket_sort(path)[0]),
        )
    stats.update(new_stats)
    return _commit(
        path, cur + 1, untouched + new_files, "compact",
        man.get("schema"), stats,
        man.get("delete_files"),  # masks still cover the carried files
        txn=txn,
    )


_PRUNE_OPS = ("==", ">=", "<=", ">", "<", "in")


def _norm_prune(prune) -> list[tuple[str, str, object]]:
    """One (col, op, value) triple OR a list of them (AND semantics) →
    a validated list. The list form lets one read prune BOTH sides of
    a range — ``[("k", ">=", lo), ("k", "<", hi)]`` — where the single
    triple could only cut one (round 13). The ``"in"`` op takes a
    list/tuple/set of values: a file survives when ANY value could be
    in its range (and, on a bucketed key, when the file's bucket is in
    the values' bucket set) — the batched-lookup shape."""
    if prune is None:
        return []
    if (
        isinstance(prune, tuple)
        and len(prune) == 3
        and isinstance(prune[1], str)
    ):
        preds = [prune]
    else:
        preds = [tuple(p) for p in prune]
    for p in preds:
        if len(p) != 3:
            raise ValueError(f"prune predicate must be (col, op, value): {p!r}")
        if p[1] not in _PRUNE_OPS:
            raise ValueError(
                f"unsupported prune op {p[1]!r} (use one of {_PRUNE_OPS})"
            )
        if p[1] == "in":
            if not isinstance(p[2], (list, tuple, set)) or not p[2]:
                raise ValueError(
                    f"'in' prune needs a non-empty list of values: {p!r}"
                )
            if any(v is None for v in p[2]):
                raise ValueError(
                    "'in' prune values must be non-null (SQL IN never "
                    "matches NULL)"
                )
    return preds


def _prune_cond(preds: list[tuple[str, str, object]]):
    """The residual DataFrame filter for a prune conjunction (applied
    after file skipping so results are exact regardless of stats)."""
    from pyspark.sql import functions as F

    cond = None
    for col, op, val in preds:
        c = F.col(col)
        if op == "in":
            one = c.isin(list(val))
        else:
            one = {
                "==": c == val, ">=": c >= val, ">": c > val,
                "<=": c <= val, "<": c < val,
            }[op]
        cond = one if cond is None else (cond & one)
    return cond


def _iso_naive(val) -> str:
    """date/datetime → ISO string with any tzinfo folded into UTC and
    dropped, so every recorded stat and probe lives in one string
    domain where lexicographic order == chronological order."""
    import datetime

    if isinstance(val, datetime.datetime) and val.tzinfo is not None:
        val = val.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    return str(val)


def _stat_probe(val):
    """Normalize a caller-side probe value to the manifest's stat
    domain: date/timestamp stats are recorded as naive-UTC ISO strings
    (``_file_stats``), so the probe must be stringified the same way —
    comparing a ``datetime`` against the stored string raises
    TypeError (ADVICE r6). Naive datetimes are taken as already-UTC
    (Spark collect() returns naive UTC under the UTC session this
    engine pins); aware ones are converted."""
    import datetime

    if isinstance(val, (datetime.date, datetime.datetime)):
        return _iso_naive(val)
    return val


def _file_survives(stats: dict, col: str, op: str, val) -> bool:
    """Can any row in a file with range stats satisfy ``col op val``?
    Missing stats → True (never prune on ignorance)."""
    rng = (stats or {}).get(col)
    if not rng:
        return True
    lo, hi = rng
    if op == "in":
        return any(lo <= _stat_probe(v) <= hi for v in val)
    val = _stat_probe(val)
    if op == "==":
        return lo <= val <= hi
    if op == ">=":
        return hi >= val
    if op == ">":
        return hi > val
    if op == "<=":
        return lo <= val
    if op == "<":
        return lo < val
    raise ValueError(f"unsupported prune op {op!r} (use one of {_PRUNE_OPS})")


def _read_files(
    spark: SparkSession,
    path: str,
    files: list[str],
    schema: list[list[str]] | None,
    renames: list[list[str]] | None = None,
) -> DataFrame:
    """Read a manifest's file list under its MANIFEST schema: files
    written before a schema-evolving append lack the newer columns, so
    the read aligns to the manifest (missing columns become typed
    nulls; renamed columns coalesce over their name history — see
    _align_to_schema).

    When the table has NO rename history the manifest schema IS the
    read schema, so it is passed to the reader explicitly (round 17,
    guide §6/§7.3 — the Iceberg reader model: the manifest is the
    schema authority, never the files): Spark then skips schema
    inference outright, where the previous ``mergeSchema=true`` read
    FOOTERS OF EVERY FILE on every read — a per-read job that grows
    linearly with file count (at 10k files that is 10k footer reads
    per read). Additive evolution still works — the parquet reader
    fills requested-but-absent columns with nulls, and type changes
    to shared columns are rejected at write time — but RENAMED
    columns are physically old-named in old files, which only the
    merged read + coalesce-over-name-history can surface, so a
    renames-bearing manifest keeps the merge path."""
    paths = [str(pathlib.Path(path) / f) for f in files]
    if schema is None:
        return spark.read.parquet(*paths)
    if not renames:
        ddl = ", ".join(f"`{n}` {t}" for n, t in schema)
        return spark.read.schema(ddl).parquet(*paths)
    df = spark.read.option("mergeSchema", "true").parquet(*paths)
    return _align_to_schema(df, schema, renames)


# ---------------------------------------------------------------------------
# Merge-on-read equality deletes (round 11; the Iceberg-v2 shape).
#
# Copy-on-write pays a file rewrite for every delete, which at 100 TB
# is prohibitive for scattered deletes: removing 1k rows spread over 1k
# files rewrites 1k files. ``delete_rows`` instead commits a small
# DELETE SIDECAR (a parquet file of deleted key values) and the new
# manifest carries the data files UNCHANGED; readers subtract matching
# rows at scan time. Sequence correctness: a sidecar committed at
# version D masks only rows in data files whose directory version
# S < D (the file's sequence number, parsed from ``data/v<S>/``), so a
# key re-inserted AFTER its deletion — landing in a file with S > D —
# is visible again, exactly Iceberg's sequence-number rule. Rewrites
# (merge / delete_where / compact) read through the masks, so their
# output files start mask-free; compact and overwrite drop the
# entries entirely (materialization).


def _seq_of(rel_file: str) -> int:
    """A data file's sequence number = the version directory it was
    written under (immutable by construction). Called by ``_commit``
    on every manifest path so the readers' inline ``regexp_extract``
    (whose failure mode is a silent NULL → row kept unmasked) can
    never meet a path it cannot parse (advice r11)."""
    import re

    m = re.search(r"(?:^|/)v(\d{8})/", rel_file)
    if not m:
        raise ValueError(f"cannot parse sequence from data file path {rel_file!r}")
    return int(m.group(1))


def _resolve_mask_key(
    key: str, columns, renames: list[list[str]] | None
) -> str:
    """A delete sidecar records its key column's name AT DELETE TIME
    (the sidecar file's physical column, immutable); a later
    rename_column moves the logical column out from under it. Walk
    the rename chain FORWARD until the name exists in the frame being
    masked — time travel lands on the era-correct name because the
    walk stops at the first present one."""
    have = set(columns)
    fwd = dict(renames or [])
    seen = set()
    cur = key
    while cur not in have and cur in fwd and cur not in seen:
        seen.add(cur)
        cur = fwd[cur]
    if cur not in have:
        raise ValueError(
            f"delete-mask key {key!r} resolves to no current column - "
            "the masked column was dropped; purge_deletes before "
            "dropping a mask key"
        )
    return cur


def _apply_delete_masks(
    spark: SparkSession, path: str, df: DataFrame, man: dict
) -> DataFrame:
    """Subtract merge-on-read deleted rows from a raw file read:
    anti-join each delete sidecar's keys with the sequence predicate
    ``sidecar.seq > row.file_seq``. The row's file sequence comes from
    ``input_file_name`` (evaluated at the scan), so one pass masks a
    multi-file read correctly. Sidecar key names written before a
    rename resolve forward through the manifest's chain."""
    entries = man.get("delete_files") or []
    if not entries:
        return df
    from pyspark.sql import functions as F

    out_cols = list(df.columns)
    masked = df.withColumn(
        "__seq",
        F.regexp_extract(F.input_file_name(), r"/v(\d{8})/", 1).cast("long"),
    )
    renames = man.get("renames")
    by_key: dict[str, list[dict]] = {}
    for e in entries:
        by_key.setdefault(e["key"], []).append(e)
    for key_col, es in by_key.items():
        parts = [
            spark.read.parquet(str(pathlib.Path(path) / e["file"])).select(
                F.col(key_col).alias("__delk"),
                F.lit(int(e["seq"])).cast("long").alias("__delseq"),
            )
            for e in es
        ]
        kd = parts[0]
        for p in parts[1:]:
            kd = kd.unionByName(p)
        cur_key = _resolve_mask_key(key_col, out_cols, renames)
        masked = masked.alias("d").join(
            kd.alias("k"),
            on=(
                (F.col(f"d.{cur_key}") == F.col("k.__delk"))
                & (F.col("k.__delseq") > F.col("d.__seq"))
            ),
            how="left_anti",
        )
    return masked.select(*out_cols)


def delete_rows(
    spark: SparkSession, path: str, keys: DataFrame, key_col: str
) -> int:
    """Merge-on-read row-level DELETE: commit a delete sidecar holding
    ``keys``' values — the data files carry into the new version
    untouched, and readers subtract matching rows at scan time. The
    O(deleted keys) alternative to :func:`delete_where`'s
    copy-on-write rewrite for deletes scattered across many files;
    time travel still reads pre-delete versions, and a later upsert
    of a deleted key is visible again (sequence rule above). Null
    keys are rejected for the same idempotency reason as
    :func:`merge_table`."""
    from pyspark.sql import functions as F

    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"no versioned table at {path}")
    cur = vs[-1]
    man = _load_manifest(path, cur)
    schema_cols = {c for c, _ in (man.get("schema") or [])}
    if schema_cols and key_col not in schema_cols:
        raise ValueError(f"delete key {key_col!r} is not a table column")
    src = keys.select(key_col).dropDuplicates([key_col])
    counts = src.agg(
        F.count(F.lit(1)).alias("n"), F.count(key_col).alias("nn")
    ).collect()[0]
    if counts.n == 0:
        raise ValueError("delete_rows got an empty key set")
    if counts.n != counts.nn:
        raise ValueError("delete keys must be non-null")
    side = _write_data(src.coalesce(1), path, cur + 1)
    new_entries = list(man.get("delete_files") or []) + [
        {"file": f, "seq": cur + 1, "key": key_col} for f in side
    ]
    return _commit(
        path, cur + 1, man["files"], "delete_rows",
        man.get("schema"), man.get("file_stats"), new_entries,
    )


# ---------------------------------------------------------------------------
# Schema evolution DDL (round 14 — the Delta/Iceberg ALTER TABLE tier).
#
# All three are METADATA-ONLY commits: zero data files move. Readers
# reconcile old files through the manifest's rename chain
# (_align_to_schema's alias coalesce); added columns read as typed
# nulls from older files (the alignment that already served evolve
# appends); dropped columns are projected away while their bytes stay
# until a rewrite. The chain and the dropped-name graveyard ride IN
# the manifest (atomic with the commit, inherited by every later
# commit), which is also what makes time travel exact: version v reads
# with v's schema and v's chain.
#
# Name REUSE is banned forever (add/rename reject any name ever seen
# in the schema, the chain, or the graveyard): with name-based file
# mapping, re-adding a once-used name would resurrect the old files'
# bytes under the new column — the classic name-mapping corruption;
# Iceberg ducks it with field IDs, we duck it by refusing.

_IDENT_RE = r"[A-Za-z_][A-Za-z0-9_]*"

_ADDABLE_TYPES = (
    "tinyint", "smallint", "int", "bigint", "float", "double",
    "string", "boolean", "date", "timestamp", "binary",
)


def _ddl_state(path: str) -> tuple[int, dict, list, list, set]:
    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"no versioned table at {path}")
    cur = vs[-1]
    man = _load_manifest(path, cur)
    if man.get("schema") is None:
        raise ValueError(
            f"table at {path} predates schema manifests - rewrite it "
            "(overwrite_table) before schema DDL"
        )
    renames = list(man.get("renames") or [])
    dropped = list(man.get("dropped") or [])
    universe = (
        {c for c, _ in man["schema"]}
        | {a for a, _ in renames}
        | {b for _, b in renames}
        | set(dropped)
    )
    return cur, man, renames, dropped, universe


def _spec_refs(path: str, col: str) -> list[str]:
    """Which recorded table properties reference ``col`` — layout and
    constraints must not drift from the schema, so DDL on a referenced
    column is rejected (drop the property first, fail-closed)."""
    import re

    spec = _table_spec(path)
    refs = []
    if col in (spec.get("cluster_by") or []):
        refs.append("cluster_by")
    b = spec.get("bucket_by") or {}
    if b.get("col") == col:
        refs.append("bucket_by")
    if col in (b.get("sort") or []):
        refs.append("sort_within_buckets")
    for name, expr in (spec.get("constraints") or {}).items():
        if re.search(rf"\b{re.escape(col)}\b", expr):
            refs.append(f"constraint {name!r}")
    return refs


def add_column(path: str, name: str, dtype: str) -> int:
    """ALTER TABLE ADD COLUMN as a metadata-only commit: the schema
    gains ``name`` at the end; every existing file reads as typed
    NULL there (exactly how evolve-append files already present to
    pre-evolution readers). O(1) in the table size."""
    import re

    cur, man, renames, dropped, universe = _ddl_state(path)
    if not re.fullmatch(_IDENT_RE, name):
        raise ValueError(f"column name {name!r} is not a plain identifier")
    if name in universe:
        raise ValueError(
            f"column name {name!r} was already used in this table's "
            "history (name reuse would resurrect old files' bytes)"
        )
    if dtype not in _ADDABLE_TYPES and not re.fullmatch(
        r"decimal\(\d+,\s*\d+\)", dtype
    ):
        raise ValueError(
            f"add_column type {dtype!r} not supported: one of "
            f"{_ADDABLE_TYPES} or decimal(p,s)"
        )
    schema = [list(x) for x in man["schema"]] + [[name, dtype]]
    return _commit(
        path, cur + 1, man["files"], "add_column", schema,
        man.get("file_stats"), man.get("delete_files"),
        renames=renames, dropped=dropped,
    )


def drop_column(path: str, name: str) -> int:
    """ALTER TABLE DROP COLUMN as a metadata-only commit: the column
    leaves the schema (readers project it away; the bytes remain in
    existing files until a rewrite — time travel still shows them).
    The name enters the graveyard forever (reuse ban above). Rejected
    while a table property references the column, when it is the LAST
    column, or while any delete sidecar keys on it (the mask would
    become unappliable and silently resurrect rows — purge_deletes
    first)."""
    cur, man, renames, dropped, universe = _ddl_state(path)
    cols = [c for c, _ in man["schema"]]
    if name not in cols:
        raise ValueError(f"{name!r} is not a table column")
    if len(cols) == 1:
        raise ValueError("cannot drop the last column")
    refs = _spec_refs(path, name)
    if refs:
        raise ValueError(
            f"cannot drop {name!r}: referenced by {', '.join(refs)}"
        )
    fwd = dict(renames)
    for e in man.get("delete_files") or []:
        k = e["key"]
        seen = set()
        while k in fwd and k not in cols and k not in seen:
            seen.add(k)
            k = fwd[k]
        if k == name:
            raise ValueError(
                f"cannot drop {name!r}: a merge-on-read delete sidecar "
                "keys on it; purge_deletes first"
            )
    schema = [[c, t] for c, t in man["schema"] if c != name]
    stats = {
        f: {k: v for k, v in s.items() if k != name}
        for f, s in (man.get("file_stats") or {}).items()
    }
    return _commit(
        path, cur + 1, man["files"], "drop_column", schema, stats,
        man.get("delete_files"),
        renames=renames, dropped=dropped + [name],
    )


def rename_column(path: str, old: str, new: str) -> int:
    """ALTER TABLE RENAME COLUMN as a metadata-only commit: the chain
    entry [old, new] rides in the manifest, and readers COALESCE the
    logical column over its name history (pre-rename files carry the
    old physical name; files written afterwards the new — a rewrite
    migrates rows to the new name as a side effect). Manifest stats
    re-key to the new name so pruning keeps biting on old files.
    Rejected while a table property references the column (layout and
    constraint SQL must not drift — drop the property first), and for
    any target name ever used before (reuse ban)."""
    import re

    cur, man, renames, dropped, universe = _ddl_state(path)
    cols = [c for c, _ in man["schema"]]
    if old not in cols:
        raise ValueError(f"{old!r} is not a table column")
    if not re.fullmatch(_IDENT_RE, new):
        raise ValueError(f"column name {new!r} is not a plain identifier")
    if new in universe:
        raise ValueError(
            f"column name {new!r} was already used in this table's "
            "history (name reuse would resurrect old files' bytes)"
        )
    refs = _spec_refs(path, old)
    if refs:
        raise ValueError(
            f"cannot rename {old!r}: referenced by {', '.join(refs)}"
        )
    schema = [[new if c == old else c, t] for c, t in man["schema"]]
    stats = {
        f: {(new if k == old else k): v for k, v in s.items()}
        for f, s in (man.get("file_stats") or {}).items()
    }
    return _commit(
        path, cur + 1, man["files"], "rename_column", schema, stats,
        man.get("delete_files"),
        renames=renames + [[old, new]], dropped=dropped,
    )


def vacuum_orphans(
    path: str, older_than_s: float = 86400.0, dry_run: bool = False
) -> list[str]:
    """Reclaim crashed-COMMIT debris that :func:`vacuum_table` does
    not touch (round 14): the recovery tool the ``CommitConflict``
    message ("leftovers of a crashed commit needing cleanup") points
    at.

    Two debris classes, both age-gated by mtime (an IN-FLIGHT writer's
    artifacts must survive — default horizon one day):

    - ``_manifests/.v*.json.tmp.*`` — a writer died between writing
      its manifest temp and the hard link. Harmless but accumulates.
    - ``data/v<N>/`` with NO manifest v<N> and N NEWER than every
      retained version — a writer won the data-directory rename, then
      died before the manifest link. This WEDGES the table: every
      later writer of version N loses the rename race against a ghost
      and retries forever. No manifest ≥ N exists, so by the
      write-once rule nothing can reference these files — removing
      the directory is provably safe. (Manifestless directories at or
      BELOW the retained range are NOT touched: later manifests may
      carry their files by reference; that is vacuum_table territory.)

    Returns the removed (or, with ``dry_run=True``, would-remove)
    paths."""
    import time

    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"no versioned table at {path}")
    cutoff = time.time() - older_than_s
    removed: list[str] = []
    mdir = pathlib.Path(path) / _MANIFEST_DIR
    for tmp in mdir.glob(".v*.json.tmp.*"):
        if tmp.stat().st_mtime <= cutoff:
            removed.append(str(tmp))
            if not dry_run:
                tmp.unlink(missing_ok=True)
    data_root = pathlib.Path(path) / _DATA_DIR
    head = vs[-1]
    if data_root.is_dir():
        for d in sorted(data_root.iterdir()):
            m = (
                d.is_dir()
                and not d.name.startswith(".")
                and d.name.startswith("v")
            )
            if not m:
                continue
            try:
                n = int(d.name[1:])
            except ValueError:
                continue
            if n <= head or n in vs:
                continue  # retained or potentially carried: not ours
            if d.stat().st_mtime > cutoff:
                continue  # could be a commit in flight
            removed.append(str(d))
            if not dry_run:
                shutil.rmtree(d, ignore_errors=True)
    return removed


def purge_deletes(spark: SparkSession, path: str) -> int:
    """Materialize every merge-on-read delete mask into clean data
    files (round 14 — Iceberg's rewrite-position-deletes / the
    compaction step that keeps MOR tables readable fast): files that
    can contain masked rows are rewritten with the masks APPLIED, all
    other files carry forward by reference, and the new version
    carries NO delete sidecars.

    Why it exists at 100 TB: every sidecar is a scan-time anti-join
    tax on every reader, and metadata answers (``table_minmax`` /
    ``table_rowcount``) fail closed while masks exist. Purging pays
    one bounded rewrite to restore the zero-sidecar reading plane.

    File selection is stats-driven and O(masked files): a file is
    rewritten only when some sidecar's sequence EXCEEDS the file's
    (the sequence rule — older sidecars cannot mask newer files) AND
    the sidecar's key range overlaps the file's recorded range for
    that key. String keys and files without usable stats rewrite
    conservatively (parquet string stats may be truncated — a missed
    rewrite would resurrect deleted rows, so fail CLOSED into the
    rewrite). Carried files therefore provably hold no masked row,
    which is what makes dropping ALL sidecars exact.

    A recorded cluster/bucket layout is re-applied to the rewritten
    rows. Committing with no sidecars is a no-op version guard: calling
    purge on a mask-free table just returns the current version."""
    from pyspark.sql import functions as F

    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"no versioned table at {path}")
    cur = vs[-1]
    man = _load_manifest(path, cur)
    entries = man.get("delete_files") or []
    if not entries:
        return cur
    fstats = man.get("file_stats") or {}
    schema = man.get("schema")
    types = dict(schema or [])
    # per-sidecar key bounds (sidecars are small; one tiny agg each)
    bounds: list[tuple[str, int, object, object]] = []
    for e in entries:
        key = e["key"]
        row = (
            spark.read.parquet(str(pathlib.Path(path) / e["file"]))
            .agg(F.min(key).alias("lo"), F.max(key).alias("hi"))
            .collect()[0]
        )
        bounds.append((key, int(e["seq"]), row.lo, row.hi))

    def _may_hold_masked(f: str) -> bool:
        s = _seq_of(f)
        st = fstats.get(f) or {}
        if st.get("__rows") == 0:
            return False
        for key, dseq, lo, hi in bounds:
            if s >= dseq or lo is None:
                continue  # sequence rule / empty sidecar
            t = types.get(key, "")
            if t not in ("tinyint", "smallint", "int", "bigint"):
                # strings: parquet stats may be truncated (a missed
                # rewrite resurrects deleted rows); date/timestamp:
                # manifest stats are ISO strings while the sidecar agg
                # returns python datetimes — either way, fail CLOSED
                # into the rewrite rather than compare across domains
                return True
            rng = st.get(key)
            if not rng:
                return True  # no usable stats: rewrite
            flo, fhi = rng
            if not (fhi < lo or flo > hi):
                return True
        return False

    affected = [f for f in man["files"] if _may_hold_masked(f)]
    untouched = [f for f in man["files"] if f not in set(affected)]
    new_files: list[str] = []
    new_stats: dict[str, dict] = {}
    srows = None
    if affected:
        base = _apply_delete_masks(
            spark, path,
        _read_files(spark, path, affected, schema, man.get("renames")),
        man
        )
        bcol, bn = _spec_bucket(path)
        spec_cluster, spec_kind = _spec_cluster(path)
        if spec_cluster:
            base = _cluster(base, spec_cluster, len(affected), spec_kind)
        elif bcol is not None:
            scols, srows = _spec_bucket_sort(path)
            base = _bucket_df(base, bn, bcol, scols)
        new_files, new_stats = _write_data_and_stats(
            base, path, cur + 1, max_records=srows
        )
    stats = {f: s for f, s in fstats.items() if f in set(untouched)}
    bcol, bn = _spec_bucket(path)
    if bcol is not None:
        _stamp_buckets(
            new_stats, new_files, bn,
            allow_splits=bool(_spec_bucket_sort(path)[0]),
        )
    stats.update(new_stats)
    return _commit(
        path, cur + 1, untouched + new_files, "purge", schema, stats
    )


def version_at_timestamp(path: str, timestamp: float) -> int:
    """The version a reader at wall-clock ``timestamp`` (epoch seconds,
    or a ``datetime`` / ISO-8601 string — naive values are taken as
    UTC) would have seen: the NEWEST retained version committed at or
    before it — the Delta ``timestampAsOf`` resolution rule. Raises
    when the timestamp predates the oldest retained commit (that
    history was vacuumed or never existed)."""
    import datetime

    if isinstance(timestamp, str):
        timestamp = datetime.datetime.fromisoformat(timestamp)
    if isinstance(timestamp, datetime.datetime):
        if timestamp.tzinfo is None:
            timestamp = timestamp.replace(tzinfo=datetime.timezone.utc)
        timestamp = timestamp.timestamp()
    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"no versioned table at {path}")
    best = None
    for v in vs:
        if _load_manifest(path, v)["committed_at"] <= timestamp:
            best = v
    if best is None:
        raise FileNotFoundError(
            f"no retained version of {path} committed at or before "
            f"{timestamp} (oldest retained is v{vs[0]})"
        )
    return best


def read_table(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    prune: tuple[str, str, object] | list | None = None,
    timestamp: float | None = None,
) -> DataFrame:
    """Read a committed version (None = latest). Time travel: the file
    list is exactly what that version's manifest pinned. ``timestamp``
    (exclusive with ``version``) resolves through
    :func:`version_at_timestamp` — the Delta ``timestampAsOf`` shape.

    ``prune=(col, op, value)`` (op in ==, >=, <=, >, <, in — ``"in"``
    takes a value list, the batched-lookup shape) — or a LIST of such
    triples with AND semantics, so a middle-slice read
    ``[("k", ">=", lo), ("k", "<", hi)]`` prunes both sides — uses the
    manifest's per-file min/max ranges to SKIP files whose range
    cannot contain a matching row, then applies the same predicate as
    a DataFrame filter so results are exact regardless of how many
    files the stats eliminated. This is the manifest-level pruning a
    100 TB time-travel read needs: parquet footer pushdown only helps
    after a file is opened; the manifest check avoids listing/opening
    the file at all."""
    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"no versioned table at {path}")
    if timestamp is not None:
        if version is not None:
            raise ValueError("pass version OR timestamp, not both")
        version = version_at_timestamp(path, timestamp)
    v = vs[-1] if version is None else version
    if v not in vs:
        raise FileNotFoundError(f"version {v} not in {vs}")
    man = _load_manifest(path, v)
    files = man["files"]
    if not files:
        raise ValueError(f"version {v} has no files")
    preds = _norm_prune(prune)
    if preds:
        files = _passing_files(path, man, files, preds)
        if not files:
            # every file pruned: empty result with the table schema
            schema = man.get("schema")
            if schema:
                from pyspark.sql.types import _parse_datatype_string

                ddl = ", ".join(f"`{n}` {t}" for n, t in schema)
                return spark.createDataFrame([], _parse_datatype_string(ddl))
            files = man["files"][:1]  # pre-schema manifest: read one file
    df = _apply_delete_masks(
        spark, path,
        _read_files(
            spark, path, files, man.get("schema"), man.get("renames")
        ),
        man
    )
    if preds:
        df = df.where(_prune_cond(preds))
    return df


def files_scanned(
    path: str, version: int | None = None,
    prune: tuple[str, str, object] | list | None = None,
) -> int:
    """How many data files :func:`read_table` would open for this
    version/predicate (triple or AND-list, as in ``read_table``) —
    the observable for pruning tests and ops dashboards."""
    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"no versioned table at {path}")
    v = vs[-1] if version is None else version
    man = _load_manifest(path, v)
    files = man["files"]
    preds = _norm_prune(prune)
    if not preds:
        return len(files)
    return len(_passing_files(path, man, files, preds))


def _split_files_by_stats(
    man: dict, col: str, lo, hi
) -> tuple[list[str], list[str]]:
    """Partition the manifest's files into (untouched, affected) for a
    copy-on-write rewrite targeting rows with ``col`` in [lo, hi]: a
    file whose recorded [min, max] range cannot intersect the target
    range carries FORWARD BY REFERENCE (zero I/O); a file that might
    contain a target row — or has no stats — must be rewritten. This
    is why the manifest keeps per-file ranges: at 100 TB a point
    upsert touches a handful of files, not the table."""
    fstats = man.get("file_stats") or {}
    lo, hi = _stat_probe(lo), _stat_probe(hi)
    untouched, affected = [], []
    for f in man["files"]:
        rng = (fstats.get(f) or {}).get(col)
        if rng is not None and (rng[1] < lo or rng[0] > hi):
            untouched.append(f)
        else:
            affected.append(f)
    return untouched, affected


def merge_table(
    df: DataFrame,
    path: str,
    key: str,
    delete_col: str | None = None,
    op_label: str = "merge",
    cluster_by: list[str] | None = None,
    evolve: bool = False,
    update_cols: list[str] | None = None,
    txn: tuple[str, int] | None = None,
    empty_ok: bool = False,
) -> int:
    """Copy-on-write UPSERT (the table-format MERGE core): rows of
    ``df`` REPLACE current rows with the same ``key`` value; keys not
    present insert. Only data files whose manifest [min, max] range of
    ``key`` intersects ``df``'s key range are rewritten — every other
    file carries into the new version by reference, untouched on disk
    (old versions keep reading the old files; time travel is
    unaffected). ``df`` must have at most one row per key (the upsert
    is otherwise ambiguous); enforce upstream with dropDuplicates.

    ``delete_col`` (round 11, the Delta ``whenMatchedDelete`` arm):
    names a boolean column of ``df`` — NOT a table column — marking
    rows whose matched key is DELETED instead of replaced (NULL flag
    = false = upsert). A delete row whose key matches nothing is a
    no-op, as in Delta; delete keys still participate in file-range
    selection so the files holding them rewrite. One merge therefore
    applies a mixed insert/update/delete changeset in a single commit
    — the shape a CDC apply or an index maintainer emits. ``op_label``
    brands the committed manifest's ``op`` (default ``"merge"``) so
    derived-structure maintainers can ride their watermark on the same
    atomic commit instead of patching manifests after the fact.

    Rewrite plan: read the affected files, anti-join their rows out on
    ``key`` (Catalyst/AQE picks broadcast when ``df`` is small — the
    common CDC case), union the surviving upsert rows, write as the
    new version's files. One shuffle-or-broadcast join over ONLY the
    affected bytes.

    ``cluster_by`` (round 12, the optimized-write analog): range-
    repartition + sort the rewritten rows on these columns before
    writing, preserving a clustered layout's file-level min/max
    pruning across merges. Without it the rewrite inherits the
    anti-join's hash partitioning, so a merge that touches every file
    of a token-clustered index would silently destroy the disjoint
    ranges a pruned lookup depends on. The rewritten file count stays
    at the affected-file count (layout granularity is preserved, not
    inflated). Defaults to the table's RECORDED clustering spec
    (``create_table(cluster_by=...)``) when one exists, so no caller
    has to remember it; pass ``[]`` to explicitly skip re-clustering
    a clustered table.

    ``update_cols`` (round 13, the Delta ``whenMatchedUpdate(set=...)``
    arm): matched rows update ONLY the named columns, keeping every
    other column's current value — the CDC shape where a feed carries
    one measure, not whole rows. Update-only semantics, as in Delta
    with a lone whenMatchedUpdate clause: source keys that match
    nothing are IGNORED (no inserts — a partial row cannot insert),
    and an explicit NULL in an update column IS written (matched-flag
    join, not coalesce). Composes with ``delete_col`` (mixed
    update/delete changesets); mutually exclusive with ``evolve``
    (a partial update cannot add columns). Type changes are rejected
    by the same schema check as whole-row merges."""
    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"no versioned table at {path}")
    cur = vs[-1]
    from pyspark.sql import functions as F

    # exactly-once replay detection (round 15, same contract as
    # append_table's txn): a replayed (app_id, epoch) is a ZERO-IO
    # no-op — stronger than the keyed merge's per-key idempotence,
    # which still re-reads and rewrites the affected files
    if txn is not None and _txn_replayed(_load_manifest(path, cur), txn):
        return cur
    if update_cols is not None:
        if not update_cols:
            raise ValueError("update_cols must name at least one column")
        if key in update_cols:
            raise ValueError("the merge key cannot be an update column")
        if evolve:
            raise ValueError(
                "update_cols and evolve are mutually exclusive - a "
                "partial update cannot add columns"
            )
        missing = [
            c
            for c in [key, *update_cols]
            if c not in df.columns
        ]
        if missing:
            raise ValueError(f"merge source lacks columns {missing}")

    upserts = df
    if delete_col is not None:
        if delete_col not in df.columns:
            raise ValueError(
                f"delete_col {delete_col!r} is not a column of the merge source"
            )
        man_schema = _load_manifest(path, cur).get("schema")
        if man_schema and delete_col in {c for c, _ in man_schema}:
            raise ValueError(
                f"delete_col {delete_col!r} collides with a table column - "
                "name the flag something outside the table schema"
            )
        flag = F.coalesce(F.col(delete_col).cast("boolean"), F.lit(False))
        upserts = df.where(~flag).drop(delete_col)
    man = _load_manifest(path, cur)
    # ``evolve`` (round 12, Delta's MERGE autoMerge shape — the same
    # additive contract append_table already offers): a CDC feed that
    # grew a column may merge it in; existing files read as null
    # there, survivors of rewritten files union in by name. Type
    # changes to an existing column are always rejected.
    if evolve and man.get("schema") is not None:
        schema = _merge_schema(
            man["schema"], _schema_fields(upserts), man
        )
    elif update_cols is not None:
        # only the key + update columns must exist and type-match; the
        # source may carry extra context columns, which are ignored
        _check_schema(upserts.select(key, *update_cols), path, cur)
        schema = man.get("schema") or _schema_fields(upserts)
    else:
        _check_schema(upserts, path, cur)
        schema = man.get("schema") or _schema_fields(upserts)
    spark = df.sparkSession

    # one pass computes bounds AND detects null keys: a null-key row
    # would pass the bounds check, never match the left_anti join
    # (null equality), and be re-inserted as a fresh duplicate on
    # EVERY retry — breaking the at-least-once idempotency contract
    # of stream_merge_to_table (ADVICE r6). Fail loudly instead.
    bounds = df.agg(
        F.min(key), F.max(key), F.count(F.lit(1)), F.count(key)
    ).collect()[0]
    if bounds[2] == 0:
        # ``empty_ok`` (round 17): CDC appliers probe emptiness anyway
        # to skip content-identical commits — folding the probe into
        # the bounds aggregate this job already pays removes one full
        # pass over the changeset per micro-batch. No commit: the
        # current version is returned unchanged.
        if empty_ok:
            return cur
        raise ValueError("merge source has no rows (or all-null keys)")
    if bounds[2] != bounds[3]:
        raise ValueError(
            f"merge source has {bounds[2] - bounds[3]} null {key!r} rows - "
            "an upsert key must be non-null (null never equi-joins, so "
            "such rows would duplicate on every retried application); "
            "drop or key them upstream"
        )
    bcol, bn = _spec_bucket(path)
    if bcol is not None and key == bcol:
        # hash-bucketed layout + bucket-keyed merge (round 13): file
        # selection is BUCKET IDENTITY, not key range — the pruning
        # that still works when keys are uuid-shaped and every file
        # spans the whole key range. One tiny distinct-buckets job
        # over the changeset (≤ n rows collected).
        hit = {
            r.b
            for r in df.select(
                F.pmod(F.hash(F.col(key)), F.lit(bn)).alias("b")
            )
            .distinct()
            .collect()
        }
        fstats_all = man.get("file_stats") or {}
        # spec evolution (round 15): `hit` is computed under the
        # CURRENT bucket spec, so only files written under that same
        # era may be bucket-skipped — a file stamped under an older
        # spec (different count or column) is always a rewrite
        # candidate, which also migrates it into the current layout.
        man_specs = man.get("specs")
        untouched = [
            f
            for f in man["files"]
            if (fstats_all.get(f) or {}).get("__bucket") is not None
            and _era_bucket_spec(fstats_all.get(f), man_specs, bcol, bn)
            == (bcol, bn)
            and (fstats_all.get(f) or {}).get("__bucket") not in hit
        ]
        affected = [f for f in man["files"] if f not in set(untouched)]
    else:
        untouched, affected = _split_files_by_stats(
            man, key, bounds[0], bounds[1]
        )
    new_files: list[str] = []
    new_stats: dict[str, dict] = {}
    merged: DataFrame | None
    if affected:
        old = _apply_delete_masks(
            spark, path,
            _read_files(
                spark, path, affected, man.get("schema"),
                man.get("renames"),
            ),
            man,
        )
        if update_cols is not None:
            work = old
            if delete_col is not None:
                dels = df.where(
                    F.coalesce(F.col(delete_col).cast("boolean"), F.lit(False))
                ).select(key)
                work = old.join(dels, key, "left_anti")
            src = upserts.select(
                F.col(key),
                *[F.col(c).alias(f"__u_{c}") for c in update_cols],
                F.lit(True).alias("__m"),
            )
            joined = work.join(src, key, "left")
            merged = joined.select(
                *[
                    (
                        F.when(F.col("__m"), F.col(f"__u_{c}"))
                        .otherwise(F.col(c))
                        .alias(c)
                        if c in update_cols
                        else F.col(c)
                    )
                    for c in work.columns
                ]
            )
        else:
            survivors = old.join(df.select(key).distinct(), key, "left_anti")
            # the source may omit table columns (_check_schema's Iceberg
            # subset contract): replacement is whole-row, so a replaced
            # row's omitted columns become null, same as a reader sees
            # pre-evolution files
            merged = survivors.unionByName(upserts, allowMissingColumns=True)
    elif update_cols is not None:
        # update-only semantics with nothing matched: a no-op version
        # (unmatched source keys are ignored, never inserted)
        merged = None
    else:
        merged = upserts
    srows = None
    if merged is not None:
        if bcol is not None:
            if cluster_by:
                raise ValueError(
                    "cannot re-cluster a hash-bucketed table - the bucket "
                    "layout is the recorded property"
                )
            scols, srows = _spec_bucket_sort(path)
            merged = _bucket_df(merged, bn, bcol, scols)
        else:
            cluster_kind = "range"
            if cluster_by is None:
                cluster_by, cluster_kind = _spec_cluster(path)
            if cluster_by:
                merged = _cluster(
                    merged, cluster_by, len(affected), cluster_kind
                )
        new_files, new_stats = _write_data_and_stats(
            merged, path, cur + 1, max_records=srows
        )
        _validate_constraints(spark, path, new_files, cur + 1, schema)
    stats = {
        f: s
        for f, s in (man.get("file_stats") or {}).items()
        if f in set(untouched)
    }
    if bcol is not None:
        _stamp_buckets(
            new_stats, new_files, bn,
            allow_splits=bool(_spec_bucket_sort(path)[0]),
        )
    stats.update(new_stats)
    return _commit(
        path, cur + 1, untouched + new_files, op_label,
        schema,
        stats,
        man.get("delete_files"),  # masks still cover the untouched files
        txn=txn,
    )


def table_changes(
    spark: SparkSession, path: str, v_from: int, v_to: int, key: str
) -> DataFrame:
    """Row-level change feed between two committed versions (the
    Delta/Iceberg CDF shape), computed from the MANIFEST DIFF: a file
    carried by reference from ``v_from`` to ``v_to`` is byte-identical,
    so only the files EXCLUSIVE to one side are ever read — at scale a
    change feed costs O(changed files), never a two-full-snapshot
    diff. Because copy-on-write rewrites whole files, an exclusive
    file still holds unchanged rows (the non-matching survivors); the
    key-level full-outer join below re-derives row-level ops from the
    file-level diff and drops content-identical rows.

    Requires ``key`` to be unique within each snapshot (the
    ``merge_table`` upsert contract). → ``(_change_type, *columns)``
    with ``_change_type`` ∈ ``insert`` (key only in ``v_to``),
    ``delete`` (key only in ``v_from``; row = the pre-image),
    ``update_preimage`` / ``update_postimage`` (key in both with
    different content — two rows, Delta CDF naming).

    Merge-on-read deletes compose: each side reads under ITS
    manifest's delete masks, and a sidecar committed inside the
    window (present in ``v_to`` only) additionally surfaces its
    victims from CARRIED files — those reads are restricted by the
    sidecar's key bounds against the manifest file stats, so the cost
    tracks the deleted-key spread, not the table."""
    from pyspark.sql import functions as F

    man_from = _load_manifest(path, v_from)
    man_to = _load_manifest(path, v_to)
    from_files = set(man_from["files"])
    to_files = set(man_to["files"])
    only_from = sorted(from_files - to_files)
    only_to = sorted(to_files - from_files)
    schema = man_to.get("schema") or man_from.get("schema")
    cols = (
        [c for c, _ in schema]
        if schema
        else _read_files(spark, path, sorted(to_files), None).columns
    )
    empty = spark.createDataFrame(
        [], _read_files(spark, path, sorted(to_files or from_files), schema).schema
    )
    # the rename chain only grows, so man_to's is the superset — and
    # the FROM-era files must read (and resolve mask keys) under it,
    # because the frame is aligned to the TO schema's names: the
    # from-era chain alone would null a renamed column out of every
    # pre-image (alias intersection with present columns keeps the
    # superset chain exact for both eras)
    chain = list(man_from.get("renames") or [])
    for rn in man_to.get("renames") or []:
        if rn not in chain:
            chain.append(rn)
    man_from = {**man_from, "renames": chain}
    man_to = {**man_to, "renames": chain}
    old = (
        _apply_delete_masks(
            spark, path,
            _read_files(spark, path, only_from, schema, chain),
            man_from,
        )
        if only_from
        else empty
    )
    new = (
        _apply_delete_masks(
            spark, path,
            _read_files(
                spark, path, only_to, schema, man_to.get("renames")
            ),
            man_to,
        )
        if only_to
        else empty
    )
    # Sidecar churn masks/unmasks rows of files BOTH manifests carry.
    # Two symmetric passes (each restricted by the sidecar's key
    # bounds against the carried files' stats, so the cost tracks the
    # deleted-key spread, not the table):
    #   * a sidecar ADDED in the window hides rows that were visible
    #     at ``v_from`` — surface them as the old side's pre-images;
    #   * a sidecar REMOVED in the window (``restore_table`` to a
    #     pre-delete version) re-exposes rows at ``v_to`` — surface
    #     them as the new side's post-images, else a feed across a
    #     restore silently drops the reappearing rows and every
    #     derived view/index that rides it diverges forever.
    dels_from = man_from.get("delete_files") or []
    dels_to = man_to.get("delete_files") or []
    carried = sorted(from_files & to_files)
    fstats = {
        **(man_from.get("file_stats") or {}),
        **(man_to.get("file_stats") or {}),
    }

    def _sidecar_matches(entries: list[dict], mask_man: dict):
        """Rows of CARRIED files, read under ``mask_man``'s masks,
        whose key a sidecar in ``entries`` masks (seq rule) — i.e.
        the rows whose visibility the window's sidecar churn flips."""
        parts = []
        for e in entries:
            kcol = e["key"]
            ebounds = _file_stats(path, [e["file"]]).get(e["file"], {})
            lo_hi = ebounds.get(kcol)
            scan = [
                f
                for f in carried
                if lo_hi is None
                or (
                    _file_survives(fstats.get(f), kcol, ">=", lo_hi[0])
                    and _file_survives(fstats.get(f), kcol, "<=", lo_hi[1])
                )
            ]
            if not scan:
                continue
            # stamp the file sequence BEFORE masking: input_file_name
            # is only legal over a single-source plan, and the mask
            # join adds the sidecar source (masking preserves
            # pre-existing columns, so __seq rides through)
            data = _apply_delete_masks(
                spark, path,
                _read_files(
                    spark, path, scan, schema, man_to.get("renames")
                ).withColumn(
                    "__seq",
                    F.regexp_extract(
                        F.input_file_name(), r"/v(\d{8})/", 1
                    ).cast("long"),
                ),
                mask_man,
            )
            kd = spark.read.parquet(
                str(pathlib.Path(path) / e["file"])
            ).select(
                F.col(kcol).alias("__delk"),
                F.lit(int(e["seq"])).cast("long").alias("__delseq"),
            )
            cur_key = _resolve_mask_key(
                kcol, cols, man_to.get("renames")
            )
            parts.append(
                data.alias("d")
                .join(
                    kd.alias("k"),
                    on=(
                        (F.col(f"d.{cur_key}") == F.col("k.__delk"))
                        & (F.col("k.__delseq") > F.col("d.__seq"))
                    ),
                    how="left_semi",
                )
                .select(*cols)
            )
        if not parts:
            return None
        out = parts[0]
        for part in parts[1:]:
            out = out.unionByName(part)
        # two sidecars may list the same key (delete of an already-
        # deleted row): one image per CDF key
        return out.dropDuplicates([key])

    if carried:
        victims = _sidecar_matches(
            [e for e in dels_to if e not in dels_from], man_from
        )
        if victims is not None:
            old = old.unionByName(victims)
        reappeared = _sidecar_matches(
            [e for e in dels_from if e not in dels_to], man_to
        )
        if reappeared is not None:
            new = new.unionByName(reappeared)
    others = [c for c in cols if c != key]
    o = old.select(
        F.col(key).alias("__k"),
        F.struct(*[F.col(c) for c in cols]).alias("__pre"),
    )
    n = new.select(
        F.col(key).alias("__k"),
        F.struct(*[F.col(c) for c in cols]).alias("__post"),
    )
    j = o.join(n, "__k", "full_outer")
    same = (
        F.struct(*[F.col(f"__pre.{c}") for c in others]).eqNullSafe(
            F.struct(*[F.col(f"__post.{c}") for c in others])
        )
        if others
        else F.lit(True)
    )
    # ONE pass over the join: tag each row with its 0-2 ops and
    # explode. The naive 4-way union of per-op selections replicates
    # the whole join subtree (and its exclusive-file scans) once per
    # branch in the physical plan — 4x the I/O and join work for
    # every CDF consumer (caught by the r11 refresh plan-shape test).
    pre_s, post_s = F.col("__pre"), F.col("__post")
    both = pre_s.isNotNull() & post_s.isNotNull()

    def tagged(tag: str, side):
        return F.struct(
            F.lit(tag).alias("_change_type"), side.alias("__row")
        )

    candidates = F.array(
        F.when(pre_s.isNull(), tagged("insert", post_s)),
        F.when(post_s.isNull(), tagged("delete", pre_s)),
        F.when(both & ~same, tagged("update_preimage", pre_s)),
        F.when(both & ~same, tagged("update_postimage", post_s)),
    )
    ops = F.filter(candidates, lambda x: x.isNotNull())
    return j.select(F.explode(ops).alias("__op")).select(
        F.col("__op._change_type").alias("_change_type"),
        *[F.col(f"__op.__row.{c}").alias(c) for c in cols],
    )


def delete_where(
    spark: SparkSession,
    path: str,
    predicate,
    txn: tuple[str, int] | None = None,
) -> int:
    """Copy-on-write row-level DELETE: commit a new version without the
    rows matching ``predicate`` — one (col, op, value) triple or a
    LIST of them with AND semantics, same as ``read_table``'s prune
    (round 13: a ranged delete ``[(ts, ">=", a), (ts, "<", b)]`` now
    rewrites only the files inside the slice). Files whose manifest
    range cannot contain a matching row carry forward by reference;
    only files that might match are rewritten with the matching rows
    filtered out. A file whose rows ALL match is simply dropped from
    the manifest.

    ``txn=(app_id, epoch)`` (round 16, VERDICT r15 task #3): the same
    exactly-once replay guard as :func:`append_table` — a
    stream-driven delete (e.g. a GDPR erasure feed applied per
    micro-batch) whose epoch is ≤ the recorded watermark for its
    app_id is a ZERO-IO no-op returning the current head."""
    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"no versioned table at {path}")
    cur = vs[-1]
    man = _load_manifest(path, cur)
    if _txn_replayed(man, txn):
        return cur  # replayed epoch: already committed, no-op
    preds = _norm_prune(predicate)
    if not preds:
        raise ValueError("delete_where needs a predicate")
    fstats = man.get("file_stats") or {}
    bcol, bn = _spec_bucket(path)
    affected = _passing_files(path, man, man["files"], preds)
    untouched = [f for f in man["files"] if f not in set(affected)]
    new_files: list[str] = []
    new_stats: dict[str, dict] = {}
    if affected:
        cond = _prune_cond(preds)
        kept = _apply_delete_masks(
            spark, path,
            _read_files(
                spark, path, affected, man.get("schema"),
                man.get("renames"),
            ),
            man,
        ).where(~cond)
        srows = None
        if bcol is not None:
            scols, srows = _spec_bucket_sort(path)
            kept = _bucket_df(kept, bn, bcol, scols)
        new_files, new_stats = _write_data_and_stats(
            kept, path, cur + 1, max_records=srows
        )
    stats = {f: s for f, s in fstats.items() if f in set(untouched)}
    if bcol is not None:
        _stamp_buckets(
            new_stats, new_files, bn,
            allow_splits=bool(_spec_bucket_sort(path)[0]),
        )
    stats.update(new_stats)
    return _commit(
        path, cur + 1, untouched + new_files, "delete",
        man.get("schema"), stats,
        man.get("delete_files"),  # masks still cover the untouched files
        txn=txn,
    )


def update_where(
    spark: SparkSession,
    path: str,
    predicate: tuple[str, str, object],
    assignments: dict[str, object],
    txn: tuple[str, int] | None = None,
) -> int:
    """Copy-on-write row-level UPDATE (the SQL ``UPDATE ... SET ...
    WHERE ...`` / Delta ``UPDATE`` shape — round 13, completing the
    DML matrix next to append/merge/delete/restore/clone): rows
    matching ``predicate`` (same (col, op, value) triple as
    ``read_table``'s prune) get each assignment applied; all other
    rows carry unchanged. Files whose manifest range cannot contain a
    matching row carry forward BY REFERENCE — only possibly-matching
    files rewrite, so updating one key range at 100 TB costs one file
    rewrite, not a table rewrite.

    ``assignments`` maps existing columns to their new value: a
    pyspark Column (may reference other columns — ``F.col("v") * 2``),
    a SQL expression string (parsed with ``F.expr``), or a plain
    literal. The table schema is INVARIANT under update — unknown
    target columns or a type-changing assignment raise (schema changes
    go through :func:`overwrite_table`; silent casts hide bugs).
    Merge-on-read masks are read through on the rewrite, so an update
    cannot resurrect a deleted row; untouched files keep their masks
    (the rewritten files' sequence number exceeds every sidecar's, so
    stale masks never re-apply to them). With a recorded ``cluster_by``
    spec the rewritten rows re-cluster, so updating a clustered column
    cannot silently destroy the layout pruned reads depend on.

    ``txn=(app_id, epoch)`` (round 16, VERDICT r15 task #3): the same
    exactly-once replay guard as :func:`append_table` — a replayed
    stream-driven update is a ZERO-IO no-op returning the current
    head."""
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"no versioned table at {path}")
    if not assignments:
        raise ValueError("update_where needs at least one assignment")
    cur = vs[-1]
    man = _load_manifest(path, cur)
    if _txn_replayed(man, txn):
        return cur  # replayed epoch: already committed, no-op
    preds = _norm_prune(predicate)
    if not preds:
        raise ValueError(
            "update_where needs a predicate - an unconditional rewrite "
            "goes through overwrite_table"
        )
    schema = man.get("schema")
    if schema is not None:
        cols = {c for c, _ in schema}
        unknown = sorted(set(assignments) - cols)
        if unknown:
            raise ValueError(
                f"assignment targets {unknown} are not table columns"
            )
    fstats = man.get("file_stats") or {}
    bcol, bn = _spec_bucket(path)
    affected = _passing_files(
        path, man, man["files"], preds, types=dict(schema or [])
    )
    untouched = [f for f in man["files"] if f not in set(affected)]
    new_files: list[str] = []
    new_stats: dict[str, dict] = {}
    if affected:
        cond = _prune_cond(preds)
        base = _apply_delete_masks(
            spark, path,
            _read_files(
                spark, path, affected, man.get("schema"),
                man.get("renames"),
            ),
            man,
        )

        def _value(expr) -> Column:
            if isinstance(expr, Column):
                return expr
            if isinstance(expr, str):
                return F.expr(expr)
            return F.lit(expr)

        # type-check each assignment STANDALONE (when/otherwise would
        # silently coerce — an ANSI runtime cast error at best, a
        # corrupted column at worst). Safe numeric upcasts (int
        # literal into a bigint column, float into double) are applied
        # automatically; anything else raises.
        before = {f.name: f.dataType for f in base.schema.fields}
        probe = {
            f.name: f.dataType
            for f in base.select(
                *[_value(assignments[c]).alias(c) for c in assignments]
            ).schema.fields
        }
        _UP = ["tinyint", "smallint", "int", "bigint"]
        _UPF = ["float", "double"]

        def _fits(src: str, dst: str) -> bool:
            if src == dst:
                return True
            if src in _UP and dst in _UP:
                return _UP.index(src) < _UP.index(dst)
            if src in _UPF and dst in _UPF:
                return _UPF.index(src) < _UPF.index(dst)
            return False

        vals: dict[str, Column] = {}
        bad = []
        for c in assignments:
            src = probe[c].simpleString()
            dst = before[c].simpleString()
            if not _fits(src, dst):
                bad.append(f"{c}: {src} -> {dst}")
                continue
            v_col = _value(assignments[c])
            vals[c] = v_col.cast(dst) if src != dst else v_col
        if bad:
            raise ValueError(
                "update assignments would change column type(s) "
                + ", ".join(sorted(bad))
                + " - cast the assignment explicitly or use overwrite_table"
            )
        updated = base.select(
            *[
                (
                    F.when(cond, vals[c]).otherwise(F.col(c)).alias(c)
                    if c in assignments
                    else F.col(c)
                )
                for c in base.columns
            ]
        )
        srows = None
        spec_cluster, spec_kind = _spec_cluster(path)
        if spec_cluster:
            updated = _cluster(updated, spec_cluster, len(affected), spec_kind)
        elif bcol is not None:
            scols, srows = _spec_bucket_sort(path)
            updated = _bucket_df(updated, bn, bcol, scols)
        new_files, new_stats = _write_data_and_stats(
            updated, path, cur + 1, max_records=srows
        )
        _validate_constraints(
            spark, path, new_files, cur + 1, man.get("schema")
        )
    stats = {f: s for f, s in fstats.items() if f in set(untouched)}
    if bcol is not None:
        _stamp_buckets(
            new_stats, new_files, bn,
            allow_splits=bool(_spec_bucket_sort(path)[0]),
        )
    stats.update(new_stats)
    return _commit(
        path, cur + 1, untouched + new_files, "update",
        man.get("schema"), stats,
        man.get("delete_files"),  # masks still cover the untouched files
        txn=txn,
    )


def overwrite_where(
    df: DataFrame,
    path: str,
    predicate,
    txn: tuple[str, int] | None = None,
) -> int:
    """Atomic slice replacement — the Delta ``replaceWhere`` shape
    (round 16): ONE commit that deletes every current row matching
    ``predicate`` (same (col, op, value) triple / AND-list grammar as
    ``read_table``'s prune) and inserts ``df``'s rows in their place.
    The canonical backfill writer: recompute one day/partition/key
    range and swap it in without a window where the slice is missing
    (delete_where + append_table would commit two versions, and a
    reader — or a crash — between them sees the hole).

    Fail-closed containment: every row of ``df`` must satisfy
    ``predicate`` — a replacement that leaks outside its declared
    slice raises BEFORE anything commits (Delta's replaceWhere
    constraint; silently widening the overwrite is how backfills
    destroy neighbors). Files whose manifest stats cannot intersect
    the predicate carry forward BY REFERENCE — replacing one slice at
    100 TB costs the slice's files, not a table rewrite. Merge-on-read
    masks are read through on the rewrite and KEPT for carried files;
    the replacement batch follows the recorded bucket/sort layout.
    Schema follows append rules (columns may be omitted — they read
    as null — but not added; name is identity).

    ``txn=(app_id, epoch)`` (VERDICT r15 task #3): the same
    exactly-once replay guard as :func:`append_table` — a replayed
    stream-driven backfill is a ZERO-IO no-op returning the current
    head."""
    from pyspark.sql import functions as F

    spark = df.sparkSession
    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"no versioned table at {path}")
    cur = vs[-1]
    man = _load_manifest(path, cur)
    if _txn_replayed(man, txn):
        return cur  # replayed epoch: already committed, no-op
    preds = _norm_prune(predicate)
    if not preds:
        raise ValueError(
            "overwrite_where needs a predicate - a full replacement "
            "goes through overwrite_table"
        )
    _check_schema(df, path, cur)
    schema = man.get("schema") or _schema_fields(df)
    cond = _prune_cond(preds)
    aligned = _align_to_schema(df, schema, man.get("renames"))
    # the replacement lineage feeds TWO actions (the containment
    # count and the write) — and the docstring's canonical caller is
    # an expensive recompute, so persist it across them (review r16:
    # the backfill's compute used to run twice)
    aligned = aligned.persist()
    # containment BEFORE any write: a row may violate the predicate
    # through NULLs too (NULL <op> v is not TRUE), so count the
    # complement of a strict match
    leaked = aligned.where(~F.coalesce(cond, F.lit(False))).count()
    if leaked:
        aligned.unpersist()
        raise ValueError(
            f"overwrite_where: {leaked} replacement row(s) do not "
            "satisfy the predicate - refusing to write outside the "
            "declared slice"
        )
    fstats = man.get("file_stats") or {}
    bcol, bn = _spec_bucket(path)
    affected = _passing_files(
        path, man, man["files"], preds, types=dict(schema)
    )
    untouched = [f for f in man["files"] if f not in set(affected)]
    base = aligned
    if affected:
        kept = _apply_delete_masks(
            spark, path,
            _read_files(
                spark, path, affected, man.get("schema"),
                man.get("renames"),
            ),
            man,
        ).where(~F.coalesce(cond, F.lit(False)))
        base = kept.unionByName(aligned)
    srows = None
    spec_cluster, spec_kind = _spec_cluster(path)
    if bcol is not None and bcol in base.columns:
        scols, srows = _spec_bucket_sort(path)
        base = _bucket_df(base, bn, bcol, scols)
    elif spec_cluster:
        base = _cluster(
            base, spec_cluster, base.rdd.getNumPartitions() or 1,
            spec_kind,
        )
    try:
        new_files, new_stats = _write_data_and_stats(
            base, path, cur + 1, max_records=srows
        )
    finally:
        aligned.unpersist()
    _validate_constraints(spark, path, new_files, cur + 1, schema)
    stats = {f: s for f, s in fstats.items() if f in set(untouched)}
    if bcol is not None:
        _stamp_buckets(
            new_stats, new_files, bn,
            allow_splits=bool(_spec_bucket_sort(path)[0]),
        )
    stats.update(new_stats)
    return _commit(
        path, cur + 1, untouched + new_files, "replace_where",
        schema, stats,
        man.get("delete_files"),  # masks still cover the carried files
        txn=txn,
    )


def table_minmax(
    path: str, col: str, version: int | None = None
) -> tuple:
    """MIN/MAX of a column answered from manifest file stats alone —
    zero data I/O, the aggregate-pushdown companion to
    :func:`table_rowcount` (at 100 TB an extremum over an append-only
    ledger should cost one manifest read, not a scan). Fails CLOSED
    with ``ValueError`` whenever metadata cannot be exact:

    - merge-on-read delete masks present (a masked row could BE the
      recorded extremum);
    - a string-typed column (parquet writers may TRUNCATE binary
      stats — valid as pruning bounds, not as exact extremes);
    - a float/double column with ANY file not provably NaN-free (the
      per-file ``__nan`` commit flag must be recorded False
      everywhere — footer stats exclude NaN, Spark/DuckDB order it
      above every value);
    - any file without complete recorded stats for the column (an
      all-NULL chunk, a pre-stats manifest, an unreadable footer).

    SQL NULL semantics match: stats ignore NULLs, so a column that is
    null in SOME rows still answers exactly; date/timestamp extremes
    come back as the ISO strings the manifest records."""
    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"no versioned table at {path}")
    v = vs[-1] if version is None else version
    if v not in vs:
        raise FileNotFoundError(f"version {v} not in {vs}")
    man = _load_manifest(path, v)
    if man.get("delete_files"):
        raise ValueError(
            f"version {v} of {path} carries merge-on-read delete masks - "
            "a masked row could be the extremum; aggregate over "
            "read_table(...) instead"
        )
    schema = man.get("schema")
    if schema is not None:
        typ = dict((c, t) for c, t in schema).get(col)
        if typ is None:
            raise ValueError(f"{col!r} is not a table column of {path}")
        if typ in ("string", "binary") or typ.startswith("varchar"):
            raise ValueError(
                f"column {col!r} is {typ}: parquet string stats may be "
                "truncated, so manifest bounds are not exact extremes; "
                "aggregate over read_table(...) instead"
            )
    # float/double answer exactly ONLY when every file is provably
    # NaN-free (round 15, VERDICT r14 task #5 — refining r14's
    # unconditional fail-closed): parquet footer stats exclude NaN
    # while Spark and DuckDB order NaN above every value, so a
    # manifest max() silently misses a NaN extremum — unless the
    # commit-time ``__nan`` flag recorded False for the column in
    # EVERY non-empty file. A missing flag (pre-r15 manifest) or a
    # True flag still fails closed.
    need_nan_free = typ in ("float", "double") if schema is not None else False
    fstats = man.get("file_stats") or {}
    lo = hi = None
    for f in man["files"]:
        fs = fstats.get(f) or {}
        if fs.get("__rows") == 0:
            continue  # an empty file contributes no extremum
        if need_nan_free:
            flag = (fs.get("__nan") or {}).get(col)
            if flag is not False:
                state = "holds NaN" if flag else "has no NaN flag recorded"
                raise ValueError(
                    f"column {col!r} is {typ} and file {f} of {path}@v{v} "
                    f"{state}: parquet footer stats exclude NaN while "
                    "Spark and DuckDB order NaN above every value, so a "
                    "manifest extremum would be silently wrong; "
                    "aggregate over read_table(...) instead"
                )
        rng = fs.get(col)
        if not rng:
            raise ValueError(
                f"file {f} of {path}@v{v} has no usable stats for "
                f"{col!r} (all-NULL chunk, pre-stats manifest, or "
                "unreadable footer); aggregate over read_table(...) instead"
            )
        flo, fhi = rng
        lo = flo if lo is None or flo < lo else lo
        hi = fhi if hi is None or fhi > hi else hi
    return lo, hi


def stream_to_table(stream_df: DataFrame, path: str, checkpoint: str):
    """Streaming sink: commit each non-empty micro-batch as one atomic
    table version via ``foreachBatch`` + :func:`append_table` (first
    batch creates the table). Readers always see a committed prefix of
    the stream — never a half-written batch — and any historical
    version replays exactly. Combined with the checkpoint, restarts
    re-deliver only unprocessed batches (the batch→version mapping is
    monotone; a batch retried AFTER its append committed would
    duplicate, the standard at-least-once caveat of side-effecting
    foreachBatch sinks — deduplicate upstream by key or accept
    at-least-once, as with any external-commit sink).

    Returns the started ``StreamingQuery``."""

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        try:
            append_table(batch_df, path)
        except FileNotFoundError:
            create_table(batch_df, path)

    return (
        stream_df.writeStream.foreachBatch(commit)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def _txn_replayed(man: dict, txn: tuple[str, int] | None) -> bool:
    """True when ``txn``'s epoch is ≤ the manifest's recorded
    watermark for its app_id — the shared replay test every
    txn-stamped writer (create/append/merge/overwrite/delete/update/
    compact/replace_where) runs before doing any work. One helper so
    a change to replay semantics lands in every writer at once
    (review r16: the 3-line guard had been copy-pasted six times)."""
    if txn is None:
        return False
    recorded = (man.get("txns") or {}).get(str(txn[0]))
    return recorded is not None and int(txn[1]) <= recorded


def last_txn_epoch(path: str, app_id: str) -> int | None:
    """The highest epoch ``app_id`` has committed to the table (its
    manifest ``txns`` watermark), or None if it never wrote. The map is
    inherited commit-to-commit, so this reads ONE manifest — the
    head — regardless of history length."""
    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"no versioned table at {path}")
    rec = (_load_manifest(path, vs[-1]).get("txns") or {}).get(str(app_id))
    return None if rec is None else int(rec)


def stream_ingest_to_table(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    app_id: str | None = None,
    evolve: bool = False,
):
    """EXACTLY-ONCE streaming sink (round 15, VERDICT r14 task #2):
    commit each non-empty micro-batch as one atomic manifest version,
    stamped with ``(app_id, batch_id)`` through the ``txns`` watermark
    (see :func:`append_table`). Where :func:`stream_to_table` is
    at-least-once — a batch whose append committed but whose checkpoint
    write was lost duplicates on restart — this sink detects the replay
    in the TABLE (epoch ≤ watermark → no-op), so crash/replay yields
    exactly-once table contents with no upstream dedup key required.
    Spark's ``batchId`` is monotone per checkpoint, which is exactly
    the contract the watermark needs; ``app_id`` defaults to the
    checkpoint path, the identity Spark's replay preserves.

    Each batch is still ONE commit, so the change feed and time travel
    see per-batch versions, and the existing optimistic-concurrency
    arbiter (:func:`with_retry` around the manifest hard-link)
    serializes this sink against any concurrent batch writer.
    ``evolve=True`` passes through to :func:`append_table`'s additive
    schema evolution, for feeds that grow columns mid-stream.

    Returns the started ``StreamingQuery``."""
    app = str(app_id) if app_id is not None else f"ingest:{checkpoint}"

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        txn = (app, int(batch_id))
        try:
            with_retry(
                lambda: append_table(batch_df, path, evolve=evolve, txn=txn)
            )
        except FileNotFoundError:
            try:
                create_table(batch_df, path, txn=txn)
            except FileExistsError:
                # a concurrent creator won (or a replayed FIRST batch
                # found its own earlier create): append-path replay
                # detection settles both cases
                with_retry(
                    lambda: append_table(
                        batch_df, path, evolve=evolve, txn=txn
                    )
                )

    return (
        stream_df.writeStream.foreachBatch(commit)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_merge_to_table(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    key: str,
    delete_col: str | None = None,
    evolve: bool = False,
    app_id: str | None = None,
):
    """Streaming CDC sink: upsert each non-empty micro-batch into the
    versioned table by ``key`` (first batch creates the table). Within
    a batch, later rows win per key (``dropDuplicates`` keeps an
    arbitrary row among exact ties, so feeds should carry a version/ts
    column and pre-aggregate if intra-batch order matters). Combined
    with :func:`merge_table`'s stats-driven copy-on-write, a steady
    CDC trickle rewrites only the files its keys touch — the
    table-format upsert loop (Hudi/Delta streaming MERGE, filesystem
    edition). Same at-least-once caveat as :func:`stream_to_table`:
    a batch retried after its merge committed re-applies — which for
    an UPSERT is idempotent per key, the reason CDC sinks prefer
    merge over append.

    ``delete_col`` (round 11): a Debezium-style feed carries delete
    tombstones; name its boolean flag column and each batch applies
    its mixed upsert/delete changeset through :func:`merge_table`'s
    delete arm — still one atomic version per batch, and a retried
    delete is a matched-nothing no-op, preserving the at-least-once
    idempotency story end to end. A first batch that is pure
    tombstones creates an EMPTY table (the feed may begin mid-history
    with deletes for rows this table never saw).

    ``evolve`` (round 12) passes through to :func:`merge_table`'s
    additive schema evolution, for CDC feeds that grow columns
    mid-stream.

    ``app_id`` (round 15): stamp each batch's commit with the
    ``(app_id, batch_id)`` txn watermark (see :func:`append_table`),
    upgrading the sink to EXACTLY-ONCE — a replayed batch becomes a
    zero-I/O no-op instead of a redundant (if idempotent) re-merge,
    and the version history stops growing on replays. None keeps the
    round-14 unstamped behavior.

    Returns the started ``StreamingQuery``."""
    from pyspark.sql import functions as F

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        txn = (str(app_id), int(batch_id)) if app_id is not None else None
        src = batch_df.dropDuplicates([key])
        try:
            with_retry(
                lambda: merge_table(
                    src, path, key, delete_col=delete_col, evolve=evolve,
                    txn=txn,
                )
            )
        except FileNotFoundError:
            if delete_col is None:
                create_table(src, path, txn=txn)
                return
            flag = F.coalesce(
                F.col(delete_col).cast("boolean"), F.lit(False)
            )
            create_table(src.where(~flag).drop(delete_col), path, txn=txn)

    return (
        stream_df.writeStream.foreachBatch(commit)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def _cursor_path(checkpoint: str) -> pathlib.Path:
    return pathlib.Path(checkpoint) / "cursor.json"


def _read_cursor(checkpoint: str) -> int | None:
    p = _cursor_path(checkpoint)
    if not p.is_file():
        return None
    return int(json.loads(p.read_text())["version"])


def _advance_cursor(checkpoint: str, version: int) -> None:
    p = _cursor_path(checkpoint)
    p.parent.mkdir(parents=True, exist_ok=True)
    tmp = p.parent / f".cursor.tmp.{os.getpid()}"
    tmp.write_text(json.dumps({"version": version}))
    os.replace(tmp, p)  # atomic on POSIX


def stream_table_changes(
    spark: SparkSession,
    path: str,
    key: str,
    checkpoint: str,
    apply_fn,
    from_version: int | None = None,
    max_batches: int | None = None,
) -> int:
    """Incrementally FOLLOW a versioned table (the Delta
    ``readChangeFeed`` streaming shape, availableNow edition): drain
    every commit past the checkpointed cursor as its own micro-batch
    — ``apply_fn(changes_df, version)`` receives the row-level change
    feed of exactly ONE commit (``table_changes(v-1, v)``), in commit
    order — then advance the cursor atomically AFTER the apply
    returns. A consumer that crashes mid-batch re-applies that batch
    on restart (at-least-once, the same contract as the foreachBatch
    sinks above), so apply functions should be idempotent per version
    — a keyed MERGE is, which is why :func:`stream_changes_to_table`
    composes with :func:`merge_table`.

    ``from_version`` seeds a FRESH checkpoint (ignored once a cursor
    exists): cursor = ``from_version`` means "versions > from_version
    are unseen". ``from_version=0`` (the default for a fresh
    checkpoint) emits the table's FIRST version as a synthetic
    all-inserts batch, so a replica can be built purely from the feed.
    Restores compose: a commit that removes delete sidecars emits its
    reappearing rows (see :func:`table_changes`), so followers
    reconverge through a rollback instead of diverging.

    Each batch reads only the commit's version-exclusive files plus
    stat-pruned sidecar victims — the cost of following N commits
    tracks what those commits changed, never N full snapshots.
    Returns the number of batches applied (0 when already caught up).
    """
    from pyspark.sql import functions as F

    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"no versioned table at {path}")
    cursor = _read_cursor(checkpoint)
    if cursor is None:
        cursor = int(from_version) if from_version is not None else 0
        if cursor != 0 and cursor not in vs:
            raise FileNotFoundError(
                f"from_version {cursor} not in retained history {vs}"
            )
    applied = 0
    for v in vs:
        if v <= cursor:
            continue
        if max_batches is not None and applied >= max_batches:
            break
        if cursor == 0 and v == vs[0]:
            # initial load: the first retained version as pure inserts
            snap = read_table(spark, path, version=v)
            batch = snap.select(
                F.lit("insert").alias("_change_type"), *snap.columns
            )
        elif cursor not in vs:
            # the follower lagged past retention: its cursor manifest
            # was vacuumed, so the next delta is uncomputable — name
            # the condition instead of leaking a raw manifest error
            raise FileNotFoundError(
                f"change-feed cursor v{cursor} of {path} was vacuumed "
                f"(retained history starts at v{vs[0]}) - the follower "
                "lagged past retention; rebuild the consumer from a "
                "fresh checkpoint (initial snapshot) or raise the "
                "table's vacuum keep_last"
            )
        else:
            batch = table_changes(spark, path, cursor, v, key)
        apply_fn(batch, v)
        _advance_cursor(checkpoint, v)
        cursor = v
        applied += 1
    return applied


def stream_changes_to_table(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    key: str,
    checkpoint: str,
    from_version: int | None = None,
) -> int:
    """Follow ``src_path``'s change feed into a REPLICA versioned
    table at ``dst_path`` — :func:`stream_table_changes` composed
    with the CDC merge sink's per-batch apply: inserts and
    post-images upsert, deletes delete, pre-images drop (they carry
    no new state). One atomic replica version per source commit;
    a retried batch re-merges the same keyed changeset, which is
    idempotent — the at-least-once story end to end. Returns the
    number of commits applied."""
    from pyspark.sql import functions as F

    def apply(batch: DataFrame, version: int) -> None:
        from optimal_parallel_fp_growth_spark.functions.caching import (
            localcheckpoint_rdd_ids,
            persistent_rdd_ids,
            unpersist_blocks,
        )

        changes = batch.where(F.col("_change_type") != "update_preimage")
        cols = [c for c in changes.columns if c != "_change_type"]
        # localCheckpoint, not persist (r18): the changeset is consumed
        # several times per batch (the merge's bounds/null-key scan,
        # the delete split, the anti-join, the upsert union), and a
        # plain persist leaves the feed's FULL logical plan (read the
        # commit's version-exclusive files + delete masks + the
        # full-outer join + sidecar-churn passes) under every one of
        # those references — the driver re-analyzes that plan per use,
        # which dominated the per-batch wall at bench scale (A/B over
        # 3 alternating reps: follow 11.99 s persist vs 6.96 s cut).
        # The cut materializes the same blocks AND truncates lineage,
        # so every downstream plan is a LogicalRDD. Robustness is
        # unchanged for this applier: a lost block fails the batch and
        # the checkpointed cursor replays it (at-least-once, the
        # documented contract). The emptiness probe (content-identical
        # commit, e.g. compaction) rides the merge's own bounds
        # aggregate (``empty_ok``) instead of a separate isEmpty job.
        # Cleanup set comes from the checkpointed plan's own LogicalRDD
        # id (exact); the diff window is only the fallback — a diff can
        # race a CONCURRENT thread's checkpoint into the set and cut
        # that thread's lineage irrecoverably (r18 review finding).
        sess = batch.sparkSession
        seen = persistent_rdd_ids(sess)
        src = changes.select(
            *cols,
            (F.col("_change_type") == "delete").alias("__cdc_delete"),
        ).dropDuplicates([key]).localCheckpoint()
        blocks = localcheckpoint_rdd_ids(src) or (
            persistent_rdd_ids(sess) - seen
        )
        try:
            try:
                merge_table(
                    src, dst_path, key,
                    delete_col="__cdc_delete", empty_ok=True,
                )
            except FileNotFoundError:
                # bootstrap: no replica yet. The emptiness probe the
                # merge's bounds job normally absorbs runs here, on
                # the rare bootstrap path only (an empty batch stays
                # a no-op, exactly as before the fusion).
                if not src.isEmpty():
                    live = src.where(~F.col("__cdc_delete")).drop(
                        "__cdc_delete"
                    )
                    create_table(live, dst_path)
        finally:
            unpersist_blocks(sess, blocks)

    return stream_table_changes(
        spark, src_path, key, checkpoint, apply, from_version=from_version
    )


def clone_table(
    src: str, dst: str, version: int | None = None, shallow: bool = False
) -> int:
    """Fork ``src`` at ``version`` (default head) into a NEW table at
    ``dst`` — the Delta CLONE shape. The clone starts life at the
    SAME version number with the same file paths, which preserves
    merge-on-read sequence semantics exactly (a sidecar still masks
    only files from older version directories, re-inserted keys
    included); it has no earlier history, and subsequent writes to
    either table never affect the other.

    ``shallow=True`` references the source's files by ABSOLUTE path
    instead of copying — a zero-copy dev/test fork. The clone's own
    vacuum can never delete source files (they live outside its data
    root). The SOURCE's vacuum pulling files out from under a shallow
    clone — the standard shallow-clone hazard — is guarded, not just
    documented (VERDICT r11 task #6): the clone registers itself in
    every source root its references live under (one exclusive-create
    file per clone in the ``_clones/`` registry),
    and :func:`vacuum_table` REFUSES to delete a file a live shallow
    clone still references unless forced."""
    vs = _versions(src)
    if not vs:
        raise FileNotFoundError(f"no versioned table at {src}")
    v = vs[-1] if version is None else version
    if v not in vs:
        raise FileNotFoundError(f"version {v} not in retained history {vs}")
    if _versions(dst):
        raise FileExistsError(f"versioned table already exists at {dst}")
    man = _load_manifest(src, v)
    src_root = pathlib.Path(src).resolve()
    refs = list(man["files"]) + [
        e["file"] for e in man.get("delete_files") or []
    ]
    mapping: dict[str, str] = {}
    for f in refs:
        if shallow:
            mapping[f] = str(src_root / f)
        else:
            target = pathlib.Path(dst) / f
            target.parent.mkdir(parents=True, exist_ok=True)
            shutil.copy2(src_root / f, target)
            # a data file's bloom sidecar blob travels with it (round
            # 17): the manifest's __bloom entries reference it by
            # adjacency, so a deep clone without the blob would
            # silently fail-open every bloom probe. Shallow clones
            # need nothing — the absolute file key resolves the blob
            # under the SOURCE root.
            blob = pathlib.Path(str(src_root / f) + _BLOOM_BLOB_SUFFIX)
            if blob.is_file():
                shutil.copy2(blob, str(target) + _BLOOM_BLOB_SUFFIX)
            mapping[f] = f
    files = [mapping[f] for f in man["files"]]
    dels = [
        {**e, "file": mapping[e["file"]]}
        for e in man.get("delete_files") or []
    ]
    stats = {
        mapping[f]: s
        for f, s in (man.get("file_stats") or {}).items()
        if f in mapping
    }
    kind = "shallow_clone" if shallow else "clone"
    spec = _table_spec(src)
    if spec:
        _write_table_spec(dst, spec)  # the fork keeps its clustering
    out = _commit(
        dst, v, files, f"{kind}:{src}#v{v}", man.get("schema"), stats, dels,
        renames=man.get("renames") or [],
        dropped=man.get("dropped") or [],
        # the clone's first manifest has no predecessor to inherit
        # from, so the spec-era registry must ride along explicitly —
        # losing it would let old-era bucket stamps be read under the
        # current spec
        specs=man.get("specs"),
        spec_id=man.get("spec_id"),
        # the streaming-writer watermark map rides along for the same
        # reason (round 16, advice r15): a DR fork must keep replay
        # detection — a checkpointed stream_ingest sink repointed at
        # the clone sees its last epoch recorded and no-ops the
        # replay, instead of silently re-committing the batch. (Delta
        # clones RESET txn ids; we diverge deliberately — exactly-once
        # survives the fork, and a genuinely new writer should use a
        # fresh app_id.)
        txns=man.get("txns"),
    )
    if shallow:
        # register AFTER the commit so a failed clone leaves no stale
        # guard entry; registered per referenced root, so a shallow
        # clone OF a shallow clone still protects the original table
        _register_clone(os.path.abspath(dst), [mapping[f] for f in refs])
    return out


_CLONES_DIR = "_clones"


def _root_of_data_file(abs_file: str) -> str | None:
    """The versioned-table root an absolute data-file path lives under
    (the path component preceding the LAST ``data/v<8 digits>`` pair),
    or None when the path has no such shape."""
    import re

    parts = pathlib.Path(abs_file).parts
    for i in range(len(parts) - 2, -1, -1):
        if parts[i] == _DATA_DIR and re.fullmatch(r"v\d{8}", parts[i + 1]):
            return str(pathlib.Path(*parts[:i]))
    return None


def _clone_reg_name(dst: str) -> str:
    import hashlib

    return hashlib.sha256(dst.encode()).hexdigest()[:24] + ".json"


def _register_clone(dst: str, abs_refs: list[str]) -> None:
    """One registry FILE per clone, created with O_EXCL — the same
    lock-free arbiter as ``_commit``'s manifest link. The earlier
    single ``_clones.json`` was a non-atomic read-modify-write: two
    concurrent shallow clones (or a clone racing a vacuum's registry
    prune) could drop a registration and silently disarm the vacuum
    guard (advice r12). An exclusive create per clone cannot lose to a
    concurrent writer, and pruning is a per-file unlink."""
    roots = {r for r in (_root_of_data_file(f) for f in abs_refs) if r}
    for root in roots:
        reg = pathlib.Path(root) / _CLONES_DIR
        reg.mkdir(parents=True, exist_ok=True)
        target = reg / _clone_reg_name(dst)
        # write-then-link so the registration appears ATOMICALLY with
        # its full content (a dying writer can never leave a half
        # entry that blocks re-registration)
        tmp = reg / f".{target.name}.tmp.{os.getpid()}"
        tmp.write_text(json.dumps({"clone": dst}, indent=1))
        try:
            os.link(tmp, target)
        except FileExistsError:
            pass  # this clone root is already registered here
        finally:
            tmp.unlink(missing_ok=True)


def _live_clone_refs(path: str) -> dict[str, set[str]]:
    """clone root → resolved absolute files under ``path`` that the
    clone's RETAINED manifests still reference (live truth, not the
    snapshot recorded at clone time — a clone that has since rewritten
    or vacuumed away its source references stops pinning them).
    Prunes registry entries whose clone no longer exists (a per-file
    unlink — never a rewrite of other clones' registrations)."""
    reg = pathlib.Path(path) / _CLONES_DIR
    if not reg.is_dir():
        return {}
    root = str(pathlib.Path(path).resolve())
    out: dict[str, set[str]] = {}
    for entry in sorted(reg.glob("*.json")):
        try:
            dst = json.loads(entry.read_text())["clone"]
        except (json.JSONDecodeError, KeyError):
            continue  # half-written by a dying clone: ignore, keep
        dvs = _versions(dst)
        if not dvs:
            entry.unlink(missing_ok=True)  # clone deleted: drop guard
            continue
        refs: set[str] = set()
        for v in dvs:
            m = _load_manifest(dst, v)
            for f in list(m["files"]) + [
                e["file"] for e in m.get("delete_files") or []
            ]:
                if os.path.isabs(f):
                    rf = str(pathlib.Path(f).resolve())
                    if rf.startswith(root + os.sep):
                        refs.add(rf)
        if refs:
            out[dst] = refs
    return out


def restore_table(
    path: str, version: int | None = None, timestamp: float | None = None
) -> int:
    """Roll the table's HEAD back to ``version`` (Delta RESTORE): a
    new version is committed whose manifest references exactly the
    files — and delete sidecars — that ``version`` pinned, so the
    rollback writes no data and the mistaken versions stay readable
    for forensics until vacuumed. The restored state is a first-class
    version: later writes, change feeds, and derived-structure syncs
    compose (a feed across a restore nets out what the undone
    versions changed). ``timestamp`` (round 13, exclusive with
    ``version``) restores to what a reader at that instant saw —
    ``RESTORE ... TO TIMESTAMP AS OF``, resolved through
    :func:`version_at_timestamp`."""
    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"no versioned table at {path}")
    if timestamp is not None:
        if version is not None:
            raise ValueError("pass version OR timestamp, not both")
        version = version_at_timestamp(path, timestamp)
    if version is None:
        raise ValueError("restore_table needs a version or a timestamp")
    if version not in vs:
        raise FileNotFoundError(
            f"version {version} not in retained history {vs}"
        )
    cur = vs[-1]
    if version == cur:
        return cur  # restoring the head is a no-op
    man = _load_manifest(path, version)
    return _commit(
        path, cur + 1, man["files"], f"restore@v{version}",
        man.get("schema"), man.get("file_stats"),
        man.get("delete_files"),
    )


def table_history(path: str) -> list[dict]:
    """→ [{version, op, n_files, committed_at}, ...] oldest first."""
    out = []
    for v in _versions(path):
        m = _load_manifest(path, v)
        out.append(
            {
                "version": v,
                "op": m["op"],
                "n_files": len(m["files"]),
                "committed_at": m["committed_at"],
            }
        )
    return out


def add_constraint(
    spark: SparkSession, path: str, name: str, expr: str
) -> None:
    """Record a CHECK constraint (round 13, the Delta ``ALTER TABLE
    ADD CONSTRAINT`` shape): ``expr`` is a SQL boolean expression every
    row of every FUTURE write must satisfy — append, merge, overwrite,
    and update validate the files they are about to commit and ABORT
    (nothing commits, staged files are reclaimed) when any row fails.
    SQL-standard semantics: a row violates only when the expression is
    FALSE — NULL passes (use ``col IS NOT NULL`` to forbid nulls).
    Adding validates the CURRENT head first, like Delta: a constraint
    the existing data already breaks is rejected. Deletes, compaction,
    restore, and clones never re-validate (they cannot introduce
    rows); time travel may read pre-constraint versions that would
    fail it."""
    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"no versioned table at {path}")
    if not name.isidentifier():
        raise ValueError(f"constraint name must be an identifier: {name!r}")
    from pyspark.sql import functions as F

    head = read_table(spark, path)
    F.expr(expr)  # syntax-check before scanning
    bad = head.where(F.expr(expr) == F.lit(False)).limit(3)
    examples = bad.collect()
    if examples:
        raise ValueError(
            f"cannot add constraint {name!r}: existing rows violate "
            f"{expr!r}, e.g. {[tuple(r) for r in examples]!r}"
        )
    spec = _table_spec(path)
    cons = dict(spec.get("constraints") or {})
    cons[name] = expr
    _write_table_spec(path, {**spec, "constraints": cons})


def drop_constraint(path: str, name: str) -> None:
    spec = _table_spec(path)
    cons = dict(spec.get("constraints") or {})
    if name not in cons:
        raise KeyError(f"no constraint {name!r} on {path}")
    del cons[name]
    new_spec = {**spec, "constraints": cons}
    if not cons:
        new_spec.pop("constraints")
    _write_table_spec(path, new_spec)


def table_constraints(path: str) -> dict[str, str]:
    return dict(_table_spec(path).get("constraints") or {})


def _validate_constraints(
    spark: SparkSession,
    path: str,
    files: list[str],
    version: int,
    schema: list[list[str]] | None,
) -> None:
    """Validate JUST-WRITTEN (uncommitted) files against the table's
    recorded CHECK constraints; on violation, reclaim the staged
    version directory and raise — the table is untouched. Reading the
    files back costs one scan of the NEW data only (never the table)
    and re-uses the written bytes instead of recomputing the plan.
    The read aligns to the COMMITTING manifest schema so a constraint
    on a column the batch legally omitted sees typed nulls (NULL
    passes), not an unresolved-column error."""
    cons = _table_spec(path).get("constraints") or {}
    if not cons or not files:
        return
    from pyspark.sql import functions as F

    df = _read_files(spark, path, files, schema)
    any_bad = None
    for expr in cons.values():
        one = F.expr(expr) == F.lit(False)
        any_bad = one if any_bad is None else (any_bad | one)
    if df.where(any_bad).isEmpty():
        return
    detail = []
    for name, expr in cons.items():
        ex = df.where(F.expr(expr) == F.lit(False)).limit(3).collect()
        if ex:
            detail.append(f"{name} ({expr!r}): e.g. {[tuple(r) for r in ex]!r}")
    shutil.rmtree(
        pathlib.Path(path) / _DATA_DIR / f"v{version:08d}",
        ignore_errors=True,
    )
    raise ValueError(
        "write aborted - CHECK constraint violation(s): " + "; ".join(detail)
    )


def describe_table(path: str, version: int | None = None) -> dict:
    """DESCRIBE DETAIL (round 13, the Delta shape): one manifest read
    → the table's operational metadata. ``num_rows`` comes from the
    footer rowcounts and is ``None`` when metadata cannot be exact
    (merge-on-read masks / missing counts — the same fail-closed rule
    as :func:`table_rowcount`, reported as absence instead of an
    error so dashboards render). ``size_bytes`` sums the referenced
    data files (sidecars included); shared files of other versions
    are not double-counted within the described version."""
    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"no versioned table at {path}")
    v = vs[-1] if version is None else version
    if v not in vs:
        raise FileNotFoundError(f"version {v} not in {vs}")
    man = _load_manifest(path, v)
    refs = list(man["files"]) + [
        e["file"] for e in man.get("delete_files") or []
    ]
    size = 0
    for f in refs:
        p = pathlib.Path(f) if os.path.isabs(f) else pathlib.Path(path) / f
        try:
            size += p.stat().st_size
        except OSError:
            pass  # a vacuumed-away historical ref: size is best-effort
        try:
            size += pathlib.Path(
                str(p) + _BLOOM_BLOB_SUFFIX
            ).stat().st_size  # bloom sidecar blobs count too (round 17)
        except OSError:
            pass
    try:
        rows = table_rowcount(path, v)
    except ValueError:
        rows = None
    cluster_by, cluster_kind = _spec_cluster(path)
    return {
        "version": v,
        "op": man["op"],
        "committed_at": man["committed_at"],
        "num_files": len(man["files"]),
        "num_delete_files": len(man.get("delete_files") or []),
        "num_rows": rows,
        "size_bytes": size,
        "schema": man.get("schema"),
        "cluster_by": cluster_by,
        "cluster_kind": cluster_kind if cluster_by else None,
        "bucket_by": _table_spec(path).get("bucket_by"),
        "bloom": _table_spec(path).get("bloom"),
        "constraints": table_constraints(path),
        "renames": man.get("renames") or [],
        "dropped_columns": man.get("dropped") or [],
        "retained_versions": vs,
        # round 15: spec-evolution era registry (None = never evolved)
        # and the streaming-writer txn watermarks of this version
        "spec_id": man.get("spec_id"),
        "specs": man.get("specs"),
        "txns": man.get("txns") or {},
    }


def vacuum_table(
    path: str,
    keep_last: int | None = None,
    force: bool = False,
    retention_hours: float | None = None,
    dry_run: bool = False,
) -> int:
    """Delete data files unreferenced by any RETAINED manifest and
    drop the expired manifests (their versions become unreadable).
    Retention is one of (mutually exclusive; default ``keep_last=1``):

    - ``keep_last=N`` — keep the newest N versions;
    - ``retention_hours=H`` — the Delta ``VACUUM ... RETAIN`` shape
      (round 13): keep every version committed within the last H
      hours; the HEAD is always retained however old.

    Also reclaims orphaned ``.v*.staging.*`` directories —
    a writer that crashed between its Spark write and the atomic
    rename strands a full version-sized copy there (review r11); a
    staging directory is by construction never referenced by any
    manifest. Do not run vacuum concurrently with active writers: an
    in-flight writer's staging directory is indistinguishable from a
    crashed one's. Returns the number of files deleted.

    ``dry_run=True`` (round 13, the Delta ``VACUUM ... DRY RUN``
    shape) reports the count WITHOUT deleting anything — no data
    files, no staging sweeps, no manifest expiry — and still runs the
    shallow-clone guard so the report matches what a real vacuum
    would do.

    Shallow-clone guard (VERDICT r11 task #6): a file this vacuum
    would delete may still be referenced — by absolute path — from a
    live shallow clone's manifests; deleting it would corrupt the
    clone silently. Clones register themselves at clone time; vacuum
    re-reads each registered clone's RETAINED manifests and raises
    ``ValueError`` naming the pinning clones instead of deleting,
    unless ``force=True`` (the caller accepts corrupting the clones)."""
    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"no versioned table at {path}")
    if keep_last is not None and retention_hours is not None:
        raise ValueError("pass keep_last OR retention_hours, not both")
    if retention_hours is not None:
        import time

        cutoff = time.time() - retention_hours * 3600
        keep_vs = [
            v
            for v in vs
            if _load_manifest(path, v)["committed_at"] >= cutoff
        ]
        if vs[-1] not in keep_vs:
            keep_vs.append(vs[-1])  # the head never ages out
    else:
        keep_vs = vs[-(keep_last if keep_last is not None else 1):]
    live: set[str] = set()
    for v in keep_vs:
        man = _load_manifest(path, v)
        live.update(man["files"])
        live.update(e["file"] for e in man.get("delete_files") or [])
    deleted = 0
    droot = pathlib.Path(path) / _DATA_DIR
    doomed = [
        f
        for f in droot.rglob("*.parquet")
        if str(f.relative_to(path)) not in live
        # staging dirs are swept wholesale below (never referenced by
        # any manifest, so never pinnable by a clone either)
        and not any(p.startswith(".v") for p in f.relative_to(droot).parts)
    ]
    if doomed and not force:
        pinned = _live_clone_refs(path)
        if pinned:
            doomed_abs = {str(f.resolve()) for f in doomed}
            offenders = {
                dst: sorted(refs & doomed_abs)[:3]
                for dst, refs in pinned.items()
                if refs & doomed_abs
            }
            if offenders:
                raise ValueError(
                    f"vacuum of {path} would delete files still referenced "
                    f"by live shallow clone(s) {sorted(offenders)} (e.g. "
                    f"{next(iter(offenders.values()))}) - deep-copy or "
                    "re-clone them first, or pass force=True to corrupt "
                    "them knowingly"
                )
    if dry_run:
        staged = sum(
            sum(1 for _ in stale.rglob("*.parquet"))
            for stale in droot.glob(".v*.staging.*")
            if stale.is_dir()
        )
        return len(doomed) + staged
    for stale in list(droot.glob(".v*.staging.*")):
        if stale.is_dir():
            deleted += sum(1 for _ in stale.rglob("*.parquet"))
            shutil.rmtree(stale, ignore_errors=True)
    for f in doomed:
        f.unlink()
        deleted += 1
        # the bloom sidecar blob lives and dies with its data file
        # (adjacency is the lifecycle contract — round 17); not
        # counted in the return value, which has always meant DATA
        # files
        pathlib.Path(str(f) + _BLOOM_BLOB_SUFFIX).unlink(missing_ok=True)
    # sweep blobs whose data file is gone (e.g. deleted by an earlier
    # vacuum that predated the blob, or a crashed writer's debris
    # after vacuum_orphans removed the data directory contents)
    for b in list(droot.rglob(f"*{_BLOOM_BLOB_SUFFIX}")):
        if not pathlib.Path(str(b)[: -len(_BLOOM_BLOB_SUFFIX)]).exists():
            b.unlink(missing_ok=True)
    for b in list(droot.rglob(f"*{_BLOOM_BLOB_SUFFIX}.tmp.*")):
        b.unlink(missing_ok=True)  # crashed blob writes (atomic-rename tmps)
    # prune empty version dirs + expired manifests
    for d in list(droot.glob("v*")):
        if d.is_dir() and not any(d.iterdir()):
            shutil.rmtree(d)
    for v in vs:
        if v not in set(keep_vs):
            _manifest_path(path, v).unlink()
    return deleted


# ---------------------------------------------------------------------------
# Incremental materialized-aggregate maintenance over the change feed.
#
# The 100 TB shape this exists for: a grouped rollup (docs per source,
# tokens per language, revenue per nation) over a table that receives
# daily merges. Recomputing the rollup rescans the full table every
# refresh; maintaining it from ``table_changes`` costs O(changed files)
# to read + one exchange keyed on the GROUP columns whose width is
# |groups| + |changed rows| — independent of table size. Only
# DISTRIBUTIVE aggregates (count, sum — and anything derived from
# them, e.g. avg = sum/count) are maintainable under deletes; min/max
# are not (a deleted extremum forces a re-scan of its group), so this
# API deliberately does not offer them.
#
# NULL exactness: SUM over a group whose values are all NULL is NULL,
# not 0, and a plain "running sum of coalesce(x, 0)" cannot tell those
# apart once increments and decrements interleave. The state therefore
# carries one companion non-null count per sum column (``__nn_<alias>``)
# — the textbook IVM treatment — and ``present_aggregate`` re-derives
# the NULL-when-empty semantics exactly.


def _check_agg_spec(
    group_cols: list[str], sums: list[tuple[str, str]], count_col: str
) -> None:
    if not group_cols:
        raise ValueError("group_cols must name at least one column")
    aliases = [a for _, a in sums]
    names = list(group_cols) + [count_col] + aliases
    if len(set(names)) != len(names):
        raise ValueError(f"aggregate output names collide: {names}")
    for a in aliases:
        if a.startswith("__nn_"):
            raise ValueError(f"alias {a!r} collides with companion prefix")


def aggregate_state(
    df: DataFrame,
    group_cols: list[str],
    sums: list[tuple[str, str]],
    count_col: str = "n_rows",
) -> DataFrame:
    """Build the maintainable STATE of a grouped count+sum rollup:
    ``group_cols`` + ``count_col`` (rows per group) + per ``(col,
    alias)`` in ``sums`` a zero-based running sum ``alias`` and its
    non-null companion count ``__nn_<alias>``. Feed the result to
    :func:`refresh_aggregate` (as ``state=``) and render it for humans
    with :func:`present_aggregate`. One hash aggregation — Catalyst
    plans the usual partial/final pair, so the exchange carries only
    per-partition partial rows."""
    from pyspark.sql import functions as F

    _check_agg_spec(group_cols, sums, count_col)
    aggs = [F.count(F.lit(1)).alias(count_col)]
    for col, alias in sums:
        aggs.append(F.sum(F.coalesce(F.col(col), F.lit(0))).alias(alias))
        aggs.append(F.count(F.col(col)).alias(f"__nn_{alias}"))
    return df.groupBy(*group_cols).agg(*aggs)


def refresh_aggregate(
    spark: SparkSession,
    path: str,
    v_from: int,
    v_to: int,
    key: str,
    group_cols: list[str],
    sums: list[tuple[str, str]],
    state: DataFrame | None = None,
    count_col: str = "n_rows",
) -> DataFrame:
    """Roll a materialized aggregate STATE forward from ``v_from`` to
    ``v_to`` using only the change feed: each CDF row contributes
    weight +1 (``insert`` / ``update_postimage``) or -1 (``delete`` /
    ``update_preimage``) to its group's count, sums, and non-null
    companions; the signed contributions are unioned with the state
    and re-summed per group; groups whose row count reaches zero are
    dropped. Refreshes CHAIN: the return value is a valid ``state``
    for the next version hop, and a composite hop v1→v3 equals the
    two-hop chain (pinned in tests/test_versioned.py).

    ``state`` must be the :func:`aggregate_state` of the SAME spec at
    exactly ``v_from`` (when omitted it is computed from
    ``read_table(version=v_from)`` — a full scan, the thing every
    subsequent refresh then avoids). ``key`` inherits the
    ``table_changes`` contract: unique within each snapshot."""
    from pyspark.sql import functions as F

    _check_agg_spec(group_cols, sums, count_col)
    if state is None:
        state = aggregate_state(
            read_table(spark, path, version=v_from), group_cols, sums, count_col
        )
    changes = table_changes(spark, path, v_from, v_to, key)
    w = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    delta_cols = [w.cast("long").alias(count_col)]
    for col, alias in sums:
        delta_cols.append((F.coalesce(F.col(col), F.lit(0)) * w).alias(alias))
        delta_cols.append(
            (F.col(col).isNotNull().cast("long") * w).alias(f"__nn_{alias}")
        )
    delta = changes.select(*[F.col(c) for c in group_cols], *delta_cols)
    value_cols = [c for c in state.columns if c not in group_cols]
    return (
        state.unionByName(delta.select(*state.columns))
        .groupBy(*group_cols)
        .agg(*[F.sum(c).alias(c) for c in value_cols])
        .where(F.col(count_col) > 0)
    )


def present_aggregate(
    state: DataFrame,
    sums: list[tuple[str, str]],
    count_col: str = "n_rows",
) -> DataFrame:
    """Render a maintained state for consumption: drop the
    ``__nn_<alias>`` companions, NULLing each sum whose group has no
    non-null values (exact SQL ``SUM`` semantics — see the module
    note on NULL exactness). ``count_col`` is accepted for signature
    symmetry and passed through unchanged."""
    from pyspark.sql import functions as F

    out = state
    for _, alias in sums:
        out = out.withColumn(
            alias, F.when(F.col(f"__nn_{alias}") > 0, F.col(alias))
        ).drop(f"__nn_{alias}")
    return out


# ---------------------------------------------------------------------------
# Materialized views: a rollup persisted as its OWN versioned table and
# caught up to the base incrementally.
#
# The view stores the raw maintainable STATE (companion counts
# included) so it can keep being refreshed; ``read_view`` presents it.
# Each view version's manifest records the base version it reflects in
# its ``op`` string (``view@base_v<N>``) — the watermark rides the same
# atomic manifest commit as the data, so there is no sidecar to race.
# A ``sync`` reads only the base's CDF-exclusive files and rewrites
# |groups| rows — at 100 TB the view refresh cost tracks the CHANGE
# rate, not the table size. If the base was vacuumed past the
# watermark (CDF retention expired — the Delta failure mode), sync
# falls back to a full recompute at the head and records
# ``view_rebuild@base_v<N>``.

_VIEW_META = "_view.json"


def _view_spec(view_path: str) -> dict:
    p = pathlib.Path(view_path) / _VIEW_META
    if not p.is_file():
        raise FileNotFoundError(f"no materialized view at {view_path}")
    return json.loads(p.read_text())


def _watermark_at(path: str, version: int | None, kind: str) -> int:
    """Base-version watermark for a derived structure (view/index):
    the ``@base_v<N>`` op at ``version``, or — when ``version`` is
    None — the newest one at or below the head. The backward walk
    matters because maintenance commits that do not move the
    watermark (``compact_table`` op="compact", a vacuum survivor) may
    sit at the head; rows are unchanged by those, so the last branded
    commit still states what the structure reflects."""
    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"no {kind} at {path}")
    if version is not None:
        op = _load_manifest(path, version)["op"]
        if "@base_v" not in op:
            raise ValueError(
                f"version {version} at {path} is not a {kind} commit: {op!r}"
            )
        return int(op.rsplit("@base_v", 1)[1])
    for v in reversed(vs):
        op = _load_manifest(path, v)["op"]
        if "@base_v" in op:
            return int(op.rsplit("@base_v", 1)[1])
    raise ValueError(f"no {kind} commit in the retained history at {path}")


def view_base_version(view_path: str, version: int | None = None) -> int:
    """The base-table version a view version reflects (latest branded
    commit by default — maintenance commits like compaction in
    between are transparent), parsed from the atomically-committed
    manifest op."""
    return _watermark_at(view_path, version, "materialized view")


def _commit_view_state(
    state: DataFrame, view_path: str, op: str, version: int
) -> int:
    files, stats = _write_data_and_stats(state, view_path, version)
    return _commit(
        view_path, version, files, op, _schema_fields(state), stats,
    )


def create_view(
    spark: SparkSession,
    base_path: str,
    view_path: str,
    key: str,
    group_cols: list[str],
    sums: list[tuple[str, str]],
    count_col: str = "n_rows",
) -> int:
    """Materialize the count+sum rollup of ``base_path``'s CURRENT head
    as view v1 and persist the (immutable) view spec. Returns the base
    version the view reflects. This is the one full scan of the base a
    view ever needs — every later :func:`sync_view` is incremental."""
    _check_agg_spec(group_cols, sums, count_col)
    if _versions(view_path):
        raise FileExistsError(f"materialized view already exists at {view_path}")
    base_vs = _versions(base_path)
    if not base_vs:
        raise FileNotFoundError(f"no versioned table at {base_path}")
    head = base_vs[-1]
    state = aggregate_state(
        read_table(spark, base_path, version=head), group_cols, sums, count_col
    )
    vdir = pathlib.Path(view_path)
    vdir.mkdir(parents=True, exist_ok=True)
    spec = {
        "base_path": os.path.abspath(base_path),
        "key": key,
        "group_cols": group_cols,
        "sums": [list(s) for s in sums],
        "count_col": count_col,
    }
    tmp = vdir / f".{_VIEW_META}.tmp.{os.getpid()}"
    tmp.write_text(json.dumps(spec, indent=1))
    os.replace(tmp, vdir / _VIEW_META)
    _commit_view_state(state, view_path, f"view@base_v{head}", 1)
    return head


def sync_view(spark: SparkSession, view_path: str) -> int:
    """Catch the view up to its base table's head: ONE composite CDF
    refresh from the watermark to the head, committed as one new view
    version. No-op (no new version) when already current. Falls back
    to a full head recompute when the watermark's base manifest was
    vacuumed away. Returns the base version now reflected."""
    spec = _view_spec(view_path)
    base_path = spec["base_path"]
    sums = [tuple(s) for s in spec["sums"]]
    base_vs = _versions(base_path)
    if not base_vs:
        raise FileNotFoundError(f"no versioned table at {base_path}")
    head = base_vs[-1]
    synced = view_base_version(view_path)
    if head == synced:
        return synced
    if head < synced:
        raise ValueError(
            f"view at {view_path} reflects base v{synced} but the base "
            f"head is v{head} — the base table was replaced?"
        )
    cur_view = _versions(view_path)[-1]
    state = read_table(spark, view_path)
    try:
        new_state = refresh_aggregate(
            spark, base_path, synced, head, spec["key"],
            spec["group_cols"], sums, state=state,
            count_col=spec["count_col"],
        )
        op = f"view@base_v{head}"
    except FileNotFoundError:
        # CDF retention expired under us: the watermark manifest was
        # vacuumed. Rebuild from the head — correct, just not O(delta).
        new_state = aggregate_state(
            read_table(spark, base_path, version=head),
            spec["group_cols"], sums, spec["count_col"],
        )
        op = f"view_rebuild@base_v{head}"
    _commit_view_state(new_state, view_path, op, cur_view + 1)
    return head


def read_view(
    spark: SparkSession, view_path: str, version: int | None = None
) -> DataFrame:
    """Present a view (or one of its historical versions): the stored
    state with companion counts resolved back to exact SQL SUM
    semantics. Time travel composes: ``read_view(version=1)`` is the
    rollup of the base version recorded by view v1's watermark."""
    spec = _view_spec(view_path)
    state = read_table(spark, view_path, version=version)
    return present_aggregate(
        state, [tuple(s) for s in spec["sums"]], spec["count_col"]
    )
