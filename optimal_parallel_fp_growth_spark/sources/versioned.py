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

import json
import os
import pathlib
import shutil
import time

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "create_table",
    "append_table",
    "overwrite_table",
    "compact_table",
    "read_table",
    "table_history",
    "vacuum_table",
    "stream_to_table",
]

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"


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


def _write_data(df: DataFrame, path: str, version: int) -> list[str]:
    """Write immutable data files under data/v<N>/ and return their
    table-relative paths."""
    ddir = pathlib.Path(path) / _DATA_DIR / f"v{version:08d}"
    df.write.mode("error").parquet(str(ddir))
    rel = []
    for f in sorted(ddir.glob("*.parquet")):
        rel.append(str(f.relative_to(path)))
    return rel


def _schema_fields(df: DataFrame) -> list[list[str]]:
    return [[f.name, f.dataType.simpleString()] for f in df.schema.fields]


def _check_schema(df: DataFrame, path: str, version: int) -> None:
    """Appends must match the table schema exactly (name + type, in
    order): a silently divergent append would poison every later read
    with missing/ambiguous columns. Overwrite resets the schema."""
    want = _load_manifest(path, version).get("schema")
    if want is None:
        return  # pre-schema manifest: nothing to enforce
    got = _schema_fields(df)
    if got != want:
        raise ValueError(
            f"append schema mismatch at {path}: table has {want}, "
            f"append has {got} (use overwrite_table to change schema)"
        )


def _commit(
    path: str,
    version: int,
    files: list[str],
    op: str,
    schema: list[list[str]] | None = None,
) -> int:
    """Atomically birth ``version`` via manifest rename; raises
    FileExistsError on a concurrent commit of the same version (the
    caller retries on a fresh snapshot)."""
    mdir = pathlib.Path(path) / _MANIFEST_DIR
    mdir.mkdir(parents=True, exist_ok=True)
    manifest = {
        "version": version,
        "op": op,
        "files": files,
        "schema": schema,
        "committed_at": time.time(),
    }
    tmp = mdir / f".v{version:08d}.json.tmp.{os.getpid()}"
    tmp.write_text(json.dumps(manifest, indent=1))
    target = _manifest_path(path, version)
    if target.exists():
        tmp.unlink()
        raise FileExistsError(f"version {version} already committed at {path}")
    os.rename(tmp, target)
    return version


def create_table(df: DataFrame, path: str) -> int:
    """Create a versioned table at ``path`` (must not already be one).
    Returns the committed version (1)."""
    if _versions(path):
        raise FileExistsError(f"versioned table already exists at {path}")
    files = _write_data(df, path, 1)
    return _commit(path, 1, files, "create", _schema_fields(df))


def append_table(df: DataFrame, path: str) -> int:
    """Append rows as a new version (old files + new files)."""
    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"no versioned table at {path}")
    cur = vs[-1]
    _check_schema(df, path, cur)
    files = _write_data(df, path, cur + 1)
    man = _load_manifest(path, cur)
    return _commit(
        path, cur + 1, man["files"] + files, "append",
        man.get("schema") or _schema_fields(df),
    )


def overwrite_table(df: DataFrame, path: str) -> int:
    """Replace the table's contents as a new version; history keeps
    the old versions readable."""
    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"no versioned table at {path}")
    cur = vs[-1]
    files = _write_data(df, path, cur + 1)
    return _commit(path, cur + 1, files, "overwrite", _schema_fields(df))


def compact_table(spark: SparkSession, path: str, target_mb: int = 128) -> int:
    """Rewrite the CURRENT version's rows into ~target_mb files as a
    new version (narrow coalesce — no shuffle). Old versions still
    read their original files; reclaim space later with
    :func:`vacuum_table`."""
    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"no versioned table at {path}")
    cur = vs[-1]
    man = _load_manifest(path, cur)
    total = sum(
        (pathlib.Path(path) / f).stat().st_size for f in man["files"]
    )
    target = max(1, -(-total // (target_mb * 1024 * 1024)))
    df = read_table(spark, path, version=cur).coalesce(target)
    files = _write_data(df, path, cur + 1)
    return _commit(
        path, cur + 1, files, "compact",
        man.get("schema") or _schema_fields(df),
    )


def read_table(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a committed version (None = latest). Time travel: the file
    list is exactly what that version's manifest pinned."""
    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"no versioned table at {path}")
    v = vs[-1] if version is None else version
    if v not in vs:
        raise FileNotFoundError(f"version {v} not in {vs}")
    files = _load_manifest(path, v)["files"]
    if not files:
        raise ValueError(f"version {v} has no files")
    return spark.read.parquet(*[str(pathlib.Path(path) / f) for f in files])


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


def vacuum_table(path: str, keep_last: int = 1) -> int:
    """Delete data files unreferenced by the newest ``keep_last``
    manifests AND drop the older manifests (their versions become
    unreadable). Returns the number of files deleted."""
    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"no versioned table at {path}")
    keep_vs = vs[-keep_last:]
    live: set[str] = set()
    for v in keep_vs:
        live.update(_load_manifest(path, v)["files"])
    deleted = 0
    droot = pathlib.Path(path) / _DATA_DIR
    for f in list(droot.rglob("*.parquet")):
        if str(f.relative_to(path)) not in live:
            f.unlink()
            deleted += 1
    # prune empty version dirs + expired manifests
    for d in list(droot.glob("v*")):
        if d.is_dir() and not any(d.iterdir()):
            shutil.rmtree(d)
    for v in vs[:-keep_last]:
        _manifest_path(path, v).unlink()
    return deleted
