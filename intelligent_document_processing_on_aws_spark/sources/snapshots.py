"""Snapshot-committed tables: Iceberg-semantics stand-in over parquet dirs.

The reference writes its reporting layer to Iceberg tables, whose core
guarantees are (public Iceberg spec / HadoopTables layout): atomic snapshot
commits via a version pointer, readers always seeing the last committed
snapshot, time travel by snapshot id, and append/overwrite operations
recorded in manifests. No Iceberg jar ships in this sandbox, so
sources/catalog.py documents plain parquet as the stand-in; this module
closes the semantic gap with a from-scratch mini commit protocol:

    table_dir/
      snap-00000001/data/*.parquet      immutable data written per commit
      snap-00000001/manifest.json       snapshot metadata + readable file set
      version-hint.text                 pointer to the committed snapshot id

- ``commit_snapshot`` stages data + manifest first; the commit's
  linearization point is an O_EXCL-created version marker
  (``commits/v<N+1>``, Iceberg's ``vN.metadata.json`` analog): exactly one
  writer per version can win, so two concurrent appenders can never both
  commit against the same parent — the loser gets CommitConflictError and
  its staged snapshot stays invisible. The ``version-hint.text`` pointer
  is a read cache flipped after the claim; a winner that crashes between
  claim and flip is repaired by the next writer (hint reconciled from the
  latest marker), a crashed writer before the claim leaves only a
  dangling snap dir no reader ever sees (snapshot isolation).
- ``append`` manifests carry the parent's file set plus the new files;
  ``overwrite`` starts a fresh set — so every manifest is self-contained
  and a read needs exactly one manifest (like Iceberg's manifest lists).
- ``read_table(snapshot_id=...)`` is time travel; ``rollback_to`` re-points
  without deleting newer snapshots (Iceberg ``rollback_to_snapshot``).
- ``snapshot_history`` is the ``table.snapshots()`` metadata-table analog.

On a real deployment the same call sites swap to ``df.writeTo(tbl)`` with an
Iceberg catalog; this keeps kill/resume tests honest locally. File listings
live in the manifest (never re-globbed), so reads stay O(1) metadata ops
even as the table accretes snapshots — the property that makes the layout
viable for the 100-TB metrics/lineage tables.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

VERSION_HINT = "version-hint.text"


class CommitConflictError(RuntimeError):
    """Another writer committed between this commit's parent read and its
    pointer flip (Iceberg's CommitFailedException analog). The staged
    snapshot was abandoned (left dangling, invisible); callers retry the
    whole commit to pick up the new parent."""


COMMITS_DIR = "commits"


def _snap_dir(table_dir: str, snapshot_id: int) -> str:
    return os.path.join(table_dir, f"snap-{snapshot_id:08d}")


def _latest_version(table_dir: str) -> int:
    """Highest claimed commit-marker version (0 = no commits yet)."""
    d = os.path.join(table_dir, COMMITS_DIR)
    try:
        names = os.listdir(d)
    except FileNotFoundError:
        return 0
    return max(
        (int(n[1:]) for n in names if n.startswith("v") and n[1:].isdigit()),
        default=0,
    )


def _marker_snapshot(table_dir: str, version: int) -> int | None:
    try:
        with open(os.path.join(table_dir, COMMITS_DIR, f"v{version:08d}"),
                  encoding="utf-8") as fh:
            return int(fh.read().strip())
    except (FileNotFoundError, ValueError):
        return None


def _claim_version(table_dir: str, version: int, snapshot_id: int) -> None:
    """The commit's linearization point: O_EXCL create of the version
    marker — exactly one writer can own each version."""
    d = os.path.join(table_dir, COMMITS_DIR)
    os.makedirs(d, exist_ok=True)
    fd = os.open(os.path.join(d, f"v{version:08d}"),
                 os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    try:
        os.write(fd, str(snapshot_id).encode("ascii"))
    finally:
        os.close(fd)


def _write_hint(table_dir: str, snapshot_id: int) -> None:
    tmp = os.path.join(table_dir, f"{VERSION_HINT}.{snapshot_id}.{os.getpid()}.tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(str(snapshot_id))
    os.replace(tmp, os.path.join(table_dir, VERSION_HINT))


def _reconcile_hint(table_dir: str) -> None:
    """Repair a crashed winner: if the latest claimed marker points past
    the hint cache, finish its pointer flip (idempotent, any process may
    do it)."""
    v = _latest_version(table_dir)
    if v == 0:
        return
    snap = _marker_snapshot(table_dir, v)
    if snap is not None and _read_hint(table_dir) != snap:
        _write_hint(table_dir, snap)


def _read_hint(table_dir: str) -> int | None:
    hint = os.path.join(table_dir, VERSION_HINT)
    try:
        with open(hint, encoding="utf-8") as fh:
            return int(fh.read().strip())
    except (FileNotFoundError, ValueError):
        return None


def current_snapshot_id(table_dir: str) -> int | None:
    """The committed snapshot id, or None for an empty/uncreated table.
    Dangling snap dirs without a pointer flip are invisible by design;
    a crashed winner's claimed-but-unflipped commit is reconciled first."""
    _reconcile_hint(table_dir)
    return _read_hint(table_dir)


def _read_manifest(table_dir: str, snapshot_id: int) -> dict:
    with open(os.path.join(_snap_dir(table_dir, snapshot_id), "manifest.json"),
              encoding="utf-8") as fh:
        return json.load(fh)


def commit_snapshot(
    df: DataFrame,
    table_dir: str,
    operation: str = "append",
) -> int:
    """Write ``df`` as a new committed snapshot; returns the snapshot id.

    operation: 'append' (new snapshot reads parent files + these) or
    'overwrite' (new snapshot reads only these). The pointer flip is the
    single atomic step; everything before it is invisible staging.
    """
    if operation not in ("append", "overwrite"):
        raise ValueError(f"unknown operation: {operation}")
    os.makedirs(table_dir, exist_ok=True)
    parent = current_snapshot_id(table_dir)
    parent_version = _latest_version(table_dir)
    # Claim the snap dir with an atomic mkdir, retrying upward: ids must
    # outrun every existing snap dir (committed, dangling, or
    # rolled-back-past) so a commit after rollback_to never clobbers the
    # newer snapshots it re-pointed away from, and two concurrent writers
    # can never stage into (or overwrite) the same directory.
    existing = [
        int(d.split("-", 1)[1])
        for d in os.listdir(table_dir)
        if d.startswith("snap-") and d.split("-", 1)[1].isdigit()
    ]
    snap_id = max(existing, default=0)
    while True:
        snap_id += 1
        snap = _snap_dir(table_dir, snap_id)
        try:
            os.mkdir(snap)
            break
        except FileExistsError:
            continue
    data_dir = os.path.join(snap, "data")
    df.write.mode("overwrite").parquet(data_dir)

    new_files = sorted(
        os.path.join(f"snap-{snap_id:08d}", "data", f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    )
    files = list(new_files)
    if operation == "append" and parent is not None:
        files = _read_manifest(table_dir, parent)["files"] + files
    manifest = {
        "snapshot_id": snap_id,
        "parent_id": parent,
        "operation": operation,
        "committed_at_ms": int(time.time() * 1000),
        "added_files": len(new_files),
        "files": files,
    }
    with open(os.path.join(snap, "manifest.json"), "w", encoding="utf-8") as fh:
        json.dump(manifest, fh, sort_keys=True)

    # Optimistic-concurrency commit (Iceberg CommitFailedException analog),
    # NO check-then-replace window: the O_EXCL marker create below is the
    # single linearization point. Any writer that committed since we read
    # `parent` owns version parent_version+1, so our claim fails and the
    # staged snapshot is abandoned (invisible); an append manifest built
    # from a stale parent can therefore never be published — silent lost
    # updates are structurally impossible, not just unlikely.
    if current_snapshot_id(table_dir) != parent:
        raise CommitConflictError(
            f"concurrent commit detected on {table_dir}: parent moved from "
            f"{parent} to {current_snapshot_id(table_dir)}; retry the commit"
        )
    try:
        _claim_version(table_dir, parent_version + 1, snap_id)
    except FileExistsError:
        _reconcile_hint(table_dir)  # finish the winner's flip if it crashed
        raise CommitConflictError(
            f"concurrent commit detected on {table_dir}: version "
            f"{parent_version + 1} already claimed; retry the commit"
        ) from None
    _write_hint(table_dir, snap_id)
    return snap_id


def read_table(
    spark: SparkSession,
    table_dir: str,
    snapshot_id: int | None = None,
) -> DataFrame | None:
    """Read the committed snapshot (or time-travel to ``snapshot_id``).
    Returns None for an empty table. Only manifest-listed files are read —
    a concurrent in-flight commit can never leak rows into this scan."""
    snap = snapshot_id if snapshot_id is not None else current_snapshot_id(table_dir)
    if snap is None:
        return None
    try:
        manifest = _read_manifest(table_dir, snap)
    except FileNotFoundError:
        raise ValueError(f"snapshot {snap} was never committed") from None
    paths = [os.path.join(table_dir, f) for f in manifest["files"]]
    if not paths:
        return None
    return spark.read.parquet(*paths)


def snapshot_history(table_dir: str) -> list[dict]:
    """All COMMITTED snapshots oldest-first (``table.snapshots()`` analog):
    walk parent pointers from the current hint; dangling snaps excluded."""
    out: list[dict] = []
    snap = current_snapshot_id(table_dir)
    while snap is not None:
        m = _read_manifest(table_dir, snap)
        out.append({k: m[k] for k in
                    ("snapshot_id", "parent_id", "operation",
                     "committed_at_ms", "added_files")})
        snap = m["parent_id"]
    return list(reversed(out))


def rollback_to(table_dir: str, snapshot_id: int) -> None:
    """Re-point the table at an earlier snapshot (rollback_to_snapshot
    analog). Newer snapshots stay on disk and remain time-travel-readable.
    Only a COMMITTED snapshot (data + manifest fully staged) is a valid
    target — a dangling dir from a crashed writer is rejected, preserving
    the crashed-commits-are-invisible invariant."""
    if not os.path.isfile(
        os.path.join(_snap_dir(table_dir, snapshot_id), "manifest.json")
    ):
        raise ValueError(f"snapshot {snapshot_id} was never committed")
    # a rollback is itself a version claim: the new marker records the
    # re-pointed snapshot, so hint reconciliation can never undo it
    version = _latest_version(table_dir)
    while True:
        version += 1
        try:
            _claim_version(table_dir, version, snapshot_id)
            break
        except FileExistsError:
            continue
    _write_hint(table_dir, snapshot_id)
