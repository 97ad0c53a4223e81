"""Snapshot-commit protocol: isolation, time travel, rollback, crash safety.

The Iceberg-semantics stand-in (sources/snapshots.py) must give readers the
guarantees the reference gets from its Iceberg reporting tables: atomic
commits, invisibility of in-flight/crashed writes, time travel, and
append/overwrite manifests.
"""

from __future__ import annotations

import json
import os

from intelligent_document_processing_on_aws_spark.sources.snapshots import (
    commit_snapshot,
    current_snapshot_id,
    read_table,
    rollback_to,
    snapshot_history,
)


def _df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "v long")


def _vals(df):
    return sorted(r.v for r in df.collect())


def test_append_and_overwrite_snapshots(spark, tmp_path):
    t = str(tmp_path / "tbl")
    assert read_table(spark, t) is None
    s1 = commit_snapshot(_df(spark, [1, 2]), t)
    s2 = commit_snapshot(_df(spark, [3]), t)  # append
    assert (s1, s2) == (1, 2)
    assert _vals(read_table(spark, t)) == [1, 2, 3]
    s3 = commit_snapshot(_df(spark, [9]), t, operation="overwrite")
    assert _vals(read_table(spark, t)) == [9]
    # time travel reads any committed snapshot
    assert _vals(read_table(spark, t, snapshot_id=s1)) == [1, 2]
    assert _vals(read_table(spark, t, snapshot_id=s2)) == [1, 2, 3]
    hist = snapshot_history(t)
    assert [h["snapshot_id"] for h in hist] == [1, 2, 3]
    assert [h["operation"] for h in hist] == ["append", "append", "overwrite"]
    assert hist[2]["parent_id"] == s2


def test_crashed_commit_is_invisible(spark, tmp_path):
    """Data + manifest staged but no pointer flip (writer died) -> readers
    still see the previous snapshot; the next commit skips past the
    dangling id."""
    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [1]), t)
    # simulate a crash: stage snapshot 2 fully except the pointer flip
    snap = os.path.join(t, "snap-00000002")
    _df(spark, [777]).write.parquet(os.path.join(snap, "data"))
    files = sorted(
        os.path.join("snap-00000002", "data", f)
        for f in os.listdir(os.path.join(snap, "data")) if f.endswith(".parquet")
    )
    with open(os.path.join(snap, "manifest.json"), "w", encoding="utf-8") as fh:
        json.dump({"snapshot_id": 2, "parent_id": 1, "operation": "append",
                   "committed_at_ms": 0, "added_files": len(files),
                   "files": files}, fh)
    assert current_snapshot_id(t) == 1
    assert _vals(read_table(spark, t)) == [1]  # 777 never leaks
    s = commit_snapshot(_df(spark, [2]), t)
    assert s == 3  # dangling id 2 skipped, not clobbered
    assert _vals(read_table(spark, t)) == [1, 2]
    assert [h["snapshot_id"] for h in snapshot_history(t)] == [1, 3]


def test_concurrent_appenders_cannot_both_win(spark, tmp_path):
    """Two appenders racing from the same parent: the O_EXCL version
    marker lets exactly one publish; the loser raises and its rows never
    appear — no silent lost update. Simulated by claiming the next
    version (what the racing winner does) before the commit's flip."""
    import pytest

    from intelligent_document_processing_on_aws_spark.sources.snapshots import (
        CommitConflictError,
        _claim_version,
        _latest_version,
        _snap_dir,
        _write_hint,
    )

    tbl = str(tmp_path / "tbl")
    s1 = commit_snapshot(_df(spark, [1, 2]), tbl, "append")

    real_claim = _claim_version

    def racing_claim(table_dir, version, snapshot_id):
        # writer B wins this version first (stages snap 99's flip)
        real_claim(table_dir, version, snapshot_id + 1000)
        real_claim(table_dir, version, snapshot_id)  # raises FileExistsError

    import intelligent_document_processing_on_aws_spark.sources.snapshots as snaps

    snaps._claim_version = racing_claim
    try:
        with pytest.raises(CommitConflictError):
            commit_snapshot(_df(spark, [3, 4]), tbl, "append")
    finally:
        snaps._claim_version = real_claim
    # winner-side state is NOT damaged: version advanced once, and the
    # loser's staged rows are invisible (marker points at the fake winner)
    assert _latest_version(tbl) == 2


def test_crashed_winner_is_repaired_by_next_reader(spark, tmp_path):
    """A writer that crashes between marker claim and hint flip: the next
    current_snapshot_id() reconciles the hint from the marker, so the
    committed snapshot becomes visible and later commits proceed."""
    from intelligent_document_processing_on_aws_spark.sources.snapshots import (
        VERSION_HINT,
    )

    tbl = str(tmp_path / "tbl")
    s1 = commit_snapshot(_df(spark, [1]), tbl, "append")
    s2 = commit_snapshot(_df(spark, [2]), tbl, "append")
    # simulate s2's writer crashing before the hint flip
    hint = os.path.join(tbl, VERSION_HINT)
    with open(hint, "w", encoding="utf-8") as fh:
        fh.write(str(s1))
    assert current_snapshot_id(tbl) == s2  # reconciled from the marker
    assert _vals(read_table(spark, tbl)) == [1, 2]
    s3 = commit_snapshot(_df(spark, [3]), tbl, "append")
    assert _vals(read_table(spark, tbl)) == [1, 2, 3]


def test_rollback_then_commit_does_not_clobber(spark, tmp_path):
    t = str(tmp_path / "tbl")
    s1 = commit_snapshot(_df(spark, [1]), t)
    s2 = commit_snapshot(_df(spark, [2]), t)
    rollback_to(t, s1)
    assert _vals(read_table(spark, t)) == [1]
    s3 = commit_snapshot(_df(spark, [5]), t)
    assert s3 == 3  # beyond the rolled-past snapshot
    assert _vals(read_table(spark, t)) == [1, 5]  # parent chain from s1
    # s2 stays time-travel-readable
    assert _vals(read_table(spark, t, snapshot_id=s2)) == [1, 2]


def test_rollback_to_missing_snapshot_raises(spark, tmp_path):
    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [1]), t)
    try:
        rollback_to(t, 42)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_resume_from_last_committed_snapshot(spark, tmp_path, fixtures_dir):
    """Kill/resume over snapshot commits: a dangling (crashed) output
    snapshot is invisible, so resume reprocesses exactly its rows and the
    committed table never holds a duplicate url."""
    from intelligent_document_processing_on_aws_spark.plans.lineage import (
        run_with_resume_snapshots,
    )

    pages = spark.read.parquet(os.path.join(fixtures_dir, "t1_pages.parquet"))
    first = pages.limit(80)
    out = str(tmp_path / "extracted")
    lin = str(tmp_path / "lineage")

    r1 = run_with_resume_snapshots(spark, first, out, lin, salt_partitions=4)
    assert r1["processed"] == 80 and r1["snapshot_id"] == 1

    # crashed second run: staged data, no pointer flip
    snap = os.path.join(out, "snap-00000002")
    _df(spark, [0]).write.parquet(os.path.join(snap, "data"))

    r2 = run_with_resume_snapshots(spark, pages, out, lin, salt_partitions=4)
    n_pages = pages.count()
    assert r2["processed"] == n_pages - 80
    assert r2["skipped"] == 80

    committed = read_table(spark, out)
    assert committed.count() == n_pages
    assert committed.select("url").distinct().count() == n_pages

    # third run: everything committed -> no-op, no new snapshot
    r3 = run_with_resume_snapshots(spark, pages, out, lin, salt_partitions=4)
    assert r3 == {"processed": 0, "skipped": n_pages, "snapshot_id": None}
    hist = snapshot_history(lin)
    assert len(hist) == 2  # one lineage commit per productive run
