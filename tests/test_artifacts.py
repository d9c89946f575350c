"""Unit tests for the shared artifact-swap primitive (no Spark).

Every compaction (LSH bands, Bloom bits, HDR sketch, IVF centroids +
vectors) funnels through swap_live_dir; its crash-window semantics are
the difference between "a crash parks the old relation one rename from
repair" and the pre-round-11 "a crash has already deleted it".
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from hpaste_spark.operators.artifacts import swap_live_dir  # noqa: E402


def _mk(dirpath, marker: str) -> None:
    os.makedirs(dirpath)
    with open(os.path.join(dirpath, "data.txt"), "w") as fh:
        fh.write(marker)


def _content(dirpath) -> str:
    with open(os.path.join(dirpath, "data.txt")) as fh:
        return fh.read()


def test_swap_replaces_live_and_cleans_up(tmp_path):
    live, tmp = str(tmp_path / "bands"), str(tmp_path / "bands_tmp")
    _mk(live, "old")
    _mk(tmp, "new")
    swap_live_dir(live, tmp)
    assert _content(live) == "new"
    assert not os.path.exists(tmp)
    assert not os.path.exists(live + "_old"), "parked dir must be cleaned up"


def test_swap_clears_stale_parked_dir_from_prior_crash(tmp_path):
    """A crash after step 2 of a PREVIOUS swap leaves live + _old; the
    next swap must clear the stale parking spot instead of failing the
    rename into it."""
    live, tmp = str(tmp_path / "bands"), str(tmp_path / "bands_tmp")
    _mk(live, "current")
    _mk(tmp, "compacted")
    _mk(live + "_old", "two-swaps-ago")  # the crash leftover
    swap_live_dir(live, tmp)
    assert _content(live) == "compacted"
    assert not os.path.exists(live + "_old")


def test_check_artifact_detects_and_repairs_crash_states(tmp_path):
    """check_artifact fsck: a completed-swap leftover (_old + live) is
    deleted, a mid-swap crash (_old, no live) rolls back by rename, a
    crashed compaction build (_compact_tmp) is deleted; a clean tree
    reports nothing; dry-run repairs nothing."""
    from hpaste_spark.operators.artifacts import check_artifact

    root = str(tmp_path / "art")
    _mk(os.path.join(root, "bands"), "live")
    _mk(os.path.join(root, "bands_old"), "stale")           # completed swap
    _mk(os.path.join(root, "vectors_old"), "parked")        # mid-swap crash
    _mk(os.path.join(root, "bits_compact_tmp"), "halfbuild")

    dry = check_artifact(root, repair=False)
    assert len(dry) == 3
    assert os.path.isdir(os.path.join(root, "bands_old")), "dry-run must not act"

    fixed = check_artifact(root, repair=True)
    assert len(fixed) == 3
    assert not os.path.exists(os.path.join(root, "bands_old"))
    assert not os.path.exists(os.path.join(root, "bits_compact_tmp"))
    assert _content(os.path.join(root, "vectors")) == "parked", "rollback by rename"
    assert _content(os.path.join(root, "bands")) == "live"
    assert check_artifact(root) == [], "tree canonical after repair"


def test_crash_between_renames_parks_old_relation(tmp_path, monkeypatch):
    """Simulate a crash between rename 1 (live -> _old) and rename 2
    (tmp -> live): the old relation must be PARKED COMPLETE at _old —
    one rename from repair, zero data loss (the property the previous
    rmtree-then-rename sequence lacked)."""
    import hpaste_spark.operators.artifacts as artifacts

    live, tmp = str(tmp_path / "bands"), str(tmp_path / "bands_tmp")
    _mk(live, "old")
    _mk(tmp, "new")

    real_rename = os.rename
    calls = {"n": 0}

    def crashing_rename(src, dst):
        calls["n"] += 1
        if calls["n"] == 1:
            real_rename(src, dst)
            raise OSError("simulated crash after the first rename")
        real_rename(src, dst)

    monkeypatch.setattr(artifacts.os, "rename", crashing_rename)
    try:
        swap_live_dir(live, tmp)
        raise AssertionError("expected the simulated crash to propagate")
    except OSError:
        pass
    assert not os.path.exists(live), "mid-crash state: live missing (loud reads)"
    assert _content(live + "_old") == "old", "old relation parked complete"
    assert _content(tmp) == "new", "compacted relation still intact"
    # repair = one rename, exactly as documented
    real_rename(live + "_old", live)
    assert _content(live) == "old"


# ---------------------------------------------------------------------------
# round-12: torn-append journal + two-directory compaction journal


def _write_json(path, obj) -> None:
    import json

    with open(path, "w") as fh:
        json.dump(obj, fh)


def _mk_art(root, files: dict[str, str]) -> None:
    """Lay out an artifact tree: {relative file path: content}."""
    for rel, content in files.items():
        full = os.path.join(root, rel)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        with open(full, "w") as fh:
            fh.write(content)


def test_append_journal_torn_rolls_back_to_snapshot(tmp_path):
    """A torn append (journal present, meta NOT at the journal's
    target) must roll the data dirs back to exactly the journal's
    pre-append file snapshot — deleting the partial delta files and
    the partition dirs the append created — so the retry is clean and
    cannot double-insert."""
    from hpaste_spark.operators.artifacts import (
        APPEND_PENDING,
        check_artifact,
        read_meta,
        require_clean,
        write_meta,
    )

    root = str(tmp_path / "idx")
    _mk_art(
        root,
        {
            "vectors/cid=0/part-old.parquet": "committed",
            "vectors/_SUCCESS": "",
            # the torn delta: a new file in an existing partition AND a
            # whole new partition dir
            "vectors/cid=0/part-new.parquet": "partial delta",
            "vectors/cid=7/part-new.parquet": "partial delta",
        },
    )
    write_meta(root, {"kind": "ivf", "version": 3, "last_delta_sig": "8:111"})
    _write_json(
        os.path.join(root, APPEND_PENDING),
        {
            "delta_sig": "4:222",
            "target_version": 4,
            "data_dirs": ["vectors"],
            "files": {"vectors": ["_SUCCESS", os.path.join("cid=0", "part-old.parquet")]},
        },
    )
    # readers must refuse the journaled tree
    try:
        require_clean(root, "IVF index")
        raise AssertionError("require_clean must raise on a pending journal")
    except Exception as exc:
        assert "append_pending" in str(exc)

    dry = check_artifact(root, repair=False)
    assert any("TORN append (2 uncommitted delta files)" in l for l in dry)
    assert os.path.exists(os.path.join(root, "vectors/cid=7/part-new.parquet"))

    check_artifact(root, repair=True)
    assert os.path.exists(os.path.join(root, "vectors/cid=0/part-old.parquet"))
    assert not os.path.exists(os.path.join(root, "vectors/cid=0/part-new.parquet"))
    assert not os.path.exists(os.path.join(root, "vectors/cid=7")), (
        "partition dir created by the torn append must be pruned"
    )
    assert not os.path.exists(os.path.join(root, APPEND_PENDING))
    assert read_meta(root)["version"] == 3, "meta untouched by rollback"
    require_clean(root)  # clean again
    assert check_artifact(root) == []


def test_append_journal_committed_only_drops_journal(tmp_path):
    """Crash AFTER the meta publish but before the journal unlink:
    meta matches the journal's (target_version, delta_sig), so the
    append committed — repair must drop the journal and must NOT
    delete the (committed) delta files."""
    from hpaste_spark.operators.artifacts import (
        APPEND_PENDING,
        check_artifact,
        write_meta,
    )

    root = str(tmp_path / "idx")
    _mk_art(
        root,
        {
            "codes/part-old.parquet": "base",
            "codes/part-new.parquet": "committed delta",
        },
    )
    write_meta(root, {"kind": "pq", "version": 4, "last_delta_sig": "4:222"})
    _write_json(
        os.path.join(root, APPEND_PENDING),
        {
            "delta_sig": "4:222",
            "target_version": 4,
            "data_dirs": ["codes"],
            "files": {"codes": ["part-old.parquet"]},
        },
    )
    report = check_artifact(root, repair=True)
    assert any("COMMITTED" in l for l in report)
    assert os.path.exists(os.path.join(root, "codes/part-new.parquet")), (
        "committed delta files must survive"
    )
    assert not os.path.exists(os.path.join(root, APPEND_PENDING))


def test_compact_journal_before_any_swap_discards_tmps(tmp_path):
    """Compaction crashed before the first swap: no live dir carries
    the journal's epoch, so repair discards the (re-derivable) tmp
    builds and rolls the compaction back."""
    from hpaste_spark.operators.artifacts import (
        COMPACT_PENDING,
        check_artifact,
        write_epoch,
    )

    root = str(tmp_path / "idx")
    _mk_art(
        root,
        {
            "vectors/d.parquet": "old",
            "centroids/c.parquet": "old",
            "vectors_compact_tmp/d.parquet": "new",
            "centroids_compact_tmp/c.parquet": "new",
        },
    )
    write_epoch(os.path.join(root, "vectors"), "aaaa")
    write_epoch(os.path.join(root, "centroids"), "aaaa")
    write_epoch(os.path.join(root, "vectors_compact_tmp"), "bbbb")
    write_epoch(os.path.join(root, "centroids_compact_tmp"), "bbbb")
    _write_json(
        os.path.join(root, COMPACT_PENDING),
        {"dirs": ["vectors", "centroids"], "epoch": "bbbb", "target_version": 2},
    )
    check_artifact(root, repair=True)
    assert not os.path.exists(os.path.join(root, "vectors_compact_tmp"))
    assert not os.path.exists(os.path.join(root, "centroids_compact_tmp"))
    assert not os.path.exists(os.path.join(root, COMPACT_PENDING))
    with open(os.path.join(root, "vectors/d.parquet")) as fh:
        assert fh.read() == "old"


def test_compact_journal_between_swaps_completes(tmp_path):
    """THE round-12 fix: crash between the vectors swap and the
    centroids swap.  Live vectors carry the new epoch, live centroids
    the old one, and centroids_compact_tmp (the complete matching
    geometry) is on disk.  The previous fsck DELETED that tmp,
    cementing the mixed-geometry state; now it must COMPLETE the
    centroids swap and finalize the meta to the journal's target."""
    from hpaste_spark.operators.artifacts import (
        COMPACT_PENDING,
        check_artifact,
        read_epoch,
        read_meta,
        write_epoch,
        write_meta,
    )

    root = str(tmp_path / "idx")
    _mk_art(
        root,
        {
            "vectors/d.parquet": "new",       # swap 1 done
            "centroids/c.parquet": "old",     # swap 2 pending
            "centroids_compact_tmp/c.parquet": "new",
        },
    )
    write_epoch(os.path.join(root, "vectors"), "bbbb")
    write_epoch(os.path.join(root, "centroids"), "aaaa")
    write_epoch(os.path.join(root, "centroids_compact_tmp"), "bbbb")
    write_meta(root, {"kind": "ivf", "version": 1, "k_centroids": 8,
                      "epoch": "aaaa", "last_delta_sig": None})
    _write_json(
        os.path.join(root, COMPACT_PENDING),
        {"dirs": ["vectors", "centroids"], "epoch": "bbbb",
         "target_version": 2, "meta_updates": {"k_centroids": 4}},
    )
    dry = check_artifact(root, repair=False)
    assert any("BETWEEN swaps" in l for l in dry)
    assert os.path.isdir(os.path.join(root, "centroids_compact_tmp")), (
        "dry run must not touch the tmp"
    )
    check_artifact(root, repair=True)
    with open(os.path.join(root, "centroids/c.parquet")) as fh:
        assert fh.read() == "new", "swap completed from the matching tmp"
    assert read_epoch(os.path.join(root, "centroids")) == "bbbb"
    assert not os.path.exists(os.path.join(root, "centroids_compact_tmp"))
    assert not os.path.exists(os.path.join(root, COMPACT_PENDING))
    meta = read_meta(root)
    assert meta["version"] == 2 and meta["epoch"] == "bbbb"
    assert meta["k_centroids"] == 4, "journaled meta_updates applied"
    assert check_artifact(root) == []


def test_compact_journal_mid_swap_crash_then_completion(tmp_path):
    """Crash INSIDE the second swap (live centroids renamed away, tmp
    not yet renamed in): fsck first rolls the mid-swap rename back,
    then recognizes the between-swaps state and completes it."""
    from hpaste_spark.operators.artifacts import (
        COMPACT_PENDING,
        check_artifact,
        write_epoch,
    )

    root = str(tmp_path / "idx")
    _mk_art(
        root,
        {
            "vectors/d.parquet": "new",
            "centroids_old/c.parquet": "old",   # live renamed away mid-swap
            "centroids_compact_tmp/c.parquet": "new",
        },
    )
    write_epoch(os.path.join(root, "vectors"), "bbbb")
    write_epoch(os.path.join(root, "centroids_old"), "aaaa")
    write_epoch(os.path.join(root, "centroids_compact_tmp"), "bbbb")
    _write_json(
        os.path.join(root, COMPACT_PENDING),
        {"dirs": ["vectors", "centroids"], "epoch": "bbbb", "target_version": None},
    )
    check_artifact(root, repair=True)
    with open(os.path.join(root, "centroids/c.parquet")) as fh:
        assert fh.read() == "new"
    assert not os.path.exists(os.path.join(root, "centroids_old"))
    assert not os.path.exists(os.path.join(root, COMPACT_PENDING))


def test_compact_tmp_kept_when_live_rolled_back(tmp_path):
    """Un-journaled mid-swap crash: when fsck rolls ``X_old`` back to
    live, the sibling ``X_compact_tmp`` is KEPT for inspection (the
    round-12 docstring fix — the previous pass deleted it in the same
    sweep)."""
    from hpaste_spark.operators.artifacts import check_artifact

    root = str(tmp_path / "art")
    _mk(os.path.join(root, "bands_old"), "parked")
    _mk(os.path.join(root, "bands_compact_tmp"), "halfbuild")
    report = check_artifact(root, repair=True)
    assert _content(os.path.join(root, "bands")) == "parked"
    assert os.path.isdir(os.path.join(root, "bands_compact_tmp")), (
        "tmp kept for inspection when its live was rolled back"
    )
    assert any("kept for inspection" in l for l in report)


def test_begin_append_is_single_writer(tmp_path):
    """The O_EXCL journal create is the single-writer lock: a second
    concurrent appender fails loudly instead of losing a version bump
    (round-12 verdict ask #5, the contended path)."""
    import pytest

    from hpaste_spark.operators.artifacts import (
        ConcurrentMaintenanceError,
        begin_append,
        begin_compact,
    )

    root = str(tmp_path / "idx")
    os.makedirs(os.path.join(root, "vectors"))
    begin_append(root, ["vectors"], "1:1", 2)
    with pytest.raises(ConcurrentMaintenanceError, match="single-writer"):
        begin_append(root, ["vectors"], "2:2", 2)
    with pytest.raises(ConcurrentMaintenanceError):
        begin_compact(root, ["vectors"], "eeee", 2)


def test_append_lock_contended_and_stale(tmp_path):
    """append_lock (round-12: the documented single-writer contract for
    the parquet-meta artifacts, now enforced): a second writer inside a
    live lock raises instead of losing a version bump; a CRASHED
    holder's lock older than the TTL is broken and the append proceeds;
    the lock is released on error (it guards concurrency, not crash
    atomicity)."""
    import time

    import pytest

    from hpaste_spark.operators.artifacts import (
        APPEND_LOCK,
        ConcurrentMaintenanceError,
        append_lock,
    )

    root = str(tmp_path / "art")
    os.makedirs(root)

    with append_lock(root):
        assert os.path.exists(os.path.join(root, APPEND_LOCK))
        with pytest.raises(ConcurrentMaintenanceError, match="single-writer"):
            with append_lock(root):
                raise AssertionError("second writer must not enter")
    assert not os.path.exists(os.path.join(root, APPEND_LOCK)), "released on exit"

    # stale lock from a crashed holder: broken after the TTL
    lockfile = os.path.join(root, APPEND_LOCK)
    with open(lockfile, "w") as fh:
        fh.write("pid=0 t=0")
    past = time.time() - 7200
    os.utime(lockfile, (past, past))
    with append_lock(root, ttl_s=3600):
        pass  # acquired by breaking the stale lock
    assert not os.path.exists(lockfile)

    # released on error too
    try:
        with append_lock(root):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert not os.path.exists(lockfile)
