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
