"""Shared plumbing for the write-once / append-refresh / compact
artifact layer (LSH bands, Bloom blocklists, HDR baselines, IVF
indexes).

The reference's standing-table maintenance operations are explicit
admin actions against HBase directories (compaction/flush in its
operational model); here the artifacts are parquet directory trees and
the one shared hazard is the COMPACTION SWAP: replacing a live
directory with a rewritten one.  A naive ``rmtree(live); rename(tmp)``
has a crash window where the artifact has valid meta/_SUCCESS but NO
live directory — readers fail loudly (as documented) but the artifact
needs manual repair.  :func:`swap_live_dir` narrows that window to a
single ``os.rename`` pair with a recoverable intermediate state.
"""

from __future__ import annotations

import os
import shutil


def swap_live_dir(live: str, tmp: str) -> None:
    """Replace directory ``live`` with ``tmp`` using the narrowed
    rename-aside sequence (round-10 ADVICE item on compact_lsh_index):

    1. ``live``  → ``live + '_old'``   (one rename)
    2. ``tmp``   → ``live``            (one rename)
    3. delete ``live + '_old'``        (cleanup, crash-safe)

    A crash between 1 and 2 leaves ``live`` missing but the complete
    old relation parked at ``_old`` — a rename away from repair, no
    data loss (vs the previous rmtree-then-rename, where the same
    crash point had already DELETED the old relation).  A crash after
    2 leaves a stale ``_old`` dir that the next swap clears.  Both
    renames are same-filesystem by construction (``tmp`` and ``_old``
    live under the artifact root next to ``live`` — callers must keep
    it that way; cross-filesystem moves would fall back to
    copy+delete and reopen the window).  Not concurrency control:
    compaction remains an OFFLINE maintenance action, like an HBase
    major compaction — a reader racing the swap fails loudly on a
    missing path, never reads a half relation."""
    old = live + "_old"
    shutil.rmtree(old, ignore_errors=True)  # stale parked dir from a prior crash
    os.rename(live, old)
    os.rename(tmp, live)
    shutil.rmtree(old)


def check_artifact(path: str, repair: bool = False) -> "list[str]":
    """FSCK for a stored-artifact directory tree (LSH/Bloom/HDR/IVF):
    detect — and with ``repair=True`` fix — the states a crash during
    :func:`swap_live_dir` or a compaction build can leave behind.
    Returns a report line per finding (empty list = clean).  Run it at
    maintenance-window start, before compactions.

    States and their repairs, derived from the swap's crash windows:

    - ``X_old`` present and ``X`` present → the swap COMPLETED (crash
      after step 2); the parked dir is garbage.  Repair: delete
      ``X_old``.
    - ``X_old`` present and ``X`` missing → crash BETWEEN the renames;
      the old relation is parked complete.  Repair: rename it back
      (roll the compaction back — the tmp result, if any, is kept for
      inspection but not swapped in; re-run the compaction).
    - ``X_compact_tmp`` present → a compaction build crashed before
      its swap (or between the two swaps of a two-directory artifact).
      Repair: delete the tmp build; it is re-derivable.

    Readers never consult ``*_old``/``*_compact_tmp``, so a dirty tree
    is loud-failing or already-correct — fsck exists to return the
    tree to the canonical shape, not to fix silent wrongness (there is
    none to fix)."""
    report: "list[str]" = []
    if not os.path.isdir(path):
        raise FileNotFoundError(f"artifact root does not exist: {path}")
    for entry in sorted(os.listdir(path)):
        full = os.path.join(path, entry)
        if not os.path.isdir(full):
            continue
        if entry.endswith("_old"):
            live = full[: -len("_old")]
            if os.path.isdir(live):
                report.append(
                    f"{entry}: completed-swap leftover (live exists)"
                    + (" — deleted" if repair else " — repair deletes it")
                )
                if repair:
                    shutil.rmtree(full)
            else:
                report.append(
                    f"{entry}: mid-swap crash, live missing"
                    + (
                        " — rolled back (renamed to live)"
                        if repair
                        else " — repair renames it back to live"
                    )
                )
                if repair:
                    os.rename(full, live)
        elif entry.endswith("_compact_tmp"):
            report.append(
                f"{entry}: crashed compaction build"
                + (" — deleted" if repair else " — repair deletes it")
            )
            if repair:
                shutil.rmtree(full)
    return report
