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
