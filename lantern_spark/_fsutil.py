"""Shared staged-directory swap with crash recovery.

Maintenance rewrites (file compaction, postings consolidation) write a
staged copy, then swap it into place. Plain-filesystem renames give no
multi-directory atomicity, so the swap keeps a ``<live>__old`` backup
across its only non-atomic window and every entry point first runs
:func:`recover_dir`, which restores or finishes a crashed swap. The
worst post-crash state is therefore the PRE-swap layout (plus a stale
staging dir the next run clears) — never a missing or half-swapped
one. Used by ``sources/layout.py`` and ``streaming/bm25_stream.py``;
fixes to the crash-window handling live HERE, once.
"""

from __future__ import annotations

import os
import shutil

__all__ = ["recover_dir", "replace_dir"]


def recover_dir(live: str) -> None:
    """Self-heal after a :func:`replace_dir` that crashed mid-swap:
    restore the ``__old`` backup if the live directory is gone, finish
    the backup cleanup if the swap completed. Idempotent."""
    old = live.rstrip("/") + "__old"
    if not os.path.isdir(live) and os.path.isdir(old):
        os.rename(old, live)
    elif os.path.isdir(live) and os.path.isdir(old):
        shutil.rmtree(old, ignore_errors=True)


def replace_dir(staged: str, live: str) -> None:
    """Swap ``staged`` into ``live``'s place, leaving a recoverable
    ``__old`` backup across the non-atomic window between the two
    renames (callers run :func:`recover_dir` at entry)."""
    old = live.rstrip("/") + "__old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(live, old)
    os.rename(staged, live)
    shutil.rmtree(old)
