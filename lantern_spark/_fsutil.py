"""Staged-rewrite machinery with an injectable filesystem seam.

Maintenance rewrites (file compaction, postings/edge consolidation)
write a staged copy of a directory, then publish it. Two publish
protocols, chosen by the filesystem's capabilities:

- **Rename swap** (``LocalFS``, the default — POSIX/HDFS semantics):
  the staged dir is renamed into place, keeping a ``<live>__old``
  backup across the only non-atomic window; :func:`recover_dir`
  (run at every entry point) restores or finishes a crashed swap.
  The on-disk layout is exactly the pre-r14 one — plain directories,
  no indirection.

- **Generation pointer** (any FS with ``supports_rename = False`` —
  S3/GCS object-store semantics, where "rename" is a copy+delete and
  nothing directory-shaped is atomic): the live data lives in a
  generation subdirectory ``<live>/gen-NNNNNN``; a rewrite writes the
  NEXT generation in full, then publishes it with ONE atomic
  single-object PUT of the ``<live>/_CURRENT`` pointer, then
  best-effort-deletes the superseded generation. A crash before the
  pointer PUT leaves an orphan generation that :func:`vd_recover`
  clears; a crash after it leaves the old generation that
  :func:`vd_recover` clears. The worst post-crash state is therefore
  the PRE-rewrite layout on one side of the PUT and the POST-rewrite
  layout on the other — never a missing, half-visible, or
  double-counted one. This is the same commit shape as Iceberg/Delta
  metadata pointers, reduced to one JSON object.

Both protocols are reached through the ``vd_*`` (versioned-dir)
functions, so callers (``streaming/bm25_stream.py``,
``streaming/graph_stream.py``, ``sources/layout.py``) contain no
protocol branches. Small control objects (epoch ledgers, job markers,
pointers) go through :meth:`FS.write_text`, which is an atomic
publish under both protocols (tmp+rename locally, single-object PUT
on stores).

Adapters:

- :class:`LocalFS` — ``os``/``shutil``; the default everywhere, zero
  behavior change for local paths.
- :class:`RenamelessFS` — LocalFS storage with the rename capability
  REMOVED (``rename`` raises). Used by tests to prove the pointer
  protocol end-to-end against real Spark reads/writes; also an
  executable spec of what the machinery is allowed to assume about an
  object store (atomic single-object PUT, list, delete — nothing
  else).
- :class:`ArrowFS` — ``pyarrow.fs`` adapter for real remote stores
  (``s3://``, ``gs://``, ``hdfs://``); treated as rename-less, so the
  pointer protocol applies. Spark itself reads/writes the same URIs
  through its Hadoop connectors; this adapter only carries the
  Python-side control plane (listing, pointers, ledgers, deletes).
"""

from __future__ import annotations

import os
import shutil
from typing import Iterator, List, Optional, Tuple

__all__ = [
    "FS",
    "LocalFS",
    "RenamelessFS",
    "ArrowFS",
    "LOCAL_FS",
    "recover_dir",
    "replace_dir",
    "vd_live",
    "vd_stage",
    "vd_commit",
    "vd_recover",
]

_GEN_PREFIX = "gen-"
_POINTER = "_CURRENT"


class FS:
    """Filesystem adapter contract. Paths are plain strings (local
    paths or URIs); joining is '/'-based. Implementations must make
    :meth:`write_text` an ATOMIC PUBLISH — readers see the old object
    or the new one, never a torn write — because the pointer commit
    and the epoch ledger rely on exactly that."""

    supports_rename = True

    # --- capability surface (override per backend) ---
    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def isdir(self, path: str) -> bool:
        raise NotImplementedError

    def makedirs(self, path: str) -> None:
        raise NotImplementedError

    def listdir(self, path: str) -> List[str]:
        """Immediate child names (files and dirs)."""
        raise NotImplementedError

    def walk_files(self, path: str) -> Iterator[Tuple[str, int]]:
        """All files under ``path`` recursively as (full_path, size)."""
        raise NotImplementedError

    def read_text(self, path: str) -> Optional[str]:
        """Contents, or None if absent."""
        raise NotImplementedError

    def write_text(self, path: str, data: str) -> None:
        """Atomic publish of a small control object."""
        raise NotImplementedError

    def delete_file(self, path: str) -> None:
        raise NotImplementedError

    def rename(self, src: str, dst: str) -> None:
        raise NotImplementedError

    def rmtree(self, path: str) -> None:
        raise NotImplementedError

    def copy_file(self, src: str, dst: str) -> None:
        """Server-side object copy where the backend has one (S3/GCS
        do); local byte copy otherwise."""
        raise NotImplementedError

    def copy_tree(self, src: str, dst: str) -> None:
        """Per-object copy of everything under ``src`` — the
        rename-less substitute for moving a directory into a staged
        layout (bounded: callers only copy single epoch fragments)."""
        pre = src.rstrip("/") + "/"
        for p, _sz in list(self.walk_files(src)):
            rel = p[len(pre):] if p.startswith(pre) else p.rsplit("/", 1)[-1]
            self.copy_file(p, self.join(dst, rel))

    def join(self, *parts: str) -> str:
        return "/".join(p.rstrip("/") for p in parts if p)


class LocalFS(FS):
    """POSIX-semantics default: atomic directory rename available, so
    the staged-swap protocol applies and layouts stay plain dirs."""

    supports_rename = True

    def exists(self, path):
        return os.path.exists(path)

    def isdir(self, path):
        return os.path.isdir(path)

    def makedirs(self, path):
        os.makedirs(path, exist_ok=True)

    def listdir(self, path):
        try:
            return sorted(os.listdir(path))
        except FileNotFoundError:
            return []

    def walk_files(self, path):
        for root, _dirs, files in os.walk(path):
            for f in files:
                p = os.path.join(root, f)
                try:
                    yield p, os.path.getsize(p)
                except OSError:
                    pass

    def read_text(self, path):
        if not os.path.exists(path):
            return None
        with open(path) as fh:
            return fh.read()

    def write_text(self, path, data):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            fh.write(data)
        os.replace(tmp, path)

    def delete_file(self, path):
        try:
            os.remove(path)
        except FileNotFoundError:
            pass

    def rename(self, src, dst):
        os.rename(src, dst)

    def rmtree(self, path):
        shutil.rmtree(path, ignore_errors=True)

    def copy_file(self, src, dst):
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copyfile(src, dst)


class RenamelessFS(LocalFS):
    """LocalFS storage minus the rename capability — the object-store
    semantics contract, runnable locally so Spark can read/write the
    same paths natively in tests. ``write_text`` stays atomic (that is
    the store's single-object PUT guarantee; the local tmp+replace is
    just how the emulation provides it); ``rename`` raises, proving at
    test time that no code path still depends on it."""

    supports_rename = False

    def rename(self, src, dst):
        raise NotImplementedError(
            "object stores cannot rename; the generation-pointer "
            "protocol must be used instead"
        )


class ArrowFS(FS):
    """``pyarrow.fs`` adapter for real remote filesystems. Construct
    with a URI prefix: ``ArrowFS("s3://bucket")``. Treated as
    rename-less (S3/GCS moves are copy+delete, not atomic), so every
    layout reached through it uses the generation-pointer protocol.
    NOTE: object-store PUTs are atomic per object but provide
    last-writer-wins, not compare-and-swap — the single-writer
    assumption the streams already make (one foreachBatch loop per
    layout) is required here too."""

    supports_rename = False

    def __init__(self, base_uri: str):
        from pyarrow import fs as pafs  # baked-in dependency

        self._fs, self._root = pafs.FileSystem.from_uri(base_uri)
        self._pafs = pafs

    def _p(self, path: str) -> str:
        """URI → pyarrow store path: strip the scheme only ("s3://b/k"
        → "b/k", "file:///tmp/x" → "/tmp/x" — pyarrow's S3/GCS
        filesystems address by "bucket/key", its LocalFileSystem by
        absolute path). Store-relative paths pass through."""
        if "://" in path:
            return path.split("://", 1)[1]
        return path

    def exists(self, path):
        info = self._fs.get_file_info(self._p(path))
        return info.type != self._pafs.FileType.NotFound

    def isdir(self, path):
        info = self._fs.get_file_info(self._p(path))
        return info.type == self._pafs.FileType.Directory

    def makedirs(self, path):
        self._fs.create_dir(self._p(path), recursive=True)

    def listdir(self, path):
        sel = self._pafs.FileSelector(
            self._p(path), recursive=False, allow_not_found=True
        )
        return sorted(
            i.path.rsplit("/", 1)[-1] for i in self._fs.get_file_info(sel)
        )

    def walk_files(self, path):
        sel = self._pafs.FileSelector(
            self._p(path), recursive=True, allow_not_found=True
        )
        for i in self._fs.get_file_info(sel):
            if i.type == self._pafs.FileType.File:
                yield i.path, i.size or 0

    def read_text(self, path):
        try:
            with self._fs.open_input_stream(self._p(path)) as fh:
                return fh.read().decode()
        except (FileNotFoundError, OSError):
            return None

    def write_text(self, path, data):
        with self._fs.open_output_stream(self._p(path)) as fh:
            fh.write(data.encode())

    def delete_file(self, path):
        try:
            self._fs.delete_file(self._p(path))
        except (FileNotFoundError, OSError):
            pass

    def rename(self, src, dst):
        raise NotImplementedError(
            "object stores cannot rename; the generation-pointer "
            "protocol must be used instead"
        )

    def rmtree(self, path):
        try:
            self._fs.delete_dir(self._p(path))
        except (FileNotFoundError, OSError):
            pass

    def copy_file(self, src, dst):
        d = self._p(dst)
        if "/" in d:
            # no-op on object stores; real dir creation on local/HDFS
            try:
                self._fs.create_dir(d.rsplit("/", 1)[0], recursive=True)
            except OSError:
                pass
        self._fs.copy_file(self._p(src), d)


LOCAL_FS = LocalFS()


# ---------------------------------------------------------------------------
# Rename-swap protocol (LocalFS / HDFS): unchanged pre-r14 semantics.
# ---------------------------------------------------------------------------


def recover_dir(live: str, fs: FS = LOCAL_FS) -> None:
    """Self-heal after a :func:`replace_dir` that crashed mid-swap:
    restore the ``__old`` backup if the live directory is gone, finish
    the backup cleanup if the swap completed. Idempotent."""
    old = live.rstrip("/") + "__old"
    if not fs.isdir(live) and fs.isdir(old):
        fs.rename(old, live)
    elif fs.isdir(live) and fs.isdir(old):
        fs.rmtree(old)


def replace_dir(staged: str, live: str, fs: FS = LOCAL_FS) -> None:
    """Swap ``staged`` into ``live``'s place, leaving a recoverable
    ``__old`` backup across the non-atomic window between the two
    renames (callers run :func:`recover_dir` at entry)."""
    old = live.rstrip("/") + "__old"
    fs.rmtree(old)
    fs.rename(live, old)
    fs.rename(staged, live)
    fs.rmtree(old)


# ---------------------------------------------------------------------------
# Versioned-dir protocol: one API over both publish mechanisms.
# ---------------------------------------------------------------------------


def _gen_name(n: int) -> str:
    return f"{_GEN_PREFIX}{n:06d}"


def _current_gen(d: str, fs: FS) -> str:
    """The committed generation name (pointer contents, or the initial
    generation when no rewrite has ever been published)."""
    import json

    raw = fs.read_text(fs.join(d, _POINTER))
    if raw:
        return json.loads(raw)["gen"]
    return _gen_name(0)


def vd_live(d: str, fs: FS = LOCAL_FS) -> str:
    """Where the live data of versioned dir ``d`` actually is: ``d``
    itself under the rename protocol (plain layout), the committed
    generation subdir under the pointer protocol. Fragment writers and
    Spark readers both resolve through this."""
    if fs.supports_rename:
        return d
    return fs.join(d, _current_gen(d, fs))


def vd_stage(d: str, fs: FS = LOCAL_FS) -> str:
    """The directory a full rewrite of ``d`` must be written into —
    publish it afterwards with :func:`vd_commit`."""
    if fs.supports_rename:
        return d.rstrip("/") + "__staged"
    cur = _current_gen(d, fs)
    n = int(cur[len(_GEN_PREFIX):])
    return fs.join(d, _gen_name(n + 1))


def vd_commit(d: str, staged: str, fs: FS = LOCAL_FS) -> None:
    """Publish a staged rewrite. Rename protocol: the recoverable
    two-rename swap. Pointer protocol: ONE atomic pointer PUT, then a
    best-effort delete of the superseded generation (a crash between
    the two is healed by :func:`vd_recover`, and a reader that already
    resolved the old generation finishes its scan against the not-yet
    -deleted files — object-store list/read of deleted keys is the one
    race this protocol accepts, the same one every snapshot-pointer
    table format accepts between commit and vacuum)."""
    import json

    if fs.supports_rename:
        if fs.isdir(d):
            replace_dir(staged, d, fs)
        else:
            fs.rename(staged, d)
        return
    prev = _current_gen(d, fs)
    gen = staged.rstrip("/").rsplit("/", 1)[-1]
    fs.write_text(fs.join(d, _POINTER), json.dumps({"gen": gen}))
    if prev != gen:
        fs.rmtree(fs.join(d, prev))


def vd_recover(d: str, fs: FS = LOCAL_FS) -> None:
    """Heal a crashed rewrite of ``d``. Rename protocol: restore or
    finish the ``__old`` swap and clear stale staging. Pointer
    protocol: delete every generation except the committed one —
    orphan next-generations (crash before the pointer PUT) and
    superseded ones (crash after it) alike. Idempotent; run at every
    entry point."""
    if fs.supports_rename:
        recover_dir(d, fs)
        fs.rmtree(d.rstrip("/") + "__staged")
        return
    if not fs.isdir(d):
        return
    cur = _current_gen(d, fs)
    for name in fs.listdir(d):
        if name.startswith(_GEN_PREFIX) and name != cur:
            fs.rmtree(fs.join(d, name))
