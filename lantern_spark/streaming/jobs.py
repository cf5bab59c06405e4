"""Job-management API over continuous embedding/completion jobs.

Reference: lantern_extras/src/daemon.rs:225-400 — the daemon exposes a
jobs table plus SQL management functions: ``get_embedding_jobs()``,
``get_embedding_job_status(id)`` (status derived from lifecycle
timestamps: queued → in_progress → enabled, or failed/canceled, with a
progress percentage and failure reason), ``cancel_embedding_job(id)``
(sets ``canceled_at``), ``resume_embedding_job(id)`` (clears it), and
the completion-job mirror of each (daemon.rs:258-270 simply delegates
to the embedding implementations).

Spark rendition: a :class:`JobRegistry` persists one JSON record per
job (id, kind, source/output paths, runtime params, the reference's
exact lifecycle timestamps) next to the jobs' checkpoints, and wraps
the live ``StreamingQuery`` handles. The daemon's restart-from-table
semantics map 1:1 onto Structured Streaming checkpoints: *resume*
restarts the stream from its checkpoint, so no row is ever embedded
twice across cancel/resume cycles — exactly the exactly-once contract
the reference's job table + PK upserts provide.

Status mapping (daemon.rs:239-245, verbatim):
    init_failed_at set        → 'failed'
    canceled_at set           → 'canceled'
    init_finished_at set      → 'enabled'   (continuous sync phase)
    init_started_at set       → 'in_progress'
    else                      → 'queued'
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field
from typing import Dict, List, Optional, Tuple

from pyspark.sql import SparkSession

from lantern_spark.operators.embed import RuntimeSpec
from lantern_spark.streaming.embed_stream import incremental_embedding_job

__all__ = [
    "JobRecord",
    "JobRegistry",
]


@dataclass
class JobRecord:
    """One row of the jobs table
    (_lantern_extras_internal.embedding_generation_jobs analog)."""

    id: int
    job_type: str  # "embedding_generation" | "completion"
    source_path: str
    source_schema: str
    src_col: str
    dst_col: str
    out_path: str
    checkpoint_path: str
    runtime: dict = field(default_factory=dict)
    id_col: str = "id"
    created_at: Optional[float] = None
    init_started_at: Optional[float] = None
    init_finished_at: Optional[float] = None
    init_failed_at: Optional[float] = None
    canceled_at: Optional[float] = None
    init_failure_reason: Optional[str] = None
    init_progress: int = 0  # SMALLINT percentage in the reference


class JobRegistry:
    """Persistent jobs table + live StreamingQuery handles.

    The registry directory is durable state (survives a driver
    restart: records reload, queries restart via :meth:`resume`); the
    handle map is runtime state."""

    def __init__(self, root: str, fs=None):
        from lantern_spark._fsutil import LOCAL_FS

        self.root = root
        self._fs = fs or LOCAL_FS  # r14: object-store seam
        self._fs.makedirs(root)
        self._queries: Dict[int, object] = {}  # live StreamingQuery

    # -- persistence ---------------------------------------------------

    def _file(self) -> str:
        return os.path.join(self.root, "jobs.json")

    def _load(self) -> List[JobRecord]:
        raw = self._fs.read_text(self._file())
        if raw is None:
            return []
        return [JobRecord(**r) for r in json.loads(raw)]

    def _save(self, records: List[JobRecord]) -> None:
        # atomic publish: tmp+rename locally, single-object PUT on
        # object stores (the jobs table is ONE small JSON object)
        self._fs.write_text(
            self._file(), json.dumps([asdict(r) for r in records], indent=2)
        )

    def _update(self, job_id: int, **fields) -> JobRecord:
        records = self._load()
        for r in records:
            if r.id == job_id:
                for k, v in fields.items():
                    setattr(r, k, v)
                self._save(records)
                return r
        raise KeyError(f"no job with id {job_id}")

    def _get(self, job_id: int) -> JobRecord:
        for r in self._load():
            if r.id == job_id:
                return r
        raise KeyError(f"no job with id {job_id}")

    # -- submission ----------------------------------------------------

    def submit_embedding_job(
        self,
        spark: SparkSession,
        source_path: str,
        source_schema: str,
        src_col: str,
        dst_col: str,
        out_path: str,
        runtime: Optional[RuntimeSpec] = None,
        id_col: str = "id",
        job_type: str = "embedding_generation",
    ) -> int:
        """Register + start a continuous embedding job; returns its id
        (the jobs-table INSERT + daemon pickup, collapsed)."""
        records = self._load()
        job_id = 1 + max((r.id for r in records), default=0)
        rt = runtime or RuntimeSpec(name="hash", dim=16)
        rec = JobRecord(
            id=job_id,
            job_type=job_type,
            source_path=source_path,
            source_schema=source_schema,
            src_col=src_col,
            dst_col=dst_col,
            out_path=out_path,
            checkpoint_path=os.path.join(self.root, f"chk_{job_id}"),
            # the FULL spec: batch_size and params (credentials, model
            # path, pooling) must survive persistence or resume/restart
            # rebuilds a runtime that cannot authenticate or load
            runtime=asdict(rt),
            id_col=id_col,
            created_at=time.time(),
        )
        records.append(rec)
        self._save(records)
        self._start(spark, rec)
        return job_id

    def submit_completion_job(self, *args, **kwargs) -> int:
        """Completion jobs share the embedding machinery
        (daemon.rs:258-270: the completion functions delegate)."""
        kwargs["job_type"] = "completion"
        return self.submit_embedding_job(*args, **kwargs)

    def _start(self, spark: SparkSession, rec: JobRecord) -> None:
        self._update(rec.id, init_started_at=time.time())
        try:
            q = incremental_embedding_job(
                spark,
                rec.source_path,
                rec.source_schema,
                rec.src_col,
                rec.dst_col,
                rec.out_path,
                rec.checkpoint_path,
                runtime=RuntimeSpec(**rec.runtime),
                id_col=rec.id_col,
            )
        except Exception as e:
            self._update(
                rec.id,
                init_failed_at=time.time(),
                init_failure_reason=str(e),
            )
            raise
        self._queries[rec.id] = q

    # -- status (daemon.rs:231-249) ------------------------------------

    def get_job_status(self, job_id: int) -> Tuple[str, int, Optional[str]]:
        """(status, progress, error) — the reference's exact CASE
        ladder. Progress: 100 once the initial backlog has drained
        (init_finished), else the persisted init_progress."""
        self._refresh(job_id)
        r = self._get(job_id)  # raises KeyError for unknown ids
        if r.init_failed_at is not None:
            return ("failed", r.init_progress, r.init_failure_reason)
        if r.canceled_at is not None:
            return ("canceled", r.init_progress, None)
        if r.init_finished_at is not None:
            return ("enabled", 100, None)
        if r.init_started_at is not None:
            return ("in_progress", r.init_progress, None)
        return ("queued", 0, None)

    # daemon.rs:258-270: completion status delegates to embedding
    get_embedding_job_status = get_job_status
    get_completion_job_status = get_job_status

    def _refresh(self, job_id: int) -> None:
        """Fold the live query's state into the persisted record:
        a drained backlog marks init finished (the daemon's init→sync
        transition); a dead query with an exception marks failure."""
        q = self._queries.get(job_id)
        if q is None:
            return
        r = self._get(job_id)
        try:
            exc = q.exception()
        except Exception as probe_err:
            # an UNREADABLE handle (broken JVM gateway, stopped
            # context) is itself a failure — treating it as "no
            # exception" would leave a dead job 'in_progress' forever
            # and block resume behind the stale handle
            exc = RuntimeError(f"query handle unreachable: {probe_err}")
        if exc is not None and r.init_failed_at is None:
            self._update(
                job_id,
                init_failed_at=time.time(),
                init_failure_reason=str(exc),
            )
            # drop the dead handle so a later resume can restart
            self._queries.pop(job_id, None)
            return
        if r.init_finished_at is None and q.isActive:
            # init completes only once the stream has BOTH processed
            # data and then drained: a zero-row first trigger on an
            # empty-at-start source must not report 'enabled'/100%
            # while the real backlog is still to come
            hist = q.recentProgress or []
            saw_rows = any(p["numInputRows"] > 0 for p in hist)
            lp = q.lastProgress
            if saw_rows and lp is not None and lp["numInputRows"] == 0:
                self._update(
                    job_id, init_finished_at=time.time(), init_progress=100
                )

    def get_embedding_jobs(self) -> List[Tuple[int, str, int, Optional[str]]]:
        """(id, status, progress, error) rows (daemon.rs:292-308)."""
        return [
            (r.id,) + self.get_job_status(r.id)
            for r in self._load()
            if r.job_type == "embedding_generation"
        ]

    def get_completion_jobs(self) -> List[Tuple[int, str, int, Optional[str]]]:
        return [
            (r.id,) + self.get_job_status(r.id)
            for r in self._load()
            if r.job_type == "completion"
        ]

    # -- cancel / resume (daemon.rs:331-381) ---------------------------

    def cancel_job(self, job_id: int) -> None:
        """Set ``canceled_at`` and stop the live stream. The checkpoint
        stays — cancel is a pause, not a delete (the reference's row
        keeps all its state too)."""
        self._update(job_id, canceled_at=time.time())
        q = self._queries.pop(job_id, None)
        if q is not None and q.isActive:
            q.stop()

    cancel_embedding_job = cancel_job
    cancel_completion_job = cancel_job

    def resume_job(self, spark: SparkSession, job_id: int) -> None:
        """Clear ``canceled_at`` (and any failure marker — resuming a
        failed job is a retry, daemon semantics) and restart from the
        checkpoint — rows embedded before the cancel/failure are not
        re-embedded (exactly-once across the cycle)."""
        rec = self._update(
            job_id,
            canceled_at=None,
            init_failed_at=None,
            init_failure_reason=None,
        )
        stale = self._queries.get(job_id)
        if stale is not None and not stale.isActive:
            self._queries.pop(job_id, None)  # dead handle from a crash
        if job_id not in self._queries:
            self._start(spark, rec)

    resume_embedding_job = resume_job
    resume_completion_job = resume_job

    def stop_all(self) -> None:
        """Driver-shutdown hook: stop live queries WITHOUT marking
        them canceled (they resume on the next registry start)."""
        for q in self._queries.values():
            try:
                if q.isActive:
                    q.stop()
            except Exception:
                pass
        self._queries.clear()
