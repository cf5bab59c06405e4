"""Job-management API (streaming/jobs.py) — the daemon.rs:225-400
management-function analog: status ladder, cancel = pause, resume =
restart-from-checkpoint with exactly-once across the cycle."""

import os

from lantern_spark.streaming.jobs import JobRegistry

SCHEMA = "id long, text string"


def _write_docs(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


class TestJobLifecycle:
    def test_status_ladder_and_listing(self, spark, tmp_path):
        src = str(tmp_path / "src")
        _write_docs(spark, src + "/b0", [(1, "alpha"), (2, "beta")])
        reg = JobRegistry(str(tmp_path / "jobs"))
        jid = reg.submit_embedding_job(
            spark, src + "/*", SCHEMA, "text", "emb",
            str(tmp_path / "out"),
        )
        q = reg._queries[jid]
        q.processAllAvailable()
        status, progress, err = reg.get_embedding_job_status(jid)
        assert status in ("in_progress", "enabled")
        assert err is None
        # after the drained backlog is observed, init completes
        q.processAllAvailable()
        status, progress, err = reg.get_embedding_job_status(jid)
        jobs = reg.get_embedding_jobs()
        assert [j[0] for j in jobs] == [jid]
        assert reg.get_completion_jobs() == []
        reg.cancel_embedding_job(jid)
        status, _, _ = reg.get_embedding_job_status(jid)
        assert status == "canceled"
        out = spark.read.parquet(str(tmp_path / "out"))
        assert out.count() == 2 and "emb" in out.columns

    def test_cancel_resume_exactly_once(self, spark, tmp_path):
        """Rows embedded before a cancel are NOT re-embedded after
        resume (checkpoint = the reference's job-table state)."""
        src = str(tmp_path / "src")
        out = str(tmp_path / "out")
        _write_docs(spark, src + "/b0", [(1, "alpha"), (2, "beta")])
        reg = JobRegistry(str(tmp_path / "jobs"))
        jid = reg.submit_embedding_job(
            spark, src + "/*", SCHEMA, "text", "emb", out
        )
        reg._queries[jid].processAllAvailable()
        reg.cancel_job(jid)
        assert jid not in reg._queries
        # new data arrives while canceled
        _write_docs(spark, src + "/b1", [(3, "gamma")])
        reg.resume_embedding_job(spark, jid)
        reg._queries[jid].processAllAvailable()
        reg.cancel_job(jid)
        got = spark.read.parquet(out)
        assert got.count() == 3  # 2 original (once) + 1 new
        assert got.select("id").distinct().count() == 3

    def test_registry_survives_restart(self, spark, tmp_path):
        """A fresh JobRegistry over the same root sees the persisted
        record and resumes from the same checkpoint."""
        src = str(tmp_path / "src")
        out = str(tmp_path / "out")
        _write_docs(spark, src + "/b0", [(1, "alpha")])
        root = str(tmp_path / "jobs")
        reg = JobRegistry(root)
        jid = reg.submit_embedding_job(
            spark, src + "/*", SCHEMA, "text", "emb", out
        )
        reg._queries[jid].processAllAvailable()
        reg.stop_all()
        # "driver restart"
        reg2 = JobRegistry(root)
        status, _, _ = reg2.get_embedding_job_status(jid)
        assert status in ("in_progress", "enabled")  # NOT canceled
        reg2.resume_job(spark, jid)
        reg2._queries[jid].processAllAvailable()
        reg2.cancel_job(jid)
        assert spark.read.parquet(out).count() == 1  # no re-embed

    def test_completion_jobs_delegate(self, spark, tmp_path):
        src = str(tmp_path / "src")
        _write_docs(spark, src + "/b0", [(1, "alpha")])
        reg = JobRegistry(str(tmp_path / "jobs"))
        jid = reg.submit_completion_job(
            spark, src + "/*", SCHEMA, "text", "emb",
            str(tmp_path / "out"),
        )
        reg._queries[jid].processAllAvailable()
        assert [j[0] for j in reg.get_completion_jobs()] == [jid]
        assert reg.get_embedding_jobs() == []
        status, _, _ = reg.get_completion_job_status(jid)
        assert status in ("in_progress", "enabled")
        reg.cancel_completion_job(jid)

    def test_unknown_job_raises(self, tmp_path):
        import pytest

        reg = JobRegistry(str(tmp_path / "jobs"))
        with pytest.raises(KeyError, match="no job"):
            reg.get_job_status(99)


class TestFailedJobResume:
    def test_resume_clears_failure_and_restarts(self, spark, tmp_path):
        """resume of a FAILED job is a retry: failure markers clear,
        the dead handle is dropped, the stream restarts from its
        checkpoint (the review finding: the stale handle blocked the
        restart and 'failed' stuck forever)."""
        src = str(tmp_path / "src")
        out = str(tmp_path / "out")
        _write_docs(spark, src + "/b0", [(1, "alpha")])
        reg = JobRegistry(str(tmp_path / "jobs"))
        jid = reg.submit_embedding_job(
            spark, src + "/*", SCHEMA, "text", "emb", out
        )
        q = reg._queries[jid]
        q.processAllAvailable()
        q.stop()  # dead handle stays registered, simulating a crash
        reg._update(
            jid,
            init_failed_at=1.0,
            init_failure_reason="simulated source failure",
        )
        status, _, err = reg.get_embedding_job_status(jid)
        assert status == "failed" and "simulated" in err
        _write_docs(spark, src + "/b1", [(2, "beta")])
        reg.resume_embedding_job(spark, jid)
        reg._queries[jid].processAllAvailable()
        status, _, err = reg.get_embedding_job_status(jid)
        assert status in ("in_progress", "enabled") and err is None
        reg.cancel_job(jid)
        got = spark.read.parquet(out)
        assert got.count() == 2  # no re-embed of row 1
