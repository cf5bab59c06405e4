"""Object-store seam (r14, review r13 item 1): the streaming layout
machinery must run on a filesystem WITHOUT rename — S3/GCS semantics,
where the only atomic primitive is a single-object PUT.

`RenamelessFS` is the executable spec: LocalFS storage (so Spark reads
and writes the same paths natively) with `rename` removed — any code
path still depending on a rename raises instead of silently passing.
Over it, the consolidation publish must degrade to the
generation-pointer commit, and the full at-least-once discipline
(crash recovery, exactly-once fragment folding, replay skip) must hold
unchanged."""

import json
import os

import pytest

from lantern_spark._fsutil import (
    LOCAL_FS,
    RenamelessFS,
    vd_commit,
    vd_live,
    vd_recover,
    vd_stage,
)

OFS = RenamelessFS()

DOCS = "doc_id long, text string"


def _docs(n0, n1):
    return [
        (i, f"spark stream doc {i} " + ("common " * (i % 3)))
        for i in range(n0, n1)
    ]


class TestVersionedDirProtocol:
    def test_renameless_fs_refuses_rename(self, tmp_path):
        with pytest.raises(NotImplementedError, match="cannot rename"):
            OFS.rename(str(tmp_path / "a"), str(tmp_path / "b"))

    def test_write_text_is_atomic_publish(self, tmp_path):
        p = str(tmp_path / "ctrl" / "_epochs.json")
        OFS.write_text(p, "[1, 2]")
        assert OFS.read_text(p) == "[1, 2]"
        OFS.write_text(p, "[1, 2, 3]")
        assert json.loads(OFS.read_text(p)) == [1, 2, 3]
        # no tmp litter left beside the object
        assert [
            f for f in os.listdir(tmp_path / "ctrl") if "tmp" in f
        ] == []

    def test_generation_arithmetic(self, tmp_path):
        d = str(tmp_path / "edges")
        # no pointer yet: live is the implicit initial generation
        assert vd_live(d, OFS).endswith("gen-000000")
        s1 = vd_stage(d, OFS)
        assert s1.endswith("gen-000001")
        OFS.makedirs(s1)
        OFS.write_text(OFS.join(s1, "part-0.parquet"), "x")
        OFS.makedirs(vd_live(d, OFS))
        vd_commit(d, s1, OFS)
        assert vd_live(d, OFS) == s1
        assert vd_stage(d, OFS).endswith("gen-000002")
        # superseded generation was deleted by the commit
        assert not OFS.isdir(OFS.join(d, "gen-000000"))

    def test_recover_clears_orphan_generation(self, tmp_path):
        """Crash BEFORE the pointer PUT: the fully- or half-written
        next generation is an orphan; recover removes it and the live
        data is the untouched pre-rewrite generation."""
        d = str(tmp_path / "edges")
        live = vd_live(d, OFS)
        OFS.makedirs(live)
        OFS.write_text(OFS.join(live, "part-0.parquet"), "live")
        orphan = vd_stage(d, OFS)
        OFS.makedirs(orphan)
        OFS.write_text(OFS.join(orphan, "part-0.parquet"), "orphan")
        vd_recover(d, OFS)
        assert not OFS.isdir(orphan)
        assert OFS.read_text(OFS.join(live, "part-0.parquet")) == "live"

    def test_recover_clears_superseded_generation(self, tmp_path):
        """Crash AFTER the pointer PUT but before the old-generation
        delete: the commit already happened (readers resolve the new
        generation — no double count even before recovery); recover
        just finishes the cleanup."""
        d = str(tmp_path / "edges")
        old = vd_live(d, OFS)
        OFS.makedirs(old)
        new = vd_stage(d, OFS)
        OFS.makedirs(new)
        OFS.write_text(OFS.join(new, "part-0.parquet"), "new")
        # pointer PUT without the delete = the crash window
        OFS.write_text(
            OFS.join(d, "_CURRENT"),
            json.dumps({"gen": new.rsplit("/", 1)[-1]}),
        )
        assert vd_live(d, OFS) == new  # already committed
        vd_recover(d, OFS)
        assert not OFS.isdir(old)
        assert vd_live(d, OFS) == new

    def test_local_fs_protocol_unchanged(self, tmp_path):
        """The rename-capable default keeps the plain-dir layout: live
        IS the dir, staging is `__staged`, publish is the swap."""
        d = str(tmp_path / "postings")
        assert vd_live(d, LOCAL_FS) == d
        assert vd_stage(d, LOCAL_FS) == d + "__staged"


class TestBm25StreamOnObjectStore:
    def test_stream_consolidate_and_replay(self, spark, tmp_path):
        """Full job on the rename-less FS: fragments land inside the
        committed generation, the trigger fires, consolidation
        publishes via the pointer, scores equal a one-shot batch
        build, and a checkpoint rerun adds nothing."""
        from lantern_spark.operators.bm25 import (
            build_bm25_stats,
            search_bm25,
        )
        from lantern_spark.streaming.bm25_stream import (
            incremental_bm25_job,
            load_bm25_stats,
        )

        src = tmp_path / "src"
        src.mkdir()
        sp = str(tmp_path / "stats")
        chk = str(tmp_path / "chk")
        chunks = [_docs(0, 20), _docs(20, 40), _docs(40, 60)]
        for i, c in enumerate(chunks):
            spark.createDataFrame(c, DOCS).repartition(1).write.mode(
                "overwrite"
            ).parquet(str(src / f"b{i}"))

        query, state = incremental_bm25_job(
            spark, sp, str(src) + "/*", DOCS, "doc_id", "text", chk,
            consolidate_every_fragments=2, max_files_per_trigger=1,
            fs=OFS,
        )
        try:
            query.processAllAvailable()
        finally:
            query.stop()
        assert state["batches"] == 3
        assert state["consolidations"] >= 1
        # layout is generation-shaped: pointer + exactly one live gen
        assert OFS.read_text(os.path.join(sp, "postings", "_CURRENT"))
        gens = [
            g
            for g in OFS.listdir(os.path.join(sp, "postings"))
            if g.startswith("gen-")
        ]
        assert len(gens) == 1

        streamed = load_bm25_stats(spark, sp, fs=OFS)
        batch = build_bm25_stats(
            spark.createDataFrame(_docs(0, 60), DOCS), "doc_id", "text"
        )
        s_top = search_bm25(streamed, "common spark", limit=10).collect()
        b_top = search_bm25(batch, "common spark", limit=10).collect()
        assert [
            (r.doc_id, round(r.bm25_score, 6)) for r in s_top
        ] == [(r.doc_id, round(r.bm25_score, 6)) for r in b_top]

        # exactly-once: rerun over the same checkpoint adds nothing
        q2, s2 = incremental_bm25_job(
            spark, sp, str(src) + "/*", DOCS, "doc_id", "text", chk,
            fs=OFS,
        )
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()
        assert s2["batches"] == 0
        n1 = streamed.corpus.first()["num_docs"]
        assert (
            load_bm25_stats(spark, sp, fs=OFS).corpus.first()["num_docs"]
            == n1
            == 60
        )

    def test_crash_before_pointer_put_recovers(self, spark, tmp_path):
        """A consolidation that wrote its staged generation but died
        before the pointer PUT: recovery drops the orphan, the
        unconsolidated fragments are intact, and a clean consolidation
        afterwards folds exactly once."""
        from lantern_spark.operators.bm25 import build_bm25_stats
        from lantern_spark.streaming.bm25_stream import (
            consolidate_bm25_path,
            load_bm25_stats,
            recover_bm25_path,
            write_bm25_stats,
        )

        sp = str(tmp_path / "stats")
        for e, (a, b) in enumerate([(0, 15), (15, 30)]):
            stats = build_bm25_stats(
                spark.createDataFrame(_docs(a, b), DOCS), "doc_id", "text"
            )
            write_bm25_stats(stats, sp, epoch=e, fs=OFS)

        # simulate the crash: staged write completes, no pointer PUT
        stats = load_bm25_stats(spark, sp, fs=OFS)
        proot = os.path.join(sp, "postings")
        staged = vd_stage(proot, OFS)
        stats.postings.write.mode("overwrite").parquet(staged)
        assert OFS.isdir(staged)

        recover_bm25_path(sp, fs=OFS)
        assert not OFS.isdir(staged)  # orphan cleared
        after = load_bm25_stats(spark, sp, fs=OFS)
        assert after.corpus.first()["num_docs"] == 30

        consolidate_bm25_path(spark, sp, fs=OFS)
        done = load_bm25_stats(spark, sp, fs=OFS)
        assert done.corpus.first()["num_docs"] == 30
        # fragments folded: no batch_* dirs left in the live gen
        live = vd_live(proot, OFS)
        assert [
            d for d in OFS.listdir(live) if d.startswith("batch_")
        ] == []

    def test_crash_after_pointer_put_no_double_count(
        self, spark, tmp_path, monkeypatch
    ):
        """A consolidation that died between the pointer PUT and the
        old-generation delete: readers already resolve the new
        generation (counts exact immediately), recovery finishes the
        delete."""
        from lantern_spark.operators.bm25 import build_bm25_stats
        from lantern_spark.streaming.bm25_stream import (
            consolidate_bm25_path,
            load_bm25_stats,
            recover_bm25_path,
            write_bm25_stats,
        )

        sp = str(tmp_path / "stats")
        for e, (a, b) in enumerate([(0, 10), (10, 25)]):
            stats = build_bm25_stats(
                spark.createDataFrame(_docs(a, b), DOCS), "doc_id", "text"
            )
            write_bm25_stats(stats, sp, epoch=e, fs=OFS)

        # crash window: suppress the post-commit delete
        kill = {"on": True}
        real_rmtree = RenamelessFS.rmtree

        def crashy_rmtree(self, path):
            if kill["on"] and "/gen-" in path:
                return  # died before the cleanup
            real_rmtree(self, path)

        monkeypatch.setattr(RenamelessFS, "rmtree", crashy_rmtree)
        consolidate_bm25_path(spark, sp, fs=OFS)
        kill["on"] = False

        proot = os.path.join(sp, "postings")
        gens = [
            g for g in OFS.listdir(proot) if g.startswith("gen-")
        ]
        assert len(gens) == 2  # superseded gen still on disk
        # no double count: the pointer commit is the read boundary
        assert (
            load_bm25_stats(spark, sp, fs=OFS).corpus.first()["num_docs"]
            == 25
        )
        recover_bm25_path(sp, fs=OFS)
        gens = [
            g for g in OFS.listdir(proot) if g.startswith("gen-")
        ]
        assert len(gens) == 1
        assert (
            load_bm25_stats(spark, sp, fs=OFS).corpus.first()["num_docs"]
            == 25
        )


class TestGraphStreamOnObjectStore:
    SCHEMA = "url string, html string"
    HOSTS = ["a.co.uk", "b.com", "c.net", "d.org"]

    def _pages(self, n0, n1):
        rows = []
        for i in range(n0, n1):
            host = self.HOSTS[i % 4]
            t1 = self.HOSTS[(i + 1) % 4]
            html = f'<a href="https://{t1}/x">1</a>'
            rows.append((f"https://{host}/p/{i}", html))
        return rows

    def test_stream_equals_batch_on_object_store(self, spark, tmp_path):
        from lantern_spark.operators.weburl import domain_link_graph
        from lantern_spark.streaming.graph_stream import (
            incremental_link_graph_job,
            load_link_graph,
        )

        src = tmp_path / "src"
        src.mkdir()
        gp = str(tmp_path / "graph")
        chk = str(tmp_path / "chk")
        for i, chunk in enumerate(
            [self._pages(0, 12), self._pages(12, 24)]
        ):
            spark.createDataFrame(chunk, self.SCHEMA).repartition(
                1
            ).write.mode("overwrite").parquet(str(src / f"b{i}"))
        query, state = incremental_link_graph_job(
            spark, gp, str(src) + "/*", self.SCHEMA, "url", "html", chk,
            consolidate_every_fragments=2, max_files_per_trigger=1,
            fs=OFS,
        )
        try:
            query.processAllAvailable()
        finally:
            query.stop()
        assert state["batches"] == 2 and state["consolidations"] >= 1
        streamed = {
            (r.src_domain, r.dst_domain): r.n_links
            for r in load_link_graph(spark, gp, fs=OFS).collect()
        }
        full = {
            (r.src_domain, r.dst_domain): r.n_links
            for r in domain_link_graph(
                spark.createDataFrame(
                    self._pages(0, 24), self.SCHEMA
                ),
                "url",
                "html",
            ).collect()
        }
        assert streamed == full and streamed
        # pointer-shaped layout, single live generation
        assert OFS.read_text(os.path.join(gp, "edges", "_CURRENT"))
        gens = [
            g
            for g in OFS.listdir(os.path.join(gp, "edges"))
            if g.startswith("gen-")
        ]
        assert len(gens) == 1

    def test_empty_layout_reads_empty_on_object_store(
        self, spark, tmp_path
    ):
        from lantern_spark.streaming.graph_stream import load_link_graph

        gp = str(tmp_path / "nothing")
        df = load_link_graph(spark, gp, fs=OFS)
        assert df.columns == ["src_domain", "dst_domain", "n_links"]
        assert df.count() == 0


class TestNeardupStreamOnObjectStore:
    BASE = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "green turtles watch from a mossy log near the river bend and "
        "count passing clouds all afternoon in complete silence"
    )

    @pytest.mark.slow
    def test_gate_with_bloom_and_consolidation(self, spark, tmp_path):
        """The heaviest layout user — per-epoch docs+buckets fragments,
        a staged-swap bloom filter, excluded-epoch consolidation — all
        on the rename-less FS: duplicates still drop across batches,
        consolidation publishes via the pointer with the current epoch
        preserved standalone, and the bloom layout is pointer-shaped."""
        from lantern_spark.streaming.neardup_stream import (
            incremental_neardup_job,
            load_neardup_survivors,
        )

        docs = {
            1: self.BASE,
            2: self.BASE.replace("clouds", "boats"),   # near-dup of 1
            3: "an entirely different document about spark shuffles "
               "and partition pruning with no shared shingles here",
            4: self.BASE.replace("turtles", "rabbits"),  # near-dup
            5: "another unique text concerning bloom filters rolling "
               "hashes and suffix arrays in large corpora work",
        }
        src = tmp_path / "src"
        src.mkdir()
        schema = "doc_id long, text string"
        for i, ids in enumerate([[1, 3], [2, 5], [4]]):
            spark.createDataFrame(
                [(d, docs[d]) for d in ids], schema
            ).repartition(1).write.mode("overwrite").parquet(
                str(src / f"b{i}")
            )
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", "1"
        ).parquet(str(src) + "/*")
        store = str(tmp_path / "store")
        q = incremental_neardup_job(
            stream, "text", "doc_id", store, str(tmp_path / "chk"),
            consolidate_every_batches=2, fs=OFS,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = sorted(
            r["doc_id"]
            for r in load_neardup_survivors(spark, store, fs=OFS).collect()
        )
        assert got == [1, 3, 5]
        # consolidation ran under the pointer protocol: docs live gen
        # holds batch_consolidated (+ the excluded current epoch)
        assert OFS.read_text(os.path.join(store, "docs", "_CURRENT"))
        live = vd_live(os.path.join(store, "docs"), OFS)
        names = set(OFS.listdir(live))
        assert "batch_consolidated" in names
        # bloom filter layout is pointer-shaped too
        assert OFS.read_text(os.path.join(store, "bloom", "_CURRENT"))


class TestArrowFSAdapter:
    """The pyarrow.fs adapter carries the same contract against a real
    FileSystem implementation (LocalFileSystem via file:// standing in
    for S3FileSystem — same API surface, same rename-less treatment)."""

    def test_control_plane_ops(self, tmp_path):
        from lantern_spark._fsutil import ArrowFS

        fs = ArrowFS(f"file://{tmp_path}")
        assert not fs.supports_rename
        root = str(tmp_path / "layout")
        fs.makedirs(os.path.join(root, "edges"))
        assert fs.isdir(os.path.join(root, "edges"))
        fs.write_text(os.path.join(root, "_epochs.json"), "[0, 1]")
        assert json.loads(fs.read_text(os.path.join(root, "_epochs.json"))) == [0, 1]
        assert fs.read_text(os.path.join(root, "absent.json")) is None
        # walk/list over a small tree
        fs.makedirs(os.path.join(root, "edges", "batch_0"))
        with open(
            os.path.join(root, "edges", "batch_0", "part-0.parquet"), "wb"
        ) as fh:
            fh.write(b"abc")
        assert sorted(fs.listdir(os.path.join(root, "edges"))) == [
            "batch_0"
        ]
        files = list(fs.walk_files(os.path.join(root, "edges")))
        assert len(files) == 1 and files[0][1] == 3
        with pytest.raises(NotImplementedError):
            fs.rename("a", "b")
        fs.rmtree(os.path.join(root, "edges"))
        assert not fs.isdir(os.path.join(root, "edges"))

    def test_generation_protocol_over_arrow_fs(self, tmp_path):
        from lantern_spark._fsutil import ArrowFS

        fs = ArrowFS(f"file://{tmp_path}")
        d = str(tmp_path / "postings")
        assert vd_live(d, fs).endswith("gen-000000")
        s = vd_stage(d, fs)
        fs.makedirs(s)
        fs.write_text(fs.join(s, "part-0.parquet"), "x")
        vd_commit(d, s, fs)
        assert vd_live(d, fs) == s
