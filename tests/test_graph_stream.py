"""streaming/graph_stream (r13): continuous link-graph maintenance —
pages streaming in across micro-batches must produce the SAME edge
relation as one batch build, survive replays without double-counting,
consolidate on the fragment trigger, and feed the graph operators
directly."""

import os

import pytest
from pyspark.sql import functions as F

from lantern_spark.streaming.graph_stream import (
    consolidate_graph_path,
    incremental_link_graph_job,
    load_link_graph,
)

SCHEMA = "url string, html string"

_HOSTS = ["a.co.uk", "b.com", "c.net", "d.org"]


def _pages(n0, n1):
    rows = []
    for i in range(n0, n1):
        host = _HOSTS[i % 4]
        t1 = _HOSTS[(i + 1) % 4]
        t2 = _HOSTS[(i + 2) % 4]
        html = f'<a href="https://{t1}/x">1</a>'
        if i % 3 == 0:
            html += f"<A HREF='https://{t2}/y'>2</A>"
        html += '<a href="/self">s</a><a href="#f">f</a>'
        rows.append((f"https://{host}/p/{i}", html))
    return rows


def _edge_map(df):
    return {
        (r.src_domain, r.dst_domain): r.n_links for r in df.collect()
    }


class TestGraphStream:
    @pytest.mark.slow
    def test_stream_equals_batch_build(self, spark, tmp_path):
        from lantern_spark.operators.weburl import domain_link_graph

        src = tmp_path / "src"
        src.mkdir()
        gp = str(tmp_path / "graph")
        chk = str(tmp_path / "chk")
        chunks = [_pages(0, 12), _pages(12, 24), _pages(24, 36)]
        for i, chunk in enumerate(chunks):
            spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.mode(
                "overwrite"
            ).parquet(str(src / f"b{i}"))

        query, state = incremental_link_graph_job(
            spark, gp, str(src) + "/*", SCHEMA, "url", "html", chk,
            consolidate_every_fragments=3, max_files_per_trigger=1,
        )
        try:
            query.processAllAvailable()
        finally:
            query.stop()
        assert state["batches"] == 3
        assert state["consolidations"] >= 1
        streamed = _edge_map(load_link_graph(spark, gp))
        full = _edge_map(
            domain_link_graph(
                spark.createDataFrame(_pages(0, 36), SCHEMA), "url", "html"
            )
        )
        assert streamed == full and streamed
        # exactly-once: rerun over the same checkpoint adds nothing
        query2, state2 = incremental_link_graph_job(
            spark, gp, str(src) + "/*", SCHEMA, "url", "html", chk
        )
        try:
            query2.processAllAvailable()
        finally:
            query2.stop()
        assert state2["batches"] == 0
        assert _edge_map(load_link_graph(spark, gp)) == full

    def test_consolidation_compacts_preserving_edges(self, spark, tmp_path):
        src = tmp_path / "src"
        src.mkdir()
        gp = str(tmp_path / "graph")
        chk = str(tmp_path / "chk")
        for i, chunk in enumerate([_pages(0, 10), _pages(10, 20)]):
            spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.mode(
                "overwrite"
            ).parquet(str(src / f"b{i}"))
        query, _ = incremental_link_graph_job(
            spark, gp, str(src) + "/*", SCHEMA, "url", "html", chk,
            consolidate_every_fragments=None, max_files_per_trigger=1,
        )
        try:
            query.processAllAvailable()
        finally:
            query.stop()
        before = _edge_map(load_link_graph(spark, gp))
        frag_dirs = [
            d
            for d in os.listdir(os.path.join(gp, "edges"))
            if d.startswith("batch_")
        ]
        assert len(frag_dirs) == 2
        consolidate_graph_path(spark, gp)
        after_dirs = [
            d
            for d in os.listdir(os.path.join(gp, "edges"))
            if d.startswith("batch_")
        ]
        assert after_dirs == []  # compacted flat
        assert _edge_map(load_link_graph(spark, gp)) == before

    def test_consolidated_files_do_not_retrigger(self, spark, tmp_path):
        """Amortization contract (r14, review r13 advice): the trigger
        counts only ``batch_*`` fragment files, so a consolidated
        rewrite with >= consolidate_every_fragments output partitions
        (shuffle partitions routinely exceed the trigger) cannot keep
        the counter over threshold and force a full-table shuffle on
        every subsequent micro-batch."""
        from lantern_spark.streaming.bm25_stream import _fragment_count

        gp = str(tmp_path / "graph")
        edir = os.path.join(gp, "edges")
        os.makedirs(edir)
        # a consolidated layout wider than any sane trigger
        for i in range(40):
            open(os.path.join(edir, f"part-{i:05d}.parquet"), "w").close()
        assert _fragment_count(gp, "edges") == 0
        os.makedirs(os.path.join(edir, "batch_7"))
        open(os.path.join(edir, "batch_7", "part-0.parquet"), "w").close()
        assert _fragment_count(gp, "edges") == 1
        # and end-to-end: a real consolidation leaves the counter at 0
        src = tmp_path / "src"
        src.mkdir()
        gp2 = str(tmp_path / "graph2")
        spark.createDataFrame(_pages(0, 10), SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / "b0"))
        q, _ = incremental_link_graph_job(
            spark, gp2, str(src) + "/*", SCHEMA, "url", "html",
            str(tmp_path / "chk2"), consolidate_every_fragments=None,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        consolidate_graph_path(spark, gp2)
        assert _fragment_count(gp2, "edges") == 0

    def test_fresh_checkpoint_on_existing_layout_refused(
        self, spark, tmp_path
    ):
        src = tmp_path / "src"
        src.mkdir()
        gp = str(tmp_path / "graph")
        spark.createDataFrame(_pages(0, 8), SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / "b0"))
        q, _ = incremental_link_graph_job(
            spark, gp, str(src) + "/*", SCHEMA, "url", "html",
            str(tmp_path / "chk1"),
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        with pytest.raises(ValueError, match="bound to a different"):
            incremental_link_graph_job(
                spark, gp, str(src) + "/*", SCHEMA, "url", "html",
                str(tmp_path / "chk2"),
            )

    def test_empty_layout_reads_as_empty_relation(self, spark, tmp_path):
        """A monitoring query racing the first micro-batch sees an
        empty edge relation, not a path error."""
        gp = str(tmp_path / "nothing_yet")
        df = load_link_graph(spark, gp)
        assert df.columns == ["src_domain", "dst_domain", "n_links"]
        assert df.count() == 0
        os.makedirs(os.path.join(gp, "edges"))  # dir exists, no files
        assert load_link_graph(spark, gp).count() == 0

    def test_storage_checkpoint_mode_reaches_foreachbatch(
        self, spark, tmp_path
    ):
        """r14 (review r13 item 6): the lineage-cut policy is
        process-global ON PURPOSE — foreachBatch callbacks run on
        their own driver threads, and a thread-local would silently
        revert them to non-durable localCheckpoint after the user
        opted into durability. Proof: a graph stream started under
        storage mode writes its per-batch cuts into the configured
        dir FROM the foreachBatch thread, and the edges match a
        local-mode batch build exactly."""
        from lantern_spark.operators.weburl import domain_link_graph
        from lantern_spark.plans.lineage import checkpoint_mode

        src = tmp_path / "src"
        src.mkdir()
        gp = str(tmp_path / "graph")
        sto = str(tmp_path / "durable_cuts")
        spark.createDataFrame(_pages(0, 16), SCHEMA).repartition(
            1
        ).write.mode("overwrite").parquet(str(src / "b0"))
        with checkpoint_mode("storage", dir=sto):
            q, state = incremental_link_graph_job(
                spark, gp, str(src) + "/*", SCHEMA, "url", "html",
                str(tmp_path / "chk"),
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
        assert state["batches"] == 1
        cuts = [p for p in os.listdir(sto) if p.startswith("cut-")]
        assert cuts, "storage policy did not reach the foreachBatch thread"
        assert _edge_map(load_link_graph(spark, gp)) == _edge_map(
            domain_link_graph(
                spark.createDataFrame(_pages(0, 16), SCHEMA), "url", "html"
            )
        )

    def test_feeds_graph_operators(self, spark, tmp_path):
        from lantern_spark.operators.weburl import (
            domain_pagerank,
            expand_seed_domains,
        )

        src = tmp_path / "src"
        src.mkdir()
        gp = str(tmp_path / "graph")
        spark.createDataFrame(_pages(0, 24), SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / "b0"))
        q, _ = incremental_link_graph_job(
            spark, gp, str(src) + "/*", SCHEMA, "url", "html",
            str(tmp_path / "chk"),
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        edges = load_link_graph(spark, gp)
        mass = (
            domain_pagerank(edges, iterations=4)
            .agg(F.sum("rank").alias("m"))
            .first()["m"]
        )
        assert abs(mass - 1.0) < 1e-6
        reached = expand_seed_domains(edges, ["a.co.uk"], hops=2)
        assert reached.count() >= 3
