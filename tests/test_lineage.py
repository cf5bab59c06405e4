"""plans/lineage (r13, review r12 item 1): the lineage-cut seam.

``localCheckpoint`` stores lineage-truncated blocks on executors
WITHOUT replication — correct and free on local[*], unrecoverable
after one executor loss on a real cluster. These tests pin the seam's
contract: (a) mode plumbing (set/scope/restore, error paths), (b)
RESULTS ARE MODE-INVARIANT for every operator threaded through
``cut_lineage`` — the graph build, PageRank, seed expansion, and the
distributed connected-components loop produce identical rows under
``local``, ``reliable``, and ``storage``, and (c) the durable modes
actually write to durable storage (files appear under the configured
dir — a silent fallback to localCheckpoint would pass (b) while
lying about durability)."""

import os

import pytest
from pyspark.sql import functions as F

from lantern_spark.plans.lineage import (
    checkpoint_mode,
    cut_lineage,
    get_checkpoint_mode,
    set_checkpoint_mode,
)


class TestModePlumbing:
    def test_default_is_local(self):
        assert get_checkpoint_mode()[0] == "local"

    def test_bad_mode_raises(self):
        with pytest.raises(ValueError, match="checkpoint mode"):
            set_checkpoint_mode("replicated")

    def test_storage_requires_dir(self):
        with pytest.raises(ValueError, match="requires dir"):
            set_checkpoint_mode("storage")

    def test_scope_restores_previous_mode(self):
        assert get_checkpoint_mode() == ("local", None)
        with checkpoint_mode("storage", dir="/tmp/x"):
            assert get_checkpoint_mode() == ("storage", "/tmp/x")
            with checkpoint_mode("local"):
                assert get_checkpoint_mode()[0] == "local"
            assert get_checkpoint_mode() == ("storage", "/tmp/x")
        assert get_checkpoint_mode() == ("local", None)

    def test_scope_restores_on_error(self):
        with pytest.raises(RuntimeError):
            with checkpoint_mode("storage", dir="/tmp/x"):
                raise RuntimeError("boom")
        assert get_checkpoint_mode() == ("local", None)

    def test_scheduling_only_noop_under_durable_modes(self, spark, tmp_path):
        """r15 (r14 ADVICE): query-path cuts marked scheduling_only are
        pure per-call scheduling shares — under reliable/storage modes
        they must return df UNCHANGED (no durable copy staged per call,
        no storage leaf leaked); under local mode they cut as before."""
        df = spark.range(8).selectExpr("id", "id * 2 as v")
        with checkpoint_mode("storage", dir=str(tmp_path / "s")):
            out = cut_lineage(df, eager=False, scheduling_only=True)
            assert out is df
            assert not (tmp_path / "s").exists() or not any(
                (tmp_path / "s").iterdir()
            )
        # reliable mode: returns df before even consulting the
        # checkpoint dir (deliberately NOT setting one here — the
        # shared context keeps none, so test_reliable_without_dir_raises
        # below stays meaningful)
        with checkpoint_mode("reliable"):
            out = cut_lineage(df, eager=False, scheduling_only=True)
            assert out is df
        # local mode: still a real cut (plan no longer references df's
        # lineage) with identical rows
        cut = cut_lineage(df, eager=False, scheduling_only=True)
        assert cut is not df
        assert sorted(tuple(r) for r in cut.collect()) == sorted(
            tuple(r) for r in df.collect()
        )

    def test_reliable_without_dir_raises(self, spark):
        # must run before any test sets a checkpoint dir on the shared
        # context — guarded by the assert, not by test ordering
        if spark.sparkContext.getCheckpointDir() is not None:
            pytest.skip("a prior test already set a checkpoint dir")
        df = spark.range(4)
        with checkpoint_mode("reliable"):
            with pytest.raises(ValueError, match="checkpoint dir"):
                cut_lineage(df)


def _pages(spark, n=36):
    """Tiny deterministic link corpus: host ring with a %3 chord and a
    root-relative self link — the domain_link_graph fixture shape at
    unit-test size."""
    hosts = ["a.co.uk", "b.com", "c.net", "d.org"]
    harr = F.array(*[F.lit(h) for h in hosts])
    d = F.col("id")
    host = F.element_at(harr, (d % 4).cast("int") + 1)
    t1 = F.element_at(harr, ((d + 1) % 4).cast("int") + 1)
    t2 = F.element_at(harr, ((d + 2) % 4).cast("int") + 1)
    return spark.range(n).select(
        F.concat(F.lit("https://"), host, F.lit("/p")).alias("url"),
        F.concat(
            F.lit('<a href="https://'), t1, F.lit('/x">1</a>'),
            F.when(
                d % 3 == 0,
                F.concat(F.lit('<a href="https://'), t2, F.lit('/y">2</a>')),
            ).otherwise(F.lit("")),
            F.lit('<a href="/self">s</a>'),
        ).alias("html"),
    )


def _rows(df, float_round=None):
    rows = []
    for r in df.collect():
        vals = []
        for v in r:
            if float_round is not None and isinstance(v, float):
                v = round(v, float_round)
            vals.append(v)
        rows.append(tuple(vals))
    return sorted(rows)


class TestModeInvariance:
    def _graph_rows(self, spark):
        from lantern_spark.operators.weburl import domain_link_graph

        return _rows(domain_link_graph(_pages(spark), "url", "html"))

    def _pagerank_rows(self, spark, edges):
        from lantern_spark.operators.weburl import domain_pagerank

        return _rows(
            domain_pagerank(edges, iterations=4, checkpoint_every=2),
            float_round=9,
        )

    def _expand_rows(self, spark, edges):
        from lantern_spark.operators.weburl import expand_seed_domains

        return _rows(expand_seed_domains(edges, ["a.co.uk"], hops=2))

    def _harmonic_rows(self, spark, edges):
        from lantern_spark.operators.weburl import (
            domain_harmonic_centrality,
        )

        return _rows(
            domain_harmonic_centrality(edges, max_hops=3, log2m=6),
            float_round=9,
        )

    def _cc_rows(self, spark):
        from lantern_spark.operators.dedup import connected_components

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (3, 4)],
            "id_a long, id_b long",
        )
        # local_threshold=0 forces the DISTRIBUTED label-propagation
        # loop — the path with per-iteration lineage cuts
        return _rows(connected_components(pairs, local_threshold=0))

    @pytest.mark.slow
    def test_all_modes_identical(self, spark, tmp_path):
        from lantern_spark.operators.weburl import domain_link_graph

        edges = domain_link_graph(_pages(spark), "url", "html").cache()
        baseline = {
            "graph": self._graph_rows(spark),
            "pagerank": self._pagerank_rows(spark, edges),
            "expand": self._expand_rows(spark, edges),
            "cc": self._cc_rows(spark),
            "harmonic": self._harmonic_rows(spark, edges),
        }
        assert baseline["graph"], "fixture produced no edges"
        assert len(baseline["expand"]) >= 3  # seed + 2 hop tiers

        rel_dir = str(tmp_path / "reliable_ckpt")
        sto_dir = str(tmp_path / "storage_ckpt")
        with checkpoint_mode("reliable", dir=rel_dir):
            assert self._graph_rows(spark) == baseline["graph"]
            assert self._pagerank_rows(spark, edges) == baseline["pagerank"]
            assert self._expand_rows(spark, edges) == baseline["expand"]
            assert self._cc_rows(spark) == baseline["cc"]
            assert self._harmonic_rows(spark, edges) == baseline["harmonic"]
            # durability witness: reliable checkpoints actually hit disk
            found = [
                f
                for _, _, fs in os.walk(rel_dir)
                for f in fs
                if not f.startswith(".")
            ]
            assert found, "reliable mode wrote nothing to the checkpoint dir"
        with checkpoint_mode("storage", dir=sto_dir):
            assert self._graph_rows(spark) == baseline["graph"]
            assert self._pagerank_rows(spark, edges) == baseline["pagerank"]
            assert self._expand_rows(spark, edges) == baseline["expand"]
            assert self._cc_rows(spark) == baseline["cc"]
            assert self._harmonic_rows(spark, edges) == baseline["harmonic"]
            cuts = [p for p in os.listdir(sto_dir) if p.startswith("cut-")]
            assert cuts, "storage mode wrote no staged cuts"
        edges.unpersist()

    @pytest.mark.slow
    def test_storage_leaf_gc_bounds_growth(self, spark, tmp_path):
        """r14 (review r13 item 2): storage mode must not leak one
        state copy per cut. After a 6-hop harmonic AND a 20-iteration
        pagerank against the same dir, at most 2 cut-* leaves are
        live (ONE final state per loop — superseded leaves are
        chain-deleted as each next cut materializes), and the results
        remain collectable from their surviving leaves."""
        from lantern_spark.operators.weburl import (
            domain_harmonic_centrality,
            domain_link_graph,
            domain_pagerank,
        )

        edges = domain_link_graph(_pages(spark), "url", "html").cache()
        sto = str(tmp_path / "gc_ckpt")
        with checkpoint_mode("storage", dir=sto):
            harm = domain_harmonic_centrality(
                edges, max_hops=6, log2m=6, checkpoint_every=1
            )
            h_rows = _rows(harm, float_round=9)
            pr = domain_pagerank(
                edges, iterations=20, checkpoint_every=1
            )
            p_rows = _rows(pr, float_round=9)
            cuts = [p for p in os.listdir(sto) if p.startswith("cut-")]
            assert len(cuts) <= 2, f"leaked leaves: {cuts}"
            # results still live off their final leaves
            assert _rows(harm, float_round=9) == h_rows
            assert _rows(pr, float_round=9) == p_rows
            # the between-jobs sweep clears the final leaves too
            from lantern_spark.plans.lineage import clear_storage_cuts

            clear_storage_cuts(sto)
            assert [
                p for p in os.listdir(sto) if p.startswith("cut-")
            ] == []
        edges.unpersist()

    def test_storage_leaf_gc_connected_components(self, spark, tmp_path):
        """CC's convergence check reads the PREVIOUS labels after the
        new cut materializes, so its chain keeps 2 leaves — bounded,
        and the prior leaf must NOT be deleted early (a keep=1 chain
        would make the check read a vanished leaf)."""
        from lantern_spark.operators.dedup import connected_components

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (3, 4)],
            "id_a long, id_b long",
        )
        sto = str(tmp_path / "cc_ckpt")
        with checkpoint_mode("storage", dir=sto):
            got = _rows(connected_components(pairs, local_threshold=0))
            # edges cut (unchained, referenced all loop) + <=2 chained
            cuts = [p for p in os.listdir(sto) if p.startswith("cut-")]
            assert len(cuts) <= 3, f"leaked leaves: {cuts}"
        assert got == self._cc_rows(spark)

    def test_chain_release_and_context_exit(self, spark, tmp_path):
        from lantern_spark.plans.lineage import CutChain

        sto = str(tmp_path / "rel_ckpt")
        df = spark.range(8)
        with checkpoint_mode("storage", dir=sto):
            with CutChain() as ch:
                out = cut_lineage(df, chain=ch)
                assert out.count() == 8
                assert len(os.listdir(sto)) == 1
            # context exit released the final leaf too
            assert [
                p for p in os.listdir(sto) if p.startswith("cut-")
            ] == []
            # chains are inert outside storage mode
        with CutChain() as ch2:
            local_cut = cut_lineage(df, chain=ch2)
            assert local_cut.count() == 8

    def test_simhash_near_pairs_mode_invariant(self, spark, tmp_path):
        from lantern_spark.operators.dedup import (
            simhash_docs,
            simhash_near_pairs,
        )

        docs = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog"),
                (2, "the quick brown fox jumps over the lazy cat"),
                (3, "completely different text about spark plans"),
            ],
            "doc_id long, text string",
        )
        hashes = simhash_docs(docs, "text", "doc_id")
        base = _rows(simhash_near_pairs(hashes, "doc_id", max_hamming=16))
        with checkpoint_mode("storage", dir=str(tmp_path / "sh")):
            got = _rows(simhash_near_pairs(hashes, "doc_id", max_hamming=16))
        assert got == base
