"""Hamming (packed-bit) index support — the dist_hamming_ops op-class
analog (lantern.sql:63-104): both index families over integer[] bit
packs, with the hamming_dist semantics of hnsw.c:308-318 (32-bit words,
xor + popcount).

Binary fixtures have heavy distance ties (64-bit codes over 500 rows),
so approximate-path assertions compare DISTANCE MULTISETS, not id sets
— id order under ties is not a contract the reference makes either
(scan.c:332-333).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lantern_spark.functions.bitops import (
    from_uint32_words,
    hamming_cdist,
    popcount_rows,
    to_uint32_words,
)
from lantern_spark.functions.distances import hamming_dist
from lantern_spark.operators.hnsw import HnswGraph, HNSWIndex
from lantern_spark.operators.index import (
    IVFIndex,
    _train_centroids_hamming,
)
from lantern_spark.operators.pq import sq_encode_b1
from lantern_spark.types import load_table


# ---------------------------------------------------------------- kernels


class TestBitKernels:
    def test_popcount_matches_python(self):
        rng = np.random.RandomState(7)
        words = rng.randint(0, 2**32, size=(50, 3), dtype=np.uint64).astype(
            np.uint32
        )
        want = [sum(bin(int(w)).count("1") for w in row) for row in words]
        assert popcount_rows(words).tolist() == want

    def test_uint32_roundtrip_negative_words(self):
        vals = np.array([[-1, -2**31, 2**31 - 1, 0, 12345]])
        rt = from_uint32_words(to_uint32_words(vals))
        assert rt.tolist() == vals.tolist()

    def test_float_input_exact(self):
        # delta/search paths may carry packed words as float64 — must
        # convert exactly across the full int32 range
        vals = np.array([[-2147483648.0, 2147483647.0, -7.0]])
        assert from_uint32_words(to_uint32_words(vals)).tolist() == [
            [-2147483648, 2147483647, -7]
        ]

    def test_cdist_matches_pairwise(self):
        rng = np.random.RandomState(3)
        x = rng.randint(0, 2**32, size=(20, 2), dtype=np.uint64).astype(
            np.uint32
        )
        q = rng.randint(0, 2**32, size=(4, 2), dtype=np.uint64).astype(
            np.uint32
        )
        d = hamming_cdist(x, q)
        for i in range(20):
            for j in range(4):
                want = sum(
                    bin(int(x[i, w]) ^ int(q[j, w])).count("1")
                    for w in range(2)
                )
                assert d[i, j] == want


class TestKMajority:
    def test_deterministic_and_int32_domain(self):
        rng = np.random.RandomState(11)
        x = rng.randint(-(2**31), 2**31, size=(200, 2)).astype(np.float64)
        c1 = _train_centroids_hamming(x, 8, seed=42)
        c2 = _train_centroids_hamming(x, 8, seed=42)
        assert np.array_equal(c1, c2)
        assert c1.shape[1] == 2
        assert ((c1 >= -(2**31)) & (c1 < 2**31)).all()

    def test_nlist_capped_by_distinct_rows(self):
        x = np.array([[1.0, 0.0]] * 5 + [[2.0, 0.0]] * 5)
        c = _train_centroids_hamming(x, 8, seed=1)
        assert c.shape[0] <= 2

    def test_majority_recovers_two_clusters(self):
        # two well-separated bit patterns + small noise: centroids must
        # land on (or next to) the true patterns
        rng = np.random.RandomState(5)
        a = np.zeros(64, dtype=np.uint8)
        b = np.ones(64, dtype=np.uint8)
        rows = []
        for _ in range(40):
            pat = a.copy() if rng.rand() < 0.5 else b.copy()
            flip = rng.choice(64, size=3, replace=False)
            pat[flip] ^= 1
            rows.append(
                from_uint32_words(
                    np.packbits(pat).view(np.uint32)[None, :]
                )[0]
            )
        c = _train_centroids_hamming(np.asarray(rows, dtype=np.float64), 2,
                                     seed=9)
        pops = popcount_rows(to_uint32_words(c))
        assert sorted(int(p) for p in pops) in (
            [0, 64],
            [min(pops), max(pops)],
        )
        assert min(pops) <= 5 and max(pops) >= 59


# ---------------------------------------------------------------- fixture


@pytest.fixture(scope="module")
def packed(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    centered = emb.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: x.cast("double") - 0.5
        ).alias("c"),
    )
    df = centered.select("vec_id", sq_encode_b1("c").alias("code"))
    df = df.persist()
    df.count()
    yield df
    df.unpersist()  # never leak cache into other modules' plan tests


@pytest.fixture(scope="module")
def qwords(packed):
    return [int(w) for w in packed.orderBy("vec_id").first()["code"]]


def _exact_topk(packed, qwords, k=10):
    q = F.array(*[F.lit(w).cast("int") for w in qwords])
    return (
        packed.select(
            "vec_id", hamming_dist("code", q).alias("dist")
        )
        .orderBy(F.col("dist").asc(), F.col("vec_id").asc())
        .limit(k)
        .collect()
    )


# ---------------------------------------------------------------- IVF


class TestIvfHamming:
    @pytest.fixture(scope="class")
    def idx(self, spark, packed, tmp_path_factory):
        path = str(tmp_path_factory.mktemp("ivf_ham"))
        return IVFIndex.build(
            packed, "code", "vec_id", path, metric="hamming", nlist=8,
            seed=42,
        )

    def test_manifest_centroids_are_ints(self, idx):
        assert idx.manifest.metric == "hamming"
        for c in idx.manifest.centroids:
            assert all(float(x).is_integer() for x in c)

    def test_fullprobe_equals_exact(self, spark, packed, qwords, idx):
        got = idx.search(
            spark, qwords, k=10, nprobe=idx.manifest.nlist
        ).collect()
        want = _exact_topk(packed, qwords, k=10)
        assert [(r["vec_id"], r["dist"]) for r in got] == [
            (r["vec_id"], r["dist"]) for r in want
        ]

    def test_pruned_probe_subset_and_recall(self, spark, packed, qwords, idx):
        got = idx.search(spark, qwords, k=10, nprobe=2).collect()
        assert len(got) == 10
        exact_d = sorted(r["dist"] for r in _exact_topk(packed, qwords, 10))
        got_d = sorted(r["dist"] for r in got)
        # pruned distances are bounded below by exact; demand they stay
        # close (the probe ranking must be meaningful, not arbitrary)
        assert got_d[0] == exact_d[0]
        assert sum(got_d) <= sum(exact_d) + 30

    def test_delta_and_tombstone(self, spark, packed, idx):
        # a synthetic alternating-bit code: astronomically unlikely to
        # collide with any sign-pack of the data, so only the delta row
        # sits at distance 0 (data codes tie heavily at 64 bits — a
        # data-drawn query would bury the delta row under id tie-break)
        probe = [1431655765, -1431655766]
        extra = spark.createDataFrame(
            [(999001, probe)], "vec_id long, code array<int>"
        )
        idx.add_delta(extra)
        rows = idx.search(
            spark, probe, k=3, nprobe=idx.manifest.nlist
        ).collect()
        assert rows[0]["vec_id"] == 999001 and float(rows[0]["dist"]) == 0.0
        idx.delete(spark.createDataFrame([(999001,)], "vec_id long"))
        rows = idx.search(
            spark, probe, k=3, nprobe=idx.manifest.nlist
        ).collect()
        assert 999001 not in [r["vec_id"] for r in rows]

    def test_rebuild_folds_and_stays_exact(
        self, spark, packed, qwords, idx, tmp_path
    ):
        idx2 = idx.rebuild(spark, str(tmp_path / "rebuilt"))
        got = idx2.search(
            spark, qwords, k=10, nprobe=idx2.manifest.nlist
        ).collect()
        want = _exact_topk(packed, qwords, k=10)
        assert [(r["vec_id"], r["dist"]) for r in got] == [
            (r["vec_id"], r["dist"]) for r in want
        ]

    def test_pq_rejected(self, packed, tmp_path):
        from lantern_spark.types import PQSpec

        with pytest.raises(ValueError, match="hamming"):
            IVFIndex.build(
                packed, "code", "vec_id", str(tmp_path / "x"),
                metric="hamming",
                pq=PQSpec(dim=2, splits=2, clusters=4, seed=1),
            )


# ---------------------------------------------------------------- HNSW


class TestHnswHamming:
    def test_graph_stores_words_exactly(self):
        g = HnswGraph(dim=2, m=4, ef_construction=16, metric="hamming")
        rows = [[-1, 7], [2**31 - 1, -2**31], [0, 0], [123, -456]]
        for i, r in enumerate(rows):
            g.add(i, r)
        assert g._buf.dtype == np.uint32
        assert g.vectors().tolist() == rows

    def test_graph_search_exact_on_small_set(self):
        rng = np.random.RandomState(13)
        words = rng.randint(-(2**31), 2**31, size=(64, 2)).tolist()
        g = HnswGraph(dim=2, m=8, ef_construction=64, metric="hamming")
        for i, r in enumerate(words):
            g.add(i, r)
        q = words[5]
        res, _nd = g.search(q, k=5, ef=64)
        assert res[0][0] == 5 and res[0][1] == 0.0
        # distances ascending and integral
        ds = [d for _i, d in res]
        assert ds == sorted(ds)
        assert all(float(d).is_integer() for d in ds)

    def test_payload_roundtrip(self):
        g = HnswGraph(dim=2, m=4, ef_construction=16, metric="hamming")
        for i, r in enumerate([[-5, 3], [9, -9], [0, 1]]):
            g.add(i, r)
        g2 = HnswGraph.from_payload(g.to_payload())
        assert g2._buf.dtype == np.uint32
        assert g2.search([-5, 3], k=1)[0][0][0] == 0

    def test_quant_combo_rejected(self):
        with pytest.raises(ValueError, match="quant"):
            HnswGraph(dim=2, metric="hamming", quant="i8")

    @pytest.fixture(scope="class")
    def bincorpus(self, spark):
        """Healthy binary corpus: 400 random 128-bit codes (binomial
        distance spread). The b1-pack of the test embeddings collapses
        to 1-2 unique codes — hundreds of exact duplicates form graph
        cliques that back-link pruning turns into sinks, a degeneracy
        no HNSW variant survives (the documented contract: dedup
        duplicate-heavy corpora upstream — operators/dedup exists for
        exactly this). IVF/exact paths cover that fixture instead."""
        rng = np.random.RandomState(17)
        rows = [
            (
                int(i),
                from_uint32_words(
                    rng.randint(0, 2**32, size=4, dtype=np.uint64)
                    .astype(np.uint32)[None, :]
                )[0].tolist(),
            )
            for i in range(400)
        ]
        df = spark.createDataFrame(rows, "vec_id long, code array<int>")
        df = df.persist()
        df.count()
        yield df
        df.unpersist()

    @pytest.fixture(scope="class")
    def hidx(self, spark, bincorpus, tmp_path_factory):
        path = str(tmp_path_factory.mktemp("hnsw_ham"))
        return HNSWIndex.build(
            bincorpus, "code", "vec_id", path, m=12, ef_construction=80,
            shards=2, metric="hamming", seed=42,
        )

    def test_index_search_near_exact(self, spark, bincorpus, hidx):
        probe = bincorpus.orderBy("vec_id").first()["code"]
        got = hidx.search(spark, probe, k=10, ef=128).collect()
        assert len(got) == 10
        exact_d = sorted(
            r["dist"] for r in _exact_topk(bincorpus, probe, 10)
        )
        got_d = sorted(float(r["dist"]) for r in got)
        assert got_d[0] == exact_d[0] == 0.0  # the query row itself
        # distance-multiset recall ≥ 8/10 (ties make id sets unstable)
        matched, pool = 0, list(exact_d)
        for d in got_d:
            if d in pool:
                pool.remove(d)
                matched += 1
        assert matched >= 8

    def test_delta_path(self, spark, hidx):
        # alternating-bit probe — unique vs the random corpus w.h.p.
        probe = [1431655765, -1431655766, 1431655765, -1431655766]
        hidx.add_delta(
            spark.createDataFrame(
                [(888001, probe)], "vec_id long, code array<int>"
            )
        )
        rows = hidx.search(spark, probe, k=2, ef=64).collect()
        assert rows[0]["vec_id"] == 888001 and rows[0]["dist"] == 0.0

    def test_rebuild_after_delta(self, spark, hidx, tmp_path):
        probe = [1431655765, -1431655766, 1431655765, -1431655766]
        re = hidx.rebuild(spark, str(tmp_path / "re"))
        rows = re.search(spark, probe, k=1, ef=128).collect()
        assert rows[0]["vec_id"] == 888001
        assert rows[0]["dist"] == 0.0  # the delta row folded in exactly

    def test_validate(self, spark, hidx):
        stats = hidx.validate(spark, strict=True)
        assert stats["violations"] == []


class TestRoutedHamming:
    def test_router_dispatches_hamming_index(
        self, spark, packed, qwords, tmp_path
    ):
        """The cost-based router is metric-keyed: a hamming IVF entry
        is eligible only for metric='hamming' requests, and the routed
        result equals the direct index search."""
        from lantern_spark.plans.router import IndexCatalog, ann_search

        idx = IVFIndex.build(
            packed, "code", "vec_id", str(tmp_path / "ivf"),
            metric="hamming", nlist=8, seed=42,
        )
        cat = IndexCatalog(str(tmp_path / "cat"))
        cat.register_ivf(idx, "packed", nprobe=idx.manifest.nlist,
                         recall_estimate=1.0)
        routed, dec = ann_search(
            spark, packed, "packed", "code", qwords, k=5,
            metric="hamming", id_column="vec_id", recall_floor=0.95,
            catalog=cat, explain=True,
        )
        direct = idx.search(
            spark, qwords, k=5, nprobe=idx.manifest.nlist
        ).collect()
        got = routed.collect()
        assert [(r["vec_id"], float(r["dist"])) for r in got] == [
            (r["vec_id"], float(r["dist"])) for r in direct
        ]
        # a cos request must NOT see the hamming entry
        from lantern_spark.plans.router import route

        d2 = route(cat, "packed", "code", "cos", 500, recall_floor=0.0)
        assert d2.access_path == "exact"


class TestHammingAutotune:
    def test_autotune_and_tune_nprobe_on_hamming(self, spark, tmp_path):
        """Both tuners speak hamming: autotune_index runs its
        (nlist, nprobe) grid over a packed-bit corpus and tune_nprobe's
        batched exact scan uses the popcount kernel."""
        rng = np.random.RandomState(31)
        rows = [
            (
                int(i),
                from_uint32_words(
                    rng.randint(0, 2**32, size=4, dtype=np.uint64)
                    .astype(np.uint32)[None, :]
                )[0].tolist(),
            )
            for i in range(240)
        ]
        df = spark.createDataFrame(rows, "vec_id long, code array<int>")
        from lantern_spark.operators.autotune import (
            autotune_index,
            tune_nprobe,
        )

        best, results, _idx = autotune_index(
            df, "code", "vec_id", metric="hamming", k=5,
            target_recall=0.9, num_queries=3,
            grid=[(4, 2), (4, 4), (8, 8)], seed=42,
        )
        assert best.recall >= 0.9
        assert len(results) >= 1
        idx = IVFIndex.build(
            df, "code", "vec_id", str(tmp_path / "t"),
            metric="hamming", nlist=8, seed=42,
        )
        probes = [rows[i][1] for i in (0, 5, 9)]
        nprobe, rec = tune_nprobe(
            idx, spark, probes, k=5, target_recall=0.9
        )
        assert 1 <= nprobe <= idx.manifest.nlist
        assert rec >= 0.9
