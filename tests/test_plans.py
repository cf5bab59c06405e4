"""Physical-plan contracts: the scale properties the engine promises.

These tests pin the *plan shape*, not timings — a regression that adds
a shuffle, drops a broadcast, or un-prunes a scan fails here long
before it shows up in a 100 TB run.
"""

import pytest
from pyspark.sql import functions as F


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def full_plan(df) -> str:
    return df._jdf.queryExecution().toString()


def n_exchanges(df) -> int:
    # AQE wraps the plan; count both spellings, dedup handled by format
    p = plan_of(df)
    return p.count("Exchange ")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


class TestKNNPlans:
    def test_exact_knn_is_take_ordered(self, spark, emb):
        """orderBy(dist).limit(k) must compile to TakeOrderedAndProject
        — partial per-partition top-k + single merge, NO global sort."""
        from lantern_spark.operators.knn import knn_search

        df = knn_search(emb, "embedding", [0.0] * 64, k=10)
        p = plan_of(df)
        assert "TakeOrderedAndProject" in p
        assert "Sort " not in p  # a full sort would spill at scale

    def test_filtered_knn_pushes_predicate(self, spark, emb):
        """WHERE label = 3 must reach the parquet scan as a pushed
        filter, not a post-scan Filter over all rows."""
        from lantern_spark.operators.knn import knn_search

        df = knn_search(
            emb, "embedding", [0.0] * 64, k=5, where=F.col("label") == 3
        )
        assert "PushedFilters: [IsNotNull(label), EqualTo(label,3)]" in full_plan(df)

    def test_knn_projection_prunes_columns(self, spark, emb):
        """A 2-column projection must not read every parquet column."""
        from lantern_spark.functions.distances import l2sq_dist
        from lantern_spark.functions.vectors import vec_lit

        df = (
            emb.select(
                "vec_id", l2sq_dist("embedding", vec_lit([0.0] * 64)).alias("d")
            )
            .orderBy("d")
            .limit(5)
        )
        fp = full_plan(df)
        rs = [ln for ln in fp.splitlines() if "ReadSchema" in ln]
        assert rs and "label" not in rs[0]  # unused column pruned


class TestIVFPlans:
    @pytest.fixture(scope="class")
    def index(self, spark, sf_dir, tmp_path_factory):
        from lantern_spark.operators.index import IVFIndex
        from lantern_spark.types import PQSpec

        return IVFIndex.build(
            spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
            "embedding",
            "vec_id",
            str(tmp_path_factory.mktemp("ivfplan")),
            nlist=4,
            seed=42,
            pq=PQSpec(dim=64, splits=8, clusters=16),
        )

    def test_search_prunes_partitions(self, spark, index):
        """nprobe pruning must surface as PartitionFilters on list_id —
        the scan reads nprobe/nlist of the data, not all of it."""
        df = index.search(spark, [0.0] * 64, k=5, nprobe=2)
        fp = full_plan(df)
        assert "PartitionFilters" in fp
        assert "list_id" in fp.split("PartitionFilters", 1)[1][:200]

    def test_adc_candidate_scan_skips_vectors(self, spark, index):
        """The ADC candidate pass must not read the raw vector column
        (that is the point: ~dim·4/splits bytes per row)."""
        import os

        from lantern_spark.operators.pq import pq_dist
        from lantern_spark.types import PQSpec

        spec = PQSpec(dim=64, splits=8, clusters=16)
        cb = spark.read.parquet(os.path.join(index.path, "pq_codebook"))
        cand = (
            pq_dist(
                index.lists(spark).select("vec_id", "__pq_codes"),
                "__pq_codes",
                [0.0] * 64,
                cb,
                spec,
                out_col="adc",
            )
            .orderBy("adc")
            .limit(40)
        )
        rs = [ln for ln in full_plan(cand).splitlines() if "ReadSchema" in ln]
        assert rs and "embedding" not in rs[0]

    def test_filtered_search_no_base_table_join(
        self, spark, sf_dir, tmp_path_factory
    ):
        """Filtered search carries stored extra columns through the
        index projection (select_columns) — the k-row result must NOT
        be decorated by re-joining the base table (round-1 defect:
        that join broadcast the FULL embeddings projection)."""
        from lantern_spark.operators.index import IVFIndex
        from pyspark.sql import functions as F

        idx = IVFIndex.build(
            spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
            "embedding",
            "vec_id",
            str(tmp_path_factory.mktemp("ivf_filtered_plan")),
            nlist=4,
            seed=42,
            extra_columns=["label"],
        )
        out = idx.search(
            spark, [0.0] * 64, k=5, nprobe=4,
            where=F.col("label") == 3, select_columns=["label"],
            round_digits=6,
        )
        assert "label" in out.columns
        fp = full_plan(out)
        # one scan of the index lists, zero joins of any kind
        assert "Join" not in fp
        assert "BroadcastExchange" not in fp

    def test_tombstones_broadcast(self, spark, index):
        """The tombstone anti-join must broadcast the (tiny) tombstone
        side, never shuffle the data side."""
        ids = spark.createDataFrame([(1,)], "vec_id long")
        index.delete(ids)
        df = index.search(spark, [0.0] * 64, k=5, nprobe=2)
        assert "BroadcastHashJoin" in plan_of(df)
        assert "SortMergeJoin" not in plan_of(df)


class TestTextPlans:
    def test_bm25_query_terms_broadcast(self, spark, sf_dir):
        """Query terms (a handful of rows) join postings via broadcast."""
        from lantern_spark.operators.bm25 import build_bm25_stats, search_bm25

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        stats = build_bm25_stats(docs, "doc_id", "text", stem=False)
        out = search_bm25(stats, "data model spark", limit=10)
        assert "BroadcastHashJoin" in plan_of(out)

    def test_near_pairs_single_shuffle(self, spark, sf_dir):
        """Blocked near-dup = ONE groupBy exchange feeding the numpy
        kernel; a second exchange means a join crept back in."""
        from lantern_spark.operators.dedup import embedding_near_pairs

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        out = embedding_near_pairs(
            emb, "embedding", "vec_id", threshold=0.5, block_col="label"
        )
        assert n_exchanges(out) == 1


class TestMapOnlyPlans:
    def test_sq_encode_no_shuffle(self, spark, emb):
        """Scalar quantization encode/decode is map-only."""
        from lantern_spark.operators.pq import sq_decode_i8, sq_encode_i8

        df = emb.withColumn("c", sq_encode_i8("embedding", -1.0, 1.0))
        df = df.withColumn("d", sq_decode_i8("c", -1.0, 1.0))
        assert n_exchanges(df) == 0

    def test_distance_exprs_stay_jvm_side(self, spark, emb):
        """Distance expressions evaluate JVM-side (no Python worker
        round-trip). Note: higher-order functions are CodegenFallback,
        so no WholeStageCodegen span — the contract is the absence of
        a Python eval boundary, not codegen itself."""
        from lantern_spark.functions.distances import cos_dist, l2sq_dist
        from lantern_spark.functions.vectors import vec_lit

        q = vec_lit([0.5] * 64)
        df = emb.select(
            l2sq_dist("embedding", q).alias("a"),
            cos_dist("embedding", q).alias("b"),
        )
        p = plan_of(df)
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
