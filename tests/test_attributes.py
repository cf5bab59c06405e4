"""Attribute sidecar tests: tag-once/filter-many semantics, narrow
sidecar schema, pushed-down sidecar predicates + LEFT SEMI text
recovery, multi-sidecar alignment, bucketed no-Exchange co-location."""

import pytest
from pyspark.sql import functions as F

from lantern_spark.operators.attributes import (
    attach_attributes,
    default_taggers,
    filter_by_attributes,
    read_attributes,
    tag_documents,
    write_attributes,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


class TestTagging:
    def test_sidecar_is_narrow(self, docs):
        attrs = tag_documents(docs)
        assert "text" not in attrs.columns
        assert attrs.columns[0] == "doc_id"
        assert set(attrs.columns) == {"doc_id", *default_taggers()}

    def test_default_taggers_match_inline(self, docs):
        attrs = tag_documents(docs)
        inline = docs.select(
            "doc_id", default_taggers()["quality"].alias("quality")
        )
        joined = attrs.select("doc_id", "quality").join(
            inline.withColumnRenamed("quality", "q2"), "doc_id"
        )
        assert joined.where(
            F.abs(F.col("quality") - F.col("q2")) > 1e-12
        ).count() == 0

    def test_single_fused_scan(self, docs):
        # Expression-only taggers: no Python eval, no shuffle — the
        # tagging pass is one map stage.
        plan = (
            tag_documents(docs)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "EvalPython" not in plan
        assert "Exchange" not in plan

    def test_name_collision_raises(self, docs):
        with pytest.raises(ValueError, match="collides"):
            tag_documents(docs, {"doc_id": F.length("text")})


class TestSidecarRoundtrip:
    def test_write_read_filter(self, spark, docs, tmp_path):
        side = str(tmp_path / "attrs_quality")
        write_attributes(docs, side)
        attrs = read_attributes(spark, [side])
        n_docs = docs.count()
        assert attrs.count() == n_docs

        kept = filter_by_attributes(
            docs, attrs, (F.col("n_tokens") >= 10) & (F.col("pii_count") == 0)
        )
        want = docs.where(
            default_taggers()["n_tokens"] >= 10
        ).count()  # corpus has no PII
        assert kept.count() == want
        assert set(kept.columns) == set(docs.columns)

    def test_multi_sidecar_alignment(self, spark, docs, tmp_path):
        a = str(tmp_path / "attrs_a")
        b = str(tmp_path / "attrs_b")
        write_attributes(docs, a, {"n_tokens": default_taggers()["n_tokens"]})
        write_attributes(docs, b, {"quality": default_taggers()["quality"]})
        attrs = read_attributes(spark, [a, b])
        assert set(attrs.columns) == {"doc_id", "n_tokens", "quality"}
        assert attrs.count() == docs.count()

    def test_duplicate_attr_columns_raise(self, spark, docs, tmp_path):
        a = str(tmp_path / "dup_a")
        b = str(tmp_path / "dup_b")
        for p in (a, b):
            write_attributes(docs, p, {"n_tokens": default_taggers()["n_tokens"]})
        with pytest.raises(ValueError, match="duplicate attribute"):
            read_attributes(spark, [a, b])

    def test_untagged_docs_dropped(self, spark, docs, tmp_path):
        side = str(tmp_path / "attrs_partial")
        write_attributes(docs.limit(100), side)
        attrs = read_attributes(spark, [side])
        kept = filter_by_attributes(docs, attrs, F.lit(True))
        assert kept.count() == 100

    def test_attach_left(self, spark, docs, tmp_path):
        side = str(tmp_path / "attrs_attach")
        write_attributes(docs.limit(50), side)
        attrs = read_attributes(spark, [side])
        out = attach_attributes(docs, attrs)
        assert out.count() == docs.count()
        assert out.where(F.col("quality").isNull()).count() == docs.count() - 50


class TestPlans:
    def test_filter_pushes_to_sidecar_and_semijoins_text(
        self, spark, docs, tmp_path
    ):
        side = str(tmp_path / "attrs_plan")
        write_attributes(docs, side)
        attrs = read_attributes(spark, [side])
        plan = (
            filter_by_attributes(docs, attrs, F.col("n_tokens") >= 10)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "LeftSemi" in plan
        # Predicate reaches the sidecar parquet scan.
        assert "PushedFilters: [IsNotNull(n_tokens), GreaterThanOrEqual(n_tokens,10)" in plan

    def test_bucketed_sidecar_join_no_exchange(self, spark, docs, tmp_path):
        from lantern_spark.sources.layout import write_bucketed

        write_bucketed(
            docs, "attr_docs_b", "doc_id", 4, sort_cols=["doc_id"]
        )
        write_bucketed(
            tag_documents(docs), "attr_side_b", "doc_id", 4,
            sort_cols=["doc_id"],
        )
        # At test scale the planner rightly broadcasts the tiny
        # sidecar; disable broadcast to plan the 100 TB case (both
        # sides too big to broadcast) — bucketing must then carry the
        # join with no shuffle Exchange on either side.
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            d = spark.table("attr_docs_b")
            a = spark.table("attr_side_b")
            joined = filter_by_attributes(d, a, F.col("n_tokens") >= 10)
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan
            assert joined.count() > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
            spark.sql("DROP TABLE IF EXISTS attr_docs_b")
            spark.sql("DROP TABLE IF EXISTS attr_side_b")
