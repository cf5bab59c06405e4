"""As-of join edge cases: at-or-before ties, no-match nulls, key
isolation."""

import pytest
from pyspark.sql import functions as F

from lantern_spark.operators.asof import asof_join


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, "p1"),
            (1, 20, "p2"),
            (1, 5, "p0"),   # before any right row
            (2, 10, "q1"),  # key 2 has no right rows
        ],
        "k long, t long, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, 10, "r10"),  # equal timestamp → matches (at-or-before)
            (1, 15, "r15"),
            (3, 1, "other"),
        ],
        "k long, rt long, payload string",
    )
    return left, right


class TestAsofJoin:
    def test_semantics(self, spark, frames):
        left, right = frames
        out = asof_join(
            left, right, on="k", left_time="t", right_time="rt",
            right_cols=["payload"],
        )
        got = {r["tag"]: (r["payload"], r["rt_r"]) for r in out.collect()}
        assert got["p1"] == ("r10", 10)  # tie: at-or-before includes equal
        assert got["p2"] == ("r15", 15)  # latest preceding wins
        assert got["p0"] == (None, None)  # nothing at or before
        assert got["q1"] == (None, None)  # key never matches other keys

    def test_row_count_preserved(self, spark, frames):
        left, right = frames
        out = asof_join(
            left, right, on="k", left_time="t", right_time="rt",
            right_cols=["payload"],
        )
        assert out.count() == left.count()

    def test_single_shuffle(self, spark, frames):
        """The whole as-of is ONE window shuffle — no range-join
        explosion, no second exchange."""
        left, right = frames
        out = asof_join(
            left, right, on="k", left_time="t", right_time="rt",
            right_cols=["payload"],
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange ") == 1


def test_tolerance_nulls_stale_matches(spark):
    """Matches older than the lookback window null out (pandas
    merge_asof tolerance semantics); in-window matches are unchanged."""
    from lantern_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "2026-01-01 10:00:00"), (1, "2026-01-01 12:00:00")],
        "k long, lt string",
    ).select("k", F.col("lt").cast("timestamp").alias("lt"))
    right = spark.createDataFrame(
        [(1, "2026-01-01 09:59:00", "fresh")],
        "k long, rt string, v string",
    ).select("k", F.col("rt").cast("timestamp").alias("rt"), "v")

    out = asof_join(
        left, right, on="k", left_time="lt", right_time="rt",
        right_cols=["v"], tolerance_seconds=600,
    )
    rows = {r["lt"].hour: r["v"] for r in out.collect()}
    assert rows[10] == "fresh"  # 1 min old — inside 10-min window
    assert rows[12] is None  # 2h old — nulled by tolerance
