"""NULL identity through `types.local_df` (r14 ADVICE medium).

pandas dtype inference turns None in a float column into float64 NaN,
and Arrow ships NaN to Spark as NaN — NOT NULL. Callers such as
`ppl_buckets` route group-key cutoff tables through local_df precisely
to keep NULL keys NULL for their null-safe (<=>) joins; NaN <=> NULL is
false, so the regression silently drops the NULL group's rows. local_df
must deliver None as SQL NULL for every column type.
"""
from pyspark.sql import functions as F

from lantern_spark.types import local_df


class TestLocalDfNullIdentity:
    def test_none_in_double_column_is_null_not_nan(self, spark):
        df = local_df(
            spark,
            [(1, 0.5), (2, None), (3, 2.5)],
            "id long, grp double",
        )
        rows = {r["id"]: r for r in df.collect()}
        assert rows[2]["grp"] is None
        # and on the SQL side: NULL, not NaN
        agg = df.select(
            F.sum(F.col("grp").isNull().cast("int")).alias("nulls"),
            F.sum(F.isnan(F.coalesce(F.col("grp"), F.lit(0.0))).cast("int")).alias("nans"),
        ).first()
        assert agg["nulls"] == 1 and agg["nans"] == 0

    def test_none_in_long_and_string_columns(self, spark):
        df = local_df(
            spark,
            [(None, "a"), (7, None)],
            "k long, s string",
        )
        out = df.orderBy(F.col("k").asc_nulls_first()).collect()
        assert out[0]["k"] is None and out[0]["s"] == "a"
        assert out[1]["k"] == 7 and out[1]["s"] is None

    def test_null_safe_join_matches_null_group(self, spark):
        """The ppl_buckets shape: a nullable-double group key joined
        null-safely against data rows with a NULL group must match."""
        cuts = local_df(spark, [(None, 10.0), (1.0, 20.0)], "g double, cut double")
        data = local_df(spark, [(None, 1), (1.0, 2)], "g double, v int")
        j = data.join(cuts, data["g"].eqNullSafe(cuts["g"]), "left").select(
            data["v"], cuts["cut"]
        )
        got = {r["v"]: r["cut"] for r in j.collect()}
        assert got == {1: 10.0, 2: 20.0}

    def test_no_none_fast_path_unchanged(self, spark):
        df = local_df(spark, [(1, 1.5), (2, 2.5)], "id long, x double")
        assert [(r["id"], r["x"]) for r in df.orderBy("id").collect()] == [
            (1, 1.5),
            (2, 2.5),
        ]
