"""Skew operators: salted join/agg must be result-identical to their
unsalted counterparts on a deliberately skewed key distribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_projects_spark.operators.skew import salted_agg, salted_join


def _skewed(spark):
    # 90% of rows share one key — the shape that melts a single reducer
    return spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
         .otherwise(F.concat(F.lit("k"), F.col("id") % 7)).alias("k"),
        (F.col("id") % 100).cast("double").alias("v"))


def test_salted_join_matches_plain(spark):
    big = _skewed(spark)
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"D{i}") for i in range(7)], "k string, label string")
    plain = big.join(dim, "k").groupBy("label").count()
    salted = salted_join(big, dim, "k").groupBy("label").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_keeps_unmatched(spark):
    big = _skewed(spark)
    dim = spark.createDataFrame([("hot", "H")], "k string, label string")
    out = salted_join(big, dim, "k", how="left")
    assert out.count() == big.count()
    assert out.filter(F.col("label").isNull()).count() == big.filter(F.col("k") != "hot").count()


def test_salted_agg_matches_plain(spark):
    df = _skewed(spark)
    plain = df.groupBy("k").agg(F.sum("v").alias("s"),
                                F.count(F.lit(1)).alias("n"),
                                F.max("v").alias("mx"))
    salted = salted_agg(df, ["k"], {
        "s": (F.sum("v"), "sum"),
        "n": (F.count(F.lit(1)), "sum"),
        "mx": (F.max("v"), "max"),
    })
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_rejects_outer(spark):
    """right/full outer would emit each unmatched dim row n_salts times."""
    import pytest
    from data_engineering_projects_spark.operators.skew import salted_join
    big = spark.range(10).withColumnRenamed("id", "k")
    dim = spark.range(5).withColumnRenamed("id", "k")
    for how in ("right", "full", "full_outer", "outer"):
        with pytest.raises(ValueError):
            salted_join(big, dim, "k", how=how)


class TestSkewReport:
    def test_planted_hot_key_tiers(self, spark):
        from data_engineering_projects_spark.operators.skew import (
            skew_report)
        import pyspark.sql.functions as F

        # 50% of rows on one key -> salt tier
        hot = spark.range(1000).selectExpr(
            "CASE WHEN id < 500 THEN 7 ELSE id END AS k")
        r = skew_report(hot, ["k"], top=3).first()
        assert r["tier"] == "salt"
        assert abs(r["max_share"] - 0.5) < 0.01
        assert r["top_keys"][0]["key"] == ["7"]
        assert r["top_keys"][0]["n"] == 500
        assert r["n_rows"] == 1000 and r["n_keys"] == 501

        # uniform keys -> uniform tier
        uni = spark.range(10_000).selectExpr("id % 1000 AS k")
        r2 = skew_report(uni, ["k"]).first()
        assert r2["tier"] == "uniform"
        assert len(r2["top_keys"]) == 10

        # moderate skew (5% hot) -> aqe tier
        mid = spark.range(10_000).selectExpr(
            "CASE WHEN id < 500 THEN 1 ELSE id END AS k")
        assert skew_report(mid, ["k"]).first()["tier"] == "aqe"

    def test_plan_has_bounded_hot_list(self, spark):
        """The hot list must be TakeOrderedAndProject, never a full
        collect of the key domain."""
        from data_engineering_projects_spark.operators.skew import (
            skew_report)
        rep = skew_report(spark.range(1000).selectExpr("id % 97 AS k"),
                          ["k"], top=5)
        plan = rep._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        assert len(rep.first()["top_keys"]) == 5
