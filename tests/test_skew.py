"""Salted join / salted aggregation: results must be identical to the
un-salted equivalents on a synthetically skewed key distribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from infinidb_spark.operators.skew import salted_aggregate, salted_join


def _skewed_df(spark, n=20000):
    # ~90% of rows land on key 7; the rest spread over 100 keys
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, 7).otherwise(F.col("id") % 100).alias("k"),
        (F.col("id") * 2).alias("v"),
    )


def test_salted_join_matches_plain_join(spark):
    skewed = _skewed_df(spark)
    build = spark.range(100).select(F.col("id").alias("k"), F.concat(F.lit("d"), "id").alias("name"))
    want = (
        skewed.join(build, ["k"])
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
    )
    got = (
        salted_join(skewed, build, ["k"], n_salt=8)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salted_join_left_outer(spark):
    skewed = _skewed_df(spark, n=5000)
    build = spark.range(5).select(F.col("id").alias("k"), F.lit("x").alias("name"))
    want = skewed.join(build, ["k"], "left").groupBy("k", "name").count()
    got = salted_join(skewed, build, ["k"], n_salt=4, how="left").groupBy("k", "name").count()
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salted_aggregate_matches_plain(spark):
    df = _skewed_df(spark)
    want = df.groupBy("k").agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
    got = salted_aggregate(df, ["k"], count_col="n", sum_cols={"v": "sv"}, n_salt=8)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salt_is_content_derived_and_validated(spark):
    """The salt must be recomputation-stable (content hash, never
    monotonically_increasing_id — the SPARK-23207 retry class), and
    n_salt < 1 must fail fast instead of silently deleting the build
    side via an empty explode."""
    import pytest

    from infinidb_spark.operators.skew import _row_salt, salted_join

    df = spark.range(100).selectExpr("id AS k", "id * 2 AS v")
    s1 = [r[0] for r in df.select(_row_salt(df, 8)).collect()]
    s2 = [r[0] for r in df.select(_row_salt(df, 8)).collect()]
    assert s1 == s2 and all(0 <= x < 8 for x in s1)
    build = spark.range(10).selectExpr("id AS k", "id AS b")
    with pytest.raises(ValueError, match="n_salt"):
        salted_join(df, build, ["k"], n_salt=0)


def test_salted_aggregate_decimal_dtype_matches_plain(spark):
    """r10 review fix: stacked sums widened DECIMAL twice — the salted
    relation's schema must equal the un-salted equivalent's."""
    from pyspark.sql import functions as F

    from infinidb_spark.operators.skew import salted_aggregate

    df = spark.createDataFrame(
        [("k", 1.0)], "k string, p double"
    ).select("k", F.col("p").cast("decimal(12,2)").alias("p"))
    salted = salted_aggregate(df, ["k"], sum_cols={"p": "s"})
    plain = df.groupBy("k").agg(F.sum("p").alias("s"))
    assert salted.schema["s"].dataType == plain.schema["s"].dataType
    assert salted.collect()[0]["s"] == plain.collect()[0]["s"]


def test_salted_aggregate_empty_global_count_zero(spark):
    """r11 review: keys=[] over empty input returned count NULL where
    the plain global count() returns 0."""
    from infinidb_spark.operators.skew import salted_aggregate

    empty = spark.createDataFrame([], "k long, v double")
    row = salted_aggregate(empty, [], count_col="n").collect()[0]
    assert row.n == 0


def test_salted_join_tolerates_map_columns(spark):
    """r11 review: xxhash64 rejects MapType — the salt now hashes only
    hashable columns instead of crashing."""
    from pyspark.sql import functions as F

    from infinidb_spark.operators.skew import salted_join

    skewed = spark.createDataFrame(
        [(1, {"a": "x"}), (1, {"b": "y"}), (2, {"c": "z"})],
        "k long, attrs map<string,string>",
    )
    build = spark.createDataFrame([(1, "one"), (2, "two")], "k long, name string")
    got = salted_join(skewed, build, ["k"]).orderBy("k", "name")
    assert got.count() == 3
    assert sorted(r.name for r in got.collect()) == ["one", "one", "two"]


def test_salt_column_collision_rejected(spark):
    import pytest as _pytest

    from infinidb_spark.operators.skew import salted_aggregate, salted_join

    bad = spark.createDataFrame([(1, 0)], "k long, __salt__ int")
    ok = spark.createDataFrame([(1,)], "k long")
    with _pytest.raises(ValueError, match="__salt__"):
        salted_join(bad, ok, ["k"])
    with _pytest.raises(ValueError, match="__salt__"):
        salted_aggregate(bad, ["k"])
