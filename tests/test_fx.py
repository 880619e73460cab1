from pyspark.sql import functions as F

from data_engineering_capstone_project__spark.functions.fx import (
    like_any,
    null_if_zero,
    pad_key,
    recode,
    try_double,
    tsql_concat,
)


def test_tsql_concat_null_to_empty(spark):
    df = spark.createDataFrame([("a", None), (None, "b")], "x string, y string")
    out = df.select(tsql_concat("pre-", F.col("x"), F.col("y")).alias("c")).collect()
    assert [r["c"] for r in out] == ["pre-a", "pre-b"]


def test_pad_key_pads_and_truncates(spark):
    df = spark.createDataFrame([("42",), ("123456",), ("12345678",)], "id string")
    out = [r["p"] for r in df.select(pad_key("id").alias("p")).collect()]
    assert out == ["000042", "123456", "345678"]


def test_try_double_null_on_garbage(spark):
    df = spark.createDataFrame([("1.5",), ("oops",), (None,)], "v string")
    out = [r["d"] for r in df.select(try_double("v").alias("d")).collect()]
    assert out == [1.5, None, None]


def test_recode_with_null_branch(spark):
    df = spark.createDataFrame([("High School",), ("RCCI",), (None,), ("???",)], "lv string")
    mapping = {"High School": "High", "RCCI": "Other"}
    out = [
        r["s"]
        for r in df.select(
            recode("lv", mapping, default=None, null_value="Unknown").alias("s")
        ).collect()
    ]
    assert out == ["High", "Other", "Unknown", None]


def test_like_any_and_null_if_zero(spark):
    df = spark.createDataFrame(
        [("x NOT USED y", 0.0), ("keep", 2.0)], "name string, d double"
    )
    kept = df.filter(~like_any("name", "%NOT USED%")).collect()
    assert [r["name"] for r in kept] == ["keep"]
    out = [r["z"] for r in df.select(null_if_zero("d").alias("z")).collect()]
    assert out == [None, 2.0]
