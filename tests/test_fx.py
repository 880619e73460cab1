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


def test_length_bucket_batches(spark):
    from data_engineering_capstone_project__spark.operators import text

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate([3, 5, 17, 20, 64, 0])],
        "doc_id long, text string",
    )
    rows = {
        (r["bucket"], r["stream"], r["batch_id"]): r
        for r in text.length_bucket_batches(
            docs, bucket_width=16, batch_size=2, num_streams=1
        ).collect()
    }
    # 3,5 -> bucket 16; 17,20 -> bucket 32; 64 -> bucket 64; empty doc dropped
    b16 = rows[(16, 0, 0)]
    assert b16["n_docs"] == 2 and b16["max_tokens"] == 5
    assert abs(b16["padding_frac"] - (1 - 8 / 32)) < 1e-9
    b64 = rows[(64, 0, 0)]
    assert b64["n_docs"] == 1 and b64["padding_frac"] == 0.0


def test_hashed_linear_score_sigmoid_and_logit(spark):
    from pyspark.sql import functions as F

    from data_engineering_capstone_project__spark.operators import text

    docs = spark.createDataFrame(
        [(1, "aaa bbb aaa"), (2, "")], "doc_id long, text string"
    )
    weights = spark.range(256).select(
        F.format_string("%02x", F.col("id").cast("int")).alias("bucket"),
        F.lit(0.5).alias("w"),
    )
    logit = text.hashed_linear_score(docs, weights, sigmoid=False).collect()
    out = {r["doc_id"]: r for r in logit}
    assert 2 not in out  # empty doc has no tokens
    assert out[1]["n_tokens"] == 3 and abs(out[1]["score"] - 0.5) < 1e-9
    sig = text.hashed_linear_score(docs, weights).collect()[0]
    assert abs(sig["score"] - 1 / (1 + 2.718281828459045 ** -0.5)) < 1e-6
