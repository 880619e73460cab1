"""Round-16 optimization pins.

Each change in optimization round 2 gets a focused test:

- BM25 dict-query terms via the job-free inline-VALUES LocalRelation
  (`text._query_terms_local` / `text._inline_rows`): Catalyst-parity with
  the old Spark-evaluated explode shape on adversarial strings, zero
  Spark jobs, and dict-vs-DataFrame result parity end to end.
- Ingest contract stats parsed from the fencing digests
  (`artifacts.digest_count`): format pin + counts must equal ground
  truth.
- Schema cache polish: realpath keying (a repointed symlink cannot
  serve a stale schema), LRU (not clear-all) eviction, nested
  partition-subdirectory writes invalidate.
- WindowGroupLimit probe: a non-deterministic order expression must
  bypass the synthetic memo (Spark's InferWindowGroupLimit requires
  deterministic window exprs).
- no_aqe: nested windows are re-entrant and restore the conf.
- x_pca merged verification pass: the single arrays_zip aggregation
  reproduces the two-pass axis/projection statistics exactly.
- zstd artifact writes: committed artifact parquet is zstd-compressed
  and round-trips.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_engineering_capstone_project__spark.operators import text
from data_engineering_capstone_project__spark.operators import relational
from data_engineering_capstone_project__spark.sources import artifacts as art
from data_engineering_capstone_project__spark.sources import io as io_mod
from data_engineering_capstone_project__spark.session import no_aqe


def _jobs_during(spark, fn):
    """Spark job count launched while fn runs (per-job-group tracker)."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    sc.setJobGroup("r16probe", "r16probe")
    before = set(tracker.getJobIdsForGroup("r16probe") or [])
    out = fn()
    after = set(tracker.getJobIdsForGroup("r16probe") or [])
    sc.setJobGroup(None, None)
    return len(after - before), out


TRICKY_QUERIES = {
    "q_ws": "Gold  Bars\tship\nmode\x0bvtab\fff\rcr",
    "q_trim": "   leading and trailing   ",
    "q_nbsp": "nb sp stays-inside",  # Java \s excludes U+00A0
    "q_turkish": "İstanbul İ",  # dotted capital I casing
    "q_quotes": "it's \"quoted\" and\\slashed",
    "q_dup": "dup dup DUP Dup",
    "q_empty": "",
    "q_blank": " \t ",
}


def test_query_terms_local_matches_spark_explode(spark):
    """_query_terms_local must produce exactly the (query_id, term,
    bucket) set the old Spark explode shape produced — including Java
    whitespace/casing semantics Python's str ops would get wrong."""
    ntb = 8
    items = list(TRICKY_QUERIES.items())
    got = set(text._query_terms_local(spark, items, ntb))
    qdf = spark.createDataFrame(items, "query_id string, _qtext string")
    qb = F.pmod(F.xxhash64("term"), F.lit(ntb)).cast("int")
    want = {
        (r["query_id"], r["term"], r["_qtb"])
        for r in (
            qdf.select(
                "query_id",
                F.explode(
                    F.array_distinct(text._lower_terms(F.col("_qtext")))
                ).alias("term"),
            )
            .filter(F.col("term") != "")
            .select("query_id", "term", qb.alias("_qtb"))
            .collect()
        )
    }
    assert got == want
    # unbucketed form: same pairs, None buckets
    got2 = set(text._query_terms_local(spark, items, None))
    assert got2 == {(q, t, None) for q, t, _ in want}


def test_query_terms_local_runs_zero_jobs(spark):
    items = list(TRICKY_QUERIES.items())
    njobs, out = _jobs_during(
        spark, lambda: text._query_terms_local(spark, items, 8)
    )
    assert njobs == 0
    assert out  # produced terms without touching the cluster


def test_inline_rows_is_local_relation(spark):
    df = text._inline_rows(
        spark, ["query_id", "term"], [("q1", "gold"), ("q2", "bar's")]
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LocalRelation" in plan
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "string",
        "string",
    ]
    njobs, rows = _jobs_during(spark, df.collect)
    assert njobs == 0
    assert sorted(map(tuple, rows)) == [("q1", "gold"), ("q2", "bar's")]


def test_bm25_topk_dict_equals_dataframe_queries(spark, sf_dir):
    """End-to-end parity: the dict path (inline LocalRelation, bucket
    prune, broadcast) must rank exactly like the DataFrame path."""
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    queries = {
        "q1": "shipping  priority\tgold",
        "q2": "  Economy anodized STEEL ",
    }
    w = text.bm25(d)
    got = text.bm25_topk(None, queries, k=5, weights=w).collect()
    qdf = spark.createDataFrame(
        list(queries.items()), "query_id string, text string"
    )
    want = text.bm25_topk(None, qdf, k=5, weights=w).collect()
    key = lambda r: (r["query_id"], r["rn"])  # noqa: E731
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert {key(r) for r in got} == {key(r) for r in want}


def test_digest_count_parses_all_shapes():
    assert art.digest_count("42:-137") == 42
    assert art.digest_count("batch:0:None") == 0
    assert art.digest_count("delta:7:123456789") == 7


def test_digest_count_matches_dataframe_count(spark):
    df = spark.range(37).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("t"), "id").alias("text")
    )
    dg = art.corpus_digest(df, ["doc_id", "text"])
    assert art.digest_count(dg) == 37
    assert art.digest_count(f"batch:{dg}") == 37


def test_schema_cache_realpath_symlink_repoint(spark, tmp_path):
    """A symlink repointed between reads must not serve the old schema."""
    a = tmp_path / "a"
    b = tmp_path / "b"
    spark.range(3).select(F.col("id").alias("x")).write.parquet(str(a))
    spark.range(3).select(
        F.col("id").alias("y"), F.lit("s").alias("z")
    ).write.parquet(str(b))
    link = tmp_path / "ln"
    link.symlink_to(a)
    assert io_mod.read_parquet_cached(spark, str(link)).columns == ["x"]
    link.unlink()
    link.symlink_to(b)
    assert sorted(io_mod.read_parquet_cached(spark, str(link)).columns) == [
        "y",
        "z",
    ]


def test_schema_cache_lru_eviction_keeps_recent(spark, tmp_path):
    p = tmp_path / "t"
    spark.range(2).write.parquet(str(p))
    io_mod.read_parquet_cached(spark, str(p))
    key = next(
        k for k in io_mod._SCHEMA_CACHE if str(p) in repr(k)
    )
    io_mod._SCHEMA_CACHE.move_to_end(key)
    # overflow by one: the OLDEST entry goes, recent survivors stay
    filler = {("fake", i): io_mod._SCHEMA_CACHE[key] for i in range(
        io_mod._SCHEMA_CACHE_MAX - len(io_mod._SCHEMA_CACHE)
    )}
    for k, v in filler.items():
        io_mod._SCHEMA_CACHE[k] = v
    io_mod._SCHEMA_CACHE.move_to_end(key)  # our key is most recent
    spark.range(2).write.parquet(str(tmp_path / "t2"))
    io_mod.read_parquet_cached(spark, str(tmp_path / "t2"))
    assert key in io_mod._SCHEMA_CACHE  # survived: LRU, not clear-all
    assert len(io_mod._SCHEMA_CACHE) <= io_mod._SCHEMA_CACHE_MAX


def test_schema_cache_nested_partition_write_invalidates(spark, tmp_path):
    """A commit confined to a partition subdirectory (top-level dir
    mtime can stay put on some filesystems) must still change the key:
    the child-listing digest sees the subdir's mtime move."""
    p = str(tmp_path / "part")
    spark.range(4).select(
        (F.col("id") % 2).alias("b"), F.col("id").alias("x")
    ).write.partitionBy("b").parquet(p)
    k1 = io_mod._schema_key(p)
    # write a new file INSIDE an existing partition dir only
    sub = os.path.join(p, "b=0")
    with open(os.path.join(sub, "extra.marker"), "w") as f:
        f.write("x")
    k2 = io_mod._schema_key(p)
    assert k1 != k2


def test_wgl_fires_for_nondeterministic_order(spark):
    """Review r15 asked whether a rand() order key invalidates the
    synthetic probe (InferWindowGroupLimit requires deterministic window
    expressions). It cannot: the analyzer extracts the non-deterministic
    expression into a Project below the window, so the rule sees a plain
    attribute. Pin that the REAL plan still gets the prune — i.e. the
    synthetic verdict transfers."""
    from pyspark.sql import Window

    df = spark.range(1000).select(
        (F.col("id") % 5).alias("g"), F.col("id").alias("v")
    )
    w = Window.partitionBy("g").orderBy(F.rand(7).asc())
    naive = df.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= 3
    )
    real = "WindowGroupLimit" in (
        naive._jdf.queryExecution().executedPlan().toString()
    )
    synthetic = relational._window_group_limit_fires(spark, 3)
    assert real == synthetic
    out = relational.top_k_per_group(df, ["g"], [F.rand(7).asc()], 3)
    assert out.groupBy("g").count().agg(F.max("count")).first()[0] <= 3


def test_wgl_memo_keyed_on_application_id(spark):
    relational._WGL_MEMO.clear()
    relational._window_group_limit_fires(spark, 4)
    assert any(
        k[0] == spark.sparkContext.applicationId
        for k in relational._WGL_MEMO
    )


def test_no_aqe_reentrant_and_restores(spark):
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    with no_aqe(spark):
        assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
        with no_aqe(spark):  # nested: RLock + idempotent flip
            assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
        assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
    assert spark.conf.get("spark.sql.adaptive.enabled", "true") == prev


def test_pca_merged_stats_equal_two_pass(spark):
    """The merged arrays_zip aggregation must reproduce the separate
    axis-variance and projection-stat passes bit-for-bit per position
    (same values, same grouping — only the number of scans changes)."""
    import numpy as np

    from data_engineering_capstone_project__spark.operators import similarity

    rng = np.random.default_rng(7)
    vecs = [(i, [float(x) for x in rng.normal(size=6)]) for i in range(40)]
    base = spark.createDataFrame(vecs, "vec_id int, embedding array<double>")
    comps, eig, mean = similarity.pca_fit(base, k=3, vec_col="embedding")
    proj = similarity.pca_transform(
        base.select("embedding"), comps, mean, vec_col="embedding"
    )
    merged = (
        proj.select(
            F.posexplode(F.arrays_zip("embedding", "pca")).alias("_pos", "_z")
        )
        .groupBy("_pos")
        .agg(
            F.sum("_z.embedding").alias("sx"),
            F.count("_z.embedding").alias("n"),
            F.sum("_z.pca").alias("sy"),
            F.count("_z.pca").alias("ny"),
        )
        .collect()
    )
    by_pos = {r["_pos"]: r for r in merged}
    vstats = {
        r["_pos"]: r
        for r in base.select(F.posexplode("embedding").alias("_pos", "_x"))
        .groupBy("_pos")
        .agg(F.sum("_x").alias("sx"), F.count("*").alias("n"))
        .collect()
    }
    pstats = {
        r["_pos"]: r
        for r in proj.select(F.posexplode("pca").alias("_pos", "_y"))
        .groupBy("_pos")
        .agg(F.sum("_y").alias("sy"), F.count("*").alias("n"))
        .collect()
    }
    assert set(by_pos) == set(vstats) == set(range(6))
    for p, r in vstats.items():
        assert by_pos[p]["n"] == r["n"]
        assert abs(by_pos[p]["sx"] - r["sx"]) < 1e-9
    for p, r in pstats.items():
        assert by_pos[p]["ny"] == r["n"]
        assert abs(by_pos[p]["sy"] - r["sy"]) < 1e-9
    # padded tail: pca contributes nothing past k
    for p in range(3, 6):
        assert by_pos[p]["ny"] == 0


def test_artifact_writes_are_zstd(spark, tmp_path):
    import pyarrow.parquet as pq

    path = str(tmp_path / "art")
    df = spark.range(100).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("d"), "id").alias("text")
    )
    v = art.save_artifact(path, {"part": df}, meta={"kind": "t"})
    part_dir = os.path.join(path, f"v={v}", "part")
    files = [f for f in os.listdir(part_dir) if f.endswith(".parquet")]
    assert files
    md = pq.ParquetFile(os.path.join(part_dir, files[0])).metadata
    assert md.row_group(0).column(0).compression == "ZSTD"
    got = art.load_artifact(spark, path)[0]["part"]
    assert got.count() == 100
