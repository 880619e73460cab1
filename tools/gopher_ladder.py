"""Measure gopher_quality's HOF line/word rules vs a regexp_count
rewrite (VERDICT r11 #6 — the pq_encode lesson applied: "built-in" HOFs
are CodegenFallback, so the hot-path claim needs a measured comparison).

Runs both variants over the ladder documents (tools/gen_scale_data.py)
at every available rung, forces full evaluation of every output column
(one scalar aggregate over all measures + rules), checks the two
variants agree ROW-FOR-ROW at the smallest rung, and prints a table.

Usage: python tools/gopher_ladder.py [rung ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from data_engineering_capstone_project__spark.functions.fx import pround  # noqa: E402
from data_engineering_capstone_project__spark.operators import text as T  # noqa: E402
from data_engineering_capstone_project__spark.session import get_spark  # noqa: E402

RUNGS = ["5000", "50000", "500000"]


def gopher_hof(df: DataFrame, text_col: str = "text", id_col: str = "doc_id"):
    """The ORIGINAL r11 higher-order-function form of the three
    line/word rules (F.filter + per-element rlike — CodegenFallback),
    preserved here as the measurement counterpart: the package's
    ``gopher_quality`` now carries the regexp_count rewrite that won
    the r12 ladder (17.9 s vs 15.7 s at the 500k rung)."""
    t = F.col(text_col)
    trimmed = F.trim(t)
    n_words = T.token_count(t).cast("double")
    nz_words = F.nullif(n_words, F.lit(0.0))
    word_chars = F.length(F.regexp_replace(trimmed, r"\s+", "")).cast("double")
    mean_wl = pround(word_chars / nz_words, 4)
    symbols = (
        F.regexp_count(t, F.lit("#"))
        + F.regexp_count(t, F.lit(r"\.\.\."))
        + F.regexp_count(t, F.lit("…"))
    ).cast("double")
    symbol_ratio = pround(symbols / nz_words, 4)
    lines = F.split(t, "\n")
    n_lines = F.size(lines).cast("double")
    bullet_ratio = pround(
        F.size(
            F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]"))
        ).cast("double")
        / F.nullif(n_lines, F.lit(0.0)),
        4,
    )
    ellipsis_ratio = pround(
        F.size(
            F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$"))
        ).cast("double")
        / F.nullif(n_lines, F.lit(0.0)),
        4,
    )
    words = F.filter(F.split(trimmed, r"\s+"), lambda w: w != "")
    alpha_ratio = pround(
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))).cast("double")
        / nz_words,
        4,
    )
    lowered = F.lower(t)
    n_stop = sum(
        F.when(lowered.rlike(rf"\b{w}\b"), 1).otherwise(0)
        for w in T._GOPHER_STOPWORDS
    )

    def rule(c):
        return F.coalesce(c, F.lit(False))

    r_word_count = rule((n_words >= 50) & (n_words <= 100_000))
    r_mean_word_len = rule((mean_wl >= 3.0) & (mean_wl <= 10.0))
    r_symbol_ratio = rule(symbol_ratio <= 0.1)
    r_bullet = rule(bullet_ratio <= 0.9)
    r_ellipsis = rule(ellipsis_ratio <= 0.3)
    r_alpha = rule(alpha_ratio >= 0.8)
    r_stop = n_stop >= 2
    return df.select(
        F.col(id_col),
        n_words.cast("bigint").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_ratio.alias("bullet_line_ratio"),
        ellipsis_ratio.alias("ellipsis_line_ratio"),
        alpha_ratio.alias("alpha_word_ratio"),
        n_stop.cast("int").alias("n_required_stopwords"),
        r_word_count.alias("r_word_count"),
        r_mean_word_len.alias("r_mean_word_len"),
        r_symbol_ratio.alias("r_symbol_ratio"),
        r_bullet.alias("r_bullet_lines"),
        r_ellipsis.alias("r_ellipsis_lines"),
        r_alpha.alias("r_alpha_words"),
        r_stop.alias("r_stopwords"),
        (
            r_word_count & r_mean_word_len & r_symbol_ratio
            & r_bullet & r_ellipsis & r_alpha & r_stop
        ).alias("keep"),
    )


def force(out: DataFrame) -> tuple:
    row = out.agg(
        F.sum("n_words"),
        F.sum("mean_word_len"),
        F.sum("symbol_ratio"),
        F.sum("bullet_line_ratio"),
        F.sum("ellipsis_line_ratio"),
        F.sum("alpha_word_ratio"),
        F.sum("n_required_stopwords"),
        F.sum(F.col("keep").cast("int")),
    ).first()
    return tuple(row)


def main() -> None:
    rungs = sys.argv[1:] or RUNGS
    spark = get_spark(
        app_name="gopher_ladder", master="local[8]", shuffle_partitions=8
    )
    # row-for-row agreement at the smallest rung + the driver testdata
    for src in ("/tmp/spark_graft_ladder/5000/documents.parquet",
                "/root/testdata/sf0.01/documents.parquet"):
        d = spark.read.parquet(src)
        a = sorted(map(tuple, gopher_hof(d).collect()))
        b = sorted(map(tuple, T.gopher_quality(d).collect()))
        print(f"agree[{src.split('/')[-2]}]: {a == b} ({len(a)} rows)")
    print(f"{'rung':>8} {'hof_s':>8} {'regexp_s':>9}")
    for rung in rungs:
        path = f"/tmp/spark_graft_ladder/{rung}/documents.parquet"
        if not os.path.isdir(path) and not os.path.exists(path):
            continue
        d = spark.read.parquet(path)
        d.count()  # warm the scan
        times = {}
        for name, fn in (("hof", gopher_hof), ("regexp", T.gopher_quality)):
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                s = force(fn(d))
                best = min(best, time.time() - t0)
            times[name] = best
        print(f"{rung:>8} {times['hof']:>8.2f} {times['regexp']:>9.2f}")


if __name__ == "__main__":
    main()
