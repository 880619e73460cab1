"""QA / golden-output equivalence (SURVEY.md §5, E1).

The reference's entire test methodology is set-intersection cardinality:
produced ≡ golden iff ``|A| = |B| = |A ∩ B|``
(``shareOurStrengthSQLCodev4.sql:1116-1126``). Implemented as an engine
feature, plus an ``exceptAll`` diff the reference lacks (SURVEY §2.6 E2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def qa_compare(a: DataFrame, b: DataFrame) -> DataFrame:
    """One-row report: count_a, count_b, count_common (INTERSECT = set
    semantics, dedups; null fields compare equal, as SQL INTERSECT does).

    Fully lazy single plan: tag each side, union, group once on the whole
    row, aggregate — ONE shuffle + one global agg when collected, instead
    of three separate driver actions (count(a), count(b),
    count(intersect)) each rescanning its input.
    """
    ua = a.select(
        F.struct(*[F.col(c) for c in a.columns]).alias("_r"),
        F.lit(1).alias("_ia"),
        F.lit(0).alias("_ib"),
    )
    ub = b.select(
        F.struct(*[F.col(c) for c in b.columns]).alias("_r"),
        F.lit(0).alias("_ia"),
        F.lit(1).alias("_ib"),
    )
    per_row = ua.unionAll(ub).groupBy("_r").agg(
        F.sum("_ia").alias("_na"), F.sum("_ib").alias("_nb")
    )
    return per_row.agg(
        F.coalesce(F.sum("_na"), F.lit(0)).alias("count_a"),
        F.coalesce(F.sum("_nb"), F.lit(0)).alias("count_b"),
        F.coalesce(
            F.sum(F.when((F.col("_na") > 0) & (F.col("_nb") > 0), 1).otherwise(0)),
            F.lit(0),
        ).alias("count_common"),
    ).withColumn(
        "equivalent",
        (F.col("count_a") == F.col("count_b"))
        & (F.col("count_b") == F.col("count_common")),
    )


def qa_vs_golden(produced: DataFrame, golden: DataFrame) -> DataFrame:
    """``qa_compare`` hardened for user-supplied golden files: a golden
    whose columns don't exist in the output (or carry different types)
    yields a clean non-equivalent report with the mismatch in ``note``
    instead of an AnalysisException mid-job.

    Comparison is on the golden's column set (the produced table may carry
    extra derived columns, mirroring the reference QA which compares the
    sponsor's narrower hand-cleaned file).

    Fully LAZY in every path — the schema checks read only driver-side
    metadata and the mismatch report is built from two count aggregates
    joined in one plan, never eager ``.count()`` actions — so callers can
    union many reports (one per state) and collect them as ONE Spark job
    (``run_multistate``'s rollup).
    """
    missing = [c for c in golden.columns if c not in produced.columns]
    p_types = dict(produced.dtypes)
    mistyped = [
        f"{c} ({p_types[c]} vs {t})"
        for c, t in golden.dtypes
        if c in p_types and p_types[c] != t
    ]
    if missing or mistyped:
        notes = []
        if missing:
            notes.append(f"golden columns missing from output: {missing}")
        if mistyped:
            notes.append(f"column type mismatches: {mistyped}")
        ca = produced.agg(F.count(F.lit(1)).alias("count_a"))
        cb = golden.agg(F.count(F.lit(1)).alias("count_b"))
        return ca.crossJoin(cb).select(
            F.col("count_a"),
            F.col("count_b"),
            F.lit(0).cast("long").alias("count_common"),
            F.lit(False).alias("equivalent"),
            F.lit("; ".join(notes)).alias("note"),
        )
    report = qa_compare(produced.select(*golden.columns), golden)
    return report.withColumn("note", F.lit(""))


def qa_diff(a: DataFrame, b: DataFrame) -> DataFrame:
    """Multiset diff with a side marker: rows only in A ('A') / only in B
    ('B'). Empty result ⇒ multiset-equal (stronger than the reference's
    INTERSECT-count check)."""
    only_a = a.exceptAll(b).withColumn("side", F.lit("A"))
    only_b = b.exceptAll(a).withColumn("side", F.lit("B"))
    return only_a.unionByName(only_b)
