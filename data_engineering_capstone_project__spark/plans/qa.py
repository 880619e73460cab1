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
    semantics, dedups — Spark ``intersect`` matches SQL INTERSECT exactly).

    Distributed: three aggregations, no driver-side data movement.
    """
    spark = a.sparkSession
    common = a.intersect(b)
    counts = spark.createDataFrame(
        [(a.count(), b.count(), common.count())],
        "count_a long, count_b long, count_common long",
    )
    return counts.withColumn(
        "equivalent",
        (F.col("count_a") == F.col("count_b"))
        & (F.col("count_b") == F.col("count_common")),
    )


def qa_diff(a: DataFrame, b: DataFrame) -> DataFrame:
    """Multiset diff with a side marker: rows only in A ('A') / only in B
    ('B'). Empty result ⇒ multiset-equal (stronger than the reference's
    INTERSECT-count check)."""
    only_a = a.exceptAll(b).withColumn("side", F.lit("A"))
    only_b = b.exceptAll(a).withColumn("side", F.lit("B"))
    return only_a.unionByName(only_b)
