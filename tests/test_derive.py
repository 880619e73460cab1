"""End-to-end EP3 pipeline on FIXTURES.md A2/A3-shaped inline fixtures:
derive lunch + breakfast sides, assemble via record-linkage join, QA."""

import pytest

from data_engineering_capstone_project__spark.plans.derive import (
    assemble_final,
    derive_breakfast,
    derive_lunch,
)

LUNCH_SCHEMA = (
    "`school name` string, `claim date` string, `district id` string, "
    "`PUBLIC` string, `SCHOOL TYPE` string, `Lunch Meals-Free` string, "
    "`Lunch Meals-Reduced` string, `Lunch Meals-Paid` string, "
    "`Operating Days-Lunch Only` string, `Enrollment-Free` string, "
    "`Enrollment-Reduced` string, `Enrollment-Total` string, "
    "`CEP (Y/N)` string, `School ID` string, `School Level-Original` string"
)

BRKF_SCHEMA = (
    "`school name` string, `claim date` string, `district id` string, "
    "TRADITIONAL_MODEL string, MID_MORNING_MODEL string, CLASSROOM_MODEL string, "
    "REDUCED_PRICE_MODEL string, GRAB_N_GO_MODEL string, FREE_MODEL string, "
    "`Breakfast Meals-Free` string, `Breakfast Meals-Reduced` string, "
    "`Operating Days-Breakfast Only` string, `School Year` string"
)


@pytest.fixture()
def lunch(spark):
    return spark.createDataFrame(
        [
            ("Alpha Elem", "2017-10", "42", "YES", "REGULAR", "100", "20", "30",
             "20", "150", "25", "200", "N", "7", "Elementary School"),
            ("Beta High", "2017-10", "123456", "NO", "RCCI", "50", None, "10",
             "18", "80", "10", "100", "Y", "8", "High School"),
        ],
        LUNCH_SCHEMA,
    )


@pytest.fixture()
def breakfast(spark):
    return spark.createDataFrame(
        [
            ("Alpha Elem", "2017-10", "000042", "Y", None, "N", "Y", "N", "Y",
             "60", "15", "20", None),
            ("Beta High", "2017-10", "123456", "N", "N", "N", "N", "N", "N",
             "30", "5", "18", "17-18"),
        ],
        BRKF_SCHEMA,
    )


def test_derive_lunch_measures(lunch):
    out = {r["school name"]: r for r in derive_lunch(lunch).collect()}
    a = out["Alpha Elem"]
    assert a["School Type-Original"] == "Public"
    assert a["FR Lunch Meals"] == 120.0
    assert a["FR Lunch ADP"] == 6.0
    assert a["Unique ID"] == "WI-07-42"
    assert a["NCES ID"] == "000042"
    assert a["FR Enrollment"] == 175.0
    assert a["FR Enrollment Percentage"] == 175.0 / 200.0
    assert a["School Level-Standardized"] == "Primary"
    assert a["School Type-Standardized"] == "Public"
    b = out["Beta High"]
    assert b["School Type-Original"] == "Nonpublic RCCI"
    assert b["FR Lunch Meals"] is None  # NULL propagates (SURVEY §1.3)
    assert b["FR Enrollment Percentage"] == 50.0 / 60.0  # CEP=Y: free/(free+paid)
    assert b["School Type-Standardized"] is None


def test_derive_breakfast_and_assemble(lunch, breakfast):
    brf = derive_breakfast(breakfast)
    rows = {r["school name"]: r for r in brf.collect()}
    a = rows["Alpha Elem"]
    assert a["Breakfast Delivery Model from State Agency-Original"] == (
        "O=Y, P=, Q=N, R=Y, S=N, T=Y"
    )
    assert a["FR Breakfast Meals"] == 75.0
    assert a["School_Year"] == "17-18"  # derived from NULL (D9 intent)
    assert a["Target Area"] is None

    final = assemble_final(derive_lunch(lunch), brf)
    assert final.count() == 2  # padded 42 == 000042 links
    cols = final.columns
    assert "FR Lunch ADP" in cols and "FR Breakfast ADP" in cols


def test_d15_tracking_standardized_intent(spark, breakfast):
    """D15 (spec-comment-only, sql:1035-1039): intent=True emits the
    comma-joined Y-flag model names in O..T order; default stays parity
    (column absent). Spec's own examples: P alone; P and Q together."""
    out = derive_breakfast(breakfast, intent=True)
    col = "Breakfast Delivery Model from State Agency Tracking-Standardized"
    assert col in out.columns
    assert col not in derive_breakfast(breakfast).columns  # default = parity
    rows = {r["school name"]: r[col] for r in out.collect()}
    # Alpha: O=Y P=NULL Q=N R=Y S=N T=Y
    assert rows["Alpha Elem"] == "TRADITIONAL_MODEL, REDUCED_PRICE_MODEL, FREE_MODEL"
    assert rows["Beta High"] is None  # all-N -> NULL

    # the spec's two worked examples
    ex = spark.createDataFrame(
        [
            ("p_only", "2017-10", "1", "N", "Y", "N", "N", "N", "N",
             "1", "1", "1", None),
            ("p_and_q", "2017-10", "2", "N", "Y", "Y", "N", "N", "N",
             "1", "1", "1", None),
        ],
        BRKF_SCHEMA,
    )
    got = {
        r["school name"]: r[col]
        for r in derive_breakfast(ex, intent=True).collect()
    }
    assert got["p_only"] == "MID_MORNING_MODEL"
    assert got["p_and_q"] == "MID_MORNING_MODEL, CLASSROOM_MODEL"


def test_d12_fallback_intent(spark):
    """D12 fallback (spec-comment-only, sql:977-980): under CEP='Y' a NULL
    Lunch Meals-Free uses the combined column; both NULL stays NULL; the
    default (intent=False) keeps reference parity (NULL propagates)."""
    schema = LUNCH_SCHEMA + ", `Lunch Meals-Free and Reduced` string"
    rows = [
        # free present: primary branch, combined ignored
        ("A", "2017-10", "1", "YES", "REGULAR", "50", "0", "50", "1",
         "1", "1", "100", "Y", "1", "Elementary School", "999"),
        # free NULL, combined present: fallback branch
        ("B", "2017-10", "2", "YES", "REGULAR", None, "0", "60", "1",
         "1", "1", "100", "Y", "2", "Elementary School", "40"),
        # both NULL: stays NULL
        ("C", "2017-10", "3", "YES", "REGULAR", None, "0", "60", "1",
         "1", "1", "100", "Y", "3", "Elementary School", None),
    ]
    df = spark.createDataFrame(rows, schema)
    got = {
        r["school name"]: r["FR Enrollment Percentage"]
        for r in derive_lunch(df, intent=True).collect()
    }
    assert got["A"] == 50.0 / 100.0
    assert got["B"] == 40.0 / 100.0
    assert got["C"] is None
    parity = {
        r["school name"]: r["FR Enrollment Percentage"]
        for r in derive_lunch(df).collect()
    }
    assert parity["B"] is None  # implemented-reference behavior preserved
