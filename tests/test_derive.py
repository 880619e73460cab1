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
