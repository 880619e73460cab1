"""End-to-end pipeline test over real TSV files on disk (exercises the
S1-S3 TSV ingest path + cleaning + derivation + linkage, the way a
reference user would run it)."""

import os
import tempfile

import pytest


def _write_tsv(dirpath, name, header, rows):
    path = os.path.join(dirpath, name)
    with open(path, "w") as f:
        f.write("\t".join(header) + "\n")
        for r in rows:
            f.write("\t".join("" if v is None else str(v) for v in r) + "\n")
    return path


@pytest.fixture()
def tsv_fixture_dir():
    with tempfile.TemporaryDirectory(prefix="nkh_tsv_") as d:
        dict_header = [
            "raw_data_column", "raw_data_column_name",
            "equivalent_clean_data_name", "notes",
        ]
        _write_tsv(d, "dict1.tsv", dict_header, [
            ("c1", "SCHOOL_NAME", "school name", ""),
            ("c2", "CLAIM_DATE", "claim date", ""),
            ("c3", "DISTRICT_ID", "district id", ""),
            ("c4", "PUBLIC", "PUBLIC", ""),
            ("c5", "SCHOOL TYPE", "SCHOOL TYPE", ""),
            ("c6", "LUNCH_FREE", "Lunch Meals-Free", ""),
            ("c7", "LUNCH_RED", "Lunch Meals-Reduced", ""),
            ("c8", "LUNCH_PAID", "Lunch Meals-Paid", ""),
            ("c9", "DAYS_LUNCH", "Operating Days-Lunch Only", ""),
            ("c10", "ENR_FREE", "Enrollment-Free", ""),
            ("c11", "ENR_RED", "Enrollment-Reduced", ""),
            ("c12", "ENR_TOT", "Enrollment-Total", ""),
            ("c13", "CEP_FLAG", "CEP (Y/N)", ""),
            ("c14", "SCHOOL_ID", "School ID", ""),
            ("c15", "SCHOOL_LEVEL", "School Level-Original", ""),
            ("c16", "OLD_COL", "THIS IS NOT USED", ""),
        ])
        _write_tsv(d, "dict2.tsv", dict_header, [
            ("b1", "SCHOOL_NAME", "school name", ""),
            ("b2", "CLAIM_DATE", "claim date", ""),
            ("b3", "DISTRICT_ID", "district id", ""),
            ("b4", "TRADITIONAL_MODEL", "TRADITIONAL_MODEL", ""),
            ("b5", "MID_MORNING_MODEL", "MID_MORNING_MODEL", ""),
            ("b6", "CLASSROOM_MODEL", "CLASSROOM_MODEL", ""),
            ("b7", "REDUCED_PRICE_MODEL", "REDUCED_PRICE_MODEL", ""),
            ("b8", "GRAB_N_GO_MODEL", "GRAB_N_GO_MODEL", ""),
            ("b9", "FREE_MODEL", "FREE_MODEL", ""),
            ("b10", "BRKF_FREE", "Breakfast Meals-Free", ""),
            ("b11", "BRKF_RED", "Breakfast Meals-Reduced", ""),
            ("b12", "DAYS_BRKF", "Operating Days-Breakfast Only", ""),
            ("b13", "SCHOOL_YEAR", "School Year", ""),
        ])
        _write_tsv(
            d, "lunch.tsv",
            ["SCHOOL_NAME", "CLAIM_DATE", "DISTRICT_ID", "PUBLIC", "SCHOOL TYPE",
             "LUNCH_FREE", "LUNCH_RED", "LUNCH_PAID", "DAYS_LUNCH", "ENR_FREE",
             "ENR_RED", "ENR_TOT", "CEP_FLAG", "SCHOOL_ID", "SCHOOL_LEVEL",
             "OLD_COL", "RANDOM_JUNK"],
            [
                ("Alpha Elem", "2017-10", "42", "YES", "REGULAR", "100", "20",
                 "30", "20", "150", "25", "200", "N", "7", "Elementary School",
                 "old", "junk"),
                ("Beta High", "2017-10", "123456", "NO", "RCCI", "50", None,
                 "10", "18", "80", "10", "100", "Y", "8", "High School",
                 "old", "junk"),
            ],
        )
        _write_tsv(
            d, "breakfast.tsv",
            ["SCHOOL_NAME", "CLAIM_DATE", "DISTRICT_ID", "TRADITIONAL_MODEL",
             "MID_MORNING_MODEL", "CLASSROOM_MODEL", "REDUCED_PRICE_MODEL",
             "GRAB_N_GO_MODEL", "FREE_MODEL", "BRKF_FREE", "BRKF_RED",
             "DAYS_BRKF", "SCHOOL_YEAR"],
            [
                ("Alpha Elem", "2017-10", "000042", "Y", None, "N", "Y", "N",
                 "Y", "60", "15", "20", None),
                ("Beta High", "2017-10", "123456", "N", "N", "N", "N", "N",
                 "N", "30", "5", "18", "17-18"),
            ],
        )
        yield d


def test_pipeline_over_tsv_files(spark, tsv_fixture_dir):
    from data_engineering_capstone_project__spark.plans.pipeline import (
        run_reference_pipeline,
    )

    d = tsv_fixture_dir
    out = os.path.join(d, "final_parquet")
    final, qa = run_reference_pipeline(
        spark,
        lunch_path=os.path.join(d, "lunch.tsv"),
        breakfast_path=os.path.join(d, "breakfast.tsv"),
        dict1_path=os.path.join(d, "dict1.tsv"),
        dict2_path=os.path.join(d, "dict2.tsv"),
        output_path=out,
    )
    rows = {r["school name"]: r for r in final.collect()}
    assert set(rows) == {"Alpha Elem", "Beta High"}
    a = rows["Alpha Elem"]
    assert a["FR Lunch ADP"] == 6.0
    assert a["NCES ID"] == "000042"
    assert a["School_Year"] == "17-18"
    assert a["FR Breakfast Meals"] == 75.0
    # dropped columns are gone
    assert "OLD_COL" not in final.columns and "RANDOM_JUNK" not in final.columns
    # parquet sink was written and round-trips
    back = spark.read.parquet(out)
    assert back.count() == 2

    # golden-file QA path: compare against itself -> equivalent
    _, qa2 = run_reference_pipeline(
        spark,
        lunch_path=os.path.join(d, "lunch.tsv"),
        breakfast_path=os.path.join(d, "breakfast.tsv"),
        dict1_path=os.path.join(d, "dict1.tsv"),
        dict2_path=os.path.join(d, "dict2.tsv"),
        golden_path=out,
    )
    row = qa2.collect()[0]
    assert row["equivalent"] and row["count_common"] == 2


def test_pipeline_golden_schema_mismatch(spark, tsv_fixture_dir):
    """A golden file whose columns don't exist in the output must yield a
    clean non-equivalent QA report (with the mismatch in `note`), not an
    AnalysisException mid-job."""
    from data_engineering_capstone_project__spark.plans.pipeline import (
        run_reference_pipeline,
    )

    d = tsv_fixture_dir
    bogus_golden = os.path.join(d, "bogus_golden_parquet")
    spark.createDataFrame(
        [("x", 1.5)], "no_such_column string, also_missing double"
    ).write.parquet(bogus_golden)
    _, qa = run_reference_pipeline(
        spark,
        lunch_path=os.path.join(d, "lunch.tsv"),
        breakfast_path=os.path.join(d, "breakfast.tsv"),
        dict1_path=os.path.join(d, "dict1.tsv"),
        dict2_path=os.path.join(d, "dict2.tsv"),
        golden_path=bogus_golden,
    )
    row = qa.collect()[0]
    assert not row["equivalent"]
    assert row["count_common"] == 0
    assert "no_such_column" in row["note"]
