import os
import tempfile

from data_engineering_capstone_project__spark.sources.io import (
    read_json,
    read_orc,
    write_json,
    write_orc,
)


def test_json_and_orc_round_trip(spark, sf_dir):
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    with tempfile.TemporaryDirectory(prefix="io_fmt_") as d:
        jpath, opath = os.path.join(d, "j"), os.path.join(d, "o")
        write_json(nation, jpath)
        write_orc(nation, opath)
        back_j = read_json(spark, jpath, schema=nation.schema)
        back_o = read_orc(spark, opath)
        assert back_j.count() == nation.count()
        assert back_o.count() == nation.count()
        assert set(back_o.columns) == set(nation.columns)
        # values survive both formats
        a = sorted(tuple(r) for r in nation.collect())
        assert sorted(tuple(r) for r in back_j.select(*nation.columns).collect()) == a
        assert sorted(tuple(r) for r in back_o.select(*nation.columns).collect()) == a
