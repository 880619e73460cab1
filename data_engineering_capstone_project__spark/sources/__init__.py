from data_engineering_capstone_project__spark.sources.io import (  # noqa: F401
    columns_df,
    literal_table,
    load_tables,
    probe_header,
    read_parquet,
    read_tsv,
    write_parquet,
)
