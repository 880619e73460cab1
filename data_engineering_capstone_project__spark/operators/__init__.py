from data_engineering_capstone_project__spark.operators.relational import (  # noqa: F401
    add_row_id,
    drop_columns,
    linkage_join,
    rename_columns,
    top_k_per_group,
)
