from data_engineering_capstone_project__spark.functions.fx import (  # noqa: F401
    like_any,
    null_if_zero,
    pad_key,
    recode,
    try_double,
    tsql_concat,
)
