from data_engineering_capstone_project__spark.streaming.windows import (  # noqa: F401
    sessionize,
    sliding_agg,
    tumbling_agg,
)
