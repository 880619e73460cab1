from data_engineering_capstone_project__spark.plans.cleaner import (  # noqa: F401
    CleanPlan,
    apply_clean_plan,
    build_clean_plan,
)
from data_engineering_capstone_project__spark.plans.qa import (  # noqa: F401
    qa_compare,
    qa_diff,
    qa_vs_golden,
)
