from data_engineering_capstone_project__spark.operators.asof import (  # noqa: F401
    asof_join,
    range_join,
)
from data_engineering_capstone_project__spark.operators.dedup import (  # noqa: F401
    connected_components,
    dedup_by_clusters,
    exact_dedup,
)
from data_engineering_capstone_project__spark.operators.relational import (  # noqa: F401
    add_row_id,
    drop_columns,
    linkage_join,
    rename_columns,
    salted_group_count,
    sample_by_hash,
    spread,
    top_k_per_group,
    train_test_split,
    upsert,
)
from data_engineering_capstone_project__spark.operators.text import (  # noqa: F401
    analyze,
    chunk_documents,
    pack_sequences,
    tf_idf,
)
