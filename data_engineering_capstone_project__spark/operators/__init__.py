from data_engineering_capstone_project__spark.operators.asof import (  # noqa: F401
    asof_join,
    range_join,
)
from data_engineering_capstone_project__spark.operators.dedup import (  # noqa: F401
    connected_components,
    contamination_check,
    dedup_by_clusters,
    embedding_contamination,
    auto_minhash_config,
    exact_dedup,
    minhash_lsh_candidates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
    substring_span_dedup,
    winnow_runs,
)
from data_engineering_capstone_project__spark.operators.similarity import (  # noqa: F401
    auto_lsh_config,
    cosine_topk,
    cosine_topk_many,
    ivf_topk,
    lsh_bucket_pairs,
    quantize_embeddings,
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
    mask_pii,
    pack_sequences,
    strip_boilerplate_lines,
    tf_idf,
    unigram_logprob,
)
