"""data_engineering_capstone_project__spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference repo ``arsadyum/Data-Engineering-Capstone-Project-``
(a T-SQL batch pipeline that dictionary-cleans, derives, record-links and
QA-checks school-meal-participation data; see
``/root/reference/shareOurStrengthSQLCodev4.sql``), extended with the
operators a large-scale (100 TB) LLM training-data pipeline needs:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding
cosine), similarity search, text analysis, multimodal column plumbing, and
event-time windowing.

Design stance (SURVEY.md §7.1): everything is a composition of lazy
DataFrame operators — Catalyst does pushdown/pruning/join planning; no
custom rules. The reference's WHILE/EXEC dynamic-SQL machinery collapses to
driver-side Python over small collected plan tables.
"""

__version__ = "0.1.0"

from data_engineering_capstone_project__spark.session import get_spark  # noqa: F401

from data_engineering_capstone_project__spark.plans.corpus import (  # noqa: F401,E402
    CorpusConfig,
    clean_corpus,
    mix_sources_by_tokens,
)
from data_engineering_capstone_project__spark.sources.io import (  # noqa: F401,E402
    read_versioned,
    write_versioned,
)
