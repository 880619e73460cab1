"""Text-analysis operators for LLM-pipeline data prep (north-star extension;
no analogue in the reference — its only string ops are REPLACE/CONCAT/CASE,
SURVEY.md §2.7).

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage codegen). No Python UDFs anywhere in this module — at 100 TB a
row-at-a-time UDF on a documents table is the difference between hours and
days.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_engineering_capstone_project__spark.cachereg import register
from data_engineering_capstone_project__spark.functions.fx import pround

# Tiny per-language stopword marker sets for the n-gram/stopword heuristic
# language id. Deterministic and SQL-expressible (regexp hit counts) so the
# DuckDB oracle can replicate it exactly.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for"],
    "de": ["der", "die", "das", "und", "nicht", "ist", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "que", "pour"],
    "es": ["el", "los", "las", "es", "una", "que", "por", "para"],
}

_WORD_RE = r"\s+"


def _lower_terms(text: Column) -> Column:
    """The engine's ONE lexical tokenization expression: lowercase, trim,
    split on Java ``\\s+`` (ASCII ``[ \\t\\n\\x0b\\f\\r]`` — note ``\\x0b``,
    which Python's RE2-ish oracles must pin explicitly). Both corpus terms
    (:func:`tf_idf`, :func:`bm25`) and retrieval query terms
    (:func:`bm25_topk`) evaluate THIS expression, so term identity can
    never diverge between the two sides — the same structural-sharing fix
    BPE uses for its train/tokenize normalization (``operators/bpe.py``):
    parity is guaranteed by construction instead of by replicating Java's
    locale/whitespace rules in Python."""
    return F.split(F.lower(F.trim(text)), _WORD_RE)


def _inline_rows(spark, cols: list[str], rows: list[tuple]) -> DataFrame:
    """A small driver-resident relation as a true ``LocalRelation`` (inline
    ``VALUES`` with bind parameters), NOT the RDD-backed relation
    ``createDataFrame`` builds. The difference is pure scheduler overhead:
    a ``LocalRelation`` collects via ``executeCollect`` and feeds a
    ``BroadcastExchange`` build with ZERO Spark jobs, while the
    ``LogicalRDD`` shape pays one job per action on the steady-state query
    path (guide §1/§2 — per-call driver round trips). All values are bound
    as NAMED parameters — never spliced into the SQL text, and never
    positional ``?`` markers, whose binding order does NOT follow their
    textual order inside an inline VALUES list (verified empirically:
    the positional form scrambles row values) — and cast to string,
    matching the previous ``createDataFrame(..., "a string, b string")``
    schema exactly."""
    args: dict[str, object] = {}
    tuples = []
    for i, row in enumerate(rows):
        marks = []
        for j, v in enumerate(row):
            name = f"p{i}_{j}"
            args[name] = v
            marks.append(f"CAST(:{name} AS STRING)")
        tuples.append("(" + ", ".join(marks) + ")")
    sql = (
        f"SELECT * FROM VALUES {', '.join(tuples)} "
        f"AS q({', '.join(cols)})"
    )
    return spark.sql(sql, args=args)


def _query_terms_local(
    spark, qitems: list[tuple], ntb: int | None
) -> list[tuple]:
    """Tokenize a driver-resident query dict into unique ``(query_id,
    term, bucket)`` triples (``bucket`` is None when ``ntb`` is) at ZERO
    Spark jobs.

    The terms come from the engine's own Catalyst expression
    (:func:`_lower_terms`, plus the writer's exact ``pmod(xxhash64)``
    bucket hash) evaluated over an inline-``VALUES`` ``LocalRelation``:
    ``ConvertToLocalRelation`` folds the projection driver-side, so the
    ``collect()`` never launches a job — unlike the previous
    ``explode``-based shape, whose ``Generate`` node blocked the fold and
    cost one scheduler round trip per query batch (OPTIMIZATION_r15
    deferred #1). Evaluating the SAME expressions keeps the round-5 #6
    parity guarantee: query-side tokenization can never diverge from the
    corpus side (Java vs Python ``\\s``/casing differences are moot
    because Python never tokenizes)."""
    qdf = _inline_rows(spark, ["query_id", "_qtext"], qitems)
    arr = F.array_distinct(_lower_terms(F.col("_qtext")))
    cols = [F.col("query_id"), arr.alias("_terms")]
    if ntb:
        cols.append(
            F.transform(
                arr,
                lambda t: F.pmod(F.xxhash64(t), F.lit(int(ntb))).cast("int"),
            ).alias("_tbs")
        )
    out = []
    for r in qdf.select(*cols).collect():
        terms = r["_terms"] or []
        tbs = r["_tbs"] if ntb else [None] * len(terms)
        for t, bkt in zip(terms, tbs or []):
            if t != "":
                out.append((r["query_id"], t, bkt))
    return out


def token_count(text: Column) -> Column:
    """Whitespace token count; empty/blank text counts 0.

    ``regexp_count`` (separator runs + 1) — counts matches without
    materializing a string array (~2× cheaper than size(split)), same
    result as ``size(split(trim(text), '\\s+'))``.
    """
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.regexp_count(trimmed, F.lit(_WORD_RE)) + 1
    )


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish token estimate: count word-pieces + digits + punctuation
    runs (a regex proxy for subword tokenizers — deterministic, no vocab)."""
    return F.regexp_count(text, F.lit(r"[A-Za-z]{1,8}|[0-9]|[^A-Za-z0-9\s]"))


def char_count(text: Column) -> Column:
    return F.length(text)


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars (NULL on empty)."""
    n_punct = F.regexp_count(text, F.lit(r"[^\w\s]"))
    return n_punct / F.nullif(F.length(text).cast("double"), F.lit(0.0))


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    """Stopword hits / token count (English markers by default)."""
    words = stopwords or LANG_MARKERS["en"]
    pat = r"\b(" + "|".join(words) + r")\b"
    hits = F.regexp_count(F.lower(text), F.lit(pat))
    return hits / F.nullif(token_count(text).cast("double"), F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length sweet-spot × low punctuation
    × stopword presence. Cheap, deterministic, codegen'd."""
    n = F.length(text).cast("double")
    len_score = F.least(n / F.lit(200.0), F.lit(1.0))
    punct = F.coalesce(punct_ratio(text), F.lit(0.0))
    punct_score = F.greatest(F.lit(0.0), F.lit(1.0) - punct * 4)
    stop = F.coalesce(stopword_ratio(text), F.lit(0.0))
    stop_score = F.least(stop * 5, F.lit(1.0))
    return pround((len_score + punct_score + stop_score) / 3, 4)


# the 8 "required" English function words of the Gopher rule set
# (Rae et al. 2021, "Scaling Language Models: ... Gopher", App. A —
# public): a natural-language document plausibly contains ≥2 of them
_GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The Gopher quality-rule pack (Rae et al. 2021, Appendix A — the
    public rule set most production LLM text pipelines start from),
    as ONE codegen projection per document: the measured quantities,
    one boolean per named rule, and the conjunctive ``keep``.

    Rules (document KEPT when all hold):

    - ``r_word_count``      50 ≤ words ≤ 100,000
    - ``r_mean_word_len``   3 ≤ mean word length ≤ 10
    - ``r_symbol_ratio``    (# + ellipsis occurrences) / words ≤ 0.1
    - ``r_bullet_lines``    lines starting with a bullet ≤ 90%
    - ``r_ellipsis_lines``  lines ending with an ellipsis ≤ 30%
    - ``r_alpha_words``     words containing ≥1 alphabetic char ≥ 80%
    - ``r_stopwords``       ≥ 2 distinct required function words

    Scale shape: zero shuffles, zero Python — every measure is a
    ``regexp_count`` / length expression over the row, so the pack
    runs AT THE SCAN like the other quality signals
    (:func:`quality_score`, :func:`repetition_score`) and composes
    with ``plans/corpus.py``'s filter pipeline. The line/word rules
    were first written as ``F.filter`` higher-order functions — but
    HOFs are CodegenFallback (interpreted in the JVM despite being
    "built-ins", the pq_encode lesson), so r12 laddered both forms
    (``tools/gopher_ladder.py``: 17.9 s HOF vs 15.7 s regexp at the
    500k-doc rung, row-for-row identical there and on the driver
    data — SCALING.md) and kept the regexp rewrite: bullet/ellipsis
    lines count via multiline-anchored patterns (``(?m)`` with
    ``[^\\S\\n]`` so whitespace can never cross a line — each line
    yields at most one match, exactly the per-line boolean), alpha
    words via one count of maximal non-space runs containing a letter.
    (Java's MULTILINE anchors also treat a lone ``\\r`` as a line
    break where a ``split('\\n')`` would not — indistinguishable on
    any ``\\n``/``\\r\\n`` corpus.) Ratios are engine-parity rounded
    (``pround``) and the rule comparisons run on the ROUNDED values so
    both engines decide identically at boundaries (the repo's
    float-parity contract). Empty/blank text fails every word-based
    rule (ratios NULL → rule false)."""
    t = F.col(text_col)
    trimmed = F.trim(t)
    n_words = token_count(t).cast("double")
    nz_words = F.nullif(n_words, F.lit(0.0))
    # Σ word lengths = chars left after deleting ALL whitespace
    word_chars = F.length(F.regexp_replace(trimmed, r"\s+", "")).cast("double")
    mean_wl = pround(word_chars / nz_words, 4)
    symbols = (
        F.regexp_count(t, F.lit("#"))
        + F.regexp_count(t, F.lit(r"\.\.\."))
        + F.regexp_count(t, F.lit("…"))
    ).cast("double")
    symbol_ratio = pround(symbols / nz_words, 4)
    n_lines = F.size(F.split(t, "\n")).cast("double")
    nz_lines = F.nullif(n_lines, F.lit(0.0))
    bullet_ratio = pround(
        F.regexp_count(t, F.lit(r"(?m)^[^\S\n]*[-*•]")).cast("double")
        / nz_lines,
        4,
    )
    ellipsis_ratio = pround(
        F.regexp_count(t, F.lit(r"(?m)(\.\.\.|…)[^\S\n]*$")).cast("double")
        / nz_lines,
        4,
    )
    alpha_ratio = pround(
        F.regexp_count(trimmed, F.lit(r"\S*[A-Za-z]\S*")).cast("double")
        / nz_words,
        4,
    )
    lowered = F.lower(t)
    n_stop = sum(
        F.when(lowered.rlike(rf"\b{w}\b"), 1).otherwise(0)
        for w in _GOPHER_STOPWORDS
    )

    def rule(c):
        return F.coalesce(c, F.lit(False))

    r_word_count = rule((n_words >= 50) & (n_words <= 100_000))
    r_mean_word_len = rule((mean_wl >= 3.0) & (mean_wl <= 10.0))
    r_symbol_ratio = rule(symbol_ratio <= 0.1)
    r_bullet = rule(bullet_ratio <= 0.9)
    r_ellipsis = rule(ellipsis_ratio <= 0.3)
    r_alpha = rule(alpha_ratio >= 0.8)
    r_stop = n_stop >= 2
    return df.select(
        F.col(id_col),
        n_words.cast("bigint").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_ratio.alias("bullet_line_ratio"),
        ellipsis_ratio.alias("ellipsis_line_ratio"),
        alpha_ratio.alias("alpha_word_ratio"),
        n_stop.cast("int").alias("n_required_stopwords"),
        r_word_count.alias("r_word_count"),
        r_mean_word_len.alias("r_mean_word_len"),
        r_symbol_ratio.alias("r_symbol_ratio"),
        r_bullet.alias("r_bullet_lines"),
        r_ellipsis.alias("r_ellipsis_lines"),
        r_alpha.alias("r_alpha_words"),
        r_stop.alias("r_stopwords"),
        (
            r_word_count & r_mean_word_len & r_symbol_ratio
            & r_bullet & r_ellipsis & r_alpha & r_stop
        ).alias("keep"),
    )


def lang_scores(text: Column) -> dict[str, Column]:
    """Marker-word hit count per language."""
    out = {}
    lowered = F.lower(text)
    for lang, words in LANG_MARKERS.items():
        pat = r"\b(" + "|".join(words) + r")\b"
        out[lang] = F.regexp_count(lowered, F.lit(pat))
    return out


def lang_id(text: Column, default: str = "und") -> Column:
    """Heuristic language id: argmax of marker hits, ties broken by fixed
    language order (en > de > fr > es), 'und' when all zero."""
    scores = lang_scores(text)
    langs = list(scores)
    best = F.greatest(*[scores[l] for l in langs])
    expr = F.when(best == 0, F.lit(default))
    for l in langs:
        expr = expr.when(scores[l] == best, F.lit(l))
    return expr.otherwise(F.lit(default))


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 over whitespace-normalized lowercase text.

    Used as the exact-dedup key; a content-defined rolling hash variant
    lives in ``operators.dedup.simhash`` for near-dup.
    """
    normalized = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(normalized)


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into overlapping token-window chunks (the standard
    LLM-ingest shape: stride = chunk_tokens - overlap).

    Pure built-ins: tokenize once, generate chunk starts with ``sequence``,
    slice + rejoin per chunk. One explode, no shuffle, no Python; at 100 TB
    output rows ≈ docs × ceil(tokens/stride), each independent — perfectly
    parallel.
    """
    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")
    toks = F.split(F.trim(F.col(text_col)), _WORD_RE)
    n = F.size(toks)
    last_chunk = F.floor(
        F.greatest((n - overlap - 1), F.lit(0)) / F.lit(stride)
    ).cast("int")
    starts = F.sequence(F.lit(0), last_chunk)
    out = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.posexplode(starts).alias("chunk_id", "_s"),
    )
    return out.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.concat_ws(
            " ", F.slice(F.col("_toks"), F.col("chunk_id") * stride + 1, chunk_tokens)
        ).alias("chunk_text"),
        F.least(
            F.size("_toks") - F.col("chunk_id") * stride, F.lit(chunk_tokens)
        ).cast("long").alias("chunk_len"),
    )


def analyze(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass text-analysis: counts, ratios, quality, lang id, fingerprint."""
    t = F.col(text_col)
    return df.select(
        "*",
        char_count(t).alias("n_chars_computed"),
        token_count(t).alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_bpe_tokens"),
        pround(punct_ratio(t), 4).alias("punct_ratio"),
        pround(stopword_ratio(t), 4).alias("stopword_ratio"),
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang_pred"),
        fingerprint(t).alias("fingerprint"),
    )


def tf_idf(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-(doc, term) TF-IDF over whitespace tokens of lowercased text:
    ``tf * ln(n_docs / df_term)``.

    One explode, then term frequency by hash aggregation; document
    frequency is ``tf.groupBy(term).count()`` joined back on term. The
    partial (map-side) aggregate absorbs term skew — a stopword's rows
    collapse to one row per map partition before any shuffle — and the
    join-back runs under AQE skew handling (or auto-broadcasts when the
    vocabulary is small). A per-term COUNT *window* here would instead
    sort a stopword's full posting list (~one row per document) in a
    single task — a scale-killer on any heavy-tailed corpus. ``tf`` is
    persisted so the token explosion runs once even though it feeds both
    join branches (Spark shares no subplans across branches). All
    built-ins, JVM-side.
    """
    tokens = df.select(
        F.col(id_col),
        F.explode(_lower_terms(F.col(text_col))).alias("term"),
    ).filter(F.col("term") != "")
    tf = register(
        tokens.groupBy(id_col, "term").agg(F.count("*").alias("tf")).persist()
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df_t"))
    n = df.agg(F.count("*").alias("_n_docs"))
    return (
        tf.join(dfreq, "term")
        .join(F.broadcast(n))
        .select(
            id_col,
            "term",
            "tf",
            pround(
                F.col("tf") * F.log(F.col("_n_docs").cast("double") / F.col("df_t")),
                6,
            ).alias("tfidf"),
        )
    )


def bm25(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-(doc, term) Okapi BM25 weights over whitespace tokens of
    lowercased text — the standard lexical relevance weight (tf
    saturation + document-length normalization), useful in a training-data
    pipeline for retrieval-based decontamination and quality scoring where
    raw TF-IDF over-rewards long repetitive documents.

    ``idf = ln((N - df + 0.5) / (df + 0.5) + 1)`` (the Lucene/Robertson
    non-negative variant) and
    ``bm25 = idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`` with
    ``dl`` the document token count and ``avgdl`` its corpus mean.

    Scale shape is identical to :func:`tf_idf`: ONE token explode, term
    frequency by hash aggregation (map-side partials absorb stopword skew
    before any shuffle — never a per-term window), persisted because it
    feeds three branches (document frequency, document length, and the
    weighted join-back). Document length ``dl = Σ tf`` comes from the
    persisted tf relation, not a second corpus scan, and the two scalar
    aggregates (N, avgdl) ride one broadcast row. All built-ins, JVM-side.
    """
    tokens = df.select(
        F.col(id_col),
        F.explode(_lower_terms(F.col(text_col))).alias("term"),
    ).filter(F.col("term") != "")
    tf = register(
        tokens.groupBy(id_col, "term").agg(F.count("*").alias("tf")).persist()
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df_t"))
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    # N from the input frame (docs with empty text still count toward N,
    # exactly as a search index would size its corpus); avgdl over docs
    # that produced tokens. avgdl as exact-long Σdl / count — ONE double
    # division — not F.avg over doubles, whose partition-order-dependent
    # summation would break bit-exact oracle parity at ROUND(…, 6)
    scalars = F.broadcast(
        df.agg(F.count("*").alias("_n_docs")).crossJoin(
            dl.agg(
                (
                    F.sum("dl").cast("double") / F.count("*").cast("double")
                ).alias("_avgdl")
            )
        )
    )
    idf = F.log(
        (F.col("_n_docs") - F.col("df_t") + F.lit(0.5))
        / (F.col("df_t") + F.lit(0.5))
        + F.lit(1.0)
    )
    tf_d = F.col("tf").cast("double")
    denom = tf_d + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / F.col("_avgdl")
    )
    return (
        tf.join(dfreq, "term")
        .join(dl, id_col)
        .join(scalars)
        .select(
            id_col,
            "term",
            "tf",
            "dl",
            pround(idf * tf_d * F.lit(k1 + 1.0) / denom, 6).alias("bm25"),
        )
    )


# term-hash bucket count for the auto-managed BM25 posting layout
# (VERDICT r10 #7): 64 directories keeps small-corpus file counts sane
# while a typical query batch (tens of distinct terms) still prunes to
# well under half the index; at 100 TB raise it via an explicit
# save_bm25_index(n_term_buckets=...) — the probe reads the count from
# the layout itself (the _tb column), never from this constant.
_BM25_TERM_BUCKETS = 64


def _bm25_auto_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k1: float,
    b: float,
    index_path: str | None,
) -> DataFrame:
    """The ``weights='auto'`` resolution: reload the persisted BM25 index
    when one is CURRENT for this exact corpus content (digest-keyed —
    ``artifacts.corpus_digest``, one scalar-agg scan) and parameters,
    else fit once, persist, and serve the reloaded copy. The default
    location keys the path by (digest, k1, b), so distinct corpora and
    parameterizations coexist; staleness is impossible by construction
    (a changed corpus has a different digest → different path → refit).
    Cost per steady-state call: one digest scan + a parquet read of the
    weights relation — never the corpus explode + three aggregations the
    convenience path pays (VERDICT r7 #7)."""
    from data_engineering_capstone_project__spark.sources import (
        artifacts as art,
    )

    dg = art.corpus_digest(df, [id_col, text_col])
    if index_path is None:
        safe = dg.replace(":", "_").replace("-", "m")
        index_path = os.path.join(
            art.default_artifact_root(), f"bm25_{k1}_{b}_{safe}"
        )
    spark = df.sparkSession
    # scan committed versions NEWEST-first for one fit on this exact
    # corpus content and parameterization — not just the latest (ADVICE
    # r8: with an explicit shared index_path, alternating calls with two
    # parameterizations would otherwise refit and append a new version
    # on EVERY call even though a matching older version exists)
    from data_engineering_capstone_project__spark.sources import commitlog

    for v in reversed(commitlog.committed_versions(index_path)):
        try:
            meta = art.load_artifact_meta(index_path, v)
        except (FileNotFoundError, ValueError, OSError):
            continue
        if (
            meta.get("kind") == "bm25"
            and meta.get("corpus_digest") == dg
            and meta.get("k1") == k1
            and meta.get("b") == b
            and meta.get("id_col") == id_col
            # require the bucketed posting layout (r11): an old
            # unbucketed version at the same digest refits once
            and meta.get("n_term_buckets") == _BM25_TERM_BUCKETS
        ):
            return art.load_bm25_index(spark, index_path, version=v)
    w = bm25(df, id_col=id_col, text_col=text_col, k1=k1, b=b)
    art.save_bm25_index(
        w, index_path, id_col=id_col, k1=k1, b=b, corpus_digest=dg,
        n_term_buckets=_BM25_TERM_BUCKETS,
    )
    # serve the WRITTEN copy: downstream joins read compact parquet
    # instead of re-running the fit subtree per action
    return art.load_bm25_index(spark, index_path)


def bm25_topk(
    df: DataFrame | None,
    queries: dict[str, str] | DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    weights: DataFrame | str | None = "auto",
    query_id_col: str = "query_id",
    query_text_col: str = "text",
    index_path: str | None = None,
) -> DataFrame:
    """BM25 retrieval: the top-``k`` documents per query, scored as the
    sum of :func:`bm25` weights over the query's (unique) terms — the
    lexical-search primitive for retrieval-style decontamination
    ("which training docs best answer each benchmark question") and
    quality triage.

    Returns ``(query_id, doc_id, score, rn)``, ``rn`` = 1-based rank by
    ``(score desc, doc_id asc)`` — a total order, so results are
    deterministic and oracle-exact. Scores sum the 6-dp-rounded weights
    as ``decimal(20,6)`` (the :func:`unigram_logprob` trick): decimal
    addition is associative, so the per-(query, doc) sum is independent
    of join/partition order — the property that keeps the DuckDB oracle
    on exact equality.

    **Index pattern**: ``weights`` selects where the corpus weights come
    from — the fit-once/query-many retrieval shape, same contract as
    ``pca_topk``'s ``fitted=``:

    - ``'auto'`` (the DEFAULT, VERDICT r7 #7): reload the persisted
      digest-keyed index when one is current for this exact corpus
      content and (k1, b), else fit once, persist (atomic versioned
      artifact under ``index_path`` or
      ``artifacts.default_artifact_root()``), and serve the reloaded
      copy. Steady state pays one digest scan + a parquet read — never
      the corpus explode + three aggregations.
    - a precomputed (ideally ``persist()``-ed) :func:`bm25` DataFrame:
      caller-managed amortization; ``df``/``text_col``/``k1``/``b`` are
      ignored (``df`` may be None); the frame must carry
      ``(id_col, term, bm25)`` columns as :func:`bm25` emits them.
    - ``None``: fit per call (the convenience path — each call pays the
      corpus pass; useful for one-shot corpora not worth persisting).

    Query terms are derived by the CORPUS's own tokenization expression
    (:func:`_lower_terms`, evaluated by Spark on the query frame — not
    Python ``str.lower/split``): Java's ``\\s`` class and ``lower``
    casing differ from Python's on e.g. U+00A0 NBSP (Java keeps it
    inside a term, Python splits) and İ (U+0130), so driver-side
    tokenization could produce query terms the corpus side can never
    contain. Structural sharing makes the two sides agree by
    construction (the BPE train/tokenize parity fix, round 5 #6).

    ``queries`` is either a dict (id → query text; driver-bounded, the
    interactive form) or a **DataFrame** of ``(query_id_col,
    query_text_col)`` — the scale form for retrieval-style
    decontamination, where the query set is itself a table (every
    benchmark question, another corpus' documents, ...) and must never
    funnel through the driver.

    Scale shape: the weights relation is corpus-sized; a dict query set
    is tiny and its term frame is BROADCAST (map-side hash join — no
    corpus shuffle beyond :func:`bm25`'s own aggregations), while a
    DataFrame query set joins without a forced hint so AQE picks
    broadcast vs shuffle from its actual size. The final per-query
    top-k goes through :func:`top_k_per_group` (``WindowGroupLimit``
    map-side prune — only k rows per partition per query reach the
    exchange, never each query's full posting union).
    """
    from data_engineering_capstone_project__spark.operators.relational import (
        top_k_per_group,
    )

    if isinstance(weights, str):
        if weights != "auto":
            raise ValueError(
                f"bm25_topk: weights must be a DataFrame, 'auto', or "
                f"None — got {weights!r}"
            )
        if df is None:
            raise ValueError("bm25_topk: weights='auto' needs the corpus df")
        w = _bm25_auto_weights(df, id_col, text_col, k1, b, index_path)
    elif weights is not None:
        w = weights
    else:
        w = bm25(df, id_col=id_col, text_col=text_col, k1=k1, b=b)
    # bucketed posting layout (VERDICT r10 #7): the query terms' hash
    # buckets — recomputed with the WRITER's exact hash expression, so
    # pruning can never drop a matching term — push down as a PARTITION
    # filter: the probe lists and reads only those directories instead
    # of scanning the whole posting relation per query batch. The
    # bucket count comes from the index ARTIFACT's meta (attached by
    # load_bm25_index); a weights frame without it probes unpruned.
    ntb = getattr(w, "_bm25_n_term_buckets", None)
    bucketed = bool(ntb) and "_tb" in w.columns
    if not isinstance(queries, DataFrame):
        # dict queries are driver-bounded: tokenize + bucket them at ZERO
        # Spark jobs (inline-VALUES LocalRelation, Catalyst-evaluated —
        # see _query_terms_local) and broadcast-join a LocalRelation of
        # the pairs, whose BroadcastExchange build is also job-free. The
        # previous shape paid one LocalTableScan+Generate job per query
        # batch on the steady-state path.
        if not queries:
            raise ValueError("bm25_topk: no queries")
        triples = _query_terms_local(
            w.sparkSession, list(queries.items()), int(ntb) if bucketed else None
        )
        if not triples:
            raise ValueError("bm25_topk: no non-empty query terms")
        if bucketed:
            w = w.filter(F.col("_tb").isin(sorted({b for _, _, b in triples})))
        qterms = F.broadcast(
            _inline_rows(
                w.sparkSession,
                ["query_id", "term"],
                [(q, t) for q, t, _ in triples],
            )
        )
    else:
        qdf = queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_text_col).alias("_qtext"),
        )
        # array_distinct keeps per-query terms unique without a shuffle;
        # the empty-string slot (split of blank text) is filtered after
        # explode
        qterms = (
            qdf.select(
                "query_id",
                F.explode(
                    F.array_distinct(_lower_terms(F.col("_qtext")))
                ).alias("term"),
            )
            .filter(F.col("term") != "")
        )
        if bucketed:
            # DataFrame query set: distinct buckets from one aggregate
            # over the QUERY frame (output bounded by the bucket count,
            # never the query count), never the index
            qbucket = F.pmod(F.xxhash64("term"), F.lit(int(ntb))).cast("int")
            buckets = [
                r["_qtb"]
                for r in qterms.select(qbucket.alias("_qtb")).distinct().collect()
            ]
            w = w.filter(F.col("_tb").isin(buckets))
    scores = (
        w.join(qterms, "term")
        .groupBy("query_id", id_col)
        .agg(F.sum(F.col("bm25").cast("decimal(20,6)")).alias("score"))
    )
    return top_k_per_group(
        scores,
        ["query_id"],
        [F.col("score").desc(), F.col(id_col).asc()],
        k,
    )


def bm25_postings_with_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, dict]:
    """Raw BM25 sufficient statistics for one document batch:
    ``(id_col, term, tf, dl)`` rows plus the scalar stats dict
    (``n_docs`` including token-less docs, ``n_tok_docs``, ``sum_dl``)
    that :func:`~...sources.artifacts.save_bm25_postings` persists in
    the delta's meta. Tokenization, tf, and dl use the EXACT
    subexpressions of :func:`bm25`, so an incremental probe over the
    posting log is bit-identical to a from-scratch fit."""
    tokens = df.select(
        F.col(id_col),
        F.explode(_lower_terms(F.col(text_col))).alias("term"),
    ).filter(F.col("term") != "")
    tf = register(
        tokens.groupBy(id_col, "term").agg(F.count("*").alias("tf")).persist()
    )
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    postings = tf.join(dl, id_col).select(id_col, "term", "tf", "dl")
    n_docs = df.count()
    row = dl.agg(
        F.count("*").alias("ntd"), F.sum("dl").alias("sdl")
    ).first()
    stats = {
        "n_docs": int(n_docs),
        "n_tok_docs": int(row["ntd"] or 0),
        "sum_dl": int(row["sdl"] or 0),
    }
    return postings, stats


def bm25_topk_incremental(
    spark,
    index_path: str | list[str],
    queries: dict[str, str] | DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    query_id_col: str = "query_id",
    query_text_col: str = "text",
) -> DataFrame:
    """BM25 retrieval over an INCREMENTAL posting log (VERDICT r11 #1):
    same result contract as :func:`bm25_topk` — ``(query_id, doc_id,
    score, rn)``, rank by (score desc, doc_id asc) — but the index is
    the append-log of raw ``(doc, term, tf, dl)`` statistics that
    :func:`~...sources.artifacts.save_bm25_postings` maintains, so a
    growing corpus pays O(batch) per tick instead of the O(corpus)
    refit the digest-keyed snapshot index forces on ANY change.

    Exactness: BM25's global stats are recomputed from the log, not
    approximated — ``N``/``avgdl`` as exact integer sums over the
    per-version meta scalars (zero scans; the single double division
    is the same IEEE op :func:`bm25` performs), ``df_t`` by counting
    the pruned posting union per term (a bucket holds EVERY posting of
    every term hashing into it, so pruning never undercounts a query
    term's df). The per-row weight expression is shared with
    :func:`bm25` verbatim — probes are bit-identical to a from-scratch
    fit of the full corpus, which the ``x_bm25_topk_incremental``
    oracle gate pins.

    Scale shape: the probe plan reads ONLY the posting log — never the
    corpus (no re-tokenize; structurally asserted in
    ``tests/test_bm25_incremental.py``) — and the union scan is
    partition-pruned to the query terms' hash buckets across every
    delta version at once. df_t aggregates the pruned scan (output
    bounded by the pruned vocabulary), the query join broadcasts dict
    queries, and the final top-k rides the WindowGroupLimit map-side
    prune. Per-query-batch cost is O(postings in touched buckets),
    flat in corpus version count.

    ``index_path`` may be a LIST of posting-log paths (r12): GLOBAL
    search over a SHARDED corpus (``plans/shards.py`` — pass
    ``sharded_bm25_paths(root)``). Scalars sum across shards and df_t
    aggregates the cross-shard union, so scores are exactly what a
    single unsharded index of the union corpus would produce (shards
    are document-disjoint by the routing contract)."""
    from data_engineering_capstone_project__spark.operators.relational import (
        top_k_per_group,
    )
    from data_engineering_capstone_project__spark.sources import (
        artifacts as art,
    )

    postings, meta = art.load_bm25_postings_log(spark, index_path)
    totals = meta["totals"]
    ntb = int(meta["n_term_buckets"])
    id_col = meta["id_col"]
    if not isinstance(queries, DataFrame):
        # dict queries: job-free tokenize + bucket + broadcast relation
        # (same shape as bm25_topk — see _query_terms_local)
        if not queries:
            raise ValueError("bm25_topk_incremental: no queries")
        triples = _query_terms_local(spark, list(queries.items()), ntb)
        if not triples:
            raise ValueError("bm25_topk_incremental: no non-empty query terms")
        buckets = sorted({b for _, _, b in triples})
        qterms = F.broadcast(
            _inline_rows(
                spark, ["query_id", "term"], [(q, t) for q, t, _ in triples]
            )
        )
    else:
        qdf = queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_text_col).alias("_qtext"),
        )
        qterms = (
            qdf.select(
                "query_id",
                F.explode(
                    F.array_distinct(_lower_terms(F.col("_qtext")))
                ).alias("term"),
            )
            .filter(F.col("term") != "")
        )
        # the DataFrame path consumes qterms TWICE (bucket collect +
        # score join) — persist so an expensive or nondeterministic
        # upstream query source is evaluated once, and the joined
        # terms can never disagree with the collected buckets
        qterms = register(qterms.persist())
        qbucket = F.pmod(F.xxhash64("term"), F.lit(ntb)).cast("int")
        buckets = sorted(
            r["_qtb"]
            for r in qterms.select(qbucket.alias("_qtb")).distinct().collect()
        )
    # partition filter FIRST, df_t only over what survives: the prune
    # reaches the parquet listing of every delta version in one scan
    pruned = postings.filter(F.col("_tb").isin(buckets))
    dfreq = pruned.groupBy("term").agg(F.count("*").alias("df_t"))
    # globals from meta sums — exact longs, one constant-folded double
    # division, the same IEEE op bm25()'s scalar aggregate performs
    n_docs = F.lit(int(totals["n_docs"]))
    avgdl = (
        F.lit(int(totals["sum_dl"])).cast("double")
        / F.lit(int(totals["n_tok_docs"])).cast("double")
    )
    idf = F.log(
        (n_docs - F.col("df_t") + F.lit(0.5))
        / (F.col("df_t") + F.lit(0.5))
        + F.lit(1.0)
    )
    tf_d = F.col("tf").cast("double")
    denom = tf_d + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / avgdl
    )
    w = pruned.join(dfreq, "term").select(
        id_col,
        "term",
        pround(idf * tf_d * F.lit(k1 + 1.0) / denom, 6).alias("bm25"),
    )
    scores = (
        w.join(qterms, "term")
        .groupBy("query_id", id_col)
        .agg(F.sum(F.col("bm25").cast("decimal(20,6)")).alias("score"))
    )
    return top_k_per_group(
        scores,
        ["query_id"],
        [F.col("score").desc(), F.col(id_col).asc()],
        k,
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k0: int = 60,
    k: int = 10,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR'09): combine per-query
    rankings from heterogeneous retrievers — e.g. lexical BM25
    (:func:`bm25_topk`) and embedding ANN (``cosine_topk_many`` /
    ``pca_topk_many``) — into one hybrid ranking by
    ``rrf(d) = Σ_sources 1/(k0 + rank_source(d))``. The standard hybrid
    retrieval shape for decontamination and quality triage: lexical
    catches verbatim/term overlap the embedding space smooths over,
    embeddings catch paraphrases lexical misses, and RRF needs no score
    calibration between them (ranks only).

    Each input frame carries ``(query_id_col, id_col, rank_col)`` (extra
    columns ignored); a document absent from a source simply contributes
    nothing. Returns ``(query_id, doc_id, rrf, rank)``.

    Determinism/oracle parity: each contribution is rounded to 6 dp and
    summed as ``decimal(20,6)`` (associative — partition/union order
    can't change the sum; the :func:`bm25_topk` trick), and the final
    rank is a total order (rrf desc, id asc). Scale shape: sources
    union map-side (already top-k-sized per query — k·|queries| rows
    each, never corpus-sized), one hash aggregation on
    (query, doc), per-query top-k through the WindowGroupLimit prune.
    """
    from functools import reduce

    from data_engineering_capstone_project__spark.operators.relational import (
        top_k_per_group,
    )

    if not rankings:
        raise ValueError("rrf_fuse: no rankings")
    contribs = [
        r.select(
            F.col(query_id_col),
            F.col(id_col),
            pround(
                F.lit(1.0) / (F.lit(float(k0)) + F.col(rank_col).cast("double")),
                6,
            )
            .cast("decimal(20,6)")
            .alias("_c"),
        )
        for r in rankings
    ]
    union = reduce(lambda a, b: a.unionByName(b), contribs)
    scores = union.groupBy(query_id_col, id_col).agg(F.sum("_c").alias("rrf"))
    return top_k_per_group(
        scores,
        [query_id_col],
        [F.col("rrf").desc(), F.col(id_col).asc()],
        k=k,
        rank_col="rank",
        total_order=True,
    )


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document average unigram log-probability under the corpus's own
    unigram model — the classic cheap perplexity proxy for quality
    filtering (a doc of globally-rare tokens scores low/negative-large;
    formulaic boilerplate scores high).

    Returns (id, n_tokens, avg_logprob) with
    ``avg_logprob = Σ_t tf_t·ln(ct_t / T) / Σ_t tf_t`` where ``ct`` is the
    corpus count of term t and ``T`` the total token count.

    Same scale shape as ``tf_idf``: one explode, tf by hash aggregation
    (persisted — feeds both the corpus-count branch and the join), corpus
    counts as an aggregate + join-back (map-side partials absorb stopword
    skew; never a per-term window). Per-(doc,term) contributions are cast
    to decimal(20,6) BEFORE the per-doc sum so the aggregation is exact
    and order-independent — the property that lets the DuckDB oracle
    match bit-for-bit.
    """
    tokens = df.select(
        F.col(id_col),
        F.explode(_lower_terms(F.col(text_col))).alias("term"),
    ).filter(F.col("term") != "")
    tf = register(
        tokens.groupBy(id_col, "term").agg(F.count("*").alias("tf")).persist()
    )
    ct = tf.groupBy("term").agg(F.sum("tf").alias("ct"))
    total = ct.agg(F.sum("ct").alias("_T"))
    contrib = (
        F.col("tf") * F.log(F.col("ct").cast("double") / F.col("_T"))
    ).cast("decimal(20,6)")
    return (
        tf.join(ct, "term")
        .join(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(contrib).alias("_sum_lp"),
        )
        .select(
            id_col,
            "n_tokens",
            pround(
                F.col("_sum_lp").cast("double") / F.col("n_tokens"), 6
            ).alias("avg_logprob"),
        )
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document average bigram log-probability under the corpus's own
    bigram model — one order up from :func:`unigram_logprob`'s perplexity
    proxy, and a materially sharper quality signal: a doc of common words
    in UNCOMMON order (word salad, shuffled boilerplate, keyword
    stuffing) scores high under unigrams but low here.

    Returns ``(id, n_bigrams, avg_logprob)`` with
    ``avg_logprob = Σ ln(c₂(w₁,w₂) / c₁(w₁)) / n_bigrams`` over the
    doc's positional bigrams, where ``c₂`` is the corpus count of the
    bigram and ``c₁`` the corpus count of ``w₁`` as a bigram LEFT (i.e.
    a proper conditional: Σ_w₂ P(w₂|w₁) = 1). Documents with fewer than
    two tokens have no bigrams and do not appear.

    Scale shape: ONE ``posexplode`` and ONE window ``lead`` partitioned
    by document (each partition is a single doc's tokens — bounded by
    document length, skew-free by construction) produce the positional
    bigram relation; everything after is hash aggregation + join-back,
    the same skew-safe shape as :func:`tf_idf` (a hot bigram collapses
    map-side before any shuffle). The per-(doc, w₁, w₂) contributions
    are cast to decimal(20,6) before the per-doc sum so the aggregation
    is exact and order-independent — the DuckDB oracle matches
    bit-for-bit.
    """
    toks = df.select(
        F.col(id_col),
        F.posexplode(
            F.filter(_lower_terms(F.col(text_col)), lambda t: t != "")
        ).alias("pos", "w1"),
    )
    nxt = Window.partitionBy(id_col).orderBy("pos")
    bigrams = register(
        toks.withColumn("w2", F.lead("w1").over(nxt))
        .filter(F.col("w2").isNotNull())
        .groupBy(id_col, "w1", "w2")
        .agg(F.count("*").alias("tf"))
        .persist()  # feeds the two corpus-count branches AND the join-back
    )
    c2 = bigrams.groupBy("w1", "w2").agg(F.sum("tf").alias("c2"))
    c1 = bigrams.groupBy("w1").agg(F.sum("tf").alias("c1"))
    contrib = (
        F.col("tf") * F.log(F.col("c2").cast("double") / F.col("c1"))
    ).cast("decimal(20,6)")
    return (
        bigrams.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_bigrams"),
            F.sum(contrib).alias("_sum_lp"),
        )
        .select(
            id_col,
            "n_bigrams",
            pround(
                F.col("_sum_lp").cast("double") / F.col("n_bigrams"), 6
            ).alias("avg_logprob"),
        )
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 512,
    num_streams: int | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing for LLM training: documents are
    laid end-to-end in id order within ``num_streams`` independent streams
    (``id % num_streams``); each doc's pack is the budget-window its first
    token lands in.

    Returns (id, n_tokens, stream, pack_bin). One window per stream —
    parallel across streams with no global sort, so throughput scales with
    the stream count, not corpus size. ``num_streams=None`` derives the
    count from cluster parallelism (4× ``defaultParallelism``, floor 32)
    so window parallelism grows with the cluster instead of capping at a
    constant — at 100 TB a fixed 32 streams would make each stream a
    multi-TB single-task running sum. NOTE: the stream count is part of
    the deterministic output contract (it changes ``stream`` and
    ``pack_bin`` assignment) — pass it explicitly when results must be
    reproducible across differently-sized clusters.
    """
    if num_streams is None:
        num_streams = max(32, df.sparkSession.sparkContext.defaultParallelism * 4)
    w = (
        Window.partitionBy("_stream")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = df.select(
        F.col(id_col),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
        (F.col(id_col) % num_streams).alias("stream"),
    ).withColumn("_stream", F.col("stream"))
    return base.select(
        id_col,
        "n_tokens",
        "stream",
        F.floor(
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / F.lit(budget)
        ).cast("long").alias("pack_bin"),
    )


# PII patterns shared by mask_pii and its DuckDB oracle. Every construct
# here is in the COMMON subset of Java regex and RE2 (no lookaround, no
# backrefs; ASCII \d; \b word boundaries; whitespace spelled as the
# explicit ASCII class rather than \s, whose membership differs between
# the two engines on \x0b) — so the oracle can run the *identical*
# pattern strings and parity holds by construction.
#
# ORDER MATTERS: IP/SSN/card shapes are digit runs with separators, i.e.
# substrings the greedy PHONE pattern would swallow — the chain masks
# the more specific shapes first, phone last.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # full 8-group IPv6, or any '::'-compressed form with >=1 leading group
    (
        r"\b(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}\b"
        r"|\b(?:[0-9A-Fa-f]{1,4}:)+:(?:[0-9A-Fa-f]{1,4}(?::[0-9A-Fa-f]{1,4})*)?\b",
        "<IP>",
    ),
    # dotted-quad (conservative: masks 999.x too — over-masking is the
    # safe direction for a training-data scrubber)
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    # SSN-shaped ids: the fixed 3-2-4 hyphenation
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    # 13-16 digit payment-card shapes, optional space/dash group separators
    (r"\b\d{4}[ -]?\d{4}[ -]?\d{4}[ -]?\d{1,4}\b", "<CARD>"),
    (r"\+?\d[\d\t\n\x0b\f\r ().-]{6,}\d", "<PHONE>"),
]


def mask_pii(text: Column) -> Column:
    """Redact common PII shapes before training: emails, IPv4/IPv6
    addresses, SSN-shaped ids, payment-card numbers, and phone-like digit
    runs — one pure ``regexp_replace`` chain over :data:`PII_PATTERNS`
    (codegen'd, no Python, no extra scan per class)."""
    out = text
    for pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def repetition_score_of_words(words: Column, ngram_words: int = 3) -> Column:
    """Within-document repetition from an ALREADY-SPLIT word-array column
    reference: 1 - distinct/total word n-grams (the Gopher-style
    repetition signal; high = boilerplate/spam). NULL when the doc has
    fewer than ``ngram_words`` words.

    ``words`` must be a pre-projected attribute, not an inline ``split``:
    the transform lambda references it per n-gram, and Catalyst inlines
    expressions into lambda bodies — an inline split would re-tokenize
    the whole document once per ELEMENT (measured 7-40× slower).
    """
    n = F.size(words)
    total = n - (ngram_words - 1)
    idx = F.sequence(F.lit(0), F.greatest(total - 1, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, ngram_words))
    )
    return F.when(
        total >= 1,
        1.0 - F.size(F.array_distinct(grams)) / total.cast("double"),
    )


def repetition_score(text: Column, ngram_words: int = 3) -> Column:
    """Convenience form over raw text (tokenizes inline — fine for tests
    and small data; hot paths pre-project the split array and call
    ``repetition_score_of_words``)."""
    return repetition_score_of_words(
        F.split(F.lower(F.trim(text)), _WORD_RE), ngram_words
    )


def strip_boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_frac: float = 0.05,
    min_docs: int = 3,
) -> DataFrame:
    """Line-level boilerplate removal (CCNet-style): drop lines that occur
    in more than ``max_doc_frac`` of documents (and at least ``min_docs``),
    then reassemble each document from its surviving lines in order.

    Two shuffles: line-hash document frequency, then the per-doc
    reassembly groupBy. The line-frequency table is the small side
    (distinct lines) and broadcasts back onto the exploded lines. Fully
    lazy: the document-count cutoff joins in as a broadcast 1-row
    aggregate rather than an eager driver ``count()`` at plan-build time
    (plans compose without triggering jobs; the count scan is
    column-pruned to parquet footers when collected).
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), r"\n")).alias("_ln", "_line"),
    )
    norm = F.trim(F.col("_line"))
    lines = lines.withColumn("_key", norm).filter(F.length("_key") > 0)
    n_docs = df.agg(F.count("*").alias("_n_docs"))
    cutoff = F.greatest(
        F.floor(F.col("_n_docs") * F.lit(max_doc_frac)), F.lit(min_docs)
    )
    hot = (
        lines.groupBy("_key")
        .agg(F.count_distinct(id_col).alias("_df"))
        .join(F.broadcast(n_docs))
        .filter(F.col("_df") >= cutoff)
        .select("_key")
    )
    kept = lines.join(F.broadcast(hot), "_key", "left_anti")
    return kept.groupBy(id_col).agg(
        F.concat_ws(
            "\n", F.transform(F.array_sort(F.collect_list(F.struct("_ln", "_line"))), lambda s: s["_line"])
        ).alias(text_col)
    )


def length_bucket_batches(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_width: int = 64,
    batch_size: int = 32,
    num_streams: int | None = None,
) -> DataFrame:
    """Padding-efficient inference batching: documents are grouped into
    token-length buckets (pad-to ``bucket_width`` multiples), and inside a
    (bucket, stream) they are packed into fixed-size batches in id order.
    Returns one row per batch: (bucket, stream, batch_id, n_docs,
    max_tokens, sum_tokens, padding_frac) where ``padding_frac`` is the
    fraction of a pad-to-bucket collator's slots wasted on padding —
    the number you tune ``bucket_width`` against.

    Scale shape: the only shuffle is the window partition on
    (bucket, stream); streams split each bucket so parallelism scales
    with the cluster instead of the bucket count (same contract as
    ``pack_sequences`` — the stream count changes batch assignment, so
    pass it explicitly for cross-cluster reproducibility). The batch
    numbering is a running row_number per (bucket, stream), never a
    global sort.
    """
    if num_streams is None:
        num_streams = max(32, df.sparkSession.sparkContext.defaultParallelism * 4)
    base = df.select(
        F.col(id_col),
        token_count(F.col(text_col)).cast("long").alias("_nt"),
    ).filter(F.col("_nt") > 0)
    bucket = (
        (F.floor((F.col("_nt") - 1) / bucket_width) + 1) * bucket_width
    ).cast("long")
    base = base.select(
        id_col,
        "_nt",
        bucket.alias("bucket"),
        (F.col(id_col) % num_streams).cast("long").alias("stream"),
    )
    w = Window.partitionBy("bucket", "stream").orderBy(id_col)
    batched = base.withColumn(
        "batch_id",
        F.floor((F.row_number().over(w) - 1) / batch_size).cast("long"),
    )
    return (
        batched.groupBy("bucket", "stream", "batch_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.max("_nt").alias("max_tokens"),
            F.sum("_nt").alias("sum_tokens"),
        )
        .select(
            "bucket",
            "stream",
            "batch_id",
            "n_docs",
            "max_tokens",
            "sum_tokens",
            pround(
                F.lit(1.0)
                - F.col("sum_tokens") / (F.col("n_docs") * F.col("bucket")),
                6,
            ).alias("padding_frac"),
        )
    )


def hashed_linear_score(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_col: str = "bucket",
    weight_col: str = "w",
    bias: float = 0.0,
    sigmoid: bool = True,
) -> DataFrame:
    """Hashed bag-of-words linear classifier scoring (the fastText-style
    quality-filter shape): each token hashes into one of 256 buckets (first
    two hex chars of md5), bucket weights join in from a broadcast weights
    table, and each document scores
    ``sigmoid(bias + sum(w)/n_tokens)``. Returns (id, n_tokens, score).

    This is model inference as a relational plan: the model artifact is a
    256-row DataFrame, application is one explode + one broadcast join +
    one aggregation — no Python, no per-row UDF, at 100 TB exactly as
    parallel as the scan. Tokens missing from the weights table contribute
    weight 0 (hash-bucket models are total, but a pruned/sparse weight
    table still scores). Per-token contributions are summed as
    decimal(20,6) so the aggregation is exact and order-independent
    (bit-identical across engines); the sigmoid runs once per document on
    the aggregated sum. ``sigmoid=False`` returns the raw logit instead —
    the sigmoid is monotone, so thresholding on the logit is equivalent
    and stays bit-exact cross-engine (no ``exp`` in the comparison path).
    """
    toks = df.select(
        F.col(id_col),
        F.explode(_lower_terms(F.col(text_col))).alias(
            "term"
        ),
    ).filter(F.col("term") != "")
    bucketed = toks.withColumn("_b", F.substring(F.md5(F.col("term")), 1, 2))
    joined = bucketed.join(
        F.broadcast(
            weights.select(
                F.col(bucket_col).alias("_b"),
                F.col(weight_col).cast("decimal(20,6)").alias("_w"),
            )
        ),
        "_b",
        "left",
    )
    agg = joined.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.coalesce(F.col("_w"), F.lit(0).cast("decimal(20,6)"))).alias(
            "_sw"
        ),
    )
    z = F.lit(float(bias)) + F.col("_sw").cast("double") / F.col("n_tokens")
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) if sigmoid else z
    return agg.select(id_col, "n_tokens", pround(score, 6).alias("score"))


# ------------------------------------------------------------------ DSIR


def hashed_ngram_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 8192,
    salt: str = "dsir",
) -> DataFrame:
    """Hashed bag-of-n-grams featurization (the DSIR feature map, Xie et
    al. 2023, "Data Selection for Language Models via Importance
    Resampling"): one output row per word UNIGRAM and BIGRAM occurrence,
    ``(id, bucket)`` with ``bucket = h(gram) mod n_buckets``.

    Tokenization is the engine's one lexical expression
    (:func:`_lower_terms` — structural sharing keeps every consumer
    parity-identical); bigrams are built from the SAME token array via
    an indexed ``transform`` (array-level, no second split). The hash is
    the engine's portable uniform (first 52 bits of ``md5(gram|salt)``,
    the ``weighted_sample_by_hash`` idiom) — deterministic across runs,
    engines, and task retries, and exactly replicable in ANSI SQL, so
    the downstream importance weights are oracle-checkable end-to-end.

    100 TB: pure codegen (split/transform/explode/md5) — rows out are
    ~2× token count; no shuffle until the consumer aggregates.
    """
    toks = F.filter(_lower_terms(F.col(text_col)), lambda t: t != F.lit(""))
    d = df.select(F.col(id_col), toks.alias("_ts"))
    bigrams = F.filter(
        F.transform(
            F.col("_ts"),
            lambda t, i: F.when(
                i < F.size(F.col("_ts")) - 1,
                F.concat_ws(" ", t, F.element_at(F.col("_ts"), i + F.lit(2))),
            ),
        ),
        lambda g: g.isNotNull(),
    )
    grams = d.select(
        F.col(id_col), F.explode(F.concat(F.col("_ts"), bigrams)).alias("_g")
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat_ws("|", F.col("_g"), F.lit(salt))), 1, 13),
            16,
            10,
        ).cast("long")
        % F.lit(n_buckets)
    )
    return grams.select(F.col(id_col), bucket.alias("bucket"))


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 8192,
    alpha: float = 1.0,
    salt: str = "dsir",
) -> DataFrame:
    """DSIR importance log-weights: score every ``raw`` document by how
    much more likely its hashed n-gram bag is under the TARGET
    distribution than under the raw distribution —
    ``logw(doc) = Σ_g [ln p_target(bucket(g)) − ln p_raw(bucket(g))]``
    with add-``alpha`` smoothing over the ``n_buckets`` domain. The
    standard recipe for steering a crawl-scale corpus toward a
    high-quality target domain without training a classifier.

    Returns ``(id, n_grams, logw)`` — one row per raw doc with ≥1 gram.

    Plan shape at 100 TB: two linear featurization passes; the bucket
    count tables aggregate to ≤ ``n_buckets`` rows each and their
    log-ratio JOIN TABLE is broadcast (8192 rows — never a shuffle on
    the corpus side); the only corpus-sized shuffle is the per-doc sum,
    keyed by ``id_col`` with map-side partial aggregation. Nothing is
    ever collected to the driver.
    """
    # the raw gram stream feeds BOTH the bucket-count branch and the
    # per-doc sum: persist so the corpus featurization pass (scan +
    # split + explode + md5) runs once, not twice — (long, long) rows,
    # ~2× token count, the same compact-relation persist bm25's tf uses
    raw_grams = register(
        hashed_ngram_buckets(raw, id_col, text_col, n_buckets, salt).persist()
    )
    ratio = dsir_fit(
        raw, target, id_col, text_col, n_buckets, alpha, salt,
        raw_grams=raw_grams,
    )
    return dsir_score(
        raw, ratio, id_col, text_col, n_buckets, salt, grams=raw_grams
    )


def dsir_fit(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 8192,
    alpha: float = 1.0,
    salt: str = "dsir",
    raw_grams: DataFrame | None = None,
) -> DataFrame:
    """Fit the DSIR MODEL: the ``(bucket, _lr)`` log-ratio table —
    ``ln p_target(b) − ln p_raw(b)`` with add-``alpha`` smoothing over
    the ``n_buckets`` domain, from one featurization pass over each
    corpus. Exactly ``n_buckets`` rows — the table is DENSE over the
    bucket domain (smoothing defines a value for zero-count buckets,
    ``ln((tq+αB)/(tt+αB))``), so a later scoring pass never drops a
    document whose grams land in buckets unseen at fit time: every
    out-of-vocabulary gram contributes the smoothed prior instead of
    silently vanishing from the inner join (ADVICE r7). Still THE
    fit-once artifact of data selection (persist via
    ``sources.artifacts.save_dsir_model``; a 100 TB scoring pass
    reloads it and never re-reads the target).
    ``raw_grams`` lets a caller share an already-persisted gram stream
    (``dsir_log_weights`` does, so its fit+score runs one raw pass)."""
    if raw_grams is None:
        raw_grams = hashed_ngram_buckets(
            raw, id_col, text_col, n_buckets, salt
        )
    tgt_grams = hashed_ngram_buckets(target, id_col, text_col, n_buckets, salt)
    # the bucket-count tables feed TWO consumers each (the ratio join
    # and their own total scalar) and Spark shares no subplans across
    # branches — unpersisted, the TARGET corpus would be featurized
    # (scan + split + explode + md5 + agg) twice per fit (optimization
    # r15, plan-audited: two full target subtrees in the physical
    # plan). They are ≤ n_buckets rows, the cheapest possible persist;
    # the corpus-sized gram streams are never cached here.
    raw_cnt = register(
        raw_grams.groupBy("bucket").agg(F.count("*").alias("_cq")).persist()
    )
    tgt_cnt = register(
        tgt_grams.groupBy("bucket").agg(F.count("*").alias("_ct")).persist()
    )
    # raw totals/target totals as 1-row broadcast scalars (house style)
    tq = raw_cnt.agg(F.sum("_cq").alias("_tq"))
    tt = tgt_cnt.agg(F.sum("_ct").alias("_tt"))
    a = F.lit(float(alpha))
    ab = F.lit(float(alpha) * n_buckets)
    # dense bucket domain: n_buckets rows regardless of which buckets
    # either corpus populated — values for populated buckets are
    # unchanged vs the sparse join (coalesce(_c*, 0) is exactly the
    # zero-count smoothing term)
    domain = raw.sparkSession.range(n_buckets).select(
        F.col("id").alias("bucket")
    )
    return (
        domain.join(raw_cnt, "bucket", "left_outer")
        .join(tgt_cnt, "bucket", "left_outer")
        .crossJoin(F.broadcast(tq))
        .crossJoin(F.broadcast(tt))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("_ct"), F.lit(0)).cast("double") + a)
                    / (F.col("_tt").cast("double") + ab)
                )
                - F.log(
                    (F.coalesce(F.col("_cq"), F.lit(0)).cast("double") + a)
                    / (F.col("_tq").cast("double") + ab)
                )
            ).alias("_lr"),
        )
    )


def dsir_score(
    df: DataFrame,
    ratio: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 8192,
    salt: str = "dsir",
    grams: DataFrame | None = None,
) -> DataFrame:
    """Score ANY document frame against a fitted DSIR model (the
    ``(bucket, _lr)`` table from :func:`dsir_fit`, possibly reloaded
    from the artifact store): ``(id, n_grams, logw)`` per doc with ≥1
    gram. The featurization MUST use the model's ``n_buckets``/``salt``
    (persisted with it). One featurization pass + a broadcast join +
    one doc-keyed shuffle — the 100 TB scoring shape. The model table
    is DENSE over the bucket domain (:func:`dsir_fit`), so every gram
    joins: out-of-vocabulary grams contribute the smoothed prior
    log-ratio and a doc made entirely of unseen grams is still scored
    (it is never silently dropped from the output)."""
    if grams is None:
        grams = hashed_ngram_buckets(df, id_col, text_col, n_buckets, salt)
    return (
        grams.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_grams"), F.sum("_lr").alias("logw"))
    )


def dsir_resample(
    raw: DataFrame,
    target: DataFrame | None,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 8192,
    alpha: float = 1.0,
    salt: str = "dsir",
    gumbel: bool = True,
    noise_salt: str = "g1",
    ratio: DataFrame | None = None,
) -> DataFrame:
    """DSIR importance RESAMPLING: select ``k`` raw documents via
    Gumbel-top-k over the importance log-weights — sampling without
    replacement with inclusion probability ∝ importance weight, i.e.
    the resampling half of Xie et al.'s recipe (``gumbel=False``
    degenerates to deterministic top-k by weight, the "hard selection"
    variant).

    The Gumbel noise is hash-derived, not ``rand()``: ``−ln(−ln u)``
    with ``u`` the dyadic 52-bit md5 uniform of ``(id, noise_salt)`` —
    reproducible across runs, engines, and Spark task retries, and
    replicable in the DuckDB oracle. A different ``noise_salt`` is a
    fresh independent draw.

    Returns ``(id, n_grams, logw, key)`` for the selected docs; join
    back on ``id_col`` (broadcast — k rows) for the full documents.
    Top-k plans as ``TakeOrderedAndProject``: per-partition partial
    top-k, k-row merge — never a global sort.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if ratio is not None:
        # fitted-model path (``ratio`` from dsir_fit / load_dsir_model):
        # zero target passes — the production steady state
        lw = dsir_score(raw, ratio, id_col, text_col, n_buckets, salt)
    elif target is None:
        raise ValueError("dsir_resample: need target or ratio")
    else:
        lw = dsir_log_weights(
            raw, target, id_col, text_col, n_buckets, alpha, salt
        )
    if gumbel:
        v = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.col(id_col).cast("string"), F.lit(noise_salt)
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("long")
        u = (v.cast("double") + F.lit(0.5)) / F.lit(float(1 << 52))
        key = F.col("logw") + (-F.log(-F.log(u)))
    else:
        key = F.col("logw")
    return (
        lw.withColumn("key", key)
        .orderBy(F.col("key").desc(), F.col(id_col).asc())
        .limit(k)
    )
