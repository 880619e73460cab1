"""Distributed BPE tokenizer training (north-star extension; no analogue
in the reference — SURVEY.md §2.7 covers only REPLACE/CONCAT/CASE string
ops).

The scalable shape mirrors production subword trainers (HuggingFace
tokenizers, SentencePiece in word-count mode): the CORPUS-SIZED pass is a
single word-frequency aggregation (one shuffle, map-side combine); the
merge loop itself runs driver-side over the word-frequency table, whose
size is bounded by the VOCABULARY (≈10⁵-10⁶ rows at web scale), not the
corpus. A 100 TB corpus and a 100 GB corpus with the same vocabulary train
in the same driver time after the one counting pass.

Tokenization (``bpe_tokenize``) applies the learned merges per word — an
inherently iterative, data-dependent loop that Spark's built-in
expressions cannot express, so it is an Arrow-batched ``pandas_udf`` with
a per-batch word cache (each DISTINCT word is merged once per batch, then
dict-mapped — on natural text the cache hit rate is the Zipf mass of the
head vocabulary).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END = "</w>"  # end-of-word sentinel symbol (GPT-2 / original BPE paper)


def _words(text: Column) -> Column:
    """lower → trim → whitespace split, empties dropped — the exact
    normalization the DuckDB oracle mirrors."""
    return F.filter(
        F.split(F.lower(F.trim(text)), r"\s+"), lambda w: w != F.lit("")
    )


def word_frequencies(
    df: DataFrame,
    text_col: str = "text",
    min_freq: int = 2,
    max_words: int | None = 1_000_000,
) -> DataFrame:
    """``(word, freq)`` — the one corpus-sized pass. Explode is
    codegen-side; the aggregation gets map-side partials, so the shuffle
    carries at most (partitions × distinct-words) rows. ``max_words``
    caps the driver-side table by TOP frequency (deterministic word
    tie-break) — a bound, not a sample: dropping the Zipf tail below
    rank 10⁶ is what production trainers do. ``None`` keeps every word
    ≥ ``min_freq`` (and skips the global sort the cap needs) — use it
    when a SQL oracle defines the quantity uncapped (ADVICE r10)."""
    wf = (
        df.select(F.explode(_words(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .filter(F.col("freq") >= min_freq)
    )
    if max_words is None:
        return wf
    return wf.orderBy(F.col("freq").desc(), "word").limit(max_words)


def train_merges_from_counts(
    word_freq: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE merge loop (Sennrich et al. 2016) over a word-frequency
    table, driver-side. Deterministic: the best pair is max by (count,
    then lexicographically smallest pair). Returns ordered merges."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, f in word_freq:
        vocab[tuple(w) + (END,)] = vocab.get(tuple(w) + (END,), 0) + f
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for sym, f in vocab.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < 2:
            break  # nothing left worth merging
        merges.append(best)
        joined = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, f in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if (
                    i < len(sym) - 1
                    and sym[i] == best[0]
                    and sym[i + 1] == best[1]
                ):
                    out.append(joined)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + f
        vocab = new_vocab
    return merges


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    min_freq: int = 2,
    max_words: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Train BPE merges: one distributed word-count pass, then the
    driver-side merge loop on the bounded frequency table."""
    wf = [
        (r["word"], r["freq"])
        for r in word_frequencies(df, text_col, min_freq, max_words).collect()
    ]
    return train_merges_from_counts(wf, n_merges)


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = list(word) + [END]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i < 0:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


# driver/executor budget for the broadcast word→tokens dict (ADVICE r10:
# a row-count ceiling ignores that every CPython dict entry is a str key
# + a list of str pieces — hundreds of bytes of object overhead each, so
# 2M rows could be multiple GB). The gate below estimates actual bytes:
# ~320 B fixed per entry (dict slot + key str + value list headers) plus
# ~6 B per word character (key chars + the pieces partition the word and
# each piece str repeats the ~49 B str header, amortized into the
# per-char factor for typical 3-6 char pieces).
_BROADCAST_TABLE_MAX_BYTES = 256 * 2**20
_ENTRY_FIXED_BYTES = 320
_PER_CHAR_BYTES = 6


def _vocab_fits_broadcast(
    vocab_df: DataFrame,
    word_col: str,
    max_words: int,
    max_bytes: int = _BROADCAST_TABLE_MAX_BYTES,
) -> bool:
    """One map-combined aggregate over the distinct-word frame deciding
    whether the word→tokens lookup table may be collected + broadcast:
    BOTH the row-count ceiling and the estimated-byte ceiling must hold
    (count alone undercounts CPython object overhead; bytes alone could
    admit a pathological number of 1-char entries)."""
    n, chars = vocab_df.agg(
        F.count("*"), F.coalesce(F.sum(F.length(word_col)), F.lit(0))
    ).collect()[0]
    est = n * _ENTRY_FIXED_BYTES + chars * _PER_CHAR_BYTES
    return n <= max_words and est <= max_bytes


def bpe_tokenize(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "tokens",
    distinct_words: bool = False,
    max_broadcast_words: int = 500_000,
) -> DataFrame:
    """Subword tokens per document under trained merges, as an
    ``array<string>`` column. Arrow-batched ``pandas_udf`` (the merge
    application is an irreducible data-dependent loop — the documented
    exception to the no-Python rule) with a per-batch distinct-word
    cache; merges ship in the closure (a few KB — the model, not data).

    Normalization parity is STRUCTURAL: the UDF receives the word array
    produced by the SAME Spark expression the trainer uses (``_words`` —
    Java ``lower``/``trim``/ASCII-``\\s`` split), so no Python-side
    lower/split can ever disagree with training. Earlier versions
    lowered and split in Python and had to hand-match Java semantics —
    Python ``str.split()`` splits NBSP/NEL that Java ``\\s`` doesn't,
    and ``str.lower()`` disagrees with Java ``toLowerCase`` on
    locale-sensitive code points (e.g. ``İ`` U+0130 maps to ``i̇``
    two-codepoint in both, but Unicode-version skew between the JVM and
    CPython tables can still diverge on rare scripts). Feeding the UDF
    Java-normalized words removes the entire mismatch class
    (regression-tested with İ/NBSP corpora in ``test_bpe.py``).

    ``distinct_words=True`` (VERDICT r9 #6) makes the Python merge loop
    ZIPF-BOUNDED instead of token-bounded: the per-batch cache still
    re-encodes every head word once per Arrow batch (up to
    partitions × batches times cluster-wide), so the one Python loop in
    the engine scales with corpus tokens. The distinct path aggregates
    the corpus's DISTINCT word frame (one map-combined shuffle, output
    = vocabulary), encodes each word exactly once (distributed, the
    same ``pandas_udf`` kernel), and ships the word→tokens table back
    as a broadcast for a pure dict-lookup tokenization pass — Python
    merge-loop work is then O(vocabulary), independent of corpus size.
    Gated by the ACTUAL vocabulary count AND an estimated BYTE size of
    the lookup table (``_vocab_fits_broadcast`` — CPython dict entries
    cost hundreds of bytes each, so row count alone under-measures the
    driver/executor footprint); above either ceiling it falls back to
    the per-batch cache, which needs no driver-side state at any scale.
    Output identical in both modes (parity unit in ``test_bpe.py``).
    """
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    if distinct_words:
        vocab_df = (
            df.select(F.explode(_words(F.col(text_col))).alias("word"))
            .distinct()
        )
        if _vocab_fits_broadcast(vocab_df, "word", max_broadcast_words):

            @F.pandas_udf("array<string>")
            def _enc(words):  # type: ignore[no-untyped-def]
                import pandas as pd

                return pd.Series([_encode_word(w, ranks) for w in words])

            table = {
                r["word"]: list(r["toks"])
                for r in vocab_df.select(
                    "word", _enc("word").alias("toks")
                ).collect()
            }
            bc = df.sparkSession.sparkContext.broadcast(table)

            @F.pandas_udf("array<string>")
            def _tok_lookup(word_arrays):  # type: ignore[no-untyped-def]
                import pandas as pd

                t = bc.value

                def enc(words):
                    if words is None:
                        return []
                    out: list[str] = []
                    for w in words:
                        toks = t.get(w)
                        if toks is None:
                            # unreachable for a deterministic df (same
                            # _words expression built the table), kept
                            # as a correctness net for re-read sources
                            toks = _encode_word(w, ranks)
                        out.extend(toks)
                    return out

                return pd.Series([enc(a) for a in word_arrays])

            return df.withColumn(
                out_col, _tok_lookup(_words(F.col(text_col)))
            )
        # vocabulary too large to broadcast: per-batch cache below

    @F.pandas_udf("array<string>")
    def _tok(word_arrays):  # type: ignore[no-untyped-def]
        import pandas as pd

        cache: dict[str, list[str]] = {}

        def enc(words):
            if words is None:
                return []
            out: list[str] = []
            for w in words:
                toks = cache.get(w)
                if toks is None:
                    toks = _encode_word(w, ranks)
                    cache[w] = toks
                out.extend(toks)
            return out

        return pd.Series([enc(a) for a in word_arrays])

    return df.withColumn(out_col, _tok(_words(F.col(text_col))))
