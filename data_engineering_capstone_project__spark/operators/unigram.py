"""Distributed unigram-LM tokenizer training (north-star extension; the
second member of the tokenizer family next to ``operators/bpe.py`` — the
reference has no tokenizers at all, SURVEY.md §2.7 covers only
REPLACE/CONCAT/CASE string ops).

Same production-trainer decomposition as BPE (SentencePiece's word-count
mode, Kudo 2018): the ONLY corpus-sized pass is the word-frequency
aggregation (one shuffle, map-side combine); seeding, EM, and pruning run
driver-side over the VOCABULARY-bounded frequency table — a 100 TB corpus
and a 100 GB corpus with the same vocabulary train in the same driver
time after the counting pass.

Determinism contract (the whole repo's tokenizer rule): hard-EM (Viterbi
counts, not forward-backward expectations) over sorted structures with
explicit tie-breaks, so the trained vocabulary is BIT-stable for a given
word-frequency table — retrains, resumed jobs, and fresh sessions agree.
Tokenization is a Viterbi best-segmentation per word: pieces concatenate
back to the exact word (lossless — no sentinel), with single characters
permanently in the vocabulary so every word of the training alphabet
segments; characters never seen in training fall back to single-char
pieces at a floor score (never an error, still lossless).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_engineering_capstone_project__spark.operators.bpe import (
    _vocab_fits_broadcast,
    _words,
    word_frequencies,
)

# score assigned to out-of-alphabet single characters at tokenize time:
# below every trained logprob, so known pieces always win, but finite so
# unknown text still segments losslessly
_UNK_PENALTY = -100.0


def _viterbi(word: str, logp: dict[str, float], max_piece_len: int) -> list[str]:
    """Best segmentation of ``word`` under piece logprobs: maximize the
    sum of piece scores (ties broken toward FEWER pieces, then toward
    the lexicographically smaller piece sequence — explicit, so equal-
    probability paths pick the same segmentation everywhere)."""
    n = len(word)
    # dp[i] = (score, -npieces, pieces_tuple) best for word[:i]
    NEG = float("-inf")
    dp: list[tuple[float, int, tuple[str, ...]]] = [(NEG, 0, ())] * (n + 1)
    dp[0] = (0.0, 0, ())
    for i in range(1, n + 1):
        best = (NEG, 0, ())
        for l in range(1, min(max_piece_len, i) + 1):
            piece = word[i - l : i]
            s = logp.get(piece)
            if s is None:
                if l == 1:
                    s = _UNK_PENALTY  # lossless fallback for unseen chars
                else:
                    continue
            prev = dp[i - l]
            if prev[0] == NEG:
                continue
            cand = (prev[0] + s, prev[1] - 1, prev[2] + (piece,))
            if (cand[0], cand[1]) > (best[0], best[1]) or (
                (cand[0], cand[1]) == (best[0], best[1])
                and cand[2] < best[2]
            ):
                best = cand
        dp[i] = best
    return list(dp[n][2])


def train_unigram_from_counts(
    word_freq: list[tuple[str, int]],
    vocab_size: int = 400,
    n_iter: int = 4,
    max_piece_len: int = 8,
    seed_factor: int = 4,
) -> list[tuple[str, float]]:
    """Hard-EM unigram trainer over a word-frequency table, driver-side.

    Seed = every single character (mandatory, never pruned — alphabet
    coverage is what makes tokenization total) plus the top
    ``seed_factor × vocab_size`` multi-char substrings (length ≤
    ``max_piece_len``) by frequency-weighted occurrence count. Each EM
    round: M-step turns piece counts into add-one-smoothed logprobs;
    E-step re-counts pieces along each word's Viterbi segmentation
    (frequency-weighted). After the first half of the rounds the
    multi-char tail is pruned to the budget by (count, piece) — the
    explicit tie-break that keeps retrains bit-stable. Returns
    ``[(piece, logprob)]`` sorted by (-logprob, piece).
    """
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    chars: set[str] = set()
    for w, _ in word_freq:
        chars.update(w)
    # seed multi-char substrings by weighted occurrence count
    sub_counts: dict[str, float] = {}
    for w, f in word_freq:
        n = len(w)
        for i in range(n):
            for l in range(2, min(max_piece_len, n - i) + 1):
                p = w[i : i + l]
                sub_counts[p] = sub_counts.get(p, 0.0) + f
    n_seed = max(0, seed_factor * vocab_size - len(chars))
    seeds = sorted(sub_counts.items(), key=lambda kv: (-kv[1], kv[0]))[:n_seed]
    counts: dict[str, float] = {c: 1.0 for c in sorted(chars)}
    counts.update({p: c for p, c in seeds})

    def m_step(cnt: dict[str, float]) -> dict[str, float]:
        total = sum(cnt.values()) + len(cnt)  # add-one smoothing
        return {
            p: math.log((c + 1.0) / total) for p, c in sorted(cnt.items())
        }

    logp = m_step(counts)
    prune_at = max(1, n_iter // 2)
    for it in range(n_iter):
        new_counts: dict[str, float] = dict.fromkeys(logp, 0.0)
        for w, f in word_freq:
            for p in _viterbi(w, logp, max_piece_len):
                new_counts[p] = new_counts.get(p, 0.0) + f
        if it + 1 == prune_at and len(new_counts) > vocab_size:
            multi = sorted(
                ((p, c) for p, c in new_counts.items() if len(p) > 1),
                key=lambda kv: (-kv[1], kv[0]),
            )
            keep = max(0, vocab_size - len(chars))
            new_counts = {
                **{c: new_counts.get(c, 0.0) for c in chars},
                **dict(multi[:keep]),
            }
        logp = m_step(new_counts)
    return sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))


def unigram_train(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 400,
    n_iter: int = 4,
    min_freq: int = 2,
    max_words: int = 1_000_000,
    max_piece_len: int = 8,
) -> list[tuple[str, float]]:
    """Train a unigram-LM vocabulary: one distributed word-count pass
    (``bpe.word_frequencies`` — the identical Java-normalized split, so
    BPE and unigram models over the same corpus agree on what a word
    is), then the driver-side hard-EM loop on the bounded table."""
    wf = [
        (r["word"], r["freq"])
        for r in word_frequencies(df, text_col, min_freq, max_words).collect()
    ]
    return train_unigram_from_counts(
        wf, vocab_size=vocab_size, n_iter=n_iter, max_piece_len=max_piece_len
    )


def unigram_tokenize(
    df: DataFrame,
    pieces: list[tuple[str, float]],
    text_col: str = "text",
    out_col: str = "tokens",
    max_piece_len: int = 8,
    distinct_words: bool = False,
    max_broadcast_words: int = 500_000,
) -> DataFrame:
    """Viterbi-segment every document's words under a trained unigram
    vocabulary, as an ``array<string>`` column. Same architecture as
    ``bpe_tokenize``: the UDF receives the word array produced by the
    SAME Spark expression the trainer counted (Java normalization —
    no Python-side split can disagree), the model ships in the closure
    (KBs), and a per-batch distinct-word cache makes the Python work
    ~unique words per batch on Zipf text. Segmentation is LOSSLESS by
    construction: pieces concatenate to exactly the word (no sentinel),
    with unseen characters falling back to single-char pieces at a
    floor score.

    ``distinct_words=True`` is the same Zipf-bounded upgrade as
    ``bpe_tokenize``'s: the corpus's DISTINCT word frame is aggregated
    once, each word Viterbi-segmented exactly once cluster-wide, and
    the word→pieces table broadcast for a pure dict-lookup pass —
    Python work becomes O(vocabulary), independent of corpus tokens.
    Gated by ``max_broadcast_words`` AND an estimated table byte size
    (``bpe._vocab_fits_broadcast`` — CPython entries cost hundreds of
    bytes each) with the per-batch-cache fallback (parity unit-pinned)."""
    logp = dict(pieces)
    if distinct_words:
        vocab_df = (
            df.select(F.explode(_words(F.col(text_col))).alias("word"))
            .distinct()
        )
        if _vocab_fits_broadcast(vocab_df, "word", max_broadcast_words):

            @F.pandas_udf("array<string>")
            def _seg(words):  # type: ignore[no-untyped-def]
                import pandas as pd

                return pd.Series(
                    [_viterbi(w, logp, max_piece_len) for w in words]
                )

            table = {
                r["word"]: list(r["toks"])
                for r in vocab_df.select(
                    "word", _seg("word").alias("toks")
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
                            toks = _viterbi(w, logp, max_piece_len)
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
                    toks = _viterbi(w, logp, max_piece_len)
                    cache[w] = toks
                out.extend(toks)
            return out

        return pd.Series([enc(a) for a in word_arrays])

    return df.withColumn(out_col, _tok(_words(F.col(text_col))))
