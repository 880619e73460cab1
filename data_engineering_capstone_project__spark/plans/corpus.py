"""Corpus-cleaning pipeline (north-star product surface): the standard
LLM-pretraining data prep flow as ONE composable plan over a documents
DataFrame.

    raw docs
      → language filter            (text.lang_id)
      → quality floor              (text.quality_score)
      → repetition ceiling         (text.repetition_score)
      → PII masking                (text.mask_pii)
      → exact dedup                (keep lowest id per fingerprint)
      → near-dup purge [optional]  (MinHash-LSH pairs → clusters → purge)
      → stable train/test split    (hash bucket)

Each stage is an independently-tested operator; this module only chains
them. Everything except the optional near-dup purge is a single lazy plan
(no actions), so Catalyst fuses the filters into one pass over the corpus.
At 100 TB the flow is: one full scan for the filter+mask project, one
fingerprint shuffle for exact dedup, and the LSH pipeline's bounded
shuffles for the near-dup stage.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_engineering_capstone_project__spark.operators import dedup, text
from data_engineering_capstone_project__spark.operators.relational import (
    train_test_split,
)


@dataclass(frozen=True)
class CorpusConfig:
    """Knobs for ``clean_corpus`` — defaults follow common practice
    (quality floor, Gopher-style repetition ceiling, 1% eval holdout)."""

    languages: tuple[str, ...] = ("en",)
    min_quality: float = 0.3
    max_repetition: float = 0.5
    mask_pii: bool = True
    near_dedup: bool = False
    minhash_threshold: float = 0.8
    substring_dedup: bool = False
    substring_window: int = 50
    test_fraction: float = 0.01
    id_col: str = "doc_id"
    text_col: str = "text"


def mix_sources_by_tokens(
    df: DataFrame,
    targets: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "",
) -> DataFrame:
    """Token-budget corpus mixing: downsample each source so the mixed
    corpus's token shares match ``targets`` (the data-mixture step of a
    pretraining pipeline — e.g. 40% web / 35% books / 25% code).

    Mechanics: per-source token totals are aggregated in one pass
    (collected — one row per source, a handful of rows at any scale);
    the largest feasible mixed-corpus size is
    ``M = min_s tokens_s / target_s`` (the scarcest source binds, no
    source can oversample), giving per-source keep rate
    ``frac_s = target_s·M / tokens_s``. Rows are then kept by the
    engine-portable deterministic hash rule ``md5(id|salt)4-hex-prefix <
    floor(frac·65536 + 0.5)`` — a shuffle-free codegen'd filter at the
    scan, stable under data growth and identical across engines (the
    floor(+0.5) rounding avoids Python-banker's vs SQL half-away
    divergence). Sources absent from ``targets`` are dropped.

    Realized shares deviate from targets only by sampling noise
    (±1/√docs) and hash granularity (1/65536).
    """
    if not targets:
        raise ValueError("targets must name at least one source")
    for s, t in targets.items():
        if t <= 0:
            raise ValueError(f"target share for {s!r} must be > 0")
    totals = {
        r["s"]: r["toks"]
        for r in df.groupBy(F.col(source_col).alias("s"))
        .agg(F.sum(text.token_count(F.col(text_col))).alias("toks"))
        .collect()
    }
    missing = [s for s in targets if s not in totals or not totals[s]]
    if missing:
        raise ValueError(f"sources with no tokens in corpus: {missing}")
    m = min(totals[s] / t for s, t in targets.items())
    h = F.substring(
        F.md5(F.concat_ws("|", F.col(id_col).cast("string"), F.lit(salt))), 1, 4
    )
    thresh = F.lit("0000")  # sources outside the mix keep nothing
    for s, t in sorted(targets.items()):
        frac = min(1.0, t * m / totals[s])
        code = int(frac * 16 ** 4 + 0.5)
        lim = "g" if code >= 16 ** 4 else format(code, "04x")
        thresh = F.when(F.col(source_col) == s, F.lit(lim)).otherwise(thresh)
    return df.filter(h < thresh)


def upsample_sources(
    df: DataFrame,
    epochs: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    default_epochs: float = 1.0,
    salt: str = "",
    epoch_col: str = "epoch",
) -> DataFrame:
    """Fractional-epoch upsampling — the other half of data mixing.

    ``mix_sources_by_tokens`` can only *down*sample; real pretraining
    mixes also repeat scarce high-quality sources (e.g. wiki x2.5, books
    x1.5, web x1, low-quality x0.3). Each row from source ``s`` appears
    ``floor(e_s)`` times, plus once more iff its id falls in the
    deterministic ``frac(e_s)`` md5-hash sample — so realized epochs hit
    the target to within hash granularity, per-document, reproducibly
    across runs, engines, and data growth (no RNG).

    The output gains ``epoch_col`` (0-based copy index) so a downstream
    ``deterministic_shuffle`` keyed on (id, epoch) decorrelates the
    copies across the training order. Plan: one codegen'd CASE pair plus
    an ``explode(sequence(...))`` — rows fan out map-side, no shuffle, no
    Python; sources absent from ``epochs`` get ``default_epochs``.
    """
    for s, e in epochs.items():
        if e < 0:
            raise ValueError(f"epochs for {s!r} must be >= 0, got {e}")
    if default_epochs < 0:
        raise ValueError(f"default_epochs must be >= 0, got {default_epochs}")

    def _lim(frac: float) -> str:
        code = int(frac * 16 ** 4 + 0.5)
        return "g" if code >= 16 ** 4 else format(code, "04x")

    base = F.lit(int(default_epochs))
    thresh = F.lit(_lim(default_epochs - int(default_epochs)))
    for s, e in sorted(epochs.items()):
        base = F.when(F.col(source_col) == s, F.lit(int(e))).otherwise(base)
        thresh = F.when(
            F.col(source_col) == s, F.lit(_lim(e - int(e)))
        ).otherwise(thresh)
    h = F.substring(
        F.md5(F.concat_ws("|", F.col(id_col).cast("string"), F.lit(salt))), 1, 4
    )
    n = base + F.when(h < thresh, F.lit(1)).otherwise(F.lit(0))
    arr = F.when(n >= 1, F.sequence(F.lit(0), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn(epoch_col, F.explode(arr))


def clean_corpus(
    df: DataFrame, config: CorpusConfig = CorpusConfig()
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Run the cleaning flow; returns (train, test, report_columns).

    The third frame is the per-stage survivor counts (one row), computed
    with ``observe``-free aggregation only when collected — deriving it is
    lazy and optional.

    Cache lifecycle: the dedup stages persist internal intermediates
    (registered in ``cachereg``). The returned frames are lazy and still
    reference those caches, so the RELEASE belongs to the caller: after
    the final action (write/collect), call
    ``cachereg.release_intermediates()`` — releasing earlier is safe but
    forfeits the reuse the persists bought.
    """
    id_col, text_col = config.id_col, config.text_col
    t = F.col(text_col)

    # words array pre-projected so the repetition n-gram lambda reads an
    # attribute instead of re-splitting the document per n-gram
    staged = df.select(
        id_col,
        text_col,
        text.lang_id(t).alias("_lang"),
        text.quality_score(t).alias("_quality"),
        F.split(F.lower(F.trim(t)), r"\s+").alias("_w"),
    ).select(
        id_col,
        text_col,
        "_lang",
        "_quality",
        text.repetition_score_of_words(F.col("_w")).alias("_rep"),
    )
    kept = staged.filter(
        F.col("_lang").isin(*config.languages)
        & (F.col("_quality") >= config.min_quality)
        & (F.coalesce(F.col("_rep"), F.lit(0.0)) <= config.max_repetition)
    )
    if config.mask_pii:
        kept = kept.withColumn(text_col, text.mask_pii(F.col(text_col)))

    # exact dedup keeping the full row of the lowest-id survivor
    survivors = dedup.exact_dedup(kept, text_col=text_col, id_col=id_col).select(
        id_col
    )
    deduped = kept.join(survivors, id_col, "left_semi")

    if config.near_dedup:
        pairs = dedup.minhash_lsh_pairs(
            deduped,
            id_col=id_col,
            text_col=text_col,
            jaccard_threshold=config.minhash_threshold,
        ).select("id_a", "id_b")
        deduped = dedup.dedup_by_clusters(deduped, pairs, id_col=id_col)

    if config.substring_dedup:
        # span-level pass AFTER doc-level dedup: cuts verbatim cross-doc
        # repeats (boilerplate/licenses) out of otherwise-unique docs;
        # the cleaned text replaces the original (normalized) text
        spans = dedup.substring_span_dedup(
            deduped, id_col=id_col, text_col=text_col,
            window=config.substring_window,
        )
        deduped = (
            deduped.drop(text_col)
            .join(spans.select(id_col, F.col("clean_text").alias(text_col)), id_col)
        )

    cleaned = deduped.select(id_col, text_col, "_lang", "_quality", "_rep")
    train, test = train_test_split(
        cleaned, test_fraction=config.test_fraction, id_col=id_col
    )

    report = df.agg(F.count("*").alias("n_input")).crossJoin(
        cleaned.agg(F.count("*").alias("n_cleaned"))
    )
    return train, test, report
