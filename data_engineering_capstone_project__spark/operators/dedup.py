"""Deduplication operators for LLM-pipeline data prep (north-star extension).

Four tiers, cheapest-first — the standard large-corpus dedup ladder:

1. exact       — hash-groupBy on a normalized fingerprint (one shuffle).
2. MinHash+LSH — shingle → k minhashes → band buckets → bucket-join;
                 candidate pairs verified by exact Jaccard. Scales as
                 O(docs × shingles) + a self-join only *within* buckets.
3. SimHash     — 64-bit sign-aggregated token-hash fingerprint; near-dups
                 are fingerprints at small Hamming distance.
4. n-gram Jaccard — exact character-shingle Jaccard for candidate pairs
                 (the verifier for tiers 2/3; standalone for small data).

Everything is built-in-function Spark (xxhash64, explode, groupBy) — no
Python in the hot path. At 100 TB: the explode output is
(docs × shingles_per_doc) rows; band bucketing keeps the candidate join
quadratic only within a bucket, and a ``spark.sql.adaptive`` skew split
handles pathological buckets (all-identical boilerplate docs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_engineering_capstone_project__spark.cachereg import register
from data_engineering_capstone_project__spark.functions.fx import pround
from data_engineering_capstone_project__spark.operators.text import fingerprint


def _normalize(text: Column) -> Column:
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


from data_engineering_capstone_project__spark.operators.relational import (
    spread as _spread,
)

# Ceiling on the candidate-id set verify_jaccard will broadcast under
# bounded_pairs: ids are ~8–16 B each, so 2M ids is a ≤ ~32 MB build side
# — comfortably under Spark's 8 GB broadcast hard limit and small enough
# per executor. Above it the semi-join falls back to the symmetric plan
# (AQE sizes the build side from runtime stats).
_VERIFY_BROADCAST_MAX_IDS = 2_000_000


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: keep the lowest-id row per normalized-text fingerprint.

    One hash-shuffle on the fingerprint; map-side partial min makes the
    shuffle payload one row per distinct doc per partition.
    """
    fp = fingerprint(F.col(text_col))
    return (
        df.withColumn("_fp", fp)
        .groupBy("_fp")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies"))
        .drop("_fp")
    )


def shingles_of_norm(norm: Column, k: int = 5) -> Column:
    """Array of k-char shingles (distinct) of an ALREADY-NORMALIZED column.

    ``norm`` must be a plain column reference (pre-projected), not an
    inline expression: the per-element ``transform`` lambda references it
    once per shingle, and Catalyst substitutes inline expressions into
    lambda bodies — an inline ``regexp_replace`` would then re-run per
    ELEMENT (measured 7-40× slower on real documents). A projected
    attribute is read from the row, so the lambda stays cheap; the
    projection survives CollapseProject because the attribute occurs
    ≥2× in a non-cheap expression (length + lambda body).
    """
    n = F.length(norm)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.substring(norm, i, F.lit(k)))
    )


def char_shingles(text: Column, k: int = 5) -> Column:
    """Array of k-char shingles (distinct) of normalized text.

    Convenience form for small inputs/tests: the normalization runs
    inside the transform lambda (per element). Hot paths must pre-project
    ``_normalize(text)`` and call ``shingles_of_norm`` — see the
    module's operators, which all do.
    """
    return shingles_of_norm(_normalize(text), k)


def exploded_char_shingles(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """``(id, _sz, sh)`` rows — one per DISTINCT k-char shingle per doc,
    with ``_sz`` the doc's distinct-shingle count — via pure-codegen
    ``explode(sequence) → substr → distinct → count join-back``.

    Why not ``explode(shingles_of_norm(...))``: ``F.transform`` is a
    higher-order function, and HOFs are CodegenFallback — evaluated
    interpreted, per element, with boxing. Measured on 15k docs / 5.3M
    shingles: ~175 s for the HOF array build vs ~5 s for this shape
    (35×). The price is two narrow shuffles (distinct + size agg, both
    with map-side partials) instead of a per-row ``array_distinct`` —
    the right trade at any scale where the explode is hot.
    """
    base = _spread(df).select(
        F.col(id_col), _normalize(F.col(text_col)).alias("_norm")
    )
    pos = base.select(
        id_col,
        "_norm",
        F.explode(
            F.sequence(
                F.lit(1), F.greatest(F.length("_norm") - (k - 1), F.lit(1))
            )
        ).alias("_i"),
    ).select(
        id_col, F.col("_norm").substr(F.col("_i"), F.lit(k)).alias("sh")
    )
    dsh = pos.distinct()
    sz = dsh.groupBy(id_col).agg(F.count("*").alias("_sz"))
    return dsh.join(sz, id_col)


def shingles_of_words(words: Column, k: int = 3) -> Column:
    """Array of k-word shingles (distinct) of an ALREADY-SPLIT word-array
    column reference (same pre-projection contract as
    ``shingles_of_norm`` — an inline ``split`` would re-run per element).
    """
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)))
    )


def word_shingles(text: Column, k: int = 3) -> Column:
    """Array of k-word shingles (distinct); convenience form (see
    ``char_shingles`` note — hot paths pre-project the split array)."""
    return shingles_of_words(F.split(_normalize(text), r"\s+"), k)


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    shingle_k: int = 5,
) -> DataFrame:
    """MinHash signature per doc: explode shingles, take min of k seeded
    xxhash64 values. One explode + one groupBy; the k hash functions are k
    aggregate expressions over the same exploded rows (single pass). The
    shingle-set size rides along as ``_sz`` (a free count in the same
    aggregation) so the LSH candidate join can size-filter pairs before
    exact verification."""
    exploded = (
        _spread(df)
        .select(F.col(id_col), _normalize(F.col(text_col)).alias("_norm"))
        .select(
            F.col(id_col),
            F.explode(shingles_of_norm(F.col("_norm"), shingle_k)).alias("sh"),
        )
    )
    aggs = [
        F.min(F.xxhash64(F.col("sh"), F.lit(i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return exploded.groupBy(id_col).agg(*aggs, F.count("*").alias("_sz"))


def auto_minhash_config(
    n_rows: int,
    threshold: float,
    target_recall: float = 0.99,
    baseline_j: float = 0.2,
    max_hashes: int = 256,
    candidate_budget_per_row: float = 20.0,
) -> tuple[int, int]:
    """Scale-safe (num_hashes, bands) for banded MinHash LSH.

    Fixed banding has the same hazard the SRP planes had: random (non-dup)
    pairs at baseline similarity J₀ collide in a band with probability
    J₀^r, so candidate mass grows as ``N²·b·J₀^r`` — quadratic at any
    fixed r (measured on the 500k-doc ladder corpus: r=4 → 60.4M
    candidates, r=8 → 30k). The fix is to GROW selectivity with N: per r,
    size bands for ``target_recall`` at exactly J = threshold
    (``b = ⌈ln(1−R)/ln(1−t^r)⌉``), then pick the r whose estimated cost —
    signature work ``N·r·b`` plus candidate work ``N²/2·b·J₀^r`` — is
    lowest among configs whose candidate mass fits
    ``candidate_budget_per_row·N`` (falling back to the overall min-cost
    config when the budget is infeasible at ``max_hashes``). The
    signature pass is the LINEAR part and is cheap to widen (measured:
    200 hashes ≈ 64 hashes per-row cost — the explode shuffle dominates),
    so spending hashes to kill quadratic candidates is the right trade at
    every large N. ``baseline_j`` is a prior for corpora with no better
    estimate: ~0.07 measured on the sparse-vocab ladder corpus, ~0.2 a
    conservative default for natural text, ~0.4 for the pathological
    tiny-vocab driver corpus (callers with such data should pass it).
    """
    import math

    if n_rows <= 1:
        return 32, 8

    def search(recall: float):
        best = None  # (cost, r, b) among candidate-budget-feasible configs
        for r in range(2, 17):
            pr = threshold**r
            if pr >= 1.0 - 1e-12:
                b = 1
            else:
                b = max(
                    1,
                    math.ceil(
                        math.log(max(1.0 - recall, 1e-12))
                        / math.log(1.0 - pr)
                    ),
                )
            if r * b > max_hashes:
                continue
            fp = (n_rows * n_rows / 2.0) * b * (baseline_j**r)
            if fp > candidate_budget_per_row * n_rows:
                continue
            cost = n_rows * r * b + 10.0 * fp
            if best is None or cost < best[0]:
                best = (cost, r, b)
        return best

    # recall yields BEFORE scalability: if no config under the hash cap
    # meets the candidate budget at the target recall, step the recall
    # floor down — a quietly quadratic default is the one unacceptable
    # outcome (the SRP-planes lesson); the achieved recall is always the
    # printed b/r math, never silent
    for recall in (target_recall, 0.95, 0.9, 0.8, 0.5):
        best = search(recall)
        if best is not None:
            _, r, b = best
            return r * b, b
    # even recall 0.5 infeasible (extreme N / baseline): max selectivity
    r = max(2, max_hashes // max(1, max_hashes // 16))
    b = max(1, max_hashes // r)
    return r * b, b


def _band_cols(num_hashes: int, bands: int) -> list[Column]:
    """The banding expressions shared by every LSH consumer: band ``b`` is
    ``xxhash64`` over that band's slice of signature columns. A corpus
    index and a later probe (batch or stream) collide iff they computed
    THESE exact expressions with the same (num_hashes, bands) — which is
    why the config is persisted alongside the index
    (``sources.artifacts.save_minhash_index``)."""
    rows_per_band = num_hashes // bands
    return [
        F.xxhash64(*[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)])
        .alias(f"band{b}")
        for b in range(bands)
    ]


def _banded_long(df: DataFrame, id_col: str, bands: int) -> DataFrame:
    """(id, band, bucket) long form from a frame carrying band columns."""
    return df.select(
        id_col,
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), F.col(f"band{b}").alias("bucket"))
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")


def _resolve_banding(
    corpus: DataFrame,
    num_hashes: int | None,
    bands: int | None,
    threshold: float,
    baseline_j: float,
) -> tuple[int, int]:
    """Resolve (num_hashes, bands) for an index build: pass-through when
    the caller gave both, else :func:`auto_minhash_config` sized from the
    corpus row count (one count() — bootstrap-time only). Auto-sizing is
    the DEFAULT because fixed banding is the measured scale-killer: the
    old 32/8 default blew 18 s → 238 s over the 50k → 500k ladder rung
    (exp 0.89 — quadratic candidate mass) while the auto config held
    exp ≤ 0.2 (SCALING.md; VERDICT r7 #1)."""
    if num_hashes is not None and bands is not None:
        return int(num_hashes), int(bands)
    if (num_hashes is None) != (bands is None):
        raise ValueError(
            "pass BOTH num_hashes and bands (explicit banding) or "
            "NEITHER (auto-sized from the corpus count)"
        )
    return auto_minhash_config(
        corpus.count(), threshold, baseline_j=baseline_j
    )


def corpus_minhash_band_index(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int | None = None,
    bands: int | None = None,
    shingle_k: int = 5,
    near_dup_threshold: float = 0.8,
    baseline_j: float = 0.2,
) -> DataFrame:
    """The STATIC side of fuzzy (near-dup) decontamination: distinct
    ``(band, bucket)`` rows over the corpus's banded MinHash signatures.

    ``num_hashes``/``bands`` default to AUTO: sized from the corpus
    count via :func:`auto_minhash_config` at ``near_dup_threshold`` (the
    Jaccard level the guard is tuned to catch) — fixed banding goes
    quadratic in candidate mass as the corpus grows (VERDICT r7 #1).
    Callers that persist the index must know the config: derive it with
    ``auto_minhash_config`` first and pass it explicitly (what
    ``plans.ingest.init_ingest_indexes`` does), or pass explicit values.

    Membership semantics: a probe document collides with SOME corpus
    document at banded-LSH level iff any of its own band buckets appears
    here — exactly the candidate criterion of ``minhash_lsh_candidates``
    (same signature seeds, same ``_band_cols`` banding), minus the
    pair-size prefilter (an index keyed by bucket alone cannot know the
    partner's shingle count; the guard is deliberately conservative —
    candidate-level recall is 100% of what the batch path would verify).

    Size at 100 TB: ``bands`` longs per corpus doc before the distinct —
    a few % of corpus bytes; write it once via
    ``sources.artifacts.save_minhash_index`` and every ingest stream
    probes the (broadcastable, or bucket-bucketed) index.
    """
    num_hashes, bands = _resolve_banding(
        corpus, num_hashes, bands, near_dup_threshold, baseline_j
    )
    sigs = minhash_signatures(corpus, id_col, text_col, num_hashes, shingle_k)
    banded = sigs.select(id_col, *_band_cols(num_hashes, bands))
    return (
        _banded_long(banded, id_col, bands)
        .select("band", "bucket")
        .distinct()
    )


def extend_minhash_band_index(
    index: DataFrame,
    admitted: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
) -> DataFrame:
    """ADMIT newly-ingested documents into a banded-MinHash index: union
    of the existing ``(band, bucket)`` rows and the admitted batch's —
    the fuzzy counterpart of ``extend_fingerprint_index``, closing the
    incremental loop for the NEAR-dup guard (``minhash_band_probe`` /
    ``decontaminate_stream_fuzzy``). The config MUST match the index's
    (persisted with it by ``save_minhash_index``); batch-sized signature
    work plus an index-sized distinct."""
    new_bands = corpus_minhash_band_index(
        admitted, id_col, text_col, num_hashes, bands, shingle_k
    )
    return index.unionByName(new_bands).distinct()


def corpus_minhash_doc_index(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int | None = None,
    bands: int | None = None,
    shingle_k: int = 5,
    near_dup_threshold: float = 0.8,
    baseline_j: float = 0.2,
) -> DataFrame:
    """Id-CARRYING banded-MinHash index: distinct ``(band, bucket,
    corpus_id)`` rows — the static side of VERIFIED fuzzy
    decontamination (:func:`minhash_band_probe_verified`).

    The id-free ``corpus_minhash_band_index`` answers "did the probe
    collide with SOMETHING"; carrying the id answers "with WHOM", which
    is what an exact-Jaccard verify tier needs (candidates become
    (probe, corpus) PAIRS that a text lookup can verify). Cost: the
    same ``bands`` rows per corpus doc, but the distinct no longer
    collapses same-bucket docs — the index is ≤ bands·N rows either
    way, a few % of corpus bytes.

    ``num_hashes``/``bands`` default to AUTO (sized from the corpus
    count at ``near_dup_threshold`` — see :func:`_resolve_banding`);
    persisting callers derive the config first and pass it explicitly.
    """
    num_hashes, bands = _resolve_banding(
        corpus, num_hashes, bands, near_dup_threshold, baseline_j
    )
    sigs = minhash_signatures(corpus, id_col, text_col, num_hashes, shingle_k)
    banded = sigs.select(id_col, *_band_cols(num_hashes, bands))
    return (
        _banded_long(banded, id_col, bands)
        .select("band", "bucket", F.col(id_col).alias("corpus_id"))
        .distinct()
    )


def extend_minhash_doc_index(
    index: DataFrame,
    admitted: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
) -> DataFrame:
    """ADMIT newly-ingested documents into an id-carrying MinHash index
    (the verified-tier counterpart of ``extend_minhash_band_index``):
    union of the existing ``(band, bucket, corpus_id)`` rows and the
    admitted batch's. Config MUST match the index's."""
    new_rows = corpus_minhash_doc_index(
        admitted, id_col, text_col, num_hashes, bands, shingle_k
    )
    return index.unionByName(new_rows).distinct()


def minhash_band_probe_verified(
    batch: DataFrame,
    doc_index: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int | None = None,
    bands: int | None = None,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.8,
    keep: str = "clean",
    bounded_batch: bool = False,
) -> DataFrame:
    """Route a BATCH of documents by VERIFIED near-dup membership in a
    static corpus: band collisions against an id-carrying MinHash index
    (``corpus_minhash_doc_index``) become candidate (probe, corpus)
    pairs, each verified by EXACT shingle-set Jaccard against the
    corpus text before any document is dropped.

    This closes the candidate-level guard's precision gap: the
    unverified ``minhash_band_probe`` drops on band collision alone
    (recall-oriented, conservative — a false-positive collision costs a
    good document), while this tier only drops documents with a proven
    Jaccard ≥ ``jaccard_threshold`` partner in the corpus. Decision
    semantics are therefore identical to the batch cross-corpus
    ``minhash_lsh_join`` at the same (num_hashes, bands, threshold):
    kept = probe docs with no verified join partner.

    Plan shape: batch-sized signature pass; a ``(band, bucket)``
    equi-join against the index produces the candidate pairs; ONLY
    candidate corpus docs are fetched from ``corpus`` (a semi-join by
    id — at 100 TB keep the corpus bucketed by ``id_col`` so the fetch
    probes buckets instead of scanning) and only candidate docs are
    shingled (``verify_jaccard`` semi-joins before the explode). The
    corpus text relation is never broadcast and never fully shingled.

    BANDING IS REQUIRED AND MUST BE THE INDEX'S: the probe only collides
    with the index if both sides hashed with identical
    ``num_hashes``/``bands`` (the band hash mixes every row of its
    band), and the index builders AUTO-SIZE by default
    (``auto_minhash_config`` — fixed banding was the measured
    scale-killer: 18 s → 238 s / exp 0.89 over the 50k → 500k ladder
    rung, SCALING.md). A probe default therefore cannot exist: probing
    an auto-sized index with any fixed guess yields band hashes that
    never collide — silent ~zero recall, no error (VERDICT r8 #3). Pass
    the config persisted with the index (``load_minhash_doc_index``
    returns it; the ingest tick threads it automatically).
    """
    if num_hashes is None or bands is None:
        raise ValueError(
            "minhash_band_probe_verified: num_hashes/bands are required "
            "and must be the INDEX's banding config "
            "(sources.artifacts.load_minhash_doc_index returns it; index "
            "builders auto-size by default, so a probe default would "
            "silently collide with nothing)"
        )
    if keep not in ("clean", "contaminated"):
        raise ValueError(f"minhash_band_probe_verified: unknown keep={keep!r}")
    if jaccard_threshold is None:
        # a None threshold would make the verify filter `jaccard >= NULL`
        # evaluate NULL for every pair — the tier would silently drop
        # NOTHING (contaminated docs published with no error)
        raise ValueError(
            "minhash_band_probe_verified: jaccard_threshold is None — the "
            "verified tier needs an operating threshold (persist it with "
            "the index via save_minhash_doc_index(jaccard_threshold=...))"
        )
    sigs = minhash_signatures(batch, id_col, text_col, num_hashes, shingle_k)
    banded = sigs.select(id_col, *_band_cols(num_hashes, bands))
    bl = _banded_long(banded, id_col, bands)
    if bounded_batch:
        # build side = the BATCH's band rows (bands per doc — bounded):
        # the corpus-scale index streams map-side with ZERO index-side
        # exchanges; without the hint the inner join sort-merge-shuffles
        # the index every probe past the broadcast threshold
        bl = F.broadcast(bl)
    cand = (
        bl.join(doc_index, ["band", "bucket"])
        .select(F.col(id_col).alias("_pid"), "corpus_id")
        .distinct()
    )

    def tag(df: DataFrame, side: int, did: Column) -> DataFrame:
        return df.select(
            F.struct(F.lit(side).alias("s"), did.alias("i")).alias("_cid"),
            F.col(text_col),
        )

    combined = tag(batch, 0, F.col(id_col)).unionByName(
        tag(corpus, 1, F.col(id_col))
    )
    pairs = cand.select(
        F.struct(F.lit(0).alias("s"), F.col("_pid").alias("i")).alias("id_a"),
        F.struct(F.lit(1).alias("s"), F.col("corpus_id").alias("i")).alias(
            "id_b"
        ),
    )
    verified_hits = (
        verify_jaccard(
            combined, pairs, "_cid", text_col, shingle_k,
            bounded_pairs=bounded_batch,
        )
        .filter(F.col("jaccard") >= F.lit(jaccard_threshold))
        .select(F.col("id_a.i").alias(id_col))
        .distinct()
    )
    how = "left_semi" if keep == "contaminated" else "left_anti"
    return batch.join(verified_hits, id_col, how)


def minhash_band_probe(
    batch: DataFrame,
    band_index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int | None = None,
    bands: int | None = None,
    shingle_k: int = 5,
    keep: str = "clean",
    bounded_batch: bool = False,
) -> DataFrame:
    """Route a BATCH of documents by banded-MinHash membership in a static
    corpus index: ``keep='clean'`` returns rows with NO band collision
    (near-dup-free vs the corpus), ``keep='contaminated'`` the complement.

    This is the per-micro-batch kernel of ``decontaminate_stream_fuzzy``
    and equally usable standalone for incremental batch ingest (the fuzzy
    upgrade of ``dedup_against_corpus``). Plan shape: one shingle explode
    + signature aggregation over the batch (vectorized, JVM-side), a
    semi join of the batch's ``bands``-per-doc bucket rows against the
    index on ``(band, bucket)``, then a semi/anti join back on id —
    batch-sized work throughout; the corpus appears only as the index.

    ``num_hashes``/``bands`` are REQUIRED and must be the index's own
    banding config (``load_minhash_index`` returns it): the builders
    auto-size from the corpus count by default, so a probe default
    would silently hash into buckets the index never contains — ~zero
    recall with no error (VERDICT r8 #3).
    """
    if num_hashes is None or bands is None:
        raise ValueError(
            "minhash_band_probe: num_hashes/bands are required and must "
            "be the INDEX's banding config "
            "(sources.artifacts.load_minhash_index returns it; index "
            "builders auto-size by default, so a probe default would "
            "silently collide with nothing)"
        )
    if keep not in ("clean", "contaminated"):
        raise ValueError(f"minhash_band_probe: unknown keep={keep!r}")
    sigs = minhash_signatures(batch, id_col, text_col, num_hashes, shingle_k)
    banded = sigs.select(id_col, *_band_cols(num_hashes, bands))
    bl = _banded_long(banded, id_col, bands)
    if bounded_batch:
        # LeftSemi builds its RIGHT side — the corpus-scale index — so
        # the semi probe cannot broadcast-build past the threshold and
        # would sort-merge-shuffle the index every tick. Flip it: an
        # inner join with the BATCH's band rows (bounded) as the
        # broadcast build side streams the index map-side with zero
        # index exchanges; the semi/anti back-join dedups hit ids.
        hits = (
            F.broadcast(bl)
            .join(band_index, ["band", "bucket"])
            .select(id_col)
        )
    else:
        hits = bl.join(band_index, ["band", "bucket"], "left_semi").select(
            id_col
        )
    how = "left_semi" if keep == "contaminated" else "left_anti"
    return batch.join(hits, id_col, how)


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.8,
    est_filter: bool = False,
) -> DataFrame:
    """Size-filtered (id_a, id_b) candidate pairs from banded MinHash LSH
    — the candidate-generation stage of ``minhash_lsh_pairs``, exposed so
    other exact verifiers (``ngram_jaccard_pairs``'s prefilter tier) can
    ride the same buckets. A pair at Jaccard J shares a band bucket with
    probability ``1 - (1 - J^r)^bands`` (r = hashes per band), so recall
    at the threshold is tuned by (num_hashes, bands), and candidate work
    is Σ_bucket n_b² — bounded by band width, never corpus size².

    ``est_filter=True`` adds a signature-agreement prune between
    bucketing and output: the fraction of matching minhash components
    estimates J (std ≈ sqrt(t(1-t)/num_hashes)), and candidates whose
    estimate falls below ``t - 4σ`` are dropped. Band collisions on a
    corpus's baseline similarity (J far under t) survive the bucket join
    but fail this estimate with near-certainty, while a true pair at
    exactly J = t fails it with P ≈ 2e-5 (4σ one-sided) — so a
    downstream EXACT verifier sees ~true pairs instead of every bucket
    collision. The estimate reuses the persisted signatures (two hash
    joins on id, num_hashes equality terms — codegen, no new shuffle of
    shingles)."""
    # one row per doc (num_hashes longs) — persisting avoids recomputing the
    # shingle explode + k-hash aggregation for every downstream join branch
    sigs = register(
        minhash_signatures(df, id_col, text_col, num_hashes, shingle_k).persist()
    )
    banded = sigs.select(id_col, "_sz", *_band_cols(num_hashes, bands))
    # long-form (doc, band_idx, bucket) then self-join per bucket
    buckets = banded.select(
        id_col,
        "_sz",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), F.col(f"band{b}").alias("bucket"))
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select(id_col, "_sz", "bb.band", "bb.bucket")
    a, b_ = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            # size filter: epsilon keeps exact-boundary pairs when t*max
            # rounds a hair above min (same guard as ngram_jaccard_pairs)
            & (
                F.lit(jaccard_threshold) * F.greatest("a._sz", "b._sz")
                <= F.least("a._sz", "b._sz") + F.lit(1e-9)
            ),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    if not est_filter:
        return cand
    import math

    t = jaccard_threshold
    est_floor = t - 4.0 * math.sqrt(max(t * (1.0 - t), 0.0) / num_hashes)
    if est_floor <= 0.0:
        return cand
    # hint("merge"): signatures are O(docs × num_hashes longs) — hundreds
    # of MB at corpus scale — and post-aggregate size estimates can pick
    # a driver-killing broadcast (see verify_jaccard); sort-merge scales
    sig_a = sigs.select(
        F.col(id_col).alias("id_a"),
        *[F.col(f"h{i}").alias(f"ha{i}") for i in range(num_hashes)],
    ).hint("merge")
    sig_b = sigs.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f"h{i}").alias(f"hb{i}") for i in range(num_hashes)],
    ).hint("merge")
    # balanced pairwise sum: a left-leaning 300+-term `+` chain builds an
    # expression tree deep enough to StackOverflow Catalyst's recursive
    # analysis; the balanced tree is depth ⌈log2(num_hashes)⌉
    terms: list[Column] = [
        F.when(F.col(f"ha{i}") == F.col(f"hb{i}"), 1).otherwise(0)
        for i in range(num_hashes)
    ]
    while len(terms) > 1:
        terms = [
            terms[i] + terms[i + 1] if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
    matches = terms[0]
    return (
        cand.join(sig_a, "id_a")
        .join(sig_b, "id_b")
        .filter(matches >= F.lit(est_floor * num_hashes))
        .select("id_a", "id_b")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int | None = None,
    bands: int | None = None,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.8,
    est_filter: bool = True,
    n_rows: int | None = None,
    baseline_j: float = 0.2,
) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash LSH, verified by exact
    shingle Jaccard. Returns (id_a, id_b, jaccard) with id_a < id_b.

    Scale path: docs sharing any band bucket become candidates; the
    verification join touches only candidates. rows(bucket join) ≈
    Σ_bucket n_b² — bounded by band width choice, not corpus size².
    Candidates whose shingle-set sizes are incompatible with the
    threshold (J ≥ t forces t·max ≤ min) are dropped BEFORE the exact
    verify — the size is a free extra aggregate in the signature pass,
    and on corpora with hot shared shingles the filter removes a large
    slice of the verification workload with zero recall cost.

    **Defaults are scale-safe**: when ``num_hashes`` is None the band
    config is derived by ``auto_minhash_config`` from a corpus count
    (pass ``n_rows`` to skip the count job) — selectivity (rows per
    band) grows with N so random-collision candidates stay ~linear,
    and band count restores ≥ 99% recall at exactly the threshold.
    ``est_filter`` (default on) additionally prunes surviving bucket
    collisions by signature agreement before the exact verify (per-pair
    miss ~2e-5; see ``minhash_lsh_candidates``). Explicit
    ``num_hashes``/``bands`` preserve any fixed config.
    """
    if num_hashes is None:
        if n_rows is None:
            n_rows = df.count()
        auto_nh, auto_b = auto_minhash_config(
            n_rows, jaccard_threshold, baseline_j=baseline_j
        )
        num_hashes = auto_nh
        if bands is None:
            bands = auto_b
    if bands is None:
        bands = 8
    cand = minhash_lsh_candidates(
        df, id_col, text_col, num_hashes, bands, shingle_k,
        jaccard_threshold, est_filter=est_filter,
    )
    return verify_jaccard(df, cand, id_col, text_col, shingle_k).filter(
        F.col("jaccard") >= jaccard_threshold
    )


def minhash_lsh_join(
    df_a: DataFrame,
    df_b: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int | None = None,
    bands: int | None = None,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.8,
    est_filter: bool = True,
    n_rows: int | None = None,
    baseline_j: float = 0.2,
) -> DataFrame:
    """CROSS-corpus near-duplicate JOIN via banded MinHash LSH: pairs
    ``(id_a ∈ df_a, id_b ∈ df_b, jaccard)`` with exact shingle Jaccard
    ≥ threshold — the fuzzy train/eval decontamination primitive when
    the benchmark side is itself corpus-sized. ``contamination_check``
    broadcasts the benchmark's shingles (right for a small eval set);
    this operator banding-joins BOTH sides, so neither corpus is ever
    broadcast or driver-bounded, and work is Σ_bucket n_aᵇ·n_bᵇ — the
    LSH candidate economics of ``minhash_lsh_pairs``, across corpora.

    Implementation: each side's rows are tagged into a struct id
    ``(side, id)`` and pushed through the SAME single-corpus machinery
    (one union, one signature pass with shared hash seeds — a pair can
    only collide if both sides hashed identically, so sharing the
    banding is what makes the cross join correct), then candidates are
    restricted to cross-side pairs BEFORE the exact verify (within-side
    candidates are free to generate — they ride the same buckets — but
    never pay verification). Struct ordering puts side 0 first, so
    ``id_a`` is always the ``df_a`` row. All of
    ``minhash_lsh_pairs``'s hardening rides along: auto band config
    (sized from the COMBINED count), shingle-size prefilter,
    signature-agreement estimate prune, outlier verify routing, and the
    cachereg persist lifecycle.

    Both frames must expose the same ``id_col``/``text_col`` names and
    id TYPE (rename upstream otherwise); ids may overlap across frames
    — the side tag disambiguates.
    """
    def tag(df: DataFrame, side: int) -> DataFrame:
        return df.select(
            F.struct(
                F.lit(side).alias("s"), F.col(id_col).alias("i")
            ).alias("_cid"),
            F.col(text_col),
        )

    combined = tag(df_a, 0).unionByName(tag(df_b, 1))
    if num_hashes is None:
        if n_rows is None:
            n_rows = combined.count()
        auto_nh, auto_b = auto_minhash_config(
            n_rows, jaccard_threshold, baseline_j=baseline_j
        )
        num_hashes = auto_nh
        if bands is None:
            bands = auto_b
    if bands is None:
        bands = 8
    cand = minhash_lsh_candidates(
        combined, "_cid", text_col, num_hashes, bands, shingle_k,
        jaccard_threshold, est_filter=est_filter,
    ).filter(F.col("id_a.s") != F.col("id_b.s"))
    out = verify_jaccard(combined, cand, "_cid", text_col, shingle_k).filter(
        F.col("jaccard") >= jaccard_threshold
    )
    return out.select(
        F.col("id_a.i").alias("id_a"),
        F.col("id_b.i").alias("id_b"),
        "jaccard",
    )


def verify_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 5,
    max_array_shingles: int = 65536,
    bounded_pairs: bool = False,
) -> DataFrame:
    """Exact shingle-set Jaccard for given (id_a, id_b) pairs.

    |A∩B| / |A∪B| via ``array_intersect`` on per-doc shingle arrays
    joined onto the pairs (arrays computed once, persisted — never
    recomputed per pair). Measured against the alternative
    exploded-join-and-count formulation on 212k candidates over 5k docs
    (sf0.1): arrays 3.7 s vs exploded 24 s — the shingle strings are
    duplicated per pair either way, but the exploded form multiplies the
    shuffled ROW count by shingles-per-doc (~290×) and adds a second
    shuffle join. ``array_intersect`` is hash-based (linear per pair).

    Outlier docs (the former wide-row caveat) never form arrays at all:
    any pair touching one routes through an exploded ``(pair, shingle)``
    equi-join + count, which is slower per pair but strictly row-shaped,
    so a million-shingle document costs rows (distributed) instead of a
    multi-MB struct in a single join row. The routing key is the
    NORMALIZED TEXT LENGTH (> ``max_array_shingles`` chars → outlier):
    length bounds the distinct-shingle count from above and is
    codegen-cheap, so routing costs one narrow scan of the candidate
    docs instead of a persisted shingle explode. Conservative (a long
    doc with few distinct shingles still routes exploded) but both
    paths produce identical jaccard values (regression-tested with the
    threshold forced to 0). When no candidate doc exceeds the threshold
    — checked driver-side against the id-only outlier relation, the
    overwhelmingly common case — the plan is exactly the all-array
    original. ``big_doc_ids`` is id-only and broadcast; the
    corpus-sized shingle relations themselves are never broadcast.
    """
    # pairs is consumed twice (candidate-id projection + the output
    # join): persist so an expensive upstream candidate generation
    # (LSH bucketing + signature passes) materializes exactly once
    pairs = register(pairs.persist())
    # shingle ONLY the docs that appear in a pair: at corpus scale the
    # candidate set touches a small fraction of documents, and exploding
    # all N docs to build arrays nobody reads was the verify stage's real
    # cost (500k docs → ~650M exploded rows for ~40k candidate docs)
    cand_ids = (
        pairs.select(F.col("id_a").alias(id_col))
        .unionAll(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    if bounded_pairs:
        # the candidate-id relation is post-aggregate (size estimate
        # unreliable), so without a hint the corpus-scale text relation
        # below sort-merge-shuffles per verify; with BOUNDED pairs
        # (the verified probe's batch-driven candidates) broadcasting
        # the id set streams the text map-side — zero corpus exchanges
        # before the candidate-only shingle stage (round 9).
        # GATED BY THE ACTUAL COUNT (round 10): the caller's bound is on
        # its BATCH, but the candidate-id set scales with batch×corpus
        # band collisions — a hot (band, bucket) could inflate it far
        # past what the batch size implies, and an unconditional
        # broadcast would then pressure driver/executor memory. pairs
        # is persisted above, so the count materializes the same work
        # the projections below reuse.
        if pairs.count() * 2 <= _VERIFY_BROADCAST_MAX_IDS:
            cand_ids = F.broadcast(cand_ids)
    # joined twice (a-side and b-side) — persist so shingling runs once.
    # Arrays are assembled from the codegen shingle explode (collect_set
    # over already-distinct rows) — the HOF array build was ~35× slower.
    # hint("merge"): the shingle-array relation is O(corpus-bytes) and
    # must NEVER broadcast — Catalyst's size estimate of a post-aggregate
    # relation is unreliable, and at 500k docs it picked a ~1.3 GB
    # broadcast that exceeded spark.driver.maxResultSize and killed the
    # job; pinning sort-merge keeps the join shuffle-partitioned at any N
    cand = df.join(cand_ids, id_col, "leftsemi")
    big_doc_ids = register(
        cand.select(id_col, F.length(_normalize(F.col(text_col))).alias("_len"))
        .filter(F.col("_len") > F.lit(max_array_shingles))
        .select(id_col)
        .persist()
    )

    def arrays_jaccard(p: DataFrame, docs: DataFrame) -> DataFrame:
        sh = register(
            exploded_char_shingles(docs, id_col, text_col, shingle_k)
            .groupBy(id_col)
            .agg(F.collect_set("sh").alias("sh"))
            .persist()
        ).hint("merge")
        return (
            p.join(sh.withColumnsRenamed({id_col: "id_a", "sh": "sh_a"}), "id_a")
            .join(sh.withColumnsRenamed({id_col: "id_b", "sh": "sh_b"}), "id_b")
            .withColumn(
                "n_inter", F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            )
            .withColumn(
                "jaccard",
                pround(
                    F.col("n_inter")
                    / (F.size("sh_a") + F.size("sh_b") - F.col("n_inter")),
                    6,
                ),
            )
            .select("id_a", "id_b", "jaccard")
        )

    # head(1) is one narrow job over the candidate docs (a length filter,
    # no explode); empty → the plan is exactly the pre-routing original.
    # The routing relation is fully consumed by that probe on this path,
    # so release it immediately instead of waiting for the registry sweep
    if not big_doc_ids.head(1):
        big_doc_ids.unpersist()
        return arrays_jaccard(pairs, cand)

    ba = big_doc_ids.withColumnRenamed(id_col, "id_a")
    bb = big_doc_ids.withColumnRenamed(id_col, "id_b")
    # disjoint split (no distinct needed): pairs with a big a-side, then
    # big b-side among the rest — all broadcast joins on id-only sides
    big_a = pairs.join(F.broadcast(ba), "id_a", "leftsemi")
    rest = pairs.join(F.broadcast(ba), "id_a", "left_anti")
    # select: equi-joins put the key column first — realign before the
    # positional union
    bigp = register(
        big_a.select("id_a", "id_b").unionAll(
            rest.join(F.broadcast(bb), "id_b", "leftsemi").select("id_a", "id_b")
        ).persist()
    )
    smallp = rest.join(F.broadcast(bb), "id_b", "left_anti").select("id_a", "id_b")
    # arrays only for docs a SMALL pair actually references — a doc
    # whose every pair touches an outlier would otherwise be shingled
    # here (unused) and again in the exploded path below
    small_ids = (
        smallp.select(F.col("id_a").alias(id_col))
        .unionAll(smallp.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    small = arrays_jaccard(smallp, cand.join(small_ids, id_col, "leftsemi"))
    # Exploded path: |A∩B| as an equi-join on the shingle VALUE
    # restricted to outlier-pair docs, counted per pair — rows, never
    # arrays. Shingles are recomputed for just these docs (tiny set).
    # Intersections are computed over DISTINCT pairs (a duplicated
    # input pair row would double every shingle match and inflate
    # n_inter) and joined back so duplicate pair rows still emit
    # duplicate output rows, matching the arrays path.
    bigd = register(bigp.distinct().persist())
    big_pair_ids = (
        bigd.select(F.col("id_a").alias(id_col))
        .unionAll(bigd.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    exb = register(
        exploded_char_shingles(
            df.join(F.broadcast(big_pair_ids), id_col, "leftsemi"),
            id_col,
            text_col,
            shingle_k,
        ).persist()
    )
    szb = exb.select(id_col, "_sz").distinct()
    inter = (
        bigd.join(exb.select(F.col(id_col).alias("id_a"), "sh").hint("merge"), "id_a")
        .join(
            exb.select(F.col(id_col).alias("id_b"), "sh").hint("merge"),
            ["id_b", "sh"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("double").alias("n_inter"))
    )
    bigv = (
        bigd.join(szb.withColumnsRenamed({id_col: "id_a", "_sz": "sz_a"}), "id_a")
        .join(szb.withColumnsRenamed({id_col: "id_b", "_sz": "sz_b"}), "id_b")
        .join(inter, ["id_a", "id_b"], "left")
        .withColumn("n_inter", F.coalesce("n_inter", F.lit(0.0)))
        .withColumn(
            "jaccard",
            pround(
                F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")),
                6,
            ),
        )
        .select("id_a", "id_b", "jaccard")
    )
    big = bigp.join(bigv, ["id_a", "id_b"]).select("id_a", "id_b", "jaccard")
    return small.unionAll(big)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 5,
    threshold: float = 0.8,
    prefilter: str = "minhash",
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs: every emitted (id_a, id_b,
    jaccard) is exact-verified at J ≥ threshold; ``prefilter`` picks the
    candidate-generation tier.

    ``prefilter='minhash'`` (default — the scale path, VERDICT r3 #3):
    candidates come from ``minhash_lsh_candidates`` with a high-recall
    band config (64 hashes / 16 bands of 4), then exact shingle-Jaccard
    verification. A pair at exactly J = t is bucketed with probability
    ``1 - (1 - t⁴)¹⁶`` ≈ 0.9998 at t = 0.8 (anything more similar does
    better: J = 0.9 misses at 2e-4, an exact dup never misses), so the
    output is identical to the lossless path up to that boundary sliver
    — measured identical on the 50k-doc planted-dup ladder corpus while
    cutting the 50k cell from ~48 s to single digits: the AllPairs
    prefix ranking (df-join + per-doc window over every exploded
    shingle) was the constant, and the banded signature pass replaces
    it with one explode + 64 map-side aggregates.

    ``prefilter='none'`` — provably LOSSLESS candidate generation
    (guaranteed-complete output; the test-mode/audit flag, and what the
    exact-oracle entry query uses). Candidate generation uses
    AllPairs/PPJoin *prefix filtering*, which is
    lossless: order every doc's shingles by global rarity (document
    frequency asc, shingle asc) and keep only the first
    ``|S| - ceil(t·|S|) + 1`` as join keys. If J(a,b) ≥ t then
    |a∩b| ≥ ceil(t·|a|) (and symmetrically for b), so the smallest common
    shingle under the global order must sit inside BOTH prefixes — the
    equi-join on prefix shingles finds every qualifying pair. A plain
    shared-shingle join is quadratic in the hottest shingle's document
    list; here hot shingles sort LAST and almost never enter a prefix, so
    candidate blow-up is bounded by rare-shingle co-occurrence (at t=0.8
    the prefix is ~20% of each doc's shingles). Two further lossless
    prunes ride the join condition ahead of the exact-Jaccard verify: the
    size filter (t·max ≤ min, float-safety epsilon) and PPJoin's
    POSITIONAL filter — a pair whose match sits at prefix ranks (i, j)
    can overlap in at most ``1 + min(|a|−i, |b|−j)`` shingles, which must
    reach the J ≥ t overlap requirement ``⌈t/(1+t)·(|a|+|b|)⌉``; matches
    deep in both prefixes can't, so corpora with non-trivial baseline
    similarity (where mid-rarity shingles reach prefixes) prune most
    candidates inside the join instead of shuffling them to the verify.
    """
    if prefilter not in ("minhash", "none"):
        raise ValueError(f"unknown prefilter {prefilter!r}")
    if prefilter == "minhash":
        # auto band config at a HIGH recall target (0.9995 at exactly
        # J=t; better above it) — the signature pass is linear and cheap
        # to widen, so the prefilter spends hashes to keep candidates
        # linear AND the output measurably identical to the lossless path
        nh, nb = auto_minhash_config(
            df.count(), threshold, target_recall=0.9995, max_hashes=384,
            candidate_budget_per_row=100.0,
        )
        cand = minhash_lsh_candidates(
            df, id_col, text_col,
            num_hashes=nh, bands=nb, shingle_k=shingle_k,
            jaccard_threshold=threshold, est_filter=True,
        )
        return verify_jaccard(df, cand, id_col, text_col, shingle_k).filter(
            F.col("jaccard") >= threshold
        )
    # persisted: consumed by both the document-frequency aggregate and the
    # prefix ranking join — caching keeps the shingle explode to one run.
    # Codegen explode (see exploded_char_shingles): the HOF array build
    # was the op's real bottleneck, ~35× slower, not the candidate join.
    sh = register(exploded_char_shingles(df, id_col, text_col, shingle_k).persist())
    dfreq = sh.groupBy("sh").agg(F.count("*").alias("_df"))
    # prefix length |S| - ceil(t*|S|) + 1; the -1e-9 guards against float
    # round-up (2.0000000001 -> ceil 3) which would SHRINK the prefix and
    # lose pairs — erring down only lengthens it (safe).
    plen = F.col("_sz") - F.ceil(F.lit(threshold) * F.col("_sz") - F.lit(1e-9)) + 1
    w = Window.partitionBy(id_col).orderBy("_df", "sh")
    prefix = (
        sh.join(dfreq, "sh")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= plen)
        .select(id_col, "_sz", "sh", "_rn")
    )
    # PPJoin overlap requirement for J >= t: |a ∩ b| >= t/(1+t)·(|a|+|b|);
    # the epsilon errs the ceiling DOWN (weaker bound — safe, lossless)
    alpha = F.ceil(
        F.lit(threshold / (1.0 + threshold))
        * (F.col("a._sz") + F.col("b._sz"))
        - F.lit(1e-9)
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            # J >= t forces t*max(|a|,|b|) <= min(|a|,|b|); epsilon keeps
            # exact-boundary pairs when t*max rounds a hair above min
            & (
                F.lit(threshold) * F.greatest("a._sz", "b._sz")
                <= F.least("a._sz", "b._sz") + F.lit(1e-9)
            )
            # positional filter: shingles before rank _rn in the global
            # per-doc order can't contribute (this is the FIRST common
            # shingle for pairs surviving distinct-min semantics — for
            # any common shingle it still upper-bounds the overlap), so
            # overlap <= 1 + min(|a| - _rn_a, |b| - _rn_b)
            & (
                F.lit(1)
                + F.least(
                    F.col("a._sz") - F.col("a._rn"),
                    F.col("b._sz") - F.col("b._rn"),
                )
                >= alpha
            ),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    return verify_jaccard(df, cand, id_col, text_col, shingle_k).filter(
        F.col("jaccard") >= threshold
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64) -> DataFrame:
    """64-bit SimHash per doc from word tokens.

    Per token: 64-bit xxhash64. Per bit b: sum over tokens of ±1 by bit —
    sign of the sum sets fingerprint bit b. Implemented as one explode +
    one groupBy with 64 codegen'd aggregate expressions (no Python).
    """
    tokens = _spread(df).select(
        F.col(id_col), F.explode(F.split(_normalize(F.col(text_col)), r"\s+")).alias("tok")
    ).withColumn("th", F.xxhash64("tok"))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("th"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(bits)
    ]
    sums = tokens.groupBy(id_col).agg(*aggs)
    fp = None
    for b in range(bits):
        bit = F.when(F.col(f"s{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, b)
        fp = term if fp is None else fp.bitwiseOR(term)
    return sums.select(F.col(id_col), fp.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_block: int | None = 4096,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ ``max_hamming``.

    Candidate generation: split the 64-bit fingerprint into
    ``max_hamming+1`` blocks — pigeonhole guarantees any pair within the
    distance shares at least one exact block. Join on (block_idx, block
    value), then verify with bit_count(xor).

    ``max_block`` (default on) is the dense-group guard — the same
    default-config hazard class as fixed LSH band/plane counts: block
    width is FORCED at ``64/(d+1)`` bits, so random fingerprints collide
    in some block with probability ~``(d+1)·2^-width`` and candidate
    mass grows ~N². Oversized (block, value) groups get a SECOND-LEVEL
    pigeonhole: a pair at distance ≤ d that matches block i exactly has
    all ≤ d differing bits in the remaining ``64-width`` bits, so at
    least one of their d+1 sub-blocks of that remainder matches exactly
    — the join key gains (sub_idx, sub_val) for those groups only, which
    is lossless and divides a dense group's quadratic by ~2^sub_width
    (identical-fingerprint cliques are true near-dup output and stay
    whole — at that density use clustering, not pair emission). Small
    groups keep the plain one-row key, so corpora that never trip the
    cap pay only the group-count aggregate.
    """
    nblocks = max_hamming + 1
    width = 64 // nblocks
    fps = simhash(df, id_col, text_col)
    blocks = fps.select(
        id_col,
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("blk"),
                    F.shiftrightunsigned(F.col("simhash"), i * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    .alias("val"),
                )
                for i in range(nblocks)
            ])
        ).alias("bb"),
    ).select(id_col, "simhash", "bb.blk", "bb.val")

    join_keys = ["blk", "val"]
    if max_block is not None:
        counts = blocks.groupBy("blk", "val").agg(F.count("*").alias("_n"))
        # remainder = the 64-width bits of simhash with block `blk`
        # excised (high part shifted down over the block's hole). Shift
        # amounts must be Python ints (PySpark's shift builtins reject
        # Column counts), so the remainder is a small CASE over the d+1
        # possible block indices, each branch with constant shifts; the
        # top block's branch is just the low mask (its high part is 0 —
        # and a shift by 64 would wrap to 0 under JVM semantics anyway)
        rem = None
        for i in range(nblocks):
            lowm = (1 << (i * width)) - 1
            if i == nblocks - 1:
                val = F.col("simhash").bitwiseAND(F.lit(lowm))
            else:
                val = F.shiftleft(
                    F.shiftrightunsigned(F.col("simhash"), (i + 1) * width),
                    i * width,
                ).bitwiseOR(F.col("simhash").bitwiseAND(F.lit(lowm)))
            rem = (
                F.when(F.col("blk") == i, val)
                if rem is None
                else rem.when(F.col("blk") == i, val)
            )
        sub_width = (64 - width) // nblocks
        sub_entries = [
            F.struct(
                F.lit(j).alias("sub"),
                F.shiftrightunsigned(rem, j * sub_width)
                .bitwiseAND(F.lit((1 << sub_width) - 1))
                .alias("sub_val"),
            )
            for j in range(nblocks)
        ]
        blocks = (
            blocks.join(counts, ["blk", "val"])
            .select(
                id_col,
                "simhash",
                "blk",
                "val",
                F.explode(
                    F.when(
                        F.col("_n") > max_block, F.array(*sub_entries)
                    ).otherwise(
                        F.array(
                            F.struct(
                                F.lit(-1).alias("sub"),
                                F.lit(0).cast("long").alias("sub_val"),
                            )
                        )
                    )
                ).alias("ss"),
            )
            .select(id_col, "simhash", "blk", "val", "ss.sub", "ss.sub_val")
        )
        join_keys = ["blk", "val", "sub", "sub_val"]

    a, b = blocks.alias("a"), blocks.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    for k in join_keys:
        cond = (F.col(f"a.{k}") == F.col(f"b.{k}")) & cond
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def contamination_check(
    df: DataFrame,
    benchmark_texts: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_words: int = 8,
) -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    ``ngram_words``-word shingle with a benchmark/eval set.

    The standard pretraining-hygiene check: explode word shingles of the
    corpus, semi-join against the (broadcast) benchmark shingle set, count
    hits per doc. Returns (id, n_contaminated_ngrams, contaminated).
    At 100 TB: benchmark shingles are small (broadcast); the corpus side is
    one explode + one map-side-combined groupBy — no full shuffle of text.
    """
    spark = df.sparkSession
    bench = spark.createDataFrame([(t,) for t in benchmark_texts], "text string")
    bench_sh = (
        bench.select(F.split(_normalize(F.col("text")), r"\s+").alias("_w"))
        .select(F.explode(shingles_of_words(F.col("_w"), ngram_words)).alias("sh"))
        .distinct()
    )
    doc_sh = (
        _spread(df)
        .select(F.col(id_col), F.split(_normalize(F.col(text_col)), r"\s+").alias("_w"))
        .select(
            F.col(id_col),
            F.explode(shingles_of_words(F.col("_w"), ngram_words)).alias("sh"),
        )
    )
    hits = (
        doc_sh.join(F.broadcast(bench_sh), "sh")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated_ngrams"))
    )
    return (
        df.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_contaminated_ngrams", F.lit(0)).alias("n_contaminated_ngrams"),
            (F.coalesce("n_contaminated_ngrams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def embedding_contamination(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Benchmark decontamination in EMBEDDING space: flag training vectors
    whose cosine to ANY benchmark/eval vector reaches ``threshold`` —
    catches paraphrased eval leakage that exact n-gram matching
    (``contamination_check``) misses.

    Returns (id, max_benchmark_cosine, contaminated). Scale shape: the
    benchmark set is small by definition → broadcast; every (train,
    bench) score is a map-side codegen'd dot product with a map-side
    partial MAX, so the only shuffle is the final per-id aggregation —
    no candidate generation needed because the benchmark side, not the
    corpus, bounds the pair count.
    """
    from data_engineering_capstone_project__spark.operators.similarity import cosine

    bench = benchmark.select(F.col(vec_col).alias("_bv"))
    scored = (
        df.select(F.col(id_col), F.col(vec_col))
        .crossJoin(F.broadcast(bench))
        .groupBy(id_col)
        .agg(F.max(cosine(F.col(vec_col), F.col("_bv"))).alias("_mc"))
    )
    return scored.select(
        id_col,
        pround(F.col("_mc"), 6).alias("max_benchmark_cosine"),
        (pround(F.col("_mc"), 6) >= threshold).alias("contaminated"),
    )


def embedding_near_dups(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cosine ≥ threshold).

    Brute-force within-join baseline; the LSH-bucketed scale path lives in
    ``operators.similarity.lsh_bucket_pairs``.
    """
    from data_engineering_capstone_project__spark.operators.similarity import cosine

    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", pround(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Near-dup pairs → clusters: connected components of the pair graph
    as (id, comp), comp = smallest id reachable from the node.

    Iterative min-label propagation (the "small-star" fixpoint): each round
    every node takes the min label among itself and its neighbours; stops
    when no label changes. Rounds needed = graph diameter — tiny for dup
    clusters (near-cliques), so a handful of shuffles on the edge list.
    ``localCheckpoint`` cuts the lineage each round so the plan stays flat.
    At 100 TB the edge list is the small side (pairs that survived LSH +
    verification), not the corpus.
    """
    fwd = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = fwd.union(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().persist()
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    changed = -1
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("comp").alias("_nbr"))
        )
        # lazy checkpoint: the convergence count below is the action that
        # materializes it, so each round runs ONE job (join + checkpoint +
        # count) instead of an eager-checkpoint job plus a count job
        new_labels = (
            labels.join(nbr_min, labels.id == nbr_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce(F.col("_nbr"), F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.withColumnRenamed("comp", "_new")
            .join(labels, "id")
            .filter(F.col("_new") != F.col("comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    if changed != 0:
        import warnings

        warnings.warn(
            f"connected_components did not converge within max_iter={max_iter} "
            f"rounds ({changed} labels still changing); components are WRONG for "
            "chains longer than max_iter hops — raise max_iter",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels


def dedup_by_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Purge near-duplicates: keep one representative (the smallest id) per
    connected cluster of ``pairs``, plus every row not in any pair.

    This is the step after candidate generation (MinHash-LSH / SimHash /
    embedding cosine) that actually shrinks the corpus: pairs → clusters →
    anti-join the non-representatives. The anti join broadcasts when the
    loser set is small (the common case after verification).
    """
    comp = connected_components(pairs, id_a=id_a, id_b=id_b)
    losers = comp.filter(F.col("comp") != F.col("id")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


# odd 64-bit multiplier (2^64/φ, forced odd → invertible mod 2^64) for
# the winnowing detect tier's polynomial rolling hash
_WINNOW_B = 0x9E3779B97F4A7C15
_WINNOW_BINV = pow(_WINNOW_B, -1, 1 << 64)


def _sliding_min(H, w: int):
    """O(M log w) sliding-window minimum via sparse-table doubling: with
    p = the largest power of two ≤ w, build T[i] = min(H[i:i+p]) in
    ⌈log₂ p⌉ CONTIGUOUS elementwise-minimum passes, then each width-w
    window is the min of its two overlapping width-p sub-windows. Every
    pass is a dense vectorized loop over aligned slices — measured ~4×
    faster than the previous van Herk/Gil-Werman block formulation,
    whose reverse-strided ``minimum.accumulate`` and arange fancy-gather
    dominated the winnow kernel (the r8 50 s 500k-ladder constant;
    VERDICT r8 #5). Input must be SIGNED int64: numpy has no fast loop
    for uint64 minimum — winnowing only needs a deterministic
    content-defined comparator, not unsigned order, so callers view
    their uint64 hashes as int64 first."""
    import numpy as np

    M = len(H)
    if w <= 1:
        return H
    if M < w:
        # no full window exists: return empty (as the old block
        # formulation did). Without this guard the doubling passes can
        # raise a numpy broadcast ValueError when len(T) shrinks past
        # the final two-sub-window minimum (e.g. M=5, w=7) — currently
        # unreachable from winnow (it filters docs shorter than the
        # window) but a latent trap for any new caller.
        return H[:0]
    p = 1 << (w.bit_length() - 1)
    if p > w:
        p >>= 1
    T = H
    c = 1
    while c < p:
        T = np.minimum(T[:-c], T[c:])
        c *= 2
    n = M - w + 1
    return np.minimum(T[:n], T[w - p : w - p + n])


def _gram_hashes(raw, k: int):
    """Position-independent hashes of every k-byte gram of ``raw``
    (uint8 array): ``H[p] = hash(raw[p:p+k])`` for p in [0, len-k],
    via a wrapping-uint64 polynomial rolling hash — one cumprod for
    ``B^i``, one cumsum of ``c[i]·B^i`` (so a gram's sum is
    ``S[p+k]−S[p] = B^p·hash``), one cumprod of ``B^{-1}`` to unscale.
    O(bytes), no per-position substring. Content-defined: equal gram
    bytes ⇒ equal hash at ANY two positions (the property winnowing's
    detection guarantee rests on; hypothesis-tested). Returned as an
    int64 VIEW — see ``_sliding_min`` for why the comparator runs
    signed."""
    import numpy as np

    c = raw.astype(np.uint64)
    L = len(c)
    M = L - k + 1
    B = np.uint64(_WINNOW_B)
    BINV = np.uint64(_WINNOW_BINV)
    pows = np.full(L, B, dtype=np.uint64)
    pows[0] = 1
    np.cumprod(pows, out=pows)
    S = np.zeros(L + 1, dtype=np.uint64)
    np.cumsum(c * pows, out=S[1:])
    ipows = np.full(M, BINV, dtype=np.uint64)
    ipows[0] = 1
    np.cumprod(ipows, out=ipows)
    return ((S[k:] - S[:-k]) * ipows).view(np.int64)


def winnow_runs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "_norm",
    window: int = 50,
    k: int | None = None,
) -> DataFrame:
    """Winnowing fingerprint RUNS per doc (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003): ``(id, s, e, fp)`` rows where ``fp`` is the minimum
    k-gram hash over the ``w`` hash positions inside the ``window``-char
    window, and ``[s, e]`` is a maximal run of consecutive (1-based,
    char-indexed) window-start positions sharing that minimum.

    k and w are derived so ``k + w - 1 == window`` (k = ⌈window/2⌉), so
    every window-char window contains EXACTLY one full hash window — its
    min is the window's fingerprint, and the detection guarantee is
    positional and tight: a ``window``-char substring duplicated across
    docs has identical fingerprint at every occurrence (equal chars ⇒
    equal bytes ⇒ equal hash content), so every occurrence's position
    lies in a run whose fp value appears in ≥ 2 rows. Selection is
    content-defined (no stride), hence alignment-free; hash collisions
    only ADD shared fps — the safe direction for a candidate tier.
    Expected run density ≈ 2/(w+1) of corpus positions.

    Implementation: Arrow-batched ``mapInPandas``, everything vectorized
    numpy per batch — docs concatenate into one byte array; k-gram
    hashes come from a wrapping-uint64 polynomial rolling hash (two
    cumprods + one cumsum — O(bytes), no per-position substring); the
    sliding minima from the O(M) block trick (``_sliding_min``); char
    positions from a continuation-byte cumsum so multi-byte text maps
    bytes→chars exactly. The pure-SQL alternative needs either a
    higher-order ``transform`` (CodegenFallback — interpreted per
    element, the 35× trap ``exploded_char_shingles`` documents) or a
    corpus-sized window-function shuffle; this kernel shuffles nothing
    and emits only the run rows.
    """
    import numpy as np
    import pandas as pd

    if k is None:
        k = max(1, window - window // 8)
    if not 1 <= k <= window:
        raise ValueError(f"winnow k={k} outside [1, window={window}]")
    w = window - k + 1
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("s", T.IntegerType(), False),
            T.StructField("e", T.IntegerType(), False),
            T.StructField("fp", T.LongType(), False),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            enc = [t.encode("utf-8") for t in pdf[text_col]]
            # docs under `window` BYTES are under `window` chars — they can
            # neither own nor contain a cuttable span; skip them
            keep = [i for i, b in enumerate(enc) if len(b) >= window]
            if not keep:
                continue
            docs = [enc[i] for i in keep]
            kept_ids = ids[keep]
            lens = np.fromiter((len(b) for b in docs), dtype=np.int64, count=len(docs))
            raw = np.frombuffer(b"".join(docs), dtype=np.uint8)
            # ci[b] = 1-based char ordinal of byte b (UTF-8 continuation
            # bytes don't start a char) — exact byte→char position mapping
            ci = np.cumsum((raw & 0xC0) != 0x80)
            # position-independent k-gram hashes (boundary-crossing grams
            # are computed but never read — window starts stay in-doc)
            H = _gram_hashes(raw, k)
            mins = _sliding_min(H, w)
            # valid window starts for doc j (byte span [s_j, s_j+len_j)):
            # g ∈ [s_j, s_j + len_j - window]
            starts = np.zeros(len(docs), dtype=np.int64)
            starts[1:] = np.cumsum(lens[:-1])
            reps = lens - window + 1  # ≥ 1 by the keep filter
            total = int(reps.sum())
            ends = np.cumsum(reps)
            g = np.arange(total, dtype=np.int64) - np.repeat(ends - reps, reps)
            g += np.repeat(starts, reps)
            doc_idx = np.repeat(np.arange(len(docs), dtype=np.int64), reps)
            sel = mins[g]
            # maximal runs of equal min per doc (winnowing reuses the same
            # min across ~w/2 consecutive windows)
            rs_mask = np.empty(total, dtype=bool)
            rs_mask[0] = True
            rs_mask[1:] = (sel[1:] != sel[:-1]) | (doc_idx[1:] != doc_idx[:-1])
            rs = np.flatnonzero(rs_mask)
            re_ = np.empty_like(rs)
            re_[:-1] = rs[1:] - 1
            re_[-1] = total - 1
            d = doc_idx[rs]
            sj = starts[d]
            cis = ci[sj]  # char ordinal of each doc's first byte
            # byte run [g_a, g_b] → candidate char window starts
            # [cpos(g_a+window-1) - (window-1), cpos(g_b)] (1-based local);
            # for ASCII this is exactly [g_a-s_j+1, g_b-s_j+1]
            lo = ci[g[rs] + window - 1] - cis + 1 - (window - 1)
            hi = ci[g[re_]] - cis + 1
            nch = ci[sj + lens[d] - 1] - cis + 1  # doc length in chars
            lo = np.maximum(lo, 1)
            hi = np.minimum(hi, nch - window + 1)
            ok = lo <= hi
            yield pd.DataFrame(
                {
                    id_col: kept_ids[d[ok]],
                    "s": lo[ok].astype(np.int32),
                    "e": hi[ok].astype(np.int32),
                    "fp": sel[rs][ok].view(np.int64),
                }
            )

    # NULL text would reach the kernel as None (e.g. substring_span_dedup's
    # _normalize(NULL) stays NULL) and crash `t.encode` — such rows can't
    # own or contain a span, so drop them here exactly like detect='full'
    # drops them via its length filter
    return (
        df.select(id_col, text_col)
        .filter(F.col(text_col).isNotNull())
        .mapInPandas(gen, schema=out_schema)
    )


def substring_span_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 50,
    stride: int = 1,
    detect: str = "winnow",
) -> DataFrame:
    """Exact substring-span dedup, first-occurrence-wins (the character-
    level analogue of Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better": long verbatim repeats across documents are
    REMOVED from every doc but their first occurrence, not whole-doc
    deduped — boilerplate, licenses, and quoted chunks inside otherwise-
    unique documents).

    Contract (deterministic, oracle-reproducible): every ``window``-char
    substring of the normalized text is hashed (``stride=1`` default — a
    window occurring in an earlier (min (doc, pos)) document marks its
    span duplicated; per doc, overlapping duplicated windows merge into
    maximal spans which are cut out. At stride 1 detection is EXACT:
    any cross-doc verbatim repeat of ≥ ``window`` chars is found with
    exact span edges; repeats shorter than ``window`` (or docs shorter
    than ``window``) are never touched. ``stride > 1`` cuts the explode
    cost by that factor but detects only repeats whose offsets in the
    two documents agree mod ``stride`` (plus edge slack) — the fast
    sweep setting, not the exactness setting. Returns ``(id,
    clean_text, n_removed)`` over the NORMALIZED text.

    **Two tiers** (``detect='winnow'``, the default): a winnowing pass
    (``winnow_runs`` — content-defined fingerprint runs at ~2/(w+1) of
    corpus positions, computed by an O(bytes) numpy kernel that shuffles
    nothing) first finds the POSITIONS whose window can possibly be
    cross-doc duplicated: with ``k + w - 1 == window`` each window-char
    window contains exactly one full hash window, so a duplicated window
    at position p forces p's fingerprint value to appear in ≥ 2 rows —
    and EVERY occurrence of that window (the would-be owner included)
    lands in a surviving run. The exact stride-hash refine then runs
    over the merged shared-run intervals only. Output is BYTE-IDENTICAL
    to ``detect='full'`` (the single-tier audit path): the restriction
    keeps every occurrence of every cross-doc-shared window, so the
    per-window first-occurrence owner over candidate positions equals
    the owner over all positions — no cut missed, no edge moved
    (regression-tested, incl. misaligned repeats and multi-byte text).
    Doc-level pruning is NOT enough at scale: organic ≥window repeats in
    a 500k-doc Zipf corpus touch 99% of docs, but only a few % of
    positions — position-level pruning is what scales with shared-
    content volume instead of corpus volume.

    Scale shape: the detect kernel is an Arrow-batched scan (no
    shuffle); shared-run selection is one narrow count-over-fp window;
    the refine explodes only candidate positions (window identity
    shuffles as two independent xxhash64 longs — 128 bits, the same
    collision class as md5 at a third of the bytes — never text) and
    finds each hash's first occurrence with a single min-struct WINDOW
    over the hash partition — one shuffle+sort of candidate rows,
    replacing the former aggregate + self-join-back that computed the
    corpus-sized hash explode twice and sorted it twice. Span assembly is a per-doc interval merge over
    DUPLICATED positions only, and the final cut is one higher-order
    fold per doc. Persisted intermediates are released via
    ``cachereg.release_intermediates()`` after consumption.
    """
    if detect not in ("winnow", "full"):
        raise ValueError(f"unknown detect {detect!r}")
    n = F.length("_norm")
    base = register(
        _spread(df)
        .select(F.col(id_col), _normalize(F.col(text_col)).alias("_norm"))
        .persist()
    )

    if detect == "winnow":
        runs = winnow_runs(base, id_col, "_norm", window)
        # fp shared by ≥2 rows ⇒ possibly cross-doc duplicated positions;
        # same-doc-only repeats survive here (superset — the refine's
        # owner filter drops them) but never reach the output wrongly
        shared = F.count("*").over(Window.partitionBy("fp"))
        cand = (
            runs.withColumn("_c", shared)
            .filter(F.col("_c") >= 2)
            .select(id_col, "s", "e")
        )
        # merge overlapping/adjacent intervals per doc BEFORE exploding —
        # neighbouring runs of different fps overlap, and exploding the
        # raw runs would emit each shared position several times
        byid = Window.partitionBy(id_col).orderBy("s")
        pme = F.max("e").over(byid.rowsBetween(Window.unboundedPreceding, -1))
        merged = (
            cand.withColumn(
                "_nw",
                F.when(pme.isNull() | (F.col("s") > pme + 1), 1).otherwise(0),
            )
            .withColumn("_g", F.sum("_nw").over(byid))
            .groupBy(id_col, "_g")
            .agg(F.min("s").alias("s"), F.max("e").alias("e"))
        )
        pos = merged.join(base, id_col).select(
            id_col,
            "_norm",
            F.explode(F.sequence(F.col("s"), F.col("e"))).alias("p"),
        )
        if stride > 1:
            # preserve the global stride grid (positions ≡ 1 mod stride)
            pos = pos.filter(F.pmod(F.col("p") - F.lit(1), F.lit(stride)) == 0)
    else:
        pos = base.filter(n >= window).select(
            id_col,
            "_norm",
            F.explode(
                F.sequence(F.lit(1), n - (window - 1), F.lit(stride))
            ).alias("p"),
        )

    # window identity = TWO independent 64-bit xxhash64 values (128 bits
    # — the same negligible-collision class as the md5 string it
    # replaces, at ~1/3 the shuffle width and long-compare sort cost
    # instead of string compares). The substring is projected once and
    # both hashes read the attribute (the ≥2-references rule keeps the
    # projection boundary, so the substr isn't re-extracted per hash).
    wrows = pos.select(
        id_col,
        "p",
        F.col("_norm").substr(F.col("p"), F.lit(window)).alias("_wsub"),
    ).select(
        id_col,
        "p",
        F.xxhash64("_wsub").alias("wh1"),
        F.xxhash64("_wsub", F.lit(1)).alias("wh2"),
    )
    # first occurrence per window hash as ONE pass: a window aggregate
    # over the hash partition (no orderBy → whole-partition frame). The
    # former groupBy+join-back shape computed the hash explode TWICE
    # (partial aggregation changes the exchange, so Spark can't reuse it
    # across the aggregate and the probe) and sort-merge-sorted both
    # sides. The aggregate is a PRIMITIVE `min(id)` — cut semantics only
    # ever compare the row's doc id to the owner DOC (positions inside
    # the owning doc are kept wholesale), so the earlier min-struct
    # (id, p) window carried a per-row struct allocation for a field
    # nothing read; the long-min state is the cheapest the corpus-sized
    # window shuffle can be (round-6 allocation cut for the 500k
    # stability band, VERDICT r5 #5/#3).
    o = F.min(F.col(id_col)).over(Window.partitionBy("wh1", "wh2"))
    dup = (
        wrows.withColumn("_oid", o)
        .filter(F.col(id_col) != F.col("_oid"))
        .select(id_col, "p")
    )
    # gaps-and-islands interval merge: a window starts a new span when
    # its start exceeds the running max end of earlier windows in the doc
    byp = Window.partitionBy(id_col).orderBy("p")
    prev_end = F.max(F.col("p") + window).over(
        byp.rowsBetween(Window.unboundedPreceding, -1)
    )
    spans = (
        dup.withColumn(
            "_new",
            F.when(prev_end.isNull() | (F.col("p") > prev_end), 1).otherwise(0),
        )
        .withColumn("_g", F.sum("_new").over(byp))
        .groupBy(id_col, "_g")
        .agg(F.min("p").alias("s"), (F.max("p") + window).alias("e"))
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list(F.struct("s", "e"))).alias("sp"))
    )
    joined = base.join(spans, id_col, "left")
    norm = F.col("_norm")
    folded = F.aggregate(
        F.col("sp"),
        F.struct(F.lit(1).alias("cur"), F.lit("").alias("txt")),
        lambda acc, x: F.struct(
            x["e"].alias("cur"),
            F.concat(
                acc["txt"],
                norm.substr(acc["cur"], F.greatest(x["s"] - acc["cur"], F.lit(0))),
            ).alias("txt"),
        ),
        lambda acc: F.concat(acc["txt"], norm.substr(acc["cur"], F.length(norm))),
    )
    clean = F.when(F.col("sp").isNull(), norm).otherwise(folded)
    return joined.select(
        F.col(id_col),
        clean.alias("clean_text"),
        (F.length(norm) - F.length(clean)).alias("n_removed"),
    )


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = r"\n",
    join_sep: str = "\n",
) -> DataFrame:
    """Corpus-level exact paragraph dedup (RefinedWeb/CCNet-style): each
    distinct paragraph survives only at its first occurrence in the corpus
    — the (lowest ``id``, earliest position) — and every later occurrence,
    across documents AND repeated within one document, is dropped.
    Documents are reassembled from surviving paragraphs in original order;
    documents left with zero paragraphs disappear.

    Returns (id, text, n_kept, n_dropped).

    Plan shape (the 100 TB story): one ``posexplode``, a
    ``groupBy(paragraph-key).min(occurrence)`` whose map-side partial
    absorbs hot-paragraph skew (a boilerplate line occurring in every doc
    collapses to one row per map partition before the shuffle — same
    property as ``exact_dedup``), an equi join back on the key, and one
    per-doc reassembly aggregation. Paragraphs shuffle as 32-char md5
    keys, never as full text. The occurrence is encoded as
    ``id * 2^20 + position`` so "first" is a single BIGINT ``min``
    (documents are capped at 2^20 paragraphs; ids must fit 43 bits).
    """
    pos_bits = 1 << 20
    parts = (
        _spread(df)
        .select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), sep)).alias("_pos", "_para"),
        )
        .withColumn("_trim", F.trim(F.col("_para")))
        .filter(F.length("_trim") > 0)
        .select(
            id_col,
            "_pos",
            "_para",
            F.md5(F.col("_trim")).alias("_key"),
            (F.col(id_col).cast("long") * pos_bits + F.col("_pos")).alias("_occ"),
        )
    )
    first = parts.groupBy("_key").agg(F.min("_occ").alias("_first"))
    flagged = parts.join(first, "_key").withColumn(
        "_keep", F.col("_occ") == F.col("_first")
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.concat_ws(
                join_sep,
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("_keep"), F.struct("_pos", "_para"))
                        )
                    ),
                    lambda s: s["_para"],
                ),
            ).alias(text_col),
            F.sum(F.col("_keep").cast("long")).alias("n_kept"),
            F.sum((~F.col("_keep")).cast("long")).alias("n_dropped"),
        )
        .filter(F.col("n_kept") > 0)
    )


def dedup_against_corpus(
    new_df: DataFrame,
    corpus_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    corpus_fps: DataFrame | None = None,
    fp_col: str = "fp",
    bounded_batch: bool = False,
) -> DataFrame:
    """Incremental ingest dedup: keep only new-batch rows whose normalized
    fingerprint is BOTH unseen in the existing corpus and first (lowest id)
    within the batch itself.

    The corpus side reduces to distinct fingerprints — one 32-char column,
    not full text. Within-batch dedup reuses the min-id-wins rule of
    ``exact_dedup`` but keeps whole rows (groupBy min + join back, no
    window).

    **Durable-index path**: pass ``corpus_fps=`` a precomputed fingerprint
    index (``streaming.corpus_fingerprint_index`` output, typically
    reloaded via ``sources.artifacts.load_fingerprint_index`` or the
    ingest loop's ``load_fingerprint_log``) and the corpus text is never
    touched — the production shape, where the index is written once and
    every ingest batch probes it (``corpus_df`` is then ignored and may
    be None).

    **Probe shape at 100 TB** (round 9): the naive
    ``batch ANTI index`` join cannot broadcast (the build side of a
    LeftAnti BroadcastHashJoin is the right side — the corpus-sized
    index), so past the broadcast threshold it sort-merge-shuffles the
    WHOLE index every tick. ``bounded_batch=True`` — what the ingest
    tick passes when its batch count is under the broadcast ceiling
    (the stream-static guards make the same flip inside
    ``minhash_band_probe{,_verified}``, their micro-batches being
    bounded by definition) — decomposes it as::

        matched = index LEFT SEMI broadcast(batch fingerprints)
        kept    = batch LEFT ANTI matched        # |matched| <= |batch|

    algebraically identical (A ∖ B == A ∖ (B ∩ A)), but the index is
    now scanned map-side with ZERO exchanges on the index side, and the
    anti join's right side is at most batch-sized (AQE broadcasts it
    from its actual size). The default (False) keeps the symmetric
    single anti join — correct when the 'batch' may be the huge side
    (e.g. decontaminating a whole corpus against a small benchmark
    index, where the index is the broadcastable side and AQE already
    picks that).
    """
    if corpus_fps is not None:
        seen = corpus_fps.select(F.col(fp_col).alias("_fp"))
    elif corpus_df is not None:
        seen = corpus_df.select(
            fingerprint(F.col(text_col)).alias("_fp")
        ).distinct()
    else:
        raise ValueError(
            "dedup_against_corpus: need corpus_df or corpus_fps"
        )
    batch = new_df.withColumn("_fp", fingerprint(F.col(text_col)))
    winners = batch.groupBy("_fp").agg(F.min(id_col).alias("_w"))
    kept = (
        batch.join(winners, "_fp")
        .filter(F.col(id_col) == F.col("_w"))
        .drop("_w")
    )
    if bounded_batch:
        probe_fps = kept.select("_fp").distinct()
        matched = seen.join(F.broadcast(probe_fps), "_fp", "left_semi")
        return kept.join(matched, "_fp", "left_anti").drop("_fp")
    return kept.join(seen, "_fp", "left_anti").drop("_fp")


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int | None = None,
    threshold: float = 0.99,
    sample_rows: int = 10_000,
    seed: int = 42,
    target_cell: int = 256,
    fit: str = "sample",
) -> DataFrame:
    """SemDeDup (Abbas et al., 2023, arXiv:2303.09540): coarse k-means over
    the embedding space, exact cosine near-dup pairs only WITHIN a cluster,
    then the standard connected-components purge keeping the lowest id per
    semantic group.

    Scale shape: centroid training is a bounded driver-side sample
    (``kmeans_centroids``); cluster assignment is an O(k) codegen'd
    expression per row (no shuffle); the pair join is equi on ``_cell`` so
    its cost is Σ_c n_c². With ``n_clusters=None`` (the default) k is
    auto-sized from a corpus count — ``clamp(⌈N/target_cell⌉, 16, 256)``,
    the IVF sizing rule — so cells stay ~``target_cell`` rows and in-cell
    verify work grows linearly instead of the N²/k quadratic a FIXED k
    gives (the same default-config hazard class as fixed LSH planes/bands;
    see ``auto_lsh_config``/``auto_minhash_config``). The k ≤ 256 cap
    bounds the per-row assignment expression (k literal-centroid dot
    products); past ~65k×target_cell rows the cap binds and cells grow
    again — callers at that scale should raise ``target_cell`` (cheap) or
    pass an explicit cluster-sized ``n_clusters``. Recall is approximate
    (a near-dup pair straddling a cell boundary is missed — the
    documented SemDeDup trade); every RETURNED pair is exact (verified
    cosine).

    ``fit="distributed"`` trains centroids with the full-corpus Lloyd
    fit (``similarity.kmeans_fit`` — deterministic k-means‖ init, every
    pass a Spark job) and assigns via the broadcast ``centroid_frame``
    (codegen compiled once, no literal-plan-size cap on k): better
    centroids than the bounded sample on multi-modal corpora, at the
    cost of ``n_iter`` full passes. Default ``"sample"`` keeps the
    corpus-size-independent sampled trainer.
    """
    from data_engineering_capstone_project__spark.operators.similarity import (
        argmin_cell,
        cosine,
        ivf_cell_scores,
        kmeans_assign,
        kmeans_centroids,
        kmeans_fit,
    )

    if n_clusters is None:
        n = df.count()
        n_clusters = max(16, min(256, -(-n // max(target_cell, 1))))

    if fit == "distributed":
        cents, _ = kmeans_fit(
            df, k=n_clusters, vec_col=vec_col, n_iter=5, seed=seed
        )
        cells = kmeans_assign(df, cents, vec_col=vec_col, out_col="_cell")
    elif fit == "sample":
        cents = kmeans_centroids(
            df,
            vec_col=vec_col,
            n_centroids=n_clusters,
            sample_rows=sample_rows,
            seed=seed,
        )
        cells = (
            df.withColumn("_scores", ivf_cell_scores(F.col(vec_col), cents))
            .withColumn("_cell", argmin_cell(F.col("_scores")))
            .drop("_scores")
        )
    else:
        raise ValueError(f"semantic_dedup: unknown fit {fit!r}")
    a = cells.select(
        F.col("_cell"), F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va")
    )
    b = cells.select(
        F.col("_cell"), F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb")
    )
    pairs = (
        a.join(b, ["_cell"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", pround(cosine(F.col("_va"), F.col("_vb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
    return dedup_by_clusters(df, pairs, id_col=id_col)


def leakage_safe_split(
    df: DataFrame,
    group_col: str,
    test_fraction: float = 0.1,
    salt: str = "",
) -> tuple[DataFrame, DataFrame]:
    """Train/test split that cannot leak duplicates across the boundary.

    ``train_test_split`` hashes the ROW id, so two near-identical documents
    (same content, different ids) can land on opposite sides — the classic
    eval-contamination bug: the model "generalizes" to test data it
    memorized from train. Here the split decision hashes the GROUP key
    instead — the content ``fingerprint`` for exact dups, or the dedup
    ladder's cluster representative (``connected_components`` label) for
    near-dups — so every member of a duplicate group lands on the same
    side, structurally.

    Same md5-prefix mechanics as ``relational.sample_by_hash``: stable
    under data growth and re-runs, engine-portable, and a pure codegen'd
    scan filter — no shuffle, no join, each side is one pass.
    """
    from data_engineering_capstone_project__spark.operators.relational import (
        _hash_threshold,
    )

    if not 0.0 <= test_fraction <= 1.0:
        raise ValueError(f"test_fraction must be in [0,1], got {test_fraction}")
    h = F.substring(
        F.md5(F.concat_ws("|", F.col(group_col).cast("string"), F.lit(salt))),
        1,
        4,
    )
    is_test = h < F.lit(_hash_threshold(test_fraction))
    if test_fraction >= 1.0:  # threshold 'g' keeps everything on the test side
        is_test = F.lit(True)
    return df.filter(~is_test), df.filter(is_test)
