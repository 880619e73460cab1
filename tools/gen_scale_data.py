"""Generate a self-consistent dedup-ladder dataset at three scales
(5k / 15k / 50k docs — up to 10x the driver's sf0.1) for
``tools/scale_sweep.py --ladder`` (VERDICT r2 next-round #6).

Why not just 10x the driver documents: the driver generator draws every
document from a ~40-word vocabulary, so ANY two documents share ~40% of
their shingles — the whole corpus is one giant near-dup cluster by
construction. Real corpora are sparse: unrelated documents share almost
nothing, and near-dup operators earn their keep by pruning candidates.
At 5k docs the driver data still finishes because N² is small; at 50k
it degenerates into ~1e9 genuinely-similar candidate pairs, which
measures the data pathology, not the operator. This generator keeps the
driver's document SHAPE (length distribution, lang/source mix) but
draws from a 5,000-word vocabulary, and plants measurable work: 2% exact
duplicates and 2% near-duplicates (5% of words substituted) per scale,
plus embedding near-dup pairs come from the sweep's own planting.

Deterministic (seed=42), writes /tmp/spark_graft_ladder/{n}/…; derived
data — regenerate any time, never touches /root/testdata. ``--big`` adds
the 500k-doc scale (100× over the smallest rung); documents stream to
parquet in 25k-doc row groups so generation memory stays bounded at any
scale.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

OUT_ROOT = "/tmp/spark_graft_ladder"
SCALES = [5_000, 15_000, 50_000]
BIG_SCALE = 500_000  # opt-in with --big: the 100x decade (VERDICT r3 #6)
VEC_FRACTION = 0.4  # embeddings rows = 0.4 x docs (driver ratio)
DIM = 64
VOCAB = 5_000
SEED = 42


def main() -> None:
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    con = duckdb.connect()
    lens = np.array(
        [
            r[0]
            for r in con.execute(
                "SELECT len(string_split(text, ' ')) FROM "
                "read_parquet('/root/testdata/sf0.1/documents.parquet')"
            ).fetchall()
        ]
    )
    langs_counts = con.execute(
        "SELECT lang, COUNT(*) FROM "
        "read_parquet('/root/testdata/sf0.1/documents.parquet') GROUP BY 1"
    ).fetchall()
    lang_names = [l for l, _ in langs_counts]
    lang_p = np.array([c for _, c in langs_counts], dtype=float)
    lang_p /= lang_p.sum()

    rng = np.random.default_rng(SEED)
    # random-letter words: near-dup ops shingle at the CHARACTER level, so
    # vocabulary sparsity must hold for char n-grams too — "w0042"-style
    # tokens all share the wDDDD pattern and re-create the dense-shingle
    # pathology; 8 random letters make intra-word 5-grams ~unique per word
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    vocab_set: set[str] = set()
    while len(vocab_set) < VOCAB:
        vocab_set.add("".join(letters[rng.integers(0, 26, size=8)]))
    vocab = np.array(sorted(vocab_set))
    # Zipf word frequencies, like natural language: a UNIFORM vocabulary
    # has no rare words at corpus scale (every shingle's df grows with N,
    # so AllPairs prefix filtering finds nothing rare to anchor on and
    # candidate pairs grow ~N² — measured: 4s/21s/>900s at 5k/15k/50k).
    # The Zipf tail keeps genuinely rare shingles at every corpus size,
    # which is the property prefix filtering (and real text) relies on.
    zipf_w = 1.0 / np.arange(1, VOCAB + 1) ** 1.1
    zipf_p = zipf_w / zipf_w.sum()

    scales = SCALES + ([BIG_SCALE] if "--big" in sys.argv else [])
    for n_docs in scales:
        out_dir = os.path.join(OUT_ROOT, str(n_docs))
        os.makedirs(out_dir, exist_ok=True)
        n_base = int(n_docs * 0.96)
        n_exact = int(n_docs * 0.02)
        n_near = n_docs - n_base - n_exact

        # STREAMING write (one ParquetWriter, chunked row groups) so the
        # 500k-doc scale (~1 GB of text) never materializes in memory; a
        # bounded pool of base docs provides the dup-planting sources
        doc_path = os.path.join(out_dir, "documents.parquet")
        writer = None
        doc_id = 0
        pool: list[str] = []
        pool_cap = min(n_base, 20_000)

        def flush(texts: list[str]) -> None:
            nonlocal writer, doc_id
            tbl = pa.table(
                {
                    "doc_id": pa.array(
                        range(doc_id, doc_id + len(texts)), pa.int64()
                    ),
                    "text": pa.array(texts, pa.string()),
                    "lang": pa.array(
                        [
                            lang_names[int(rng.choice(len(lang_names), p=lang_p))]
                            for _ in range(len(texts))
                        ],
                        pa.string(),
                    ),
                    "source": pa.array(
                        [f"src{int(rng.integers(0, 10))}" for _ in range(len(texts))],
                        pa.string(),
                    ),
                    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
                }
            )
            if writer is None:
                writer = pq.ParquetWriter(doc_path, tbl.schema)
            writer.write_table(tbl)
            doc_id += len(texts)

        chunk = 25_000
        remaining = n_base
        while remaining:
            b = min(chunk, remaining)
            texts = []
            for _ in range(b):
                n = int(lens[rng.integers(0, len(lens))])
                texts.append(
                    " ".join(vocab[rng.choice(VOCAB, size=n, p=zipf_p)])
                )
            if len(pool) < pool_cap:
                pool.extend(texts[: pool_cap - len(pool)])
            flush(texts)
            remaining -= b
        # planted exact dups: copies of pooled base docs
        for lo in range(0, n_exact, chunk):
            b = min(chunk, n_exact - lo)
            flush([pool[int(i)] for i in rng.integers(0, len(pool), size=b)])
        # planted near dups: ~5% of words substituted
        for lo in range(0, n_near, chunk):
            b = min(chunk, n_near - lo)
            texts = []
            for i in rng.integers(0, len(pool), size=b):
                words = pool[int(i)].split(" ")
                k = max(1, len(words) // 20)
                for j in rng.integers(0, len(words), size=k):
                    words[int(j)] = str(vocab[int(rng.choice(VOCAB, p=zipf_p))])
                texts.append(" ".join(words))
            flush(texts)
        writer.close()

        n_vecs = int(n_docs * VEC_FRACTION)
        vecs = rng.standard_normal((n_vecs, DIM)).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(range(n_vecs), pa.int64()),
                    "embedding": pa.array(
                        [v.tolist() for v in vecs], pa.list_(pa.float32())
                    ),
                }
            ),
            os.path.join(out_dir, "embeddings.parquet"),
        )
        print(f"wrote {out_dir}: {n_docs} docs, {n_vecs} x {DIM} embeddings")


if __name__ == "__main__":
    main()
