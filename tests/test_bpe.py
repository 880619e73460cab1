"""BPE trainer/tokenizer units: hand-computed merge sequences, greedy
rank-order application, and the distributed word-count parity."""

import pandas as pd
from pyspark.sql import functions as F

from data_engineering_capstone_project__spark.operators import bpe


def test_train_merges_hand_computed():
    # Sennrich-style toy: {'hug': 10, 'pug': 5, 'pun': 12, 'bun': 4,
    # 'hugs': 5}. Initial pair counts: ('u','g') 10+5+5=20, ('u','n')
    # 12+4=16, ('h','u') 15, ('p','u') 17, ... so first merge is (u,g).
    wf = [("hug", 10), ("pug", 5), ("pun", 12), ("bun", 4), ("hugs", 5)]
    merges = bpe.train_merges_from_counts(wf, 4)
    assert merges[0] == ("u", "g")
    # after (u,g): (u,n)=16 ties (n,'</w>')=16 → lexicographically
    # smaller pair ('n','</w>') wins ('n' < 'u')
    assert merges[1] == ("n", "</w>")
    # then (u,'n</w>') is the unique 16; then (h,ug)=15 ties
    # (ug,'</w>')=15 → ('h','ug') wins
    assert merges[2] == ("u", "n</w>")
    assert merges[3] == ("h", "ug")


def test_train_merges_deterministic_tiebreak():
    # two pairs with equal counts → lexicographically smaller pair wins
    wf = [("ab", 3), ("cd", 3)]
    merges = bpe.train_merges_from_counts(wf, 1)
    assert merges[0] == ("a", "b")


def test_encode_word_greedy_rank_order():
    ranks = {("u", "g"): 0, ("p", "u"): 1, ("n", "</w>"): 2}
    assert bpe._encode_word("pug", ranks) == ["p", "ug", "</w>"]
    assert bpe._encode_word("pun", ranks) == ["pu", "n</w>"]
    assert bpe._encode_word("zzz", ranks) == ["z", "z", "z", "</w>"]
    assert bpe._encode_word("", {}) == ["</w>"]


def test_bpe_end_to_end_roundtrip(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    "the cat sat on the mat",
                    "the cat ran to the mat",
                    "a cat and the mat",
                ],
            }
        )
    )
    merges = bpe.bpe_train(df, n_merges=10, min_freq=2)
    assert merges  # something merged ('the', 'cat', 'mat' all repeat)
    toks = bpe.bpe_tokenize(df, merges)
    rows = toks.select(
        "text",
        F.concat_ws(
            "",
            F.transform(
                "tokens", lambda t: F.replace(t, F.lit("</w>"), F.lit(""))
            ),
        ).alias("rt"),
    ).collect()
    for r in rows:
        assert r["rt"] == "".join(r["text"].split())
    # fully-merged frequent word becomes a single token
    whole = {m[0] + m[1] for m in merges}
    assert any(t.startswith("the") for t in whole)


def test_word_frequencies_matches_python(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"text": ["A a  b", "a B b", None, "  "]})
    )
    got = {
        (r["word"], r["freq"])
        for r in bpe.word_frequencies(df, min_freq=1).collect()
    }
    assert got == {("a", 3), ("b", 3)}
