"""Tokenizer-training statistics: BPE pair census and PMI collocations."""

import pytest

from pyspark_playground_spark.operators import text as tx


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "aba aba cd"),
        (2, "aba cd cd xyz"),
        (3, "new york new york city"),
        (4, "new york is big big big"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_bpe_pair_counts_weighted_by_word_frequency(spark, corpus):
    out = {r.pair: r.n_occurrences for r in tx.bpe_pair_counts(corpus).collect()}
    # 'aba' appears 3 times -> pairs 'ab' and 'ba' get 3 each from it
    assert out["ab"] == 3
    assert out["ba"] == 3
    # 'cd' appears 3 times
    assert out["cd"] == 3
    # 'xyz' once -> 'xy' and 'yz' once
    assert out["xy"] == 1 and out["yz"] == 1
    # single-char words contribute nothing; ranks deterministic
    ranked = tx.bpe_pair_counts(corpus).collect()
    ranks = [r.rank for r in ranked]
    assert ranks == sorted(ranks)


def test_bpe_pair_counts_ignores_short_words(spark):
    df = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    assert tx.bpe_pair_counts(df).count() == 0


def test_pmi_lift_exact_formula(spark, corpus):
    rows = tx.pmi_collocations(corpus, min_count=2, k=10).collect()
    by_pair = {(r.left_token, r.right_token): r for r in rows}
    # corpus bigrams: doc1 (aba,aba),(aba,cd); doc2 (aba,cd),(cd,cd),(cd,xyz);
    # doc3 (new,york),(york,new),(new,york),(york,city);
    # doc4 (new,york),(york,is),(is,big),(big,big),(big,big)
    # N_b = 14
    # unigrams: aba=3 cd=3 xyz=1 new=3 york=3 city=1 is=1 big=3
    r = by_pair[("new", "york")]
    assert r.pair_count == 3
    assert r.lift_ppm == (3 * 14 * 1_000_000) // (3 * 3)
    r2 = by_pair[("aba", "cd")]
    assert r2.pair_count == 2
    assert r2.lift_ppm == (2 * 14 * 1_000_000) // (3 * 3)
    # min_count filters singletons
    assert ("cd", "xyz") not in by_pair
    # ranking: higher lift first, ties by token order
    lifts = [r.lift_ppm for r in sorted(rows, key=lambda x: x.rank)]
    assert lifts == sorted(lifts, reverse=True)
