"""Corpus-census text operators: per-language stats and Heaps'-law
vocabulary growth (operators/text.py), pinned on hand-computed fixtures."""

import math

from pyspark_playground_spark.operators import text as tx


def test_lang_corpus_stats_fixture(spark):
    df = spark.createDataFrame(
        [
            (0, "a b a", "en"),
            (1, "a c", "en"),
            (2, "x y", "de"),
            (3, "", "de"),
            (4, "zz", None),  # null lang excluded entirely
        ],
        ["doc_id", "text", "lang"],
    )
    out = {r["lang"]: r for r in tx.lang_corpus_stats(df).collect()}
    assert set(out) == {"en", "de"}
    en = out["en"]
    # tokens: a b a | a c -> 5 tokens, types {a, b, c}, hapax {b, c}
    assert en["n_docs"] == 2
    assert en["n_tokens"] == 5
    assert en["n_types"] == 3
    assert en["n_hapax"] == 2
    assert en["n_chars"] == 5 + 3
    assert en["ttr_q6"] == 600_000
    assert en["chars_per_token_q6"] == 1_600_000
    de = out["de"]
    # empty doc contributes a doc and 0 tokens
    assert de["n_docs"] == 2 and de["n_tokens"] == 2 and de["n_types"] == 2


def test_lang_corpus_stats_zero_token_language(spark):
    df = spark.createDataFrame([(0, "   ", "xx")], ["doc_id", "text", "lang"])
    row = tx.lang_corpus_stats(df).first()
    assert row["n_docs"] == 1
    assert row["n_tokens"] == 0 and row["n_types"] == 0
    assert row["ttr_q6"] is None and row["chars_per_token_q6"] is None


def test_vocab_growth_unigram_first_occurrence(spark):
    # ids 0..9, buckets=5 -> bucket = id*5 div 10 (2 ids per bucket)
    rows = [
        (0, "a b"),
        (1, "a"),
        (2, "c"),
        (3, "a c"),
        (4, "d"),
        (5, "d"),
        (6, "a"),
        (7, "e"),
        (8, "a"),
        (9, "f g"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["bucket"]: r for r in tx.vocab_growth(df, buckets=5).collect()}
    # first occurrences: a,b -> doc0 (bucket 0); c -> doc2 (b1); d -> doc4
    # (b2); e -> doc7 (b3); f,g -> doc9 (b4)
    assert [out[b]["new_types"] for b in range(5)] == [2, 1, 1, 1, 2]
    assert [out[b]["cum_types"] for b in range(5)] == [2, 3, 4, 5, 7]


def test_vocab_growth_trigram_short_docs(spark):
    # a 2-token doc yields its full run as ONE gram (ngrams_expr contract)
    df = spark.createDataFrame(
        [(0, "p q"), (1, "p q r s")], ["doc_id", "text"]
    )
    out = tx.vocab_growth(df, buckets=2, n=3).collect()
    # doc0: ["p q"]; doc1: ["p q r", "q r s"] -> 3 distinct types total
    assert sum(r["new_types"] for r in out) == 3
    assert max(r["cum_types"] for r in out) == 3


def test_readability_hand_computed(spark):
    from pyspark_playground_spark.operators import text as tx2

    df = spark.createDataFrame(
        [(0, "The cat sat. It ran!"), (1, "")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in tx2.readability_scores(df).collect()}
    r = out[0]
    # words=5, sentence runs = {". ", "!"} -> 2, vowel groups:
    # e,a,a,i,a -> 5
    assert r["n_words"] == 5 and r["n_sentences"] == 2
    assert r["n_syllables"] == 5
    expected = 206.835 - 1.015 * (5 / 2) - 84.6 * (5 / 5)
    assert r["flesch_q4"] == math.floor(expected * 1e4 + 0.5)
    # empty doc: zero words -> NULL score, sentences floored at 1
    assert out[1]["n_words"] == 0 and out[1]["flesch_q4"] is None
    assert out[1]["n_sentences"] == 1


def test_prefix_energy_report(spark):
    from pyspark_playground_spark.operators import similarity as sim2

    rows = [
        (0, [1.0, 1.0, 1.0, 1.0]),   # prefix-2 energy = 0.5
        (0, [2.0, 0.0, 0.0, 0.0]),   # prefix-2 energy = 1.0
        (1, [0.0, 0.0, 0.0, 0.0]),   # dead vector -> excluded
        (1, [0.0, 0.0, 3.0, 0.0]),   # prefix-2 energy = 0.0
    ]
    df = spark.createDataFrame(rows, "label int, embedding array<float>")
    out = {
        r["label"]: r
        for r in sim2.prefix_energy_report(df, prefixes=(2,)).collect()
    }
    assert out[0]["n_vecs"] == 2
    assert out[0]["energy_frac_2_q6"] == 750_000
    assert out[1]["n_vecs"] == 1
    assert out[1]["energy_frac_2_q6"] == 0


def test_code_switch_report_hand_built(spark):
    """Doc 1: 32 'the' tokens then 32 'der' tokens -> two windows, en
    then de -> dominant en (alphabetical tie-break at 1-1), minority
    1/2. Doc 2: all English -> minority 0. Doc 3: marker-free tokens ->
    every window 'und', NULL minority."""
    from pyspark_playground_spark.operators.text import code_switch_report

    en = " ".join(["the"] * 32)
    de = " ".join(["der"] * 32)
    blank = " ".join(["zzz"] * 40)
    df = spark.createDataFrame(
        [(1, f"{en} {de}"), (2, f"{en} {en}"), (3, blank)],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in code_switch_report(
        df, window_tokens=32).collect()}
    d1 = out[1]
    assert d1["n_windows"] == 2 and d1["n_langs"] == 2
    assert d1["dominant_lang"] == "de"  # 1-1 tie -> count desc, lang asc
    assert d1["minority_x6"] == 500000
    d2 = out[2]
    assert d2["n_langs"] == 1 and d2["dominant_lang"] == "en"
    assert d2["minority_x6"] == 0
    d3 = out[3]
    assert d3["dominant_lang"] == "und" and d3["n_langs"] == 0
    assert d3["minority_x6"] is None
