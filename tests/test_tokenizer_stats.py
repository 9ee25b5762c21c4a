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


def _py_bpe(texts, num_merges, min_pair_count=2):
    """Pure-Python reference BPE trainer (Sennrich et al. recipe):
    word-census state, argmax pair by (count desc, left asc, right asc),
    greedy left-to-right non-overlapping merge rewrite."""
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in t.lower().split():
            if len(w) >= 2:
                words[w] += 1
    census = Counter()
    for w, c in words.items():
        census[tuple(w)] += c
    merges = []
    for i in range(num_merges):
        pairs = Counter()
        for sym, c in census.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (left, right), n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if n < min_pair_count:
            break
        merges.append((i + 1, left, right, n))
        nxt = Counter()
        for sym, c in census.items():
            out = []
            for x in sym:
                if out and out[-1] == left and x == right:
                    out[-1] = left + right
                else:
                    out.append(x)
            nxt[tuple(out)] += c
        census = nxt
    return merges


def test_bpe_learn_merges_equals_python_reference(spark):
    texts = [
        "banana bandana bananas",
        "the cat sat on the mat the cat",
        "aaaa aaa aa abab abab",
        "low lower lowest newest newer new",
        "banana splits and banana bread",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = [
        (r.merge_rank, r.left, r.right, r.pair_count)
        for r in tx.bpe_learn_merges(df, num_merges=25).orderBy("merge_rank").collect()
    ]
    assert got == _py_bpe(texts, 25)
    # merged symbols become multi-char and keep merging (chains like
    # a+n -> an, b+an -> ban must appear for this corpus)
    assert any(len(l) > 1 or len(r) > 1 for _, l, r, _ in got)


def test_bpe_learn_merges_overlap_and_stop(spark):
    # 'aaaa': greedy left-to-right gives (aa)(aa), pair (a,a) counted 3x
    df = spark.createDataFrame([(1, "aaaa aaaa")], ["doc_id", "text"])
    got = [
        (r.merge_rank, r.left, r.right, r.pair_count)
        for r in tx.bpe_learn_merges(df, num_merges=10, min_pair_count=2)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == _py_bpe(["aaaa aaaa"], 10)
    assert got[0] == (1, "a", "a", 6)
    assert got[1] == (2, "aa", "aa", 2)
    # min_pair_count halts before exhausting num_merges
    assert len(got) < 10


def test_bpe_learn_merges_empty_corpus(spark):
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    assert tx.bpe_learn_merges(df, num_merges=5).count() == 0


def _py_bpe_apply(text, merges):
    out = []
    for w in text.lower().split():
        sym = list(w)
        for left, right in merges:
            nxt = []
            for x in sym:
                if nxt and nxt[-1] == left and x == right:
                    nxt[-1] = left + right
                else:
                    nxt.append(x)
            sym = nxt
        out.extend(sym)
    return out


def test_bpe_apply_matches_python_reference(spark):
    merges = [("a", "n"), ("an", "a"), ("b", "ana"), ("t", "h"), ("th", "e")]
    texts = ["banana bandana the theater", "aaaa anana ban the b"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        r.doc_id: (list(r.bpe_tokens), r.n_bpe_tokens)
        for r in tx.bpe_apply_merges(df, merges).collect()
    }
    for i, t in enumerate(texts):
        ref = _py_bpe_apply(t, merges)
        assert got[i] == (ref, len(ref)), (i, got[i], ref)


def test_bpe_train_then_apply_roundtrip(spark):
    # applying the learned merges reproduces the trainer's end-state
    # segmentation (checked via the same pure-Python full pipeline)
    texts = [
        "banana bandana bananas",
        "low lower lowest newest newer new",
        "aaaa aaa abab abab",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    learned = [
        (r.left, r.right)
        for r in tx.bpe_learn_merges(df, num_merges=12)
        .orderBy("merge_rank")
        .collect()
    ]
    got = {
        r.doc_id: list(r.bpe_tokens)
        for r in tx.bpe_apply_merges(df, learned).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _py_bpe_apply(t, learned)
    # single-char words pass through untouched; trainer ignored them but
    # apply must still tokenize them
    df2 = spark.createDataFrame([(0, "a b banana")], ["doc_id", "text"])
    r = tx.bpe_apply_merges(df2, learned).collect()[0]
    assert list(r.bpe_tokens)[:2] == ["a", "b"]


def test_ngram_novelty_min_group_owns_shared_grams(spark, corpus):
    # corpus docs 1/2 ("aba..", group below) vs 3/4; regroup: doc 1-2 -> g1,
    # doc 3-4 -> g2 with g1 < g2, so every gram g1 also has is novel to g1
    from pyspark.sql import functions as F

    df = corpus.withColumn(
        "src", F.when(F.col("doc_id") <= 2, "g1").otherwise("g2")
    )
    out = {
        r.src: r
        for r in tx.ngram_novelty(
            df, group_column="src", text_column="text", n=3
        ).collect()
    }

    def grams(text, n=3):
        t = text.split()
        if not t:
            return set()
        if len(t) < n:
            return {" ".join(t)}
        return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}

    g1 = grams("aba aba cd") | grams("aba cd cd xyz")
    g2 = grams("new york new york city") | grams("new york is big big big")
    assert out["g1"].n_distinct_ngrams == len(g1)
    assert out["g2"].n_distinct_ngrams == len(g2)
    # g1 is first in order -> everything it has is novel
    assert out["g1"].n_novel_ngrams == len(g1)
    assert out["g1"].novelty_ratio == 1.0
    # g2 only gets credit for grams g1 lacks
    assert out["g2"].n_novel_ngrams == len(g2 - g1)


def test_ngram_novelty_duplicate_source_adds_nothing(spark):
    rows = [(1, "alpha beta gamma delta", "s1"), (2, "alpha beta gamma delta", "s2")]
    df = spark.createDataFrame(rows, ["doc_id", "text", "src"])
    out = {
        r.src: r
        for r in tx.ngram_novelty(df, group_column="src", n=3).collect()
    }
    assert out["s1"].n_novel_ngrams == out["s1"].n_distinct_ngrams == 2
    assert out["s2"].n_novel_ngrams == 0 and out["s2"].novelty_ratio == 0.0


def test_bm25_hand_example(spark):
    # corpus: 3 docs; query {"a"}: df=2, N=3 -> idf = ln((3-2+.5)/(2+.5)+1)
    import math

    from pyspark_playground_spark.operators import text as tx

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "b c d e")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           tx.bm25_scores(df, ["a"]).collect()}
    assert out[3]["bm25_score"] == 0  # no match -> kept, score 0
    idf = round(math.log((3 - 2 + 0.5) / (2 + 0.5) + 1.0), 7)
    avgdl = 9 / 3
    def score(tf, dl):
        return round(idf * (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 9)
    assert float(out[1]["bm25_score"]) == pytest.approx(score(2, 3), abs=1e-9)
    assert float(out[2]["bm25_score"]) == pytest.approx(score(1, 2), abs=1e-9)
    # more occurrences of the term => higher score (saturating tf)
    assert float(out[1]["bm25_score"]) > float(out[2]["bm25_score"])


def test_bm25_idf_model_is_broadcast(spark):
    from pyspark_playground_spark.operators import text as tx

    df = spark.createDataFrame(
        [(i, "hash join scan" if i % 2 else "filter merge") for i in range(40)],
        "doc_id long, text string",
    )
    plan = (
        tx.bm25_scores(df, ["hash", "join"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_good_turing_spectrum_hand_computed(spark):
    from pyspark_playground_spark.operators.text import good_turing_spectrum

    # tokens: a×3, b×2, c×2, d×1, e×1, f×1 -> n_1=3, n_2=2, n_3=1
    df = spark.createDataFrame(
        [(1, "a a a b b"), (2, "c c d e f")], "doc_id bigint, text string"
    )
    got = {r["r"]: r for r in good_turing_spectrum(df).collect()}
    assert {r: got[r]["n_r"] for r in got} == {1: 3, 2: 2, 3: 1}
    assert got[1]["r_star"] == 2 * 2 / 3       # (1+1)*n_2/n_1
    assert got[2]["r_star"] == 3 * 1 / 2       # (2+1)*n_3/n_2
    assert got[3]["r_star"] is None            # spectrum gap at n_4


def test_keyness_direction_and_magnitude(spark):
    from pyspark.sql import functions as F

    from pyspark_playground_spark.operators.text import keyness_scores

    # "spark" dominates the target slice, "duck" the rest; "both" is even.
    df = spark.createDataFrame(
        [
            (1, "spark spark spark both", "a"),
            (2, "spark spark both", "a"),
            (3, "duck duck duck both", "b"),
            (4, "duck duck both", "b"),
        ],
        "doc_id bigint, text string, src string",
    )
    got = {r["token"]: r for r in
           keyness_scores(df, F.col("src") == "a").collect()}
    assert got["spark"]["keyness_sign"] == 1
    assert got["duck"]["keyness_sign"] == -1
    # the balanced token is the least key of the three
    assert got["both"]["g2"] < got["spark"]["g2"]
    assert got["both"]["g2"] < got["duck"]["g2"]
    # zero-count side contributes its limit (term 0), not NaN
    assert all(r["g2"] == r["g2"] for r in got.values())  # no NaN
