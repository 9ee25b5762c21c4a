"""Declarative corpus pipeline: spec-driven chain == hand-composed chain."""

import pytest
from pyspark.sql import functions as F

from pyspark_playground_spark.operators import dedup as dd
from pyspark_playground_spark.operators import graph as gr
from pyspark_playground_spark.operators import sampling as sp
from pyspark_playground_spark.operators import text as tx
from pyspark_playground_spark.plans import pipeline as pl


SPEC = """
stages:
  - op: c4_filter
    params: {min_tokens: 3}
  - op: exact_dedup
  - op: near_dedup
    params: {threshold: 0.8}
  - op: weighted_sample
    params:
      group_column: source
      default: 1.0
      weights: {drop_me: 0.0}
  - op: split
    params:
      splits: {train: 0.5, held: 0.5}
"""


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "a"),
        (2, "the quick brown fox jumps over the lazy dog", "a"),   # exact dup
        (3, "completely different text about the spark engine", "a"),
        (4, "tiny", "a"),                                          # fails c4
        (5, "the words here are fine and unique enough", "drop_me"),  # weight 0
    ]
    return spark.createDataFrame(rows, "doc_id int, text string, source string")


def test_spec_equals_hand_composition(corpus):
    got = pl.run_pipeline(corpus, SPEC)
    cols = corpus.columns
    hand = tx.c4_style_filter(corpus, min_tokens=3).where("keep").select(*cols)
    hand = dd.exact_dedup(hand)
    pairs = dd.minhash_dedup_pairs(hand, threshold=0.8)
    hand = gr.dedup_clusters(hand, pairs).filter(F.col("is_canonical")).drop(
        "cluster_id", "is_canonical"
    )
    hand = sp.weighted_sample(
        hand, ["doc_id"], group_column="source",
        weights={"drop_me": 0.0}, default=1.0,
    )
    hand = sp.assign_split(hand, ["doc_id"], splits={"train": 0.5, "held": 0.5})
    assert sorted(got.columns) == sorted(hand.columns)
    g = {tuple(r) for r in got.select(*sorted(got.columns)).collect()}
    h = {tuple(r) for r in hand.select(*sorted(hand.columns)).collect()}
    assert g == h
    ids = {r["doc_id"] for r in got.collect()}
    assert 4 not in ids and 5 not in ids      # c4 + weight-0 dropped
    assert len(ids & {1, 2}) == 1             # dup pair collapsed
    assert 3 in ids


def test_unknown_op_raises(corpus):
    with pytest.raises(ValueError, match="unknown op"):
        pl.run_pipeline(corpus, {"stages": [{"op": "nope"}]})


def test_chunk_stage_matches_direct_call(spark):
    from pyspark_playground_spark.operators import packing as pk
    from pyspark_playground_spark.plans.pipeline import run_pipeline

    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(20))), (2, "short doc")],
        ["doc_id", "text"],
    )
    spec = {"stages": [
        {"op": "chunk", "params": {"chunk_tokens": 8, "overlap": 2}},
    ]}
    got = run_pipeline(df, spec)
    direct = pk.sliding_window_chunks(
        df, chunk_tokens=8, overlap=2
    ).withColumnRenamed("chunk_text", "text")
    assert sorted(got.collect()) == sorted(direct.collect())
    assert "text" in got.columns and "chunk_index" in got.columns


def test_span_dup_filter_stage_matches_direct_call(spark):
    from pyspark.sql import functions as F

    from pyspark_playground_spark.operators.dedup import span_duplication_stats
    from pyspark_playground_spark.plans.pipeline import run_pipeline

    shared = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, shared), (2, shared), (3, "completely different text here")],
        ["doc_id", "text"],
    )
    spec = {"stages": [
        {"op": "span_dup_filter",
         "params": {"span_tokens": 5, "max_dup_ppm": 0}},
    ]}
    got = sorted(r.doc_id for r in run_pipeline(df, spec).collect())
    stats = span_duplication_stats(df, span_tokens=5)
    want = sorted(
        r.id for r in stats.filter(F.col("dup_ppm") == 0).collect()
    )
    assert got == want == [3]


def test_rebalance_stage_matches_direct_call(spark):
    from pyspark_playground_spark.operators.sampling import rebalance_mixture
    from pyspark_playground_spark.plans.pipeline import run_pipeline

    rows = [(i, "a" if i % 3 else "b", "t") for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    params = {"group_column": "source",
              "target_ppm": {"a": 500_000, "b": 500_000}}
    got = run_pipeline(df, {"stages": [{"op": "rebalance", "params": params}]})
    want = rebalance_mixture(df, ["doc_id"], **params)
    assert sorted(r.doc_id for r in got.collect()) == sorted(
        r.doc_id for r in want.collect()
    )


def test_new_audit_stages_match_direct_calls(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # calibrated_filter == unigram score -> rank_normalize -> threshold
    spec = """
stages:
  - op: calibrated_filter
    params: {min_ppm: 200000}
"""
    got = pl.run_pipeline(docs, spec)
    scored = tx.unigram_logprob_scores(docs).select("doc_id", "avg_logprob")
    cal = sp.rank_normalize(
        docs.join(scored, "doc_id"),
        group_column="source", value_column="avg_logprob",
    )
    want = cal.filter(F.col("pct_ppm") >= 200000)
    assert got.count() == want.count() > 0
    assert set(r["doc_id"] for r in got.select("doc_id").collect()) == set(
        r["doc_id"] for r in want.select("doc_id").collect()
    )

    # leakage_free_split: no cluster straddles splits
    spec2 = """
stages:
  - op: leakage_free_split
"""
    split = pl.run_pipeline(docs, spec2)
    assert "split" in split.columns and split.count() == docs.count()
    leak = (
        split.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert leak == 0

    # temperature_rebalance: output counts track sqrt-scaled shares
    spec3 = """
stages:
  - op: temperature_rebalance
    params: {alpha: 0.5}
"""
    reb = pl.run_pipeline(docs, spec3)
    assert 0 < reb.count() <= docs.count()


def test_tokenize_bpe_stage_adds_tokens_zero_shuffle(spark):
    from pyspark_playground_spark.plans.pipeline import run_pipeline

    df = spark.createDataFrame(
        [(1, "banana band", "web"), (2, "ana ban", "web")],
        ["doc_id", "text", "source"],
    )
    spec = {
        "stages": [
            {
                "op": "tokenize_bpe",
                "params": {"merges": [["a", "n"], ["an", "a"]]},
            }
        ]
    }
    out = run_pipeline(df, spec)
    rows = {r.doc_id: r for r in out.collect()}
    # all original columns survive
    assert rows[1].source == "web"
    # banana: (a,n) -> b,an,an,a ; (an,a) -> b,an,ana (greedy: the first
    # 'an' already has 'an' after it, only the second merges with 'a')
    assert list(rows[1].bpe_tokens) == ["b", "an", "ana", "b", "an", "d"]
    # ana -> an,a -> ana ; ban -> b,an
    assert list(rows[2].bpe_tokens) == ["ana", "b", "an"]
    assert rows[2].n_bpe_tokens == 3
    # zero shuffle: the stage is a pure projection
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_score_gate_stage_passes_and_refuses(spark):
    rows = [(i, "t" * i, "a", i, i >= 5) for i in range(1, 11)]
    df = spark.createDataFrame(
        rows, "doc_id int, text string, source string, s int, y boolean"
    )
    # perfectly-ranking score passes and is a pure pass-through
    out = pl.run_pipeline(
        df,
        {"stages": [{"op": "score_gate",
                     "params": {"score_column": "s",
                                "label_expr": "y", "min_auc": 0.9}}]},
    )
    assert out.count() == 10 and out.columns == df.columns
    # anti-ranking score refuses the pipeline
    with pytest.raises(ValueError, match="score_gate"):
        pl.run_pipeline(
            df,
            {"stages": [{"op": "score_gate",
                         "params": {"score_column": "s",
                                    "label_expr": "NOT y",
                                    "min_auc": 0.9}}]},
        )


def test_shard_stage_matches_direct_call(spark):
    rows = [(i, "x" * (i % 7 + 1), "a", (i % 7 + 1)) for i in range(1, 101)]
    df = spark.createDataFrame(
        rows, "doc_id int, text string, source string, n_chars int"
    )
    from pyspark_playground_spark.operators.layout import plan_shards

    via_spec = pl.run_pipeline(
        df,
        {"stages": [{"op": "shard",
                     "params": {"bytes_column": "n_chars",
                                "target_bytes": 40,
                                "order_column": "doc_id"}}]},
    )
    direct = plan_shards(
        df, bytes_column="n_chars", target_bytes=40, order_column="doc_id"
    )
    assert sorted(via_spec.collect()) == sorted(direct.collect())
    assert "shard" in via_spec.columns


def test_normalize_stage_canonicalizes_before_dedup(spark):
    rows = [
        (1, "Hello   World", "a"),
        (2, "hello world", "a"),
        (3, "other text", "a"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string, source string")
    out = pl.run_pipeline(
        df, {"stages": [{"op": "normalize"}, {"op": "exact_dedup"}]}
    )
    got = sorted(r["doc_id"] for r in out.collect())
    # 1 and 2 collapse to one canonical text; smallest id kept
    assert got == [1, 3]
    assert out.columns == df.columns


def test_token_budget_stage_global_and_grouped(spark):
    rows = [(i, "g%d" % (i % 2), i, 10) for i in range(1, 21)]
    df = spark.createDataFrame(
        rows, "doc_id int, source string, score int, toks int"
    )
    glob = pl.run_pipeline(
        df,
        {"stages": [{"op": "token_budget",
                     "params": {"score_column": "score",
                                "tokens_column": "toks", "budget": 50}}]},
    )
    # top 5 scores globally (5 x 10 tokens)
    assert sorted(r["doc_id"] for r in glob.collect()) == [16, 17, 18, 19, 20]
    grp = pl.run_pipeline(
        df,
        {"stages": [{"op": "token_budget",
                     "params": {"score_column": "score",
                                "tokens_column": "toks", "budget": 30,
                                "group_column": "source"}}]},
    )
    # top 3 per group
    assert sorted(r["doc_id"] for r in grp.collect()) == [15, 16, 17, 18, 19, 20]
    assert grp.columns == df.columns


def test_divergence_gate_passes_and_refuses(spark):
    # two sources with identical token mixes pass; a divergent third
    # source (disjoint vocabulary -> JSD = ln 2) trips the gate
    same = [(i, "alpha beta gamma", ["s1", "s2"][i % 2]) for i in range(10)]
    df = spark.createDataFrame(same, "doc_id int, text string, source string")
    out = pl.run_pipeline(
        df,
        {"stages": [{"op": "divergence_gate", "params": {"max_jsd": 0.1}}]},
    )
    assert out.count() == 10 and out.columns == df.columns
    divergent = same + [(100 + i, "zeta eta theta", "s3") for i in range(5)]
    df2 = spark.createDataFrame(
        divergent, "doc_id int, text string, source string"
    )
    with pytest.raises(ValueError, match="divergence_gate"):
        pl.run_pipeline(
            df2,
            {"stages": [{"op": "divergence_gate",
                         "params": {"max_jsd": 0.5}}]},
        )


def test_agreement_gate_passes_and_refuses(spark):
    rows = [(i, "en", "en") for i in range(8)] + [
        (8, "de", "de"), (9, "de", "en")
    ]
    df = spark.createDataFrame(rows, "doc_id int, gold string, pred string")
    out = pl.run_pipeline(
        df,
        {"stages": [{"op": "agreement_gate",
                     "params": {"a_column": "gold", "b_column": "pred",
                                "min_kappa": 0.5}}]},
    )
    assert out.count() == 10
    with pytest.raises(ValueError, match="agreement_gate"):
        pl.run_pipeline(
            df,
            {"stages": [{"op": "agreement_gate",
                         "params": {"a_column": "gold", "b_column": "pred",
                                    "min_kappa": 0.95}}]},
        )


def test_privacy_gate_passes_and_refuses(spark):
    rows = [(i, "a", "20s") for i in range(6)] + [(99, "b", "30s")]
    df = spark.createDataFrame(rows, "doc_id int, zip string, age string")
    # allow the one singleton class -> passes through unchanged
    out = pl.run_pipeline(
        df,
        {"stages": [{"op": "privacy_gate",
                     "params": {"quasi_identifiers": ["zip", "age"],
                                "k": 2, "max_rows_below_k": 1}}]},
    )
    assert out.count() == 7 and out.columns == df.columns
    # zero tolerance refuses
    with pytest.raises(ValueError, match="privacy_gate"):
        pl.run_pipeline(
            df,
            {"stages": [{"op": "privacy_gate",
                         "params": {"quasi_identifiers": ["zip", "age"],
                                    "k": 2, "max_rows_below_k": 0}}]},
        )


def test_interleave_stage_assigns_round_robin_positions(spark):
    rows = [(i, "t", ["a", "b"][i % 2]) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id int, text string, source string")
    out = pl.run_pipeline(
        df, {"stages": [{"op": "interleave", "params": {}}]}
    ).collect()
    by_pos = {r["global_pos"]: r["source"] for r in out}
    assert [by_pos[p] for p in range(6)] == ["a", "b", "a", "b", "a", "b"]


def test_dsir_select_stage_matches_direct_call(spark):
    from pyspark_playground_spark.operators.sampling import (
        dsir_gumbel_select,
        dsir_importance_weights,
    )
    from pyspark_playground_spark.plans.pipeline import run_pipeline

    df = spark.createDataFrame(
        [(i, "alpha beta" if i % 3 == 0 else "gamma delta",
          "en" if i % 3 == 0 else "de") for i in range(60)],
        "doc_id long, text string, lang string",
    )
    spec = {"stages": [{
        "op": "dsir_select",
        "params": {"target": "lang = 'en'", "k": 12, "buckets": 128},
    }]}
    got = sorted(r["doc_id"] for r in run_pipeline(df, spec).collect())
    w = dsir_importance_weights(df, F.expr("lang = 'en'"), buckets=128)
    want = sorted(
        r["doc_id"] for r in dsir_gumbel_select(w, k=12).collect()
    )
    assert got == want and len(got) == 12
    # original frame's columns survive the stage
    assert set(run_pipeline(df, spec).columns) == {"doc_id", "text", "lang"}


def test_boilerplate_stage_matches_direct_call(spark):
    from pyspark_playground_spark.operators.dedup import frequent_segment_removal
    from pyspark_playground_spark.plans.pipeline import run_pipeline

    df = spark.createDataFrame(
        [
            (1, "alpha\nfooter", "s1"),
            (2, "beta\nfooter", "s2"),
            (3, "footer\ngamma", "s1"),
        ],
        "doc_id bigint, text string, source string",
    )
    spec = {"stages": [{"op": "boilerplate", "params": {"max_doc_freq": 2}}]}
    got = {r["doc_id"]: r for r in run_pipeline(df, spec).collect()}
    want = {r["doc_id"]: r["text"] for r in
            frequent_segment_removal(df.select("doc_id", "text"),
                                     max_doc_freq=2).collect()}
    assert {k: v["text"] for k, v in got.items()} == want
    # non-text columns pass through untouched
    assert got[1]["source"] == "s1" and got[3]["source"] == "s1"
    assert got[1]["text"] == "alpha"


def test_calibration_gate_passes_and_refuses(spark):
    import pytest

    from pyspark_playground_spark.plans.pipeline import run_pipeline

    # perfectly calibrated: score == empirical rate within each bin
    good = spark.createDataFrame(
        [(0.0, False)] * 5 + [(1.0, True)] * 5, "s double, y boolean"
    )
    spec = {"stages": [{"op": "calibration_gate", "params": {
        "score_column": "s", "label_expr": "y", "max_ece": 0.05, "bins": 2}}]}
    assert run_pipeline(good, spec).count() == 10

    # systematically overconfident: score 0.9 but rate 0.5
    bad = spark.createDataFrame(
        [(0.9, True)] * 5 + [(0.9, False)] * 5, "s double, y boolean"
    )
    with pytest.raises(ValueError, match="calibration_gate"):
        run_pipeline(bad, spec).count()


def test_conformal_filter_drops_tail(spark):
    """200 docs with scores 1..200: the 90% conformal threshold from the
    md5-even calibration half caps scores; rows above it are dropped,
    NULL scores are kept (they carry no evidence either way)."""
    rows = [(i, i) for i in range(1, 201)] + [(999, None)]
    df = spark.createDataFrame(rows, "doc_id int, score int")
    out = pl.run_pipeline(
        df,
        {"stages": [{"op": "conformal_filter",
                     "params": {"score_column": "score",
                                "key_columns": ["doc_id"],
                                "alpha_num": 1, "alpha_den": 10}}]},
    )
    got = out.collect()
    scores = [r["score"] for r in got if r["score"] is not None]
    assert any(r["score"] is None for r in got)  # NULL kept
    thr = max(scores)
    # everything above the threshold is gone; everything at or below stays
    assert len(scores) == sum(1 for i in range(1, 201) if i <= thr)
    # threshold sits near the calibration 90th percentile, not at the max
    assert thr < 200

    # degenerate calibration (nothing hashes below 1 bucket of 10000) ->
    # NULL threshold -> pass-through
    out2 = pl.run_pipeline(
        df,
        {"stages": [{"op": "conformal_filter",
                     "params": {"score_column": "score",
                                "key_columns": ["doc_id"],
                                "cal_buckets": 0}}]},
    )
    assert out2.count() == 201


def test_independence_gate_passes_and_refuses(spark):
    # perfectly dependent: source determines lang -> V = 1
    dep = spark.createDataFrame(
        [("s1", "en")] * 5 + [("s2", "de")] * 5, "source string, lang string"
    )
    with pytest.raises(ValueError, match="independence_gate"):
        pl.run_pipeline(
            dep,
            {"stages": [{"op": "independence_gate",
                         "params": {"a_column": "source",
                                    "b_column": "lang",
                                    "max_cramers_v": 0.5}}]},
        )
    # independent 2x2 -> V = 0 -> passes through unchanged
    ind = spark.createDataFrame(
        [("s1", "en"), ("s1", "de"), ("s2", "en"), ("s2", "de")] * 3,
        "source string, lang string",
    )
    out = pl.run_pipeline(
        ind,
        {"stages": [{"op": "independence_gate",
                     "params": {"a_column": "source", "b_column": "lang",
                                "max_cramers_v": 0.5}}]},
    )
    assert out.count() == 12
    # degenerate (single source level) passes: nothing to confound
    deg = spark.createDataFrame(
        [("only", "en"), ("only", "de")], "source string, lang string"
    )
    assert pl.run_pipeline(
        deg,
        {"stages": [{"op": "independence_gate",
                     "params": {"a_column": "source", "b_column": "lang",
                                "max_cramers_v": 0.1}}]},
    ).count() == 2


def test_expect_stage_passes_and_refuses(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, "y")], "doc_id int, text string"
    )
    out = pl.run_pipeline(
        df,
        {"stages": [{"op": "expect",
                     "params": {"rules": [
                         {"type": "not_null", "column": "text"},
                         {"type": "unique", "columns": ["doc_id"]},
                     ]}}]},
    )
    assert out.count() == 2
    bad = spark.createDataFrame(
        [(1, "x"), (1, None)], "doc_id int, text string"
    )
    with pytest.raises(ValueError, match="expect: 2 rule"):
        pl.run_pipeline(
            bad,
            {"stages": [{"op": "expect",
                         "params": {"rules": [
                             {"type": "not_null", "column": "text"},
                             {"type": "unique", "columns": ["doc_id"]},
                         ]}}]},
        )


def _vec_corpus(spark):
    # two tight clusters ids 0-2 (near (0,0,0,0)) and 3-5 (near
    # (10,10,10,10)), plus a far singleton id 6; ids 0..k-1 satisfy the
    # in-stage Lloyd seed contract
    rows = [
        (0, [0.0, 0.0, 0.0, 0.0]),
        (1, [0.1, 0.0, 0.0, 0.0]),
        (2, [0.0, 0.1, 0.0, 0.0]),
        (3, [10.0, 10.0, 10.0, 10.0]),
        (4, [10.1, 10.0, 10.0, 10.0]),
        (5, [10.0, 10.1, 10.0, 10.0]),
        (6, [50.0, 0.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, embedding array<double>"
    )


def test_ann_dedup_stage_keeps_one_per_embedding_cluster(spark):
    """ann_dedup collapses each near-dup embedding cluster to its
    canonical (smallest-id) row and keeps singletons — the ANN twin of
    near_dedup, wired through the frozen-model IVF x PQ search."""
    df = _vec_corpus(spark)
    out = pl.run_pipeline(
        df,
        {"stages": [{"op": "ann_dedup",
                     "params": {"dim": 4, "coarse_k": 2, "nprobe": 2,
                                # k=7: every vector its own PQ seed ->
                                # lossless codebook, ADC == exact L2
                                "m": 2, "k": 7, "topk": 3,
                                "max_dist2": 1.0}}]},
    )
    assert sorted(r["doc_id"] for r in out.collect()) == [0, 3, 6]
    assert out.columns == df.columns  # funnel contract: no extra cols


def test_ann_dedup_stage_frozen_model_tables(spark, tmp_path):
    """The production path: the model is trained offline, registered as
    catalog tables, and the stage serves against it — same keeps as the
    in-stage training (deterministic Lloyd, same corpus)."""
    from pyspark_playground_spark.operators import similarity as sim

    df = _vec_corpus(spark)
    coarse, book = sim.ivf_pq_train(
        df, id_column="doc_id", dim=4, coarse_k=2, coarse_iterations=1,
        m=2, k=7, iterations=1,
    )
    coarse.createOrReplaceTempView("ann_coarse_r8")
    book.createOrReplaceTempView("ann_book_r8")
    out = pl.run_pipeline(
        df,
        {"stages": [{"op": "ann_dedup",
                     "params": {"coarse_table": "ann_coarse_r8",
                                "book_table": "ann_book_r8",
                                "nprobe": 2, "topk": 3,
                                "max_dist2": 1.0}}]},
    )
    assert sorted(r["doc_id"] for r in out.collect()) == [0, 3, 6]
    # naming only one half of the model is a spec error, not a retrain
    with pytest.raises(ValueError, match="together"):
        pl.run_pipeline(
            df,
            {"stages": [{"op": "ann_dedup",
                         "params": {"coarse_table": "ann_coarse_r8",
                                    "max_dist2": 1.0}}]},
        )


def test_knn_join_stage_attaches_neighbors(spark):
    """knn_join explodes each row into (row, neighbor) pairs with rank
    and quantized distance appended; self-search excludes the row
    itself; ranks are contiguous from 1."""
    df = _vec_corpus(spark)
    out = pl.run_pipeline(
        df,
        {"stages": [{"op": "knn_join",
                     "params": {"dim": 4, "coarse_k": 2, "nprobe": 2,
                                "m": 2, "k": 4, "topk": 2}}]},
    ).collect()
    assert set(df.columns) | {"neighbor_id", "adist_q6", "rank"} == {
        c for r in out for c in r.asDict()
    }
    by_q = {}
    for r in out:
        assert r["neighbor_id"] != r["doc_id"]
        by_q.setdefault(r["doc_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1))
               for v in by_q.values())
    # the tight-cluster members rank each other first
    top = {r["doc_id"]: r["neighbor_id"] for r in out if r["rank"] == 1}
    assert top[1] in (0, 2) and top[4] in (3, 5)


def test_t_closeness_gate_passes_and_refuses(spark):
    """A class mirroring the global sensitive mix passes at a tight
    bound; a class concentrated on one band refuses with its t in the
    message; the gate is pass-through on success."""
    # class "x" mirrors global evenly; class "y" is all band-2
    rows = (
        [(i, "x", v) for i, v in enumerate((0, 1, 2) * 4)]
        + [(100 + i, "y", 2) for i in range(6)]
    )
    df = spark.createDataFrame(rows, "doc_id int, zip string, band int")
    # generous bound: passes through unchanged
    out = pl.run_pipeline(
        df,
        {"stages": [{"op": "t_closeness_gate",
                     "params": {"quasi_identifiers": ["zip"],
                                "sensitive": "band",
                                "max_t_ppm": 900_000}}]},
    )
    assert out.count() == 18 and out.columns == df.columns
    # tight bound: the skewed class trips the gate
    with pytest.raises(ValueError, match="t_closeness_gate"):
        pl.run_pipeline(
            df,
            {"stages": [{"op": "t_closeness_gate",
                         "params": {"quasi_identifiers": ["zip"],
                                    "sensitive": "band",
                                    "max_t_ppm": 100_000}}]},
        )


def test_media_near_dedup_keeps_one_per_perceptual_cluster(spark):
    """aHash-identical payloads collapse to the smallest doc_id; the
    distinct payload survives; schema passes through unchanged."""
    t_a = "the quick brown fox jumps over the lazy dog " * 4
    t_b = "zzzz completely different payload bytes 1234 " * 4
    df = spark.createDataFrame(
        [(1, t_a), (2, t_a), (3, t_b)], "doc_id bigint, text string"
    )
    out = pl.run_pipeline(
        df,
        {"stages": [{"op": "media_near_dedup",
                     "params": {"max_hamming": 8}}]},
    )
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3]
    assert out.columns == df.columns


def test_perplexity_filter_stage_matches_direct_call(spark):
    """The stage keeps exactly the docs the LM scorer clears; the
    bigram model flags the shuffled doc the unigram model cannot;
    unknown model refuses."""
    import pytest

    from pyspark_playground_spark.operators.text import (
        bigram_logprob_scores,
        unigram_logprob_scores,
    )
    from pyspark_playground_spark.plans.pipeline import run_pipeline

    natural = "the cat sat on the mat"
    rows = [(i, natural, "src0") for i in range(1, 6)] + [
        (9, "mat the on sat cat the", "src0"),
        (10, "zq xv jk wq pl mn", "src1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")

    uni = {r["doc_id"]: r["avg_logprob"]
           for r in unigram_logprob_scores(df).collect()}
    thr = (max(uni.values()) + min(uni.values())) / 2
    spec = {"stages": [{"op": "perplexity_filter",
                        "params": {"min_avg_logprob": thr}}]}
    got = sorted(r["doc_id"] for r in run_pipeline(df, spec).collect())
    want = sorted(d for d, lp in uni.items() if lp >= thr)
    assert got == want and 10 not in got
    assert set(run_pipeline(df, spec).columns) == {
        "doc_id", "text", "source"
    }

    # bigram model separates the shuffled doc from the natural ones
    bi = {r["doc_id"]: r["avg_logprob"]
          for r in bigram_logprob_scores(df).collect()}
    thr_bi = (bi[1] + bi[9]) / 2
    spec_bi = {"stages": [{"op": "perplexity_filter",
                           "params": {"min_avg_logprob": thr_bi,
                                      "model": "bigram"}}]}
    got_bi = sorted(r["doc_id"] for r in run_pipeline(df, spec_bi).collect())
    assert 9 not in got_bi and 1 in got_bi

    with pytest.raises(ValueError, match="unigram|bigram"):
        run_pipeline(df, {"stages": [{
            "op": "perplexity_filter",
            "params": {"min_avg_logprob": 0, "model": "kenlm"}}]})
