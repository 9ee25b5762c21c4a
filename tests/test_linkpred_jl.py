"""Link prediction, JL Rademacher projection, grid density, mutual-NN,
and hubness census: hand-built fixtures with closed-form expectations,
plus the candidates-path-equals-exact-path pin for mutual_nn_pairs."""

from __future__ import annotations

import math
from decimal import Decimal

from pyspark.sql import functions as F

from pyspark_playground_spark.operators import graph as G
from pyspark_playground_spark.operators import similarity as S


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src bigint, dst bigint")


# --------------------------------------------------------------------------
# link_prediction_scores
# --------------------------------------------------------------------------

def test_link_prediction_square(spark):
    # 4-cycle 1-2-3-4-1: the two diagonals are the only distance-2 pairs.
    rows = G.link_prediction_scores(
        _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    ).collect()
    got = {(r["node_a"], r["node_b"]): r for r in rows}
    assert set(got) == {(1, 3), (2, 4)}
    aa_term = round(1.0 / round(math.log(2.0), 7), 9)
    for r in got.values():
        assert r["common_neighbors"] == 2
        assert r["adamic_adar"] == Decimal(str(2 * aa_term))
        assert r["jaccard"] == 1.0  # identical neighborhoods


def test_link_prediction_excludes_existing_edges(spark):
    # triangle + pendant: 1-2, 2-3, 1-3, 3-4. Distance-2 pairs through a
    # wedge: (1,4) and (2,4) via center 3; (1,2)/(1,3)/(2,3) are edges and
    # must not appear even though they also share neighbors.
    rows = G.link_prediction_scores(
        _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    ).collect()
    got = {(r["node_a"], r["node_b"]): r for r in rows}
    assert set(got) == {(1, 4), (2, 4)}
    # center 3 has degree 3; node 4 degree 1; nodes 1,2 degree 2
    aa = Decimal(str(round(1.0 / round(math.log(3.0), 7), 9)))
    for (a, b), r in got.items():
        assert r["common_neighbors"] == 1
        assert r["adamic_adar"] == aa
        assert r["jaccard"] == 1.0 / (2 + 1 - 1)


def test_link_prediction_center_degree_cap(spark):
    # star: every candidate pair is mediated by the hub; capping the
    # center degree below the hub's removes every wedge.
    star = [(0, i) for i in range(1, 6)]
    assert G.link_prediction_scores(
        _edges(spark, star), max_center_degree=4
    ).count() == 0
    assert G.link_prediction_scores(_edges(spark, star)).count() == 10


# --------------------------------------------------------------------------
# rademacher_project
# --------------------------------------------------------------------------

def _vecs(spark, rows, dim):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        f"vec_id bigint, embedding array<float>",
    )


def test_rademacher_project_deterministic_and_signs(spark):
    dim, out = 4, 3
    df = _vecs(spark, [(0, [1, 0, 0, 0]), (1, [0, 1, 0, 0])], dim)
    p = S.rademacher_project(df, dim=dim, out_dim=out).collect()
    p2 = S.rademacher_project(df, dim=dim, out_dim=out).collect()
    assert sorted(map(tuple, p)) == sorted(map(tuple, p2))
    # a one-hot vector reads out exactly one ±1 sign per output dim
    by_id = {r["vec_id"]: r for r in p}
    for i in (0, 1):
        for j in range(out):
            assert by_id[i][f"p{j}"] == Decimal(S._rademacher_sign("jl", i, j))


def test_rademacher_project_linear_on_integers(spark):
    # integer coordinates make the 6-decimal rounding exact, so the
    # projection is exactly linear: proj(x + y) = proj(x) + proj(y).
    dim, out = 8, 4
    x = [3, -2, 5, 7, 0, 1, -4, 2]
    y = [1, 1, -6, 2, 9, -3, 0, 5]
    df = _vecs(
        spark,
        [(0, x), (1, y), (2, [a + b for a, b in zip(x, y)])],
        dim,
    )
    rows = {r["vec_id"]: r for r in
            S.rademacher_project(df, dim=dim, out_dim=out).collect()}
    for j in range(out):
        assert rows[2][f"p{j}"] == rows[0][f"p{j}"] + rows[1][f"p{j}"]


# --------------------------------------------------------------------------
# grid_density
# --------------------------------------------------------------------------

def test_grid_density_cells_and_sparse_flag(spark):
    # cell width 0.25: 0.1→cell 0, 0.3→cell 1, -0.1→cell -1 (floor)
    df = _vecs(
        spark,
        [(0, [0.1, 0.1]), (1, [0.2, 0.15]), (2, [0.3, 0.1]), (3, [-0.1, 0.6])],
        2,
    )
    rows = {r["vec_id"]: r for r in
            S.grid_density(df, dims=2, cell_width=0.25, min_cell_count=2).collect()}
    assert (rows[0]["cell_0"], rows[0]["cell_1"]) == (0, 0)
    assert (rows[2]["cell_0"], rows[2]["cell_1"]) == (1, 0)
    assert (rows[3]["cell_0"], rows[3]["cell_1"]) == (-1, 2)
    assert rows[0]["cell_n"] == 2 and not rows[0]["is_sparse"]
    assert rows[1]["cell_n"] == 2 and not rows[1]["is_sparse"]
    assert rows[2]["is_sparse"] and rows[3]["is_sparse"]


# --------------------------------------------------------------------------
# mutual_nn_pairs / k_occurrence_census
# --------------------------------------------------------------------------

def test_mutual_nn_pairs_exact_and_candidates_agree(spark):
    # v0/v1 nearly parallel (mutual top-1); v2 prefers v3's direction but
    # v3's top-1 is v2 as well → two mutual pairs; the cross pairs are not.
    df = _vecs(
        spark,
        [
            (0, [1.0, 0.0, 0.05]),
            (1, [1.0, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.1]),
            (3, [0.0, 1.0, 0.0]),
        ],
        3,
    )
    exact = S.mutual_nn_pairs(df)
    assert {(r["id_a"], r["id_b"]) for r in exact.collect()} == {(0, 1), (2, 3)}

    all_pairs = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(a + 1, 4)],
        "id_a bigint, id_b bigint",
    )
    via_cand = S.mutual_nn_pairs(df, candidates=all_pairs)
    assert sorted(map(tuple, exact.collect())) == sorted(
        map(tuple, via_cand.collect())
    )


def test_mutual_nn_candidates_restrict_scoring(spark):
    # candidate set missing the (0,1) pair: 0 and 1 can only see 2, and 2's
    # single top-1 cannot be mutual with both → no mutual pair survives
    # unless the candidate graph admits it.
    df = _vecs(
        spark, [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0])], 2
    )
    cand = spark.createDataFrame([(0, 2), (1, 2)], "id_a bigint, id_b bigint")
    got = {(r["id_a"], r["id_b"]) for r in
           S.mutual_nn_pairs(df, candidates=cand).collect()}
    assert got == set() or got == {(1, 2)}  # 2's top-1 among {0,1} is 1? no:
    # cosine(2,0)=0 < cosine(2,1)>0, so 2→1 and 1→2 are mutual.
    assert got == {(1, 2)}


def test_k_occurrence_census_includes_zero_bucket(spark):
    topk = spark.createDataFrame(
        [(0, 1), (2, 1), (3, 1), (1, 0)], "query_id bigint, neighbor_id bigint"
    )
    corpus = spark.createDataFrame(
        [(i,) for i in range(5)], "vec_id bigint"
    )
    got = {r["k_occurrence"]: r["n_vectors"] for r in
           S.k_occurrence_census(topk, corpus).collect()}
    # node 1 appears 3×, node 0 once, nodes 2/3/4 never
    assert got == {3: 1, 1: 1, 0: 3}


# --------------------------------------------------------------------------
# textrank composition (queries.textrank_keywords_documents kernel)
# --------------------------------------------------------------------------

def test_textrank_hub_word_ranks_first(spark):
    # 'the' neighbors every other word; satellites neighbor only 'the' —
    # the co-occurrence hub must take the top fixed-point rank.
    from pyspark_playground_spark.operators import graph as G
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "the cat"), (2, "the dog"), (3, "the bird"), (4, "the fish")],
        "doc_id bigint, text string",
    )
    from pyspark_playground_spark.operators.text import tokens_expr
    toks = tokens_expr("text")
    n = F.size(toks)
    big = docs.select(
        F.explode(F.arrays_zip(
            F.slice(toks, 1, n - 1).alias("a"),
            F.slice(toks, 2, n - 1).alias("b"),
        )).alias("p")
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    e0 = big.filter(F.col("a") != F.col("b")).distinct()
    edges = e0.select(F.col("a").alias("src"), F.col("b").alias("dst")).union(
        e0.select(F.col("b"), F.col("a"))).distinct()
    ranks = G.pagerank_fixed_point(edges, iterations=3).collect()
    top = max(ranks, key=lambda r: (r["rank_scaled"], r["node"]))
    assert top["node"] == "the"
    sats = {r["node"]: r["rank_scaled"] for r in ranks if r["node"] != "the"}
    assert len(set(sats.values())) == 1  # symmetric satellites tie exactly


def test_cosine_pair_histogram_bins_and_determinism(spark):
    import hashlib

    vecs = [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [-1.0, 0.0])]
    df = _vecs(spark, vecs, 2)
    got = {r["bin"]: r["n_pairs"] for r in
           S.cosine_pair_histogram(df).collect()}
    # replicate the content-addressed pairing in plain Python
    key = lambda i: int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
    order = sorted(range(4), key=lambda i: (key(i), i))
    by_id = dict(vecs)
    import math
    want = {}
    for p in range(2):
        a, b = by_id[order[2 * p]], by_id[order[2 * p + 1]]
        cos = sum(x * y for x, y in zip(a, b)) / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))
        )
        bin_ = math.floor(round(cos, 6) * 10)
        want[bin_] = want.get(bin_, 0) + 1
    assert got == want
    assert sum(got.values()) == 2  # 4 vectors -> 2 pairs, odd tail none
    # deterministic across invocations
    again = {r["bin"]: r["n_pairs"] for r in
             S.cosine_pair_histogram(df).collect()}
    assert again == got


def test_hard_negative_mining_label_filter_before_rank(spark):
    # v0 (label 0) is most similar to v1 (label 0) — same label, excluded;
    # its hard negative must be v2 (label 1), not none.
    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0], 0),
            (1, [0.99, 0.1, 0.0], 0),
            (2, [0.9, 0.3, 0.0], 1),
            (3, [0.0, 0.0, 1.0], 1),
        ],
        "vec_id bigint, embedding array<float>, label int",
    )
    got = {r["anchor_id"]: r["negative_id"] for r in
           S.hard_negative_mining(df, k=1).collect()}
    assert got[0] == 2
    assert got[1] == 2
    assert got[2] in (0, 1)
    # candidates path equals exact on the admitted pairs
    cand = spark.createDataFrame(
        [(0, 2), (1, 2), (2, 3)], "id_a bigint, id_b bigint"
    )
    via = {r["anchor_id"]: r["negative_id"] for r in
           S.hard_negative_mining(df, k=1, candidates=cand).collect()}
    assert via[0] == 2 and via[1] == 2
