"""frequent_segment_removal (CCNet boilerplate), degree_census, and
degree_assortativity: hand-built fixtures with closed-form expectations."""

from __future__ import annotations

from pyspark_playground_spark.operators import dedup as D
from pyspark_playground_spark.operators import graph as G


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_frequent_segment_removal_drops_everywhere(spark):
    # "footer" appears in 3 docs; with max_doc_freq=2 it is removed from
    # ALL of them (not keep-first); unique lines survive untouched.
    df = _docs(
        spark,
        [
            (1, "alpha\nfooter"),
            (2, "beta\nfooter"),
            (3, "footer\ngamma"),
            (4, "delta"),
        ],
    )
    out = {r["doc_id"]: r for r in
           D.frequent_segment_removal(df, max_doc_freq=2).collect()}
    assert out[1]["text"] == "alpha" and out[1]["n_kept"] == 1
    assert out[2]["text"] == "beta"
    assert out[3]["text"] == "gamma"
    assert out[4]["text"] == "delta" and out[4]["n_segments"] == 1
    assert all(r["n_segments"] == 2 for r in (out[1], out[2], out[3]))


def test_frequent_segment_removal_threshold_and_normalization(spark):
    # at max_doc_freq=3 the 3-doc footer is NOT boilerplate; whitespace /
    # case variants normalize to one segment identity.
    df = _docs(
        spark,
        [(1, "Footer  X\na"), (2, "footer x\nb"), (3, "FOOTER   x\nc")],
    )
    kept3 = D.frequent_segment_removal(df, max_doc_freq=3)
    assert {r["n_kept"] for r in kept3.collect()} == {2}
    kept2 = {r["doc_id"]: r["text"] for r in
             D.frequent_segment_removal(df, max_doc_freq=2).collect()}
    assert kept2 == {1: "a", 2: "b", 3: "c"}


def test_frequent_segment_removal_repeat_within_one_doc_not_frequent(spark):
    # the same line twice in ONE doc is doc-frequency 1 — kept both times
    # (contrast with paragraph_dedup, which keeps only the first).
    df = _docs(spark, [(1, "x\nx"), (2, "y")])
    out = {r["doc_id"]: r for r in
           D.frequent_segment_removal(df, max_doc_freq=1).collect()}
    assert out[1]["text"] == "x\nx" and out[1]["n_kept"] == 2


def test_frequent_segment_removal_min_chars_protects_short(spark):
    # blank segments appear in every doc but are always kept (layout).
    df = _docs(spark, [(1, "a\n\nb"), (2, "c\n\nd"), (3, "e\n\nf")])
    out = D.frequent_segment_removal(df, max_doc_freq=2, min_chars=1)
    assert {r["n_kept"] for r in out.collect()} == {3}


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src bigint, dst bigint")


def test_degree_census_star(spark):
    got = {r["degree"]: r["n_nodes"] for r in
           G.degree_census(_edges(spark, [(0, i) for i in (1, 2, 3)])).collect()}
    assert got == {3: 1, 1: 3}


def test_degree_assortativity_star_is_minus_one(spark):
    # a star is perfectly disassortative: every edge joins deg-3 to deg-1.
    row = G.degree_assortativity(
        _edges(spark, [(0, 1), (0, 2), (0, 3)])
    ).collect()[0]
    assert row["n_endpoints"] == 6
    # x over endpoints = [3,3,3,1,1,1]: sx=12, sxx=30, sxy=2*3*(3*1)=18
    assert (row["sx_s"], row["sxx_s"], row["sxy_s"]) == ("12", "30", "18")
    assert abs(row["assortativity"] + 1.0) < 1e-12


def test_degree_assortativity_regular_graph_is_null(spark):
    # 4-cycle: all degrees equal → zero variance → r undefined. The
    # operator guards the division (ANSI Spark raises DIVIDE_BY_ZERO
    # otherwise) and returns NULL rather than a fake signal.
    row = G.degree_assortativity(
        _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    ).collect()[0]
    assert row["assortativity"] is None
    assert row["n_endpoints"] == 8


def test_k_core_clique_with_tail(spark):
    # 4-clique {1,2,3,4} plus a pendant chain 4-5-6: the 3-core is exactly
    # the clique (degree 3 inside), reached after the chain peels off.
    edges = _edges(spark, [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6),
    ])
    fix = {(r["node"], r["degree"]) for r in G.k_core(edges, k=3).collect()}
    assert fix == {(1, 3), (2, 3), (3, 3), (4, 3)}
    # fixed-round contract: enough rounds equal the fixpoint, extra rounds
    # are no-ops; zero rounds is the input's degree table
    r5 = {(r["node"], r["degree"]) for r in
          G.k_core(edges, k=3, rounds=5).collect()}
    assert r5 == fix
    r0 = {r["node"]: r["degree"] for r in
          G.k_core(edges, k=3, rounds=0).collect()}
    assert r0[4] == 4 and r0[6] == 1


def test_k_core_whole_graph_survives(spark):
    # 4-cycle is its own 2-core: nothing peels, converges in one round.
    edges = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    got = {r["node"]: r["degree"] for r in G.k_core(edges, k=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2, 4: 2}


def test_personalized_pagerank_mass_on_seeds(spark):
    # path 1->2->3 with restart on {1}: node 1 keeps the full restart
    # mass each round; with uniform pagerank the base spreads over all.
    edges = _edges(spark, [(1, 2), (2, 3)])
    seeds = spark.createDataFrame([(1,)], "node bigint")
    ppr = {r["node"]: r["rank_scaled"] for r in
           G.pagerank_fixed_point(edges, iterations=2, seeds=seeds).collect()}
    scale = 10 ** 12
    base = (150_000 * scale) // 1_000_000
    # node 1: no in-edges -> rank = base restart share each round
    assert ppr[1] == base
    # node 2 is NOT a seed: no restart term, only 0.85 * prev_rank(1)
    # (round 1: rank(1) drops to the restart share; round 2 propagates it)
    assert ppr[2] == (850_000 * base) // 1_000_000
    # seeded mass is concentrated: non-seed with no path weight gets base 0
    uniform = {r["node"]: r["rank_scaled"] for r in
               G.pagerank_fixed_point(edges, iterations=2).collect()}
    assert ppr[1] > uniform[1]  # restart mass concentrated on the seed


# --------------------------------------------------------------------------
# hypothesis: k_core and link_prediction vs pure-Python references
# --------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_edge_lists = st.lists(
    st.tuples(st.integers(0, 11), st.integers(0, 11)),
    min_size=1, max_size=24,
)


def _py_kcore(pairs, k):
    edges = {(max(a, b), min(a, b)) for a, b in pairs if a != b}
    while True:
        deg = {}
        for u, v in edges:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        ne = {(u, v) for u, v in edges if u in keep and v in keep}
        if ne == edges:
            break
        edges = ne
    deg = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    return set(deg.items())


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(pairs=_edge_lists, k=st.integers(2, 4))
def test_k_core_matches_python_peel(spark, pairs, k):
    if not [p for p in pairs if p[0] != p[1]]:
        return
    got = {(r["node"], r["degree"]) for r in
           G.k_core(_edges(spark, pairs), k=k).collect()}
    assert got == _py_kcore(pairs, k)


def _py_linkpred_pairs(pairs):
    edges = {(max(a, b), min(a, b)) for a, b in pairs if a != b}
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    out = {}
    for w, nbrs in adj.items():
        for a in nbrs:
            for b in nbrs:
                if a < b:
                    out[(a, b)] = out.get((a, b), 0) + 1
    return {p: c for p, c in out.items()
            if (max(p), min(p)) not in edges}


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(pairs=_edge_lists)
def test_link_prediction_cn_matches_python(spark, pairs):
    if not [p for p in pairs if p[0] != p[1]]:
        return
    got = {(r["node_a"], r["node_b"]): r["common_neighbors"] for r in
           G.link_prediction_scores(_edges(spark, pairs)).collect()}
    assert got == _py_linkpred_pairs(pairs)


def test_modularity_two_triangles_bridge(spark):
    # two triangles joined by one bridge; labels = triangle membership.
    # m=7, intra=6, degree sums per community = 7 and 7:
    # Q = (4*7*6 - (49+49)) / (4*49) = 70/196
    edges = _edges(spark, [
        (1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4),
    ])
    labels = spark.createDataFrame(
        [(n, "a") for n in (1, 2, 3)] + [(n, "b") for n in (4, 5, 6)],
        "node bigint, label string",
    )
    row = G.modularity(edges, labels).collect()[0]
    assert row["m_edges"] == 7
    assert row["intra_edges_s"] == "6"
    assert row["sum_deg_sq_s"] == "98"
    assert abs(row["modularity"] - 70.0 / 196.0) < 1e-12


def test_modularity_single_community_is_near_zero_bound(spark):
    # everything in one community: Q = (4m*m - (2m)^2) / 4m^2 = 0 exactly.
    edges = _edges(spark, [(1, 2), (2, 3), (3, 1)])
    labels = spark.createDataFrame(
        [(n, "x") for n in (1, 2, 3)], "node bigint, label string"
    )
    row = G.modularity(edges, labels).collect()[0]
    assert row["modularity"] == 0.0


def test_hits_star_separates_roles(spark):
    # 1,2,3 -> 0: node 0 is the pure authority, 1-3 pure equal hubs.
    e = _edges(spark, [(1, 0), (2, 0), (3, 0)])
    got = {r["node"]: (r["hub_scaled"], r["auth_scaled"]) for r in
           G.hits_fixed_point(e, iterations=2).collect()}
    s = 10 ** 12
    assert got[0] == (0, s)
    assert got[1] == got[2] == got[3] == (s, 0)


def test_hits_chain_hub_and_authority_mix(spark):
    # 1 -> 2 -> 3: node 2 is both a (weaker) authority and the only
    # co-equal hub; max-normalization pins the top of each role at scale.
    e = _edges(spark, [(1, 2), (2, 3)])
    got = {r["node"]: (r["hub_scaled"], r["auth_scaled"]) for r in
           G.hits_fixed_point(e, iterations=3).collect()}
    s = 10 ** 12
    assert max(h for h, _ in got.values()) == s
    assert max(a for _, a in got.values()) == s
    assert got[3][0] == 0   # 3 points at nothing: zero hub
    assert got[1][1] == 0   # nothing points at 1: zero authority


def test_bfs_distances_chain_and_unreached(spark):
    # chain 1-2-3-4-5, seed {1}, max_hops=2: distances 0,1,2; nodes 4,5
    # beyond the horizon are absent.
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    seeds = spark.createDataFrame([(1,)], "node bigint")
    got = {r["node"]: r["distance"] for r in
           G.bfs_distances(e, seeds, max_hops=2).collect()}
    assert got == {1: 0, 2: 1, 3: 2}


def test_bfs_distances_multi_source_min(spark):
    # seeds at both ends of a 5-chain: middle node gets the MIN distance.
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    seeds = spark.createDataFrame([(1,), (5,)], "node bigint")
    got = {r["node"]: r["distance"] for r in
           G.bfs_distances(e, seeds, max_hops=4).collect()}
    assert got == {1: 0, 5: 0, 2: 1, 4: 1, 3: 2}


def test_bfs_isolated_seed_labels_zero(spark):
    e = _edges(spark, [(1, 2)])
    seeds = spark.createDataFrame([(9,)], "node bigint")
    got = {r["node"]: r["distance"] for r in
           G.bfs_distances(e, seeds, max_hops=3).collect()}
    assert got == {9: 0}
