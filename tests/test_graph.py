"""Connected-components (large-star/small-star) tests: hand-built graphs,
a hypothesis sweep against a plain union-find reference, and the
dedup_clusters convenience."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pyspark_playground_spark.operators import graph as G


def _cc(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, "src bigint, dst bigint")
    return {
        (r["node"], r["component"])
        for r in G.connected_components(df, **kw).collect()
    }


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {(x, find(x)) for x in parent}


def test_two_cliques_and_bridge(spark):
    tri1 = [(1, 2), (2, 3), (1, 3)]
    tri2 = [(10, 11), (11, 12)]
    assert _cc(spark, tri1 + tri2) == {
        (1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (12, 10),
    }
    # Bridging edge merges the two components.
    assert _cc(spark, tri1 + tri2 + [(3, 10)]) == {
        (n, 1) for n in (1, 2, 3, 10, 11, 12)
    }


def test_chain_converges_logarithmically(spark):
    """A 60-node path is the worst case for label propagation (diameter 59);
    large-star/small-star must still converge within the iteration cap."""
    chain = [(i, i + 1) for i in range(60)]
    assert _cc(spark, chain, max_iterations=12) == {(i, 0) for i in range(61)}


def test_self_loops_duplicates_and_reversed_edges(spark):
    pairs = [(5, 5), (1, 2), (2, 1), (2, 1), (7, 6)]
    assert _cc(spark, pairs) == {(1, 1), (2, 1), (6, 6), (7, 6)}


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1, max_size=60,
    )
)
def test_matches_union_find_reference(spark, pairs):
    want = _union_find([p for p in pairs if p[0] != p[1]])
    if not want:  # all self-loops
        assert _cc(spark, pairs) == set()
    else:
        assert _cc(spark, pairs) == want


def test_dedup_clusters_canonical_rows(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(8)], "doc_id bigint, text string"
    )
    pairs = spark.createDataFrame(
        [(0, 3), (3, 5), (6, 7)], "id_a bigint, id_b bigint"
    )
    out = G.dedup_clusters(docs, pairs).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert {r["doc_id"]: r["cluster_id"] for r in out} == {
        0: 0, 1: 1, 2: 2, 3: 0, 4: 4, 5: 0, 6: 6, 7: 6,
    }
    canon = {i for i, r in by_id.items() if r["is_canonical"]}
    assert canon == {0, 1, 2, 4, 6}
    # Dedup keeps exactly one row per cluster.
    kept = [r for r in out if r["is_canonical"]]
    assert len(kept) == len({r["cluster_id"] for r in out})


def test_triangle_count(spark):
    def tri(pairs):
        df = spark.createDataFrame(pairs, "src bigint, dst bigint")
        return G.triangle_count(df).first()["n_triangles"]

    assert tri([(1, 2), (2, 3), (1, 3)]) == 1
    assert tri([(1, 2), (2, 3), (3, 4)]) == 0  # chain: no triangles
    # K4 has C(4,3)=4 triangles; duplicate/reversed edges don't inflate
    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
    assert tri(k4) == 4
    assert tri([(5, 5)]) == 0  # self-loop only


def test_connected_components_random_graph_converges_fast(spark):
    """A 3000-node graph (random edges + a long chain) converges within the
    iteration budget and labels match union-find."""
    import random

    rng = random.Random(7)
    pairs = [(i, i + 1) for i in range(1000)]  # 1001-node chain
    pairs += [
        (rng.randrange(1000, 3000), rng.randrange(1000, 3000)) for _ in range(1500)
    ]
    want = _union_find([p for p in pairs if p[0] != p[1]])
    assert _cc(spark, pairs, max_iterations=15) == want


# ---------------------------------------------------------------------------
# pagerank_fixed_point
# ---------------------------------------------------------------------------

def _pagerank_model(edges, iterations=3, damping_ppm=850_000, scale=10**12):
    """Pure-Python mirror of the fixed-point update rule."""
    e = sorted(set(edges))
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    outdeg = {}
    for u, _ in e:
        outdeg[u] = outdeg.get(u, 0) + 1
    n = len(nodes)
    start = scale // n
    rank = {v: start for v in nodes}
    base_ppm = 1_000_000 - damping_ppm
    for _ in range(iterations):
        contrib = {v: 0 for v in nodes}
        for u, v in e:
            contrib[v] += rank[u] // outdeg[u]
        rank = {
            v: (base_ppm * start + damping_ppm * contrib[v]) // 1_000_000
            for v in nodes
        }
    return rank


def test_pagerank_matches_python_model(spark):
    from pyspark_playground_spark.operators.graph import pagerank_fixed_point

    edges = [(1, 2), (2, 1), (1, 3), (3, 1), (4, 1), (2, 3), (5, 5), (4, 5)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.rank_scaled for r in pagerank_fixed_point(
        df, iterations=4
    ).collect()}
    assert got == _pagerank_model(edges, iterations=4)


def test_pagerank_dangling_and_sink_behavior(spark):
    from pyspark_playground_spark.operators.graph import pagerank_fixed_point

    # 3 is a pure sink (dangling): it receives but never emits
    edges = [(1, 3), (2, 3)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.rank_scaled for r in pagerank_fixed_point(
        df, iterations=2
    ).collect()}
    model = _pagerank_model(edges, iterations=2)
    assert got == model
    # the sink accumulates strictly more mass than its feeders
    assert got[3] > got[1] == got[2]


def test_pagerank_total_mass_bounded(spark):
    from pyspark_playground_spark.operators.graph import pagerank_fixed_point

    edges = [(1, 2), (2, 3), (3, 1)]  # cycle: no dangling leak
    df = spark.createDataFrame(edges, ["src", "dst"])
    ranks = [r.rank_scaled for r in pagerank_fixed_point(
        df, iterations=5
    ).collect()]
    # mass conserved up to floor-division ulps (≤ a few per node per round)
    assert abs(sum(ranks) - 10**12) < 100


def test_update_components_equals_full_recompute(spark):
    """Folding a new edge batch into an existing labeling produces exactly
    the labeling of a full recompute over all edges."""
    old_edges = [(1, 2), (2, 3), (10, 11), (20, 21)]
    new_edges = [(3, 10), (30, 31), (21, 20)]  # merge, new comp, dup
    labels = G.connected_components(
        spark.createDataFrame(old_edges, "src long, dst long")
    )
    # add a pre-existing singleton label (node 99 alone in its component)
    labels = labels.union(
        spark.createDataFrame([(99, 99)], "node long, component long")
    )
    updated = {
        (r["node"], r["component"])
        for r in G.update_components(
            labels, spark.createDataFrame(new_edges, "src long, dst long")
        ).collect()
    }
    full = {
        (r["node"], r["component"])
        for r in G.connected_components(
            spark.createDataFrame(old_edges + new_edges, "src long, dst long")
        ).collect()
    }
    assert updated == full | {(99, 99)}
    # merged component collapsed to one label
    assert {c for n, c in updated if n in (1, 2, 3, 10, 11)} == {1}


def test_update_components_no_new_edges_is_identity(spark):
    labels = G.connected_components(
        spark.createDataFrame([(5, 6), (6, 7)], "src long, dst long")
    )
    empty = spark.createDataFrame([], "src long, dst long")
    out = {
        (r["node"], r["component"])
        for r in G.update_components(labels, empty).collect()
    }
    assert out == {(5, 5), (6, 5), (7, 5)}


def test_label_propagation_two_cliques_thin_bridge(spark):
    # two 4-cliques joined by ONE bridge edge: CC fuses them into one
    # component; majority-vote LPA keeps two communities
    clique_a = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    clique_b = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    edges = spark.createDataFrame(
        clique_a + clique_b + [(3, 10)], "src long, dst long"
    )
    cc = {r["component"] for r in G.connected_components(edges).collect()}
    assert cc == {0}  # one fused component
    lpa = {
        r["node"]: r["label"]
        for r in G.label_propagation(edges, iterations=3).collect()
    }
    assert {lpa[n] for n in range(4)} == {0}
    assert {lpa[n] for n in range(10, 14)} == {10}


def test_label_propagation_tie_breaks_to_min_label(spark):
    # node 2's neighbors {0, 1} each vote once -> tie -> min label wins
    edges = spark.createDataFrame([(0, 2), (1, 2)], "src long, dst long")
    lpa = {
        r["node"]: r["label"]
        for r in G.label_propagation(edges, iterations=1).collect()
    }
    assert lpa[2] == 0


def test_label_propagation_includes_isolated_nodes(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    nodes = spark.createDataFrame([(1,), (2,), (9,)], "id long")
    lpa = {
        r["node"]: r["label"]
        for r in G.label_propagation(edges, iterations=2, nodes=nodes).collect()
    }
    # isolated node keeps its own label; the pair oscillates deterministically
    assert lpa[9] == 9
    assert set(lpa) == {1, 2, 9}
