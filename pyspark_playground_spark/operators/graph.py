"""Distributed connected components for dedup-cluster merging.

Near-dup detection (MinHash/LSH, SimHash, embedding-cosine — see
``operators/dedup.py`` / ``operators/similarity.py``) emits candidate
*pairs*; production pipelines then need the transitive closure — if A~B
and B~C, then {A, B, C} is one duplicate cluster with one canonical
representative. That closure is connected components over the pair graph.

Beyond-reference surface (the reference engine has no graph operator).

Algorithm: the alternating **large-star / small-star** method of Kiveris,
Lattanzi, Mirrokni, Rastogi & Vassilvitskii, "Connected Components in
MapReduce and Beyond" (SoCC'14) — the standard shuffle-based CC algorithm:

- ``large-star``: every node points its *larger* neighbors at the minimum
  of its neighborhood (including itself).
- ``small-star``: every node points its *smaller-or-equal* neighbors and
  itself at the minimum of those.

Each operation is one per-neighborhood ``min`` window — ONE key shuffle
(r11: formerly groupBy-min + self-join, two) — and provably converges to star graphs rooted at each
component's minimum node in O(log n) rounds (in practice 2-4 rounds for
dedup graphs, whose clusters are near-cliques). This is the 100 TB shape:
no driver-side state, per-round cost linear in the edge count, and the
edge set *shrinks* monotonically toward one edge per non-root node.

Why not plain min-label propagation: its round count is the graph
*diameter*, which an adversarial chain makes O(n); large-star/small-star
is O(log n) regardless of shape.

Each round materializes the new edge set (lineage truncation — an
iterative join would otherwise double the plan per round, the same trap
documented in ``dedup._materialize``): ``localCheckpoint`` by default,
reliable ``checkpoint_dir`` for cluster runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyspark_playground_spark.operators.dedup import _materialize


def _materialize_for_fingerprint(
    df: DataFrame, checkpoint_dir: str | None
) -> DataFrame:
    """Lineage-truncating materialization for a frame whose FIRST action
    is the convergence fingerprint: ``localCheckpoint(eager=False)``, so
    the fingerprint aggregate itself materializes the checkpoint — one
    job per CC round where the eager form paid two (materialize, then
    fingerprint). The reliable-checkpoint path stays eager: a lazy
    reliable checkpoint recomputes its lineage when writing, which would
    double the round's work on a cluster."""
    if checkpoint_dir is not None:
        sc = df.sparkSession.sparkContext
        sc.setCheckpointDir(checkpoint_dir)
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=False)


def _canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected edge set as (u > v) pairs, self-loops dropped."""
    u, v = F.col(src).alias("u"), F.col(dst).alias("v")
    return (
        edges.select(F.greatest(u, v).alias("u"), F.least(u, v).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(edges: DataFrame, *, dedup: bool = True) -> DataFrame:
    """(v, m(u)) for every neighbor v > u, with m(u) = min(Γ(u) ∪ {u}).

    ``min(v) over (partition by u)`` instead of the classic
    groupBy-min + self-join: the same per-neighborhood minimum with ONE
    exchange of the edge set where the join formulation shuffles it
    twice (once into the aggregate, once into the join) — guide §2.4,
    two operations keyed the same way share one exchange. ``dedup=False``
    skips the trailing ``distinct`` when the caller immediately feeds
    :func:`_small_star`, whose own terminal ``distinct`` collapses the
    (bounded: ≤ one per input edge) duplicates anyway — one fewer
    exchange per CC round.
    """
    # parsed SQL strings (r11): a CC run builds this plan once per star
    # per round — the per-element F./Window construction was ~0.1 s of
    # py4j round trips per star call, the largest driver cost of the
    # loop after the per-round plan compile; one selectExpr string
    # parses in the JVM in ~ms and produces the identical logical plan
    # (inline(array(struct..)) ≡ explode+field-select)
    sym = edges.selectExpr(
        "inline(array(named_struct('u', u, 'v', v),"
        " named_struct('u', v, 'v', u)))"
    )
    starred = sym.selectExpr(
        "u", "v", "least(min(v) over (partition by u), u) as m"
    )
    out = starred.where("v > u").selectExpr("v as u", "m as v")
    return out.distinct() if dedup else out


def _small_star(edges: DataFrame, *, dedup: bool = True) -> DataFrame:
    """(v, m(u)) for every smaller neighbor v of u, plus (u, m(u)).

    Operates on the big→small orientation the preceding large-star (or
    ``_canonical_edges``) guarantees. Same one-exchange window
    formulation as :func:`_large_star` (the self-edge ``(u, m(u))`` is
    emitted per input row instead of per key; the terminal ``distinct``
    collapses it to one, exactly the set the groupBy formulation
    built). ``dedup=False`` (r12) skips the terminal ``distinct`` when
    the caller immediately feeds another star round inside the SAME
    materialization: both stars' window-min and per-row emissions are
    duplicate-insensitive, so the pair-final ``distinct`` restores the
    identical edge SET while the intermediate round saves its own
    (u, v) exchange — one fewer stage barrier per non-final round."""
    # one Generate pass instead of rewired ∪ self_edges: a union would
    # scan the (checkpointed) round input twice and double the logical
    # plan the next localCheckpoint has to re-plan (r11: per-round plan
    # construction was the CC wall at bench scale, not the data).
    # Parsed SQL strings for the same py4j reason as _large_star.
    with_min = edges.selectExpr(
        "u", "v", "min(v) over (partition by u) as m"
    )
    out = with_min.selectExpr(
        "inline(CASE WHEN v != m THEN"
        " array(named_struct('u', v, 'v', m), named_struct('u', u, 'v', m))"
        " ELSE array(named_struct('u', u, 'v', m)) END)"
    )
    out = out.where("u != v")
    return out.distinct() if dedup else out


def _edge_fingerprint(edges: DataFrame) -> tuple[int, int]:
    # Sum the 64-bit hashes in decimal(38,0): a bigint sum overflows under
    # ANSI mode after a handful of edges, and order-independence is required.
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("h"),
    ).first()
    return row["n"], int(row["h"])


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iterations: int = 25,
    checkpoint_dir: str | None = None,
    rounds_per_check: int = 2,
) -> DataFrame:
    """Connected components of the undirected graph given as an edge list.

    Returns ``(node, component)`` for every node that appears in an edge,
    where ``component`` is the smallest node id in that node's component
    (the usual canonical label). Isolated nodes never appear in an edge
    list; callers wanting them keep ``coalesce(component, id)`` after a
    left join — see ``dedup_clusters``.

    Deterministic: output depends only on the edge set.

    Convergence is detected with a per-materialization scalar aggregate
    (count + order-independent hash of the edge set, one ``first()`` on
    a 1-row result) — O(1) driver data, and the SAME job that
    materializes the lazily-localCheckpointed edge set (r11: the eager
    materialize-then-fingerprint form paid two sequential jobs per
    round). ``rounds_per_check`` star rounds run per materialization
    (default 2): coordination cost — job launch, checkpoint planning,
    fingerprint — is paid once per PAIR of rounds, the same shuffles
    run inside one job, and a repeated fingerprint still certifies the
    fixed point (the algorithm's potential strictly decreases until
    convergence, so an edge set recurring after k rounds IS converged;
    measured 7 → 4 jobs, labels identical, on the entity-resolution
    bench graph). The cost is detection granularity: up to
    ``rounds_per_check - 1`` extra star rounds over the already-
    converged star forest (whose edge set is the minimal one-per-node
    form — the cheapest rounds of the run). Bound total work with
    ``max_iterations`` (star rounds needed ≈ log₂ of the largest
    component's diameter; the default 25 covers astronomically large
    graphs).
    """
    # The input edge set is NOT checkpointed separately (r11): the first
    # round-pair's materialization computes the caller's plan (e.g. the
    # pairing join feeding entity resolution) exactly once as part of
    # its own job — the former dedicated canonical-edges checkpoint +
    # baseline fingerprint paid one extra plan compile + job per CC
    # call to learn a baseline the first round-pair comparison can do
    # without. Cost: graphs ALREADY converged at input pay one extra
    # (trivial: star rounds over a star forest) pair before stopping.
    cur = _canonical_edges(edges, src, dst)
    fp: tuple[int, int] | None = None
    rounds_done = 0
    while rounds_done < max_iterations:
        plan = cur
        n_rounds = min(rounds_per_check, max_iterations - rounds_done)
        for i in range(n_rounds):
            # intra-pair rounds skip the small-star distinct too (r12):
            # stars are duplicate-insensitive (window-min + per-row
            # emission), so only the round that feeds the
            # materialization/fingerprint needs set semantics — one
            # fewer (u, v) exchange per non-final round. The duplicate
            # fan-out is bounded (each input row emits <= 2 rows).
            plan = _small_star(
                _large_star(plan, dedup=False), dedup=(i == n_rounds - 1)
            )
            rounds_done += 1
        nxt = _materialize_for_fingerprint(plan, checkpoint_dir)
        nfp = _edge_fingerprint(nxt)
        if fp is not None:
            cur.unpersist()
        cur, prev_fp, fp = nxt, fp, nfp
        if prev_fp is not None and nfp == prev_fp:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} rounds"
        )
    # Converged edge set is a star forest: (node, root) for node != root.
    roots = cur.select(F.col("v").alias("node")).distinct().select(
        "node", F.col("node").alias("component")
    )
    members = cur.select(F.col("u").alias("node"), F.col("v").alias("component"))
    return members.union(roots)


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_column: str = "doc_id",
    pair_left: str = "id_a",
    pair_right: str = "id_b",
    *,
    max_iterations: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Stamp every row of ``df`` with its duplicate-cluster id.

    ``pairs`` is any near-dup pair output (MinHash/SimHash/embedding).
    Adds ``cluster_id`` (the smallest ``id_column`` value in the row's
    cluster; singletons cluster with themselves) and ``is_canonical``
    (true for the one row to keep per cluster). Downstream dedup is then
    ``df.where("is_canonical")``.
    """
    comps = connected_components(
        pairs,
        pair_left,
        pair_right,
        max_iterations=max_iterations,
        checkpoint_dir=checkpoint_dir,
    ).withColumnRenamed("node", id_column)
    out = df.join(comps, id_column, "left").withColumn(
        "cluster_id", F.coalesce(F.col("component"), F.col(id_column))
    )
    return out.drop("component").withColumn(
        "is_canonical", F.col(id_column) == F.col("cluster_id")
    )


def update_components(
    labels: DataFrame,
    new_edges: DataFrame,
    *,
    node_column: str = "node",
    component_column: str = "component",
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Incrementally fold a batch of new edges into an existing
    connected-components labeling — the cluster-maintenance step of a
    rolling near-dup pipeline (``incremental_minhash_pairs`` finds the new
    batch's pairs; this merges them into yesterday's ``(node, component)``
    table without re-reading historical pair lists).

    Correctness: an existing labeling IS its own spanning forest — each
    ``(node, component)`` row is an edge to the component's canonical
    root — so CC over ``labels-as-edges ∪ new_edges`` yields exactly the
    labeling a full recompute over all historical pairs would (pinned by
    test). Cost scales with ``|labels| + |new_edges|``, already O(nodes),
    not with the historical pair count; star-contraction rounds ≈ log of
    the largest *newly merged* chain, and the label edges are depth-1
    stars so untouched components converge immediately.

    Returns the refreshed ``(node, component)`` with the usual min-id
    canonical labels, covering every previously labeled node plus any new
    nodes in ``new_edges``.
    """
    label_edges = labels.select(
        F.col(node_column).alias("src"), F.col(component_column).alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    batch = new_edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    merged = connected_components(
        label_edges.unionByName(batch),
        "src",
        "dst",
        max_iterations=max_iterations,
        checkpoint_dir=checkpoint_dir,
    )
    # self-labeled singletons from the old labeling don't form edges;
    # restore them (unless the new batch connected them to something)
    singles = (
        labels.filter(F.col(node_column) == F.col(component_column))
        .select(F.col(node_column).alias("node"))
        .join(merged.select("node"), "node", "left_anti")
        .select("node", F.col("node").alias("component"))
    )
    return merged.unionByName(singles).withColumnsRenamed(
        {"node": node_column, "component": component_column}
    )


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Global triangle count of the undirected graph (one row, ``n_triangles``).

    Standard two-join formulation over the canonical (u > v ordered)
    edge set: wedges ``a<b<c`` from edges (b,a) and (c,b), closed by
    probing (c,a). Ordering each triangle as a<b<c counts it exactly
    once with no post-division. Two equi-joins on single node keys — at
    scale the shuffle cost is the wedge count, the known lower bound for
    exact counting; cap the hottest-degree nodes upstream if the degree
    distribution is adversarial.

    Diagnostic for dedup graphs: triangles/edges ≈ how clique-like the
    near-dup clusters are (pure chains → 0; k-cliques → k choose 3).
    """
    e = _canonical_edges(edges, src, dst)  # (u, v) with u > v
    ba = e.select(F.col("v").alias("a"), F.col("u").alias("b"))  # a < b
    cb = e.select(F.col("v").alias("b"), F.col("u").alias("c"))  # b < c
    ca = e.select(F.col("v").alias("a2"), F.col("u").alias("c2"))
    wedges = ba.join(cb, "b")
    closed = wedges.join(
        ca, (wedges["a"] == ca["a2"]) & (wedges["c"] == ca["c2"])
    )
    return closed.agg(F.count(F.lit(1)).alias("n_triangles"))


def pagerank_fixed_point(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping_ppm: int = 850_000,
    scale: int = 10**12,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """PageRank with deterministic fixed-point integer arithmetic.

    ``seeds`` turns this into PERSONALIZED PageRank (Haveliwala, WWW'02):
    the restart mass concentrates on the seed node set (first column of
    ``seeds``, ``scale div |S|`` each) instead of spreading uniformly —
    ranks then measure proximity TO THE SEEDS, the related-entity /
    topic-sensitive recommendation primitive. The iteration is unchanged;
    only the base vector differs, so the oracle chain reuses the same
    rounds with a seeded base.

    Classic power iteration (Page & Brin'98), but every probability is a
    bigint numerator over ``scale`` and every division is floor division —
    so the result is bit-identical across engines, row orders, and
    partitionings, where double-precision PageRank differs in final ulps
    depending on summation order. The deterministic mass leak from floor
    division (≤ outdeg ulps per node per round) is the documented price.

    Update rule per iteration (all integer)::

        contrib(v)  = Σ_{u→v} rank(u) div outdeg(u)
        rank'(v)    = ((1e6 - damping_ppm) * (scale div n)
                       + damping_ppm * contrib(v)) div 1e6

    Dangling nodes (no out-edges) leak their mass, as in the common
    sparse-matrix formulation. Plan shape per round: one join of the rank
    vector onto the edge list (both partitioned by ``src``) + one
    ``groupBy(dst).sum`` — two key shuffles, no driver-side state, edges
    never materialize to the driver. ``iterations`` is a fixed hyper-
    parameter (3-20 in practice), so the lineage stays bounded; pass the
    result through ``checkpoint``/write-read between restarts at 100 TB.

    Output: (node, rank_scaled) — rank_scaled/scale ≈ the probability.
    """
    # e feeds nodes (twice, via the union branches), outdeg, and the
    # weighted loop frame — persist it so an expensive upstream edge
    # derivation (e.g. textrank's explode+distinct over the corpus) is
    # evaluated once, not once per consumer.
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("__n"))

    if seeds is None:
        # every node starts at scale div n; the one-row total broadcasts
        base = nodes.crossJoin(F.broadcast(n_nodes)).select(
            "node", F.expr(f"CAST({scale} DIV __n AS BIGINT)").alias("__start")
        )
    else:
        s = seeds.select(
            F.col(seeds.columns[0]).alias("node")
        ).distinct()
        n_seeds = s.agg(F.count(F.lit(1)).alias("__n"))
        base = (
            nodes.join(s.withColumn("__is_seed", F.lit(True)), "node", "left")
            .crossJoin(F.broadcast(n_seeds))
            .select(
                "node",
                F.when(
                    F.col("__is_seed"),
                    F.expr(f"CAST({scale} DIV __n AS BIGINT)"),
                )
                .otherwise(F.lit(0).cast("bigint"))
                .alias("__start"),
            )
        )
    ranks = base.select("node", F.col("__start").alias("rank_scaled"))
    base_ppm = 1_000_000 - damping_ppm
    # both frames are loop-invariant; without persist every iteration
    # re-derives them through lineage (re-scanning edges and re-running the
    # node distinct) — measured 1.7× on the 5M-edge probe. Storage is
    # O(edges); on a cluster swap for reliable checkpoints as in dedup.py.
    weighted = e.join(outdeg, "src").persist()
    base = base.persist()
    for _ in range(iterations):
        contrib = (
            weighted.join(
                ranks.select(F.col("node").alias("src"), "rank_scaled"), "src"
            )
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_scaled DIV outdeg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("__contrib"))
        )
        ranks = (
            base.join(contrib, "node", "left")
            .select(
                "node",
                F.expr(
                    f"CAST(({base_ppm} * __start"
                    f" + {damping_ppm} * coalesce(__contrib, CAST(0 AS BIGINT)))"
                    f" DIV 1000000 AS BIGINT)"
                ).alias("rank_scaled"),
            )
        )
    return ranks


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    iterations: int = 2,
    nodes: DataFrame | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Deterministic synchronous label propagation (community detection):
    every node starts labeled with its own id; each round it adopts the
    MOST FREQUENT label among its neighbors, ties broken by the smallest
    label, isolated nodes keeping their current label. Returns
    ``(node, label)`` after exactly ``iterations`` rounds.

    This is the density-sensitive complement to ``connected_components``:
    CC merges anything reachable (one stray cross-link fuses two
    near-clique dup groups), while LPA's majority vote keeps two dense
    communities separate across a thin bridge. The synchronous min-tie
    variant is fully deterministic — no randomized update order — so runs
    are reproducible across engines, at the usual cost that labels can
    oscillate on bipartite-ish graphs; the fixed iteration count is the
    contract (community detection, not transitive closure).

    Plan per round: neighbor-label messages via one key join
    (``dst -> label``), a ``(node, label)`` count aggregation (map-side
    combined), and the argmax window PARTITIONED BY node — every frame is
    keyed by node, nothing corpus-wide; a hub node's window is bounded by
    its distinct neighbor labels. Lineage is truncated per round
    (``localCheckpoint`` / ``checkpoint_dir``) exactly like
    ``connected_components`` — an unmaterialized loop doubles the plan
    per iteration.
    """
    from pyspark.sql import Window

    und = _canonical_edges(edges, src, dst)
    sym = und.union(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
    sym = _materialize(sym, checkpoint_dir)

    node_frame = sym.select(F.col("u").alias("node")).distinct()
    if nodes is not None:
        extra = nodes.select(F.col(nodes.columns[0]).alias("node")).distinct()
        node_frame = node_frame.union(extra).distinct()
    labels = node_frame.withColumn("label", F.col("node"))

    w = Window.partitionBy("u").orderBy(F.desc("n"), F.asc("label"))
    for _ in range(iterations):
        msgs = sym.join(
            labels.select(F.col("node").alias("v"), "label"), "v"
        ).select("u", "label")
        counts = msgs.groupBy("u", "label").agg(F.count(F.lit(1)).alias("n"))
        picked = (
            counts.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") == 1)
            .select(F.col("u").alias("node"), F.col("label").alias("__new"))
        )
        labels = (
            labels.join(picked, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("__new"), F.col("label")).alias("label"),
            )
        )
        labels = _materialize(labels, checkpoint_dir)
    return labels


def link_prediction_scores(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_center_degree: int | None = None,
    ln_decimals: int = 7,
    contrib_decimals: int = 9,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Link-prediction scores for every distance-2 non-edge pair:
    common-neighbor count, Adamic-Adar, and neighborhood Jaccard
    (Liben-Nowell & Kleinberg, CIKM'03) — the classic "who should be
    connected next" triad, useful on dedup/citation graphs to find
    near-dup clusters that banding almost joined.

    Candidate pairs are exactly the wedges: for each center ``w`` with
    neighbors ``a < b``, the pair (a, b) is scored

    - ``common_neighbors`` = number of shared neighbors ``w``;
    - ``adamic_adar``      = Σ_w 1/ln(deg(w)), each term computed as
      ``round(1/round(ln(deg), ln_decimals), contrib_decimals)`` and
      summed in exact DECIMAL — engine- and order-stable (wedge centers
      always have deg ≥ 2, so ln > 0);
    - ``jaccard``          = cn / (deg(a) + deg(b) − cn), an exact IEEE
      division of integers — identical on any engine.

    Pairs that are already edges are removed (prediction targets only).

    Plan shape: one self-join of the adjacency list on the center node
    (wedge enumeration — the same lower bound as triangle counting), one
    groupBy on the pair key, degree joins on node keys, one anti-join
    against the edge set. The wedge count is Σ_w deg(w)², so a hub node
    explodes candidates quadratically: ``max_center_degree`` drops
    wedge CENTERS above the cap (scores through mega-hubs carry ≈ no
    Adamic-Adar weight anyway — 1/ln(deg) → 0), the standard skew
    remedy; degree counts stay exact.

    Output: (node_a, node_b, common_neighbors, adamic_adar DECIMAL,
    jaccard DOUBLE) with node_a < node_b.

    The canonical edge set, the degree table, and the annotated
    adjacency are each consumed 2-3× downstream (self-join sides, the
    anti-join, both degree attachments) — they are materialized once
    (``_materialize``: localCheckpoint, or a reliable checkpoint via
    ``checkpoint_dir`` on clusters) so the input is scanned once, not
    once per reuse.
    """
    e = _materialize(_canonical_edges(edges, src, dst), checkpoint_dir)
    adj = e.select(F.col("u").alias("node"), F.col("v").alias("nbr")).union(
        e.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )
    deg = _materialize(
        adj.groupBy("node").agg(F.count(F.lit(1)).alias("degree")),
        checkpoint_dir,
    )

    centers = adj.join(deg, "node").select(
        F.col("node").alias("w"), "nbr", F.col("degree").alias("__wdeg")
    )
    if max_center_degree is not None:
        centers = centers.filter(F.col("__wdeg") <= max_center_degree)
    centers = _materialize(centers, checkpoint_dir)
    aa_term = F.round(
        F.lit(1.0) / F.round(F.log(F.col("__wdeg").cast("double")), ln_decimals),
        contrib_decimals,
    ).cast("decimal(18,9)")

    left = centers.select("w", F.col("nbr").alias("node_a"), "__wdeg")
    right = centers.select("w", F.col("nbr").alias("node_b"))
    wedges = (
        left.join(right, "w")
        .filter(F.col("node_a") < F.col("node_b"))
        .select("node_a", "node_b", aa_term.alias("__aa"))
    )
    pairs = wedges.groupBy("node_a", "node_b").agg(
        F.count(F.lit(1)).cast("int").alias("common_neighbors"),
        F.sum("__aa").alias("adamic_adar"),
    )
    # prediction targets only: drop pairs that are already edges
    pairs = pairs.join(
        e.select(F.col("v").alias("node_a"), F.col("u").alias("node_b")),
        ["node_a", "node_b"],
        "left_anti",
    )
    da = deg.select(F.col("node").alias("node_a"), F.col("degree").alias("__da"))
    db = deg.select(F.col("node").alias("node_b"), F.col("degree").alias("__db"))
    return (
        pairs.join(da, "node_a")
        .join(db, "node_b")
        .select(
            "node_a",
            "node_b",
            "common_neighbors",
            "adamic_adar",
            (
                F.col("common_neighbors").cast("double")
                / (F.col("__da") + F.col("__db") - F.col("common_neighbors")).cast(
                    "double"
                )
            ).alias("jaccard"),
        )
    )


def degree_census(
    edges: DataFrame, *, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Degree distribution of the undirected simple graph: one row per
    observed degree value, ``(degree, n_nodes)`` — the first thing to
    plot on any dedup/linkage graph (a heavy tail here is the early
    warning for every wedge-shaped operator downstream).

    Two bounded aggregations: node-keyed degree count, then a count on
    the degree VALUE (cardinality ≤ max degree). Exact. The canonical
    edge set feeds both sides of the endpoint union — materialized so
    the input is scanned once.
    """
    e = _materialize(_canonical_edges(edges, src, dst))
    adj = e.select(F.col("u").alias("node")).union(
        e.select(F.col("v").alias("node"))
    )
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    return deg.groupBy("degree").agg(
        F.count(F.lit(1)).cast("int").alias("n_nodes")
    )


def degree_assortativity(
    edges: DataFrame, *, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Degree assortativity (Newman, PRL'02): the Pearson correlation of
    endpoint degrees over the symmetric edge-endpoint list — positive on
    social-style graphs (hubs befriend hubs), negative on web/biology
    hub-and-spoke graphs; near 0 on hash/random graphs. On a dedup graph
    a strongly negative value means a few template hubs attach to
    everything — salting/cap guidance for the pair-shaped operators.

    All sufficient statistics (Σx, Σx², Σxy over both edge directions)
    are exact integers widened per-term to DECIMAL(38,0) BEFORE summing
    (cross-products of degrees overflow int64 at scale); symmetry makes
    Σx = Σy and Σx² = Σy². The final r is computed in double from those
    exact integers with one fixed expression — identical IEEE arithmetic
    on any engine. A REGULAR graph has zero degree variance and no
    defined r — the output is NULL there (guarded; ANSI Spark would
    otherwise raise DIVIDE_BY_ZERO).

    Plan shape: the canonical edge set and the degree table are each
    consumed twice downstream — both are ``_materialize``d so the input
    is scanned once. The symmetric (x, y) ∪ (y, x) endpoint list is
    FOLDED into one pass over the directed endpoints (each edge
    contributes x+y, x²+y², 2xy) instead of a self-union — exactly the
    same integers, half the rows, no duplicate join subtree. Output one
    row: (n_endpoints, sx_s, sxx_s, sxy_s, assortativity DOUBLE).
    """
    e = _materialize(_canonical_edges(edges, src, dst))
    deg = _materialize(
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("degree").alias("__du"))
    dv = deg.select(F.col("node").alias("v"), F.col("degree").alias("__dv"))
    ends = e.join(du, "u").join(dv, "v")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    x, y = F.col("__du"), F.col("__dv")
    agg = ends.agg(
        (F.count(F.lit(1)) * 2).alias("n_endpoints"),
        F.sum(dec(x + y)).alias("__sx"),
        F.sum(dec(x * x + y * y)).alias("__sxx"),
        F.sum(dec(F.lit(2) * x * y)).alias("__sxy"),
    )
    n = F.col("n_endpoints").cast("double")
    sx = F.col("__sx").cast("double")
    sxx = F.col("__sxx").cast("double")
    sxy = F.col("__sxy").cast("double")
    return agg.select(
        "n_endpoints",
        F.col("__sx").cast("string").alias("sx_s"),
        F.col("__sxx").cast("string").alias("sxx_s"),
        F.col("__sxy").cast("string").alias("sxy_s"),
        F.when(
            n * sxx - sx * sx != F.lit(0.0),
            (n * sxy - sx * sx) / (n * sxx - sx * sx),
        ).alias("assortativity"),
    )


def k_core(
    edges: DataFrame,
    *,
    k: int,
    src: str = "src",
    dst: str = "dst",
    rounds: int | None = None,
    max_rounds: int = 50,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """k-core decomposition by iterative peeling (Seidman'83): repeatedly
    delete nodes of degree < k until every survivor has ≥ k neighbors
    inside the surviving subgraph. On a dedup graph the k-core isolates
    the template-heavy near-clique blobs from incidental chain overlaps —
    the part of the graph where transitive merging is actually safe.

    ``rounds=None`` (production): peel to the fixpoint, detected by the
    edge count (peeling only deletes — an unchanged count IS
    convergence), bounded by ``max_rounds``. ``rounds=N``: run exactly N
    peels — a deterministic function of the input on ANY graph, which is
    what a replayable oracle wants; when N ≥ the convergence round the
    result equals the fixpoint (extra peels are no-ops).

    Plan shape per round: one degree count (node-keyed) + two semi-joins
    of the edge list against the survivor set — all key shuffles; the
    edge set shrinks monotonically. Each round is materialized
    (lineage truncation, the connected_components precedent).

    Output: (node, degree) for core members — degree WITHIN the core.
    """
    e = _materialize(_canonical_edges(edges, src, dst), checkpoint_dir)

    def degrees(ed: DataFrame) -> DataFrame:
        return (
            ed.select(F.col("u").alias("node"))
            .union(ed.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("degree"))
        )

    def peel(ed: DataFrame) -> DataFrame:
        keep = degrees(ed).filter(F.col("degree") >= k).select("node")
        return (
            ed.join(keep.withColumnRenamed("node", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("node", "v"), "v", "left_semi")
            .select("u", "v")
        )

    if rounds is not None:
        for _ in range(rounds):
            e = _materialize(peel(e), checkpoint_dir)
        return degrees(e)

    n = e.count()
    for _ in range(max_rounds):
        e = _materialize(peel(e), checkpoint_dir)
        n2 = e.count()
        if n2 == n:
            return degrees(e)
        n = n2
    raise RuntimeError(f"k_core did not converge in {max_rounds} rounds")


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    node_column: str = "node",
    label_column: str = "label",
) -> DataFrame:
    """Newman modularity Q of a node partition (Newman & Girvan, PRE'04):
    how much denser the communities are than a degree-preserving random
    rewiring — THE standard score for evaluating the communities that
    ``label_propagation`` / ``connected_components`` produce over a
    dedup/linkage graph (Q ≈ 0: no structure; 0.3-0.7: real communities).

    Exact arithmetic: with m edges, e_c intra-community edges and d_c
    community degree sums (all integers),

        Q = (4m·Σe_c − Σd_c²) / (4m²)

    Both numerator terms are computed as exact DECIMAL(38,0) integers
    (degree cross-products overflow int64 at scale); the one division to
    DOUBLE happens last, from exact operands — engine-stable. Unlabeled
    endpoints drop their edges from the census (documented: score the
    labeled subgraph).

    Plan shape: two node-keyed label joins onto the edge list + three
    bounded aggregations (per-label, then one row). Output one row:
    (m_edges, intra_edges, sum_e DECIMAL-naming sx conventions below,
    modularity DOUBLE) — exact components as strings for the oracle.
    """
    e = _materialize(_canonical_edges(edges, src, dst))
    lab = labels.select(
        F.col(node_column).alias("__n"), F.col(label_column).alias("__l")
    ).distinct()
    lu = lab.select(F.col("__n").alias("u"), F.col("__l").alias("__lu"))
    lv = lab.select(F.col("__n").alias("v"), F.col("__l").alias("__lv"))
    tagged = _materialize(e.join(lu, "u").join(lv, "v"))

    deg = (
        tagged.select(F.col("__lu").alias("__l"))
        .union(tagged.select(F.col("__lv").alias("__l")))
        .groupBy("__l")
        .agg(F.count(F.lit(1)).alias("__d"))
    )
    intra = tagged.filter(F.col("__lu") == F.col("__lv")).groupBy(
        F.col("__lu").alias("__l")
    ).agg(F.count(F.lit(1)).alias("__e"))
    per_label = deg.join(intra, "__l", "left").select(
        "__l",
        F.col("__d").cast("decimal(38,0)").alias("__d"),
        F.coalesce(F.col("__e"), F.lit(0)).cast("decimal(38,0)").alias("__e"),
    )
    m = tagged.agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("__m"))
    agg = per_label.agg(
        F.sum("__e").cast("decimal(38,0)").alias("__se"),
        F.sum(F.col("__d") * F.col("__d")).cast("decimal(38,0)").alias("__sd2"),
    ).crossJoin(F.broadcast(m))
    md, se, sd2 = (
        F.col("__m").cast("double"),
        F.col("__se").cast("double"),
        F.col("__sd2").cast("double"),
    )
    return agg.select(
        F.col("__m").cast("long").alias("m_edges"),
        F.col("__se").cast("string").alias("intra_edges_s"),
        F.col("__sd2").cast("string").alias("sum_deg_sq_s"),
        F.when(
            F.col("__m") > 0,
            (F.lit(4.0) * md * se - sd2) / (F.lit(4.0) * md * md),
        ).alias("modularity"),
    )


def hits_fixed_point(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    scale: int = 10**12,
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg, JACM'99) with deterministic
    fixed-point integer arithmetic — the directed-graph complement of
    :func:`pagerank_fixed_point`: authorities are pointed AT by good
    hubs, hubs point AT good authorities. On a citation/link graph the
    two scores separate curators from sources, which PageRank conflates.

    Per iteration (all integer; the classical L2 normalization is
    replaced by MAX normalization so every step stays exact)::

        a_raw(v) = Σ_{u→v} h(u);   a(v) = (a_raw · scale) div max(a_raw)
        h_raw(u) = Σ_{u→v} a(v);   h(u) = (h_raw · scale) div max(h_raw)

    Sums and the ``a_raw · scale`` product run in DECIMAL(38,0) (both
    overflow int64 exactly when the algorithm is working); the division floors
    back to a bigint in [0, scale]. Results are bit-identical across
    engines, row orders and partitionings — the oracle replays every
    round.

    Plan shape per iteration: two key joins + two groupBy sums + two
    1-row max aggregates (broadcast). Edge frame persisted (the
    pagerank precedent); bounded lineage via fixed ``iterations``.

    Output: (node, hub_scaled, auth_scaled) — ``scale`` marks the top
    hub/authority.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    hubs = nodes.select("node", F.lit(scale).cast("bigint").alias("h"))

    def _normalized(raw: DataFrame, col: str) -> DataFrame:
        mx = raw.agg(F.max(col).alias("__mx"))
        return raw.crossJoin(F.broadcast(mx)).select(
            "node",
            F.expr(
                f"CAST((CAST({col} AS DECIMAL(38,0))"
                f" * CAST({scale} AS DECIMAL(38,0)))"
                f" DIV CAST(__mx AS DECIMAL(38,0)) AS BIGINT)"
            ).alias(col),
        )

    auths = None
    for _ in range(iterations):
        a_raw = (
            e.join(hubs.select(F.col("node").alias("src"), "h"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("h").cast("decimal(38,0)")).alias("a"))
        )
        auths = _normalized(a_raw, "a").localCheckpoint(eager=True)
        h_raw = (
            e.join(auths.select(F.col("node").alias("dst"), "a"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum(F.col("a").cast("decimal(38,0)")).alias("h"))
        )
        hubs = _normalized(h_raw, "h").localCheckpoint(eager=True)
    return (
        nodes.join(hubs, "node", "left")
        .join(auths, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("h"), F.lit(0)).cast("bigint").alias("hub_scaled"),
            F.coalesce(F.col("a"), F.lit(0)).cast("bigint").alias("auth_scaled"),
        )
    )


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 3,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Multi-source BFS distance labels up to ``max_hops`` over the
    undirected graph — the neighborhood-expansion primitive: the blast
    radius of a contaminated dedup cluster, k-hop ego networks around
    flagged entities, "how far does this template spread".

    Level-synchronous frontier expansion: hop ``h``'s frontier is the
    neighbors of hop ``h−1``'s not yet labeled (anti-join against the
    visited set), so every node is labeled with its TRUE shortest-path
    distance ≤ max_hops from the nearest seed. ``max_hops`` is a fixed
    round count — a deterministic function of the input on any graph,
    which keeps the unrolled oracle exact (late rounds with an empty
    frontier are no-ops).

    Plan shape per hop: one key join (frontier onto the symmetric edge
    list), one anti-join against visited, one distinct — all node-keyed
    shuffles; frontier and visited are materialized per round (the CC
    precedent). Seeds not present in any edge still label at distance 0.

    Output: (node, distance) for every node within max_hops of a seed.
    """
    und = _canonical_edges(edges, src, dst)
    sym = _materialize(
        und.union(und.select(F.col("v").alias("u"), F.col("u").alias("v"))),
        checkpoint_dir,
    )
    visited = _materialize(
        seeds.select(F.col(seeds.columns[0]).alias("node"))
        .distinct()
        .withColumn("distance", F.lit(0)),
        checkpoint_dir,
    )
    frontier = visited.select("node")
    for h in range(1, max_hops + 1):
        nxt = (
            sym.join(frontier.withColumnRenamed("node", "u"), "u")
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("distance", F.lit(h))
        )
        nxt = _materialize(nxt, checkpoint_dir)
        visited = _materialize(visited.union(nxt), checkpoint_dir)
        frontier = nxt.select("node")
    return visited
