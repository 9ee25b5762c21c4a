#!/usr/bin/env python
"""Worked example: diagnosing a near-dup candidate graph before trusting it.

Connected components will happily fuse everything your pair generator
emits — so before transitive merging, measure the graph. Every step is
an operator from this package, run here over the deterministic
chain+skip document graph (stand-in for a MinHash candidate graph):

1. shape — degree census (the tail predicts every wedge-shaped cost)
   and degree assortativity (strongly negative = template hubs attach
   to everything: cap or salt before pair work);
2. density — triangle count (clique-likeness: near-dup clusters should
   be triangle-rich; chains of incidental overlaps are not) and the
   4-core (the subgraph where transitive merging is actually safe);
3. communities — label propagation, scored by Newman modularity
   (Q ≈ 0 means the "clusters" are noise — do NOT merge on them);
4. almost-merged — link prediction (common-neighbors / Adamic-Adar)
   surfaces the pairs banding barely missed, worth a verify pass;
5. blast radius — multi-source BFS from the most-central nodes
   (personalized-PageRank seeds) bounds how far a bad merge would
   propagate.

Run: ``python examples/graph_diagnostics_pipeline.py [sf_dir]``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from pyspark_playground_spark.operators import graph
from pyspark_playground_spark.session import get_spark


def _doc_edges(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = Window.partitionBy("source").orderBy("doc_id")
    d = docs.select(
        "doc_id",
        F.lead("doc_id", 1).over(w).alias("n1"),
        F.lead("doc_id", 2).over(w).alias("n2"),
    )
    return (
        d.where(F.col("n1").isNotNull())
        .select(F.col("doc_id").alias("src"), F.col("n1").alias("dst"))
        .union(d.where(F.col("n2").isNotNull()).select("doc_id", F.col("n2")))
    ), docs


def main(sf_dir: str | None = None) -> None:
    if sf_dir is None:
        argv_dir = sys.argv[1] if len(sys.argv) > 1 else None
        sf_dir = (
            argv_dir
            if argv_dir
            and os.path.exists(os.path.join(argv_dir, "documents.parquet"))
            else "/root/testdata/sf0.001"
        )
    spark = get_spark(app_name="graph-diagnostics-pipeline")
    edges, docs = _doc_edges(spark, sf_dir)

    # 1. shape
    census = {r["degree"]: r["n_nodes"]
              for r in graph.degree_census(edges).collect()}
    print(f"degree census: {dict(sorted(census.items()))}")
    assort = graph.degree_assortativity(edges).collect()[0]
    print(f"assortativity r = {assort['assortativity']:.4f} "
          f"over {assort['n_endpoints']} endpoints")

    # 2. density
    tri = graph.triangle_count(edges).collect()[0]["n_triangles"]
    core = graph.k_core(edges, k=3)
    n_core = core.count()
    print(f"triangles: {tri}; 3-core members: {n_core}")

    # 3. communities, scored
    labels = graph.label_propagation(edges, iterations=2).select(
        F.col("node"), F.col("label")
    )
    q = graph.modularity(edges, labels).collect()[0]
    print(f"label-propagation communities: modularity Q = "
          f"{q['modularity']:.4f} over {q['m_edges']} edges "
          f"(intra {q['intra_edges_s']})")
    assert q["modularity"] is not None

    # 4. almost-merged pairs
    lp = graph.link_prediction_scores(edges, max_center_degree=64)
    top = lp.orderBy(F.col("common_neighbors").desc(),
                     "node_a", "node_b").limit(3).collect()
    print("top almost-merged pairs (cn, jaccard):",
          [(r["node_a"], r["node_b"], r["common_neighbors"],
            round(r["jaccard"], 3)) for r in top])

    # 5. blast radius from the PPR-central nodes
    seeds = docs.groupBy("source").agg(F.min("doc_id").alias("node")).select(
        "node"
    )
    reach = graph.bfs_distances(edges, seeds, max_hops=3)
    per_hop = {r["distance"]: r["n"] for r in
               reach.groupBy("distance").agg(F.count(F.lit(1)).alias("n"))
               .collect()}
    print(f"3-hop blast radius from {seeds.count()} seeds: {per_hop}")

    print("PIPELINE OK")


if __name__ == "__main__":
    main()
