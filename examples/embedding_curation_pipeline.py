#!/usr/bin/env python
"""Worked example: curating an embedding space before it curates your data.

Every embedding-driven pipeline stage (ANN dedup, SemDeDup, clustering,
retrieval) silently assumes the embedding space is healthy. This example
runs the health checks first, then the curation, each step an operator
from this package:

1. audit — L2-norm profile (dead / un-normalized vectors), hubness
   census over the exact top-5 neighbor frame (a heavy k-occurrence
   tail means ANN-based dedup will over-merge around hub vectors), and
   grid-density screen (isolated cells = wrong-modality / broken-encoder
   candidates);
2. prune — drop the sparse-cell outliers before any pair-shaped stage
   touches them;
3. dedup — reciprocal-nearest-neighbor pairs (the high-precision
   criterion: both vectors must pick each other) resolved to clusters
   via connected components, keeping one canonical vector per cluster;
4. compress — Johnson-Lindenstrauss Rademacher projection 64 → 16 dims
   (content-addressed sign matrix, zero shuffle) for the downstream
   index; nothing to train, nothing to store;
5. structure — deterministic Lloyd k-means on the survivors (the
   IVF coarse quantizer), with per-cluster population as the balance
   check.

Run: ``python examples/embedding_curation_pipeline.py [sf_dir]``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pyspark_playground_spark.operators import graph, similarity
from pyspark_playground_spark.session import get_spark


def main(sf_dir: str | None = None) -> None:
    if sf_dir is None:
        argv_dir = sys.argv[1] if len(sys.argv) > 1 else None
        sf_dir = (
            argv_dir
            if argv_dir
            and os.path.exists(os.path.join(argv_dir, "embeddings.parquet"))
            else "/root/testdata/sf0.001"
        )
    spark = get_spark(app_name="embedding-curation-pipeline")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()

    # 1. audit
    norms = emb.select(
        similarity.norm_expr(F.col("embedding")).alias("l2")
    ).agg(
        F.min("l2").alias("mn"), F.max("l2").alias("mx"),
        F.count(F.when(F.col("l2") < 1e-6, 1)).alias("dead"),
    ).collect()[0]
    print(f"norms: min={norms['mn']:.3f} max={norms['mx']:.3f} "
          f"dead={norms['dead']} of {n}")

    topk = similarity.brute_force_topk(emb, emb, k=5)
    census = {r["k_occurrence"]: r["n_vectors"]
              for r in similarity.k_occurrence_census(topk, emb).collect()}
    max_occ = max(census)
    print(f"hubness census: max k-occurrence {max_occ} "
          f"(anti-hubs at 0: {census.get(0, 0)}) — "
          f"{'hub-heavy, expect ANN over-merging' if max_occ > 4 * 5 else 'healthy tail'}")

    dens = similarity.grid_density(emb, dims=2, cell_width=0.5,
                                   min_cell_count=2)
    sparse_ids = dens.filter(F.col("is_sparse")).select("vec_id")
    n_sparse = sparse_ids.count()
    print(f"grid density: {n_sparse} vectors in sparse cells")

    # 2. prune
    kept = emb.join(sparse_ids, "vec_id", "left_anti")
    print(f"pruned {n - kept.count()} outliers, {kept.count()} remain")

    # 3. dedup via mutual NN + connected components
    pairs = similarity.mutual_nn_pairs(kept).filter(F.col("cosine") > 0.35)
    stamped = graph.dedup_clusters(kept, pairs, id_column="vec_id")
    canon = stamped.filter(F.col("is_canonical"))
    print(f"mutual-NN pairs above 0.35: {pairs.count()}; "
          f"canonical vectors: {canon.count()}")

    # 4. compress
    proj = similarity.rademacher_project(
        canon, id_column="vec_id", dim=64, out_dim=16
    )
    assert len(proj.columns) == 17  # vec_id + 16 projected coords
    print(f"JL-compressed {canon.count()} vectors to 16 dims "
          f"(zero-shuffle map; sign matrix is content-addressed)")

    # 5. structure
    km = similarity.kmeans_lloyd(
        canon.select("vec_id", "embedding"), k=4, iterations=2
    )
    pops = {r["cluster_id"]: r["n"] for r in
            km.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    print(f"k-means populations: {pops}")
    assert sum(pops.values()) == canon.count()

    print("PIPELINE OK")


if __name__ == "__main__":
    main()
