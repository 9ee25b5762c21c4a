#!/usr/bin/env python
"""Worked example: shipping a 100 TB vector-search index.

The similarity family working together the way a retrieval team
actually decides an index configuration — every stage deterministic
and oracle-replayable, every "which variant?" question answered by a
measured recall gate instead of a guess:

1. exact baseline — brute-force cosine top-10 on a bounded query
   panel (``brute_force_topk``): the ground truth every approximate
   variant is graded against, and the documented O(corpus × panel)
   fallback when the corpus is small enough;
2. quantization budget — int8 recall@10 (``int8_recall_report``):
   is 4× storage compression free at this corpus's geometry?
3. PQ codes — recall@10 of the 16×-compressed ADC ranking
   (``pq_recall_report``): the memory-bound side of the index;
4. the composed index — IVF×PQ recall under BOTH encodings
   (``ivf_pq_recall_report`` raw vs ``residual=True`` IVFADC): the
   sublinear candidate-pruned search a 1000-executor deployment runs,
   with the raw-vs-residual choice made by the pair of numbers;
5. retrieval quality — nDCG@10 / MRR against same-label relevance
   (``retrieval_eval_report``): recall measures the index, nDCG
   measures the embedding — both must pass before the index ships;
6. the shipped search — ``ivf_pq_topk`` with the winning encoding,
   top-5 neighbors for one query, the thing a user actually calls;
7. train→freeze→serve — ``ivf_pq_train`` writes the model once,
   ``ivf_pq_search_with_model`` serves the same ranking against the
   frozen frames (the production split: training amortized, search
   latency is the number that matters at 100 TB);
8. the declarative twin — the SAME frozen model driven from a
   pipeline spec: an ``ann_dedup`` stage collapses embedding
   near-dups and a ``knn_join`` stage attaches neighbors, so a
   training-data pipeline expresses vector curation as data, not
   code (``plans.pipeline.run_pipeline``).

Run: ``python examples/vector_search_pipeline.py [sf_dir]``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pyspark_playground_spark.operators import similarity as sim
from pyspark_playground_spark.session import get_spark

IVF = dict(dim=64, coarse_k=8, coarse_iterations=1, nprobe=2,
           m=4, k=16, iterations=1, topk=10)


def _mean_recall(df) -> float:
    r = df.agg(F.avg(F.col("recall_q6")).alias("m")).collect()[0]
    return (r["m"] or 0) / 1e6


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark(app_name="vector-search-example")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    panel = emb.filter(F.col("vec_id") < 10)

    # 1. exact baseline (ground truth for every gate below)
    exact = sim.brute_force_topk(emb, panel, k=10)
    n_pairs = exact.count()
    print(f"exact baseline: {n_pairs} (query, neighbor) pairs on the panel")

    # 2. int8 quantization gate
    int8 = _mean_recall(sim.int8_recall_report(emb, panel, k=10))
    print(f"int8 recall@10: {int8:.3f} (4x compression)")

    # 3. PQ/ADC gate (full-corpus scan over codes)
    pq = _mean_recall(
        sim.pq_recall_report(emb, panel, dim=64, m=4, k=16,
                             iterations=1, topk=10)
    )
    print(f"PQ ADC recall@10: {pq:.3f} (16x compression, full scan)")

    # 4. composed IVF x PQ, raw vs residual (IVFADC) encoding
    raw = _mean_recall(sim.ivf_pq_recall_report(emb, panel, **IVF))
    res = _mean_recall(
        sim.ivf_pq_recall_report(emb, panel, residual=True, **IVF)
    )
    winner = "residual" if res > raw else "raw"
    print(
        f"IVFxPQ recall@10 (nprobe {IVF['nprobe']}/{IVF['coarse_k']} "
        f"cells): raw={raw:.3f} residual={res:.3f} -> ship {winner}"
    )

    # 5. embedding quality (index-independent)
    retr = sim.retrieval_eval_report(
        emb, emb.filter(F.col("vec_id") < 25), label_column="label", k=10,
        queries_in_corpus=True,
    ).agg(
        F.avg("ndcg_x6").alias("ndcg"), F.avg("rr_q6").alias("rr")
    ).collect()[0]
    print(
        f"embedding quality: mean nDCG@10={(retr['ndcg'] or 0) / 1e6:.3f} "
        f"mean RR={(retr['rr'] or 0) / 1e6:.3f}"
    )

    # 6. the shipped search: top-5 for query 0 under the winning encoding
    hits = (
        sim.ivf_pq_topk(emb, panel, residual=(winner == "residual"), **IVF)
        .filter(F.col("query_id") == 0)
        .orderBy("rank")
        .limit(5)
        .collect()
    )
    ids = [r["neighbor_id"] for r in hits]
    print(f"query 0 -> top-5 neighbors ({winner} codes): {ids}")
    assert len(ids) == min(5, n_pairs) or len(ids) > 0

    # 7. train once, freeze, serve: the production split — identical
    # ranking, training paid once instead of per search
    train_kw = {k: v for k, v in IVF.items() if k not in ("nprobe", "topk")}
    coarse, book = sim.ivf_pq_train(
        emb, residual=(winner == "residual"), **train_kw
    )
    frozen = (
        sim.ivf_pq_search_with_model(
            emb, panel, coarse, book, nprobe=IVF["nprobe"],
            topk=IVF["topk"], residual=(winner == "residual"),
        )
        .filter(F.col("query_id") == 0)
        .orderBy("rank")
        .limit(5)
        .collect()
    )
    assert [r["neighbor_id"] for r in frozen] == ids
    print(f"frozen-model search: identical top-5 ({len(ids)} ids)")

    # 8. the declarative twin: the frozen model served from a spec —
    # vector curation as pipeline stages
    from pyspark_playground_spark.plans.pipeline import run_pipeline

    coarse.createOrReplaceTempView("vs_example_coarse")
    book.createOrReplaceTempView("vs_example_book")
    model_params = {
        "id_column": "vec_id",
        "coarse_table": "vs_example_coarse",
        "book_table": "vs_example_book",
        "nprobe": IVF["nprobe"],
        "residual": winner == "residual",
    }
    kept = run_pipeline(
        emb,
        {"stages": [{"op": "ann_dedup",
                     "params": {**model_params, "topk": 5,
                                "max_dist2": 0.05}}]},
    ).count()
    emb.createOrReplaceTempView("vs_example_corpus")
    enriched = run_pipeline(
        panel,
        {"stages": [{"op": "knn_join",
                     "params": {**model_params, "topk": 3,
                                "corpus_table": "vs_example_corpus"}}]},
    )
    n_pairs_knn = enriched.count()
    print(
        f"declarative twin: ann_dedup keeps {kept} rows; knn_join "
        f"attaches {n_pairs_knn} (row, neighbor) pairs"
    )
    assert kept > 0 and n_pairs_knn > 0

    print("PIPELINE OK")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
