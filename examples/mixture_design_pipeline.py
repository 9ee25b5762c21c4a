#!/usr/bin/env python
"""Worked example: designing a training mixture from measured numbers.

The decisions a pre-training data team makes per corpus drop — how much
of each source, which scores to trust, whether the split leaks, how to
shard the output — each taken from an operator in this package instead
of a guess:

1. measure — per-source dataset card (volume, language breadth, exact
   duplication, token budget, exact p50/p95 length) and the exact-dup
   cluster histogram after canonicalization (the dedup win, sized);
2. weight — temperature-scaled mixture shares from the measured
   volumes (w ∝ n^alpha keeps small sources alive without letting a
   megasource drown the mix);
3. trust the scores — exact ROC-AUC of the cheap length signal against
   a language label, per-source grouped AUC (a score that ranks well
   globally can invert inside one source), Spearman agreement between
   two candidate signals (ρ near 1 ⇒ the second adds nothing), and
   mutual information lang×source (near 0 ⇒ stratifying on lang within
   source is safe);
4. audit the split — cross-split 8-gram leakage of the hash split,
   measured rather than assumed;
5. ship — byte-balanced shard plan (exact cumulative payload, no
   single-task sort) and the one-row dataset card of what ships.

Run: ``python examples/mixture_design_pipeline.py [sf_dir]``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pyspark_playground_spark.operators import dedup, layout, profiling, sampling, text
from pyspark_playground_spark.session import get_spark


def main(sf_dir: str | None = None) -> None:
    if sf_dir is None:
        argv_dir = sys.argv[1] if len(sys.argv) > 1 else None
        sf_dir = (
            argv_dir
            if argv_dir
            and os.path.exists(os.path.join(argv_dir, "documents.parquet"))
            else "/root/testdata/sf0.001"
        )
    spark = get_spark(app_name="mixture-design-pipeline")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. measure
    card = profiling.grouped_dataset_card(docs)
    print("per-source card (volume / dup / tokens / length):")
    for r in card.orderBy(F.col("n_docs").desc()).collect():
        print(
            f"  {r['source']}: n={r['n_docs']} langs={r['n_langs']} "
            f"unique={r['n_unique_texts']} mean_tok={r['mean_tokens']:.1f} "
            f"p50={r['p50_chars']} p95={r['p95_chars']}"
        )
    canonical = text.normalize_text(docs).select(
        "doc_id", F.col("text_norm").alias("text"), "source", "lang", "n_chars"
    )
    hist = {
        r["cluster_size"]: r["n_clusters"]
        for r in dedup.exact_dup_histogram(canonical).collect()
    }
    removable = sum((size - 1) * n for size, n in hist.items())
    print(f"post-canonicalization dup histogram: {hist} "
          f"(exact dedup removes {removable} docs)")

    # 2. weight
    shares = sampling.temperature_shares(
        docs, group_column="source", alpha=0.5
    ).collect()
    print("temperature shares (alpha=0.5):",
          {r["source"]: r["share_ppm"] for r in shares})

    # 3. trust the scores
    auc = profiling.exact_auc(
        docs, score_column="n_chars", label_column=F.col("lang") == "en"
    ).collect()[0]
    print(f"length→en AUC: {auc['auc']:.3f} "
          f"(pos={auc['n_pos']} neg={auc['n_neg']})")
    per_src = profiling.grouped_auc(
        docs, group_column="source", score_column="n_chars",
        label_column=F.col("lang") == "en",
    )
    inverted = per_src.filter(
        F.col("auc").isNotNull() & (F.col("auc") < 0.5)
    ).count()
    print(f"per-source AUC: {per_src.count()} sources, {inverted} inverted")
    pairs = docs.filter(F.col("text").isNotNull()).select(
        F.col("n_chars").alias("a"), text.token_count_expr("text").alias("b")
    )
    rho = profiling.spearman_correlation(
        pairs, x_column="a", y_column="b"
    ).collect()[0]
    print(f"chars↔tokens Spearman ρ = {rho['rho']:.4f} "
          f"(near 1 ⇒ one signal suffices)")
    mi = profiling.mutual_information(
        docs, x_column="lang", y_column="source"
    ).collect()[0]
    print(f"MI(lang; source) = {mi['mi_nats']:.4f} nats over "
          f"{mi['n_cells']} cells")

    # 4. audit the split
    split = sampling.assign_split(docs, ["doc_id"])
    leak = dedup.cross_split_gram_leakage(split).collect()[0]
    print(
        f"hash-split leakage: {leak['n_shared']} of {leak['n_grams']} "
        f"distinct 8-grams shared train↔test"
    )

    # 5. ship
    sharded = layout.plan_shards(
        split.filter(F.col("split") == "train").select("doc_id", "n_chars"),
        bytes_column="n_chars", target_bytes=65536, order_column="doc_id",
    )
    n_shards = sharded.agg(F.max("shard") + 1).collect()[0][0]
    final_card = profiling.dataset_card(docs).collect()[0]
    print(f"train split ships in {n_shards} ~64KiB shards; corpus card: "
          f"{final_card['n_docs']} docs, {final_card['n_unique_texts']} unique, "
          f"mean {final_card['mean_tokens']:.1f} tokens")
    print("PIPELINE OK")


if __name__ == "__main__":
    main()
