#!/usr/bin/env python
"""Worked example: a 100 TB-shaped LLM training-data pipeline on the
synthetic corpus.

Chain: C4-style rule gates → quality + repetition + robust-outlier
filters → PII scrub → exact dedup → MinHash-LSH near-dedup resolved to
clusters (connected components) with one canonical doc kept per cluster →
sub-document chunk dedup (keep-first corpus-wide) → benchmark
decontamination → per-source mixture sampling → deterministic split →
sequence packing. Every stage is a DataFrame→DataFrame operator from this
package — the same composition runs unchanged on a cluster; only the
input path and the LSH ``checkpoint_dir`` change.

Run: ``python examples/training_data_pipeline.py [sf_dir]``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pyspark_playground_spark.operators import (
    dedup,
    graph,
    packing,
    quality,
    sampling,
    similarity,
    text,
)
from pyspark_playground_spark.session import get_spark


def main(sf_dir: str | None = None) -> None:
    if sf_dir is None:
        argv_dir = sys.argv[1] if len(sys.argv) > 1 else None
        sf_dir = (
            argv_dir
            if argv_dir
            and os.path.exists(os.path.join(argv_dir, "events.parquet"))
            else "/root/testdata/sf0.001"
        )
    spark = get_spark(app_name="training-data-pipeline")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 0. C4-style rule gates (token count / mean token length / braces /
    # blocklist / stopword presence) — the cheap first-pass cut
    docs = (
        text.c4_style_filter(docs, min_tokens=10)
        .where("keep")
        .select("doc_id", "text", "lang", "source", "n_chars")
    )

    # 1. quality + repetition gates (Gopher-style): keep plausible prose
    scored = text.quality_score(text.repetition_metrics(docs))
    kept = scored.filter(
        (F.col("quality_score") >= 0.5)
        & (F.col("top_ngram_fraction") <= 0.30)
        & (F.col("duplicate_line_fraction") <= 0.30)
    )
    # ... and drop per-source length outliers (median/MAD robust z)
    kept = quality.robust_outliers(kept, "n_chars", "source").filter(
        ~F.col("is_outlier")
    ).cache()  # everything downstream (scrub→dedup→…) + the final census

    # 2. redaction: mask emails/URLs in place
    scrubbed = text.scrub_pii(kept.select("doc_id", "text", "lang", "source")).select(
        "doc_id", F.col("scrubbed").alias("text"), "lang", "source"
    )

    # 3. exact dedup, then MinHash-LSH near-dedup: pair list -> transitive
    # closure (connected components) -> keep ONE canonical doc per cluster.
    # Pairwise dropping (remove id_b of each pair) over-deletes chains
    # A~B~C; the closure keeps exactly one representative.
    exact = dedup.exact_dedup(scrubbed)
    near_pairs = dedup.minhash_dedup_pairs(exact, threshold=0.8)
    deduped = graph.dedup_clusters(exact, near_pairs).filter(
        F.col("is_canonical")
    ).drop("cluster_id", "is_canonical")

    # 3b. sub-document dedup: drop repeated 8-token chunks corpus-wide
    # (Lee et al. keep-first), then drop docs that lost everything
    deduped = (
        dedup.token_chunk_dedup(deduped, chunk_tokens=8)
        .where(F.col("n_kept") > 0)
        .join(deduped.select("doc_id", "lang", "source"), "doc_id")
        .select("doc_id", "text", "lang", "source")
        # reused by decontamination AND the final census — persist the
        # branch point so the gate chain above runs once, not per action
        .cache()
    )

    # 4. decontamination vs a stand-in benchmark set
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    contaminated = dedup.ngram_contamination(deduped, bench, n=8).select(
        "doc_id"
    )
    clean = deduped.join(contaminated, "doc_id", "left_anti")

    # 4b'. embedding-level decontamination — the paraphrase-robust
    # complement of the exact 8-gram check (vec_id ≙ doc_id stand-in;
    # label-0 vectors play the benchmark embeddings)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb_flags = similarity.benchmark_contamination(
        emb.filter(F.col("label") != 0),
        emb.filter(F.col("label") == 0),
        threshold=0.98,
    )
    clean = clean.join(
        emb_flags.filter("contaminated").select(F.col("vec_id").alias("doc_id")),
        "doc_id",
        "left_anti",
    )

    # 4b. mixture weighting: keep all of src0, half of src1/src2, 75% of
    # the long tail — content-hash membership, reproducible on backfill
    clean = sampling.weighted_sample(
        clean, ["doc_id"], group_column="source",
        weights={"src0": 1.0, "src1": 0.5, "src2": 0.5}, default=0.75,
    ).cache()  # feeds split/packing, RAG chunks, source-similarity, census

    # 5. deterministic split + sequence packing for the train shard
    split = sampling.assign_split(clean, ["doc_id"])
    train = split.filter(F.col("split") == "train").select(
        "doc_id", text.token_count_expr("text").alias("n_tokens")
    )
    packed = packing.assign_sequence_offsets(
        train, token_count_column="n_tokens", seq_len=2048, bucket_size=64
    )

    # 6. RAG shard: the val split explodes into overlapping token windows
    # for the retrieval index (zero-shuffle projection)
    chunks = packing.sliding_window_chunks(
        split.filter(F.col("split") == "val"), chunk_tokens=64, overlap=8
    )
    n_chunks = chunks.count()

    # 7. mixture design report: pairwise similarity between sources over
    # their unigram vectors (near-identical sources = mixture redundancy)
    sim_pairs = text.source_similarity(clean).orderBy(F.col("cosine").desc())
    top_pair = sim_pairs.first()

    stats = packed.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_tokens").alias("tokens"),
        (F.max("seq_id") + 1).alias("sequences"),
    ).first()
    n_kept = kept.count()
    n_dedup = deduped.count()
    n_clean = clean.count()
    print(f"corpus {n0} -> quality {n_kept} -> dedup {n_dedup} -> clean {n_clean}")
    print(
        f"train shard: {stats['docs']} docs, {stats['tokens']} tokens, "
        f"{stats['sequences']} sequences of 2048"
    )
    print(f"val RAG shard: {n_chunks} chunks of <=64 tokens")
    if top_pair is not None:
        print(
            f"most similar sources: {top_pair['source_a']} ~ "
            f"{top_pair['source_b']} cosine={top_pair['cosine']:.3f}"
        )
    assert n0 >= n_kept >= n_dedup >= n_clean > 0
    assert stats["sequences"] >= 1
    assert n_chunks > 0
    print("PIPELINE OK")


if __name__ == "__main__":
    main()
