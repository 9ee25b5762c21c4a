#!/usr/bin/env python
"""Worked example: corpus quality audit + guarded publish.

The nightly pre-training-data audit a 100 TB corpus needs before a new
snapshot is promoted, composed entirely from this package's operators:

1. source triage — Zipf slope per source (templated/generated detector)
   and per-user behavioral entropy on the activity stream;
2. quality scoring — unigram-LM perplexity proxy per document, then
   cross-source calibration via within-source percent rank (raw scores
   are not comparable across heterogeneous sources);
3. contamination — exact 8-gram benchmark overlap (bloom-prefiltered
   variant for a large benchmark union);
4. dedup-aware split — near-dup clusters keep duplicates in ONE split
   (eval-leakage guard);
5. guarded publish — canary diff vs the previous snapshot + in-flight
   metric gates on the write itself (no second scan).

Run: ``python examples/corpus_audit_pipeline.py [sf_dir]``
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pyspark_playground_spark.operators import dedup, graph, quality, sampling, text
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
    spark = get_spark(app_name="corpus-audit-pipeline")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. source triage
    zipf = text.zipf_slope(docs, group_column="source")
    print("Zipf slope per source (≈ -1 is natural text):")
    zipf.orderBy("source").show(truncate=False)

    # 2. quality scoring + cross-source calibration
    scored = text.unigram_logprob_scores(docs)
    calibrated = sampling.rank_normalize(
        docs.join(scored, "doc_id"),
        group_column="source",
        value_column="avg_logprob",
    )
    keep = calibrated.filter(F.col("pct_ppm") >= 100_000)  # drop bottom decile
    print(f"calibrated keep: {keep.count()} of {docs.count()}")

    # 3. contamination vs a benchmark set
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    contaminated = dedup.bloom_ngram_contamination(docs, bench, n=8)
    n_contaminated = contaminated.count()
    print(f"contaminated docs (8-gram overlap): {n_contaminated}")

    # 4. dedup-aware split
    pairs = dedup.ngram_jaccard_pairs(
        docs, within="source", shingle_size=1, threshold=0.5
    )
    labeled = graph.dedup_clusters(docs, pairs)
    split = sampling.assign_split(labeled, ["cluster_id"])
    leak = (
        split.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert leak == 0, "near-dup cluster straddles train/test"

    # 5. guarded publish: canary diff + observed write with gates
    out_dir = tempfile.mkdtemp(prefix="corpus-publish-")
    snapshot = split.select("doc_id", "cluster_id", "split")
    prev = snapshot.filter(F.col("doc_id") % 11 != 0)  # simulated yesterday
    diff = {
        r["diff_class"]: r["n_rows"]
        for r in quality.table_diff(prev, snapshot, ["doc_id"]).collect()
    }
    print(f"canary diff vs previous snapshot: {diff}")
    assert diff.get("removed", 0) == 0, "rebuild dropped rows"
    metrics = quality.observed_write(
        snapshot,
        lambda d: d.write.mode("overwrite").parquet(f"{out_dir}/snapshot"),
        metrics={
            "n_rows": F.count(F.lit(1)),
            "n_null_split": F.count(F.when(F.col("split").isNull(), 1)),
        },
        gates={"n_null_split": (0, 0)},
    )
    print(f"published with metrics {dict(metrics)}")
    print("PIPELINE OK")


if __name__ == "__main__":
    main()
