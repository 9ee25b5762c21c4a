#!/usr/bin/env python
"""Increment-cost probe: does the per-batch cost of the incremental
dedup path scale with the BATCH or with the CORPUS?

The whole point of persisted-signature incrementality (and of the r10
active-bucket pruning in ``incremental_minhash_pairs``) is that day
N+1 pays for its own batch, not for the corpus it joins against. This
probe holds the new batch FIXED (the 5k sf0.1 documents, ids shifted
into a fresh range, text unchanged) while the signature store grows
1x/10x/100x. Corpus replicas get a replica token interleaved between
EVERY word (``regexp_replace(text, ' ', ' w<rep> ')``), so no replica
shares a single shingle with another replica or with the batch — the
corpus is genuinely distinct content, and the new-touching pair set
(the batch's internal near-dups) stays CONSTANT across factors. (A
first cut used a per-replica text PREFIX: every replica then truly
near-dupped the whole batch, pair output grew 200x and the probe
measured its own fixture, not the operator — same class of artifact
as SCALE.md probe 83's key-only replication note.)

Two variants timed per factor:
- ``pruned``    — `incremental_minhash_pairs` as shipped (active-bucket
  semi-join: only buckets containing a new doc enter the self-join);
- ``unpruned``  — the pre-r10 construction (full old∪new banded
  self-join, then the new-touching filter), inlined here for contrast.

Flat-ish pruned wall across the corpus decades = the increment costs
O(batch); the unpruned wall shows what the semi-join saves.

Usage: python scripts/probe_incremental_ingest.py [factors...] (default 1 10 100)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pyspark_playground_spark.operators import dedup as dd
from pyspark_playground_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
WORK = os.environ.get("INC_PROBE_DIR", "/tmp/inc_probe")


def synthesize(spark, factor: int) -> str:
    """Corpus text + its persisted minhash signature store at factor x."""
    path = f"{WORK}_{factor}x"
    if not os.path.exists(f"{path}/sigs.parquet"):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", "text"
        )
        reps = spark.range(factor).select(F.col("id").alias("__rep"))
        corpus = docs.crossJoin(reps).select(
            (F.col("doc_id") + F.col("__rep") * F.lit(10_000_000))
            .alias("doc_id"),
            # replica token between every word: replicas share no
            # shingle with each other or with the (unmodified) batch
            F.regexp_replace(
                F.col("text"),
                F.lit(" "),
                F.concat(
                    F.lit(" w"), F.col("__rep").cast("string"), F.lit(" ")
                ),
            ).alias("text"),
        )
        corpus.write.mode("overwrite").parquet(f"{path}/corpus.parquet")
        dd.minhash_signatures(
            spark.read.parquet(f"{path}/corpus.parquet")
        ).write.mode("overwrite").parquet(f"{path}/sigs.parquet")
        # the banded state layout: band hashes paid once at write time
        dd.minhash_banded_store(
            spark.read.parquet(f"{path}/sigs.parquet")
        ).write.mode("overwrite").parquet(f"{path}/banded.parquet")
    return path


def unpruned_pairs(corpus, sigs, new_batch):
    """The pre-r10 incremental construction: full old∪new banded
    self-join, then keep pairs touching a new doc (inlined for the
    probe's contrast measurement only)."""
    banded_existing = sigs.select(
        "doc_id",
        F.explode(
            dd._band_structs(lambda i: F.col("minhash")[i], 64, 16)
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    banded_new = dd.minhash_band_buckets(new_batch, "doc_id", "text")
    banded = banded_existing.join(
        new_batch.select("doc_id"), "doc_id", "left_anti"
    ).unionByName(banded_new)
    cands = dd._pairs_from_banded(banded, "doc_id")
    new_ids = new_batch.select("doc_id")
    cands = (
        cands.join(
            new_ids.select(F.col("doc_id").alias("id_a")).withColumn(
                "__na", F.lit(True)
            ),
            "id_a", "left",
        )
        .join(
            new_ids.select(F.col("doc_id").alias("id_b")).withColumn(
                "__nb", F.lit(True)
            ),
            "id_b", "left",
        )
        .where(F.col("__na").isNotNull() | F.col("__nb").isNotNull())
        .select("id_a", "id_b")
    )
    cand_ids = (
        cands.select(F.col("id_a").alias("doc_id"))
        .union(cands.select("id_b"))
        .distinct()
    )
    docs = corpus.join(cand_ids, "doc_id", "left_semi").select(
        "doc_id", dd.shingles_expr("text", 3).alias("sh")
    )
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = docs.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
        )
        .filter(F.col("jaccard") >= 0.5)
        .select("id_a", "id_b", "jaccard")
    )


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark(app_name="incremental-ingest-probe")
    new_batch = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(
            (F.col("doc_id") + F.lit(900_000_000)).alias("doc_id"), "text"
        )
        .persist()
    )
    n_new = new_batch.count()
    for factor in factors:
        path = synthesize(spark, factor)
        corpus = spark.read.parquet(f"{path}/corpus.parquet").unionByName(
            new_batch
        )
        sigs = spark.read.parquet(f"{path}/sigs.parquet")
        banded = spark.read.parquet(f"{path}/banded.parquet")
        n_corpus = sigs.count()
        variants = {
            "pruned": lambda: dd.incremental_minhash_pairs(
                corpus, sigs, new_batch, threshold=0.5
            ),
            "banded_store": lambda: dd.incremental_minhash_pairs(
                corpus, None, new_batch, threshold=0.5,
                existing_banded=banded,
            ),
            "unpruned": lambda: unpruned_pairs(corpus, sigs, new_batch),
        }
        for name, build in variants.items():
            build().count()  # warm-up untimed
            walls, pairs = [], None
            for _ in range(2):
                t0 = time.time()
                pairs = build().count()
                walls.append(time.time() - t0)
            walls.sort()
            print(json.dumps({
                "probe": "incremental_minhash_fixed_batch",
                "variant": name, "corpus_factor": factor,
                "corpus_docs": n_corpus, "batch_docs": n_new,
                "new_touching_pairs": pairs,
                "sec": round(walls[len(walls) // 2], 2),
            }), flush=True)


if __name__ == "__main__":
    main()
