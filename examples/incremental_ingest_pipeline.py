#!/usr/bin/env python
"""Worked example: persisted-signature INCREMENTAL ingest — batch N+1
dedup and indexing that reuses batch N's state (VERDICT r9 item 7).

At 100 TB the corpus is not rebuilt per day; a daily increment arrives
and everything expensive must be incremental against state persisted
by yesterday's run. This example plays two days of one pipeline and
asserts, for every family, the property that makes incrementality
safe: REPLAYING the increment lands in exactly the state a full
rebuild would produce.

Day 0 (cold start) — build and PERSIST the three state artifacts:
1. MinHash signature store (``dedup.minhash_signatures``) — the text
   near-dup state, one 64-hash array per doc;
2. aHash signature store (``multimodal.ahash_signatures``) — the
   perceptual media near-dup state, one portable 60-bit int per doc;
3. the frozen IVF×PQ model (``similarity.ivf_pq_train``) + the
   encoded-codes store (``similarity.ivf_pq_encode_corpus``) — the
   vector-index state (cell + m codes per vector).

Day 1 (increment) — only the NEW batch is shingled/hashed/encoded:
4. ``dedup.incremental_minhash_pairs``: sign day-1 docs only, banded
   join against the read-back day-0 signatures, emit only pairs that
   touch a new doc (old-old pairs were yesterday's news) — asserted;
5. ``multimodal.incremental_ahash_pairs``: same shape for media, no
   payload re-decoded — asserted new-touching;
6. ``similarity.ivf_pq_encode_corpus`` on day-1 vectors under the
   day-0 FROZEN model, appended to the codes store; then
   ``ivf_pq_search_precoded`` serves top-k against the UNION of both
   days' codes without touching a single corpus vector.

Convergence gates (the reason to trust the increment):
- signature-store convergence: day-0 store + day-1 increment ==
  ``minhash_signatures``/``ahash_signatures`` over the FULL corpus,
  row for row (so N days of increments never drift from a rebuild);
- index convergence: the precoded search over the appended codes ==
  ``ivf_pq_search_with_model`` over the full corpus under the same
  model (encode is deterministic, so append == re-encode).

Run: ``python examples/incremental_ingest_pipeline.py [sf_dir]``
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pyspark_playground_spark.operators import dedup as dd
from pyspark_playground_spark.operators import multimodal as mm
from pyspark_playground_spark.operators import similarity as sim
from pyspark_playground_spark.operators.sampling import hash_bucket_expr
from pyspark_playground_spark.session import get_spark

IVF = dict(dim=64, coarse_k=8, coarse_iterations=1, m=4, k=16,
           iterations=1)


def _rows(df, cols):
    return sorted(map(tuple, df.select(*cols).collect()))


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark(app_name="incremental-ingest-pipeline")
    state = tempfile.mkdtemp(prefix="ingest_state_")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    media = mm.attach_media_column(docs, "text")

    # deterministic 60/40 arrival split (stable across engines/reruns)
    is_day0 = hash_bucket_expr(["doc_id"], 10) < 6
    docs_d0, docs_d1 = docs.filter(is_day0), docs.filter(~is_day0)
    media_d0, media_d1 = media.filter(is_day0), media.filter(~is_day0)
    # the deterministic Lloyd trainer seeds from ids 0..k-1, so day 0
    # must contain them (in production the model trains on yesterday's
    # full corpus, which trivially does)
    e_day0 = (hash_bucket_expr(["vec_id"], 10) < 6) | (
        F.col("vec_id") < IVF["k"]
    )
    emb_d0, emb_d1 = emb.filter(e_day0), emb.filter(~e_day0)

    # ---- day 0: build + persist the state artifacts ----
    sigs_d0 = dd.minhash_signatures(docs_d0)
    sigs_d0.write.parquet(f"{state}/minhash")
    # the banded layout + its layout metadata (r11 contract: the store
    # is only comparable under the same (num_perms, bands); the
    # metadata row lets day 1 REFUSE a mismatched store instead of
    # silently under-recalling)
    dd.minhash_banded_store(sigs_d0).write.parquet(f"{state}/banded")
    dd.minhash_banded_store_metadata(spark).write.parquet(
        f"{state}/banded_meta"
    )
    mm.ahash_signatures(media_d0, "doc_id").write.parquet(
        f"{state}/ahash"
    )
    coarse, book = sim.ivf_pq_train(emb_d0, **IVF)
    coarse.write.parquet(f"{state}/coarse")
    book.write.parquet(f"{state}/book")
    sim.ivf_pq_encode_corpus(emb_d0, coarse, book).write.partitionBy(
        "cell"
    ).parquet(f"{state}/codes/day0")
    n_d0 = docs_d0.count()
    print(f"day 0: state persisted for {n_d0} docs / "
          f"{emb_d0.count()} vectors")

    # ---- day 1: increment only ----
    mh_state = spark.read.parquet(f"{state}/minhash")
    text_pairs = dd.incremental_minhash_pairs(
        docs, None, docs_d1, threshold=0.5,
        existing_banded=spark.read.parquet(f"{state}/banded"),
        existing_banded_meta=spark.read.parquet(f"{state}/banded_meta"),
    )
    new_ids = {r["doc_id"] for r in docs_d1.select("doc_id").collect()}
    tp = text_pairs.collect()
    assert all(
        r["id_a"] in new_ids or r["id_b"] in new_ids for r in tp
    ), "text near-dup emitted an old-old pair"
    print(f"day 1 text near-dup: {len(tp)} new-touching pairs "
          f"(signed {docs_d1.count()} new docs only)")

    ah_state = spark.read.parquet(f"{state}/ahash")
    media_pairs = mm.incremental_ahash_pairs(
        ah_state, media_d1, "doc_id", max_hamming=8
    ).collect()
    assert all(
        r["id_a"] in new_ids or r["id_b"] in new_ids for r in media_pairs
    ), "media near-dup emitted an old-old pair"
    print(f"day 1 media near-dup: {len(media_pairs)} new-touching pairs "
          f"(no payload re-decoded)")

    coarse_r = spark.read.parquet(f"{state}/coarse")
    book_r = spark.read.parquet(f"{state}/book")
    sim.ivf_pq_encode_corpus(emb_d1, coarse_r, book_r).write.partitionBy(
        "cell"
    ).parquet(f"{state}/codes/day1")
    codes_all = spark.read.parquet(f"{state}/codes/day0").unionByName(
        spark.read.parquet(f"{state}/codes/day1")
    )
    panel = emb.filter(F.col("vec_id") < 5)
    served = sim.ivf_pq_search_precoded(
        codes_all, panel, coarse_r, book_r, nprobe=2, topk=5
    )

    # ---- convergence gates: increment == rebuild ----
    mh_updated = mh_state.join(
        docs_d1.select("doc_id"), "doc_id", "left_anti"
    ).unionByName(dd.minhash_signatures(docs_d1))
    assert _rows(
        mh_updated.select("doc_id", F.col("minhash").cast("string")),
        ["doc_id", "minhash"],
    ) == _rows(
        dd.minhash_signatures(docs).select(
            "doc_id", F.col("minhash").cast("string")
        ),
        ["doc_id", "minhash"],
    ), "minhash store diverged from a full rebuild"

    ah_updated = ah_state.join(
        media_d1.select("doc_id"), "doc_id", "left_anti"
    ).unionByName(mm.ahash_signatures(media_d1, "doc_id"))
    assert _rows(ah_updated, ["doc_id", "simhash"]) == _rows(
        mm.ahash_signatures(media, "doc_id"), ["doc_id", "simhash"]
    ), "ahash store diverged from a full rebuild"

    rebuilt = sim.ivf_pq_search_with_model(
        emb, panel, coarse_r, book_r, nprobe=2, topk=5
    )
    cols = ["query_id", "neighbor_id", "adist_q6", "rank"]
    assert _rows(served, cols) == _rows(rebuilt, cols), (
        "precoded serve over appended codes diverged from the "
        "full-corpus frozen search"
    )
    print(f"convergence: minhash/ahash stores == rebuild; precoded "
          f"top-5 over appended codes == frozen full-corpus search "
          f"({served.count()} rows)")
    print("PIPELINE OK")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
