#!/usr/bin/env python
"""Worked example: the YAML-declared corpus pipeline.

Loads ``corpus_pipeline.yaml`` (C4 gates → exact dedup → near-dedup with
canonical selection → mixture sampling → split) and runs it as one lazy
Catalyst plan. The identical chain is oracle-checked in the query
registry (``declarative_pipeline_documents``).

Run: ``python examples/declarative_corpus_pipeline.py [sf_dir]``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pyspark_playground_spark.plans import pipeline as pl
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
    spec = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "corpus_pipeline.yaml")
    spark = get_spark(app_name="declarative-corpus-pipeline")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    out = pl.run_pipeline(docs, spec)
    by_split = {r["split"]: r["n"] for r in
                out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    n0, n1 = docs.count(), out.count()
    print(f"corpus {n0} -> pipeline survivors {n1}; splits: {by_split}")
    assert 0 < n1 < n0 and "train" in by_split
    print("PIPELINE OK")


if __name__ == "__main__":
    main()
