#!/usr/bin/env python
"""Worked example: the evaluation battery before shipping a data change.

Every stage is one of the package's exact, cross-engine-deterministic
eval operators — the round-6 statistics family working together the way
a data team actually strings them:

1. stratification audit — chi-square independence + Cramér's V between
   source and language: if V is large, per-source curation thresholds
   are silently per-language decisions (``chi_square_independence``);
2. operating point — the full precision/recall/F1 sweep of a candidate
   gating signal (length → "is English"), then pick the best-F1
   threshold FROM THE TABLE instead of eyeballing one (``pr_curve``;
   the sweep is census-bounded, so reading it driver-side is
   model-sized, never data-sized);
3. distribution-free envelope — the split-conformal 90% length
   threshold with its achieved held-out coverage
   (``conformal_threshold``);
4. retrieval ship gates — per-query nDCG@10 / MRR of the exact cosine
   ranking against same-label relevance (``retrieval_eval_report``)
   and the int8-quantization recall@10 panel (``int8_recall_report``),
   summarized as exact integer means over the bounded query panel;
5. cohort survival — the two-sample log-rank test that purchasing
   users stay active longer (``log_rank_test`` over ``user_lifetimes``
   with the cohort flag carried on the same groupBy);
6. contract check — Deequ-style declarative expectations evaluated as
   exact violation counts in one pass (``check_expectations``), the
   promotion gate that runs before any of the above matters;
7. per-source envelopes — Mondrian conformal length caps with
   per-source held-out coverage (``conformal_threshold_by_group``),
   catching the source the GLOBAL envelope silently under-covers.

Run: ``python examples/eval_suite_pipeline.py [sf_dir]``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pyspark_playground_spark.operators import profiling, similarity, survival
from pyspark_playground_spark.operators.sampling import hash_bucket_expr
from pyspark_playground_spark.session import get_spark


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark(app_name="eval-suite-example")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # 1. stratification audit
    chi = profiling.chi_square_independence(
        docs, a_column="source", b_column="lang"
    ).collect()[0]
    v = (chi["cramers_v_q6"] or 0) / 1e6
    print(
        f"source x lang: chi2={(chi['chi2_x6'] or 0) / 1e6:.2f} "
        f"dof={chi['dof']} Cramér's V={v:.3f} "
        f"({'stratify jointly' if v > 0.3 else 'independent enough'})"
    )

    # 2. operating point from the exact PR sweep (census-bounded table)
    sweep = profiling.pr_curve(
        docs, score_column="n_chars", label_column=F.col("lang") == "en"
    )
    best = sweep.orderBy(
        F.col("f1_x6").desc(), F.col("threshold").asc()
    ).first()
    print(
        f"best-F1 cut: n_chars >= {best['threshold']} "
        f"(P={best['precision_x6'] / 1e6:.3f} "
        f"R={best['recall_x6'] / 1e6:.3f} F1={best['f1_x6'] / 1e6:.3f})"
    )

    # 3. conformal 90% length envelope
    conf = profiling.conformal_threshold(
        docs,
        score_column="n_chars",
        calibration_column=hash_bucket_expr(["doc_id"]) < 5000,
        alpha_num=1,
        alpha_den=10,
    ).collect()[0]
    print(
        f"conformal 90% length cap: <= {conf['threshold']} "
        f"(k={conf['k_rank']} of {conf['n_cal']} cal; held-out coverage "
        f"{conf['coverage_x6'] / 1e6:.3f} vs target "
        f"{conf['target_x6'] / 1e6:.1f})"
    )

    # 4. retrieval ship gates on a bounded query panel
    panel = emb.filter(F.col("vec_id") < 25)
    retr = similarity.retrieval_eval_report(
        emb, panel, label_column="label", k=10
    ).agg(
        F.count(F.lit(1)).alias("n_q"),
        F.avg(F.col("ndcg_x6")).alias("mean_ndcg_x6"),
        F.avg(F.col("rr_q6")).alias("mean_rr_q6"),
    ).collect()[0]
    rec = similarity.int8_recall_report(emb, panel, k=10).agg(
        F.avg(F.col("recall_q6")).alias("mean_recall_q6")
    ).collect()[0]
    print(
        f"retrieval panel ({retr['n_q']} queries): "
        f"mean nDCG@10={(retr['mean_ndcg_x6'] or 0) / 1e6:.3f} "
        f"mean RR={(retr['mean_rr_q6'] or 0) / 1e6:.3f}; "
        f"int8 recall@10={(rec['mean_recall_q6'] or 0) / 1e6:.3f}"
    )

    # 5. cohort survival: purchasers vs the rest
    from pyspark_playground_spark.queries import load_events

    e = load_events(spark, sf_dir)
    lt = survival.user_lifetimes(
        e,
        carry_aggs={
            "grp": F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            == 1
        },
    )
    lr = survival.log_rank_test(lt).collect()[0]
    chi2 = (lr["chi2_q6"] or 0) / 1e6
    print(
        f"log-rank purchasers vs rest: chi2={chi2:.3f} "
        f"(n={lr['n_a']}/{lr['n_b']}, deaths={lr['deaths_a']}/"
        f"{lr['deaths_b']}) — "
        f"{'curves differ (1 dof, p<0.05)' if chi2 > 3.84 else 'no separation'}"
    )

    # 6. contract check: exact violation counts, one pass
    from pyspark_playground_spark.operators.quality import check_expectations

    exp = check_expectations(
        docs,
        [
            {"type": "not_null", "column": "text"},
            {"type": "unique", "columns": ["doc_id"]},
            {"type": "range", "column": "n_chars", "min": 1,
             "max": 1_000_000},
        ],
    ).collect()
    n_failed = sum(1 for r in exp if not r["passed"])
    print(f"expectations: {len(exp)} rules, {n_failed} failed")

    # 7. per-source conformal envelopes (Mondrian)
    mond = profiling.conformal_threshold_by_group(
        docs,
        score_column="n_chars",
        group_column="source",
        calibration_column=hash_bucket_expr(["doc_id"]) < 5000,
        alpha_num=1,
        alpha_den=10,
    )
    worst = mond.filter(F.col("coverage_x6").isNotNull()).orderBy(
        F.col("coverage_x6").asc()
    ).first()
    print(
        f"Mondrian envelopes: {mond.count()} sources; worst held-out "
        f"coverage {worst['coverage_x6'] / 1e6:.3f} "
        f"({worst['source']}, cap {worst['threshold']})"
    )
    print("PIPELINE OK")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
