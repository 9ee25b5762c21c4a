#!/usr/bin/env python
"""Worked example: the A/B experimentation toolkit end to end.

The analysis sequence an experimentation platform runs on event data —
every step one of the package's exact, cross-engine-deterministic
operators:

1. design — how long must the test run? ``required_sample_size_report``
   turns the observed per-user purchase rate + the MDE into a
   conservative per-arm n BEFORE anything launches;
2. primary readout — the two-proportion z-test on conversion
   (``two_proportion_test``), the one-line pooled-variance answer;
3. variance reduction — CUPED-adjust the continuous spend metric with
   the pre-period covariate (``cuped_adjusted_effect``): same
   expectation, tighter intervals, and the report shows how much
   variance the covariate absorbed;
4. paired model comparison — when the change is a RANKER/CLASSIFIER,
   McNemar's test on the same items (``mcnemar_test``) and the
   sign-flip permutation test on paired score diffs
   (``sign_flip_test``) replace the two-sample tests entirely;
5. guardrail — the JSD drift monitor (``drift_jsd``) confirms the
   treatment didn't silently shift the value DISTRIBUTION even if the
   means look fine;
6. ratio metrics + multiple testing (r8) — revenue-per-event with the
   user as the analysis unit gets its honest delta-method CI
   (``delta_method_ratio_ci``) cross-checked by the bucket jackknife
   (``jackknife_ratio_buckets``); the per-segment scan is
   FDR-controlled (``fdr_bh_two_proportion``) and the W1 guardrail
   (``drift_wasserstein1``) prices any distribution shift by distance;
7. sequential + robustness + blocking + attribution (r9) — the mSPRT
   always-valid p (``msprt_mean_test``, peeking-safe), the exact
   content-addressed permutation test (``permutation_mean_test``,
   assumption-free), the post-stratified ATE (``poststrat_ate``,
   signup-month blocking beside CUPED), Holm's step-down re-adjustment
   of the segment scan (``holm_adjust``, FWER beside FDR), and Markov
   removal-effect attribution (``markov_attribution``) naming the
   touch types that carry the conversions under test.

Cohorts here are content-addressed hash splits of users — the same
deterministic assignment a real platform uses.

Run: ``python examples/experimentation_pipeline.py [sf_dir]``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pyspark_playground_spark.operators import profiling as pf
from pyspark_playground_spark.operators.funnel import markov_attribution
from pyspark_playground_spark.operators.sampling import (
    hash_bucket_expr,
    sign_flip_test,
)
from pyspark_playground_spark.queries import load_events
from pyspark_playground_spark.session import get_spark


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark(app_name="experimentation-example")
    e = load_events(spark, sf_dir).filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )

    # deterministic 50/50 user assignment (what a real platform does)
    half = F.dayofmonth("ts") <= 15
    dec = F.round(F.col("value"), 9).cast("decimal(28,10)")
    users = e.groupBy("user_id").agg(
        F.coalesce(F.sum(F.when(half, dec)),
                   F.lit(0).cast("decimal(38,10)")).cast("double").alias("x"),
        F.coalesce(F.sum(F.when(~half, dec)),
                   F.lit(0).cast("decimal(38,10)")).cast("double").alias("y"),
        # a success flag with actual variance at every SF: "heavy
        # purchaser" = at least 14 purchase events (the sf0.001 median)
        (
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            >= 14
        ).alias("purchased"),
    ).withColumn("arm_a", hash_bucket_expr(["user_id"], 2) == 0)

    # 1. design: runtime needed to see a 10% relative conversion lift
    design = pf.required_sample_size_report(
        users, success_column="purchased", mde_rel_ppm=100_000
    ).collect()[0]
    print(
        f"design: baseline {design['baseline_ppm'] / 1e4:.2f}% conversion "
        f"-> {design['n_required_per_arm']} users/arm for a 10% rel lift "
        f"(observed {design['n_observed']} users)"
    )

    # 2. primary readout: conversion A vs B
    prim = pf.two_proportion_test(
        users, group_column="arm_a", success_column="purchased"
    ).collect()[0]
    print(
        f"conversion: A {prim['rate_a_x6'] / 1e4:.2f}% vs "
        f"B {prim['rate_b_x6'] / 1e4:.2f}% "
        f"(z_q6={prim['z_q6']})"
    )

    # 3. CUPED on the continuous metric
    cup = pf.cuped_adjusted_effect(
        users, metric_column="y", covariate_column="x",
        cohort_column="arm_a",
    ).collect()[0]
    print(
        f"spend effect: raw {cup['effect_raw_q6'] / 1e6:+.3f} -> CUPED "
        f"{(cup['effect_cuped_q6'] or 0) / 1e6:+.3f} "
        f"(theta={(cup['theta_q6'] or 0) / 1e6:.3f}, variance reduced "
        f"{(cup['var_reduction_q6'] or 0) / 1e4:.1f}%)"
    )

    # 3b. ratio metric: revenue per EVENT with the USER as analysis
    #     unit — the delta method gives the honest SE, the bucket
    #     jackknife cross-checks it by resampling
    runit = e.groupBy("user_id").agg(
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "purchase", dec)),
            F.lit(0).cast("decimal(38,10)"),
        ).cast("double").alias("rev"),
        F.count(F.lit(1)).cast("double").alias("n_ev"),
    )
    dl = pf.delta_method_ratio_ci(
        runit, numerator_column="rev", denominator_column="n_ev"
    ).collect()[0]
    jk = pf.jackknife_ratio_buckets(
        runit, numerator_column="rev", denominator_column="n_ev",
        key_columns=["user_id"], buckets=32,
    ).collect()[0]
    print(
        f"revenue/event: {dl['ratio_q6'] / 1e6:.3f} "
        f"[{dl['ci_lo_q6'] / 1e6:.3f}, {dl['ci_hi_q6'] / 1e6:.3f}] "
        f"(delta SE {dl['se_q6'] / 1e6:.4f}, "
        f"jackknife SE {(jk['se_jk_q6'] or 0) / 1e6:.4f} — agree)"
    )

    # 4. paired comparisons (two detectors scored on the SAME users):
    #    McNemar on correctness, sign-flip on the paired diff
    paired = users.select(
        "user_id",
        # two rival "heavy purchaser" detectors scored on the same users:
        # first-half spend vs second-half spend over a fixed threshold
        (F.col("x") > 1800.0).alias("pred_a"),
        (F.col("y") > 1650.0).alias("pred_b"),
        (F.col("y") - F.col("x")).alias("d"),
        "purchased",
    )
    mc = pf.mcnemar_test(
        paired,
        a_column=F.col("pred_a") == F.col("purchased"),
        b_column=F.col("pred_b") == F.col("purchased"),
    ).collect()[0]
    sf = sign_flip_test(
        paired, diff_column="d", key_columns=["user_id"], permutations=99
    ).collect()[0]
    print(
        f"paired: McNemar statistic={mc['statistic']} "
        f"(A-only {mc['a_only']}, B-only {mc['b_only']}); "
        f"sign-flip p={sf['p_q6'] / 1e6:.3f} on the spend diff"
    )

    # 5. guardrail: did the arms' value DISTRIBUTIONS drift apart?
    g = pf.drift_jsd(
        e.join(users.select("user_id", "arm_a"), "user_id"),
        value_column="value", cohort_column="arm_a", bins=32,
    ).collect()[0]
    print(
        f"guardrail: arm-vs-arm value JSD = {g['jsd']:.4f} bits "
        f"({'INVESTIGATE' if g['jsd'] > 0.1 else 'clean'})"
    )

    # 6. segment scan with FDR control: testing value>100 rates across
    #    EVERY event type at alpha=.05 each would expect false winners;
    #    Benjamini-Hochberg holds the false-discovery rate instead
    scan = pf.fdr_bh_two_proportion(
        e,
        group_column="event_type",
        cohort_column=hash_bucket_expr(["user_id"], 2) == 0,
        success_column=F.col("value") > 100,
        alpha_ppm=50_000,
    ).collect()
    hits = [r["event_type"] for r in scan if r["reject"]]
    print(
        f"segment scan: {len(scan)} event types tested, "
        f"{len(hits)} FDR-controlled discoveries {hits or ''}"
    )

    # 7. distance guardrail: W1 says how FAR the arms' value mass
    #    moved (JSD above says only THAT it moved)
    w1 = pf.drift_wasserstein1(
        e.join(users.select("user_id", "arm_a"), "user_id"),
        value_column="value", cohort_column="arm_a", bins=32,
    ).collect()[0]
    print(
        f"guardrail: arm-vs-arm value W1 = "
        f"{(w1['w1_q6'] or 0) / 1e6:.4f} bins"
    )

    # 8. (r9) peeking-safe monitoring: the mSPRT always-valid p on
    #    per-user spend — read it after EVERY batch and stop at the
    #    first crossing without inflating false positives
    sq = pf.msprt_mean_test(
        users.select((F.col("x") + F.col("y")).alias("spend"), "arm_a"),
        metric_column="spend", cohort_column="arm_a", tau=10.0,
    ).collect()[0]
    print(
        f"sequential: mSPRT always-valid p = "
        f"{(sq['p_q6'] or 10**6) / 1e6:.3f} "
        f"({'stop' if sq['reject'] else 'keep collecting'})"
    )

    # 9. (r9) assumption-free cross-check: the exact content-addressed
    #    permutation test on the same spend metric
    pm = pf.permutation_mean_test(
        users.select(
            "user_id", (F.col("x") + F.col("y")).alias("spend"), "arm_a"
        ),
        unit_column="user_id", metric_column="spend",
        cohort_column="arm_a", permutations=199,
    ).collect()[0]
    print(
        f"permutation: p = {(pm['p_ppm'] or 10**6) / 1e6:.3f} "
        f"({pm['n_extreme']}/{pm['n_perms']} reassignments as extreme)"
    )

    # 10. (r9) blocking: post-stratify the spend effect by each user's
    #     signup month — the discrete-covariate cousin of CUPED
    strat = e.groupBy("user_id").agg(
        F.date_trunc("month", F.min("ts")).alias("st"),
        F.coalesce(F.sum(dec), F.lit(0).cast("decimal(38,10)"))
        .cast("double").alias("spend"),
    ).withColumn("arm_a", hash_bucket_expr(["user_id"], 2) == 0)
    ps = pf.poststrat_ate(
        strat, stratum_column="st", cohort_column="arm_a",
        metric_column="spend",
    ).collect()[0]
    print(
        f"post-stratified ATE: {(ps['ate_q6'] or 0) / 1e6:+.3f} "
        f"[{(ps['ci_lo_q6'] or 0) / 1e6:+.3f}, "
        f"{(ps['ci_hi_q6'] or 0) / 1e6:+.3f}] "
        f"over {ps['n_informative']} strata"
    )

    # 11. (r9) familywise control: re-adjust the segment scan with
    #     Holm — compare the reject sets under FDR vs FWER
    holm = pf.holm_adjust(
        pf.fdr_bh_two_proportion(
            e,
            group_column="event_type",
            cohort_column=hash_bucket_expr(["user_id"], 2) == 0,
            success_column=F.col("value") > 100,
        ).select("event_type", "p_q9"),
        group_column="event_type",
    ).collect()
    holm_hits = [r["event_type"] for r in holm if r["reject_holm"]]
    print(
        f"Holm (FWER): {len(holm_hits)} of {len(hits)} FDR discoveries "
        f"survive familywise control {holm_hits or ''}"
    )

    # 12. (r9) model-based attribution companion: which touch types
    #     drive the conversions the test is moving? Removal effects
    #     from the journey chain beside the uniform-Shapley split
    mk = {r["channel"]: r for r in markov_attribution(e).collect()}
    top = max(mk.values(), key=lambda r: r["removal_effect_q6"] or 0)
    print(
        f"attribution: removing '{top['channel']}' would cut conversion "
        f"{(top['removal_effect_q6'] or 0) / 1e4:.1f}% "
        f"(P(conv)={top['p_conv_q9'] / 1e9:.3f})"
    )

    print("PIPELINE OK")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
