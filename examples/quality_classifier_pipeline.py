#!/usr/bin/env python
"""Worked example: train and honestly evaluate a quality classifier.

The loop a data team runs before letting a learned score gate a corpus,
using MLlib for the one genuinely iterative stage (model fitting) and
this package's exact operators for everything around it — features,
splits, and evaluation are where silent bugs live, and every one of
those stages here is deterministic and auditable:

1. features — cheap per-document signals from pure column expressions
   (length, token count, type-token ratio, punctuation share);
2. split — stable content-hash train/test split (the same split every
   run, on every engine: ``sampling.assign_split``);
3. train — MLlib ``LogisticRegression`` on the train half, predicting
   a language label from the features (the stand-in for a real quality
   label);
4. evaluate exactly — tie-corrected exact ROC-AUC of the model score on
   the held-out half (``profiling.exact_auc`` — the same integer 2U
   statistic the registry pins against DuckDB), per-source
   ``grouped_auc`` to catch strata where the model inverts, and
   ``calibration_bins`` to check the score LEVEL tracks the positive
   rate before anyone treats it as a probability;
5. gate — the declarative pipeline's ``score_gate`` refuses the corpus
   when the trained score stops ranking on fresh data.

Run: ``python examples/quality_classifier_pipeline.py [sf_dir]``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pyspark_playground_spark.operators import profiling, sampling, text
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
    spark = get_spark(app_name="quality-classifier-pipeline")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )

    # 1. features (pure projections) + label
    toks = text.token_count_expr("text")
    feat = docs.select(
        "doc_id",
        "source",
        F.col("n_chars").cast("double").alias("f_chars"),
        toks.cast("double").alias("f_tokens"),
        (
            F.size(F.array_distinct(text.tokens_expr("text"))).cast("double")
            / F.greatest(toks, F.lit(1)).cast("double")
        ).alias("f_ttr"),
        (
            F.length(F.regexp_replace("text", r"[\w\s]", "")).cast("double")
            / F.greatest(F.length("text"), F.lit(1)).cast("double")
        ).alias("f_punct"),
        (F.col("lang") == "en").cast("double").alias("label"),
    )

    # 2. stable split
    split = sampling.assign_split(feat, ["doc_id"])
    train = split.filter(F.col("split") == "train")
    test = split.filter(F.col("split") != "train")

    # 3. train (MLlib — the one iterative stage)
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    asm = VectorAssembler(
        inputCols=["f_chars", "f_tokens", "f_ttr", "f_punct"],
        outputCol="features",
    )
    lr = LogisticRegression(
        featuresCol="features", labelCol="label", maxIter=20, regParam=0.01
    )
    model = lr.fit(asm.transform(train))
    print(f"trained on {train.count()} docs; "
          f"coefficients={[round(c, 4) for c in model.coefficients]}")

    # 4. exact evaluation on the held-out half. The trained model is
    # exported to a pure column expression (coefficients are driver-side,
    # model-sized): score = sigmoid(intercept + w·x). Same math as
    # model.transform's probability column, but the scorer is whole-stage
    # codegen with NO ml object in any task closure — model.transform
    # serializes the model into the prediction closure, and a model whose
    # trainingSummary is populated drags a SparkSession reference with it
    # (java.io.NotSerializableException: ObservationManager).
    feature_cols = ["f_chars", "f_tokens", "f_ttr", "f_punct"]
    weights = [float(w) for w in model.coefficients]
    margin = F.lit(float(model.intercept))
    for col_name, w in zip(feature_cols, weights):
        margin = margin + F.lit(w) * F.col(col_name)
    scored = test.select(
        "doc_id",
        "source",
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))).alias("score"),
        F.col("label").cast("boolean").alias("is_en"),
    )
    auc = profiling.exact_auc(
        scored, score_column="score", label_column="is_en"
    ).collect()[0]
    print(f"held-out exact AUC: {auc['auc']:.3f} "
          f"(pos={auc['n_pos']} neg={auc['n_neg']}, "
          f"{auc['n_scores']} distinct scores)")
    per_src = profiling.grouped_auc(
        scored, group_column="source", score_column="score",
        label_column="is_en",
    )
    inverted = per_src.filter(
        F.col("auc").isNotNull() & (F.col("auc") < 0.5)
    ).count()
    print(f"per-source AUC: {per_src.count()} sources, {inverted} inverted")
    cal = profiling.calibration_bins(
        scored, score_column="score", label_column="is_en", bins=5
    ).orderBy("bin")
    for r in cal.collect():
        print(f"  cal bin {r['bin']}: n={r['n']} "
              f"mean_score={r['mean_score']:.3f} pos_rate={r['pos_rate']:.3f}")

    # 5. gate: refuse the corpus if the trained score stops ranking
    gated = scored.withColumnRenamed("score", "quality_score")
    try:
        pl.run_pipeline(
            gated,
            {"stages": [{"op": "score_gate",
                         "params": {"score_column": "quality_score",
                                    "label_expr": "is_en",
                                    "min_auc": 0.5}}]},
        )
        print("score_gate: PASSED (score still ranks the held-out half)")
    except ValueError as e:
        print(f"score_gate: REFUSED ({e})")
    print("PIPELINE OK")


if __name__ == "__main__":
    main()
