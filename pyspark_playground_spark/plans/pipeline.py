"""Declarative corpus pipeline: a YAML/dict spec → composed DataFrame plan.

The LLM-data twin of ``plans/declarative.py``'s vault layer: the stages a
training-data pipeline chains (filter → dedup → decontaminate → sample →
split → pack) declared as data instead of code, so the same spec runs at
sf0.001 in CI and on the 100 TB corpus unchanged. Each stage is a thin
binding onto an operator from this package — the spec adds NO new
semantics, it only names compositions.

Spec shape::

    input: {table: documents}          # or the caller passes a DataFrame
    stages:
      - op: c4_filter                  # rule flags + keep conjunction
        params: {min_tokens: 10}
      - op: filter                     # any SQL boolean over current cols
        expr: "quality_score >= 0.5"
      - op: exact_dedup
      - op: near_dedup                 # LSH -> CC -> canonical per cluster
        params: {threshold: 0.8}
      - op: media_near_dedup           # aHash -> CC -> canonical payload
        params: {max_hamming: 3}       #   per perceptual cluster
      - op: chunk_dedup
        params: {chunk_tokens: 8}
      - op: decontaminate              # drop docs sharing 8-grams w/ bench
        benchmark_filter: "doc_id % 50 = 0"
      - op: weighted_sample
        params: {group_column: source, default: 0.75,
                 weights: {src0: 1.0}}
      - op: split                      # adds a `split` column
        params: {splits: {train: 0.8, val: 0.1, test: 0.1}}
      - op: chunk                      # explode into token windows (RAG)
        params: {chunk_tokens: 128, overlap: 16}
      - op: calibrated_filter          # unigram-LM score, rank-calibrated
        params: {min_ppm: 100000}      #   within each source
      - op: perplexity_filter          # self-scored LM quality gate
        params: {min_avg_logprob: -7.5, model: bigram}
      - op: leakage_free_split         # split on near-dup cluster id
      - op: temperature_rebalance      # shares ∝ n^alpha
        params: {alpha: 0.5}
      - op: score_gate                 # refuse if the score stops ranking
        params: {score_column: quality_score, label_expr: "lang = 'en'",
                 min_auc: 0.6}
      - op: calibration_gate           # refuse if the score's LEVEL drifts
        params: {score_column: quality_score, label_expr: "lang = 'en'",
                 max_ece: 0.1, bins: 10}
      - op: divergence_gate            # refuse if any source pair's token
        params: {max_jsd: 0.4}         #   JSD drifts past the threshold
      - op: agreement_gate             # refuse if labeler kappa drops
        params: {a_column: lang, b_column: lang_pred, min_kappa: 0.6}
      - op: independence_gate          # refuse if source x lang Cramér's V
        params: {a_column: source,     #   says per-source stages are
                 b_column: lang,       #   silently per-language ones
                 max_cramers_v: 0.5}
      - op: expect                     # refuse on any failed contract rule
        params: {rules: [{type: not_null, column: text},
                         {type: unique, columns: [doc_id]}]}
      - op: conformal_filter           # drop rows above the split-conformal
        params: {score_column: n_chars,  # envelope (finite-sample guarantee)
                 key_columns: [doc_id], alpha_num: 1, alpha_den: 10}
      - op: normalize                  # canonicalize text (run FIRST)
      - op: token_budget               # best-by-score until budget spent
        params: {score_column: quality_score, tokens_column: n_tokens,
                 budget: 1000000000, group_column: source}
      - op: shard                      # byte-balanced output shards
        params: {bytes_column: n_chars, target_bytes: 67108864,
                 order_column: doc_id}
      - op: t_closeness_gate           # refuse if any QI class's sensitive
        params: {quasi_identifiers: [source],   # distribution skews past
                 sensitive: "n_chars // 500",   # the ordered-EMD bound
                 max_t_ppm: 200000}
      - op: ann_dedup                  # IVF x PQ embedding near-dup keep
        params: {embedding_column: embedding, dim: 64, max_dist2: 0.5,
                 coarse_k: 8, nprobe: 2, m: 4, k: 16, topk: 5}
      - op: knn_join                   # attach approx k-NN per row
        params: {embedding_column: embedding, dim: 64, topk: 5,
                 corpus_table: vector_index}   # or self when omitted

Every stage consumes and produces a DataFrame with at least
``(doc_id, text)``; stages that add flags (``c4_filter``) filter on them
immediately so the chain stays a clean funnel. Unknown ops raise — a spec
typo must not silently skip a cleaning stage.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_playground_spark.operators import dedup as _dd
from pyspark_playground_spark.operators import graph as _gr
from pyspark_playground_spark.operators import quality as _ql
from pyspark_playground_spark.operators import sampling as _sp
from pyspark_playground_spark.operators import text as _tx


def _stage_c4_filter(df: DataFrame, spec: dict) -> DataFrame:
    cols = df.columns
    return _tx.c4_style_filter(df, **spec.get("params", {})).where("keep").select(*cols)


def _stage_filter(df: DataFrame, spec: dict) -> DataFrame:
    return df.where(spec["expr"])


def _stage_quality_score(df: DataFrame, spec: dict) -> DataFrame:
    return _tx.quality_score(_tx.repetition_metrics(df))


def _stage_scrub_pii(df: DataFrame, spec: dict) -> DataFrame:
    keep = [c for c in df.columns if c != "text"]
    return _tx.scrub_pii(df).select(*keep, F.col("scrubbed").alias("text"))


def _stage_exact_dedup(df: DataFrame, spec: dict) -> DataFrame:
    return _dd.exact_dedup(df, **spec.get("params", {}))


def _stage_near_dedup(df: DataFrame, spec: dict) -> DataFrame:
    params = dict(spec.get("params", {}))
    pairs = _dd.minhash_dedup_pairs(df, **params)
    return (
        _gr.dedup_clusters(df, pairs)
        .filter(F.col("is_canonical"))
        .drop("cluster_id", "is_canonical")
    )


def _stage_media_near_dedup(df: DataFrame, spec: dict) -> DataFrame:
    """Perceptual media dedup keep-stage: aHash the payload column
    (``params.content_column``, default the text bytes via
    attach_media_column — the codec-stub contract), bucket near-dup
    pairs at ``params.max_hamming`` through the shared simhash chunk
    machinery, cluster them, and keep one canonical row per perceptual
    cluster — the image-dedup funnel stage beside the text
    ``near_dedup``. Requires ``doc_id``."""
    from pyspark_playground_spark.operators import multimodal as _mm

    p = dict(spec.get("params", {}))
    content = p.pop("content_column", None)
    if content is None:
        work = _mm.attach_media_column(df, p.pop("source_column", "text"))
        content = "content"
    else:
        work = df
    pairs = _mm.ahash_near_dup_pairs(
        work, "doc_id", content_column=content,
        max_hamming=int(p.pop("max_hamming", 3)),
    )
    return (
        _gr.dedup_clusters(df, pairs)
        .filter(F.col("is_canonical"))
        .drop("cluster_id", "is_canonical")
    )


def _stage_chunk_dedup(df: DataFrame, spec: dict) -> DataFrame:
    params = dict(spec.get("params", {}))
    others = [c for c in df.columns if c not in ("text",)]
    out = _dd.token_chunk_dedup(df, **params).where(F.col("n_kept") > 0)
    return out.join(df.select(*others), "doc_id").select(
        *others, "text"
    )


def _stage_decontaminate(df: DataFrame, spec: dict) -> DataFrame:
    bench = df.sparkSession.table(spec["benchmark_table"]) if "benchmark_table" in spec \
        else df.where(spec["benchmark_filter"])
    hits = _dd.ngram_contamination(
        df, bench, **spec.get("params", {})
    ).select("doc_id")
    return df.join(hits, "doc_id", "left_anti")


def _stage_robust_outliers(df: DataFrame, spec: dict) -> DataFrame:
    p = spec.get("params", {})
    return _ql.robust_outliers(
        df, p.get("value_column", "n_chars"), p.get("group_column", "source"),
        threshold=p.get("threshold", 3.5),
    ).where(~F.col("is_outlier")).drop("robust_z", "is_outlier")


def _stage_weighted_sample(df: DataFrame, spec: dict) -> DataFrame:
    p = dict(spec.get("params", {}))
    keys = p.pop("key_columns", ["doc_id"])
    return _sp.weighted_sample(df, keys, **p)


def _stage_sample(df: DataFrame, spec: dict) -> DataFrame:
    p = dict(spec.get("params", {}))
    keys = p.pop("key_columns", ["doc_id"])
    return _sp.deterministic_sample(df, keys, **p)


def _stage_split(df: DataFrame, spec: dict) -> DataFrame:
    p = dict(spec.get("params", {}))
    keys = p.pop("key_columns", ["doc_id"])
    return _sp.assign_split(df, keys, **p)


def _stage_rebalance(df: DataFrame, spec: dict) -> DataFrame:
    """Downsample to target group proportions (sampling.rebalance_mixture);
    ``target_ppm`` maps group → parts-per-million share."""
    p = dict(spec.get("params", {}))
    keys = p.pop("key_columns", ["doc_id"])
    return _sp.rebalance_mixture(df, keys, **p)


def _stage_span_dup_filter(df: DataFrame, spec: dict) -> DataFrame:
    """Drop documents whose stride-1 duplicated-span fraction exceeds
    ``max_dup_ppm`` (dedup.span_duplication_stats — the ExactSubstr
    signal); heavy boilerplate/template docs die here."""
    p = spec.get("params", {})
    stats = _dd.span_duplication_stats(
        df, span_tokens=p.get("span_tokens", 20)
    )
    keep = stats.filter(
        F.col("dup_ppm") <= F.lit(p.get("max_dup_ppm", 500_000))
    ).select(F.col("id").alias("doc_id"))
    return df.join(keep, "doc_id")


def _stage_chunk(df: DataFrame, spec: dict) -> DataFrame:
    """Terminal shaping stage: explode documents into overlapping token
    windows for embedding/indexing (packing.sliding_window_chunks). The
    chunk text becomes the new ``text``; ``doc_id`` is kept alongside
    ``chunk_index``, so downstream stages that key on doc_id still work
    (key on [doc_id, chunk_index] for chunk-level ops)."""
    from pyspark_playground_spark.operators import packing as _pk

    p = dict(spec.get("params", {}))
    out = _pk.sliding_window_chunks(
        df,
        p.get("text_column", "text"),
        id_column=p.get("id_column", "doc_id"),
        chunk_tokens=p.get("chunk_tokens", 128),
        overlap=p.get("overlap", 16),
    )
    return out.withColumnRenamed("chunk_text", "text")


def _stage_calibrated_filter(df: DataFrame, spec: dict) -> DataFrame:
    """Quality filter on CALIBRATED rank, not raw score: unigram-LM score
    per doc, percent-ranked WITHIN each group (text.unigram_logprob_scores
    + sampling.rank_normalize), keep rows at or above ``min_ppm``."""
    p = dict(spec.get("params", {}))
    id_col = p.get("id_column", "doc_id")
    group = p.get("group_column", "source")
    min_ppm = p.get("min_ppm", 100_000)
    scored = _tx.unigram_logprob_scores(df, id_column=id_col).select(
        id_col, "avg_logprob"
    )
    cal = _sp.rank_normalize(
        df.join(scored, id_col),
        group_column=group,
        value_column="avg_logprob",
        id_column=id_col,
    )
    return cal.filter(F.col("pct_ppm") >= min_ppm).drop(
        "group_rank", "pct_ppm", "avg_logprob"
    )


def _stage_leakage_free_split(df: DataFrame, spec: dict) -> DataFrame:
    """Group-disjoint split: near-dup clusters (Jaccard pairs → CC) become
    the split key so duplicates never straddle train/test."""
    p = dict(spec.get("params", {}))
    pairs = _dd.ngram_jaccard_pairs(
        df,
        within=p.get("within", "source"),
        shingle_size=p.get("shingle_size", 1),
        threshold=p.get("threshold", 0.5),
    )
    labeled = _gr.dedup_clusters(df, pairs)
    kwargs = {}
    if "splits" in p:
        kwargs["splits"] = p["splits"]
    out = _sp.assign_split(labeled, ["cluster_id"], **kwargs)
    return out.drop("component", "is_canonical")


def _stage_temperature_rebalance(df: DataFrame, spec: dict) -> DataFrame:
    """Downsample to temperature-scaled target shares (w ∝ n^alpha);
    the share table is model-sized (one row per group), so the collect
    feeding ``rebalance_mixture`` is O(groups), not data-sized."""
    p = dict(spec.get("params", {}))
    keys = p.pop("key_columns", ["doc_id"])
    group = p.get("group_column", "source")
    alpha = p.get("alpha", 0.5)
    shares = _sp.temperature_shares(df, group_column=group, alpha=alpha).collect()
    target = {r[group]: int(r["share_ppm"]) for r in shares}
    return _sp.rebalance_mixture(
        df, keys, group_column=group, target_ppm=target
    )


def _stage_tokenize_bpe(df: DataFrame, spec: dict) -> DataFrame:
    """Terminal shaping stage: segment each document with a FIXED BPE
    merge list (text.bpe_apply_merges — per-word greedy folds, pure JVM).
    ``params.merges`` is the ordered ``[[left, right], ...]`` list, e.g.
    the output of ``text.bpe_learn_merges`` from a training run. Added as
    two ``withColumn`` projections (``bpe_tokens``/``n_bpe_tokens``) via
    ``text.bpe_tokens_expr`` — zero shuffle, all other columns kept."""
    p = dict(spec.get("params", {}))
    merges = [tuple(m) for m in p["merges"]]
    toks = _tx.bpe_tokens_expr(merges, p.get("text_column", "text"))
    return df.withColumn("bpe_tokens", toks).withColumn(
        "n_bpe_tokens", F.size(F.col("bpe_tokens"))
    )


def _stage_score_gate(df: DataFrame, spec: dict) -> DataFrame:
    """Evaluation gate: refuse to continue the pipeline when the score
    that the downstream ``filter``/``calibrated_filter`` stages rely on
    no longer RANKS the corpus (exact tie-corrected ROC-AUC of
    ``params.score_column`` against the boolean ``params.label_expr``
    below ``params.min_auc``). Pass-through on success — the returned
    plan is ``df`` unchanged. Unlike the lazily-composed shaping stages
    this one materializes a one-row aggregate at build time; that is
    the point of a gate (same contract as ``quality.observed_write``'s
    metric gates).
    """
    from pyspark_playground_spark.operators.profiling import exact_auc

    p = dict(spec.get("params", {}))
    score = p["score_column"]
    label = F.expr(p["label_expr"])
    min_auc = float(p.get("min_auc", 0.5))
    row = exact_auc(df, score_column=score, label_column=label).collect()[0]
    if row["auc"] is None or row["auc"] < min_auc:
        raise ValueError(
            f"score_gate: AUC({score} vs {p['label_expr']}) = "
            f"{row['auc']} < required {min_auc} "
            f"(n_pos={row['n_pos']}, n_neg={row['n_neg']})"
        )
    return df


def _stage_perplexity_filter(df: DataFrame, spec: dict) -> DataFrame:
    """Perplexity-proxy quality gate: keep documents whose average
    token log-likelihood under the corpus's OWN LM
    (``params.model``: ``unigram`` default, ``bigram`` to also catch
    shuffled-token salad) clears ``params.min_avg_logprob`` — the
    declarative form of the CCNet/Gopher-style LM quality filter the
    scoring entries document. The corpus scores itself, so the stage
    is self-contained (no external model artifact); threshold in
    nats-per-token (e.g. -7.5). Returns the surviving rows of the
    ORIGINAL frame (left-semi on the id), funnel shape preserved."""
    from pyspark_playground_spark.operators.text import (
        bigram_logprob_scores,
        unigram_logprob_scores,
    )

    p = dict(spec.get("params", {}))
    model = p.get("model", "unigram")
    if model not in ("unigram", "bigram"):
        raise ValueError(f"perplexity_filter model must be unigram|bigram: {model}")
    fn = bigram_logprob_scores if model == "bigram" else unigram_logprob_scores
    id_column = p.get("id_column", "doc_id")
    thr = float(p["min_avg_logprob"])
    scores = fn(
        df, id_column=id_column, text_column=p.get("text_column", "text")
    )
    keep = scores.filter(F.col("avg_logprob") >= F.lit(thr)).select(
        id_column
    )
    return df.join(keep, id_column, "left_semi")


def _stage_dsir_select(df: DataFrame, spec: dict) -> DataFrame:
    """Domain-targeted selection stage: keep the ``params.k`` documents
    most like the target slice (``params.target`` — a SQL boolean over
    the frame's columns) by DSIR importance resampling
    (sampling.dsir_importance_weights + dsir_gumbel_select). The
    bookkeeping columns are dropped; the stage returns the selected
    rows of the ORIGINAL frame, so downstream stages see the funnel
    shape unchanged."""
    from pyspark_playground_spark.operators.sampling import (
        dsir_gumbel_select,
        dsir_importance_weights,
    )

    p = dict(spec.get("params", {}))
    id_column = p.get("id_column", "doc_id")
    w = dsir_importance_weights(
        df,
        F.expr(p["target"]),
        id_column=id_column,
        text_column=p.get("text_column", "text"),
        buckets=int(p.get("buckets", 4096)),
    )
    picked = dsir_gumbel_select(w, k=int(p["k"]), id_column=id_column)
    return df.join(
        picked.select(id_column), id_column, "left_semi"
    )


def _stage_token_budget(df: DataFrame, spec: dict) -> DataFrame:
    """Budgeted selection stage: keep the best rows by
    ``params.score_column`` until ``params.budget`` tokens
    (``params.tokens_column``) are spent — corpus-wide
    (packing.select_token_budget), or per group when
    ``params.group_column`` is set (per-source mixture quotas). The
    bookkeeping ``cum_tokens`` column is dropped so the funnel shape is
    preserved."""
    from pyspark_playground_spark.operators.packing import (
        grouped_token_budget,
        select_token_budget,
    )

    p = dict(spec.get("params", {}))
    common = dict(
        score_column=p["score_column"],
        tokens_column=p["tokens_column"],
        id_column=p.get("id_column", "doc_id"),
    )
    if "group_column" in p:
        out = grouped_token_budget(
            df, group_column=p["group_column"],
            budget_per_group=int(p["budget"]), **common,
        )
    else:
        out = select_token_budget(df, budget=int(p["budget"]), **common)
    return out.drop("cum_tokens")


def _stage_normalize(df: DataFrame, spec: dict) -> DataFrame:
    """Canonicalize text in place (text.normalize_text: lowercase →
    control-strip → whitespace-collapse → trim) — run FIRST so every
    downstream hash/shingle/dedup stage sees the canonical form."""
    p = dict(spec.get("params", {}))
    out = _tx.normalize_text(df, lowercase=p.get("lowercase", True))
    return out.select(
        *[
            F.col("text_norm").alias("text") if c == "text" else F.col(c)
            for c in df.columns
        ]
    )


def _stage_shard(df: DataFrame, spec: dict) -> DataFrame:
    """Terminal shaping stage: byte-balanced output-shard assignment
    (layout.plan_shards — exact cumulative payload DIV target through
    the range-bucket prefix sum). Adds a ``shard`` int column; write
    with ``partitionBy('shard')`` for ~fixed-size training shards."""
    from pyspark_playground_spark.operators.layout import plan_shards

    p = dict(spec.get("params", {}))
    return plan_shards(
        df,
        bytes_column=p.get("bytes_column", "n_chars"),
        target_bytes=int(p.get("target_bytes", 1 << 26)),
        order_column=p.get("order_column", "doc_id"),
    )


def _stage_divergence_gate(df: DataFrame, spec: dict) -> DataFrame:
    """Mixture-drift gate: refuse to continue when any pair of groups
    (``params.group_column``, default ``source``) has a token-
    distribution Jensen-Shannon divergence above ``params.max_jsd``
    (nats; JSD is bounded by ln 2 ≈ 0.693, so the threshold transfers
    across corpora). The detector is
    ``profiling.js_divergence_matrix`` over exploded
    ``params.text_column`` tokens — a new source whose language mix or
    boilerplate diverges from the rest of the corpus fails loudly here
    instead of silently skewing the trained model. Pass-through on
    success; materializes the |groups|²-bounded matrix at build time
    (the gate contract, same as ``score_gate``).
    """
    from pyspark_playground_spark.operators.profiling import (
        js_divergence_matrix,
    )
    from pyspark_playground_spark.operators.text import tokens_expr

    p = dict(spec.get("params", {}))
    group = p.get("group_column", "source")
    text = p.get("text_column", "text")
    max_jsd = float(p.get("max_jsd", 0.5))
    obs = df.select(
        F.col(group), F.explode(tokens_expr(text)).alias("__token")
    )
    worst = (
        js_divergence_matrix(obs, group_column=group, value_column="__token")
        .orderBy(F.col("jsd_nats").desc())
        .limit(1)
        .collect()
    )
    if worst and worst[0]["jsd_nats"] > max_jsd:
        r = worst[0]
        raise ValueError(
            f"divergence_gate: JSD({r['group_a']}, {r['group_b']}) = "
            f"{r['jsd_nats']:.4f} > allowed {max_jsd}"
        )
    return df


def _stage_agreement_gate(df: DataFrame, spec: dict) -> DataFrame:
    """Labeler-agreement gate: refuse to continue when Cohen's kappa
    between ``params.a_column`` and ``params.b_column`` falls below
    ``params.min_kappa`` — the chance-corrected check that an
    auto-labeler (or a second annotator pass) still agrees with the
    reference labels before downstream stages filter or stratify on
    them. Plain accuracy passes this gate vacuously under class
    imbalance; kappa does not. Pass-through on success."""
    from pyspark_playground_spark.operators.profiling import cohen_kappa

    p = dict(spec.get("params", {}))
    a, b = p["a_column"], p["b_column"]
    min_kappa = float(p.get("min_kappa", 0.6))
    row = cohen_kappa(df, a_column=a, b_column=b).collect()[0]
    if row["kappa"] is None or row["kappa"] < min_kappa:
        raise ValueError(
            f"agreement_gate: kappa({a}, {b}) = {row['kappa']} < "
            f"required {min_kappa} (observed_agreement="
            f"{row['observed_agreement']:.4f}, n={row['n_rows']})"
        )
    return df


def _stage_privacy_gate(df: DataFrame, spec: dict) -> DataFrame:
    """Re-identification gate: refuse to ship the corpus when more than
    ``params.max_rows_below_k`` rows sit in quasi-identifier classes
    smaller than ``params.k`` (``params.quasi_identifiers`` — column
    names or SQL expressions). The k-anonymity release check as a
    pipeline stage (operators/privacy.py k_anonymity_summary); a
    too-small class means an attacker who knows those attributes can
    narrow a record below k candidates. Pass-through on success."""
    from pyspark_playground_spark.operators.privacy import (
        k_anonymity_summary,
    )

    p = dict(spec.get("params", {}))
    qis = [F.expr(q) for q in p["quasi_identifiers"]]
    k = int(p.get("k", 5))
    max_below = int(p.get("max_rows_below_k", 0))
    row = k_anonymity_summary(df, qis, k=k).collect()[0]
    # an empty incoming frame makes the summary's sums NULL — nothing to
    # re-identify, so the gate passes (the score/divergence gates handle
    # their None the same way)
    if row["rows_below_k"] is not None and row["rows_below_k"] > max_below:
        raise ValueError(
            f"privacy_gate: {row['rows_below_k']} rows in "
            f"quasi-identifier classes below k={k} "
            f"(allowed {max_below}; min class size "
            f"{row['min_class_size']}, worst re-identification risk "
            f"{row['max_reident_risk_q6']})"
        )
    return df


def _stage_t_closeness_gate(df: DataFrame, spec: dict) -> DataFrame:
    """Attribute-disclosure gate: refuse to ship the corpus when any
    quasi-identifier class's ordered-EMD t-closeness
    (operators/privacy.py t_closeness_census) against the global
    distribution of ``params.sensitive`` (a bounded-domain ordinal SQL
    expression) exceeds ``params.max_t_ppm``. The k-anonymity
    ``privacy_gate`` bounds re-identification; this bounds what a
    class REVEALS about its members' sensitive attribute even when the
    class is k-large and value-diverse (the skew leak). Pass-through
    on success."""
    from pyspark_playground_spark.operators.privacy import (
        t_closeness_census,
    )

    p = dict(spec.get("params", {}))
    qis = [F.expr(q) for q in p["quasi_identifiers"]]
    sens = p["sensitive"]
    max_t = int(p.get("max_t_ppm", 200_000))
    worst = (
        t_closeness_census(
            df.withColumn("__sens", F.expr(sens)),
            qis,
            "__sens",
            t_ppm=max_t,
        )
        .filter(F.col("t_ppm") > max_t)
        .orderBy(F.col("t_ppm").desc())
        .limit(1)
        .collect()
    )
    if worst:
        r = worst[0]
        raise ValueError(
            f"t_closeness_gate: a quasi-identifier class of size "
            f"{r['group_size']} has t = {r['t_ppm']} ppm > allowed "
            f"{max_t} ppm for sensitive {sens!r}"
        )
    return df


def _stage_interleave(df: DataFrame, spec: dict) -> DataFrame:
    """Mixture-serialization stage: deterministic round-robin interleave
    across ``params.group_column`` (sampling.interleave_by_group) —
    adds ``rank_in_group`` and the closed-form ``global_pos`` so the
    written corpus has a reproducible training order where consecutive
    batches see every source. Typically placed between ``rebalance``
    and ``shard`` (shard on ``global_pos`` instead of the id to get
    byte-balanced AND mixture-balanced shards)."""
    from pyspark_playground_spark.operators.sampling import (
        interleave_by_group,
    )

    p = dict(spec.get("params", {}))
    return interleave_by_group(
        df,
        group_column=p.get("group_column", "source"),
        order_column=p.get("order_column", "doc_id"),
    )


def _stage_boilerplate(df: DataFrame, spec: dict) -> DataFrame:
    """Frequent-line boilerplate removal (dedup.frequent_segment_removal,
    the CCNet pass): segments whose normalized form appears in more than
    ``params.max_doc_freq`` distinct documents are dropped from EVERY
    document. Complements ``chunk_dedup``/``near_dedup`` (keep-first /
    cluster-canonical): those keep one copy, this removes the template
    text itself. Run AFTER ``normalize`` and BEFORE the dedup stages so
    hashes see boilerplate-free text. The bookkeeping counts are
    dropped; rows keep their original columns (text replaced)."""
    from pyspark_playground_spark.operators.dedup import (
        frequent_segment_removal,
    )

    p = dict(spec.get("params", {}))
    id_column = p.get("id_column", "doc_id")
    cleaned = frequent_segment_removal(
        df.select(id_column, p.get("text_column", "text")),
        id_column=id_column,
        text_column=p.get("text_column", "text"),
        separator=p.get("separator", "\n"),
        max_doc_freq=int(p.get("max_doc_freq", 2)),
        min_chars=int(p.get("min_chars", 1)),
    ).select(id_column, p.get("text_column", "text"))
    passthrough = [c for c in df.columns if c != p.get("text_column", "text")]
    return df.select(*passthrough).join(cleaned, id_column)


def _stage_calibration_gate(df: DataFrame, spec: dict) -> DataFrame:
    """Calibration gate: refuse to continue when the expected
    calibration error of ``params.score_column`` (a probability-like
    score) against the boolean ``params.label_expr`` exceeds
    ``params.max_ece`` — score_gate's companion (AUC certifies the
    RANKING; a miscalibrated score still breaks every absolute
    threshold downstream stages apply). ECE = Σ (n_b/N)·|mean_score_b −
    pos_rate_b| over ``params.bins`` reliability bins
    (profiling.calibration_bins). Pass-through on success."""
    from pyspark_playground_spark.operators.profiling import calibration_bins

    p = dict(spec.get("params", {}))
    score = p["score_column"]
    label = F.expr(p["label_expr"])
    max_ece = float(p.get("max_ece", 0.1))
    bins = int(p.get("bins", 10))
    b = calibration_bins(
        df, score_column=score, label_column=label, bins=bins
    )
    row = b.agg(
        F.sum(
            F.col("n").cast("double")
            * F.abs(F.col("mean_score") - F.col("pos_rate"))
        ).alias("__w"),
        F.sum("n").alias("__n"),
    ).collect()[0]
    ece = (row["__w"] / row["__n"]) if row["__n"] else None
    if ece is not None and ece > max_ece:
        raise ValueError(
            f"calibration_gate: ECE({score} vs {p['label_expr']}) = "
            f"{ece:.4f} > allowed {max_ece} over {bins} bins"
        )
    return df


def _stage_expect(df: DataFrame, spec: dict) -> DataFrame:
    """Contract gate: evaluate ``params.rules`` (quality.
    check_expectations — not_null / unique / accepted_values / range /
    regex_match / row_count_between) and refuse the pipeline when any
    rule fails, reporting every failing rule with its exact violation
    count. Pass-through on success. The declarative form of "don't
    promote a table that breaks its contract"."""
    from pyspark_playground_spark.operators.quality import (
        check_expectations,
    )

    p = dict(spec.get("params", {}))
    rows = check_expectations(df, list(p["rules"])).collect()
    failed = [r for r in rows if not r["passed"]]
    if failed:
        detail = "; ".join(
            f"rule {r['rule_id']} {r['rule_type']}({r['target']}): "
            f"{r['n_violations']} violations"
            for r in failed
        )
        raise ValueError(f"expect: {len(failed)} rule(s) failed — {detail}")
    return df


def _stage_conformal_filter(df: DataFrame, spec: dict) -> DataFrame:
    """Distribution-free outlier cut: drop rows whose
    ``params.score_column`` exceeds the split-conformal
    ``ceil((n+1)(1-α))``-th smallest calibration score
    (profiling.conformal_threshold) — the winsorize/robust-z alternative
    that carries a finite-sample guarantee instead of a distributional
    assumption. The calibration half is the content-hash bucket split
    of ``params.key_columns`` below ``params.cal_buckets`` (of 10000),
    so the cut is reproducible row-for-row on any engine. α is the
    rational ``params.alpha_num / params.alpha_den``. A NULL threshold
    (calibration too small: k > n) keeps everything — the honest
    degenerate answer. Materializes the one-row threshold at build time
    (gate-style), then composes the filter lazily.
    """
    from pyspark_playground_spark.operators.profiling import (
        conformal_threshold,
    )
    from pyspark_playground_spark.operators.sampling import hash_bucket_expr

    p = dict(spec.get("params", {}))
    score = p["score_column"]
    keys = list(p["key_columns"])
    cal_buckets = int(p.get("cal_buckets", 5000))
    cal = hash_bucket_expr(keys) < cal_buckets
    row = conformal_threshold(
        df,
        score_column=score,
        calibration_column=cal,
        alpha_num=int(p.get("alpha_num", 1)),
        alpha_den=int(p.get("alpha_den", 10)),
    ).collect()[0]
    if row["threshold"] is None:
        return df
    return df.filter(
        F.col(score).isNull() | (F.col(score) <= F.lit(row["threshold"]))
    )


def _stage_independence_gate(df: DataFrame, spec: dict) -> DataFrame:
    """Stratification gate: refuse to continue when Cramér's V between
    ``params.a_column`` and ``params.b_column`` exceeds
    ``params.max_cramers_v`` (profiling.chi_square_independence) — run
    it BEFORE any per-``a`` stage (per-source thresholds, per-source
    sampling): a large V means those decisions silently become
    per-``b`` ones (e.g. per-language). Degenerate tables (one level on
    either side) pass — there is nothing to confound. Pass-through on
    success."""
    from pyspark_playground_spark.operators.profiling import (
        chi_square_independence,
    )

    p = dict(spec.get("params", {}))
    a, b = p["a_column"], p["b_column"]
    max_v = float(p.get("max_cramers_v", 0.5))
    row = chi_square_independence(df, a_column=a, b_column=b).collect()[0]
    v = (row["cramers_v_q6"] or 0) / 1e6
    if row["cramers_v_q6"] is not None and v > max_v:
        raise ValueError(
            f"independence_gate: Cramér's V({a}, {b}) = {v:.4f} > "
            f"allowed {max_v} (chi2_x6={row['chi2_x6']}, "
            f"dof={row['dof']}, n={row['n_rows']})"
        )
    return df


def _ivf_pq_model_for(
    df: DataFrame, p: dict, id_column: str, vector_column: str
):
    """Resolve the IVF×PQ model for an ANN stage: frozen catalog tables
    when the spec names them (``coarse_table`` + ``book_table`` — the
    production path: train offline once, serve from storage), else
    train in-stage on ``df`` (CI / small-corpus path; the id<k Lloyd
    seed contract applies)."""
    from pyspark_playground_spark.operators import similarity as _sim

    if "coarse_table" in p or "book_table" in p:
        if not ("coarse_table" in p and "book_table" in p):
            raise ValueError(
                "ann stage: coarse_table and book_table must be given "
                "together (a frozen model is both halves)"
            )
        s = df.sparkSession
        return s.table(p["coarse_table"]), s.table(p["book_table"])
    return _sim.ivf_pq_train(
        df,
        id_column=id_column,
        vector_column=vector_column,
        dim=int(p["dim"]),
        coarse_k=int(p.get("coarse_k", 8)),
        coarse_iterations=int(p.get("coarse_iterations", 1)),
        m=int(p.get("m", 2)),
        k=int(p.get("k", 8)),
        iterations=int(p.get("iterations", 1)),
        residual=bool(p.get("residual", False)),
    )


def _stage_ann_dedup(df: DataFrame, spec: dict) -> DataFrame:
    """Embedding near-dup removal via the sublinear vector index: run
    the frozen-model IVF×PQ search of the frame against itself
    (similarity.ivf_pq_search_with_model — shuffle-free literal encode,
    broadcast probe join, candidate-pruned ADC; NEVER all-pairs), keep
    candidate pairs within ``params.max_dist2`` (approximate squared
    L2), connect them into clusters (O(log n) connected components) and
    keep one canonical row per cluster — the ANN twin of
    ``near_dedup``'s MinHash funnel, for corpora whose duplicates are
    semantic (same content, different words) rather than lexical.
    Spec: ``params.{embedding_column, max_dist2, dim | coarse_table+
    book_table, id_column, coarse_k, nprobe, m, k, topk, residual}``."""
    from pyspark_playground_spark.operators import similarity as _sim

    p = dict(spec.get("params", {}))
    idc = p.get("id_column", "doc_id")
    vc = p.get("embedding_column", "embedding")
    coarse, book = _ivf_pq_model_for(df, p, idc, vc)
    hits = _sim.ivf_pq_search_with_model(
        df, df, coarse, book, id_column=idc, vector_column=vc,
        nprobe=int(p.get("nprobe", 2)), topk=int(p.get("topk", 5)),
        residual=bool(p.get("residual", False)),
    )
    thr_q6 = int(float(p["max_dist2"]) * 1e6 + 0.5)
    pairs = hits.filter(F.col("adist_q6") <= thr_q6).select(
        F.col("query_id").alias("id_a"),
        F.col("neighbor_id").alias("id_b"),
    )
    return (
        _gr.dedup_clusters(df, pairs, idc)
        .filter(F.col("is_canonical"))
        .drop("cluster_id", "is_canonical")
    )


def _stage_knn_join(df: DataFrame, spec: dict) -> DataFrame:
    """Attach each row's approximate k nearest neighbors from a corpus
    (hard-negative mining, RAG candidate generation): frozen-model
    IVF×PQ search of the current frame's embeddings against
    ``params.corpus_table`` (or the frame itself when omitted — ids
    share one space, self-matches excluded). Explodes to one row per
    (row, neighbor) with ``neighbor_id, adist_q6, rank`` appended; rows
    whose probed cells hold no neighbor drop out (inner join — the
    downstream consumer wants pairs, not nulls).
    Spec: ``params.{embedding_column, dim | coarse_table+book_table,
    id_column, coarse_k, nprobe, m, k, topk, residual}``."""
    from pyspark_playground_spark.operators import similarity as _sim

    p = dict(spec.get("params", {}))
    idc = p.get("id_column", "doc_id")
    vc = p.get("embedding_column", "embedding")
    corpus = (
        df.sparkSession.table(p["corpus_table"])
        if "corpus_table" in p
        else df
    )
    coarse, book = _ivf_pq_model_for(corpus, p, idc, vc)
    hits = _sim.ivf_pq_search_with_model(
        corpus, df, coarse, book, id_column=idc, vector_column=vc,
        nprobe=int(p.get("nprobe", 2)), topk=int(p.get("topk", 5)),
        residual=bool(p.get("residual", False)),
    )
    return df.join(
        hits, df[idc] == hits["query_id"]
    ).drop("query_id")


STAGES: dict[str, Callable[[DataFrame, dict], DataFrame]] = {
    "ann_dedup": _stage_ann_dedup,
    "knn_join": _stage_knn_join,
    "boilerplate": _stage_boilerplate,
    "expect": _stage_expect,
    "conformal_filter": _stage_conformal_filter,
    "independence_gate": _stage_independence_gate,
    "calibration_gate": _stage_calibration_gate,
    "score_gate": _stage_score_gate,
    "privacy_gate": _stage_privacy_gate,
    "t_closeness_gate": _stage_t_closeness_gate,
    "interleave": _stage_interleave,
    "divergence_gate": _stage_divergence_gate,
    "agreement_gate": _stage_agreement_gate,
    "shard": _stage_shard,
    "normalize": _stage_normalize,
    "dsir_select": _stage_dsir_select,
    "token_budget": _stage_token_budget,
    "tokenize_bpe": _stage_tokenize_bpe,
    "c4_filter": _stage_c4_filter,
    "perplexity_filter": _stage_perplexity_filter,
    "filter": _stage_filter,
    "quality_score": _stage_quality_score,
    "scrub_pii": _stage_scrub_pii,
    "exact_dedup": _stage_exact_dedup,
    "near_dedup": _stage_near_dedup,
    "media_near_dedup": _stage_media_near_dedup,
    "chunk_dedup": _stage_chunk_dedup,
    "decontaminate": _stage_decontaminate,
    "robust_outliers": _stage_robust_outliers,
    "weighted_sample": _stage_weighted_sample,
    "sample": _stage_sample,
    "split": _stage_split,
    "span_dup_filter": _stage_span_dup_filter,
    "rebalance": _stage_rebalance,
    "chunk": _stage_chunk,
    "calibrated_filter": _stage_calibrated_filter,
    "leakage_free_split": _stage_leakage_free_split,
    "temperature_rebalance": _stage_temperature_rebalance,
}


def load_spec(text_or_path: str | Path) -> dict[str, Any]:
    import yaml

    s = str(text_or_path)
    if "\n" not in s and (s.endswith((".yaml", ".yml", ".json")) or Path(s).exists()):
        s = Path(s).read_text()
    spec = yaml.safe_load(s)
    if not isinstance(spec, dict) or "stages" not in spec:
        raise ValueError("pipeline spec must be a mapping with a 'stages' list")
    return spec


def run_pipeline(df: DataFrame, spec: dict | str | Path) -> DataFrame:
    """Fold the spec's stages over ``df``. Plans compose lazily — the
    whole chain is ONE DataFrame for Catalyst/AQE; nothing materializes
    until the caller writes. Unknown ops raise ValueError."""
    if not isinstance(spec, dict):
        spec = load_spec(spec)
    out = df
    for i, stage in enumerate(spec["stages"]):
        op = stage.get("op")
        if op not in STAGES:
            raise ValueError(
                f"stage {i}: unknown op {op!r}; known: {sorted(STAGES)}"
            )
        out = STAGES[op](out, stage)
    return out
