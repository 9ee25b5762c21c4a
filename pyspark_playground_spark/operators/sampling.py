"""Deterministic sampling & dataset splitting for training-data pipelines.

Content-addressed (hash-based) selection instead of RNG sampling: membership
depends only on the key, so samples are reproducible across reruns, stable
under repartitioning, and consistent between engines — which is exactly what
a 100 TB corpus pipeline needs (rerunning a stage must not reshuffle the
training set). ``F.rand``-based sampling has none of those properties.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket_expr(key_columns: Sequence[str | Column], buckets: int = 10_000) -> Column:
    """Stable bucket in [0, buckets) from the md5 of the key columns.

    Uses the first 8 hex chars of md5 (32 bits) — engine-portable (any SQL
    engine with md5 can reproduce membership; xxhash64 seeds differ across
    engines).
    """
    cols = [
        (F.col(c) if isinstance(c, str) else c).cast("string") for c in key_columns
    ]
    h32 = F.conv(F.substring(F.md5(F.concat_ws(",", *cols)), 1, 8), 16, 10)
    return (h32.cast("bigint") % buckets).cast("int")


def deterministic_sample(
    df: DataFrame,
    key_columns: Sequence[str],
    *,
    fraction: float,
    buckets: int = 10_000,
) -> DataFrame:
    """Keep rows whose hash bucket falls below ``fraction`` of the range."""
    cutoff = int(round(fraction * buckets))
    return df.filter(hash_bucket_expr(key_columns, buckets) < cutoff)


def assign_split(
    df: DataFrame,
    key_columns: Sequence[str],
    *,
    splits: dict[str, float] | None = None,
    buckets: int = 10_000,
    split_column: str = "split",
) -> DataFrame:
    """Assign every row to a named split (train/val/test by default) by
    hash bucket. Fractions must sum to 1; assignment is stable per key."""
    splits = splits or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    bucket = hash_bucket_expr(key_columns, buckets)
    expr: Column | None = None
    upper = 0.0
    names = list(splits)
    for name in names[:-1]:
        upper += splits[name]
        cond = bucket < int(round(upper * buckets))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = (expr.otherwise(F.lit(names[-1])) if expr is not None
            else F.lit(names[-1]))
    return df.withColumn(split_column, expr)


def sample_k_per_group(
    df: DataFrame,
    group_columns: str | Sequence[str],
    key_columns: Sequence[str],
    *,
    k: int,
    order_tiebreak: Sequence[str] | None = None,
) -> DataFrame:
    """Deterministic k-rows-per-stratum sample.

    Rows are ranked inside each stratum by the md5 of their key — a
    reproducible stand-in for random order — and the first ``k`` kept.
    Unlike ``df.sampleBy`` (RNG fractions, no exact count, reshuffles on
    rerun) this yields EXACTLY min(k, |stratum|) rows, the same ones every
    run and on every engine. One window shuffle on the stratum key; a hot
    stratum costs one task's sort of that stratum, never a global sort.

    ``order_tiebreak`` (default: the key columns) breaks md5 collisions
    deterministically.
    """
    from pyspark.sql import Window

    groups = [group_columns] if isinstance(group_columns, str) else list(group_columns)
    keys = [F.col(c).cast("string") for c in key_columns]
    tiebreak = list(order_tiebreak or key_columns)
    w = Window.partitionBy(*groups).orderBy(
        F.md5(F.concat_ws(",", *keys)), *[F.col(c) for c in tiebreak]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# embedding post-processing
# ---------------------------------------------------------------------------

def l2_normalize_expr(vector: Column) -> Column:
    """Unit-normalize an array<float/double> (zero vectors stay zero)."""
    v = F.transform(vector, lambda x: x.cast("double"))
    norm = F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return F.when(norm == 0.0, v).otherwise(
        F.transform(v, lambda x: x / norm)
    )


def quantize_int8_expr(vector: Column, *, scale: float = 127.0) -> Column:
    """Symmetric int8 quantization of a unit-normalized vector: round(x*s)
    clamped to [-127, 127]. 4× smaller than float32 on disk — the standard
    storage trade for ANN candidate generation (rescore with full precision
    on the short list)."""
    v = F.transform(vector, lambda x: x.cast("double"))
    return F.transform(
        v,
        lambda x: F.greatest(
            F.lit(-127),
            F.least(F.lit(127), F.round(x * scale).cast("int")),
        ).cast("tinyint"),
    )


def weighted_sample(
    df: DataFrame,
    key_columns: Sequence[str],
    *,
    group_column: str,
    weights: dict[str, float],
    default: float = 1.0,
    buckets: int = 10_000,
) -> DataFrame:
    """Per-group mixture sampling: keep each row with its group's keep
    fraction, decided by the content-hash bucket — the standard way to hit
    a target source mixture in a training corpus (down-weight a crawl,
    keep all of a curated set) with zero RNG state: membership is a pure
    function of the key, reproducible across reruns, engines and
    backfills. Groups absent from ``weights`` keep ``default``.

    One scan, no shuffle — the cutoff is a per-row CASE on the group
    column compared against the md5 bucket.
    """
    cutoff: Column | None = None
    for g, frac in weights.items():
        cond = F.col(group_column) == g
        lit = F.lit(int(round(frac * buckets)))
        cutoff = F.when(cond, lit) if cutoff is None else cutoff.when(cond, lit)
    cutoff = (
        cutoff.otherwise(F.lit(int(round(default * buckets))))
        if cutoff is not None
        else F.lit(int(round(default * buckets)))
    )
    return df.filter(hash_bucket_expr(key_columns, buckets) < cutoff)


def standardize_embeddings(
    df: DataFrame,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
) -> DataFrame:
    """Per-dimension z-score standardization of an embedding column (the
    feature-scaling pre-pass before quantization/clustering): corpus
    mean/std per dimension from exact decimal moment sums (deterministic
    across engines and partitionings), applied with ``zip_with`` — the
    stats ride a broadcast one-row cross join, never a collect.

    Output: ``(id, z: array<double>)``. Two passes over the vectors (one
    aggregation, one transform), one shuffle on the dimension id.
    """
    vec = F.col(vector_column).cast("array<double>")
    x = df.select(
        F.posexplode(vec).alias("dim", "ev")
    ).select("dim", F.col("ev").cast("decimal(18,9)").alias("v"))
    n_d = F.col("n").cast("double")
    m = (
        x.groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").cast("double").alias("sv"),
            F.sum(F.col("v") * F.col("v")).cast("double").alias("svv"),
        )
        .select(
            "dim",
            (F.col("sv") / n_d).alias("mean"),
            F.sqrt(
                (F.col("svv") - F.col("sv") * F.col("sv") / n_d) / n_d
            ).alias("std"),
        )
    )
    stats = m.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "mean", "std"))),
            lambda s: s["mean"],
        ).alias("__means"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "mean", "std"))),
            lambda s: s["std"],
        ).alias("__stds"),
    )
    centered = F.zip_with(vec, F.col("__means"), lambda xv, mu: xv - mu)
    z = F.zip_with(centered, F.col("__stds"), lambda c, sd: c / sd)
    return df.crossJoin(F.broadcast(stats)).select(
        F.col(id_column), z.alias("z")
    )


def rebalance_mixture(
    df: DataFrame,
    key_columns: Sequence[str],
    *,
    group_column: str,
    target_ppm: dict[str, int],
    buckets: int = 10_000,
) -> DataFrame:
    """Downsample over-represented groups so the kept corpus approaches a
    target mixture (``target_ppm``: group → parts-per-million share).

    No group is ever UPsampled: the binding group (smallest
    ``count/share``) keeps everything and every other group's keep count
    scales to match, so the output is the LARGEST corpus with the target
    proportions that pure downsampling can produce. Keep fractions come
    from exact bigint arithmetic (floor divisions) on the observed counts;
    membership is the same content-hash bucket rule as
    ``weighted_sample`` — zero RNG state, reproducible on backfill.
    Groups missing from ``target_ppm`` are dropped (share 0).

    Plan: one count-by-group aggregate (tiny result, broadcast back) +
    one filtered scan. The achieved counts track the target within
    1/buckets relative error per group (hash-bucket granularity).
    """
    counts = df.groupBy(group_column).agg(F.count(F.lit(1)).alias("__n"))
    share: Column | None = None
    for g, ppm in target_ppm.items():
        cond = F.col(group_column) == g
        lit = F.lit(int(ppm))
        share = F.when(cond, lit) if share is None else share.when(cond, lit)
    share = share.otherwise(F.lit(0)) if share is not None else F.lit(0)
    shared = counts.withColumn("__share_ppm", share).filter(
        F.col("__share_ppm") > 0
    )
    # binding group: minimal count/share → scale = min(n * 1e6 div share)
    scale = shared.agg(
        F.min(F.expr("(__n * 1000000) DIV __share_ppm")).alias("__scale")
    )
    cutoffs = (
        shared.crossJoin(F.broadcast(scale))
        .select(
            group_column,
            # target_count = share*scale/1e6; cutoff = buckets*target/n
            F.expr(
                f"CAST(({buckets} * ((__share_ppm * __scale) DIV 1000000))"
                " DIV __n AS INT)"
            ).alias("__cutoff"),
        )
    )
    return (
        df.join(F.broadcast(cutoffs), group_column)
        .filter(hash_bucket_expr(key_columns, buckets) < F.col("__cutoff"))
        .drop("__cutoff")
    )


def weighted_order_sample(
    df: DataFrame,
    *,
    k: int,
    weight_column: str,
    id_column: str = "doc_id",
    key_decimals: int = 9,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement of exactly ``k`` rows
    (Efraimidis–Spirakis A-ES order sampling): each row draws a uniform
    ``u`` and ranks by ``u^(1/w)`` — equivalently ``ln(u)/w`` — and the
    top ``k`` win; inclusion probability is proportional to weight, and
    unlike per-row Bernoulli thinning the output size is exact.

    Deterministic and engine-portable like everything in this module: ``u``
    comes from the first 13 hex chars of ``md5(id)`` — 52 bits, chosen
    because every intermediate fits a double exactly, so any engine
    reproduces the identical uniform — and the rank key is rounded to
    ``key_decimals`` with an ``id`` tie-break so cross-engine ordering is
    stable even at the selection boundary.

    Plan: pure per-row expressions + ``orderBy(...).limit(k)``, which Spark
    executes as TakeOrdered — per-partition top-k then a k-row merge, no
    global sort. Rows with non-positive or null weight are excluded (they
    have zero inclusion probability in A-ES).
    """
    h13 = F.conv(
        F.substring(F.md5(F.col(id_column).cast("string")), 1, 13), 16, 10
    ).cast("bigint")
    u = (h13.cast("double") + F.lit(0.5)) / F.lit(float(16**13))
    w = F.col(weight_column).cast("double")
    key = F.round(F.log(u) / w, key_decimals)
    return (
        df.filter(w > 0)
        .withColumn("__sample_key", key)
        .orderBy(F.col("__sample_key").desc(), F.col(id_column).asc())
        .limit(k)
        .drop("__sample_key")
    )


def rank_normalize(
    df: DataFrame,
    *,
    group_column: str,
    value_column: str,
    id_column: str = "doc_id",
) -> DataFrame:
    """Percent-rank calibration of a score within each group, in exact
    integer ppm: ``(rank-1) * 1e6 DIV (n-1)`` with a total (value, id)
    tie-break — the standard fix for quality scores that are not
    comparable across heterogeneous sources (a crawl's median ≠ a curated
    set's median): filter on the calibrated rank, not the raw score.

    All-integer arithmetic → bit-stable across engines. One window per
    group plus a broadcast-joined group count; a single giant group bounds
    parallelism to one task's sort — re-key through
    ``packing.distributed_rank`` per group if a group is corpus-sized.

    Adds ``group_rank`` (1-based) and ``pct_ppm`` (0..1e6; single-row
    groups get 0).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_column).orderBy(
        F.col(value_column).asc(), F.col(id_column).asc()
    )
    counts = df.groupBy(group_column).agg(F.count(F.lit(1)).alias("__n"))
    return (
        df.join(F.broadcast(counts), group_column)
        .withColumn("group_rank", F.row_number().over(w))
        .withColumn(
            "pct_ppm",
            F.when(F.col("__n") > 1,
                   # rank must be widened BEFORE the ×1e6: int32 overflows
                   # at groups > ~2147 rows (caught by the 10× probe)
                   F.expr("((CAST(group_rank AS BIGINT) - 1) * 1000000)"
                          " DIV (__n - 1)"))
            .otherwise(F.lit(0).cast("bigint")),
        )
        .drop("__n")
    )


def temperature_shares(
    df: DataFrame,
    *,
    group_column: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-scaled mixture shares: target sampling weight per group
    ``w_g = n_g^alpha / Σ n^alpha`` — the standard multilingual/source
    rebalancing rule (alpha < 1 upsamples the tail relative to its natural
    share; alpha = 1 is proportional, alpha = 0 uniform). Feed the shares
    into ``rebalance_to_target`` / ``weighted_sample`` as target ppm.

    Determinism: counts are exact; the ``Σ n^alpha`` fold runs over the
    group list sorted by name (one array fold on a one-row frame — groups
    are few by definition), so double accumulation order is fixed and the
    floored ppm shares are engine-stable.

    Output: ``(group, n_rows, share_ppm)``.
    """
    counts = df.groupBy(group_column).agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col(group_column), F.col("n_rows")))
            ),
            F.lit(0.0),
            lambda acc, r: acc
            + F.pow(r["n_rows"].cast("double"), F.lit(float(alpha))),
        ).alias("__z")
    )
    return counts.crossJoin(F.broadcast(total)).select(
        group_column,
        "n_rows",
        F.floor(
            F.lit(1_000_000.0)
            * F.pow(F.col("n_rows").cast("double"), F.lit(float(alpha)))
            / F.col("__z")
        ).cast("bigint").alias("share_ppm"),
    )


def interleave_by_group(
    df: DataFrame,
    *,
    group_column: str,
    order_column: str,
) -> DataFrame:
    """Deterministic round-robin interleave across groups: global
    training order where position p is the p-th element of the sequence
    "rank-1 of every group (group-name order), then rank-2 of every
    group, ...", groups dropping out as they exhaust. The standard
    fixed-order mixture serialization — consecutive batches see every
    source instead of id-clustered single-source runs, and the order is
    reproducible from the data alone.

    Exactly ``row_number() OVER (ORDER BY rank_in_group, group) - 1``,
    but WITHOUT the corpus-wide single-task window: the global position
    has a closed form against the per-group size table —

    ``pos(r, g) = sum_g'( min(size_g', r-1) ) + |{g' < g : size_g' >= r}|``

    (rows before rank r in other groups, plus same-rank rows of
    earlier-named groups). Sizes are one tiny aggregate collected to the
    driver (O(groups), model-sized — a mixture has tens of sources, not
    millions; the closed-form expression is linear in the group count)
    and folded into a codegen expression, so the only shuffles are the
    per-group rank window and the size aggregate.

    Returns ``group, order, rank_in_group (1-based), global_pos
    (0-based)`` plus the input's other columns. NULL group/order rows
    are excluded (no deterministic position exists for them), and
    ``order_column`` must be UNIQUE within each group — a duplicate
    order value leaves ``row_number`` free to tiebreak arbitrarily,
    which silently breaks reproducibility; pass the doc id or a
    ``distributed_rank`` output, not a score with ties.
    """
    from pyspark.sql import Window

    src = df.filter(
        F.col(group_column).isNotNull() & F.col(order_column).isNotNull()
    )
    w = Window.partitionBy(group_column).orderBy(order_column)
    ranked = src.withColumn("rank_in_group", F.row_number().over(w))

    sizes = sorted(
        (r[0], r[1])
        for r in src.groupBy(group_column).agg(F.count(F.lit(1))).collect()
    )
    r = F.col("rank_in_group")
    g = F.col(group_column)
    pos = F.lit(0).cast("long")
    for name, size in sizes:
        pos = pos + F.least(F.lit(size), r - 1)
        pos = pos + F.when(
            (F.lit(name) < g) & (F.lit(size) >= r), 1
        ).otherwise(0)
    return ranked.withColumn("global_pos", pos.cast("long"))


# ---------------------------------------------------------------------------
# DSIR — data selection via importance resampling (hashed n-gram features)
# ---------------------------------------------------------------------------

def dsir_importance_weights(
    df: DataFrame,
    target_condition: Column,
    *,
    id_column: str = "doc_id",
    text_column: str = "text",
    buckets: int = 4096,
    logw_decimals: int = 7,
) -> DataFrame:
    """Per-document DSIR importance weight (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): fit
    hashed-unigram bag-of-words models on the TARGET slice (rows where
    ``target_condition`` holds) and on the RAW pool (all rows), then
    score every document by ``log p_target(doc) - log p_raw(doc)`` —
    documents that look like the target domain get high weights.

    Features are md5-hashed token buckets (``hash_bucket_expr``, engine-
    portable) with add-1 smoothing over the ``buckets``-sized feature
    space, so unseen-in-target buckets are defined and the two models
    share a domain.

    Cross-engine determinism: the per-bucket log-ratio is rounded to
    ``logw_decimals`` and summed per document in exact DECIMAL — order-
    independent, same recipe as ``text.unigram_logprob_scores``.

    Shuffle census at 100 TB: one explode → groupBy on the bucket id
    (partial aggregation into a BOUNDED ``buckets``-row table), totals as
    a broadcast one-row fold, the bucket-model join BROADCAST back onto
    the token stream (the model is ``buckets`` rows — never a shuffle),
    and the final per-doc groupBy. No global sort, no driver collect.

    Returns ``id_column, n_tokens, log_weight`` (DECIMAL sum; divide by
    ``n_tokens`` for a length-normalized score).
    """
    from pyspark_playground_spark.operators.text import tokens_expr

    toks = df.select(
        F.col(id_column),
        target_condition.alias("__is_target"),
        F.explode(tokens_expr(text_column)).alias("term"),
    ).withColumn("__bucket", hash_bucket_expr([F.col("term")], buckets))
    counts = toks.groupBy("__bucket").agg(
        F.count(F.lit(1)).alias("__raw_cnt"),
        F.sum(F.when(F.col("__is_target"), 1).otherwise(0)).alias("__tgt_cnt"),
    )
    totals = counts.agg(
        F.sum("__raw_cnt").alias("__raw_total"),
        F.sum("__tgt_cnt").alias("__tgt_total"),
    )
    model = counts.crossJoin(F.broadcast(totals)).select(
        "__bucket",
        F.round(
            F.log(
                (F.col("__tgt_cnt") + 1).cast("double")
                / (F.col("__tgt_total") + buckets).cast("double")
            )
            - F.log(
                (F.col("__raw_cnt") + 1).cast("double")
                / (F.col("__raw_total") + buckets).cast("double")
            ),
            logw_decimals,
        )
        .cast("decimal(28,9)")
        .alias("__logw"),
    )
    return (
        toks.join(F.broadcast(model), "__bucket")
        .groupBy(id_column)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("__logw").alias("log_weight"),
        )
    )


def dsir_gumbel_select(
    weights: DataFrame,
    *,
    k: int,
    id_column: str = "doc_id",
    weight_column: str = "log_weight",
    noise_decimals: int = 7,
) -> DataFrame:
    """DSIR's resampling step as a deterministic Gumbel-top-k: sampling k
    documents WITHOUT replacement proportionally to ``exp(log_weight)``
    is exactly "take the top k by ``log_weight + Gumbel noise``"
    (Efraimidis-Spirakis / Gumbel-max). The noise is content-addressed
    instead of RNG: ``u = (h32 + 0.5) / 2^32`` from the md5 of the id —
    the same document draws the same noise on every engine and rerun, so
    the selected set is reproducible (the property RNG sampling loses).

    The perturbed key is the DECIMAL weight plus ``-ln(-ln u)`` rounded
    to ``noise_decimals`` — exact, order-independent arithmetic.

    Plan shape: ``orderBy(...).limit(k)`` = TakeOrderedAndProject —
    per-partition top-k then a k-row merge on one reducer; never a
    global sort.
    """
    h32 = F.conv(
        F.substring(F.md5(F.col(id_column).cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    u = (h32.cast("double") + 0.5) / F.lit(float(2**32))
    gumbel = F.round(-F.log(-F.log(u)), noise_decimals).cast("decimal(28,9)")
    # re-narrow the (sum-widened) weight so the addition stays inside
    # precision 38 — otherwise Spark's precision-loss rule silently drops
    # the scale to 8 and the rendered value diverges across engines
    perturbed = (
        F.col(weight_column).cast("decimal(28,9)") + gumbel
    ).alias("perturbed_weight")
    return (
        weights.select("*", perturbed)
        .orderBy(F.col("perturbed_weight").desc(), F.col(id_column))
        .limit(k)
    )


#: cumulative Poisson(1) CDF for k = 0..9 — shared literal constants on
#: both engines (inverse-CDF sampling; P(k > 9) ~ 1e-7 caps the weight)
_POIS1_CUM = (
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
    0.999916758850712, 0.9999897508033253, 0.999998874797402,
    0.9999998885745216,
)


def poisson_bootstrap_means(
    df: DataFrame,
    *,
    value_column: str,
    key_columns: Sequence[str],
    replicates: int = 32,
) -> DataFrame:
    """Poisson bootstrap of the mean — THE resampling scheme that works
    at 100 TB (public construction — Chamandy et al., Google's
    "Estimating Uncertainty for Massive Data Streams"): classical
    bootstrap needs n draws per replicate from a materialized corpus;
    the Poisson bootstrap gives each row an independent Poisson(1)
    weight per replicate, so B replicates stream through ONE pass with
    map-side-combined partial sums — no resampled copies, no corpus
    shuffle, and replicate totals concentrate at n ± O(√n).

    Determinism (the property RNG bootstraps lose): weights are
    content-addressed — ``u = (h32(md5(key, b)) + 0.5) / 2^32`` and the
    Poisson(1) inverse CDF over shared literal constants, so every
    (row, replicate) draws the same weight on any engine, rerun, or
    partitioning. Weighted sums accumulate in exact DECIMAL (order-free)
    before ONE double division per replicate, quantized q6.

    Output: (replicate, n_drawn, mean_q6) — EXACTLY ``replicates`` rows:
    a replicate whose every row drew weight 0 (possible only for tiny
    inputs — at n rows the probability is e^-n per replicate) still
    appears, with n_drawn=0 and NULL mean_q6, via a left join against
    the explicit 0..B-1 replicate spine, so downstream percentile CIs
    over the sorted means always rank against B known rows. Feed the
    sorted means' order statistics downstream for a percentile CI
    (exact ranks, engine-stable).
    """
    cums = F.array(*[F.lit(c) for c in _POIS1_CUM])
    key = F.concat_ws(",", *[F.col(k).cast("string") for k in key_columns])
    v = F.col(value_column).cast("decimal(28,6)")

    def u_of(b):
        # one md5 per (row, replicate); the inverse-CDF scan reuses it
        h32 = F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("__k"), b.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        return (h32.cast("double") + F.lit(0.5)) / F.lit(float(2**32))

    with_u = F.transform(
        F.sequence(F.lit(0), F.lit(replicates - 1)),
        lambda b: F.struct(b.alias("replicate"), u_of(b).alias("u")),
    )
    with_w = F.transform(
        with_u,
        lambda s: F.struct(
            s["replicate"].alias("replicate"),
            F.size(F.filter(cums, lambda c: s["u"] >= c)).alias("w"),
        ),
    )
    pairs = (
        df.select(key.alias("__k"), v.alias("__v"))
        .filter(F.col("__v").isNotNull())
        .select("__v", F.explode(with_w).alias("__e"))
        .select("__v", "__e.replicate", "__e.w")
        .filter(F.col("w") > 0)
    )
    agg = pairs.groupBy("replicate").agg(
        F.sum("w").cast("long").alias("n_drawn"),
        F.sum(F.col("__v") * F.col("w").cast("decimal(10,0)")).alias("__s"),
    )
    # Left-join onto the explicit replicate spine (B rows, broadcastable
    # by construction) so all-zero-weight replicates surface as
    # n_drawn=0 / NULL mean rather than vanishing.
    spine = df.sparkSession.range(replicates).select(
        F.col("id").cast("long").alias("replicate")
    )
    joined = spine.join(
        agg.withColumnRenamed("replicate", "__rb"),
        spine["replicate"] == F.col("__rb"),
        "left",
    )
    return joined.select(
        "replicate",
        F.coalesce(F.col("n_drawn"), F.lit(0).cast("long")).alias("n_drawn"),
        F.when(
            F.col("n_drawn") > 0,
            F.floor(
                F.col("__s").cast("double") / F.col("n_drawn").cast("double")
                * F.lit(1e6)
                + F.lit(0.5)
            ).cast("long"),
        ).alias("mean_q6"),
    )


def sign_flip_test(
    df: DataFrame,
    *,
    diff_column: Column | str,
    key_columns: Sequence[str],
    permutations: int = 200,
    diff_decimals: int = 6,
) -> DataFrame:
    """Paired sign-flip permutation test of ``mean(d) = 0`` — the EXACT
    paired-permutation scheme (flipping each pair's sign independently
    enumerates the full permutation group for paired designs; Monte
    Carlo over ``permutations`` draws with the Davison–Hinkley add-one
    p-value). THE deterministic significance test for "do two models /
    two token counters / two scorers disagree systematically on the
    same items?" — :func:`poisson_bootstrap_means`'s hypothesis-testing
    sibling, same one-pass construction.

    Determinism and scale: per (row, flip) the sign is content-addressed
    (``md5(key:b:sf)``'s low bit → ±1 — identical on any engine, rerun,
    or partitioning); ``d`` is quantized ``floor(d·1e6+0.5)`` BIGINT
    (floor is toward −inf on both engines, so negative diffs agree),
    and every statistic is an order-free exact DECIMAL sum. ONE corpus
    pass, ONE map-side-combined exchange to ``permutations`` rows, one
    bounded final aggregate: the observed statistic rides along as a
    per-flip sum (Σd is flip-independent), so no second scan. Bound:
    ``|Σ d_x6|`` must fit BIGINT for the output column (~9e18 — beyond
    any labeled eval set).

    Output one row: (n_pairs, permutations, obs_sum_x6, n_as_extreme,
    p_q6) — ``p_q6 = ((n_extreme+1)·1e6) DIV (B+1)``; small p ⇒ the
    mean difference is not sign-flip noise.
    """
    d = (
        F.col(diff_column) if isinstance(diff_column, str) else diff_column
    )
    dx = F.floor(
        d.cast("double") * F.lit(float(10 ** diff_decimals)) + F.lit(0.5)
    ).cast("long")
    key = F.concat_ws(",", *[F.col(k).cast("string") for k in key_columns])
    base = df.select(key.alias("__k"), dx.alias("__d")).filter(
        F.col("__d").isNotNull()
    )

    def sign_of(b):
        h32 = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(":", F.col("__k"), b.cast("string"),
                                F.lit("sf"))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        return (h32 % 2) * 2 - 1

    flips = F.transform(
        F.sequence(F.lit(0), F.lit(permutations - 1)),
        lambda b: F.struct(
            b.alias("b"), sign_of(b).cast("long").alias("s")
        ),
    )
    pairs = base.select("__d", F.explode(flips).alias("__e")).select(
        "__d", "__e.b", "__e.s"
    )
    per_b = pairs.groupBy("b").agg(
        F.count(F.lit(1)).cast("long").alias("__nb"),
        F.sum((F.col("__d") * F.col("s")).cast("decimal(28,0)")).alias(
            "__stat"
        ),
        F.sum(F.col("__d").cast("decimal(28,0)")).alias("__obs"),
    )
    out = per_b.agg(
        F.first("__nb").alias("__n"),
        F.first("__obs").alias("__o"),
        F.sum(
            F.when(F.abs(F.col("__stat")) >= F.abs(F.col("__obs")), 1)
            .otherwise(0)
        ).alias("__ext"),
    )
    return out.select(
        F.coalesce(F.col("__n"), F.lit(0)).cast("long").alias("n_pairs"),
        F.lit(permutations).cast("long").alias("permutations"),
        F.col("__o").cast("long").alias("obs_sum_x6"),
        F.coalesce(F.col("__ext"), F.lit(0)).cast("long").alias(
            "n_as_extreme"
        ),
        F.expr(
            f"((coalesce(__ext, 0) + 1) * 1000000L)"
            f" DIV {permutations + 1}"
        ).alias("p_q6"),
    )


def rolling_origin_folds(
    df: DataFrame,
    time_column: str,
    *,
    n_folds: int = 5,
    unit_column: str | None = None,
) -> DataFrame:
    """Rolling-origin (expanding-window) cross-validation folds for
    time-series models (Tashman, IJF 2000's rolling-origin evaluation —
    the standard answer to "random K-fold leaks the future"): the time
    range splits into ``n_folds + 1`` equal segments; fold i trains on
    everything BEFORE segment i and tests ON segment i, so every fold's
    train/test boundary moves forward and no test row precedes a train
    row.

    Segment assignment is EXACT INTEGER arithmetic on epoch
    microseconds — ``seg = ((t − t_min)·(n_folds+1)) DIV
    (t_max − t_min + 1)`` — so membership is reproducible on any
    engine (the same construction as the md5 split: a pure function of
    the row, no sampling state). Reports per fold: train/test row
    counts, the test window's inclusive bounds, and — when
    ``unit_column`` is given — how many test-window units were already
    seen in training (``seen_units``): for user-level models that
    number is the *entity overlap* a grouped split would eliminate
    (:func:`assign_split` / leakage_free_split), NOT an error — rolling
    origin deliberately scores warm-start entities; the census makes
    the warm/cold mix visible.

    Plan: one 1-row min/max aggregate broadcast back; one segment
    census (n_folds+1 rows) with a census-bounded cumulative window
    for the expanding train counts; the unit overlap adds one distinct
    aggregate on (unit, segment) and a per-unit first-segment reduce —
    all map-side combined, no data-sized window or collect.

    Output per fold (1..n_folds): (fold, train_rows, test_rows,
    test_start_us, test_end_us[, seen_units, test_units]); a fold whose
    test window holds no rows at all (a pathological time gap) is
    omitted rather than fabricated.
    """
    if n_folds < 1:
        raise ValueError(f"n_folds must be >= 1, got {n_folds}")
    segs = n_folds + 1
    t = df.select(
        F.unix_micros(F.col(time_column).cast("timestamp")).alias("__t"),
        *([F.col(unit_column).alias("__u")] if unit_column else []),
    ).filter(F.col("__t").isNotNull())
    bounds = t.agg(
        F.min("__t").alias("__lo"), F.max("__t").alias("__hi")
    )
    seg_expr = F.expr(
        f"((__t - __lo) * {segs}) DIV (__hi - __lo + 1)"
    ).cast("int")
    with_seg = t.crossJoin(F.broadcast(bounds)).select(
        seg_expr.alias("__seg"),
        F.col("__t"),
        *([F.col("__u")] if unit_column else []),
    )
    census = with_seg.groupBy("__seg").agg(
        F.count(F.lit(1)).alias("__rows"),
        F.min("__t").alias("__smin"),
        F.max("__t").alias("__smax"),
    )
    from pyspark.sql import Window

    w = (
        Window.orderBy("__seg")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # census-bounded (n_folds+1 rows) cumulative — train = rows BEFORE
    # the test segment, so shift the running sum by the own row
    cum = census.select(
        F.col("__seg"),
        (F.sum("__rows").over(w) - F.col("__rows")).alias("train_rows"),
        F.col("__rows").alias("test_rows"),
        F.col("__smin").alias("test_start_us"),
        F.col("__smax").alias("test_end_us"),
    ).filter(F.col("__seg") >= 1)
    out = cum.select(
        F.col("__seg").cast("int").alias("fold"),
        "train_rows",
        "test_rows",
        "test_start_us",
        "test_end_us",
    )
    if unit_column is None:
        return out
    # unit overlap: a unit is "seen" in fold i when its FIRST segment
    # precedes i and it appears in segment i
    us = with_seg.select("__seg", "__u").distinct()
    per_unit = us.groupBy("__u").agg(
        F.min("__seg").alias("__first"),
        F.collect_set("__seg").alias("__segs"),
    )
    seen = (
        per_unit.select(
            F.explode("__segs").alias("__seg"), F.col("__first")
        )
        .filter(F.col("__seg") >= 1)
        .groupBy("__seg")
        .agg(
            F.count(F.lit(1)).alias("test_units"),
            F.sum(
                F.when(F.col("__first") < F.col("__seg"), 1).otherwise(0)
            ).alias("seen_units"),
        )
    )
    return out.join(
        seen.select(
            F.col("__seg").cast("int").alias("fold"),
            "seen_units",
            "test_units",
        ),
        "fold",
        "left",
    )


def importance_weight_ess(
    weights: DataFrame,
    *,
    weight_column: str = "log_weight",
) -> DataFrame:
    """Effective sample size of an importance-weighted corpus (Kong
    1992's ESS = (Σw)²/Σw²; Kish's design-effect form — public
    construction): the diagnostic every importance-resampling step
    should publish next to its output. Weights arrive in LOG space
    (:func:`dsir_importance_weights`'s column); a tiny ESS ratio means
    a few documents dominate the target-matched distribution and the
    resample of ``dsir_gumbel_select`` is effectively drawing from a
    handful of docs — raise the bucket count, soften the target, or
    cap weights before trusting the selection.

    Determinism: weights are exact DECIMAL; the max-shift ``e_i =
    exp(lw_i − max lw)`` is the standard overflow guard and the ONE
    libm call per row, floor-quantized to 1e-12 (q12 integers ≤ 1e12);
    both moment sums are exact DECIMAL(38,0); the final ratios are
    fixed-order doubles quantized on output. The Σe² DECIMAL envelope
    holds to ~1e14 docs.

    Plan: one 1-row max/count broadcast, one scan computing e, one
    map-side-combined moment aggregate — two corpus passes, no
    windows, no data-sized state.

    Output one row: (n_docs, ess_q6, ess_ratio_ppm). NULL weights are
    dropped BEFORE counting (ADVICE r9: counting them in ``n_docs``
    while they vanish from the moment sums deflated ``ess_ratio_ppm``;
    sibling operators filter NULLs first).
    """
    weights = weights.filter(F.col(weight_column).isNotNull())
    m = weights.agg(
        F.max(F.col(weight_column)).alias("__m"),
    )
    e = weights.crossJoin(F.broadcast(m)).select(
        F.floor(
            F.exp((F.col(weight_column) - F.col("__m")).cast("double"))
            * F.lit(1e12)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("__e")
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = e.agg(
        F.count(F.lit(1)).alias("__n"),
        F.coalesce(F.sum(d38(F.col("__e"))), F.lit(0)).alias("__se"),
        F.coalesce(
            F.sum(d38(F.col("__e")) * F.col("__e")), F.lit(0)
        ).alias("__se2"),
    )
    sed = F.col("__se").cast("double")
    se2d = F.col("__se2").cast("double")
    ess = F.try_divide(sed * sed, se2d)
    return s.select(
        F.col("__n").cast("long").alias("n_docs"),
        F.when(
            F.col("__n") > 0, F.floor(ess * F.lit(1e6) + F.lit(0.5))
        )
        .cast("long")
        .alias("ess_q6"),
        F.when(
            F.col("__n") > 0,
            F.floor(
                F.try_divide(ess, F.col("__n").cast("double"))
                * F.lit(1e6)
                + F.lit(0.5)
            ),
        )
        .cast("long")
        .alias("ess_ratio_ppm"),
    )
