"""Deterministic sampling / splitting / embedding post-processing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_playground_spark.operators import sampling as sp


def test_sample_is_deterministic_and_proportional(spark):
    df = spark.range(10_000).select(F.col("id").alias("k"))
    s1 = sp.deterministic_sample(df, ["k"], fraction=0.2)
    s2 = sp.deterministic_sample(df.repartition(13), ["k"], fraction=0.2)
    n1, n2 = s1.count(), s2.count()
    assert n1 == n2  # stable under repartitioning
    assert abs(n1 / 10_000 - 0.2) < 0.02
    # nested property: a 10% sample is a subset of the 20% sample
    s_small = sp.deterministic_sample(df, ["k"], fraction=0.1)
    assert s_small.join(s1, "k", "left_anti").count() == 0


def test_split_partitions_every_row_once(spark):
    df = spark.range(5_000).select(F.col("id").alias("k"))
    out = sp.assign_split(df, ["k"])
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert sum(counts.values()) == 5_000
    assert abs(counts["train"] / 5_000 - 0.8) < 0.03
    assert set(counts) == {"train", "val", "test"}
    with pytest.raises(ValueError):
        sp.assign_split(df, ["k"], splits={"a": 0.5, "b": 0.6})


def test_normalize_and_quantize(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0])], "vec_id int, embedding array<float>"
    )
    out = df.select(
        "vec_id",
        sp.l2_normalize_expr(F.col("embedding")).alias("nv"),
        sp.quantize_int8_expr(sp.l2_normalize_expr(F.col("embedding"))).alias("q"),
    ).collect()
    by = {r["vec_id"]: r for r in out}
    assert by[1]["nv"] == pytest.approx([0.6, 0.8])
    assert by[1]["q"] == [76, 102]  # round(0.6*127), round(0.8*127)
    assert by[2]["nv"] == [0.0, 0.0] and by[2]["q"] == [0, 0]


def test_sample_k_per_group_exact_and_stable(spark):
    from pyspark_playground_spark.operators import sampling as sp
    df = spark.range(200).select(
        (F.col("id") % 7).alias("g"), F.col("id").alias("k")
    )
    out = sp.sample_k_per_group(df, "g", ["k"], k=10)
    counts = {r["g"]: r["n"] for r in
              out.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {g: 10 for g in range(7)}
    # small stratum: keeps all of it
    tiny = sp.sample_k_per_group(df.where("k < 3"), "g", ["k"], k=10)
    assert tiny.count() == 3
    # deterministic under repartitioning
    a = {(r["g"], r["k"]) for r in out.collect()}
    b = {(r["g"], r["k"]) for r in
         sp.sample_k_per_group(df.repartition(13), "g", ["k"], k=10).collect()}
    assert a == b


def test_weighted_sample_respects_group_fractions(spark):
    from pyspark_playground_spark.operators import sampling as sp
    from pyspark.sql import functions as F

    rows = [(i, "keep_all" if i % 3 == 0 else ("half" if i % 3 == 1 else "rest"))
            for i in range(3000)]
    df = spark.createDataFrame(rows, "k int, grp string")
    out = sp.weighted_sample(
        df, ["k"], group_column="grp",
        weights={"keep_all": 1.0, "half": 0.5}, default=0.1,
    )
    counts = {r["grp"]: r["n"] for r in
              out.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["keep_all"] == 1000          # fraction 1.0 keeps everything
    assert 400 < counts.get("half", 0) < 600   # ~50%
    assert 50 < counts.get("rest", 0) < 150    # ~10%
    # deterministic: rerun yields the identical membership
    again = sp.weighted_sample(
        df, ["k"], group_column="grp",
        weights={"keep_all": 1.0, "half": 0.5}, default=0.1,
    )
    assert out.exceptAll(again).count() == 0 and again.exceptAll(out).count() == 0


def test_standardize_embeddings_zero_mean_unit_var(spark):
    from pyspark_playground_spark.operators import sampling as sp
    from pyspark.sql import functions as F

    rows = [(i, [float(i), 10.0 * i + 1.0]) for i in range(1, 9)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    z = sp.standardize_embeddings(df)
    stats = z.select(F.posexplode("z").alias("dim", "v")).groupBy("dim").agg(
        F.avg("v").alias("mu"), F.stddev_pop("v").alias("sd")
    ).collect()
    for r in stats:
        assert abs(r["mu"]) < 1e-9 and abs(r["sd"] - 1.0) < 1e-9


def test_rebalance_mixture_hits_target_proportions(spark):
    from pyspark.sql import functions as F

    from pyspark_playground_spark.operators.sampling import rebalance_mixture

    # 6000 a / 3000 b / 1000 c; target 50/25/25 → c binds (1000/0.25=4000
    # scale): keep a≈2000, b≈1000, c=1000
    rows = (
        [(i, "a") for i in range(6000)]
        + [(10_000 + i, "b") for i in range(3000)]
        + [(20_000 + i, "c") for i in range(1000)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "grp"])
    out = rebalance_mixture(
        df, ["doc_id"], group_column="grp",
        target_ppm={"a": 500_000, "b": 250_000, "c": 250_000},
    )
    got = {r["grp"]: r["n"] for r in
           out.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()}
    # binding group keeps everything
    assert got["c"] == 1000
    # others land within hash-bucket granularity of the target
    assert abs(got["a"] - 2000) < 100
    assert abs(got["b"] - 1000) < 60
    # deterministic: same call → same membership
    again = rebalance_mixture(
        df, ["doc_id"], group_column="grp",
        target_ppm={"a": 500_000, "b": 250_000, "c": 250_000},
    )
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_rebalance_mixture_drops_unlisted_groups(spark):
    from pyspark_playground_spark.operators.sampling import rebalance_mixture

    df = spark.createDataFrame(
        [(1, "keep"), (2, "keep"), (3, "drop")], ["doc_id", "grp"]
    )
    out = rebalance_mixture(
        df, ["doc_id"], group_column="grp", target_ppm={"keep": 1_000_000}
    )
    assert {r.grp for r in out.collect()} == {"keep"}


def test_weighted_order_sample_matches_bruteforce(spark):
    """A-ES selection reproduces an independent Python computation of the
    same deterministic draw, and output size is exactly k."""
    import hashlib
    import math

    rows = [(i, (i % 7) + 1) for i in range(1, 201)]
    df = spark.createDataFrame(rows, "doc_id int, w int")
    got = sorted(
        r["doc_id"]
        for r in sp.weighted_order_sample(
            df, k=25, weight_column="w", id_column="doc_id"
        ).collect()
    )

    def key(i, w):
        h13 = int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16)
        u = (h13 + 0.5) / 16**13
        return round(math.log(u) / w, 9)

    expect = sorted(
        i for i, _ in sorted(rows, key=lambda r: (-key(*r), r[0]))[:25]
    )
    assert got == expect and len(got) == 25


def test_weighted_order_sample_prefers_heavy_weights(spark):
    """Across many ids, heavy-weight rows win far more often than light."""
    rows = [(i, 100 if i % 2 == 0 else 1) for i in range(1, 2001)]
    df = spark.createDataFrame(rows, "doc_id int, w int")
    got = sp.weighted_order_sample(
        df, k=200, weight_column="w", id_column="doc_id"
    ).collect()
    heavy = sum(1 for r in got if r["w"] == 100)
    assert heavy > 180  # ~99% expected; allow slack


def test_leakage_free_split_keeps_groups_together(spark):
    """Splitting on a group key sends every member of a group to the same
    split (the dedup-aware eval-leakage guard)."""
    df = spark.createDataFrame(
        [(i, i % 50) for i in range(500)], "doc_id int, cluster_id int"
    )
    out = sp.assign_split(df, ["cluster_id"])
    per_group = out.groupBy("cluster_id").agg(
        F.countDistinct("split").alias("n_splits")
    )
    assert per_group.filter(F.col("n_splits") > 1).count() == 0
    assert out.select("split").distinct().count() > 1


def test_temperature_shares_properties(spark):
    """alpha=0 -> uniform; alpha=1 -> proportional; alpha=0.5 between."""
    df = spark.createDataFrame(
        [("big",)] * 90 + [("small",)] * 10, "g string"
    )
    uni = {r["g"]: r["share_ppm"] for r in sp.temperature_shares(
        df, group_column="g", alpha=0.0).collect()}
    prop = {r["g"]: r["share_ppm"] for r in sp.temperature_shares(
        df, group_column="g", alpha=1.0).collect()}
    mid = {r["g"]: r["share_ppm"] for r in sp.temperature_shares(
        df, group_column="g", alpha=0.5).collect()}
    assert uni["big"] == uni["small"] == 500_000
    assert prop["big"] == 900_000 and prop["small"] == 100_000
    assert 100_000 < mid["small"] < 500_000 < mid["big"] < 900_000
    assert mid["big"] + mid["small"] >= 999_998  # floor loss only


def test_rank_normalize_wide_group_no_overflow(spark):
    """Groups beyond ~2147 rows used to overflow int32 in the ppm
    arithmetic under ANSI mode (caught by the 10x probe); pinned here."""
    df = spark.createDataFrame(
        [(i, "g", i) for i in range(3000)], "doc_id int, g string, v int"
    )
    out = sp.rank_normalize(df, group_column="g", value_column="v")
    rows = out.orderBy("doc_id").collect()
    assert rows[0]["pct_ppm"] == 0 and rows[-1]["pct_ppm"] == 1_000_000


def test_dsir_weights_favor_target_like_documents(spark):
    # target slice speaks "alpha beta"; the pool also contains "gamma
    # delta" documents — DSIR must score alpha/beta docs higher
    rows = (
        [(i, "alpha beta alpha beta", "tgt") for i in range(20)]
        + [(i + 20, "gamma delta gamma delta", "bg") for i in range(20)]
        + [(40, "alpha beta alpha beta", "bg"), (41, "gamma delta", "tgt")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, grp string")
    w = sp.dsir_importance_weights(
        df, F.col("grp") == "tgt", id_column="doc_id", buckets=256
    )
    got = {r["doc_id"]: float(r["log_weight"]) for r in w.collect()}
    # the bg doc that LOOKS like the target outranks every true-bg doc
    assert got[40] > got[20]
    # a target-slice doc speaking bg language scores like bg docs do
    assert got[41] < got[0]
    # repartitioning must not change a single weight (decimal determinism)
    w2 = sp.dsir_importance_weights(
        df.repartition(7), F.col("grp") == "tgt", id_column="doc_id", buckets=256
    )
    assert {r["doc_id"]: float(r["log_weight"]) for r in w2.collect()} == got


def test_dsir_gumbel_select_is_reproducible_topk(spark):
    df = spark.createDataFrame(
        [(i, "alpha beta" if i % 3 == 0 else "gamma delta", i % 3 == 0)
         for i in range(60)],
        "doc_id long, text string, is_t boolean",
    )
    w = sp.dsir_importance_weights(df, F.col("is_t"), buckets=128)
    pick1 = [r["doc_id"] for r in sp.dsir_gumbel_select(w, k=10).collect()]
    pick2 = [r["doc_id"] for r in sp.dsir_gumbel_select(
        w.repartition(5), k=10).collect()]
    assert pick1 == pick2 and len(pick1) == 10
    # plan guard: top-k is TakeOrdered, never a global sort
    plan = sp.dsir_gumbel_select(w, k=10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_dsir_model_join_is_broadcast(spark):
    df = spark.createDataFrame(
        [(i, "alpha beta gamma", i % 2 == 0) for i in range(50)],
        "doc_id long, text string, is_t boolean",
    )
    w = sp.dsir_importance_weights(df, F.col("is_t"), buckets=64)
    plan = w._jdf.queryExecution().executedPlan().toString()
    # the bounded bucket model must ride a broadcast join back onto the
    # token stream — a shuffle join here would re-shuffle the whole corpus
    assert "BroadcastHashJoin" in plan


def test_poisson_bootstrap_means_deterministic_and_sane(spark):
    """32 replicates over 500 constant-ish values: every replicate mean
    sits inside the value range, replicate sizes concentrate at
    n ± O(sqrt n), a rerun (and a different partitioning) reproduces
    the exact rows, and a constant column yields the constant mean."""
    from pyspark_playground_spark.operators.sampling import (
        poisson_bootstrap_means,
    )

    df = spark.range(500).select(
        F.col("id"), (F.col("id") % 100).cast("double").alias("v")
    )
    out = poisson_bootstrap_means(
        df, value_column="v", key_columns=["id"], replicates=32
    ).collect()
    assert len(out) == 32
    for r in out:
        assert 300 <= r["n_drawn"] <= 700  # n=500, sd ~ 22
        assert 0 <= r["mean_q6"] <= 99_000_000
    rerun = poisson_bootstrap_means(
        df.repartition(7), value_column="v", key_columns=["id"],
        replicates=32,
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, rerun))

    const = spark.range(200).select("id", F.lit(7.0).alias("v"))
    cm = poisson_bootstrap_means(
        const, value_column="v", key_columns=["id"], replicates=8
    ).collect()
    assert all(r["mean_q6"] == 7_000_000 for r in cm)


def test_poisson_bootstrap_exact_weights_hand_computed(spark):
    """Two rows (keys '7' value 10, '11' value 30), 4 replicates: the
    md5-derived Poisson(1) weights are w(7,b)=[2,1,1,0] and
    w(11,b)=[1,0,1,0] (hand-computed from the shared inverse-CDF
    constants), so the replicate means are exactly
    b0: (2*10+1*30)/3, b1: 10/1, b2: (10+30)/2; b3 draws nothing and
    still emits its spine row with n_drawn=0 / NULL mean, so the
    output has EXACTLY `replicates` rows for downstream rank math."""
    from pyspark_playground_spark.operators.sampling import (
        poisson_bootstrap_means,
    )

    df = spark.createDataFrame(
        [(7, 10.0), (11, 30.0)], "id int, v double"
    )
    out = {r["replicate"]: r for r in poisson_bootstrap_means(
        df, value_column="v", key_columns=["id"], replicates=4
    ).collect()}
    assert set(out) == {0, 1, 2, 3}  # all 4 replicates present
    assert (out[0]["n_drawn"], out[0]["mean_q6"]) == (3, 16_666_667)
    assert (out[1]["n_drawn"], out[1]["mean_q6"]) == (1, 10_000_000)
    assert (out[2]["n_drawn"], out[2]["mean_q6"]) == (2, 20_000_000)
    # replicate 3 drew zero rows: spine row with no mean
    assert (out[3]["n_drawn"], out[3]["mean_q6"]) == (0, None)


def test_sign_flip_test_model_equivalence(spark):
    """The Spark statistic equals a pure-Python mirror of the
    content-addressed sign flips (md5 low bit), including n_as_extreme
    and the add-one Monte-Carlo p; a strong consistent signal yields the
    minimum p = 1e6 DIV (B+1); the all-zero diff is maximally
    insignificant (p = 1e6)."""
    import hashlib

    from pyspark_playground_spark.operators.sampling import sign_flip_test
    from pyspark.sql import functions as F

    n, B = 60, 49
    df = spark.createDataFrame(
        [(i, 1.0 + (i % 3)) for i in range(n)], "id int, v double"
    )
    r = sign_flip_test(
        df, diff_column="v", key_columns=["id"], permutations=B
    ).collect()[0]

    def sgn(k, b):
        h = hashlib.md5(f"{k}:{b}:sf".encode()).hexdigest()
        return (int(h[:8], 16) % 2) * 2 - 1

    ds = {str(i): int(round((1.0 + (i % 3)) * 1e6)) for i in range(n)}
    obs = sum(ds.values())
    stats = [sum(s * sgn(k, b) for k, s in ds.items()) for b in range(B)]
    n_ext = sum(1 for s in stats if abs(s) >= abs(obs))
    assert r["n_pairs"] == n
    assert r["obs_sum_x6"] == obs
    assert r["n_as_extreme"] == n_ext
    assert r["p_q6"] == ((n_ext + 1) * 1_000_000) // (B + 1)
    # a uniformly positive diff of this size is never matched by flips
    assert n_ext == 0 and r["p_q6"] == 1_000_000 // (B + 1)

    # all-zero diffs: every flip ties the observed 0 -> p = 1
    z = spark.createDataFrame([(i, 0.0) for i in range(10)],
                              "id int, v double")
    rz = sign_flip_test(
        z, diff_column="v", key_columns=["id"], permutations=9
    ).collect()[0]
    assert rz["p_q6"] == 1_000_000

    # partitioning-invariant (content-addressed)
    r2 = sign_flip_test(
        df.repartition(7), diff_column="v", key_columns=["id"],
        permutations=B,
    ).collect()[0]
    assert tuple(r2) == tuple(r)


def test_rolling_origin_folds_hand_computed(spark):
    """12 hourly points, 3 folds -> 4 equal segments of 3 rows; exact
    expanding train counts, forward-only boundaries, and the warm-start
    unit census; n_folds<1 refused; unit-less variant drops the census
    columns."""
    import datetime as dt

    import pytest

    from pyspark_playground_spark.operators.sampling import (
        rolling_origin_folds,
    )

    t0 = dt.datetime(2024, 1, 1)
    # users: u0 appears in segments 0,1,2,3; u1 only in segment 2;
    # u2 in segments 0 and 3
    rows = []
    users = {0: "u0", 1: "u0", 2: "u2",      # seg 0
             3: "u0", 4: "u0", 5: "u0",      # seg 1
             6: "u1", 7: "u1", 8: "u0",      # seg 2
             9: "u2", 10: "u0", 11: "u0"}    # seg 3
    for h, u in users.items():
        rows.append((t0 + dt.timedelta(hours=h), u))
    df = spark.createDataFrame(rows, "ts timestamp, u string")
    out = {r["fold"]: r for r in rolling_origin_folds(
        df, "ts", n_folds=3, unit_column="u").collect()}
    assert sorted(out) == [1, 2, 3]
    for f in (1, 2, 3):
        assert out[f]["train_rows"] == 3 * f
        assert out[f]["test_rows"] == 3
    # forward-only: each test window starts after the previous ends
    assert out[1]["test_end_us"] < out[2]["test_start_us"]
    assert out[2]["test_end_us"] < out[3]["test_start_us"]
    # warm-start census: fold 1 tests {u0} (seen); fold 2 tests
    # {u0 seen, u1 cold}; fold 3 tests {u0 seen, u2 seen-from-seg-0}
    assert (out[1]["test_units"], out[1]["seen_units"]) == (1, 1)
    assert (out[2]["test_units"], out[2]["seen_units"]) == (2, 1)
    assert (out[3]["test_units"], out[3]["seen_units"]) == (2, 2)

    # unit-less variant: same fold arithmetic, no census columns
    slim = rolling_origin_folds(df, "ts", n_folds=3)
    assert slim.columns == [
        "fold", "train_rows", "test_rows", "test_start_us", "test_end_us"
    ]
    assert {r["fold"]: r["train_rows"] for r in slim.collect()} == {
        1: 3, 2: 6, 3: 9
    }

    with pytest.raises(ValueError, match="n_folds"):
        rolling_origin_folds(df, "ts", n_folds=0)


def test_importance_weight_ess_mirror(spark):
    """Closed-form pins: equal weights give ESS = n exactly (ratio
    1e6); one dominant weight collapses ESS toward 1; a python mirror
    pins the quantized value on a mixed fixture; empty input refuses."""
    import math

    from pyspark_playground_spark.operators.sampling import (
        importance_weight_ess,
    )

    def run(logws):
        df = spark.createDataFrame(
            [(i, w) for i, w in enumerate(logws)],
            "doc_id bigint, lw double",
        ).select("doc_id", F.col("lw").cast("decimal(28,9)").alias(
            "log_weight"))
        return importance_weight_ess(df).collect()[0]

    eq = run([0.5] * 8)
    assert eq["n_docs"] == 8
    assert eq["ess_q6"] == 8_000_000 and eq["ess_ratio_ppm"] == 1_000_000

    dom = run([20.0, 0.0, 0.0, 0.0])
    assert dom["ess_q6"] < 1_100_000  # collapsed onto the big weight

    mixed = [0.0, 1.0, 2.0, -1.0, 0.5]
    r = run(mixed)
    m = max(mixed)
    es = [math.floor(math.exp(w - m) * 1e12 + 0.5) for w in mixed]
    ess = (sum(es) ** 2) / sum(e * e for e in es)
    assert r["ess_q6"] == math.floor(ess * 1e6 + 0.5)
    assert r["ess_ratio_ppm"] == math.floor(ess / len(mixed) * 1e6 + 0.5)

    # NULL weights drop from BOTH n_docs and the moments (ADVICE r9:
    # counting them deflated ess_ratio_ppm) — result identical to the
    # same fixture with the NULL rows absent
    withnull = run([0.5] * 8 + [None, None])
    assert withnull["n_docs"] == 8
    assert withnull["ess_q6"] == 8_000_000
    assert withnull["ess_ratio_ppm"] == 1_000_000

    empty = run([])
    assert empty["n_docs"] == 0 and empty["ess_q6"] is None

    allnull = run([None, None])
    assert allnull["n_docs"] == 0 and allnull["ess_q6"] is None
