"""Property-based invariants for the round-9 statistical operators
(hypothesis): structural guarantees that must hold on ANY input, not
just the hand fixtures —

- Markov attribution: knockout probabilities never exceed the full
  chain's, removal effects live in [0, 1], shares sum to ~1;
- mSPRT: swapping the arms flips the estimate's sign EXACTLY and
  leaves the always-valid p bit-identical (|Y| and V are symmetric);
- permutation test: p respects the add-one floor 1/(B+1) and the
  extreme count stays within [0, B];
- Hodges-Lehmann: the estimate lies between the extreme pairwise
  differences and is exactly shift-equivariant;
- Aalen-Johansen: both CIFs are monotone and CIF1+CIF2+S reconciles
  to the 1e9 scale within the documented div-rounding envelope.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

T0 = dt.datetime(2026, 3, 1)


@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.lists(
    st.tuples(st.integers(1, 6), st.integers(0, 40),
              st.sampled_from(["view", "click", "signup", "purchase"])),
    min_size=4, max_size=25, unique_by=lambda r: (r[0], r[1]),
))
def test_markov_attribution_bounds(spark, data):
    from pyspark_playground_spark.operators.funnel import (
        markov_attribution,
    )

    rows = [(u, T0 + dt.timedelta(hours=h), t) for u, h, t in data]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string"
    )
    out = markov_attribution(df).collect()
    shares = []
    for r in out:
        assert r["p_conv_without_q9"] is not None
        assert 0 <= r["p_conv_without_q9"] <= r["p_conv_q9"] <= 10**9
        if r["removal_effect_q6"] is not None:
            assert 0 <= r["removal_effect_q6"] <= 10**6
        if r["attribution_q6"] is not None:
            shares.append(r["attribution_q6"])
    if shares:
        assert 10**6 - len(shares) <= sum(shares) <= 10**6


@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.lists(
    st.tuples(st.floats(-50, 50, allow_nan=False), st.booleans()),
    min_size=6, max_size=40,
).filter(lambda d: any(t for _, t in d) and any(not t for _, t in d)))
def test_msprt_arm_swap_symmetry(spark, data):
    from pyspark.sql import functions as F

    from pyspark_playground_spark.operators.profiling import (
        msprt_mean_test,
    )

    df = spark.createDataFrame(data, "y double, t boolean")
    a = msprt_mean_test(
        df, metric_column="y", cohort_column="t", tau=3.0
    ).collect()[0]
    b = msprt_mean_test(
        df, metric_column="y", cohort_column=~F.col("t"), tau=3.0
    ).collect()[0]
    assert (a["n_ctrl"], a["n_treat"]) == (b["n_treat"], b["n_ctrl"])
    if a["p_q6"] is not None:
        assert 0 <= a["p_q6"] <= 10**6
        # |Y| and V are arm-symmetric: p identical, diff sign flips
        assert a["p_q6"] == b["p_q6"]
        assert a["log_lambda_q6"] == b["log_lambda_q6"]
        assert abs(a["diff_q6"] + b["diff_q6"]) <= 1  # floor asymmetry


@settings(max_examples=3, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.lists(
    st.tuples(st.floats(0, 20, allow_nan=False), st.booleans()),
    min_size=4, max_size=25,
).filter(lambda d: any(t for _, t in d) and any(not t for _, t in d)))
def test_permutation_p_floor_and_extreme_bounds(spark, data):
    from pyspark_playground_spark.operators.profiling import (
        permutation_mean_test,
    )

    rows = [(i, y, t) for i, (y, t) in enumerate(data)]
    df = spark.createDataFrame(rows, "uid bigint, y double, t boolean")
    r = permutation_mean_test(
        df, unit_column="uid", metric_column="y", cohort_column="t",
        permutations=49,
    ).collect()[0]
    assert r["n_perms"] == 49
    assert 0 <= r["n_extreme"] <= 49
    assert (1 * 10**6) // 50 <= r["p_ppm"] <= 10**6


@settings(max_examples=3, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    a=st.lists(st.integers(0, 1000), min_size=1, max_size=15),
    b=st.lists(st.integers(0, 1000), min_size=1, max_size=15),
    shift=st.integers(-100, 100),
)
def test_hodges_lehmann_range_and_shift_equivariance(spark, a, b, shift):
    from pyspark_playground_spark.operators.profiling import (
        hodges_lehmann_shift,
    )

    def run(av, bv):
        rows = [("a", float(v)) for v in av] + [("b", float(v)) for v in bv]
        df = spark.createDataFrame(rows, "g string, v double")
        return hodges_lehmann_shift(
            df, value_column="v", group_column="g",
            group_a="a", group_b="b",
        ).collect()[0]["hl_shift_q6"]

    hl = run(a, b)
    lo = (min(a) - max(b)) * 10**6
    hi = (max(a) - min(b)) * 10**6
    assert lo <= hl <= hi
    assert run([v + shift for v in a], b) == hl + shift * 10**6


@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 2)),
    min_size=3, max_size=30,
).filter(lambda d: any(c > 0 for _, c in d)))
def test_cumulative_incidence_reconciles(spark, data):
    from pyspark_playground_spark.operators.survival import (
        cumulative_incidence,
    )

    df = spark.createDataFrame(data, "duration_hours long, cause int")
    rows = sorted(
        cumulative_incidence(df).collect(), key=lambda r: r["duration"]
    )
    if not rows:
        return
    prev1 = prev2 = 0
    for r in rows:
        assert r["cif1_q9"] >= prev1 and r["cif2_q9"] >= prev2
        prev1, prev2 = r["cif1_q9"], r["cif2_q9"]
    last = rows[-1]
    s_after = last["s_before_q9"] * (
        last["at_risk"] - last["d1"] - last["d2"]
    ) // last["at_risk"]
    total = last["cif1_q9"] + last["cif2_q9"] + s_after
    assert abs(total - 10**9) <= (len(rows) + 1) * 10
