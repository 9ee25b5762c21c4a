"""As-of join and range join: hand cases pinning tie/tolerance semantics,
a hypothesis sweep against pandas.merge_asof, and bin-replication checks."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pyspark_playground_spark.operators import temporal as tp


def _asof(spark, left, right, **kw):
    ldf = spark.createDataFrame(left, "k bigint, t bigint, lv string")
    rdf = spark.createDataFrame(right, "k bigint, t bigint, rv string")
    rows = tp.asof_join(ldf, rdf, "t", "k", **kw).collect()
    return {(r["k"], r["t"], r["lv"]): (r["t_right"], r["rv"]) for r in rows}


def test_backward_basic_and_exact_match(spark):
    left = [(1, 10, "a"), (1, 20, "b"), (2, 5, "c")]
    right = [(1, 10, "r10"), (1, 15, "r15"), (2, 9, "r9")]
    out = _asof(spark, left, right)
    assert out == {
        (1, 10, "a"): (10, "r10"),  # equal ts matches (at-or-before)
        (1, 20, "b"): (15, "r15"),
        (2, 5, "c"): (None, None),  # nothing at or before -> NULL, row kept
    }


def test_forward_and_nearest(spark):
    left = [(1, 10, "a"), (1, 14, "b")]
    right = [(1, 12, "r12"), (1, 15, "r15")]
    assert _asof(spark, left, right, direction="forward") == {
        (1, 10, "a"): (12, "r12"),
        (1, 14, "b"): (15, "r15"),
    }
    assert _asof(spark, left, right, direction="nearest") == {
        (1, 10, "a"): (12, "r12"),
        (1, 14, "b"): (15, "r15"),  # 14 is 2 from 12 and 1 from 15
    }
    # nearest tie (13 is 1 from both) prefers backward
    assert _asof(spark, [(1, 13, "x")], right, direction="nearest") == {
        (1, 13, "x"): (12, "r12"),
    }


def test_numeric_tolerance(spark):
    left = [(1, 100, "a"), (1, 200, "b")]
    right = [(1, 90, "r90"), (1, 199, "r199")]
    assert _asof(spark, left, right, tolerance=10) == {
        (1, 100, "a"): (90, "r90"),
        (1, 200, "b"): (199, "r199"),
    }
    assert _asof(spark, left, right, tolerance=5) == {
        (1, 100, "a"): (None, None),  # 10 > 5 -> gated out, row kept
        (1, 200, "b"): (199, "r199"),
    }


def test_timestamp_tolerance_and_suffix(spark):
    ldf = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "L")], "k bigint, t string, v string"
    ).withColumn("t", F.col("t").cast("timestamp"))
    rdf = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00", "R")], "k bigint, t string, v string"
    ).withColumn("t", F.col("t").cast("timestamp"))
    wide = tp.asof_join(ldf, rdf, "t", "k", tolerance="2 hours").collect()[0]
    assert wide["v"] == "L" and wide["v_right"] == "R"  # collision suffixed
    tight = tp.asof_join(ldf, rdf, "t", "k", tolerance="30 minutes").collect()[0]
    assert tight["v_right"] is None


def test_duplicate_right_ts_deterministic(spark):
    right = [(1, 10, "aaa"), (1, 10, "zzz")]
    out = _asof(spark, [(1, 11, "L")], right)
    assert out == {(1, 11, "L"): (10, "zzz")}  # max struct wins, stable


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    data=st.data(),
    direction=st.sampled_from(["backward", "forward", "nearest"]),
)
def test_matches_pandas_merge_asof(spark, data, direction):
    left = data.draw(st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 40)), min_size=1, max_size=25,
    ))
    right_keys = data.draw(st.sets(
        st.tuples(st.integers(0, 2), st.integers(0, 40)), min_size=1, max_size=25,
    ))
    left = [(k, t, f"l{i}") for i, (k, t) in enumerate(left)]
    right = [(k, t, f"r{k}_{t}") for k, t in sorted(right_keys)]  # unique (k,t)

    lpd = pd.DataFrame(left, columns=["k", "t", "lv"]).sort_values("t", kind="stable")
    rpd = pd.DataFrame(right, columns=["k", "t", "rv"]).sort_values("t", kind="stable")
    want_df = pd.merge_asof(lpd, rpd, on="t", by="k", direction=direction,
                            suffixes=("", "_right"))
    want = {
        (r.k, r.t, r.lv): r.rv if isinstance(r.rv, str) else None
        for r in want_df.itertuples()
    }
    got = {k: v[1] for k, v in _asof(spark, left, right, direction=direction).items()}
    assert got == want


def _rj(spark, points, intervals, **kw):
    p = spark.createDataFrame(points, "k bigint, p bigint, pid string")
    i = spark.createDataFrame(intervals, "k bigint, s bigint, e bigint, iid string")
    rows = tp.range_join(p, i, "p", "s", "e", "k", **kw).collect()
    return {(r["pid"], r["iid"]) for r in rows}


def test_range_join_bounds_and_bins(spark):
    points = [(1, 5, "p5"), (1, 10, "p10"), (1, 20, "p20"), (2, 5, "q5")]
    intervals = [(1, 5, 20, "iv1"), (1, 18, 25, "iv2"), (2, 0, 4, "iv3")]
    want = {("p5", "iv1"), ("p10", "iv1"), ("p20", "iv2")}  # p < e: 20 not in iv1
    assert _rj(spark, points, intervals) == want
    for bw in (1, 3, 7, 100):  # intervals spanning many/few bins agree
        assert _rj(spark, points, intervals, bin_width=bw) == want
    assert _rj(spark, points, intervals, include_end=True) == want | {("p20", "iv1")}


def test_range_join_timestamp_bins(spark):
    p = spark.createDataFrame(
        [(1, "2024-01-01 10:15:00", "a"), (1, "2024-01-01 13:00:00", "b")],
        "k bigint, ts string, pid string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    iv = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "2024-01-01 11:00:00", "w1")],
        "k bigint, s string, e string, iid string",
    ).withColumn("s", F.col("s").cast("timestamp")).withColumn(
        "e", F.col("e").cast("timestamp"))
    got = {(r["pid"], r["iid"])
           for r in tp.range_join(p, iv, "ts", "s", "e", "k", bin_width=900).collect()}
    assert got == {("a", "w1")}


# ---------------------------------------------------------------------------
# plan-shape guards: the whole point of these operators is their plan
# ---------------------------------------------------------------------------

def _plan(df):
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_asof_join_is_single_shuffle(spark):
    import re
    ldf = spark.range(100).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("t"), F.lit("l").alias("lv")
    )
    rdf = spark.range(100).select(
        (F.col("id") % 5).alias("k"), (F.col("id") * 2).alias("t"),
        F.lit("r").alias("rv"),
    )
    plan = _plan(tp.asof_join(ldf, rdf, "t", "k"))
    # union + one window pass: exactly ONE exchange, no join node at all
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    assert "Join" not in plan, plan


def test_range_join_binned_is_equi_join(spark):
    p = spark.range(1000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("p")
    )
    iv = spark.range(50).select(
        (F.col("id") % 7).alias("k"), (F.col("id") * 20).alias("s"),
        (F.col("id") * 20 + 15).alias("e"),
    )
    plan = _plan(tp.range_join(p, iv, "p", "s", "e", "k", bin_width=10))
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan, plan


def test_gap_fill_forward_and_none(spark):
    df = spark.createDataFrame(
        [(1, 0, 10.0), (1, 3, 30.0), (2, 5, 50.0)],
        "k bigint, t bigint, v double",
    ).withColumn("t", F.timestamp_seconds(F.col("t") * 3600))
    filled = tp.gap_fill(df, "t", "1 hour", "k").collect()
    by_kt = {(r["k"], r["t"].hour): r["v"] for r in filled}
    assert by_kt == {(1, 0): 10.0, (1, 1): 10.0, (1, 2): 10.0, (1, 3): 30.0,
                     (2, 5): 50.0}  # per-key bounds: no spine beyond observations
    sparse = tp.gap_fill(df, "t", "1 hour", "k", fill="none").collect()
    assert {(r["k"], r["t"].hour): r["v"] for r in sparse} == {
        (1, 0): 10.0, (1, 1): None, (1, 2): None, (1, 3): 30.0, (2, 5): 50.0,
    }


# ---------------------------------------------------------------------------
# bucketed (skew-safe) as-of
# ---------------------------------------------------------------------------

def test_bucketed_asof_carries_earlier_tail(spark):
    # right rows only in bucket 0 (t<10); left rows in buckets 2 and 3 must
    # still match through the carried tail
    left = [(1, 25, "a"), (1, 39, "b")]
    right = [(1, 3, "r3"), (1, 7, "r7")]
    assert _asof(spark, left, right, bucket=10) == {
        (1, 25, "a"): (7, "r7"),
        (1, 39, "b"): (7, "r7"),
    }


def test_bucketed_asof_no_by_global(spark):
    # degenerate global as-of (no by key): buckets are the only parallelism
    ldf = spark.createDataFrame([(t,) for t in (5, 15, 25)], "t bigint")
    rdf = spark.createDataFrame([(2, "r2"), (14, "r14")], "t bigint, rv string")
    rows = tp.asof_join(ldf, rdf, "t", bucket=10).collect()
    got = {r["t"]: r["rv"] for r in rows}
    assert got == {5: "r2", 15: "r14", 25: "r14"}


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    data=st.data(),
    direction=st.sampled_from(["backward", "forward", "nearest"]),
    tolerance=st.sampled_from([None, 7]),
)
def test_bucketed_asof_equals_unbucketed(spark, data, direction, tolerance):
    left = data.draw(st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 40)), min_size=1, max_size=20,
    ))
    right_keys = data.draw(st.sets(
        st.tuples(st.integers(0, 2), st.integers(0, 40)), min_size=1, max_size=20,
    ))
    left = [(k, t, f"l{i}") for i, (k, t) in enumerate(left)]
    right = [(k, t, f"r{k}_{t}") for k, t in sorted(right_keys)]
    base = _asof(spark, left, right, direction=direction, tolerance=tolerance)
    bucketed = _asof(spark, left, right, direction=direction,
                     tolerance=tolerance, bucket=10)
    assert bucketed == base


def test_bucketed_asof_timestamp_interval(spark):
    ldf = spark.createDataFrame(
        [(1, "2024-01-01 10:30:00")], "k bigint, t string"
    ).withColumn("t", F.col("t").cast("timestamp"))
    rdf = spark.createDataFrame(
        [(1, "2024-01-01 08:15:00", "early"), (1, "2024-01-01 09:40:00", "late")],
        "k bigint, t string, rv string",
    ).withColumn("t", F.col("t").cast("timestamp"))
    row = tp.asof_join(ldf, rdf, "t", "k", bucket="1 hour").collect()[0]
    assert row["rv"] == "late"


def test_bucketed_asof_partitions_by_bucket(spark):
    # plan guard: the per-event window exchange must partition on
    # (k, __bucket) — that is the skew escape: one hot key spreads over
    # its buckets instead of serializing into a single task
    ldf = spark.createDataFrame([(1, 10, "a")], "k bigint, t bigint, lv string")
    rdf = spark.createDataFrame([(1, 5, "r")], "k bigint, t bigint, rv string")
    plan = _plan(tp.asof_join(ldf, rdf, "t", "k", bucket=10))
    import re
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert any("k#" in p and "__bucket#" in p for p in parts), plan


# ---------------------------------------------------------------------------
# concurrent_intervals
# ---------------------------------------------------------------------------

def test_concurrent_intervals_matches_single_window(spark):
    """Two-phase prefix sum == the naive global cumsum, including ties."""
    import random

    from pyspark.sql import Window as W

    rng = random.Random(7)
    rows = []
    for i in range(500):
        s = rng.randrange(0, 10_000)
        rows.append((i, s, s + rng.randrange(0, 2_000)))
    df = spark.createDataFrame(rows, ["id", "s_us", "e_us"])
    got = tp.concurrent_intervals(
        df, "s_us", "e_us", id_column="id", bucket_us=1_000
    )
    starts = df.select("id", F.col("s_us").alias("t_us"), F.lit(1).alias("delta"))
    ends = df.select("id", F.col("e_us").alias("t_us"), F.lit(-1).alias("delta"))
    naive = starts.unionByName(ends).withColumn(
        "concurrent",
        F.sum("delta").over(
            W.orderBy("t_us", "delta", "id").rowsBetween(W.unboundedPreceding, 0)
        ).cast("long"),
    )
    assert sorted(got.collect()) == sorted(naive.collect())


def test_concurrent_intervals_peak_and_closure(spark):
    # [0,10) [5,15) [5,8): peak 3 while all open; curve returns to 0
    df = spark.createDataFrame(
        [(1, 0, 10), (2, 5, 15), (3, 5, 8)], ["id", "s_us", "e_us"]
    )
    rows = tp.concurrent_intervals(
        df, "s_us", "e_us", id_column="id", bucket_us=4
    ).collect()
    assert max(r.concurrent for r in rows) == 3
    last = max(rows, key=lambda r: (r.t_us, r.delta, r.id))
    assert last.concurrent == 0
    # half-open: an end and a start at the same instant never overlap
    df2 = spark.createDataFrame([(1, 0, 5), (2, 5, 9)], ["id", "s_us", "e_us"])
    rows2 = tp.concurrent_intervals(
        df2, "s_us", "e_us", id_column="id", bucket_us=100
    ).collect()
    assert max(r.concurrent for r in rows2) == 1


def test_cusum_changepoint_hand_example(spark):
    """Shifted-mean tail produces a large CUSUM; i.i.d.-ish flat series
    stays near zero. Hand-check: values [1,1,1,5,5,5], mean=14/6;
    S walks to max 8 - 3*14/6 = 1 at the last element... verified against
    a literal Python fold below."""
    from datetime import datetime as dt

    rows = [
        (1, dt(2026, 1, 1, 0, i), f"e{i}", float(v))
        for i, v in enumerate([1, 1, 1, 5, 5, 5])
    ]
    df = spark.createDataFrame(
        rows, "user_id int, ts timestamp, event_id string, value double"
    )
    got = tp.cusum_changepoint(
        df, group_column="user_id", order_columns=("ts", "event_id")
    ).collect()[0]

    xs = [1, 1, 1, 5, 5, 5]
    mean = sum(xs) / len(xs)
    s = mx = 0.0
    for x in xs:
        s = max(0.0, s + (x - mean))
        mx = max(mx, s)
    assert got["n_events"] == 6
    assert abs(got["cusum_max"] - mx) < 1e-9
    assert float(got["cusum_max_scaled"]) == mx * 6


def test_gap_fill_linear_interpolates(spark):
    from datetime import datetime as dt

    h = spark.createDataFrame(
        [
            (1, dt(2026, 1, 1, 0), 10.0),
            (1, dt(2026, 1, 1, 3), 40.0),   # 2 silent hours between
            (1, dt(2026, 1, 1, 4), 0.0),
        ],
        "user_id int, hour_ts timestamp, v double",
    )
    out = {
        r["hour_ts"].hour: r["v"]
        for r in tp.gap_fill(
            h, "hour_ts", "1 hour", "user_id", ["v"], fill="linear"
        ).collect()
    }
    assert out[0] == 10.0 and out[3] == 40.0 and out[4] == 0.0
    assert out[1] == 20.0 and out[2] == 30.0  # exact linear steps


def test_ewma_bit_equals_python_fold(spark):
    import numpy as np

    rng = np.random.RandomState(11)
    rows = []
    for k in ["a", "b", "c"]:
        for i in range(200):
            rows.append((k, i, float(rng.uniform(-50, 150))))
    df = spark.createDataFrame(rows, ["k", "i", "v"])
    got = {
        (r.k, r.i): r.ewma
        for r in tp.ewma(
            df, key_column="k", ts_column="i", value_column="v", alpha=0.125
        ).collect()
    }
    by_key = {}
    for k, i, v in rows:
        by_key.setdefault(k, []).append((i, v))
    for k, series in by_key.items():
        acc = None
        for i, v in sorted(series):
            acc = v if acc is None else 0.125 * v + 0.875 * acc
            assert got[(k, i)] == acc, (k, i)  # BIT equality, no approx


def test_ewma_tiebreak_makes_order_total(spark):
    # two rows share a timestamp: the tiebreak column decides, and the
    # result matches the fold over the (ts, tiebreak)-sorted sequence
    rows = [("u", 1, 1, 10.0), ("u", 1, 0, 20.0), ("u", 2, 0, 30.0)]
    df = spark.createDataFrame(rows, ["k", "ts", "tb", "v"])
    out = {
        (r.ts, r.tb): r.ewma
        for r in tp.ewma(
            df,
            key_column="k",
            ts_column="ts",
            value_column="v",
            alpha=0.5,
            tiebreak_column="tb",
        ).collect()
    }
    # order: (1,0)=20 -> (1,1)=10 -> (2,0)=30
    assert out[(1, 0)] == 20.0
    assert out[(1, 1)] == 0.5 * 10.0 + 0.5 * 20.0
    assert out[(2, 0)] == 0.5 * 30.0 + 0.5 * out[(1, 1)]


def test_ewma_single_row_groups_pass_through(spark):
    df = spark.createDataFrame([("a", 1, 5.0), ("b", 9, -3.0)], ["k", "i", "v"])
    out = {r.k: r.ewma for r in tp.ewma(
        df, key_column="k", ts_column="i", value_column="v", alpha=0.3
    ).collect()}
    assert out == {"a": 5.0, "b": -3.0}


def test_ewma_and_holt_drop_null_values(spark):
    """NULL values are excluded before the recursion — the output equals
    the fold over the non-null subsequence (without the filter pandas'
    NaN-skip, a NaN-propagating fold, and DuckDB's NULL-propagating
    list_reduce all disagree)."""
    rows = [("u", 1, 10.0), ("u", 2, None), ("u", 3, 30.0), ("u", 4, None)]
    df = spark.createDataFrame(rows, "k string, i int, v double")
    out = {
        r.i: r.ewma
        for r in tp.ewma(
            df, key_column="k", ts_column="i", value_column="v", alpha=0.5
        ).collect()
    }
    assert out == {1: 10.0, 3: 0.5 * 30.0 + 0.5 * 10.0}  # null rows gone
    hout = {
        r.i: (r.level, r.trend)
        for r in tp.holt_smoothing(
            df,
            key_column="k",
            ts_column="i",
            value_column="v",
            alpha=0.5,
            beta=0.5,
        ).collect()
    }
    assert set(hout) == {1, 3}
    assert hout[1] == (10.0, 0.0)
    ln = 0.5 * 30.0 + 0.5 * (10.0 + 0.0)
    assert hout[3] == (ln, 0.5 * (ln - 10.0) + 0.5 * 0.0)


def test_holt_bit_equals_python_fold(spark):
    import numpy as np

    rng = np.random.RandomState(5)
    rows = []
    for k in ["a", "b"]:
        for i in range(250):
            rows.append((k, i, float(rng.uniform(-10, 90))))
    df = spark.createDataFrame(rows, ["k", "i", "v"])
    got = {
        (r.k, r.i): (r.level, r.trend)
        for r in tp.holt_smoothing(
            df,
            key_column="k",
            ts_column="i",
            value_column="v",
            alpha=0.25,
            beta=0.125,
        ).collect()
    }
    by_key = {}
    for k, i, v in rows:
        by_key.setdefault(k, []).append((i, v))
    for k, series in by_key.items():
        l = b = 0.0
        for j, (i, v) in enumerate(sorted(series)):
            if j == 0:
                l, b = v, 0.0
            else:
                ln = 0.25 * v + 0.75 * (l + b)
                b = 0.125 * (ln - l) + 0.875 * b
                l = ln
            assert got[(k, i)] == (l, b), (k, i)  # BIT equality


def test_holt_trend_tracks_linear_series(spark):
    # a perfectly linear series converges toward trend == slope
    rows = [("k", i, 10.0 + 3.0 * i) for i in range(120)]
    df = spark.createDataFrame(rows, ["k", "i", "v"])
    last = (
        tp.holt_smoothing(
            df, key_column="k", ts_column="i", value_column="v",
            alpha=0.5, beta=0.5,
        )
        .orderBy("i")
        .collect()[-1]
    )
    assert abs(last.trend - 3.0) < 1e-6
    assert abs(last.level - (10.0 + 3.0 * 119)) < 1e-4


def test_lttb_downsample_endpoints_and_argmax(spark):
    from datetime import datetime

    from pyspark_playground_spark.operators.temporal import lttb_downsample

    # one key, 6 points over 5 seconds; buckets=1 => one interior argmax.
    # interior points (t=1..4s); prev anchor = first point, next = last.
    rows = [
        (1, datetime(2026, 1, 1, 0, 0, 0), 0.0),
        (1, datetime(2026, 1, 1, 0, 0, 1), 1.0),
        (1, datetime(2026, 1, 1, 0, 0, 2), 9.0),   # the visual spike
        (1, datetime(2026, 1, 1, 0, 0, 3), 1.0),
        (1, datetime(2026, 1, 1, 0, 0, 4), 1.0),
        (1, datetime(2026, 1, 1, 0, 0, 5), 0.0),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp_ntz, value double")
    got = sorted(
        (r["bucket"], r["ts"].second, r["value"])
        for r in lttb_downsample(
            df, key_column="user_id", time_column="ts",
            value_column="value", buckets=1,
        ).collect()
    )
    # endpoints kept (-1 and 1); the one interior bucket keeps the spike
    assert got[0] == (-1, 0, 0.0)
    assert got[-1] == (1, 5, 0.0)
    assert (0, 2, 9.0) in got
    assert len(got) == 3


def test_lttb_downsample_deterministic_and_bounded(spark):
    from pyspark_playground_spark.operators.temporal import lttb_downsample

    from pyspark_playground_spark.queries import load_events

    e = load_events(spark, "/root/testdata/sf0.001")
    out = lttb_downsample(
        e, key_column="user_id", time_column="ts",
        value_column="value", buckets=4,
    )
    rows = out.collect()
    again = lttb_downsample(
        e, key_column="user_id", time_column="ts",
        value_column="value", buckets=4,
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # per key: at most buckets interior picks + 2 endpoints
    from collections import Counter
    per_key = Counter(r["user_id"] for r in rows)
    assert max(per_key.values()) <= 4 + 2
    # endpoints always present
    buckets_per_key = {}
    for r in rows:
        buckets_per_key.setdefault(r["user_id"], set()).add(r["bucket"])
    assert all({-1, 4} <= b for b in buckets_per_key.values())


def test_lagged_correlation_detects_shift(spark):
    from pyspark_playground_spark.operators.temporal import lagged_correlation

    # y is exactly x shifted by +2 index steps: r(lag=2) == 1.0 and is the
    # unique maximal lag; r(0) is far lower on this aperiodic series.
    xs = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0, 5.0, 8.0]
    rows = [(t, xs[t], xs[t - 2] if t >= 2 else 0.0)
            for t in range(len(xs))]
    df = spark.createDataFrame(rows, "t bigint, x double, y double")
    got = {r["lag"]: r["r"] for r in lagged_correlation(
        df, index_column="t", x_column="x", y_column="y", max_lag=3
    ).collect()}
    assert abs(got[2] - 1.0) < 1e-9
    assert all(got[g] < 0.999 for g in got if g != 2)


def test_lagged_correlation_zero_variance_null(spark):
    from pyspark_playground_spark.operators.temporal import lagged_correlation

    rows = [(t, 5.0, float(t)) for t in range(6)]
    df = spark.createDataFrame(rows, "t bigint, x double, y double")
    got = {r["lag"]: r["r"] for r in lagged_correlation(
        df, index_column="t", x_column="x", y_column="y", max_lag=1
    ).collect()}
    assert set(got.values()) == {None}


def test_seasonal_naive_error_hand_computed(spark):
    """One group, 3 hours with counts [2, 5, 5] (hour 1 then a gap-free
    run): lag-1 residuals |5-2|, |5-5| -> mae1 = 3/2; with
    season_hours=2 one seasonal residual |5-2| = 3 -> mae_s = 3;
    mase = (1500000 * 1e6) DIV 3000000 = 500000. A group too short for
    the seasonal lag gets NULL mae_s/mase."""
    from datetime import datetime

    from pyspark_playground_spark.operators.temporal import (
        seasonal_naive_error,
    )

    rows = (
        [(datetime(2026, 1, 1, 0, m), "a") for m in range(2)]
        + [(datetime(2026, 1, 1, 1, m), "a") for m in range(5)]
        + [(datetime(2026, 1, 1, 2, m), "a") for m in range(5)]
        + [(datetime(2026, 1, 1, 0, 0), "b")]
    )
    df = spark.createDataFrame(rows, "ts timestamp, event_type string")
    out = {r["event_type"]: r for r in seasonal_naive_error(
        df, season_hours=2).collect()}
    a = out["a"]
    assert a["n_hours"] == 3
    assert a["mae1_x6"] == 1_500_000  # (3+0)/2
    assert a["mae_s_x6"] == 3_000_000
    assert a["mase_x6"] == 500_000
    b = out["b"]
    assert b["n_hours"] == 1
    assert b["mae1_x6"] is None and b["mase_x6"] is None

    # a gap hour counts as zero: counts [2, 0, 4] over 3 dense hours
    rows2 = (
        [(datetime(2026, 1, 1, 0, m), "g") for m in range(2)]
        + [(datetime(2026, 1, 1, 2, m), "g") for m in range(4)]
    )
    g = {r["event_type"]: r for r in seasonal_naive_error(
        spark.createDataFrame(rows2, "ts timestamp, event_type string"),
        season_hours=24).collect()}["g"]
    assert g["n_hours"] == 3
    assert g["mae1_x6"] == 3_000_000  # |0-2|, |4-0| -> 6/2


def test_theil_sen_hand_computed_and_outlier_robust(spark):
    """Perfect line y=2x+1 -> slope exactly 2, intercept exactly 1; one
    wild outlier leaves the median slope at 2 (OLS would not survive);
    a single point yields NULLs."""
    from pyspark_playground_spark.operators.temporal import theil_sen_slope

    line = spark.createDataFrame(
        [(float(x), 2.0 * x + 1.0) for x in range(10)], "x double, y double"
    )
    r = theil_sen_slope(line, x_column="x", y_column="y").collect()[0]
    assert (r["n_points"], r["n_pairs"]) == (10, 45)
    assert r["slope_q6"] == 2_000_000 and r["intercept_q6"] == 1_000_000

    out = spark.createDataFrame(
        [(float(x), 2.0 * x + 1.0) for x in range(10)] + [(4.5, 1000.0)],
        "x double, y double",
    )
    ro = theil_sen_slope(out, x_column="x", y_column="y").collect()[0]
    assert ro["slope_q6"] == 2_000_000  # median unmoved by one outlier

    single = spark.createDataFrame([(1.0, 5.0)], "x double, y double")
    rs = theil_sen_slope(single, x_column="x", y_column="y").collect()[0]
    assert rs["n_points"] == 1 and rs["n_pairs"] == 0
    assert rs["slope_q6"] is None


def test_binary_segmentation_changepoint_hand_computed(spark):
    """Level shift 10->20 after x=4 (5 points each): the located split is
    x=4 with means exactly 10 and 20; gain = n_L*n_R/n * shift^2 =
    5*5/10*100 = 250; a constant series locates SOME split with gain 0;
    a single point yields an empty result."""
    from pyspark_playground_spark.operators.temporal import (
        binary_segmentation_changepoint,
    )

    rows = [(float(x), 10.0) for x in range(5)]
    rows += [(float(x), 20.0) for x in range(5, 10)]
    df = spark.createDataFrame(rows, "x double, y double")
    r = binary_segmentation_changepoint(
        df, x_column="x", y_column="y"
    ).collect()[0]
    assert r["n_points"] == 10 and r["split_x"] == 4.0
    assert r["mean_left_q6"] == 10_000_000
    assert r["mean_right_q6"] == 20_000_000
    assert r["gain_q6"] == 250_000_000  # 250 in y^2 units, q6

    const = spark.createDataFrame(
        [(float(x), 7.0) for x in range(6)], "x double, y double"
    )
    rc = binary_segmentation_changepoint(
        const, x_column="x", y_column="y"
    ).collect()[0]
    assert rc["gain_q6"] == 0 and rc["split_x"] == 0.0  # earliest tie

    single = spark.createDataFrame([(1.0, 5.0)], "x double, y double")
    assert binary_segmentation_changepoint(
        single, x_column="x", y_column="y"
    ).collect() == []


def test_binary_segmentation_changepoint_tied_x_deterministic(spark):
    """Tied-x inputs (r8 ADVICE): duplicate x values pre-aggregate by x
    before the cumulative, so the result is the same as feeding the
    per-x sums directly — regardless of input row order — and a split
    can never land inside a tied-x run."""
    from pyspark_playground_spark.operators.temporal import (
        binary_segmentation_changepoint,
    )

    # x=0..3 carry two rows each (summing to 10,10,30,30): the split
    # must be at x=1 with left mean 10, right mean 30
    dup_rows = [
        (0.0, 4.0), (0.0, 6.0), (1.0, 5.0), (1.0, 5.0),
        (2.0, 20.0), (2.0, 10.0), (3.0, 15.0), (3.0, 15.0),
    ]
    out = {}
    for tag, rows in (
        ("fwd", dup_rows),
        ("rev", list(reversed(dup_rows))),
    ):
        df = spark.createDataFrame(rows, "x double, y double").repartition(
            4
        )
        out[tag] = binary_segmentation_changepoint(
            df, x_column="x", y_column="y"
        ).collect()[0]
    assert out["fwd"] == out["rev"]
    r = out["fwd"]
    assert r["n_points"] == 8 and r["split_x"] == 1.0
    # group sums: left = (10+10)/4 rows = 5.0, right = (30+30)/4 = 15.0
    assert r["mean_left_q6"] == 5_000_000
    assert r["mean_right_q6"] == 15_000_000


def test_forecast_backtest_mase_hand_computed(spark):
    """Deterministic hourly series with a known seasonal pattern plus a
    drifted final day: the drifted fold's MASE exceeds the clean
    folds'; every count is mirrored exactly in python; n_folds<1
    refused."""
    import datetime as dt
    import math

    import pytest

    from pyspark_playground_spark.operators.temporal import (
        forecast_backtest_mase,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # 5 days x 24 h; base pattern = 1 + (h mod 24) mod 3 events per
    # hour, perfectly seasonal; final day adds +2 per hour (drift)
    for day in range(5):
        for hod in range(24):
            n = 1 + (hod % 3) + (2 if day == 4 else 0)
            for k in range(n):
                rows.append((t0 + dt.timedelta(days=day, hours=hod,
                                               minutes=k),))
    df = spark.createDataFrame(rows, "ts timestamp")
    out = {r["fold"]: r for r in forecast_backtest_mase(
        df, n_folds=4, season_hours=24).collect()}
    assert sorted(out) == [1, 2, 3, 4]

    # python mirror
    from collections import Counter

    hourly = Counter()
    for (ts,) in rows:
        hourly[int(ts.replace(minute=0).timestamp() // 3600)] += 1
    lag = {h: abs(y - hourly[h - 24]) for h, y in hourly.items()
           if h - 24 in hourly}
    lo, hi = min(hourly), max(hourly)
    seg = lambda h: ((h - lo) * 5) // (hi - lo + 1)
    for f in (1, 2, 3, 4):
        te = [d for h, d in lag.items() if seg(h) == f]
        tr = [d for h, d in lag.items() if seg(h) < f]
        assert out[f]["n_test"] == len(te)
        assert out[f]["test_abs_err"] == sum(te)
        assert out[f]["train_abs_err"] == sum(tr)
        if te and tr and sum(tr) > 0:
            assert out[f]["mase_q6"] == (
                sum(te) * len(tr) * 1_000_000
            ) // (len(te) * sum(tr))
    # folds 1-3 are perfectly seasonal (errors only at the drift edge);
    # the fold containing the drifted day scores worse than fold 1
    drift_fold = max(out, key=lambda f: out[f]["mase_q6"] or 0)
    assert (out[drift_fold]["mase_q6"] or 0) >= (
        out[1]["mase_q6"] or 0
    )

    with pytest.raises(ValueError, match="n_folds"):
        forecast_backtest_mase(df, n_folds=0)
