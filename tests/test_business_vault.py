from datetime import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pyspark_playground_spark.conventions import END_OF_TIME, DataVaultConventions
from pyspark_playground_spark.operators import business_vault as bv

C = DataVaultConventions()

T0 = datetime(2026, 1, 1, 12, 0, 0)
T1 = datetime(2026, 1, 2, 12, 0, 0)
T2 = datetime(2026, 1, 3, 12, 0, 0)
T3 = datetime(2026, 1, 4, 12, 0, 0)

HK, LD, LED = C.hkey(), C.load_date(), C.load_end_date()


def _sat(spark, rows):
    return spark.createDataFrame(
        [(h, "x", t, v) for h, t, v in rows],
        f"`{HK}` string, `{C.hdiff()}` string, `{LD}` timestamp, VAL int",
    )


def _eff(spark, rows):
    return spark.createDataFrame(
        [(h, "x", d, t) for h, d, t in rows],
        f"`{HK}` string, `{C.hdiff()}` string, `{C.deleted()}` boolean, `{LD}` timestamp",
    )


def test_pit_versions_chain(spark):
    sat = _sat(spark, [("a", T0, 1), ("a", T1, 2), ("a", T2, 3)])
    pit = bv.pit_rows(sat)
    got = {(r[LD], r[LED]) for r in pit.collect()}
    assert got == {(T0, T1), (T1, T2), (T2, END_OF_TIME)}


def test_pit_delete_closes_open_interval(spark):
    sat = _sat(spark, [("a", T0, 1), ("a", T1, 2)])
    eff = _eff(spark, [("a", False, T0), ("a", True, T2)])
    pit = bv.pit_rows(sat, eff)
    got = {(r[LD], r[LED]) for r in pit.collect()}
    # the delete at T2 falls in the open interval starting T1
    assert got == {(T0, T1), (T1, T2)}


def test_pit_delete_inside_closed_interval(spark):
    sat = _sat(spark, [("a", T0, 1), ("a", T2, 2)])
    eff = _eff(spark, [("a", True, T1)])
    pit = bv.pit_rows(sat, eff)
    got = {(r[LD], r[LED]) for r in pit.collect()}
    # version at T0 ends at the delete T1, not at the next version T2
    assert got == {(T0, T1), (T2, END_OF_TIME)}


def test_read_data_from_hub(spark):
    hub = spark.createDataFrame(
        [("a", T0, "src", "m1")],
        f"`{HK}` string, `{LD}` timestamp, `{C.record_source()}` string, PublicID string",
    )
    sat = _sat(spark, [("a", T0, 1), ("a", T1, 2)])
    view = bv.read_data_from_hub(hub, sat, None, ["VAL"])
    rows = sorted(view.collect(), key=lambda r: r[LD])
    assert [r["VAL"] for r in rows] == [1, 2]
    assert rows[0]["PublicID"] == "m1"
    assert rows[1][LED] == END_OF_TIME


def test_zip_historized_interval_intersection(spark):
    left = spark.createDataFrame(
        [("k", 10, T0, T2)], f"id string, lv int, `{LD}` timestamp, `{LED}` timestamp"
    )
    right = spark.createDataFrame(
        [("k", 20, T1, T3), ("k", 30, T3, None)],
        f"rid string, rv int, `{LD}` timestamp, `{LED}` timestamp",
    )
    out = bv.zip_historized_dataframes(
        left, right, F.col("l.id") == F.col("r.rid"), how="inner"
    )
    rows = out.collect()
    # only [T1,T3) overlaps [T0,T2) → intersection [T1,T2); [T3,∞) doesn't
    assert len(rows) == 1
    assert rows[0][LD] == T1 and rows[0][LED] == T2
    assert rows[0]["lv"] == 10 and rows[0]["rv"] == 20


def test_zip_bucketed_matches_unbucketed(spark):
    # the bucket= skew escape hatch must be output-invisible: same pair
    # set, same intersected intervals, across fine (multi-bucket
    # fan-out) and coarse (single-bucket) widths — including open
    # (null) ends and the year-9999 sentinel, which must clamp for
    # bucketing instead of exploding into 10^8 buckets
    from datetime import timedelta

    lrows, rrows = [], []
    for k in ("a", "b", "c"):
        for i in range(6):
            s = T0 + timedelta(hours=3 * i + (ord(k) % 3))
            e = s + timedelta(hours=5)
            lrows.append((k, 100 + i, s, e))
        lrows.append((k, 199, T3, None))  # open end
        for i in range(4):
            s = T0 + timedelta(hours=4 * i + 1)
            rrows.append((k, 200 + i, s, s + timedelta(hours=4)))
        rrows.append((k, 299, T2, END_OF_TIME))  # sentinel end
    left = spark.createDataFrame(
        lrows, f"id string, lv int, `{LD}` timestamp, `{LED}` timestamp"
    )
    right = spark.createDataFrame(
        rrows, f"rid string, rv int, `{LD}` timestamp, `{LED}` timestamp"
    )
    on = F.col("l.id") == F.col("r.rid")
    plain = {
        (r["id"], r["lv"], r["rv"], r[LD], r[LED])
        for r in bv.zip_historized_dataframes(left, right, on).collect()
    }
    assert plain  # the fixture genuinely produces overlaps
    # 1 hour = multi-bucket fan-out, 10^9 s = everything in one bucket
    for width in ("1 hour", 10**9):
        bucketed = {
            (r["id"], r["lv"], r["rv"], r[LD], r[LED])
            for r in bv.zip_historized_dataframes(
                left, right, on, bucket=width
            ).collect()
        }
        assert bucketed == plain, f"width={width!r}"


@st.composite
def _interval_rows(draw):
    """Random historized rows: a few keys, hour-grid starts, spans 0-9
    hours, ~1/5 open (null) ends and ~1/10 sentinel ends — the shapes
    zip's overlap predicate distinguishes."""
    from datetime import timedelta

    def side(tag):
        n = draw(st.integers(min_value=1, max_value=8))
        rows = []
        for i in range(n):
            k = draw(st.sampled_from(["a", "b"]))
            s_off = draw(st.integers(min_value=0, max_value=40))
            span = draw(st.integers(min_value=0, max_value=9))
            kind = draw(st.integers(min_value=0, max_value=9))
            s = T0 + timedelta(hours=s_off)
            e = (
                None if kind < 2
                else END_OF_TIME if kind == 2
                else s + timedelta(hours=span)
            )
            rows.append((k, tag * 1000 + i, s, e))
        return rows

    return side(1), side(2)


@pytest.mark.usefixtures("spark")
# 2 examples: each runs two full plans; the hand test below already
# covers null/sentinel ends across three widths (suite-wall budget)
@settings(max_examples=2, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=_interval_rows(), width_hours=st.sampled_from([1, 7, 50]))
def test_zip_bucketed_matches_unbucketed_property(spark, data, width_hours):
    # for ANY well-formed interval corpus and ANY bucket width, the
    # bucketed plan's row set equals the plain plan's exactly
    lrows, rrows = data
    left = spark.createDataFrame(
        lrows, f"id string, lv int, `{LD}` timestamp, `{LED}` timestamp"
    )
    right = spark.createDataFrame(
        rrows, f"rid string, rv int, `{LD}` timestamp, `{LED}` timestamp"
    )
    on = F.col("l.id") == F.col("r.rid")
    plain = {
        tuple(r) for r in bv.zip_historized_dataframes(left, right, on).collect()
    }
    bucketed = {
        tuple(r)
        for r in bv.zip_historized_dataframes(
            left, right, on, bucket=width_hours * 3600
        ).collect()
    }
    assert bucketed == plain


def test_zip_bucketed_rejects_outer(spark):
    import pytest

    left = spark.createDataFrame(
        [("k", 10, T0, T2)], f"id string, lv int, `{LD}` timestamp, `{LED}` timestamp"
    )
    with pytest.raises(ValueError, match="inner joins only"):
        bv.zip_historized_dataframes(
            left, left, F.col("l.id") == F.col("r.id"),
            how="left", bucket="1 hour",
        )


def test_join_linked_dataframes(spark):
    schema = (
        f"`{HK}` string, name string, `{LD}` timestamp, `{LED}` timestamp"
    )
    movies = spark.createDataFrame([("mh1", "Movie 1", T0, None)], schema)
    directors = spark.createDataFrame([("dh1", "Dir 1", T1, None)], schema)
    link = spark.createDataFrame(
        [("lk1", "mh1", "dh1")],
        f"`{HK}` string, `{C.hkey_of('movies')}` string, `{C.hkey_of('directors')}` string",
    )
    out = bv.join_linked_dataframes(
        movies, link, directors,
        from_hkey_column=C.hkey_of("movies"),
        to_hkey_column=C.hkey_of("directors"),
    )
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0][LD] == T1 and rows[0][LED] is None


def test_active_code_reference(spark):
    ref = spark.createDataFrame(
        [
            ("g1", "x", T0, "a", "old"),
            ("g1", "x", T1, "a", "new"),
            ("g2", "x", T0, "a", "other"),
        ],
        f"`{C.group()}` string, `{C.hdiff()}` string, `{LD}` timestamp, ID string, DESCR string",
    )
    out = bv.active_code_reference_rows(ref)
    got = {(r[C.group()], r["ID"], r["DESCR"]) for r in out.collect()}
    assert got == {("g1", "a", "new"), ("g2", "a", "other")}


def test_incremental_pit_equals_full_recompute(spark):
    """pit_rows_incremental over a batch's touched keys must equal a full
    pit_rows recompute — the correctness contract that makes incremental
    maintenance safe at scale."""
    from datetime import datetime

    from pyspark_playground_spark.conventions import DataVaultConventions
    from pyspark_playground_spark.operators import business_vault as bv

    C = DataVaultConventions()
    t = lambda d: datetime(2026, 1, d)  # noqa: E731

    def sat_df(rows):
        return spark.createDataFrame(
            [(k, "x", ts) for k, ts in rows],
            f"`{C.hkey()}` string, `{C.hdiff()}` string, `{C.load_date()}` timestamp",
        )

    def eff_df(rows):
        return spark.createDataFrame(
            [(k, "x", d, ts) for k, d, ts in rows],
            f"`{C.hkey()}` string, `{C.hdiff()}` string, "
            f"`{C.deleted()}` boolean, `{C.load_date()}` timestamp",
        )

    # state after batch 1
    sat1 = sat_df([("a", t(1)), ("a", t(3)), ("b", t(1)), ("c", t(2))])
    eff1 = eff_df([("a", False, t(1)), ("b", False, t(1)), ("c", False, t(2))])
    pit1 = bv.pit_rows(sat1, eff1)

    # batch 2 touches a (new version) and b (delete); c untouched
    sat2 = sat1.union(sat_df([("a", t(5))]))
    eff2 = eff1.union(eff_df([("b", True, t(4))]))
    touched = spark.createDataFrame([("a",), ("b",)], "hkey string")

    full = bv.pit_rows(sat2, eff2)
    incr = bv.pit_rows_incremental(pit1, sat2, eff2, touched)

    key = [C.hkey(), C.load_date(), C.load_end_date()]
    assert sorted(map(tuple, full.select(*key).collect())) == \
           sorted(map(tuple, incr.select(*key).collect()))
    # and the batch really changed things: b's last interval now closes at t4
    rows = {(r[C.hkey()], r[C.load_date()]): r[C.load_end_date()]
            for r in incr.collect()}
    assert rows[("b", t(1))] == t(4)
    assert rows[("a", t(3))] == t(5)


def test_zip_historized_left_outer_preserves_unmatched(spark):
    """J10 outer variant: rows with no overlapping partner survive a left
    zip with null right-side columns (overlap predicate lives in the join
    condition, not a post-filter)."""
    from datetime import datetime

    from pyspark_playground_spark.conventions import DataVaultConventions
    from pyspark_playground_spark.operators import business_vault as bv
    from pyspark.sql import functions as F

    C = DataVaultConventions()
    ld, led = C.load_date(), C.load_end_date()
    t = lambda d: datetime(2026, 1, d)  # noqa: E731
    left = spark.createDataFrame(
        [("k1", "L1", t(1), t(5)), ("k2", "L2", t(1), t(5))],
        f"k string, lv string, `{ld}` timestamp, `{led}` timestamp",
    )
    right = spark.createDataFrame(
        [("k1", "R1", t(2), t(3)),      # overlaps k1
         ("k2", "R2", t(6), t(7))],     # outside k2's interval
        f"rk string, rv string, `{ld}` timestamp, `{led}` timestamp",
    )
    out = bv.zip_historized_dataframes(
        left, right, F.col("l.k") == F.col("r.rk"), how="left"
    )
    rows = {r["k"]: r for r in out.collect()}
    assert rows["k1"]["rv"] == "R1"
    assert rows["k1"][ld] == t(2) and rows["k1"][led] == t(3)
    assert rows["k2"]["rv"] is None  # preserved despite no overlap


def test_read_snapshot_at_picks_the_version_valid_then(spark):
    from datetime import datetime as dt

    from pyspark.sql import functions as F

    from pyspark_playground_spark.conventions import DataVaultConventions
    from pyspark_playground_spark.operators import business_vault as bv
    from pyspark_playground_spark.operators.raw_vault import hash_key

    C = DataVaultConventions()
    rows = [
        ("u1", dt(2024, 1, 1), "a", 1.0),
        ("u1", dt(2024, 1, 10), "b", 2.0),
        ("u1", dt(2024, 1, 20), "c", 3.0),
        ("u2", dt(2024, 1, 15), "x", 9.0),
    ]
    src = spark.createDataFrame(rows, ["uid", "ts", "state", "v"])
    hub = src.select(hash_key(["uid"]).alias(C.hkey()), "uid").distinct()
    sat = src.select(
        hash_key(["uid"]).alias(C.hkey()),
        F.lit("h").alias(C.hdiff()),
        F.col("ts").alias(C.load_date()),
        "state",
        "v",
    )
    pit = bv.pit_rows(sat, None, end_of_time=None)
    # at Jan 12: u1 -> the Jan-10 'b' version; u2 not yet loaded
    snap = bv.read_snapshot_at(
        hub, sat, pit, ["state", "v"], dt(2024, 1, 12)
    ).collect()
    assert {(r.uid, r.state, r.v) for r in snap} == {("u1", "b", 2.0)}
    # at Jan 25: u1 -> open 'c' interval; u2 -> 'x'
    snap2 = bv.read_snapshot_at(
        hub, sat, pit, ["state", "v"], dt(2024, 1, 25)
    ).collect()
    assert {(r.uid, r.state) for r in snap2} == {("u1", "c"), ("u2", "x")}
    # before any load: empty
    assert (
        bv.read_snapshot_at(hub, sat, pit, ["state"], dt(2023, 12, 1)).count()
        == 0
    )
    # end-of-time sentinel intervals count as open too
    pit_sentinel = bv.pit_rows(sat, None)
    snap3 = bv.read_snapshot_at(
        hub, sat, pit_sentinel, ["state"], dt(2024, 1, 25)
    ).collect()
    assert {(r.uid, r.state) for r in snap3} == {("u1", "c"), ("u2", "x")}
