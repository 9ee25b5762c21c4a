"""Mergeable time rollups: merge identity, associativity, finalize."""

from pyspark.sql import functions as F

from pyspark_playground_spark.operators import rollup as ru


def _events(spark):
    rows = [
        ("a", "2024-01-01 10:05:00", 1),
        ("a", "2024-01-01 10:45:00", 5),
        ("a", "2024-01-01 11:10:00", 2),
        ("b", "2024-01-01 10:20:00", 7),
        ("b", "2024-01-02 09:00:00", 3),
    ]
    return spark.createDataFrame(rows, "k string, ts string, v long").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


def _rows(df):
    return {
        tuple(r[c] for c in sorted(df.columns)) for r in df.collect()
    }


def test_merge_of_splits_equals_single_pass(spark):
    e = _events(spark)
    whole = ru.time_rollup(e, "ts", "hour", ["k"], ["v"])
    parts = [
        ru.time_rollup(e.where(F.col("v") % 3 == i), "ts", "hour", ["k"], ["v"])
        for i in range(3)
    ]
    merged = ru.merge_rollups(*parts)
    assert _rows(merged) == _rows(whole)
    # associativity: merge in a different grouping
    merged2 = ru.merge_rollups(ru.merge_rollups(parts[0], parts[1]), parts[2])
    assert _rows(merged2) == _rows(whole)
    # merging a rollup with itself doubles sums/counts but keeps min/max
    doubled = ru.merge_rollups(whole, whole)
    w = {r["k"] + str(r["bucket"]): r for r in whole.collect()}
    for r in doubled.collect():
        base = w[r["k"] + str(r["bucket"])]
        assert r["cnt_rows"] == 2 * base["cnt_rows"]
        assert r["sum_v"] == 2 * base["sum_v"]
        assert r["min_v"] == base["min_v"] and r["max_v"] == base["max_v"]


def test_finalize_avg(spark):
    e = _events(spark)
    fin = ru.finalize_rollup(
        ru.time_rollup(e, "ts", "hour", ["k"], ["v"]), ["v"]
    )
    row = {(r["k"], str(r["bucket"])): r for r in fin.collect()}
    a10 = row[("a", "2024-01-01 10:00:00")]
    assert a10["avg_v"] == 3.0 and a10["sum_v"] == 6 and a10["cnt_rows"] == 2
