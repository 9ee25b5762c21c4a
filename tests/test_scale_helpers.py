"""Scale helpers: salted joins/aggregates, xxhash64 vault, file sources."""

from __future__ import annotations

import shutil
import tempfile
from datetime import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyspark_playground_spark.conventions import ColumnDefinition, VaultConfig
from pyspark_playground_spark.operators import raw_vault as rv
from pyspark_playground_spark.operators import skew
from pyspark_playground_spark.operators.vault import RawVault
from pyspark_playground_spark.sources import files


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="scale-test-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_salted_join_matches_plain_join(spark):
    # heavily skewed: key 'hot' holds 90% of rows
    large = spark.createDataFrame(
        [("hot", i) for i in range(900)] + [(f"k{i}", i) for i in range(100)],
        "k string, v int",
    )
    small = spark.createDataFrame(
        [("hot", "H"), ("k1", "A"), ("k2", "B"), ("missing", "X")],
        "k string, label string",
    )
    for how in ("inner", "left"):
        plain = large.join(small, ["k"], how)
        salted = skew.salted_join(large, small, ["k"], buckets=8, how=how)
        assert salted.count() == plain.count()
        assert (
            salted.groupBy("k").count().orderBy("k").collect()
            == plain.groupBy("k").count().orderBy("k").collect()
        )
    with pytest.raises(ValueError):
        skew.salted_join(large, small, ["k"], how="right")


def test_hot_key_salted_join_matches_plain_join(spark):
    """Partial salting is row-identical to the plain join; only the hot key
    fans out on the small side."""
    large = spark.createDataFrame(
        [("hot", i) for i in range(900)] + [(f"k{i}", i) for i in range(100)],
        "k string, v int",
    )
    small = spark.createDataFrame(
        [("hot", "H"), ("k1", "A"), ("k2", "B"), ("missing", "X")],
        "k string, label string",
    )
    for how in ("inner", "left"):
        plain = large.join(small, ["k"], how)
        salted = skew.hot_key_salted_join(
            large, small, ["k"], buckets=8, threshold=500, how=how
        )
        assert sorted(map(tuple, salted.collect())) == sorted(
            map(tuple, plain.collect())
        )
    # explicit hot_keys path (the precomputed / sampled route)
    hot = spark.createDataFrame([("hot",)], "k string")
    salted = skew.hot_key_salted_join(
        large, small, ["k"], buckets=8, hot_keys=hot
    )
    assert salted.count() == large.join(small, ["k"]).count()
    with pytest.raises(ValueError):
        skew.hot_key_salted_join(large, small, ["k"], how="full")


def test_salted_aggregate_matches_plain(spark):
    df = spark.createDataFrame(
        [("hot", i, float(i)) for i in range(1000)] + [("cold", 1, 2.0)],
        "k string, n int, x double",
    )
    got = {
        r["k"]: (r["sum_n"], r["count_x"])
        for r in skew.salted_aggregate(
            df, ["k"], {"n": "sum", "x": "count"}, buckets=4
        ).collect()
    }
    assert got["hot"] == (sum(range(1000)), 1000)
    assert got["cold"] == (1, 1)


def test_xxhash64_vault_end_to_end(spark):
    """The scale hash option: long hkeys through DDL, load, and anti-join."""
    spark.sql("DROP DATABASE IF EXISTS xx_stg CASCADE")
    spark.sql("DROP DATABASE IF EXISTS xx_raw CASCADE")
    config = VaultConfig(
        staging_prepared_database="xx_stg",
        raw_database="xx_raw",
        record_source="x",
        hash_function="xxhash64",
        optimize_partitioning=False,
    )
    v = RawVault(spark, config)
    v.initialize_database()
    v.create_hub("things", [ColumnDefinition("ID", T.StringType(), False)])
    v.create_satellite("things", [ColumnDefinition("NAME", T.StringType())])

    batch = spark.createDataFrame(
        [("create", datetime(2026, 8, 1), "x1", "one")],
        "OPERATION string, LOAD_DATE timestamp, ID string, NAME string",
    )
    staged = rv.prepare_staging(
        batch, load_date_column="LOAD_DATE", operation_column="OPERATION",
        record_source="x", hkey_columns=["ID"], hash_function="xxhash64",
    )
    v.load_hub(staged, "things", ["ID"], satellites={"things": ["NAME"]},
               load_ts=datetime(2026, 9, 1))
    hub = spark.table("xx_raw.HUB__THINGS")
    assert dict(hub.dtypes)["$__HKEY"] == "bigint"
    assert hub.count() == 1
    # idempotent reload with long keys
    v.load_hub(staged, "things", ["ID"], satellites={"things": ["NAME"]},
               load_ts=datetime(2026, 9, 2))
    assert spark.table("xx_raw.HUB__THINGS").count() == 1
    assert spark.table("xx_raw.SAT__THINGS").count() == 1


def test_file_sources_roundtrip(spark, tmpdir):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id int, s string, x double"
    )
    for fmt in ("parquet", "orc", "csv", "json"):
        path = f"{tmpdir}/{fmt}_out"
        files.write_sink(df, path, file_format=fmt)
        back = files.read_source(
            spark, path, file_format=fmt,
            schema="id int, s string, x double" if fmt in ("csv", "json") else None,
        )
        assert back.count() == 2
        assert {r["s"] for r in back.collect()} == {"a", "b"}

    # extension inference + partitioned layout
    files.write_sink(df, f"{tmpdir}/part.parquet", partition_by=["s"])
    back = files.read_source(spark, f"{tmpdir}/part.parquet")
    assert back.count() == 2
    import os
    assert os.path.isdir(f"{tmpdir}/part.parquet/s=a")


def test_compact_small_files(spark, tmpdir):
    from pyspark_playground_spark.sources import files as fsrc

    path = f"{tmpdir}/fragmented"
    # many tiny files (AQE may coalesce some of the 20 shuffle partitions)
    spark.range(20).repartition(20).write.parquet(path)
    before = fsrc.describe_files(spark, path)
    assert before["n_files"] > 1
    report = fsrc.compact_small_files(spark, path, target_file_bytes=1 << 30)
    after = fsrc.describe_files(spark, path)
    assert after["n_files"] == 1 and report["target_partitions"] == 1
    # contents identical, path stable
    assert sorted(r["id"] for r in spark.read.parquet(path).collect()) == list(range(20))


def test_partitioned_write_prunes_partitions(spark, tmpdir):
    """Hive-partitioned sink + filter on the partition column: the read
    plan must show partition pruning (PartitionFilters), not a full scan —
    the property that turns a 100 TB date-partitioned table into a
    single-day read."""
    from pyspark.sql import functions as F
    from pyspark_playground_spark.sources import files as fs

    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 4).cast("string").alias("shard"),
    )
    path = f"{tmpdir}/part_tbl"
    fs.write_sink(df, path, partition_by=["shard"])

    back = spark.read.parquet(path).where(F.col("shard") == "2")
    plan = back._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "PartitionFilters" in plan
    import re
    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan).group(1)
    assert "shard" in pf, plan
    assert back.count() == 25


def test_bucketed_tables_join_without_shuffle(spark):
    """X3 pinned: two tables bucketed+sorted on the join key join with
    ZERO exchanges — the co-located join that makes per-batch anti-joins
    and hub⋈sat reads shuffle-free on the table side at 100 TB."""
    import re
    from pyspark.sql import functions as F
    from pyspark_playground_spark.conventions import VaultConfig
    from pyspark_playground_spark.sources import catalog as cat

    spark.sql("CREATE DATABASE IF NOT EXISTS bj_db")
    cfg = VaultConfig(optimize_partitioning=True)
    a = spark.range(1000).select(F.col("id").alias("k"), F.lit("a").alias("va"))
    b = spark.range(500).select(F.col("id").alias("k"), F.lit("b").alias("vb"))
    cat.write_table(a, "bj_db", "bj_a", mode="overwrite",
                    config=cfg, bucket_columns=["k"])
    cat.write_table(b, "bj_db", "bj_b", mode="overwrite",
                    config=cfg, bucket_columns=["k"])
    try:
        # disable auto-broadcast so the join would otherwise shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = cat.read_table(spark, "bj_db", "bj_a").join(
            cat.read_table(spark, "bj_db", "bj_b"), "k"
        )
        plan = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0, plan
        assert "SortMergeJoin" in plan, plan
        assert j.count() == 500
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP DATABASE bj_db CASCADE")


def test_quarantine_read_splits_clean_and_corrupt(spark, tmp_path):
    from pyspark_playground_spark.sources.files import read_source_with_quarantine

    p = tmp_path / "feed.jsonl"
    p.write_text(
        '{"id": 1, "v": "a"}\n'
        "this is not json\n"
        '{"id": 2, "v": "b"}\n'
        '{"id": "NOT_A_NUMBER", "v": "c"}\n'
    )
    clean, quarantined = read_source_with_quarantine(
        spark, str(p), "id BIGINT, v STRING"
    )
    assert sorted((r.id, r.v) for r in clean.collect()) == [(1, "a"), (2, "b")]
    bad = [r.raw_record for r in quarantined.collect()]
    assert len(bad) == 2
    assert any("not json" in b for b in bad)
    assert any("NOT_A_NUMBER" in b for b in bad)


def test_quarantine_read_rejects_binary_formats(spark, tmp_path):
    import pytest

    from pyspark_playground_spark.sources.files import read_source_with_quarantine

    with pytest.raises(ValueError):
        read_source_with_quarantine(spark, "x.parquet", "id BIGINT")


def test_schema_drift_report_detects_all_three_kinds(spark):
    from pyspark_playground_spark.sources.files import schema_drift_report

    expected = "id BIGINT, name STRING, price DOUBLE"
    observed = "id BIGINT, name INT, discount DOUBLE"
    report = schema_drift_report(expected, observed)
    by_col = {r["column"]: r for r in report}
    assert by_col["name"]["status"] == "type_changed"
    assert by_col["name"]["expected"] == "string"
    assert by_col["price"]["status"] == "missing"
    assert by_col["discount"]["status"] == "added"
    assert len(report) == 3
    # identical schemas → no drift; nullability flips are not drift
    assert schema_drift_report(expected, expected) == []
    df_schema = spark.createDataFrame([(1, "a", 0.5)],
                                      "id BIGINT, name STRING, price DOUBLE").schema
    assert schema_drift_report(expected, df_schema) == []


def test_write_atomic_publishes_and_survives_replacement(spark, tmp_path):
    from pyspark_playground_spark.sources.files import write_atomic

    target = str(tmp_path / "tbl")
    df1 = spark.range(5).selectExpr("id", "id * 2 AS v")
    write_atomic(df1, target)
    assert spark.read.parquet(target).count() == 5
    # second publish replaces atomically; readers see old or new, never half
    df2 = spark.range(9).selectExpr("id", "id * 3 AS v")
    write_atomic(df2, target)
    out = spark.read.parquet(target)
    assert out.count() == 9
    assert out.selectExpr("max(v)").first()[0] == 24
    # no staging/old debris left behind
    import os

    parent = os.path.dirname(target)
    leftovers = [d for d in os.listdir(parent)
                 if d.startswith(".__stage_") or "__old_" in d]
    assert leftovers == []


def test_join_size_report_is_exact_cardinality(spark):
    """est_rows equals the actual inner-join row count."""
    left = spark.createDataFrame(
        [("a",)] * 10 + [("b",)] * 3 + [("only_left",)], "k string"
    )
    right = spark.createDataFrame(
        [("a",)] * 7 + [("b",)] * 2 + [("only_right",)], "k string"
    )
    row = skew.join_size_report(left, right, ["k"]).collect()[0]
    actual = left.join(right, ["k"]).count()
    assert row["est_rows"] == actual == 10 * 7 + 3 * 2
    assert row["max_cell"] == 70 and row["n_join_keys"] == 2
    assert row["top_cells"].split(",")[0] == "a:70"


def test_join_size_report_null_keys_and_separator_collisions(spark):
    """NULL keys never match an equi-join so they must not be counted, and
    a '|' inside a value must not merge distinct multi-column keys."""
    left = spark.createDataFrame(
        [("a|b", "x"), ("a", "b|x"), (None, "z"), ("k", None), ("k", "v")],
        "k1 string, k2 string",
    )
    right = spark.createDataFrame(
        [("a|b", "x"), ("a", "b|x"), (None, "z"), ("k", "v"), ("k", "v")],
        "k1 string, k2 string",
    )
    row = skew.join_size_report(left, right, ["k1", "k2"]).collect()[0]
    actual = left.join(right, ["k1", "k2"]).count()
    assert row["est_rows"] == actual == 4
    assert row["n_join_keys"] == 3


def test_codegen_cache_sized_for_the_engine_query_mix(spark):
    """The engine's session default for the whole-stage-codegen class
    cache must cover the full query mix: at Spark's 100-entry default
    the PQ recall pipeline alone (~91 codegen units) thrashes the
    cache, so EVERY re-execution re-runs Janino + JIT on identical
    generated source (measured r11: 24 recompiled units and 6-16 s of
    JIT-compiler time per repeat, with 3-5x nondeterministic wall
    spikes bleeding into neighboring queries in a long-lived driver).
    Raising it is pure driver metaspace, no plan or result change."""
    assert int(spark.conf.get("spark.sql.codegen.cache.maxEntries")) >= 5000
