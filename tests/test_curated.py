from datetime import datetime

from pyspark_playground_spark.conventions import DataVaultConventions
from pyspark_playground_spark.operators import curated as cu

C = DataVaultConventions()
T0 = datetime(2026, 1, 1)
T1 = datetime(2026, 1, 2)


def test_filter_retired(spark):
    df = spark.createDataFrame([(1, 0), (2, 1)], "id int, retired int")
    assert [r["id"] for r in cu.filter_retired(df).collect()] == [1]
    # absent column → pass-through
    df2 = spark.createDataFrame([(1,)], "id int")
    assert cu.filter_retired(df2).count() == 1


def test_join_typelist_replaces_code_in_place(spark):
    df = spark.createDataFrame([(1, "tl:1", "x")], "id int, status string, other string")
    ref = spark.createDataFrame(
        [("status_tl", "h", T0, "tl:1", "Open")],
        f"`{C.group()}` string, `{C.hdiff()}` string, `{C.load_date()}` timestamp,"
        " ID string, DESCRIPTION string",
    )
    out = cu.join_typelist(df, ref, "status", "status_tl")
    assert out.columns == ["id", "status", "other"]
    assert out.first()["status"] == "Open"


def test_join_user_information(spark):
    df = spark.createDataFrame(
        [(1, "u1", "u2")], "id int, CreateUserID string, UpdateUserID string"
    )
    users = spark.createDataFrame(
        [("u1", "Alice", T0), ("u1", "Alicia", T1), ("u2", "Bob", T0)],
        "ID string, NAME string, LOAD_DATE timestamp",
    )
    out = cu.join_user_information(df, users, load_date_column="LOAD_DATE")
    row = out.first()
    assert row["CreateUserID"] == "Alicia"  # latest version wins
    assert row["UpdateUserID"] == "Bob"


def test_replace_id_with_public_id(spark):
    df = spark.createDataFrame([(1, "77")], "id int, DirectorID string")
    directors = spark.createDataFrame([("77", "pc:dir-77")], "ID string, PublicID string")
    out = cu.replace_id_with_public_id(df, "DirectorID", directors, id_column="ID")
    assert out.first()["DirectorID"] == "pc:dir-77"


def test_map_to_curated(spark):
    df = spark.createDataFrame(
        [("m1", "tl:1", 0, T0, T1), ("m2", "tl:1", 1, T0, T1)],
        f"PublicID string, status string, retired int,"
        f" `{C.load_date()}` timestamp, `{C.load_end_date()}` timestamp",
    )
    ref = spark.createDataFrame(
        [("status_tl", "h", T0, "tl:1", "Open")],
        f"`{C.group()}` string, `{C.hdiff()}` string, `{C.load_date()}` timestamp,"
        " ID string, DESCRIPTION string",
    )
    out = cu.map_to_curated(
        df,
        [cu.FieldDefinition("PublicID", "MovieID"), cu.FieldDefinition("status", typelist="status_tl")],
        active_code_ref=ref,
    )
    rows = out.collect()
    assert len(rows) == 1  # retired row dropped
    assert out.columns == ["MovieID", "status", C.load_date(), C.load_end_date()]
    assert rows[0]["status"] == "Open"
