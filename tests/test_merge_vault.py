"""v1 merge-style loaders: hub last_seen_date upsert + satellite end-dating
(reference pysparkvault.py:22-91, LoadRaw.py:442-526)."""

from __future__ import annotations

import hashlib
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from pyspark_playground_spark.operators import merge as mg

L1 = datetime(2026, 7, 1)
L2 = datetime(2026, 7, 2)
L3 = datetime(2026, 7, 3)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


@pytest.fixture(scope="module")
def mv(spark):
    spark.sql("DROP DATABASE IF EXISTS mv_test CASCADE")
    return mg.MergeVault(spark, database="mv_test")


def test_hub_upsert_last_seen(spark, mv):
    b1 = spark.createDataFrame([("c1", "Ada"), ("c2", "Grace")], "id string, name string")
    mv.load_hub("hub_customers", b1, ["id"], load_ts=L1, record_source="crm")
    hub = spark.table("mv_test.hub_customers")
    assert hub.count() == 2
    r = hub.filter(F.col("hkey") == _md5("c1")).collect()[0]
    assert r["load_date"] == L1 and r["last_seen_date"] == L1

    # batch 2: c1 seen again, c3 new → c1 keeps load_date, bumps last_seen
    b2 = spark.createDataFrame([("c1", "Ada"), ("c3", "Alan")], "id string, name string")
    mv.load_hub("hub_customers", b2, ["id"], load_ts=L2, record_source="crm")
    hub = spark.table("mv_test.hub_customers")
    assert hub.count() == 3
    r1 = hub.filter(F.col("hkey") == _md5("c1")).collect()[0]
    assert r1["load_date"] == L1 and r1["last_seen_date"] == L2
    r2 = hub.filter(F.col("hkey") == _md5("c2")).collect()[0]
    assert r2["last_seen_date"] == L1  # not in batch 2 → untouched
    r3 = hub.filter(F.col("hkey") == _md5("c3")).collect()[0]
    assert r3["load_date"] == L2


def test_satellite_insert_and_end_dating(spark, mv):
    b1 = spark.createDataFrame([("c1", "Ada", "London")], "id string, name string, city string")
    mv.load_satellite("sat_customers", b1, ["id"], load_ts=L1)
    sat = spark.table("mv_test.sat_customers")
    assert sat.count() == 1
    assert sat.collect()[0]["load_end_date"] is None  # open version

    # batch 2: attribute change → old version closed at new load date
    b2 = spark.createDataFrame([("c1", "Ada", "Paris")], "id string, name string, city string")
    mv.load_satellite("sat_customers", b2, ["id"], load_ts=L2)
    sat = spark.table("mv_test.sat_customers").orderBy("load_date").collect()
    assert len(sat) == 2
    assert sat[0]["city"] == "London" and sat[0]["load_end_date"] == L2
    assert sat[1]["city"] == "Paris" and sat[1]["load_end_date"] is None

    # batch 3: unchanged attributes → no new version, nothing re-dated
    mv.load_satellite("sat_customers", b2, ["id"], load_ts=L3)
    sat = spark.table("mv_test.sat_customers").orderBy("load_date").collect()
    assert len(sat) == 2
    assert sat[1]["load_end_date"] is None


def test_satellite_multiple_keys_and_idempotency(spark, mv):
    b = spark.createDataFrame(
        [("k1", "v1"), ("k2", "w1")], "id string, attr string")
    mv.load_satellite("sat_multi", b, ["id"], load_ts=L1)
    b2 = spark.createDataFrame(
        [("k1", "v2"), ("k2", "w1")], "id string, attr string")
    mv.load_satellite("sat_multi", b2, ["id"], load_ts=L2)
    sat = spark.table("mv_test.sat_multi")
    assert sat.count() == 3  # k1 has 2 versions, k2 has 1
    k1 = sat.filter(F.col("hkey") == _md5("k1")).orderBy("load_date").collect()
    assert k1[0]["load_end_date"] == L2 and k1[1]["load_end_date"] is None
    k2 = sat.filter(F.col("hkey") == _md5("k2")).collect()
    assert k2[0]["load_end_date"] is None

    # replaying batch 2 is a no-op (insert-only on (hkey, hdiff))
    mv.load_satellite("sat_multi", b2, ["id"], load_ts=L3)
    assert spark.table("mv_test.sat_multi").count() == 3


def test_kernels_pure(spark):
    """Kernel functions work standalone (no catalog)."""
    upd1 = mg.prepare_hub_updates(
        spark.createDataFrame([("a",)], "id string"), ["id"],
        load_ts=L1, record_source="x")
    full = mg.hub_upsert(None, upd1)
    upd2 = mg.prepare_hub_updates(
        spark.createDataFrame([("a",), ("b",)], "id string"), ["id"],
        load_ts=L2, record_source="x")
    full2 = mg.hub_upsert(full, upd2)
    rows = {r["id"]: r for r in full2.collect()}
    assert rows["a"]["load_date"] == L1 and rows["a"]["last_seen_date"] == L2
    assert rows["b"]["load_date"] == L2


def test_link_upsert_last_seen(spark, mv):
    from pyspark_playground_spark.conventions import LinkedHubDefinition

    members = [LinkedHubDefinition("orders", "order_id"),
               LinkedHubDefinition("customers", "cust_id")]
    b1 = spark.createDataFrame([("o1", "c1"), ("o2", "c2")],
                               "order_id string, cust_id string")
    mv.load_link("lnk_oc", b1, members, load_ts=L1, record_source="crm")
    lnk = spark.table("mv_test.lnk_oc")
    assert lnk.count() == 2
    assert set(lnk.columns) >= {"hkey", "orders_hkey", "customers_hkey",
                                "load_date", "last_seen_date", "record_source"}

    b2 = spark.createDataFrame([("o1", "c1"), ("o3", "c1")],
                               "order_id string, cust_id string")
    mv.load_link("lnk_oc", b2, members, load_ts=L2, record_source="crm")
    lnk = spark.table("mv_test.lnk_oc")
    assert lnk.count() == 3
    k = _md5(f"{_md5('o1')},{_md5('c1')}")
    r = lnk.filter(F.col("hkey") == k).collect()[0]
    assert r["load_date"] == L1 and r["last_seen_date"] == L2


# ---------------------------------------------------------------------------
# Delta MERGE contract (delta-spark absent here: a recording fake pins the
# exact MERGE condition + clauses each builder emits — S9/S10 evidence)
# ---------------------------------------------------------------------------

class _RecordingMerge:
    def __init__(self, log):
        self.log = log

    def whenMatchedUpdate(self, set=None, condition=None):
        self.log.append(("whenMatchedUpdate", set, condition))
        return self

    def whenNotMatchedInsertAll(self):
        self.log.append(("whenNotMatchedInsertAll",))
        return self

    def execute(self):
        self.log.append(("execute",))


class _RecordingDeltaTable:
    def __init__(self):
        self.log = []

    def alias(self, name):
        self.log.append(("alias", name))
        return self

    def merge(self, updates, condition):
        self.log.append(("merge", condition))
        return _RecordingMerge(self.log)


def test_delta_hub_merge_contract(spark):
    df = spark.createDataFrame([("c1", "Ada")], "id string, name string")
    updates = mg.prepare_hub_updates(df, ["id"], load_ts=L1, record_source="crm")
    dt = _RecordingDeltaTable()
    mg.MergeVault.build_hub_merge(dt, updates).execute()
    assert dt.log == [
        ("alias", "hub"),
        ("merge", "hub.hkey = updates.hkey"),
        ("whenMatchedUpdate", {"last_seen_date": "updates.last_seen_date"}, None),
        ("whenNotMatchedInsertAll",),
        ("execute",),
    ]


def test_delta_link_merge_contract(spark):
    from pyspark_playground_spark.conventions import LinkedHubDefinition

    df = spark.createDataFrame([("o1", "c1")], "order_id string, cust_id string")
    updates = mg.prepare_link_updates(
        df,
        [LinkedHubDefinition("orders", "order_id"),
         LinkedHubDefinition("customers", "cust_id")],
        load_ts=L1, record_source="crm",
    )
    dt = _RecordingDeltaTable()
    mg.MergeVault.build_link_merge(dt, updates).execute()
    assert dt.log == [
        ("alias", "link"),
        ("merge", "link.hkey = updates.hkey"),
        ("whenMatchedUpdate", {"last_seen_date": "updates.last_seen_date"}, None),
        ("whenNotMatchedInsertAll",),
        ("execute",),
    ]


def test_delta_satellite_merge_contract(spark):
    df = spark.createDataFrame([("c1", "Ada")], "id string, name string")
    updates = mg.prepare_satellite_updates(df, ["id"], load_ts=L1)
    dt = _RecordingDeltaTable()
    mg.MergeVault.build_satellite_merge(dt, updates).execute()
    # insert-only on (hkey, hdiff): no matched clause — end-dating is the
    # separate window pass (satellite_upsert), not part of the MERGE
    assert dt.log == [
        ("alias", "sat"),
        ("merge", "sat.hkey = updates.hkey AND sat.hdiff = updates.hdiff"),
        ("whenNotMatchedInsertAll",),
        ("execute",),
    ]
