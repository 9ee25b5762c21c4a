"""v1-generation merge loaders: upsert hubs/links, end-dated satellites.

Parity target: the reference's legacy generation (S9/S10 in SURVEY.md §2.1):

- ``load_hub``/``load_link`` upserts (pysparkvault.py:22-49,
  LoadRaw.py:442-494): Delta ``MERGE`` on hkey — update ``last_seen_date``
  when matched, insert when not.
- ``load_satellite`` (pysparkvault.py:52-91, LoadRaw.py:497-526): insert
  when ``(hkey, hdiff)`` unseen with ``load_end_date = NULL``, then close
  superseded versions. The reference end-dates with a **full-outer
  self-join** (``l.load_end_date IS NULL AND l.hdiff != r.hdiff AND
  l.load_date < r.load_date``, LoadRaw.py:514-520) — O(versions²) per key;
  we compute the same closing date with ``lead(load_date)`` over a per-key
  window (versions per key are distinct-hdiff by construction, so the next
  version is the earliest differing one). Same output, one shuffle.

Physical strategy: these kernels are pure ``(existing, updates) → new full
table`` functions. With Delta available, ``MergeVault`` uses a real
``MERGE INTO`` (in-place, transactional); without it (this environment) it
falls back to read-merge-overwrite on parquet catalog tables, breaking
lineage with ``localCheckpoint`` before the overwrite. At cluster scale the
fallback rewrites the table per batch — that is exactly why the v2 engine's
insert-only anti-join design (operators/raw_vault.py) is the primary path
and this module exists for API/semantic parity with v1 pipelines.

Environment note (verified 2026-08-13): ``delta-spark`` is not installed in
this sandbox (``import delta`` → ModuleNotFoundError) and package
installation is disallowed here, so the Delta branches cannot execute for
real. They are instead contract-pinned by recording fakes in
``tests/test_merge_vault.py`` (merge condition + clause shapes asserted
against LoadRaw.py:442-526); on a Delta-enabled cluster the same code paths
run unmodified.
"""

from __future__ import annotations

from collections.abc import Sequence
from datetime import datetime

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyspark_playground_spark.functions.hashing import hash_diff, hash_key

HUB_SYSTEM_COLS = ["hkey", "load_date", "last_seen_date", "record_source"]
SAT_SYSTEM_COLS = ["hkey", "hdiff", "load_date", "load_end_date"]


def delta_available() -> bool:
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def prepare_hub_updates(
    df: DataFrame,
    business_key_columns: Sequence[str],
    *,
    load_ts: datetime | Column,
    record_source: str,
    hash_function: str = "md5",
) -> DataFrame:
    """Shape a source batch into v1 hub-update rows
    (pysparkvault.py:26-41: hkey, load_date, last_seen_date, record_source)."""
    ts = F.lit(load_ts).cast("timestamp") if isinstance(load_ts, datetime) else load_ts
    return (
        df.withColumn("hkey", hash_key(list(business_key_columns), hash_function))
        .withColumn("load_date", ts)
        .withColumn("last_seen_date", ts)
        .withColumn("record_source", F.lit(record_source))
        .select(*HUB_SYSTEM_COLS, *business_key_columns)
        .dropDuplicates(["hkey"])
    )


def hub_upsert(existing: DataFrame | None, updates: DataFrame) -> DataFrame:
    """Merge semantics of the v1 hub/link loader (LoadRaw.py:442-458):
    matched → ``last_seen_date := updates.last_seen_date`` (original
    ``load_date`` kept), not matched → insert. Returns the new full table."""
    if existing is None or not existing.columns:
        return updates
    upd = updates.select(
        F.col("hkey").alias("__u_hkey"), F.col("last_seen_date").alias("__u_seen")
    )
    kept = (
        existing.join(upd, existing["hkey"] == F.col("__u_hkey"), "left")
        .withColumn(
            "last_seen_date", F.coalesce(F.col("__u_seen"), F.col("last_seen_date"))
        )
        .drop("__u_hkey", "__u_seen")
    )
    inserts = updates.join(existing.select("hkey"), on="hkey", how="left_anti")
    return kept.unionByName(inserts)


def prepare_satellite_updates(
    df: DataFrame,
    business_key_columns: Sequence[str],
    *,
    load_ts: datetime | Column,
    attribute_columns: Sequence[str] | None = None,
    hash_function: str = "md5",
) -> DataFrame:
    """Shape a source batch into v1 satellite-update rows
    (pysparkvault.py:56-72: hkey, hdiff, load_date, load_end_date=NULL)."""
    attrs = list(
        attribute_columns
        if attribute_columns is not None
        else [c for c in df.columns if c not in business_key_columns]
    )
    ts = F.lit(load_ts).cast("timestamp") if isinstance(load_ts, datetime) else load_ts
    return (
        df.withColumn("hkey", hash_key(list(business_key_columns), hash_function))
        .withColumn("hdiff", hash_diff(attrs, hash_function))
        .withColumn("load_date", ts)
        .withColumn("load_end_date", F.lit(None).cast("timestamp"))
        .select(*SAT_SYSTEM_COLS, *attrs)
        .dropDuplicates(["hkey", "hdiff"])
    )


def satellite_upsert(existing: DataFrame | None, updates: DataFrame) -> DataFrame:
    """v1 satellite merge + end-dating (LoadRaw.py:497-526).

    1. Insert rows whose ``(hkey, hdiff)`` is unseen (insert-only on that
       key: a re-appearing attribute state does not create a new version —
       a known v1 semantic kept for parity; v2 satellites key on
       (hkey, load_date) instead).
    2. Close superseded versions: an open row (``load_end_date IS NULL``)
       whose key has a later version gets ``load_end_date := next version's
       load_date`` — the window formulation of the reference's full-outer
       self-join.
    """
    if existing is None or not existing.columns:
        merged = updates
    else:
        inserts = updates.join(
            existing.select("hkey", "hdiff"), on=["hkey", "hdiff"], how="left_anti"
        )
        merged = existing.unionByName(inserts)

    w = Window.partitionBy("hkey").orderBy("load_date")
    nxt = F.lead("load_date").over(w)
    return merged.withColumn(
        "load_end_date",
        F.when(F.col("load_end_date").isNotNull(), F.col("load_end_date")).otherwise(nxt),
    )


# ---------------------------------------------------------------------------
# table-backed wrapper
# ---------------------------------------------------------------------------

class MergeVault:
    """v1-style loaders over catalog tables.

    Uses Delta ``MERGE INTO`` when delta-spark is importable; otherwise a
    read-merge-overwrite on the session catalog's parquet tables.
    """

    def __init__(self, spark: SparkSession, database: str = "merge_vault") -> None:
        self.spark = spark
        self.database = database
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")

    def _table(self, name: str) -> str:
        return f"{self.database}.{name}"

    def _read(self, name: str) -> DataFrame | None:
        if not self.spark.catalog.tableExists(self._table(name)):
            return None
        return self.spark.table(self._table(name))

    def _overwrite(self, df: DataFrame, name: str) -> None:
        # break lineage before overwriting a table we just read — local
        # checkpoint suffices in local mode; on a cluster use a reliable
        # checkpoint dir or Delta (which merges in place instead)
        df.localCheckpoint(eager=True).write.mode("overwrite").saveAsTable(
            self._table(name)
        )
        self.spark.catalog.refreshTable(self._table(name))

    def load_hub(
        self,
        name: str,
        df: DataFrame,
        business_key_columns: Sequence[str],
        *,
        load_ts: datetime,
        record_source: str,
    ) -> None:
        """v1 ``load_hub`` (pysparkvault.py:22-49)."""
        updates = prepare_hub_updates(
            df, business_key_columns, load_ts=load_ts, record_source=record_source
        )
        if delta_available():  # pragma: no cover - delta not in this env
            self._delta_merge_hub(name, updates)
            return
        self._overwrite(hub_upsert(self._read(name), updates), name)

    def load_link(
        self,
        name: str,
        df: DataFrame,
        members,
        *,
        load_ts: datetime,
        record_source: str,
    ) -> None:
        """v1 ``load_link`` (pysparkvault.py:93-..., LoadRaw.py:460-494):
        link hkey from the member hub hkeys; merge bumps last_seen_date."""
        updates = prepare_link_updates(
            df, members, load_ts=load_ts, record_source=record_source
        )
        if delta_available():  # pragma: no cover - delta not in this env
            self._delta_merge_link(name, updates)
            return
        self._overwrite(link_upsert(self._read(name), updates), name)

    def load_satellite(
        self,
        name: str,
        df: DataFrame,
        business_key_columns: Sequence[str],
        *,
        load_ts: datetime,
        attribute_columns: Sequence[str] | None = None,
    ) -> None:
        """v1 ``load_satellite`` (pysparkvault.py:52-91)."""
        updates = prepare_satellite_updates(
            df,
            business_key_columns,
            load_ts=load_ts,
            attribute_columns=attribute_columns,
        )
        if delta_available():  # pragma: no cover - delta not in this env
            self._delta_merge_satellite(name, updates)
            return
        self._overwrite(satellite_upsert(self._read(name), updates), name)

    # ---- Delta paths ------------------------------------------------------
    # The merge *builders* are static and take the DeltaTable handle as a
    # parameter: they are contract-tested with a recording fake in
    # tests/test_merge_vault.py (delta-spark is not installed in this
    # environment), so the MERGE condition and clauses are pinned even
    # though a real Delta execution only happens on a Delta-enabled cluster.

    @staticmethod
    def build_hub_merge(delta_table, updates: DataFrame):
        """v1 hub MERGE shape (LoadRaw.py:442-458): matched → bump
        last_seen_date only (original load_date kept), else insert all."""
        return (
            delta_table.alias("hub")
            .merge(updates.alias("updates"), "hub.hkey = updates.hkey")
            .whenMatchedUpdate(set={"last_seen_date": "updates.last_seen_date"})
            .whenNotMatchedInsertAll()
        )

    @staticmethod
    def build_link_merge(delta_table, updates: DataFrame):
        """v1 link MERGE ≡ hub MERGE on the link hkey (LoadRaw.py:480-494)."""
        return (
            delta_table.alias("link")
            .merge(updates.alias("updates"), "link.hkey = updates.hkey")
            .whenMatchedUpdate(set={"last_seen_date": "updates.last_seen_date"})
            .whenNotMatchedInsertAll()
        )

    @staticmethod
    def build_satellite_merge(delta_table, updates: DataFrame):
        """v1 satellite MERGE (LoadRaw.py:497-512): insert-only on
        (hkey, hdiff) — no matched clause; end-dating is a separate pass."""
        return (
            delta_table.alias("sat")
            .merge(
                updates.alias("updates"),
                "sat.hkey = updates.hkey AND sat.hdiff = updates.hdiff",
            )
            .whenNotMatchedInsertAll()
        )

    def _delta_merge_hub(self, name: str, updates: DataFrame) -> None:  # pragma: no cover
        from delta.tables import DeltaTable

        if not self.spark.catalog.tableExists(self._table(name)):
            updates.write.format("delta").saveAsTable(self._table(name))
            return
        self.build_hub_merge(
            DeltaTable.forName(self.spark, self._table(name)), updates
        ).execute()

    def _delta_merge_link(self, name: str, updates: DataFrame) -> None:  # pragma: no cover
        from delta.tables import DeltaTable

        if not self.spark.catalog.tableExists(self._table(name)):
            updates.write.format("delta").saveAsTable(self._table(name))
            return
        self.build_link_merge(
            DeltaTable.forName(self.spark, self._table(name)), updates
        ).execute()

    def _delta_merge_satellite(self, name: str, updates: DataFrame) -> None:  # pragma: no cover
        from delta.tables import DeltaTable

        if not self.spark.catalog.tableExists(self._table(name)):
            updates.write.format("delta").saveAsTable(self._table(name))
        else:
            self.build_satellite_merge(
                DeltaTable.forName(self.spark, self._table(name)), updates
            ).execute()
        # end-date pass: window formulation of LoadRaw.py:514-526
        closed = satellite_upsert(self.spark.table(self._table(name)),
                                  self.spark.table(self._table(name)).limit(0))
        closed.write.format("delta").mode("overwrite").saveAsTable(self._table(name))


def prepare_link_updates(
    df: DataFrame,
    members,
    *,
    load_ts: datetime | Column,
    record_source: str,
    hash_function: str = "md5",
) -> DataFrame:
    """Shape an association batch into v1 link-update rows: one hkey column
    per member hub + the combined link hkey (reference pysparkvault.py
    load_link / LoadRaw.py:460-494).

    ``members`` is a sequence of ``LinkedHubDefinition`` — FKs resolve by
    direct hash, as in v1 (which joins staging tables by business key).
    """
    from pyspark_playground_spark.operators.raw_vault import resolve_member_hkeys

    resolved, hkey_cols = resolve_member_hkeys(df, members, hash_function=hash_function)
    # v1 uses unprefixed lowercase column names (hkey, load_date, ...)
    resolved = resolved.withColumnRenamed("$__HKEY", "hkey")
    for c in hkey_cols:
        resolved = resolved.withColumnRenamed(c, c.replace("$__HKEY_", "").lower() + "_hkey")
    member_cols = [c.replace("$__HKEY_", "").lower() + "_hkey" for c in hkey_cols]
    ts = F.lit(load_ts).cast("timestamp") if isinstance(load_ts, datetime) else load_ts
    return (
        resolved.withColumn("load_date", ts)
        .withColumn("last_seen_date", ts)
        .withColumn("record_source", F.lit(record_source))
        .select("hkey", *member_cols, "load_date", "last_seen_date", "record_source")
        .dropDuplicates(["hkey"])
    )


#: v1 link merge ≡ hub merge: matched → bump last_seen_date, else insert
#: (LoadRaw.py:480-494 uses the identical MERGE shape for links)
link_upsert = hub_upsert
