"""Table-backed RawVault engine: the reference's public API surface.

Mirrors ``pysparkvault/raw/RawVault.py``'s class API (SURVEY.md §2.11) —
``create_hub/link/satellite/...`` DDL plus ``stage_table`` and the
``load_*`` methods — implemented on top of the pure kernels in
``operators/raw_vault.py`` and the catalog sinks in ``sources/catalog.py``.
"""

from __future__ import annotations

from collections.abc import Sequence
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from pyspark_playground_spark.conventions import (
    ColumnDefinition,
    DataVaultConventions,
    LinkedHubDefinition,
    VaultConfig,
)
from pyspark_playground_spark.operators import raw_vault as rv
from pyspark_playground_spark.sources import catalog


class RawVault:
    """Insert-only raw vault over catalog tables (reference RawVault.py:53-1075)."""

    def __init__(
        self,
        spark: SparkSession,
        config: VaultConfig | None = None,
        conv: DataVaultConventions | None = None,
    ) -> None:
        self.spark = spark
        self.config = config or VaultConfig()
        self.conv = conv or DataVaultConventions()

    # ---- DDL (reference RawVault.py:64-192) -------------------------------
    def initialize_database(self) -> None:
        catalog.create_database(self.spark, self.config.staging_prepared_database)
        catalog.create_database(self.spark, self.config.raw_database)

    def _system_cols(self) -> list[ColumnDefinition]:
        c = self.conv
        return [
            ColumnDefinition(c.hkey(), T.StringType(), False),
            ColumnDefinition(c.load_date(), T.TimestampType(), False),
            ColumnDefinition(c.record_source(), T.StringType(), False),
        ]

    def create_hub(self, name: str, business_key_columns: Sequence[ColumnDefinition]) -> str:
        table = self.conv.hub_name(name)
        catalog.create_table(
            self.spark,
            self.config.raw_database,
            table,
            self._system_cols() + list(business_key_columns),
            config=self.config,
            bucket_columns=[self.conv.hkey()],
        )
        self.create_effectivity_satellite(name)
        return table

    def create_link(self, name: str, member_hkey_columns: Sequence[str]) -> str:
        c = self.conv
        table = c.link_name(name)
        cols = self._system_cols()[:1] + [
            ColumnDefinition(col, T.StringType(), True) for col in member_hkey_columns
        ] + self._system_cols()[1:]
        catalog.create_table(
            self.spark, self.config.raw_database, table, cols,
            config=self.config, bucket_columns=[c.hkey()],
        )
        self.create_effectivity_satellite(name)
        return table

    def create_satellite(self, name: str, attributes: Sequence[ColumnDefinition]) -> str:
        c = self.conv
        table = c.sat_name(name)
        cols = [
            ColumnDefinition(c.hkey(), T.StringType(), False),
            ColumnDefinition(c.hdiff(), T.StringType(), False),
            ColumnDefinition(c.load_date(), T.TimestampType(), False),
        ] + list(attributes)
        catalog.create_table(
            self.spark, self.config.raw_database, table, cols,
            config=self.config, bucket_columns=[c.hkey(), c.load_date()],
        )
        return table

    def create_effectivity_satellite(self, name: str) -> str:
        c = self.conv
        table = c.effectivity_sat_name(name)
        cols = [
            ColumnDefinition(c.hkey(), T.StringType(), False),
            ColumnDefinition(c.hdiff(), T.StringType(), False),
            ColumnDefinition(c.deleted(), T.BooleanType(), False),
            ColumnDefinition(c.load_date(), T.TimestampType(), False),
        ]
        catalog.create_table(
            self.spark, self.config.raw_database, table, cols,
            config=self.config, bucket_columns=[c.hkey(), c.load_date()],
        )
        return table

    def create_reference_table(
        self, name: str, id_column: ColumnDefinition, attributes: Sequence[ColumnDefinition]
    ) -> str:
        c = self.conv
        table = c.ref_name(name)
        cols = [
            ColumnDefinition(c.hdiff(), T.StringType(), False),
            ColumnDefinition(c.load_date(), T.TimestampType(), False),
            id_column,
        ] + list(attributes)
        catalog.create_table(self.spark, self.config.raw_database, table, cols, config=self.config)
        return table

    def create_code_reference_table(
        self, name: str, id_column: ColumnDefinition, attributes: Sequence[ColumnDefinition]
    ) -> str:
        c = self.conv
        table = c.ref_name(name)
        cols = [
            ColumnDefinition(c.group(), T.StringType(), False),
            ColumnDefinition(c.hdiff(), T.StringType(), False),
            ColumnDefinition(c.load_date(), T.TimestampType(), False),
            id_column,
        ] + list(attributes)
        catalog.create_table(self.spark, self.config.raw_database, table, cols, config=self.config)
        return table

    # ---- staging (reference RawVault.py:996-1043) -------------------------
    def stage_table(
        self,
        name: str,
        source_path: str,
        *,
        load_date_column: str,
        operation_column: str | None,
        hkey_columns: Sequence[str] = (),
        snapshot_override_column: str | None = None,
        timestamp_pattern: str | None = None,
    ) -> DataFrame:
        df = self.spark.read.parquet(source_path)
        staged = rv.prepare_staging(
            df,
            load_date_column=load_date_column,
            operation_column=operation_column,
            record_source=self.config.record_source,
            hkey_columns=hkey_columns,
            snapshot_override_column=snapshot_override_column,
            timestamp_pattern=timestamp_pattern,
            conv=self.conv,
            hash_function=self.config.hash_function,
        )
        catalog.write_table(
            staged,
            self.config.staging_prepared_database,
            name,
            mode="overwrite",
            config=self.config,
            bucket_columns=[self.conv.hkey()] if hkey_columns else None,
        )
        return self.spark.table(f"{self.config.staging_prepared_database}.{name}")

    # ---- loads ------------------------------------------------------------
    def _raw(self, table: str) -> DataFrame:
        return self.spark.table(f"{self.config.raw_database}.{table}")

    def refresh_tables(self) -> None:
        """Invalidate cached file listings of all raw-vault tables
        (reference S11, ``REFRESH TABLE`` after writes, Sample.py:132).

        Required when another session writes the tables — e.g. the cloned
        micro-batch session inside a Structured Streaming ``foreachBatch`` —
        so the next batch's anti-joins see the appended files.
        """
        for t in self.spark.catalog.listTables(self.config.raw_database):
            self.spark.catalog.refreshTable(f"{self.config.raw_database}.{t.name}")

    def _append(self, df: DataFrame, table: str, bucket_columns: Sequence[str]) -> None:
        catalog.write_table(
            df, self.config.raw_database, table,
            mode="append", config=self.config, bucket_columns=bucket_columns,
        )

    def load_hub(
        self,
        staged: DataFrame,
        name: str,
        business_key_columns: Sequence[str],
        *,
        satellites: dict[str, Sequence[str]] | None = None,
        load_ts: datetime | None = None,
    ) -> None:
        """Hub append + effectivity satellite + attribute satellites
        (reference RawVault.py:194-260 fan-out)."""
        c = self.conv
        staged = rv._with_load_meta(staged, c, load_ts, self.config.record_source)
        hub_table = c.hub_name(name)
        new_hubs = rv.hub_rows(
            staged, business_key_columns,
            existing=self._raw(hub_table), load_ts=load_ts,
            record_source=self.config.record_source,
            conv=c, config=self.config, hash_function=self.config.hash_function,
        )
        self._append(new_hubs, hub_table, [c.hkey()])

        eff_table = c.effectivity_sat_name(name)
        new_eff = rv.effectivity_rows(
            staged, existing=self._raw(eff_table),
            conv=c, config=self.config, hash_function=self.config.hash_function,
        )
        self._append(new_eff, eff_table, [c.hkey(), c.load_date()])

        for sat_name, attrs in (satellites or {}).items():
            sat_table = c.sat_name(sat_name)
            new_sat = rv.satellite_rows(
                staged, attrs, existing=self._raw(sat_table),
                conv=c, config=self.config, hash_function=self.config.hash_function,
            )
            self._append(new_sat, sat_table, [c.hkey(), c.load_date()])

    def load_link(
        self,
        staged_from: DataFrame,
        name: str,
        *,
        from_name: str,
        to_name: str,
        fk_column: str,
        to_resolution: DataFrame | None = None,
        load_ts: datetime | None = None,
    ) -> None:
        c = self.conv
        staged_from = rv._with_load_meta(staged_from, c, load_ts, self.config.record_source)
        link_table = c.link_name(name)
        eff_table = c.effectivity_sat_name(name)
        new_links, new_eff = rv.link_rows(
            staged_from,
            from_name=from_name, to_name=to_name, fk_column=fk_column,
            to_resolution=to_resolution,
            existing_link=self._raw(link_table),
            existing_effectivity=self._raw(eff_table),
            load_ts=load_ts, record_source=self.config.record_source,
            conv=c, config=self.config, hash_function=self.config.hash_function,
        )
        self._append(new_links, link_table, [c.hkey()])
        self._append(new_eff, eff_table, [c.hkey(), c.load_date()])

    def load_multilink(
        self,
        staged: DataFrame,
        name: str,
        members: Sequence[LinkedHubDefinition],
        *,
        load_ts: datetime | None = None,
        resolutions: dict[str, DataFrame] | None = None,
    ) -> None:
        c = self.conv
        link_table = c.link_name(name)
        new_links = rv.multilink_rows(
            staged, members,
            existing_link=self._raw(link_table), load_ts=load_ts,
            record_source=self.config.record_source,
            conv=c, config=self.config, hash_function=self.config.hash_function,
            resolutions=resolutions,
        )
        self._append(new_links, link_table, [c.hkey()])

        # association-table effectivity: DELETE ops close the link
        eff_table = c.effectivity_sat_name(name)
        staged_k, _ = rv.resolve_member_hkeys(
            staged.drop(c.hkey()),
            members,
            conv=c,
            hash_function=self.config.hash_function,
            resolutions=resolutions,
        )
        new_eff = rv.effectivity_rows(
            staged_k, existing=self._raw(eff_table),
            conv=c, config=self.config, hash_function=self.config.hash_function,
        )
        self._append(new_eff, eff_table, [c.hkey(), c.load_date()])

    def load_references(
        self, staged: DataFrame, name: str, id_column: str, attributes: Sequence[str]
    ) -> None:
        c = self.conv
        table = c.ref_name(name)
        new_refs = rv.reference_rows(
            staged, id_column, attributes, existing=self._raw(table),
            conv=c, config=self.config, hash_function=self.config.hash_function,
        )
        self._append(new_refs, table, [])

    def load_code_references(
        self, staged: DataFrame, name: str, group: str, id_column: str, attributes: Sequence[str]
    ) -> None:
        c = self.conv
        table = c.ref_name(name)
        new_refs = rv.code_reference_rows(
            staged, group, id_column, attributes, existing=self._raw(table),
            conv=c, config=self.config, hash_function=self.config.hash_function,
        )
        self._append(new_refs, table, [])
