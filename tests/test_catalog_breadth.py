"""Production-shape catalog breadth: the reference's notebook driver loads
~49 staged tables / 41 hubs / 44 links in one run (SURVEY.md §0,
pysparkvault/notebooks/load_raw.py). This exercises the declarative layer at
that catalog shape: 20 hub tables + 10 FK links created and loaded in one
batch, then counts + spot semantics verified."""

from __future__ import annotations

import json
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from pyspark_playground_spark.conventions import DataVaultConventions, VaultConfig
from pyspark_playground_spark.plans.declarative import (
    DeclarativeVault,
    SourceSchema,
    VaultMapping,
)

C = DataVaultConventions()
N_ENTITIES = 20
N_LINKS = 10
ROWS_PER_TABLE = 50


def _spec():
    tables = []
    hubs, links, sats = [], [], []
    for i in range(N_ENTITIES):
        name = f"ent{i:02d}"
        cols = [{"name": "ID", "type": "text"},
                {"name": "VAL", "type": "integer"}]
        fks = []
        if i < N_LINKS:  # ent00..ent09 reference their successor entity
            cols.append({"name": "REF_ID", "type": "text"})
            fks.append({"column": "REF_ID",
                        "foreignColumn": {"table": f"ent{i+1:02d}", "column": "ID"}})
        tables.append({"name": name, "columns": cols, "primaryKey": ["ID"],
                       "foreignKeys": fks})
        hubs.append({"name": f"HUB__{name.upper()}", "source_table": name,
                     "business_keys": ["ID"]})
        sats.append({"name": f"SAT__{name.upper()}", "hub": f"HUB__{name.upper()}",
                     "source_table": name})
        if i < N_LINKS:
            links.append({
                "name": f"LNK__{name.upper()}_REF",
                "source_table": name,
                "to": [{"source_column": "REF_ID",
                        "source_foreign_key": {"table": f"ent{i+1:02d}", "column": "ID"}}],
            })
    schema = SourceSchema.from_dict({"name": "wide", "tables": tables})
    mapping = VaultMapping.from_dict({"hubs": hubs, "links": links, "satellites": sats})
    return schema, mapping


def test_wide_catalog_single_batch_load(spark):
    spark.sql("DROP DATABASE IF EXISTS wide_stg CASCADE")
    spark.sql("DROP DATABASE IF EXISTS wide_raw CASCADE")
    schema, mapping = _spec()
    dv = DeclarativeVault(
        spark, schema, mapping,
        VaultConfig(staging_prepared_database="wide_stg", raw_database="wide_raw",
                    record_source="wide", optimize_partitioning=False),
    )
    created = dv.create_tables()
    # 20 hubs + 20 sats + 10 links (+ effectivity sats auto-created)
    assert len(created) == N_ENTITIES * 2 + N_LINKS

    t0 = datetime(2026, 6, 1)
    batch = {}
    for i in range(N_ENTITIES):
        name = f"ent{i:02d}"
        if i < N_LINKS:
            rows = [("create", t0, f"{name}-k{j}", j, f"ent{i+1:02d}-k{j}")
                    for j in range(ROWS_PER_TABLE)]
            batch[name] = spark.createDataFrame(
                rows, "OPERATION string, LOAD_DATE timestamp, ID string, VAL int, REF_ID string")
        else:
            rows = [("create", t0, f"{name}-k{j}", j) for j in range(ROWS_PER_TABLE)]
            batch[name] = spark.createDataFrame(
                rows, "OPERATION string, LOAD_DATE timestamp, ID string, VAL int")
    dv.load_batch(batch, load_ts=datetime(2026, 7, 1))

    # every hub/sat/link populated with the expected cardinality
    for i in range(N_ENTITIES):
        nm = f"ENT{i:02d}"
        assert spark.table(f"wide_raw.HUB__{nm}").count() == ROWS_PER_TABLE, nm
        assert spark.table(f"wide_raw.SAT__{nm}").count() == ROWS_PER_TABLE, nm
    for i in range(N_LINKS):
        lnk = spark.table(f"wide_raw.LNK__ENT{i:02d}_REF")
        assert lnk.count() == ROWS_PER_TABLE
        # spot-check one resolved member: FK resolved through staged target
        assert lnk.filter(F.col(C.hkey_of(f"ent{i+1:02d}")).isNull()).count() == 0
