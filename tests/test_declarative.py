"""Declarative layer: schema JSON + mapping YAML → auto-created, auto-loaded
vault (the reference's aspirational v3 generation; spec format from
``features/imdb-schema.json`` / ``features/imdb-mapping.yaml``).

The scenario deliberately keys HUB__MOVIES on (NAME, YEAR) while links
reference movies by ID — exercising the staged-target / hub⋈sat FK
resolution (RawVault.py:523-534) instead of the identity hash."""

from __future__ import annotations

import hashlib
from datetime import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyspark_playground_spark.conventions import DataVaultConventions, VaultConfig
from pyspark_playground_spark.plans.declarative import (
    DeclarativeVault,
    SourceSchema,
    VaultMapping,
)

C = DataVaultConventions()

SCHEMA_JSON = """
{
  "name": "imdb",
  "tables": [
    {"name": "movies",
     "columns": [{"name": "ID", "type": "text"}, {"name": "NAME", "type": "text"},
                 {"name": "YEAR", "type": "integer"}, {"name": "DIRECTOR", "type": "text"},
                 {"name": "RATING", "type": "double"}],
     "primaryKey": ["ID"],
     "foreignKeys": [{"column": "DIRECTOR",
                      "foreignColumn": {"table": "directors", "column": "ID"}}]},
    {"name": "directors",
     "columns": [{"name": "ID", "type": "text"}, {"name": "NAME", "type": "text"},
                 {"name": "COUNTRY", "type": "text"}],
     "primaryKey": ["ID"], "foreignKeys": []},
    {"name": "actors",
     "columns": [{"name": "ID", "type": "text"}, {"name": "NAME", "type": "text"},
                 {"name": "COUNTRY", "type": "text"}],
     "primaryKey": ["ID"], "foreignKeys": []},
    {"name": "castings",
     "columns": [{"name": "MOVIE_ID", "type": "text"}, {"name": "ACTOR_ID", "type": "text"}],
     "primaryKey": ["MOVIE_ID", "ACTOR_ID"],
     "foreignKeys": [
        {"column": "MOVIE_ID", "foreignColumn": {"table": "movies", "column": "ID"}},
        {"column": "ACTOR_ID", "foreignColumn": {"table": "actors", "column": "ID"}}]}
  ]
}
"""

MAPPING_YAML = """
hubs:
  - name: HUB__MOVIES
    source_table: movies
    business_keys: [NAME, YEAR]
  - name: HUB__ACTORS
    source_table: actors
    business_keys: [ID]
  - name: HUB__DIRECTORS
    source_table: directors
    business_keys: [ID]
links:
  - name: LNK__MOVIES_DIRECTORS
    source_table: movies
    to:
      - raw_column: DIRECTORS__HKEY
        source_column: DIRECTOR
        source_foreign_key: {table: directors, column: ID}
  - name: LNK__CASTINGS
    source_table: castings
    to:
      - raw_column: MOVIE_ID
        source_column: MOVIE_ID
        source_foreign_key: {table: movies, column: ID}
      - raw_column: ACTOR_ID
        source_column: ACTOR_ID
        source_foreign_key: {table: actors, column: ID}
satellites:
  - {name: SAT__MOVIES, hub: HUB__MOVIES, source_table: movies, private: false}
  - {name: SAT__ACTORS, hub: HUB__ACTORS, source_table: actors, private: false}
  - {name: SAT__DIRECTORS, hub: HUB__DIRECTORS, source_table: directors, private: false}
"""

T0 = datetime(2026, 3, 1)
T1 = datetime(2026, 3, 2)

MOVIE_SCHEMA = T.StructType([
    T.StructField("OPERATION", T.StringType()),
    T.StructField("LOAD_DATE", T.TimestampType()),
    T.StructField("ID", T.StringType()),
    T.StructField("NAME", T.StringType()),
    T.StructField("YEAR", T.IntegerType()),
    T.StructField("DIRECTOR", T.StringType()),
    T.StructField("RATING", T.DoubleType()),
])
PERSON_SCHEMA = T.StructType([
    T.StructField("OPERATION", T.StringType()),
    T.StructField("LOAD_DATE", T.TimestampType()),
    T.StructField("ID", T.StringType()),
    T.StructField("NAME", T.StringType()),
    T.StructField("COUNTRY", T.StringType()),
])
CASTING_SCHEMA = T.StructType([
    T.StructField("OPERATION", T.StringType()),
    T.StructField("LOAD_DATE", T.TimestampType()),
    T.StructField("MOVIE_ID", T.StringType()),
    T.StructField("ACTOR_ID", T.StringType()),
])


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


@pytest.fixture(scope="module")
def dv(spark):
    spark.sql("DROP DATABASE IF EXISTS decl_staging CASCADE")
    spark.sql("DROP DATABASE IF EXISTS decl_raw CASCADE")
    config = VaultConfig(
        staging_prepared_database="decl_staging",
        raw_database="decl_raw",
        record_source="imdb",
        optimize_partitioning=False,
    )
    schema = SourceSchema.from_json(SCHEMA_JSON)
    mapping = VaultMapping.from_yaml(MAPPING_YAML)
    v = DeclarativeVault(spark, schema, mapping, config)
    created = v.create_tables()
    assert set(created) >= {
        "HUB__MOVIES", "HUB__ACTORS", "HUB__DIRECTORS",
        "SAT__MOVIES", "SAT__ACTORS", "SAT__DIRECTORS",
        "LNK__MOVIES_DIRECTORS", "LNK__CASTINGS",
    }
    return v


def _t(spark, name):
    return spark.table(f"decl_raw.{name}")


def test_declarative_end_to_end(spark, dv):
    batch0 = {
        "movies": spark.createDataFrame(
            [("snapshot", T0, "m1", "Heat", 1995, "d1", 8.3),
             ("snapshot", T0, "m2", "Ronin", 1998, "d2", 7.2)], MOVIE_SCHEMA),
        "directors": spark.createDataFrame(
            [("snapshot", T0, "d1", "Michael Mann", "USA"),
             ("snapshot", T0, "d2", "John Frankenheimer", "USA")], PERSON_SCHEMA),
        "actors": spark.createDataFrame(
            [("snapshot", T0, "a1", "Al Pacino", "USA"),
             ("snapshot", T0, "a2", "Robert De Niro", "USA")], PERSON_SCHEMA),
        "castings": spark.createDataFrame(
            [("snapshot", T0, "m1", "a1"), ("snapshot", T0, "m1", "a2"),
             ("snapshot", T0, "m2", "a2")], CASTING_SCHEMA),
    }
    dv.load_batch(batch0, load_ts=datetime(2026, 4, 1))

    assert _t(spark, "HUB__MOVIES").count() == 2
    assert _t(spark, "HUB__ACTORS").count() == 2
    assert _t(spark, "LNK__CASTINGS").count() == 3
    assert _t(spark, "LNK__MOVIES_DIRECTORS").count() == 2

    # movies hub is keyed on (NAME, YEAR), not ID
    heat_hkey = _md5("Heat,1995")
    assert _t(spark, "HUB__MOVIES").filter(F.col(C.hkey()) == heat_hkey).count() == 1

    # castings resolved movie ID m1 → hash(NAME, YEAR) through the staged table
    lnk = _t(spark, "LNK__CASTINGS")
    assert lnk.filter(
        (F.col(C.hkey_of("movies")) == heat_hkey)
        & (F.col(C.hkey_of("actors")) == _md5("a1"))
    ).count() == 1

    # satellites carry all non-business-key columns, incl. the source ID
    sat_cols = set(_t(spark, "SAT__MOVIES").columns)
    assert {"ID", "DIRECTOR", "RATING"} <= sat_cols
    assert "NAME" not in sat_cols  # business key lives in the hub


def test_declarative_cross_batch_fk(spark, dv):
    """Batch 1 casts a new actor in a movie staged only in batch 0: the FK
    must resolve through hub⋈satellite, not the (absent) staged target."""
    batch1 = {
        "actors": spark.createDataFrame(
            [("create", T1, "a3", "Val Kilmer", "USA")], PERSON_SCHEMA),
        "castings": spark.createDataFrame(
            [("create", T1, "m1", "a3")], CASTING_SCHEMA),
    }
    dv.load_batch(batch1, load_ts=datetime(2026, 4, 2))

    heat_hkey = _md5("Heat,1995")
    lnk = _t(spark, "LNK__CASTINGS")
    assert lnk.count() == 4
    assert lnk.filter(
        (F.col(C.hkey_of("movies")) == heat_hkey)
        & (F.col(C.hkey_of("actors")) == _md5("a3"))
    ).count() == 1

    # link delete closes the casting
    batch2 = {
        "castings": spark.createDataFrame(
            [("delete", datetime(2026, 3, 3), "m1", "a3")], CASTING_SCHEMA),
    }
    dv.load_batch(batch2, load_ts=datetime(2026, 4, 3))
    eff = _t(spark, "SAT__EFFECTIVITY_CASTINGS")
    k = _md5(f"{heat_hkey},{_md5('a3')}")
    last = (
        eff.filter(F.col(C.hkey()) == k)
        .orderBy(F.col(C.load_date()).desc())
        .select(C.deleted())
        .limit(1)
        .collect()
    )
    assert last and last[0][0] is True
