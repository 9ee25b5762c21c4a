"""Curated layer: field-mapping driven denormalization.

Parity target: ``pysparkvault/raw/Curated.py:72-317`` — turn raw-vault read
views into wide, human-readable tables: typelist codes become descriptions,
internal FK ids become PublicIDs, ``*UserID`` columns become user names, and
retired rows are dropped.

Spark-first notes: every enrichment join here is a small-dimension lookup,
so each is broadcast explicitly — at 100 TB the fact side streams through
map-side hash joins with zero shuffle. The reference's *recursive* per-column
user joins (Curated.py:129-135) are kept as a loop of broadcast joins, which
Catalyst collapses into one stage of hash lookups.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyspark_playground_spark.conventions import DataVaultConventions

CONV = DataVaultConventions()


@dataclass(frozen=True)
class FieldDefinition:
    """One output field of a curated view (reference: Curated.py:196-271).

    - ``source``: column in the raw read view.
    - ``target``: output name (defaults to ``source``).
    - ``typelist``: group name in the active code-reference table; the code
      value is replaced by its description.
    - ``user``: the column holds a user id to be replaced by the user name.
    """

    source: str
    target: str | None = None
    typelist: str | None = None
    user: bool = False

    @property
    def out(self) -> str:
        return self.target or self.source


def filter_retired(df: DataFrame, column: str = "retired") -> DataFrame:
    """Drop retired rows if the column exists (reference Curated.py:87-97)."""
    if column in df.columns:
        return df.filter(F.col(column) == 0)
    return df


def latest_per_key(df: DataFrame, key: str, order: str) -> DataFrame:
    """Latest version per key — the reference does groupBy-max + self-join
    (J14, Curated.py:149-154); a window row_number is one shuffle instead of
    two."""
    w = Window.partitionBy(key).orderBy(F.col(order).desc())
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def join_typelist(
    df: DataFrame,
    active_code_ref: DataFrame,
    field: str,
    group: str,
    *,
    id_column: str = "ID",
    description_column: str = "DESCRIPTION",
    conv: DataVaultConventions = CONV,
) -> DataFrame:
    """Replace a typelist code column with its description, in place.

    Reference: ``join_typelist`` (Curated.py:167-194) — left join + positional
    re-projection so the enriched column keeps its original ordinal.
    """
    lookup = (
        active_code_ref.filter(F.col(conv.group()) == group)
        .select(
            F.col(id_column).cast("string").alias("__tl_id"),
            F.col(description_column).alias("__tl_descr"),
        )
    )
    joined = df.join(
        F.broadcast(lookup), df[field].cast("string") == F.col("__tl_id"), "left"
    )
    cols = [
        F.col("__tl_descr").alias(field) if c == field else F.col(c) for c in df.columns
    ]
    return joined.select(*cols)


def join_user_information(
    df: DataFrame,
    users: DataFrame,
    *,
    user_id_column: str = "ID",
    user_name_column: str = "NAME",
    suffix: str = "UserID",
    load_date_column: str | None = None,
) -> DataFrame:
    """Replace every ``*UserID`` column with the user's name.

    Reference: ``join_user_information`` (Curated.py:121-165) — recursive
    left joins over all matching columns against the latest user version.
    """
    if load_date_column is not None:
        users = latest_per_key(users, user_id_column, load_date_column)
    lookup = users.select(
        F.col(user_id_column).cast("string").alias("__u_id"),
        F.col(user_name_column).alias("__u_name"),
    )
    out = df
    for col in [c for c in df.columns if c.endswith(suffix)]:
        out = (
            out.join(
                F.broadcast(lookup), out[col].cast("string") == F.col("__u_id"), "left"
            )
            .withColumn(col, F.col("__u_name"))
            .drop("__u_id", "__u_name")
        )
    return out


def replace_id_with_public_id(
    df: DataFrame,
    field: str,
    entity: DataFrame,
    *,
    id_column: str,
    public_id_column: str = "PublicID",
) -> DataFrame:
    """Rewrite an internal FK id to the target entity's PublicID, in place
    (reference: ``replace_id_with_public_id``, Curated.py:273-317)."""
    lookup = entity.select(
        F.col(id_column).cast("string").alias("__pid_key"),
        F.col(public_id_column).alias("__pid_val"),
    ).dropDuplicates(["__pid_key"])
    joined = df.join(
        F.broadcast(lookup), df[field].cast("string") == F.col("__pid_key"), "left"
    )
    cols = [
        F.col("__pid_val").alias(field) if c == field else F.col(c) for c in df.columns
    ]
    return joined.select(*cols)


def map_to_curated(
    df: DataFrame,
    fields: list[FieldDefinition],
    *,
    active_code_ref: DataFrame | None = None,
    users: DataFrame | None = None,
    keep_interval: bool = True,
    conv: DataVaultConventions = CONV,
) -> DataFrame:
    """Project + rename + enrich a raw read view into a curated table.

    Reference: ``map_to_curated`` (Curated.py:196-271).
    """
    out = filter_retired(df)
    for f in fields:
        if f.typelist and active_code_ref is not None:
            out = join_typelist(out, active_code_ref, f.source, f.typelist, conv=conv)
    if users is not None:
        out = join_user_information(out, users)
    cols = [F.col(f.source).alias(f.out) for f in fields]
    if keep_interval:
        for c in (conv.load_date(), conv.load_end_date()):
            if c in out.columns:
                cols.append(F.col(c))
    return out.select(*cols)
