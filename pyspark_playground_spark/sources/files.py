"""File-format sources & sinks beyond the reference's parquet-only scan.

The reference reads staging batches exclusively as parquet
(``RawVault.py:1015-1043``, S1 in SURVEY.md §2.1). Real CDC feeds also
arrive as CSV/JSON/ORC; these helpers give the same staging entry point for
any of them, with schema enforcement (CDC envelopes must not be inferred
per batch — drifting inference breaks hash parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FORMATS = ("parquet", "orc", "csv", "json")

_EXT_TO_FORMAT = {
    ".parquet": "parquet",
    ".orc": "orc",
    ".csv": "csv",
    ".json": "json",
    ".jsonl": "json",
    ".ndjson": "json",
}


def infer_format(path: str) -> str:
    for ext, fmt in _EXT_TO_FORMAT.items():
        if path.rstrip("/").endswith(ext):
            return fmt
    return "parquet"


def read_source(
    spark: SparkSession,
    path: str,
    *,
    file_format: str | None = None,
    schema: T.StructType | str | None = None,
    **options,
) -> DataFrame:
    """Format-agnostic batch read. CSV defaults to header=true; pass an
    explicit ``schema`` for CDC feeds (never infer per batch)."""
    fmt = file_format or infer_format(path)
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", options.pop("header", "true"))
        if schema is None:
            reader = reader.option("inferSchema", "true")
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_sink(
    df: DataFrame,
    path: str,
    *,
    file_format: str | None = None,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    """Format-agnostic file sink; ``partition_by`` produces the
    hive-partitioned directory layout that enables partition pruning."""
    fmt = file_format or infer_format(path)
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        writer = writer.option("header", options.pop("header", "true"))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)
