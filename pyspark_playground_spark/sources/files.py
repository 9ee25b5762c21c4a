"""File-format sources & sinks beyond the reference's parquet-only scan.

The reference reads staging batches exclusively as parquet
(``RawVault.py:1015-1043``, S1 in SURVEY.md §2.1). Real CDC feeds also
arrive as CSV/JSON/ORC; these helpers give the same staging entry point for
any of them, with schema enforcement (CDC envelopes must not be inferred
per batch — drifting inference breaks hash parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
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


def describe_files(spark: SparkSession, path: str) -> dict:
    """File census of a dataset directory via the Hadoop FS API (works on
    any supported filesystem, not just local): data-file count, total
    bytes, smallest file. Metadata-only — no data read."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(hpath, True)
    n, total, smallest = 0, 0, None
    while it.hasNext():
        status = it.next()
        name = status.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue  # _SUCCESS, checksums, hidden
        n += 1
        size = status.getLen()
        total += size
        smallest = size if smallest is None else min(smallest, size)
    return {"n_files": n, "total_bytes": total, "smallest_bytes": smallest}


def compact_small_files(
    spark: SparkSession,
    path: str,
    *,
    target_file_bytes: int = 128 << 20,
    file_format: str = "parquet",
) -> dict:
    """Rewrite a many-small-files dataset into ~``target_file_bytes`` files.

    The 100 TB ingest-hygiene op: streaming/CDC sinks emit a file per
    micro-batch per partition, and a month later the table is a million
    100 KB files whose open/footer cost dwarfs the scan. This reads the
    dataset, repartitions to ``ceil(total_bytes / target)`` and swaps the
    rewrite in atomically-ish (write to a sibling temp dir, rename old →
    trash dir, rename new → path) via the Hadoop FS API, so the path name
    is stable for downstream readers. Not transactional — concurrent
    writers need a table format (Delta/Iceberg) instead; the reference
    has no compaction story at all.

    Returns the before/after file census.
    """
    before = describe_files(spark, path)
    parts = max(1, -(-before["total_bytes"] // target_file_bytes))
    df = read_source(spark, path, file_format=file_format)
    tmp = path.rstrip("/") + "__compact_tmp"
    write_sink(df.repartition(parts), tmp, file_format=file_format)

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    src = jvm.org.apache.hadoop.fs.Path(path)
    fs = src.getFileSystem(conf)
    old = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "__compact_old")
    if not fs.rename(src, old):
        raise IOError(f"compaction swap failed renaming {path}")
    if not fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), src):
        fs.rename(old, src)  # roll back
        raise IOError(f"compaction swap failed installing {tmp}")
    fs.delete(old, True)
    after = describe_files(spark, path)
    return {"before": before, "after": after, "target_partitions": parts}


def read_source_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    *,
    file_format: str | None = None,
    corrupt_column: str = "_corrupt_record",
    **options,
) -> tuple[DataFrame, DataFrame]:
    """Malformed-record quarantine for semi-structured CDC feeds
    (CSV/JSON): read PERMISSIVE with an explicit corrupt-record column and
    split the batch into (clean rows, quarantined raw lines).

    At 100 TB a single malformed line must neither kill the job
    (FAILFAST) nor silently vanish (DROPMALFORMED); the production
    pattern is permissive parse + quarantine sink + alert on quarantine
    volume. The returned frames share one scan — Spark computes the
    corrupt column during parsing, no second read.

    A declared ``schema`` is mandatory: the corrupt column only exists
    when the schema says so, and CDC envelopes must never be inferred per
    batch. Caveat (Spark semantics): on CSV, queries that select ONLY the
    corrupt column must materialize via the returned frames as built here
    (cached split), not by re-projecting the raw reader output.
    """
    fmt = file_format or infer_format(path)
    if fmt not in ("csv", "json"):
        raise ValueError(
            f"quarantine read is for semi-structured formats, got {fmt!r}"
        )
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if corrupt_column not in [f.name for f in schema.fields]:
        schema = schema.add(T.StructField(corrupt_column, T.StringType(), True))
    raw = read_source(
        spark,
        path,
        file_format=fmt,
        schema=schema,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord=corrupt_column,
        **options,
    )
    from pyspark.sql import functions as F

    raw = raw.cache()
    clean = raw.filter(F.col(corrupt_column).isNull()).drop(corrupt_column)
    quarantined = raw.filter(F.col(corrupt_column).isNotNull()).select(
        F.col(corrupt_column).alias("raw_record")
    )
    return clean, quarantined


def schema_drift_report(
    expected: T.StructType | str,
    observed: T.StructType | str,
) -> list[dict]:
    """Column-level diff between a declared staging contract and an
    arriving batch's schema — the check a CDC ingestion loop runs BEFORE
    writing, so upstream schema drift surfaces as an explicit decision
    (quarantine/evolve/fail) instead of a silent cast or a mid-write
    crash.

    Pure metadata (no Spark jobs). Returns one dict per difference:
    ``{"column", "status", "expected", "observed"}`` with status in
    ``missing`` (contract column absent from the batch), ``added``
    (new upstream column), ``type_changed``. Empty list == no drift.
    Nullability is deliberately ignored — parquet writers flip it freely.
    """
    if isinstance(expected, str):
        expected = T.StructType.fromDDL(expected)
    if isinstance(observed, str):
        observed = T.StructType.fromDDL(observed)
    exp = {f.name: f.dataType.simpleString() for f in expected.fields}
    obs = {f.name: f.dataType.simpleString() for f in observed.fields}
    report: list[dict] = []
    for name in sorted(exp):
        if name not in obs:
            report.append({"column": name, "status": "missing",
                           "expected": exp[name], "observed": None})
        elif exp[name] != obs[name]:
            report.append({"column": name, "status": "type_changed",
                           "expected": exp[name], "observed": obs[name]})
    for name in sorted(set(obs) - set(exp)):
        report.append({"column": name, "status": "added",
                       "expected": None, "observed": obs[name]})
    return report


def write_atomic(
    df: DataFrame,
    path: str,
    *,
    file_format: str = "parquet",
    partition_by: list[str] | None = None,
    **options,
) -> str:
    """Atomic publish for batch sinks: write to a hidden staging directory
    next to the target, then move it into place in one rename — readers
    never observe a half-written table, and a mid-write failure leaves the
    previous version fully intact (the poor man's transaction where Delta
    isn't available; the same publish/commit discipline the reference gets
    from Delta).

    The swap sequence is stage → move-old-aside → move-new-in → drop-old;
    on a POSIX filesystem each move is an atomic ``rename(2)``. Object
    stores (S3/GCS) have no atomic directory rename — there, keep the
    staging write and replace the swap with a manifest/catalog pointer
    flip (or use a real table format). Returns the staging path it
    published from (useful for audit logs).
    """
    import os as _os
    import shutil
    import uuid

    base = _os.path.abspath(path.rstrip("/"))
    # stage lives in the parent, not under base — `base/..` would stop
    # resolving the moment base is renamed aside
    stage = _os.path.join(
        _os.path.dirname(base), f".__stage_{uuid.uuid4().hex}"
    )
    writer = df.write.format(file_format).mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(stage)

    old = f"{base}.__old_{uuid.uuid4().hex}"
    if _os.path.exists(base):
        _os.rename(base, old)
    try:
        _os.rename(stage, base)
    except OSError:
        if _os.path.exists(old):
            _os.rename(old, base)  # roll back
        raise
    if _os.path.exists(old):
        shutil.rmtree(old, ignore_errors=True)
    return stage


def read_media_files(
    spark: SparkSession,
    path: str,
    *,
    glob: str | None = None,
    recursive: bool = True,
    max_bytes: int | None = None,
    media_type: str = "application/octet-stream",
    with_checksum: bool = False,
) -> DataFrame:
    """Ingest raw media files (images/audio/video) as opaque binary rows —
    the entry point that feeds ``operators/multimodal.py``.

    Uses Spark's ``binaryFile`` source: each file becomes one row of
    ``(path, modification_time, n_bytes, content)`` plus the
    ``media_meta`` struct the multimodal operators expect
    (``MEDIA_META_SCHEMA``: media_type, n_bytes, checksum). The listing
    and the read are both distributed; ``glob`` maps to
    ``pathGlobFilter`` (e.g. ``"*.png"``) and ``recursive`` to
    ``recursiveFileLookup``, so a 100 TB image store partitions by file
    without any driver-side listing loop.

    ``max_bytes`` guards the pipeline against pathological files: larger
    payloads are dropped BEFORE decode via the length column Spark reads
    from file metadata — the filter prunes on file size without touching
    content. The md5 checksum is only computed when
    ``with_checksum=True``: it is a full pass over every payload byte, a
    cost a metadata-only pipeline should not pay (the column holds ``""``
    otherwise, keeping the ``MEDIA_META_SCHEMA`` contract non-null).
    """
    reader = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true" if recursive else "false")
    )
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path).select(
        F.col("path"),
        F.col("modificationTime").alias("modification_time"),
        F.col("length").alias("n_bytes"),
        F.col("content"),
    )
    if max_bytes is not None:
        df = df.filter(F.col("n_bytes") <= max_bytes)
    checksum = (
        F.md5(F.col("content")) if with_checksum else F.lit("")
    )
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.col("n_bytes").alias("n_bytes"),
            checksum.alias("checksum"),
        ),
    )
