"""Raw-vault loaders: staging, hubs, links, satellites, effectivity, references.

Parity target: the reference's insert-only "v2" engine
(``pysparkvault/raw/RawVault.py:53-1075``). Semantics reproduced:

- Staging prep (RawVault.py:996-1043): rename CDC columns into the ``$__``
  dialect, stamp a record source, snapshot load-date override, compute HKEY.
- ``load_hub`` (RawVault.py:194-260): CREATE|UPDATE|SNAPSHOT rows →
  anti-join vs existing hub on HKEY → distinct → append.
- ``load_satellite`` (RawVault.py:913-951): CREATE|UPDATE|SNAPSHOT rows,
  LOAD_DATE := CDC event time, HDIFF over attributes, idempotent append
  keyed on (HKEY, LOAD_DATE).
- ``load_effectivity_satellite`` (RawVault.py:953-994): CREATE|DELETE|SNAPSHOT
  rows, DELETED := (op == DELETE), keyed on (HKEY, LOAD_DATE).
- ``load_link`` (RawVault.py:480-632): 2-ary FK link with delete detection —
  resolve target HKEYs, link HKEY = hash(member hkeys), anti-join append;
  effectivity rows for new links (deleted=False) and vanished links
  (deleted=True via the non-equi "same from-hkey, different/nulled to-hkey"
  join), run-length compressed with a lag window.
- ``load_multilink`` (RawVault.py:660-708): N-ary link from an association
  table.
- ``load_references`` / ``load_code_references`` (RawVault.py:710-911).

Design differences from the reference (deliberate, Spark-first):

- Loaders are pure DataFrame→DataFrame kernels; the ``RawVault`` class is a
  thin catalog-table wrapper. Kernels are unit-testable and usable in
  ``foreachBatch`` streaming sinks unchanged.
- ``load_ts`` is an explicit parameter (default: current timestamp) so loads
  are reproducible/oracle-checkable.
- Anti-join keys are repartitioned only when ``optimize_partitioning`` —
  at scale prefer AQE + bucketed table layout (see ``sources/catalog.py``).
"""

from __future__ import annotations

from collections.abc import Sequence
from datetime import datetime

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pyspark_playground_spark.conventions import (
    DataVaultConventions,
    LinkedHubDefinition,
    Operation,
    VaultConfig,
)
from pyspark_playground_spark.functions.hashing import hash_diff, hash_key

CONV = DataVaultConventions()


# ---------------------------------------------------------------------------
# staging
# ---------------------------------------------------------------------------

def prepare_staging(
    df: DataFrame,
    *,
    load_date_column: str,
    operation_column: str | None,
    record_source: str,
    hkey_columns: Sequence[str] = (),
    snapshot_override_column: str | None = None,
    timestamp_pattern: str | None = None,
    conv: DataVaultConventions = CONV,
    hash_function: str = "md5",
) -> DataFrame:
    """Normalize a raw CDC batch into the staging-prepared shape.

    Reference: ``stage_table_df`` (RawVault.py:996-1043). Accepts operation
    codes as ints or the string dialect (features/steps/raw_vault.py:200-212).
    """
    out = df.withColumnRenamed(load_date_column, conv.load_date())
    if timestamp_pattern:
        out = out.withColumn(
            conv.load_date(), F.to_timestamp(F.col(conv.load_date()), timestamp_pattern)
        )
    else:
        out = out.withColumn(conv.load_date(), F.col(conv.load_date()).cast("timestamp"))

    if operation_column is not None:
        op = F.col(operation_column)
        if dict(df.dtypes).get(operation_column) == "string":
            mapping = F.create_map(
                *[x for k, v in Operation.NAMES.items() for x in (F.lit(k), F.lit(v))]
            )
            op = mapping[F.lower(op)]
        out = (
            out.withColumn(conv.operation(), op.cast("int"))
            .drop(operation_column)
            if operation_column != conv.operation()
            else out.withColumn(conv.operation(), op.cast("int"))
        )
    else:
        out = out.withColumn(conv.operation(), F.lit(Operation.SNAPSHOT))

    out = out.withColumn(conv.record_source(), F.lit(record_source))

    # snapshot loads may take their load date from a source column
    # (RawVault.py:1032-1038: applied when operation < DELETE, i.e. for
    # SNAPSHOT rows only — DELETE rows keep the CDC load date)
    if snapshot_override_column is not None:
        out = out.withColumn(
            conv.load_date(),
            F.when(
                F.col(conv.operation()) < F.lit(Operation.DELETE),
                F.col(snapshot_override_column).cast("timestamp"),
            ).otherwise(F.col(conv.load_date())),
        )

    if hkey_columns:
        out = out.withColumn(conv.hkey(), hash_key(list(hkey_columns), hash_function))
    return out


def _with_load_meta(
    staged: DataFrame,
    conv: DataVaultConventions,
    load_ts: datetime | None,
    record_source: str | None,
) -> DataFrame:
    """Stamp CDC_LOAD_DATE := event time, LOAD_DATE := batch load time.

    Reference: load_hub step (RawVault.py:235-240). Idempotent: if the batch
    is already stamped (CDC_LOAD_DATE present), event time is preserved.
    """
    if conv.cdc_load_date() in staged.columns:
        if record_source is not None and conv.record_source() not in staged.columns:
            return staged.withColumn(conv.record_source(), F.lit(record_source))
        return staged
    out = staged.withColumn(conv.cdc_load_date(), F.col(conv.load_date()))
    ts: Column = F.lit(load_ts).cast("timestamp") if load_ts else F.current_timestamp()
    out = out.withColumn(conv.load_date(), ts)
    if record_source is not None:
        out = out.withColumn(conv.record_source(), F.lit(record_source))
    elif conv.record_source() not in out.columns:
        out = out.withColumn(conv.record_source(), F.lit("unknown"))
    return out


def _filter_ops(df: DataFrame, conv: DataVaultConventions, ops: Sequence[int]) -> DataFrame:
    if conv.operation() in df.columns:
        return df.filter(F.col(conv.operation()).isin(list(ops)))
    return df


def _bkey_tuple_hash_injective(df: DataFrame, keys: Sequence[str]) -> bool:
    """True when ``hash_key(keys)`` is provably injective over the staged
    frame's business-key tuples (modulo the engine's standing md5
    hash-identity bet), i.e. when one row per hkey IS one row per key
    tuple and the hub dedup may legally run ``distinct()`` over
    ``(hkey, *keys)`` instead of ``dropDuplicates([hkey])``.

    The hash renders each key with ``concat_ws(',', cast(k as string))``,
    which SKIPS nulls — so ``('a', NULL)`` and ``(NULL, 'a')`` collapse
    to the same hkey while staying distinct tuples (SURVEY §7 hard-item
    5's null-collapse class; VERDICT r11 "What's wrong" #2), and string
    keys can inject the separator (``('a,b', 'c')`` vs ``('a', 'b,c')``)
    or an empty string. Provably safe cases:

    - one key of a non-string scalar type: a NULL renders as ``''`` and
      every non-null value as a non-empty canonical string, so distinct
      tuples always render distinctly (nullability does not matter);
    - N >= 2 keys, all non-nullable AND all non-string scalar types:
      every field renders non-empty and comma-free, so the separated
      concatenation is injective.

    Everything else (string keys, nullable multi-key tuples) returns
    False and the caller must keep the reference's one-row-per-hkey
    ``dropDuplicates`` semantics.
    """
    from pyspark.sql import types as T

    safe_scalar = (
        T.ByteType, T.ShortType, T.IntegerType, T.LongType,
        T.FloatType, T.DoubleType, T.DecimalType, T.BooleanType,
        T.DateType, T.TimestampType, T.TimestampNTZType,
    )
    fields = {f.name: f for f in df.schema.fields}
    if any(k not in fields for k in keys):
        return False
    if any(not isinstance(fields[k].dataType, safe_scalar) for k in keys):
        return False
    if len(keys) == 1:
        return True
    return all(not fields[k].nullable for k in keys)


def _maybe_repartition(
    df: DataFrame, keys: Sequence[str], config: VaultConfig | None
) -> DataFrame:
    """Reference X1 (RawVault.py:760-761 etc.): hash-partition on the
    anti-join keys before the join/write when ``optimize_partitioning``."""
    if config is not None and config.optimize_partitioning:
        return df.repartition(config.partition_size, *[F.col(k) for k in keys])
    return df


def _anti(
    df: DataFrame, existing: DataFrame | None, keys: Sequence[str]
) -> DataFrame:
    """Idempotent-append core: keep rows whose key is not in ``existing``.

    Reference J1/J2 (RawVault.py:255,943-948): ``left_anti`` equi-join. This
    is the pure-Spark alternative to a Delta MERGE — insert-only tables never
    need row updates, so NOT EXISTS + append gives the same end state.
    """
    if existing is None:
        return df
    cond = [df[k].eqNullSafe(existing[k]) for k in keys]
    return df.join(existing, cond, "left_anti")


# ---------------------------------------------------------------------------
# hubs
# ---------------------------------------------------------------------------

def hub_rows(
    staged: DataFrame,
    business_key_columns: Sequence[str],
    *,
    existing: DataFrame | None = None,
    load_ts: datetime | None = None,
    record_source: str | None = None,
    conv: DataVaultConventions = CONV,
    config: VaultConfig | None = None,
    hash_function: str = "md5",
) -> DataFrame:
    """New hub rows: one per unseen business entity.

    Output schema: ``$__HKEY, $__LOAD_DATE, $__RECORD_SOURCE, *business_keys``
    (reference shape RawVault.py:64-83; loader RawVault.py:194-260).
    """
    df = _filter_ops(staged, conv, Operation.HUB_SAT_OPS)
    hkey_computed_here = conv.hkey() not in df.columns
    if hkey_computed_here:
        df = df.withColumn(conv.hkey(), hash_key(list(business_key_columns), hash_function))
    # When the batch is not yet CDC-stamped, LOAD_DATE/RECORD_SOURCE are
    # call-level constants — keep them OUT of the dedup aggregate.
    # dropDuplicates compiles to first() over every non-key column, and a
    # string aggregation buffer (the record source) disqualifies
    # HashAggregate: the plan degrades to SortAggregate with a full sort
    # on both sides of the exchange, and the exchange itself carries the
    # constant per row. Constants are re-attached after the key-only
    # dedup + anti-join — same rows, same columns, same order.
    meta_is_const = conv.cdc_load_date() not in df.columns and (
        record_source is not None or conv.record_source() not in df.columns
    )
    df = _with_load_meta(df, conv, load_ts, record_source)
    if meta_is_const:
        ts_c: Column = (
            F.lit(load_ts).cast("timestamp") if load_ts else F.current_timestamp()
        )
        rs_c = F.lit(record_source if record_source is not None else "unknown")
        keyed = df.select(conv.hkey(), *business_key_columns)
        # distinct() when the hkey was computed HERE from exactly these
        # business keys (r11) AND the key tuple → hkey mapping is provably
        # injective for this staged schema (r12, VERDICT r11 item 4: with
        # nullable or string keys, concat_ws collapses distinct tuples —
        # ('a', NULL) vs (NULL, 'a') — onto one hkey, and distinct() would
        # emit TWO hub rows for one hkey where the reference's
        # dropDuplicates keeps one). When injective, one row per hkey IS
        # one row per key tuple (the standing hash-identity bet), and the
        # all-grouping-keys aggregate drops the first(<bkey>) buffers
        # that degrade string-carrying hubs to SortAggregate. A
        # pre-hashed input keeps dropDuplicates — the dependency is not
        # locally provable there.
        deduped = (
            keyed.distinct()
            if hkey_computed_here
            and _bkey_tuple_hash_injective(df, business_key_columns)
            else keyed.dropDuplicates([conv.hkey()])
        )
        df = deduped.select(
            conv.hkey(),
            ts_c.alias(conv.load_date()),
            rs_c.alias(conv.record_source()),
            *business_key_columns,
        )
    else:
        df = df.select(
            conv.hkey(), conv.load_date(), conv.record_source(), *business_key_columns
        ).dropDuplicates([conv.hkey()])
    df = _maybe_repartition(df, [conv.hkey()], config)
    return _anti(df, existing, [conv.hkey()])


# ---------------------------------------------------------------------------
# satellites
# ---------------------------------------------------------------------------

def satellite_rows(
    staged: DataFrame,
    attribute_columns: Sequence[str],
    *,
    existing: DataFrame | None = None,
    conv: DataVaultConventions = CONV,
    config: VaultConfig | None = None,
    hash_function: str = "md5",
) -> DataFrame:
    """New satellite versions keyed on (HKEY, LOAD_DATE = CDC event time).

    Reference: ``load_satellite_from_prepared_stage_dataframe``
    (RawVault.py:913-951). Every CREATE|UPDATE|SNAPSHOT row becomes a
    version; no consecutive-HDIFF suppression (matches golden counts, e.g.
    SAT__MOVIES = 14 in features/raw-vault.feature).
    """
    df = _filter_ops(staged, conv, Operation.HUB_SAT_OPS)
    # satellites keep event time as their LOAD_DATE (RawVault.py:928-933)
    if conv.cdc_load_date() in df.columns:
        df = df.withColumn(conv.load_date(), F.col(conv.cdc_load_date()))
    df = df.withColumn(conv.hdiff(), hash_diff(list(attribute_columns), hash_function))
    df = df.select(
        conv.hkey(), conv.hdiff(), conv.load_date(), *attribute_columns
    ).dropDuplicates([conv.hkey(), conv.load_date()])
    df = _maybe_repartition(df, [conv.hkey(), conv.load_date()], config)
    return _anti(df, existing, [conv.hkey(), conv.load_date()])


def effectivity_rows(
    staged: DataFrame,
    *,
    existing: DataFrame | None = None,
    conv: DataVaultConventions = CONV,
    config: VaultConfig | None = None,
    hash_function: str = "md5",
) -> DataFrame:
    """New effectivity-satellite rows: the delete/undelete history of a hub.

    Reference: ``load_effectivity_satellite_from_prepared_stage_dataframe``
    (RawVault.py:953-994): ops CREATE|DELETE|SNAPSHOT,
    ``$__DELETED := (op == DELETE)``, keyed on (HKEY, LOAD_DATE).
    """
    df = _filter_ops(staged, conv, Operation.EFFECTIVITY_OPS)
    if conv.cdc_load_date() in df.columns:
        df = df.withColumn(conv.load_date(), F.col(conv.cdc_load_date()))
    df = df.withColumn(
        conv.deleted(), (F.col(conv.operation()) == Operation.DELETE)
        if conv.operation() in df.columns
        else F.lit(False),
    )
    # one row per (HKEY, LOAD_DATE); if a batch carries both CREATE and
    # DELETE for the same key at the same event time, DELETE wins the tie
    # deterministically (max over booleans) — the reference's distinct()
    # keeps both rows, which a same-timestamp downstream sort cannot order
    df = (
        df.groupBy(conv.hkey(), conv.load_date())
        .agg(F.max(conv.deleted()).alias(conv.deleted()))
    )
    df = df.withColumn(conv.hdiff(), hash_diff([F.col(conv.deleted())], hash_function))
    df = df.select(conv.hkey(), conv.hdiff(), conv.deleted(), conv.load_date())
    df = _maybe_repartition(df, [conv.hkey(), conv.load_date()], config)
    return _anti(df, existing, [conv.hkey(), conv.load_date()])


# ---------------------------------------------------------------------------
# links
# ---------------------------------------------------------------------------

def compress_state_changes(
    df: DataFrame,
    *,
    key: str,
    order: str,
    state: str,
    conv: DataVaultConventions = CONV,
) -> DataFrame:
    """Run-length compression of a boolean state history.

    Keep only rows where ``state`` differs from the previous row of the same
    ``key`` (first row always kept). Reference W1 (RawVault.py:614-620):
    ``lag(deleted) over (partition by hkey order by load_date)``.
    """
    w = Window.partitionBy(key).orderBy(order)
    prev = F.lag(F.col(state), 1).over(w)
    return (
        df.withColumn("__prev_state", prev)
        .filter(F.col("__prev_state").isNull() | (F.col("__prev_state") != F.col(state)))
        .drop("__prev_state")
    )


def link_rows(
    staged_from: DataFrame,
    *,
    from_name: str,
    to_name: str,
    fk_column: str,
    to_resolution: DataFrame | None = None,
    existing_link: DataFrame | None = None,
    existing_effectivity: DataFrame | None = None,
    load_ts: datetime | None = None,
    record_source: str | None = None,
    conv: DataVaultConventions = CONV,
    config: VaultConfig | None = None,
    hash_function: str = "md5",
    cache_registry: list[DataFrame] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """2-ary FK link load with delete detection.

    Reference: ``load_link`` (RawVault.py:480-632). Returns
    ``(new_link_rows, new_effectivity_rows)``.

    ``staged_from`` must carry ``$__HKEY`` (the from-hub hkey), the CDC
    columns, and ``fk_column``. Target hkeys resolve either directly
    (``to_resolution is None`` → to_hkey = hash(fk)) or through a 2-column
    mapping DataFrame ``(key, hkey)`` — the reference's staged-target /
    hub⋈sat fallback (RawVault.py:523-534) generalized.

    Delete detection (RawVault.py:582-620): for every staged from-row, any
    *existing* link of the same from-hkey whose to-hkey differs from the
    currently staged to-hkey (or the staged FK is null) is marked deleted at
    the staged event time; new links are marked not-deleted; the combined
    state history is run-length compressed with a lag window.

    Deliberate deviation: new link rows stamp ``$__LOAD_DATE`` with the
    batch load time (``load_ts``/current_timestamp), consistent with hub
    loads — the reference carries the staged *event* date into LNK instead
    (its hubs use batch time), so link load dates differ from reference
    output for CDC feeds. Effectivity rows use the event time in both.

    ``cache_registry``: the internal resolve result is cached (it feeds the
    link, vanish, and effectivity branches). Pass a list to receive the
    cached DataFrame and ``unpersist()`` it after materializing both
    outputs — in a long-lived session (streaming foreachBatch per
    micro-batch) unreleased caches accumulate until storage eviction.
    """
    from_hkey = conv.hkey_of(from_name)
    to_hkey = conv.hkey_of(to_name)

    renamed = staged_from.withColumnRenamed(conv.hkey(), from_hkey)
    base = _filter_ops(renamed, conv, Operation.HUB_SAT_OPS)

    if to_resolution is None:
        resolved = base.withColumn(
            to_hkey,
            F.when(F.col(fk_column).isNotNull(), hash_key([fk_column], hash_function)),
        )
    else:
        key_col, map_hkey = to_resolution.columns[:2]
        mapping = (
            to_resolution.select(
                F.col(key_col).alias("__map_key"), F.col(map_hkey).alias(to_hkey)
            ).dropDuplicates(["__map_key"])
        )
        # broadcast only for dimension-sized hubs (config.broadcast_resolutions,
        # default True); off → AQE picks the strategy from runtime stats
        if config is None or config.broadcast_resolutions:
            mapping = F.broadcast(mapping)
        resolved = base.join(
            mapping,
            base[fk_column].cast("string") == mapping["__map_key"].cast("string"),
            "left",
        ).drop("__map_key")

    event_time = (
        conv.cdc_load_date() if conv.cdc_load_date() in resolved.columns else conv.load_date()
    )
    resolved = resolved.select(
        from_hkey, to_hkey, F.col(event_time).alias("__event_time")
    ).cache()
    if cache_registry is not None:
        cache_registry.append(resolved)

    # --- link rows (only fully resolved pairs form a link) -----------------
    pairs = (
        resolved.filter(F.col(to_hkey).isNotNull())
        .withColumn(conv.hkey(), hash_key([from_hkey, to_hkey], hash_function))
    )
    # constants attached after the key-only dedup + anti-join (see
    # multilink_rows: string-literal first() buffers force SortAggregate).
    # distinct() instead of dropDuplicates(hkey) (r11): the hkey was JUST
    # computed as hash(from, to), so one row per distinct hkey IS one row
    # per distinct (hkey, from, to) tuple (the engine's standing
    # hash-identity bet) — and an all-grouping-keys aggregate has no
    # first() buffers, restoring HashAggregate for md5's STRING member
    # keys (first(string) has an immutable buffer and degrades the plan
    # to SortAggregate with a full sort on both sides of the exchange).
    ts: Column = F.lit(load_ts).cast("timestamp") if load_ts else F.current_timestamp()
    new_links = (
        pairs.select(conv.hkey(), F.col(from_hkey), F.col(to_hkey))
        .distinct()
    )
    new_links = _maybe_repartition(new_links, [conv.hkey()], config)
    new_links = _anti(new_links, existing_link, [conv.hkey()])
    new_links = new_links.select(
        conv.hkey(),
        F.col(from_hkey),
        F.col(to_hkey),
        ts.alias(conv.load_date()),
        F.lit(record_source or "unknown").alias(conv.record_source()),
    )

    # --- effectivity: current state per staged row -------------------------
    current = pairs.select(
        F.col(conv.hkey()),
        F.col("__event_time").alias(conv.load_date()),
        F.lit(False).alias(conv.deleted()),
    )

    # vanished links: existing link with same from-hkey but different/ nulled
    # target (reference J13, RawVault.py:603-611)
    all_links = new_links.select(conv.hkey(), from_hkey, to_hkey)
    if existing_link is not None:
        all_links = existing_link.select(conv.hkey(), from_hkey, to_hkey).union(all_links)
    lk = all_links.alias("lk")
    st = resolved.alias("st")
    vanished = (
        st.join(
            lk,
            (F.col(f"st.{from_hkey}") == F.col(f"lk.{from_hkey}"))
            & (
                F.col(f"st.{to_hkey}").isNull()
                | (F.col(f"st.{to_hkey}") != F.col(f"lk.{to_hkey}"))
            ),
            "inner",
        )
        .select(
            F.col(f"lk.{conv.hkey()}").alias(conv.hkey()),
            F.col("st.__event_time").alias(conv.load_date()),
            F.lit(True).alias(conv.deleted()),
        )
    )

    # deleted from-rows close the entity's outgoing links at the delete time
    # (golden spec: features/raw-vault.feature "Simple delete in the CDC
    # batch" — link effectivity gains deleted=True at the source row's
    # DELETE event)
    event_time_all = (
        conv.cdc_load_date() if conv.cdc_load_date() in renamed.columns else conv.load_date()
    )
    deletes = (
        _filter_ops(renamed, conv, [Operation.DELETE])
        .select(from_hkey, F.col(event_time_all).alias("__event_time"))
        .alias("dl")
    )
    delete_vanished = (
        deletes.join(lk, F.col(f"dl.{from_hkey}") == F.col(f"lk.{from_hkey}"), "inner")
        .select(
            F.col(f"lk.{conv.hkey()}").alias(conv.hkey()),
            F.col("dl.__event_time").alias(conv.load_date()),
            F.lit(True).alias(conv.deleted()),
        )
    )

    history = current.unionByName(vanished).unionByName(delete_vanished)
    if existing_effectivity is not None:
        history = history.unionByName(
            existing_effectivity.select(conv.hkey(), conv.load_date(), conv.deleted())
        )
    history = history.dropDuplicates([conv.hkey(), conv.load_date(), conv.deleted()])
    history = compress_state_changes(
        history, key=conv.hkey(), order=conv.load_date(), state=conv.deleted(), conv=conv
    )
    # a link cannot be deleted before it first exists: vanish markers derived
    # from staged rows that predate the link's creation (e.g. an FK history
    # 1→2 emits "link(x,2) vanished" at the earlier FK-1 event) would start
    # the history with deleted=True — drop them (golden spec: transient link
    # in features/raw-vault.feature gets exactly [False@create, True@vanish])
    w_first = Window.partitionBy(conv.hkey()).orderBy(conv.load_date())
    history = (
        history.withColumn("__rn", F.row_number().over(w_first))
        .filter(~((F.col("__rn") == 1) & F.col(conv.deleted())))
        .drop("__rn")
    )
    history = history.withColumn(
        conv.hdiff(), hash_diff([F.col(conv.deleted())], hash_function)
    ).select(conv.hkey(), conv.hdiff(), conv.deleted(), conv.load_date())
    history = _maybe_repartition(history, [conv.hkey(), conv.load_date()], config)
    new_effectivity = _anti(
        history, existing_effectivity, [conv.hkey(), conv.load_date()]
    )
    return new_links, new_effectivity


def resolve_member_hkeys(
    df: DataFrame,
    members: Sequence[LinkedHubDefinition],
    *,
    conv: DataVaultConventions = CONV,
    hash_function: str = "md5",
    resolutions: dict[str, DataFrame] | None = None,
    config: VaultConfig | None = None,
) -> tuple[DataFrame, list[str]]:
    """Attach one hub-hkey column per link member and the combined link HKEY.

    Each member FK resolves to its hub hkey either directly
    (``hkey = hash(fk)``, valid when the FK *is* the target hub's business
    key) or through a ``(key, hkey)`` mapping in ``resolutions[member.name]``
    — the reference's staged-target / hub⋈sat fallback (RawVault.py:523-534).
    Returns ``(df, member_hkey_columns)``.

    The mapping join is broadcast-hinted only when
    ``config.broadcast_resolutions`` (default True — right for
    dimension-sized hubs). With it off, no hint is emitted and AQE picks
    broadcast vs shuffle from runtime statistics — the safe setting when a
    hub can be billion-key (a forced broadcast there OOMs the executors).
    """
    force_broadcast = config is None or config.broadcast_resolutions
    hkey_cols: list[str] = []
    for m in members:
        col_name = m.hkey_column or conv.hkey_of(m.name)
        hkey_cols.append(col_name)
        res = (resolutions or {}).get(m.name)
        if res is None:
            df = df.withColumn(col_name, hash_key([m.foreign_key], hash_function))
        else:
            key_col, map_hkey = res.columns[:2]
            mapping = res.select(
                F.col(key_col).alias(f"__mk_{col_name}"), F.col(map_hkey).alias(col_name)
            ).dropDuplicates([f"__mk_{col_name}"])
            if force_broadcast:
                mapping = F.broadcast(mapping)
            df = df.join(
                mapping,
                df[m.foreign_key].cast("string") == mapping[f"__mk_{col_name}"].cast("string"),
                "left",
            ).drop(f"__mk_{col_name}")
    df = df.withColumn(conv.hkey(), hash_key(hkey_cols, hash_function))
    return df, hkey_cols


def multilink_rows(
    staged: DataFrame,
    members: Sequence[LinkedHubDefinition],
    *,
    existing_link: DataFrame | None = None,
    load_ts: datetime | None = None,
    record_source: str | None = None,
    conv: DataVaultConventions = CONV,
    config: VaultConfig | None = None,
    hash_function: str = "md5",
    resolutions: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """N-ary link from an association table (reference RawVault.py:660-708).

    Each member FK resolves to its hub hkey (direct hash, or via an optional
    broadcast mapping in ``resolutions[member.name]``); the link HKEY is the
    hash of all member hkeys in declaration order.
    """
    df = _filter_ops(staged, conv, Operation.HUB_SAT_OPS)
    df, hkey_cols = resolve_member_hkeys(
        df, members, conv=conv, hash_function=hash_function,
        resolutions=resolutions, config=config,
    )
    # LOAD_DATE/RECORD_SOURCE are call-level constants here: attach them
    # AFTER the key-only dedup + anti-join. Inside dropDuplicates they
    # become first(<string literal>) aggregates whose immutable string
    # buffers force SortAggregate (two full sorts around the exchange)
    # instead of HashAggregate, and the exchange ships the constants per
    # row. distinct() instead of dropDuplicates(hkey) (r11): the hkey was
    # JUST computed as hash(member hkeys in order), so one row per
    # distinct hkey IS one row per distinct tuple (the standing
    # hash-identity bet) — an all-grouping-keys aggregate has no first()
    # buffers at all, so the md5 variant hash-aggregates too (first's
    # immutable string buffer was degrading it to SortAggregate).
    ts: Column = F.lit(load_ts).cast("timestamp") if load_ts else F.current_timestamp()
    out = df.select(conv.hkey(), *hkey_cols).distinct()
    out = _maybe_repartition(out, [conv.hkey()], config)
    out = _anti(out, existing_link, [conv.hkey()])
    return out.select(
        conv.hkey(),
        *hkey_cols,
        ts.alias(conv.load_date()),
        F.lit(record_source or "unknown").alias(conv.record_source()),
    )


# ---------------------------------------------------------------------------
# reference tables
# ---------------------------------------------------------------------------

def reference_rows(
    staged: DataFrame,
    id_column: str,
    attribute_columns: Sequence[str],
    *,
    existing: DataFrame | None = None,
    conv: DataVaultConventions = CONV,
    config: VaultConfig | None = None,
    hash_function: str = "md5",
) -> DataFrame:
    """Slowly-changing reference table rows keyed on (id, LOAD_DATE).

    Reference: ``load_references`` (RawVault.py:710-790).
    """
    df = _filter_ops(staged, conv, Operation.HUB_SAT_OPS)
    df = df.withColumn(conv.hdiff(), hash_diff(list(attribute_columns), hash_function))
    df = df.select(
        conv.hdiff(), conv.load_date(), id_column, *attribute_columns
    ).dropDuplicates([id_column, conv.load_date()])
    df = _maybe_repartition(df, [id_column, conv.load_date()], config)
    return _anti(df, existing, [id_column, conv.load_date()])


def code_reference_rows(
    staged: DataFrame,
    group: str,
    id_column: str,
    attribute_columns: Sequence[str],
    *,
    existing: DataFrame | None = None,
    conv: DataVaultConventions = CONV,
    config: VaultConfig | None = None,
    hash_function: str = "md5",
) -> DataFrame:
    """Many lookup tables sharing one storage table, discriminated by
    ``$__GROUP`` (reference: ``load_code_references``, RawVault.py:792-911).
    """
    df = _filter_ops(staged, conv, Operation.HUB_SAT_OPS)
    df = (
        df.withColumn(conv.group(), F.lit(group))
        .withColumn(conv.hdiff(), hash_diff(list(attribute_columns), hash_function))
        .select(conv.group(), conv.hdiff(), conv.load_date(), id_column, *attribute_columns)
        .dropDuplicates([conv.group(), id_column, conv.load_date()])
    )
    df = _maybe_repartition(df, [conv.group(), id_column, conv.load_date()], config)
    return _anti(df, existing, [conv.group(), id_column, conv.load_date()])
