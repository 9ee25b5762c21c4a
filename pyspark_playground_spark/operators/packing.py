"""Sequence packing for LLM training-data pipelines.

Pre-training loaders concatenate documents in a deterministic order and cut
the token stream into fixed-length sequences (GPT-style concat-then-chunk).
The distributed problem is the **global running offset** of every document —
an exclusive prefix sum over the corpus order. A naive
``Window.orderBy(id)`` cumsum collapses the whole corpus into one task; the
implementation here is the classic two-phase distributed prefix sum:

1. intra-bucket cumulative sums, parallel per bucket
   (``Window.partitionBy(bucket).orderBy(id)``);
2. cross-bucket offsets from the per-bucket totals — a table with one row
   per bucket, tiny by construction, whose own cumsum is cheap — broadcast
   back onto the data.

The result is identical to the single-window formulation (which is exactly
what the DuckDB oracle runs) while every wide stage stays parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_sequence_offsets(
    df: DataFrame,
    *,
    id_column: str = "doc_id",
    token_count_column: str = "n_tokens",
    seq_len: int = 2048,
    bucket_size: int = 1024,
) -> DataFrame:
    """Global token offset + target sequence for each document.

    Documents are packed in ascending ``id_column`` order (ids must be
    numeric; buckets are ``id // bucket_size``, so ids should be roughly
    dense for even buckets — re-key with ``row_number`` upstream if not).

    Adds ``global_offset`` (exclusive prefix sum of token counts),
    ``seq_id`` (= offset // seq_len: the training sequence this document
    starts in) and ``offset_in_seq``. A document may straddle sequence
    boundaries, as in concat-then-chunk loaders.
    """
    bucket = (F.col(id_column) / F.lit(bucket_size)).cast("long").alias("__bucket")
    data = df.select("*", bucket)

    w_in = (
        Window.partitionBy("__bucket")
        .orderBy(id_column)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    data = data.withColumn("__intra", F.sum(token_count_column).over(w_in))

    totals = data.groupBy("__bucket").agg(
        F.sum(token_count_column).alias("__total")
    )
    # one row per bucket: this window is over a bucket-count-sized frame,
    # not the corpus — the single-task stage is bounded and tiny
    w_b = (
        Window.orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefixes = totals.select(
        "__bucket",
        F.coalesce(F.sum("__total").over(w_b), F.lit(0)).alias("__prefix"),
    )

    out = data.join(F.broadcast(prefixes), "__bucket")
    offset = (F.col("__prefix") + F.col("__intra") - F.col(token_count_column)).cast(
        "long"
    )
    return (
        out.withColumn("global_offset", offset)
        .withColumn("seq_id", F.expr(f"global_offset div {seq_len}"))
        .withColumn("offset_in_seq", F.col("global_offset") % seq_len)
        .drop("__bucket", "__intra", "__prefix")
    )


def sliding_window_chunks(
    df: DataFrame,
    text_column: str = "text",
    *,
    id_column: str = "doc_id",
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into overlapping token-window chunks (the RAG /
    context-window shaping step: embed-and-index works on bounded chunks,
    not whole documents).

    Chunk starts advance by ``chunk_tokens - overlap``; every start below
    the document's token count yields a chunk (the tail chunk is shorter).
    Token-less documents yield no chunks. The whole operator is one
    codegen'd projection + explode — no shuffle, no Python — so it maps
    directly over a 100 TB corpus scan; per-row cost is linear in document
    length.

    Output: (id, chunk_index, chunk_start, n_chunk_tokens, chunk_text).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    from pyspark_playground_spark.operators.text import tokens_expr

    toks = tokens_expr(text_column)
    base = df.select(
        F.col(id_column),
        toks.alias("__toks"),
    ).filter(F.size("__toks") > 0)
    chunks = base.select(
        id_column,
        F.posexplode(
            F.expr(f"sequence(0, size(__toks) - 1, {step})")
        ).alias("chunk_index", "chunk_start"),
        F.col("__toks"),
    )
    piece = F.slice(
        F.col("__toks"), F.col("chunk_start") + 1, F.lit(chunk_tokens)
    )
    return chunks.select(
        id_column,
        "chunk_index",
        "chunk_start",
        F.size(piece).alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def assign_grouped_sequence_offsets(
    df: DataFrame,
    *,
    group_column: str,
    id_column: str = "doc_id",
    token_count_column: str = "n_tokens",
    seq_len: int = 2048,
    bucket_size: int = 1024,
) -> DataFrame:
    """Per-group concat-then-chunk packing: each group (language, source,
    curriculum stage) gets its own independent token stream and sequence
    numbering — the layout multilingual pre-training actually uses, so
    one language's documents never straddle into another's sequences.

    Same two-phase prefix sum as ``assign_sequence_offsets``, with every
    window and the cross-bucket prefix keyed by ``(group, bucket)`` —
    parallelism now scales with groups × buckets, and the per-group
    offset table stays broadcast-sized (one row per group-bucket).

    Adds ``global_offset`` / ``seq_id`` / ``offset_in_seq``, all scoped
    within ``group_column``.
    """
    bucket = (F.col(id_column) / F.lit(bucket_size)).cast("long").alias("__bucket")
    data = df.select("*", bucket)

    w_in = (
        Window.partitionBy(group_column, "__bucket")
        .orderBy(id_column)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    data = data.withColumn("__intra", F.sum(token_count_column).over(w_in))

    totals = data.groupBy(group_column, "__bucket").agg(
        F.sum(token_count_column).alias("__total")
    )
    w_b = (
        Window.partitionBy(group_column)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefixes = totals.select(
        group_column,
        "__bucket",
        F.coalesce(F.sum("__total").over(w_b), F.lit(0)).alias("__prefix"),
    )

    out = data.join(F.broadcast(prefixes), [group_column, "__bucket"])
    offset = (
        F.col("__prefix") + F.col("__intra") - F.col(token_count_column)
    ).cast("long")
    return (
        out.withColumn("global_offset", offset)
        .withColumn("seq_id", F.expr(f"global_offset div {seq_len}"))
        .withColumn("offset_in_seq", F.col("global_offset") % seq_len)
        .drop("__bucket", "__intra", "__prefix")
    )


def distributed_rank(
    df: DataFrame,
    *,
    order_column: str,
    id_column: str = "doc_id",
    buckets: int = 64,
) -> DataFrame:
    """Exact 0-based global rank by ``(order_column, id_column)`` without
    a corpus-wide single-task window — the re-key step for curriculum
    ordering (sort by quality, then pack) and for densifying ids before
    ``assign_sequence_offsets``.

    Plan: range-bucket on approximate percentile boundaries of
    ``order_column`` (the boundary QUALITY only affects balance — rank
    EXACTNESS needs only that every row compares against the same
    broadcast boundary array, and that equal order values land in the
    same bucket, which ``value > boundary`` strict comparison guarantees);
    intra-bucket ``row_number``; tiny per-bucket counts cumsum broadcast
    back. Identical to the single-window ``row_number() - 1`` the oracle
    runs. Order values must be non-null (filter or coalesce upstream);
    a heavily repeated order value bounds that bucket's parallelism —
    pass a finer pre-computed key when order values are near-constant.
    """
    qs = [i / buckets for i in range(1, buckets)]
    bounds = df.agg(
        F.expr(
            f"approx_percentile({order_column}, array({','.join(map(str, qs))}), 10000)"
        ).alias("__b")
    )
    data = df.join(F.broadcast(bounds)).withColumn(
        "__bucket",
        F.expr(f"size(filter(__b, b -> {order_column} > b))"),
    ).drop("__b")
    w_in = Window.partitionBy("__bucket").orderBy(order_column, id_column)
    data = data.withColumn("__intra", F.row_number().over(w_in))
    counts = data.groupBy("__bucket").agg(F.count(F.lit(1)).alias("__n"))
    w_b = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    prefixes = counts.select(
        "__bucket",
        F.coalesce(F.sum("__n").over(w_b), F.lit(0)).alias("__prefix"),
    )
    return (
        data.join(F.broadcast(prefixes), "__bucket")
        .withColumn(
            "rank", (F.col("__prefix") + F.col("__intra") - 1).cast("long")
        )
        .drop("__bucket", "__intra", "__prefix")
    )


def distributed_ntile(
    df: DataFrame,
    *,
    k: int,
    order_column: str,
    id_column: str,
    buckets: int = 64,
    out: str = "tile",
    descending: bool = False,
) -> DataFrame:
    """Exact ``ntile(k) OVER (ORDER BY order_column, id_column)`` without
    a corpus-wide single-task sort.

    SQL ``ntile(k)`` over ``n`` rows gives the first ``n mod k`` tiles
    ``n div k + 1`` rows and the rest ``n div k`` — reproduced here from
    :func:`distributed_rank`'s exact 0-based global rank ``r`` as::

        tile(r) = r DIV (base+1) + 1                     if r < rem*(base+1)
                = rem + (r - rem*(base+1)) DIV base + 1  otherwise
        base = n DIV k, rem = n MOD k

    so the plan is the range-bucketed prefix-sum rank (every wide stage
    partitioned) plus one broadcast one-row total — no unpartitioned
    window anywhere, identical output to the single-window ntile the
    oracle runs.

    ``descending=True`` ranks by ``order_column DESC, id_column ASC``
    (the value is sort-key-negated internally; numeric/timestamp/date
    order columns only). Order values must be non-null.
    """
    cols = df.columns
    work = df
    order_key = order_column
    if descending:
        order_key = "__neg_order"
        col = F.col(order_column)
        # dates/timestamps negate via their integral epoch — same total order
        dt = dict(df.dtypes).get(order_column, "")
        if dt in ("timestamp", "timestamp_ntz"):
            col = F.unix_micros(col.cast("timestamp"))
        elif dt == "date":
            col = F.datediff(col, F.lit("1970-01-01"))
        work = df.withColumn(order_key, -col)
    # Inlined distributed_rank with the tile map folded in: the per-bucket
    # counts frame (≤ buckets rows) yields BOTH the exclusive prefix and
    # the grand total in one pass, so no extra corpus-wide aggregate or
    # second broadcast join is needed for n.
    qs = [i / buckets for i in range(1, buckets)]
    bounds = work.agg(
        F.expr(
            f"approx_percentile({order_key}, array({','.join(map(str, qs))}), 10000)"
        ).alias("__b")
    )
    data = work.join(F.broadcast(bounds)).withColumn(
        "__bucket",
        F.expr(f"size(filter(__b, b -> {order_key} > b))"),
    ).drop("__b")
    w_in = Window.partitionBy("__bucket").orderBy(order_key, id_column)
    data = data.withColumn("__intra", F.row_number().over(w_in))
    counts = data.groupBy("__bucket").agg(F.count(F.lit(1)).alias("__n"))
    w_b = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    prefixes = counts.select(
        "__bucket",
        F.coalesce(F.sum("__n").over(w_b), F.lit(0)).alias("__prefix"),
        F.sum("__n").over(w_all).alias("__n_total"),
    )
    rank = F.col("__prefix") + F.col("__intra") - 1
    tile = F.expr(
        f"""
        CASE WHEN __rank < (__n_total % {k}) * (__n_total DIV {k} + 1)
             THEN __rank DIV (__n_total DIV {k} + 1) + 1
             ELSE (__n_total % {k})
                  + (__rank - (__n_total % {k}) * (__n_total DIV {k} + 1))
                    DIV greatest(__n_total DIV {k}, 1)
                  + 1
        END
        """
    ).cast("int")
    return (
        data.join(F.broadcast(prefixes), "__bucket")
        .withColumn("__rank", rank.cast("long"))
        .withColumn(out, tile)
        .select(*cols, out)
    )


def select_token_budget(
    df: DataFrame,
    *,
    score_column: str,
    tokens_column: str,
    id_column: str,
    budget: int,
    buckets: int = 64,
) -> DataFrame:
    """Data selection under a token budget: keep the BEST documents by
    ``score_column`` (descending, ``id_column`` ascending on ties) until
    the cumulative ``tokens_column`` would exceed ``budget`` — the
    "spend 1B tokens on the highest-quality slice" primitive, computed
    exactly and without a global sort.

    A row is kept iff the inclusive cumulative token sum along the
    selection order ``(score DESC, id ASC)`` is ≤ ``budget``. That
    cumulative decomposes into per-partition pieces:

    ``cum(r) = S_gt(r.score) + intra(r)``

    where ``S_gt(s) = total − cum_before_asc(s) − tokens_at(s)`` (tokens
    of strictly higher scores, from the range-bucketed strictly-smaller
    cumulative over the distinct-score frame run ASCENDING) and
    ``intra(r)`` is the inclusive running sum within the row's score
    group ordered by id (a score-partitioned window). Every wide stage
    is partitioned; the per-score frame is persisted (it feeds the
    bounds/main/totals lineages of the cumulative helper). Rows with a
    NULL score, token count, or id are excluded.

    Returns the kept rows: input columns plus ``cum_tokens`` (the
    inclusive cumulative at that row — the last kept row shows how much
    of the budget was actually spent).
    """
    from pyspark_playground_spark.operators.profiling import (
        _bucketed_cum_before,
    )

    cols = df.columns
    src = df.filter(
        F.col(score_column).isNotNull()
        & F.col(tokens_column).isNotNull()
        & F.col(id_column).isNotNull()
    )
    g = (
        src.groupBy(F.col(score_column).alias("__s"))
        .agg(F.sum(tokens_column).alias("__t"))
        .persist()
    )
    cum = _bucketed_cum_before(
        g, order_column="__s", sum_column="__t", out="__cb",
        buckets=buckets,
    )
    total = g.agg(F.sum("__t").alias("__total"))
    w = Window.partitionBy(score_column).orderBy(id_column).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    joined = (
        src.join(
            cum.select(
                F.col("__s").alias(score_column),
                "__cb",
                F.col("__t").alias("__t_at"),
            ),
            score_column,
        )
        .crossJoin(F.broadcast(total))
        .withColumn("__intra", F.sum(tokens_column).over(w))
    )
    cum_tokens = (
        F.col("__total") - F.col("__cb") - F.col("__t_at") + F.col("__intra")
    )
    return (
        joined.withColumn("cum_tokens", cum_tokens.cast("long"))
        .filter(F.col("cum_tokens") <= F.lit(int(budget)))
        .select(*cols, "cum_tokens")
    )


def grouped_token_budget(
    df: DataFrame,
    *,
    group_column: str,
    score_column: str,
    tokens_column: str,
    id_column: str,
    budget_per_group: int,
) -> DataFrame:
    """:func:`select_token_budget` PER GROUP — the mixture-quota
    primitive: each source/language keeps its best documents by
    ``score_column`` until ITS ``budget_per_group`` tokens are spent, so
    a megasource cannot eat the whole corpus budget.

    Simpler than the global operator: the inclusive cumulative along
    ``(score DESC, id ASC)`` within each group is ONE group-partitioned
    window — no range-bucket machinery needed, every wide stage
    partitions on the group key (a single dominant group degrades to
    that group's size; the global operator's decomposition is the
    escape hatch). NULL group/score/tokens/id rows are excluded.

    Returns kept rows: input columns plus ``cum_tokens`` (inclusive
    within the row's group).
    """
    cols = df.columns
    src = df.filter(
        F.col(group_column).isNotNull()
        & F.col(score_column).isNotNull()
        & F.col(tokens_column).isNotNull()
        & F.col(id_column).isNotNull()
    )
    w = Window.partitionBy(group_column).orderBy(
        F.col(score_column).desc(), F.col(id_column).asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        src.withColumn(
            "cum_tokens", F.sum(tokens_column).over(w).cast("long")
        )
        .filter(F.col("cum_tokens") <= F.lit(int(budget_per_group)))
        .select(*cols, "cum_tokens")
    )
