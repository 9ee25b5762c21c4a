"""Record linkage: blocked fuzzy matching over string keys.

The classic entity-resolution shape a 100 TB corpus pipeline needs when
joining noisy catalogs (author names, product titles, URLs with typos):
an all-pairs edit-distance join is O(n²) and impossible at scale, so the
standard recipe is

1. **canonicalize** — collapse exact duplicates first (``groupBy`` on the
   normalized string), so heavy-hitter values contribute one row to the
   pairing stage instead of millions;
2. **block** — derive a blocking key (prefix, phonetic code, sorted-token
   fingerprint) and only pair rows sharing a block;
3. **verify** — exact ``levenshtein`` on the candidates.

Everything is built-in Spark SQL (JVM codegen, no Python in the loop);
the self-join shuffles once on the block key. Blocking-key choice is the
scale lever: a high-cardinality key keeps blocks bounded, and ``max_block``
fences runaway blocks (a skew guard, same role as salting in skew.py).

No reference counterpart (the reference has no fuzzy matching); this is
part of the LLM-data-pipeline extension layer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_key_expr(col: str | Column) -> Column:
    """Lower-case, trim, and squeeze internal whitespace — the cheap
    canonical form applied before exact-collapse and blocking."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")


def blocked_fuzzy_pairs(
    df: DataFrame,
    text_column: str,
    *,
    block: Column | None = None,
    max_dist: int = 2,
    min_dist: int = 1,
    max_block: int | None = None,
) -> DataFrame:
    """Distinct value pairs within a block at edit distance in
    ``[min_dist, max_dist]``.

    Returns ``(name_a, name_b, dist, count_a, count_b)`` with
    ``name_a < name_b``; ``count_*`` are the exact-duplicate multiplicities
    collapsed in the canonicalize step, so callers can expand matches back
    to row pairs without ever joining raw rows against raw rows.

    ``block`` defaults to the first character of the normalized value —
    fine for demos; real deployments pass a higher-cardinality expression
    (phonetic code + length bucket). ``max_block`` drops blocks larger
    than the bound instead of letting one hot block go quadratic.
    """
    norm = normalize_key_expr(text_column).alias("name")
    names = (
        df.select(norm)
        .groupBy("name")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    block_expr = block if block is not None else F.substring(F.col("name"), 1, 1)
    names = names.withColumn("__block", block_expr)
    if max_block is not None:
        sizes = names.groupBy("__block").agg(F.count(F.lit(1)).alias("__bsz"))
        names = (
            names.join(sizes, "__block")
            .filter(F.col("__bsz") <= F.lit(max_block))
            .drop("__bsz")
        )
    a = names.alias("a")
    b = names.alias("b")
    pairs = a.join(
        b,
        (F.col("a.__block") == F.col("b.__block"))
        & (F.col("a.name") < F.col("b.name")),
    ).select(
        F.col("a.name").alias("name_a"),
        F.col("b.name").alias("name_b"),
        F.levenshtein(F.col("a.name"), F.col("b.name")).alias("dist"),
        F.col("a.cnt").alias("count_a"),
        F.col("b.cnt").alias("count_b"),
    )
    return pairs.filter(
        (F.col("dist") >= F.lit(min_dist)) & (F.col("dist") <= F.lit(max_dist))
    )
