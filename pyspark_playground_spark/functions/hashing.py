"""Row-hash expressions for hub keys and attribute diffs.

Parity target: ``DataVaultShared.py:11-19`` in the reference —
``HKEY = md5(concat_ws(',', business_keys))``,
``HDIFF = md5(concat_ws(',', attributes))``.

Semantics notes (these matter for hash parity with the reference and with
SQL oracles):

- ``concat_ws`` SKIPS null arguments entirely (``concat_ws(',', 'a', NULL,
  'b') = 'a,b'``) in both Spark and ANSI engines like DuckDB, so null
  handling matches for free.
- Every column is explicitly cast to string first so the text rendering is
  under our control, not implicit-cast rules.
- ``md5`` is the reference dialect; ``xxhash64`` is offered as the scale
  option (8-byte long vs 32-char string → smaller shuffle + join keys at
  100 TB; not hash-compatible with the reference).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _concat(columns: Sequence[str | Column]) -> Column:
    cols = [
        (F.col(c) if isinstance(c, str) else c).cast("string") for c in columns
    ]
    return F.concat_ws(",", *cols)


def hash_expr(columns: Sequence[str | Column], hash_function: str = "md5") -> Column:
    """Deterministic row hash of ``columns`` (order matters)."""
    concat = _concat(columns)
    if hash_function == "md5":
        return F.md5(concat)
    if hash_function == "xxhash64":
        return F.xxhash64(concat)
    raise ValueError(f"unknown hash_function: {hash_function!r}")


def hash_key(columns: Sequence[str | Column], hash_function: str = "md5") -> Column:
    """Business-key hash (HKEY). Reference: DataVaultShared.py:11-14."""
    return hash_expr(columns, hash_function)


def hash_diff(columns: Sequence[str | Column], hash_function: str = "md5") -> Column:
    """Attribute-diff hash (HDIFF). Reference: DataVaultShared.py:16-19."""
    return hash_expr(columns, hash_function)
