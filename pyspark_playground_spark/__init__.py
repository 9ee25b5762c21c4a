"""pyspark_playground_spark — a PySpark-native Data Vault 2.0 + analytics engine.

Clean-room rebuild of the capabilities of ``alpine-data/pyspark-playground``
(reference surveyed in SURVEY.md), re-expressed Spark-first:

- Raw vault: staging, hubs, links (2-ary + N-ary), satellites, effectivity
  satellites, reference / code-reference tables — insert-only ("v2")
  semantics via anti-join + append (reference: pysparkvault/raw/RawVault.py).
- Business vault: point-in-time tables (lead-window instead of the
  reference's theta self-join), temporal zip joins, link-mediated joins
  (reference: pysparkvault/raw/BusinessVault.py).
- Curated: field-mapping driven denormalization (reference:
  pysparkvault/raw/Curated.py).
- Extensions beyond the reference (north star): dedup (exact / MinHash-LSH /
  SimHash / n-gram Jaccard / embedding cosine), similarity search, text
  analysis, multimodal column plumbing, Structured Streaming CDC ingestion.

Everything is the DataFrame / SQL API; Catalyst + AQE pick physical plans.
"""

from pyspark_playground_spark.conventions import (
    ColumnDefinition,
    DataVaultConventions,
    Operation,
)
from pyspark_playground_spark.functions.hashing import hash_expr

__version__ = "0.1.0"

__all__ = [
    "ColumnDefinition",
    "DataVaultConventions",
    "Operation",
    "hash_expr",
    "__version__",
]
