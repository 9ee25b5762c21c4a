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
    LinkedHubDefinition,
    Operation,
    VaultConfig,
)
from pyspark_playground_spark.functions.hashing import hash_diff, hash_expr, hash_key
from pyspark_playground_spark.operators.vault import BusinessVault, Curated, RawVault
from pyspark_playground_spark.plans.declarative import (
    DeclarativeVault,
    SourceSchema,
    VaultMapping,
)
from pyspark_playground_spark.session import get_spark

__version__ = "0.1.0"

__all__ = [
    "BusinessVault",
    "ColumnDefinition",
    "Curated",
    "DataVaultConventions",
    "DeclarativeVault",
    "LinkedHubDefinition",
    "Operation",
    "RawVault",
    "SourceSchema",
    "VaultConfig",
    "VaultMapping",
    "get_spark",
    "hash_diff",
    "hash_expr",
    "hash_key",
    "__version__",
]
