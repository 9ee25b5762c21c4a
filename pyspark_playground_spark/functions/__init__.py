from pyspark_playground_spark.functions.hashing import hash_expr, hash_key, hash_diff

__all__ = ["hash_expr", "hash_key", "hash_diff"]
