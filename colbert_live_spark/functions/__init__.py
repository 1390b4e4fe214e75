from colbert_live_spark.functions.tokenize import (
    DUCKDB_TOKENIZE,
    py_tokenize,
    tokenize_expr,
    tokenize_udf,
)

__all__ = ["tokenize_expr", "tokenize_udf", "py_tokenize", "DUCKDB_TOKENIZE"]
