from .tokenizer import (
    CAMEL_BOUNDARY_1,
    CAMEL_BOUNDARY_2,
    TOKEN_SPLIT,
    flat_tokens,
    normalize_array,
    sql_norm_expr,
    sql_tokens_expr,
    tokenize_array,
    tokenize_text,
)

__all__ = [
    "CAMEL_BOUNDARY_1",
    "CAMEL_BOUNDARY_2",
    "TOKEN_SPLIT",
    "flat_tokens",
    "normalize_array",
    "sql_norm_expr",
    "sql_tokens_expr",
    "tokenize_array",
    "tokenize_text",
]
