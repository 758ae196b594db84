from .cleaning import clean_text, clean_text_udf
from .sentences import split_sentences, split_sentences_udf
from .analyzer import (
    analyze,
    analyze_udf,
    tokenize_expr,
    TOKEN_PATTERN,
    valid_parentheses,
)

__all__ = [
    "clean_text",
    "split_sentences",
    "split_sentences_udf",
    "clean_text_udf",
    "analyze",
    "analyze_udf",
    "tokenize_expr",
    "TOKEN_PATTERN",
    "valid_parentheses",
]
