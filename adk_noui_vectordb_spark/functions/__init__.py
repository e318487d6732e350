from .vector import cosine_similarity, dot_product, l2_distance, l2_normalize
from .text import (
    punct_ratio,
    regex_token_count,
    stopword_ratio,
    whitespace_tokens,
    word_count,
)

__all__ = [
    "cosine_similarity",
    "dot_product",
    "l2_distance",
    "l2_normalize",
    "whitespace_tokens",
    "word_count",
    "regex_token_count",
    "punct_ratio",
    "stopword_ratio",
]
