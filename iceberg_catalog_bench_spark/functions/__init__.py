from .vectors import cosine_similarity, dot_product, l2_norm, lsh_band_buckets
from .textfns import shingles_expr, tokens, stopword_hits

__all__ = [
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "lsh_band_buckets",
    "shingles_expr",
    "stopword_hits",
    "tokens",
]
