from .vectors import (cosine_similarity, dot_product, l2_norm,
                      l2_sq_dist, lsh_band_buckets, lsh_band_buckets_arrow)
from .textfns import shingles_expr, tokens, stopword_hits

__all__ = [
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "l2_sq_dist",
    "lsh_band_buckets",
    "lsh_band_buckets_arrow",
    "shingles_expr",
    "stopword_hits",
    "tokens",
]
