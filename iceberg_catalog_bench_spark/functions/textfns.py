"""Text column functions shared by the dedup / text-analysis operators.
All built-ins (split / transform / filter) — map-only, codegen-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: str = "text") -> Column:
    """Whitespace tokens of a trimmed text column."""
    return F.split(F.trim(F.col(col)), " ")


def shingles_expr(col: str = "text", n: int = 3) -> str:
    """SQL expression producing the distinct n-word shingle set
    (0-based Spark array indexing). Returned as an expr string so
    callers can embed it in explode()/filter() contexts."""
    words = f"split(trim({col}), ' ')"
    concat = ", ' ', ".join(f"{words}[i+{k}]" for k in range(n))
    return (
        f"CASE WHEN size({words}) < {n} THEN array() "
        f"ELSE array_distinct(transform(sequence(0, size({words}) - {n}), "
        f"i -> concat({concat}))) END"
    )


def stopword_hits(stopwords: tuple[str, ...], col: str = "text") -> Column:
    """Count of tokens that are in the given stopword list."""
    lst = ", ".join(f"'{w}'" for w in stopwords)
    return F.size(F.expr(f"filter(split(trim({col}), ' '), x -> x IN ({lst}))"))
