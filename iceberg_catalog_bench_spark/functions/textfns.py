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
    callers can embed it in explode()/filter() contexts.

    The token array is bound ONCE per row as a lambda variable
    (``transform(array(split(...)), toks -> ...)[0]``): Spark performs
    no loop-invariant hoisting inside higher-order-function lambdas, so
    inlining ``split(trim(col))`` at every index re-splits the text per
    shingle — O(tokens) splits per document, measured 13-14x slower at
    n=3/n=5 on the sf0.1 corpus (r15 optimization round)."""
    concat = ", ' ', ".join(f"toks[i+{k}]" for k in range(n))
    return (
        f"transform(array(split(trim({col}), ' ')), toks -> "
        f"CASE WHEN size(toks) < {n} THEN array() "
        f"ELSE array_distinct(transform(sequence(0, size(toks) - {n}), "
        f"i -> concat({concat}))) END)[0]"
    )


def stopword_hits(stopwords: tuple[str, ...], col: str = "text") -> Column:
    """Count of tokens that are in the given stopword list."""
    lst = ", ".join(f"'{w}'" for w in stopwords)
    return F.size(F.expr(f"filter(split(trim({col}), ' '), x -> x IN ({lst}))"))
