"""Statement execution contract.

Mirrors the reference's ``StatementResult`` shape
(``iceberg-tests/framework/engines/base.py:15-27``): every executed
statement yields the statement text, captured rows (as dicts, like
``row.asDict(recursive=True)`` in ``engines/spark.py:66``), a
rowcount, and free-form metadata. Row capture is truncated at
``max_result_rows`` (default 200 — ``engines/spark.py:51``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

MAX_RESULT_ROWS = 200

# Leading keywords whose statements produce no result rows — the same
# outputless-keyword routing the reference's Spark adapter applies
# (``engines/spark.py:54-62``), extended with our CALL/maintenance ops.
OUTPUTLESS_KEYWORDS = {
    "create", "drop", "alter", "insert", "update", "delete", "merge", "use",
}


@dataclass
class StatementResult:
    statement: str
    rows: list[dict[str, Any]] | None = None
    rowcount: int | None = None
    metadata: dict[str, Any] = field(default_factory=dict)
