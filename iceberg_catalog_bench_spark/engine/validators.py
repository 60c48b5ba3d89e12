"""Validation operators — the harness's query-result algebra.

Reimplements the reference's validator set
(``iceberg-tests/framework/validators.py:44-124``) one-for-one:

- V1 ``rowcount_equals``        (validators.py:47-53)
- V2 ``rowcount_at_least``      (validators.py:54-60)
- V3 ``store_rows_as``          (validators.py:61-67)
- V4 ``store_rowcount_as``      (validators.py:68-74)
- V5 ``compare_rows_with_state``(validators.py:75-81)
- rowcount derivation heuristic (validators.py:88-124): look for a
  count-ish column, else a single-column first cell, else the
  captured rowcount.

Expectations are rendered through Jinja over the shared run state
before evaluation (e.g. ``expected: "{{ state.baseline_rowcount }}"``
— framework.yaml:399-401). The first failed validation aborts the
rest of the step's validations (validators.py:84-86) — a reference
behavior we keep for parity.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from .statements import StatementResult


class ValidationError(Exception):
    pass


@dataclass
class Validation:
    type: str
    expected: Any = None
    name: str | None = None
    statement_index: int = -1

    @staticmethod
    def from_json(d: dict) -> "Validation":
        return Validation(
            type=d["type"],
            expected=d.get("expected"),
            name=d.get("name") or d.get("store_as"),
            statement_index=int(d.get("statement_index", -1)),
        )


_COUNT_KEYS = ("row_count", "count", "count(1)", "count(*)", "cnt")


def derive_rowcount(result: StatementResult) -> int:
    """Reference heuristic (validators.py:88-124): count-named column
    of the first row → single-column first cell → captured rowcount."""
    if result.rows:
        first = result.rows[0]
        for k in first:
            if k.lower() in _COUNT_KEYS:
                return int(first[k])
        if len(first) == 1:
            (v,) = first.values()
            try:
                return int(v)
            except (TypeError, ValueError):
                pass
        return len(result.rows)
    if result.rowcount is not None:
        return int(result.rowcount)
    raise ValidationError(f"cannot derive rowcount from: {result.statement[:80]}")


def apply_validations(
    validations: list[Validation],
    results: list[StatementResult],
    state: dict[str, Any],
) -> list[str]:
    """Run validations against the step's statement results; mutate
    shared ``state`` for store_* types; return outcome strings.
    Raises ValidationError on the first failure (reference parity)."""
    outcomes: list[str] = []
    for v in validations:
        result = results[v.statement_index]
        if v.type == "rowcount_equals":
            actual = derive_rowcount(result)
            if actual != int(v.expected):
                raise ValidationError(
                    f"rowcount_equals: expected {v.expected}, got {actual} "
                    f"for {result.statement[:80]}"
                )
            outcomes.append(f"rowcount_equals {v.expected} ok")
        elif v.type == "rowcount_at_least":
            actual = derive_rowcount(result)
            if actual < int(v.expected):
                raise ValidationError(
                    f"rowcount_at_least: expected >= {v.expected}, got {actual}"
                )
            outcomes.append(f"rowcount_at_least {v.expected} ok")
        elif v.type == "store_rows_as":
            state[v.name] = result.rows
            outcomes.append(f"stored rows as {v.name}")
        elif v.type == "store_rowcount_as":
            state[v.name] = derive_rowcount(result)
            outcomes.append(f"stored rowcount as {v.name}")
        elif v.type == "compare_rows_with_state":
            expected_rows = state.get(v.name)
            if result.rows != expected_rows:
                raise ValidationError(
                    f"compare_rows_with_state: rows differ from state[{v.name}]"
                )
            outcomes.append(f"compare_rows_with_state {v.name} ok")
        else:
            raise ValidationError(f"unknown validation type {v.type!r}")
    return outcomes
