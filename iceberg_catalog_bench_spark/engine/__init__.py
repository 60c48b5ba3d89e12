from .runner import PlanReport, PlanRunner, StepReport
from .sql_frontend import SqlEngine, split_statements
from .statements import StatementResult
from .validators import Validation, ValidationError, apply_validations, derive_rowcount

__all__ = [
    "PlanReport",
    "PlanRunner",
    "SqlEngine",
    "StatementResult",
    "StepReport",
    "Validation",
    "ValidationError",
    "apply_validations",
    "derive_rowcount",
    "split_statements",
]
