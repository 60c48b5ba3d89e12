"""Plan runner — the reference's config-first orchestration state
machine (``iceberg-tests/framework/runner.py:124-174``), collapsed to
one Spark engine.

A plan is an ordered list of steps; each step names a SQL script
(Jinja2-rendered over namespace / vars / shared mutable state) and a
list of validations addressing the rendered statements by index. Step
failure marks the plan failed and stops unless ``continue_on_error``
(runner.py:160-171). Reports mirror PlanReport.status
(runner.py:33-39): failed if any step failed, skipped if all skipped,
else passed.
"""

from __future__ import annotations

import datetime as dt
import os
from dataclasses import dataclass, field
from typing import Any

import jinja2
import yaml

from .sql_frontend import SqlEngine, split_statements
from .validators import Validation, ValidationError, apply_validations

_JINJA = jinja2.Environment(undefined=jinja2.StrictUndefined)


@dataclass
class StepReport:
    name: str
    status: str  # passed / failed / skipped
    statements: int = 0
    outcomes: list[str] = field(default_factory=list)
    error: str | None = None


@dataclass
class PlanReport:
    plan: str
    run_id: str
    steps: list[StepReport] = field(default_factory=list)

    @property
    def status(self) -> str:
        if any(s.status == "failed" for s in self.steps):
            return "failed"
        if self.steps and all(s.status == "skipped" for s in self.steps):
            return "skipped"
        return "passed"


class PlanRunner:
    def __init__(
        self,
        engine: SqlEngine,
        plans: dict[str, Any],
        sql_dir: str | None = None,
        variables: dict[str, Any] | None = None,
    ):
        self.engine = engine
        self.plans = plans
        self.sql_dir = sql_dir
        self.variables = variables or {}
        self.state: dict[str, Any] = {}

    @classmethod
    def from_yaml(cls, engine: SqlEngine, config_path: str, **kw) -> "PlanRunner":
        with open(config_path) as fh:
            cfg = yaml.safe_load(fh)
        sql_dir = kw.pop("sql_dir", os.path.join(os.path.dirname(config_path), "sql"))
        return cls(engine, cfg.get("plans", {}), sql_dir=sql_dir,
                   variables=cfg.get("variables", {}), **kw)

    def _render(self, template: str, namespace: str) -> str:
        ctx = {
            "namespace": namespace,
            "state": self.state,
            **self.variables,
        }
        return _JINJA.from_string(template).render(**ctx)

    def run_plan(self, plan_name: str, namespace: str = "bench_ns") -> PlanReport:
        plan = self.plans[plan_name]
        # run_id = UTC timestamp, like runner.py:130
        run_id = dt.datetime.now(dt.timezone.utc).strftime("%Y%m%dT%H%M%SZ")
        report = PlanReport(plan=plan_name, run_id=run_id)
        for step in plan["steps"]:
            name = step.get("name") or step.get("sql", "inline")
            sr = StepReport(name=name, status="passed")
            try:
                if "sql" in step and step["sql"].endswith(".sql"):
                    with open(os.path.join(self.sql_dir, step["sql"])) as fh:
                        script = fh.read()
                else:
                    script = step.get("sql") or step["inline"]
                rendered = self._render(script, namespace)
                statements = split_statements(rendered)
                results = self.engine.execute(statements)
                sr.statements = len(results)
                validations = [Validation.from_json(v) for v in step.get("validations", [])]
                # expectations render over run state (framework.yaml:399-401)
                for v in validations:
                    if isinstance(v.expected, str):
                        v.expected = self._render(v.expected, namespace)
                sr.outcomes = apply_validations(validations, results, self.state)
            except (ValidationError, Exception) as e:  # noqa: BLE001 — step isolation
                sr.status = "failed"
                sr.error = f"{type(e).__name__}: {e}"
            report.steps.append(sr)
            if sr.status == "failed" and not step.get("continue_on_error", False):
                break
        return report
