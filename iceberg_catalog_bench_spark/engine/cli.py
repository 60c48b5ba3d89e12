"""Plan-execution CLI — reference entry point A
(``iceberg-tests/orchestrator.py:1-4`` → ``framework/cli.py:34-61``):
parse ``--plan/--namespace/--var/--json``, run the plan, print a
human or JSON report, exit 0/1 on plan status (``cli.py:63-85``).

Usage:
    python -m iceberg_catalog_bench_spark --plan sales_events_crud \
        [--namespace ns] [--warehouse DIR] [--config plans.yaml] [--json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="Run a SQL test plan against the engine")
    p.add_argument("--plan", required=True, help="plan name from the config")
    p.add_argument("--namespace", default="bench_ns")
    p.add_argument("--warehouse", default=None, help="LakeTable warehouse dir (default: temp)")
    p.add_argument(
        "--config",
        default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                             "plans", "crud_plan.yaml"),
    )
    p.add_argument("--var", action="append", default=[], metavar="KEY=VALUE",
                   help="extra template variables")
    p.add_argument("--json", action="store_true", help="emit the report as JSON")
    args = p.parse_args(argv)

    from ..session import get_spark
    from .runner import PlanRunner
    from .sql_frontend import SqlEngine

    spark = get_spark(app_name=f"plan-{args.plan}")
    warehouse = args.warehouse or tempfile.mkdtemp(prefix="lake-warehouse-")
    engine = SqlEngine(spark, warehouse)
    runner = PlanRunner.from_yaml(engine, args.config)
    for kv in args.var:
        k, _, v = kv.partition("=")
        runner.variables[k] = v
    report = runner.run_plan(args.plan, namespace=args.namespace)

    if args.json:
        print(json.dumps({
            "plan": report.plan,
            "run_id": report.run_id,
            "status": report.status,
            "steps": [
                {"name": s.name, "status": s.status, "statements": s.statements,
                 "outcomes": s.outcomes, "error": s.error}
                for s in report.steps
            ],
        }, indent=2))
    else:
        print(f"plan {report.plan} [{report.run_id}]: {report.status}")
        for s in report.steps:
            line = f"  {s.status:>7}  {s.name} ({s.statements} stmts)"
            if s.error:
                line += f"  !! {s.error}"
            print(line)
    return 0 if report.status == "passed" else 1


if __name__ == "__main__":
    sys.exit(main())
