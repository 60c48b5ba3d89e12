"""Statement-form parity against the ENTIRE reference SQL corpus.

Every statement in the reference repo's .sql files (all engine
dialects: spark/open_catalog, snowflake/open_catalog, databricks/
unity_catalog, plus the account-level snowflake.sql walkthrough) must
at least PARSE into a frontend handler — state errors (a table the
audit never created, a deliberately-failing teardown) are fine, but an
"unsupported statement" error means a user of the reference has a
query our engine cannot route.

The two statement families the frontend deliberately refuses —
CREATE/ALTER SNAPSHOT POLICY/SET — are ones the reference itself
shows erroring on catalog-linked tables (snowflake.sql:380-388), and
they raise "not supported", not "unsupported statement".
"""

import glob
import os
import re

import pytest

from iceberg_catalog_bench_spark.engine.sql_frontend import (
    SqlEngine,
    split_statements,
)

_REF = "/root/reference"


@pytest.mark.skipif(not os.path.isdir(_REF), reason="reference repo not present")
def test_every_reference_statement_parses(spark, tmp_path):
    eng = SqlEngine(spark, str(tmp_path / "audit-wh"))
    files = sorted(
        set(glob.glob(f"{_REF}/**/*.sql", recursive=True) + [f"{_REF}/snowflake.sql"])
    )
    assert files, "reference corpus unexpectedly empty"
    total, unsupported = 0, []
    for f in files:
        txt = open(f).read()
        # neutralize Jinja placeholders the reference harness renders
        txt = re.sub(r"\{\{[^}]*\}\}", "audit_ns.sales_events", txt)
        txt = re.sub(r"\{%[^%]*%\}", "", txt)
        for s in split_statements(txt):
            total += 1
            try:
                eng._execute_one(s)
            except ValueError as e:
                if "unsupported" in str(e).lower():
                    unsupported.append(f"{os.path.basename(f)}: {s[:80]!r}")
            except Exception:
                pass  # state error — the form parsed and routed
    assert total >= 200, f"corpus shrank? saw {total} statements"
    assert not unsupported, "\n".join(unsupported)
