"""Physical-plan regression checks.

The optimizer properties this engine depends on (filter pushdown into
parquet scans, column pruning, broadcast joins for dims, no
row-at-a-time Python in JVM pipelines) are asserted as tests, not
assumed — a refactor that silently turns a broadcast join into a
cartesian product or de-prunes a scan fails CI, the same way a wrong
result would.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def scans(plan: str) -> list:
    """Parquet scan blocks: list of dicts with pushed filters/schema."""
    out = []
    for m in re.finditer(
        r"\(\d+\) Scan parquet ?\n(.*?)(?=\n\(\d+\)|\Z)", plan, re.S
    ):
        block = m.group(1)
        pf = re.search(r"PushedFilters: \[(.*?)\]", block)
        rs = re.search(r"ReadSchema: (.*)", block)
        out.append(
            {
                "pushed": pf.group(1) if pf else "",
                "schema": rs.group(1).strip() if rs else "",
                "block": block,
            }
        )
    return out


def assert_pushed_filter(df: DataFrame, fragment: str):
    plan = formatted_plan(df)
    assert any(
        fragment in s["pushed"] for s in scans(plan)
    ), f"no scan pushes {fragment!r}:\n{plan}"


def assert_column_pruned(df: DataFrame, column: str):
    plan = formatted_plan(df)
    sc = scans(plan)
    assert sc, f"no parquet scans in plan:\n{plan}"
    assert all(
        column not in s["schema"] for s in sc
    ), f"column {column!r} not pruned:\n{plan}"


def assert_broadcast_join(df: DataFrame, min_count: int = 1):
    plan = formatted_plan(df)
    n = plan.count("BroadcastHashJoin")
    assert n >= min_count, f"expected >= {min_count} broadcast joins, got {n}:\n{plan}"


def assert_no_cartesian(df: DataFrame):
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, f"cartesian product in plan:\n{plan}"


def assert_whole_stage_codegen(df: DataFrame):
    """The plan is JVM/codegen-eligible end to end.  Under AQE the
    formatted plan hides WholeStageCodegen ids until execution, so the
    AQE form is accepted when no Python-eval operators appear."""
    plan = formatted_plan(df)
    if "WholeStageCodegen" in plan:
        return
    assert "AdaptiveSparkPlan" in plan and not re.search(
        r"BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", plan
    ), f"no codegen spans:\n{plan}"


def assert_no_python_row_udf(df: DataFrame):
    """BatchEvalPython = row-at-a-time Python UDF (forbidden in this
    codebase); ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas
    (vectorized) are allowed."""
    plan = formatted_plan(df)
    assert "BatchEvalPython" not in plan, f"row-at-a-time Python UDF:\n{plan}"
