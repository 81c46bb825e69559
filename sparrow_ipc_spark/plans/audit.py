"""Physical-plan audits: assert the plans we ship are the plans we want.

The engine has no custom Catalyst rules (SURVEY.md §4) — its performance
contract is that Catalyst produces specific shapes: no Exchange in the
clustered encode or in decode, pushed filters reaching the parquet scan
for zone-map pruning, broadcast (never shuffle) joins for dictionary-side
lookups.  These helpers make those properties testable so a regression
(an accidental shuffle, a filter that stopped pushing down) fails CI
instead of shipping a 100TB-scale slowdown.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan
    (broadcast exchanges excluded — those are the cheap kind)."""
    return len(shuffle_exchanges(df))


def shuffle_exchanges(df: DataFrame) -> list[str]:
    """Lines of the plan that are shuffle exchanges (hash/range/single)."""
    plan = simple_plan(df)
    out = []
    for line in plan.splitlines():
        if "Exchange" in line and "BroadcastExchange" not in line:
            out.append(line.strip())
    return out


def assert_no_shuffle(df: DataFrame, what: str = "plan") -> None:
    ex = shuffle_exchanges(df)
    assert not ex, f"{what} has unexpected shuffle exchange(s): {ex}"


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section of the scan node ('' if none)."""
    m = re.search(r"PushedFilters:\s*\[([^\]]*)\]", formatted_plan(df))
    return m.group(1).strip() if m else ""


def scan_schema(df: DataFrame) -> str:
    """ReadSchema of the scan — verifies column pruning reached parquet."""
    m = re.search(r"ReadSchema:\s*(\S+)", formatted_plan(df))
    return m.group(1) if m else ""


def wholestage_codegen_spans(df: DataFrame) -> int:
    return formatted_plan(df).count("WholeStageCodegen")
