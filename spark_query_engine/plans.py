"""Plan introspection helpers.

The reference pretty-prints logical and physical plans for golden
tests (reference: src/logical_plan/mod.rs:34-45 and
src/physical_plan/mod.rs:32-43) and implements a single optimizer rule
— projection pushdown into the scan (src/optimizer/mod.rs:32-99).
In Spark, Catalyst performs column pruning + predicate pushdown (and
dozens more rewrites) natively; these helpers expose the plan text so
tests can *assert* that the pushdowns actually happened, instead of
reimplementing them.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame as SparkDataFrame


def format_plan(sdf: SparkDataFrame, which: str = "optimized") -> str:
    """Return one plan stage as a string.

    which: 'parsed' | 'logical' | 'optimized' | 'physical'
    """
    qe = sdf._jdf.queryExecution()
    if which == "parsed":
        return qe.logical().toString()
    if which == "logical":
        return qe.analyzed().toString()
    if which == "optimized":
        return qe.optimizedPlan().toString()
    if which == "physical":
        return qe.executedPlan().toString()
    raise ValueError(f"unknown plan stage: {which}")


def formatted_explain(sdf: SparkDataFrame) -> str:
    """Spark's `.explain('formatted')` output, as a string."""
    return sdf._sc._jvm.PythonSQLUtils.explainString(
        sdf._jdf.queryExecution(), "formatted"
    )


def scan_read_schema(sdf: SparkDataFrame) -> list[str]:
    """Columns actually read by the (first) parquet scan — proves column
    pruning (the Spark-native equivalent of the reference's
    ProjectionPushDownRule, src/optimizer/mod.rs:32-99)."""
    text = formatted_explain(sdf)
    m = re.search(r"ReadSchema: struct<([^>]*)>", text)
    if not m:
        return []
    inner = m.group(1)
    return [f.split(":")[0].strip() for f in inner.split(",") if f.strip()]


def pushed_filters(sdf: SparkDataFrame) -> str:
    """The PushedFilters clause of the scan, '' if none."""
    text = formatted_explain(sdf)
    m = re.search(r"PushedFilters: \[([^\]]*)\]", text)
    return m.group(1) if m else ""


def uses_broadcast_join(sdf: SparkDataFrame) -> bool:
    """True if any join in the plan builds a broadcast side (hash or
    nested-loop — the latter is what a join without equi-keys, e.g. an
    IVF codebook cross join, plans as)."""
    text = format_plan(sdf, "physical")
    return "BroadcastHashJoin" in text or "BroadcastNestedLoopJoin" in text


def wholestage_codegen_spans(sdf: SparkDataFrame) -> int:
    """Number of whole-stage-codegen spans in the physical plan (the
    tree string marks them ``*(n) Op``; the formatted explain uses
    ``WholeStageCodegen (n)``)."""
    text = format_plan(sdf, "physical")
    ids = set(re.findall(r"\*\((\d+)\)", text))
    if ids:
        return len(ids)
    return formatted_explain(sdf).count("WholeStageCodegen")
