"""Parity API tests: ExecutionContext + Dataframe builder verbs.

Mirrors the reference's test style — in-memory fixtures shaped like
its employee.csv (reference: testdata/employee.csv, FIXTURES.md) and
its end-to-end golden test (src/execution/mod.rs:55-85)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_query_engine import col, lit_long, lit_string

EMPLOYEES = [
    {"id": "1", "first_name": "Bob", "last_name": "Ben", "state": "CO", "salary": "1000"},
    {"id": "2", "first_name": "Ann", "last_name": "Lee", "state": "CA", "salary": "2000"},
    {"id": "3", "first_name": "Cy", "last_name": "Day", "state": "CA", "salary": "1500"},
    {"id": "4", "first_name": "Mayne", "last_name": "Vary", "state": "CO", "salary": "3000"},
]


def _employees(ctx):
    return ctx.memory(EMPLOYEES)


def test_filter_project_end_to_end(ctx):
    """The reference's flagship: filter state='CO' → project 3 cols
    (src/execution/mod.rs:55-85 expects rows 1,Bob,Ben and 4,Mayne,Vary)."""
    df = (
        _employees(ctx)
        .filter(col("state") == lit_string("CO"))
        .project(col("id"), col("first_name"), col("last_name"))
    )
    rows = sorted(tuple(r) for r in df.collect())
    assert rows == [("1", "Bob", "Ben"), ("4", "Mayne", "Vary")]


def test_aggregate_min_max_count_sum(ctx):
    """Correct MIN (the reference lowers Min to Sum by mistake,
    src/query_planner/mod.rs:82-85) + MAX/COUNT/SUM end-to-end (its
    HashAggregateExec never worked, SURVEY.md §3.3)."""
    df = _employees(ctx).aggregate(
        [col("state")],
        [
            F.min(col("salary").cast("int")).alias("min_sal"),
            F.max(col("salary").cast("int")).alias("max_sal"),
            F.count(col("salary")).alias("n"),
            F.sum(col("salary").cast("int")).alias("sum_sal"),
        ],
    )
    rows = {r["state"]: (r["min_sal"], r["max_sal"], r["n"], r["sum_sal"]) for r in df.collect()}
    assert rows == {"CO": (1000, 3000, 2, 4000), "CA": (1500, 2000, 2, 3500)}


def test_limit_and_sort(ctx):
    """Completes the reference's unreachable Limit (todo!() at
    src/query_planner/mod.rs:98)."""
    df = _employees(ctx).sort(col("salary").cast("int").desc()).limit(2)
    assert [r["id"] for r in df.collect()] == ["4", "2"]


def test_cast(ctx):
    """Completes CastExpr lowering (src/query_planner/mod.rs:131)."""
    df = _employees(ctx).project(col("salary").cast("int").alias("s"))
    assert sorted(r["s"] for r in df.collect()) == [1000, 1500, 2000, 3000]
    assert df.schema()["s"].dataType.typeName() == "integer"


def test_schema_introspection(ctx):
    df = _employees(ctx)
    assert set(df.schema().fieldNames()) == {
        "id", "first_name", "last_name", "state", "salary",
    }


def test_csv_all_string_inference(ctx, tmp_path):
    """CSV default mirrors the reference: header-driven, all columns
    StringType (src/datasources/mod.rs:62-66)."""
    p = tmp_path / "emp.csv"
    p.write_text("id,name,age\n1,bob,30\n2,ann,40\n")
    df = ctx.csv(str(p))
    assert [f.dataType.typeName() for f in df.schema().fields] == ["string"] * 3
    assert df.count() == 2


def test_join_union_distinct(ctx):
    left = _employees(ctx)
    states = ctx.memory([{"state": "CO", "region": "west"}, {"state": "CA", "region": "west"}])
    joined = left.join(states, "state")
    assert joined.count() == 4
    assert left.union(left).distinct().count() == 4


def test_execute_iterator(ctx):
    rows = list(ctx.execute(_employees(ctx).project(col("id"))))
    assert len(rows) == 4
