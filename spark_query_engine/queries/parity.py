"""Reference-parity queries — SURVEY.md §2 core surface.

One query per operator row: scan+projection, filter(eq), literals,
limit, cast, hash aggregate (MIN/MAX/COUNT/SUM — correcting the
reference's Min→Sum lowering bug, reference
src/query_planner/mod.rs:82-85), boolean ops and comparisons
(completing the stub AndExpression,
src/physical_plan/expression/mod.rs:116-143).

The flagship ``filter_eq_project`` reproduces the shape of the
reference's only end-to-end verified pipeline — scan → filter(state =
'CO') → project 3 columns (reference: src/execution/mod.rs:55-85) —
on the driver's ``customer`` table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_query_engine.queries import load, query


@query(
    "scan_project",
    oracle="SELECT c_custkey, c_name FROM customer",
)
def scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan + projection; Catalyst prunes the parquet read to exactly
    these columns (reference ProjectionPushDownRule,
    src/optimizer/mod.rs:32-99, is native here)."""
    return load(spark, sf_dir, "customer").select("c_custkey", "c_name")


@query(
    "filter_eq_project",
    oracle="""
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        WHERE c_mktsegment = 'BUILDING'
    """,
)
def filter_eq_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: scan → filter(eq literal) → project (the reference's
    employees-in-CO query, src/execution/mod.rs:55-85)."""
    return (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == F.lit("BUILDING"))
        .select("c_custkey", "c_name", "c_acctbal")
    )


@query(
    "project_literals",
    oracle="""
        SELECT c_custkey,
               CAST(42 AS BIGINT) AS the_answer,
               'engine' AS tag
        FROM customer
    """,
)
def project_literals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String + long literals as projected columns (reference:
    src/logical_plan/mod.rs:375-425)."""
    return load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.lit(42).cast("bigint").alias("the_answer"),
        F.lit("engine").alias("tag"),
    )


@query(
    "limit_topk",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT with a total order (deterministic top-k) — completes the
    reference's unreachable Limit (src/query_planner/mod.rs:98).
    Spark plans TakeOrderedAndProject: per-partition top-k then a
    single-reduce merge — no full sort shuffle at scale."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "cast_types",
    oracle="""
        SELECT l_orderkey,
               CAST(l_linenumber AS BIGINT) AS line_big,
               CAST(l_orderkey AS VARCHAR) AS okey_str,
               CAST(l_linenumber AS DOUBLE) AS line_dbl
        FROM lineitem
        WHERE l_linenumber = 1
    """,
)
def cast_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CastExpr made executable (the reference planner panics on it,
    src/query_planner/mod.rs:131). Widening + to-string casts, which
    are bit-identical across Spark and the oracle."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("bigint").alias("line_big"),
        F.col("l_orderkey").cast("string").alias("okey_str"),
        F.col("l_linenumber").cast("double").alias("line_dbl"),
    )


@query(
    "agg_group_minmax",
    oracle="""
        SELECT l_returnflag,
               l_linestatus,
               MIN(l_quantity) AS min_qty,
               MAX(l_quantity) AS max_qty,
               COUNT(l_quantity) AS count_qty,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_group_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregate with grouping: MIN/MAX/COUNT/SUM (reference
    logical aggregates src/logical_plan/mod.rs:460-555; its physical
    HashAggregateExec never worked end-to-end — SURVEY.md §3.3).
    Spark runs partial (map-side) + final aggregation automatically."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            F.count("l_quantity").alias("count_qty"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "agg_global",
    oracle="""
        SELECT COUNT(*) AS n_rows,
               MIN(o_totalprice) AS min_price,
               MAX(o_totalprice) AS max_price,
               ROUND(SUM(o_totalprice), 2) AS sum_price,
               ROUND(AVG(o_totalprice), 4) AS avg_price
        FROM orders
    """,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate with empty grouping (one global group — the reference
    supports group_expr=[] implicitly via its hash map on empty key)."""
    return load(spark, sf_dir, "orders").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
    )


@query(
    "filter_boolean_ops",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        FROM lineitem
        WHERE (l_returnflag = 'R' AND l_quantity > 45.0)
           OR (NOT (l_linestatus = 'O') AND l_discount >= 0.09 AND l_quantity <= 3.0)
    """,
)
def filter_boolean_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND / OR / NOT / > / >= / <= — completes the reference's stub
    AndExpression (src/physical_plan/expression/mod.rs:116-143) and
    the absent comparison set (SURVEY.md §2.2 ABSENT row)."""
    li = load(spark, sf_dir, "lineitem")
    cond = (
        (F.col("l_returnflag") == "R") & (F.col("l_quantity") > 45.0)
    ) | (
        (~(F.col("l_linestatus") == "O"))
        & (F.col("l_discount") >= 0.09)
        & (F.col("l_quantity") <= 3.0)
    )
    return li.filter(cond).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount"
    )


@query(
    "filter_neq_in_between",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
        FROM orders
        WHERE o_orderstatus <> 'F'
          AND o_orderpriority IN ('1-URGENT', '2-HIGH')
          AND o_totalprice BETWEEN 1000.0 AND 100000.0
    """,
)
def filter_neq_in_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """!= / IN / BETWEEN (SURVEY.md §2.2 ABSENT predicates)."""
    o = load(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderstatus") != "F")
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_totalprice").between(1000.0, 100000.0)
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")


@query(
    "arithmetic_exprs",
    oracle="""
        SELECT l_orderkey,
               l_linenumber,
               l_extendedprice * (1 - l_discount) AS disc_price,
               l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
               l_quantity + 1.0 AS qty_plus,
               l_quantity - 1.0 AS qty_minus,
               l_extendedprice / l_quantity AS unit_price
        FROM lineitem
        WHERE l_quantity > 0
    """,
)
def arithmetic_exprs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """+ - * / arithmetic expressions (SURVEY.md §2.2 ABSENT row).

    No ROUND on purpose: identical per-row IEEE-754 expression trees are
    bit-exact across engines, while ROUND's half-case handling differs
    (Spark BigDecimal HALF_UP vs DuckDB fp multiply) — rounding is only
    applied where summation order genuinely differs (aggregates)."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
        (
            F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            * (1 + F.col("l_tax"))
        ).alias("charge"),
        (F.col("l_quantity") + 1.0).alias("qty_plus"),
        (F.col("l_quantity") - 1.0).alias("qty_minus"),
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )
