"""Window functions, scalar functions, grouping sets — SURVEY.md §2.6 /
§2.9 (ABSENT in the reference; the only scalar expressions there are
column refs, literals, Eq, a stub And, and an unplanned Cast —
src/logical_plan/mod.rs:244-625).

All expressions are built-in ``pyspark.sql.functions`` — JVM-side,
inside whole-stage codegen. No Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from spark_query_engine.queries import load, query


@query(
    "window_topk_per_group",
    oracle="""
        SELECT c_nationkey, c_custkey, c_acctbal, rn
        FROM (
            SELECT c_nationkey, c_custkey, c_acctbal,
                   ROW_NUMBER() OVER (
                       PARTITION BY c_nationkey
                       ORDER BY c_acctbal DESC, c_custkey
                   ) AS rn
            FROM customer
        )
        WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via ROW_NUMBER — the canonical windowed pattern;
    shuffles once on the partition key."""
    w = W.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        load(spark, sf_dir, "customer")
        .select(
            "c_nationkey",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_rank_dense",
    oracle="""
        SELECT p_brand, p_partkey, p_retailprice,
               RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rnk,
               DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_size) AS drnk
        FROM part
    """,
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    wp = W.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    ws = W.partitionBy("p_brand").orderBy("p_size")
    return load(spark, sf_dir, "part").select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        F.rank().over(wp).alias("rnk"),
        F.dense_rank().over(ws).alias("drnk"),
    )


@query(
    "window_running_sum",
    oracle="""
        SELECT o_custkey, o_orderkey, o_orderdate,
               ROUND(SUM(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ), 2) AS running_spend
        FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate with an explicit ROWS frame."""
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@query(
    "window_lag_lead",
    oracle="""
        SELECT user_id, event_id, ts,
               LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
               LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        FROM events
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@query(
    "scalar_string_funcs",
    oracle="""
        SELECT p_partkey,
               UPPER(p_brand) AS brand_upper,
               LOWER(p_type) AS type_lower,
               SUBSTR(p_name, 1, 8) AS name_prefix,
               LENGTH(p_name) AS name_len,
               CONCAT(p_brand, ':', p_type) AS brand_type,
               REPLACE(p_type, ' ', '_') AS type_snake,
               TRIM(p_name) AS name_trim
        FROM part
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function surface (SURVEY.md §2.9 ABSENT row)."""
    return load(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.trim("p_name").alias("name_trim"),
    )


@query(
    "scalar_date_funcs",
    oracle="""
        SELECT o_orderkey,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS order_year,
               CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS order_month,
               CAST(EXTRACT(DAY FROM o_orderdate) AS INT) AS order_day,
               CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
               CAST(o_orderdate AS DATE) AS order_date
        FROM orders
    """,
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function surface. Session TZ is pinned UTC so values
    agree with the oracle's naive timestamps."""
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.to_date("o_orderdate").alias("order_date"),
    )


@query(
    "scalar_math_funcs",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               ROUND(ABS(l_discount - 0.05), 6) AS abs_disc,
               ROUND(SQRT(l_quantity), 6) AS sqrt_qty,
               CAST(CEIL(l_quantity / 7.0) AS BIGINT) AS ceil_qty,
               CAST(FLOOR(l_quantity / 7.0) AS BIGINT) AS floor_qty,
               CAST(l_linenumber % 3 AS INT) AS line_mod,
               ROUND(LN(l_extendedprice), 6) AS ln_price,
               ROUND(POWER(2.0, CAST(l_linenumber AS DOUBLE)), 6) AS pow2
        FROM lineitem
    """,
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function surface. ROUND guards the transcendentals
    (sqrt/ln) against cross-engine libm last-bit differences; CEIL/FLOOR
    are pinned to BIGINT on BOTH sides (Spark returns LongType, DuckDB
    returns DOUBLE — the driver hashes typed values, so 28 != 28.0)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("abs_disc"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        F.ceil(F.col("l_quantity") / 7.0).cast("bigint").alias("ceil_qty"),
        F.floor(F.col("l_quantity") / 7.0).cast("bigint").alias("floor_qty"),
        (F.col("l_linenumber") % 3).alias("line_mod"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_price"),
        F.round(F.pow(F.lit(2.0), F.col("l_linenumber").cast("double")), 6).alias("pow2"),
    )


@query(
    "scalar_case_when",
    oracle="""
        SELECT o_orderkey,
               CASE
                   WHEN o_totalprice < 50000.0 THEN 'small'
                   WHEN o_totalprice < 150000.0 THEN 'medium'
                   WHEN o_totalprice < 300000.0 THEN 'large'
                   ELSE 'jumbo'
               END AS price_band,
               CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS is_open
        FROM orders
    """,
)
def scalar_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 50000.0, "small")
        .when(F.col("o_totalprice") < 150000.0, "medium")
        .when(F.col("o_totalprice") < 300000.0, "large")
        .otherwise("jumbo")
        .alias("price_band"),
        F.when(F.col("o_orderstatus") == "O", 1).otherwise(0).alias("is_open"),
    )


@query(
    "agg_count_distinct",
    oracle="""
        SELECT o_orderpriority,
               COUNT(DISTINCT o_custkey) AS n_customers,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY o_orderpriority
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT aggregate (SURVEY.md §2.5 ABSENT row). Spark expands
    this to a two-phase aggregation automatically."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "agg_rollup",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_rows,
               ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (SURVEY.md §2.5 ABSENT row)."""
    return (
        load(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


@query(
    "agg_approx_distinct",
    oracle=None,  # approximate by design — rows-only check
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL approximate distinct — the 100 TB-scale substitute for exact
    COUNT(DISTINCT). No oracle: estimates are engine-specific."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        )
    )


@query(
    "agg_approx_distinct_error",
    oracle="""
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey) AS exact_parts,
               TRUE AS within_5pct
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def agg_approx_distinct_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The checkable contract for the HLL estimate: per group, the
    exact distinct count (hash-verified against the oracle) plus a
    within-5%% flag comparing Spark's HLL sketch to that exact count.
    The oracle asserts the flag is TRUE, so an HLL drifting past 5%%
    relative error turns this row red in the hard gate — a
    quantitative bound on the one value that is engine-specific by
    design (``agg_approx_distinct`` stays rows-only for the raw
    estimates)."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count_distinct("l_partkey").alias("exact_parts"),
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("approx") - F.col("exact_parts"))
                <= 0.05 * F.col("exact_parts")
            ).alias("within_5pct"),
        )
    )


@query(
    "scalar_bitwise_funcs",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               xor(l_orderkey, CAST(l_linenumber AS BIGINT)) AS key_xor,
               l_orderkey & 255 AS low_byte,
               l_orderkey | 1 AS set_lsb,
               CAST(l_orderkey << 2 AS BIGINT) AS shl2,
               l_orderkey >> 3 AS shr3,
               CAST(bit_count(l_orderkey) AS INT) AS popcount
        FROM lineitem
        WHERE l_orderkey % 100 = 7
    """,
)
def scalar_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise expression battery — the §2.9 scalar family member
    behind every hash/band/bitmap operator in this repo (simhash
    bands, Morton keys, LSH buckets, aHash words): XOR, AND, OR,
    shifts, and population count, all whole-stage-codegen'd, checked
    value-for-value cross-engine on a deterministic key slice."""
    li = load(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 100 == 7)
    ln = F.col("l_linenumber").cast("bigint")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_orderkey").bitwiseXOR(ln).alias("key_xor"),
        F.col("l_orderkey").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.col("l_orderkey").bitwiseOR(F.lit(1)).alias("set_lsb"),
        F.shiftleft("l_orderkey", 2).cast("bigint").alias("shl2"),
        F.shiftright("l_orderkey", 3).alias("shr3"),
        F.bit_count("l_orderkey").cast("int").alias("popcount"),
    )


@query(
    "agg_digit_histogram",
    oracle="""
        SELECT length(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR))
                   AS n_digits,
               COUNT(*) AS n_orders,
               ROUND(MIN(o_totalprice), 2) AS min_v,
               ROUND(MAX(o_totalprice), 2) AS max_v
        FROM orders
        GROUP BY 1
    """,
)
def agg_digit_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-of-magnitude histogram WITHOUT logarithms: bucket by the
    DIGIT COUNT of the integer part — exact integer/string arithmetic
    where ``floor(log10(v))`` would sit one libm ULP from a bucket
    flip at every power of ten. The magnitude profile is the first
    look at any value column (pricing-tier mix, fraud-range scans,
    Benford-style sanity checks); one map-side-combined aggregation."""
    o = load(spark, sf_dir, "orders")
    n_digits = F.length(
        F.floor("o_totalprice").cast("bigint").cast("string")
    )
    return o.groupBy(n_digits.alias("n_digits")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.min("o_totalprice"), 2).alias("min_v"),
        F.round(F.max("o_totalprice"), 2).alias("max_v"),
    )


@query(
    "scalar_map_funcs",
    oracle="""
        SELECT o_orderstatus AS status,
               o_orderpriority AS priority,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY 1, 2
    """,
)
def scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-type round trip through the engine: build a per-status
    MAP<priority, count> with ``map_from_entries`` over collected
    structs, then explode it back to rows with ``explode(map)`` —
    proving the complex-type layer (construction, element access,
    explosion) preserves values exactly. The oracle computes the same
    counts flat; equality certifies the map detour was lossless. The
    collect_list feeding the map is bounded per status by the
    priority inventory (5 entries) — never row-scaled."""
    o = load(spark, sf_dir, "orders")
    per = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    mapped = per.groupBy("o_orderstatus").agg(
        F.map_from_entries(
            F.collect_list(F.struct("o_orderpriority", "n"))
        ).alias("m")
    )
    return mapped.select(
        F.col("o_orderstatus").alias("status"),
        F.explode("m").alias("priority", "n_orders"),
    )
