"""Extended SQL surface: TPC-H classics, grouping sets, range frames,
lateral explode, array/null scalar functions, subqueries, ntile.

These widen SURVEY.md §2's ABSENT rows (§2.5 grouping sets, §2.6 frame
specs, §2.9 array functions, plus the SQL-parser capabilities the
reference never grew — the closed plan enum at
src/logical_plan/mod.rs:12-18 admits none of these). Everything is
built-in Catalyst surface; no UDFs.

Scale notes:
- tpch_q1/q6 are single-pass scan+partial-agg queries — the shape that
  saturates I/O at 100 TB; filters and the 7-column projection push to
  the parquet scan.
- grouping sets / rollup / cube expand in the aggregate Exec, not by
  re-scanning the input.
- ntile/global-order queries are documented small-output patterns: the
  global sort happens on k-proportional data only where possible
  (ntile over orders is a true global sort — use approx percentiles at
  100 TB; kept here because the reference-class API needs exact ntile).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_query_engine.operators import similarity as S
from spark_query_engine.operators import widen
from spark_query_engine.queries import footer_rows, load, query


@query(
    "tpch_q1",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                   AS sum_charge,
               ROUND(AVG(l_quantity), 4) AS avg_qty,
               ROUND(AVG(l_extendedprice), 4) AS avg_price,
               ROUND(AVG(l_discount), 4) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: the canonical scan-heavy partial-agg
    query. One parquet scan (7 columns pruned), map-side partial
    aggregation into 4 groups, trivial shuffle."""
    l = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "tpch_q6",
    oracle="""
        SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecast revenue: pure filter + global sum. All four
    predicates push to the parquet scan; the aggregate is a single
    partial/final pair with a 1-row shuffle."""
    l = load(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


@query(
    "agg_grouping_sets",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                (o_orderstatus, o_orderpriority))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form of rollup/cube —
    SURVEY.md §2.5 ABSENT row). Expands inside the aggregate; the
    input is scanned once."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                (o_orderstatus, o_orderpriority))
        """
    )


@query(
    "window_range_frame",
    oracle="""
        SELECT c_custkey, c_nationkey, c_acctbal,
               COUNT(*) OVER w AS n_within_100,
               ROUND(SUM(c_acctbal) OVER w, 2) AS bal_within_100
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal
                     RANGE BETWEEN 100.0 PRECEDING AND CURRENT ROW)
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE (value-based) window frame — SURVEY.md §2.6 ABSENT row.
    Frame membership is by value distance, so ties are handled
    identically in any engine (no row-order dependence). Partitioned
    by nation → parallel window groups, no global sort. (SQL form:
    PySpark's Window.rangeBetween only accepts integer offsets, but
    c_acctbal is DOUBLE — the SQL frame spec takes any numeric
    literal.)"""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_rf")
    return spark.sql(
        """
        SELECT c_custkey, c_nationkey, c_acctbal,
               COUNT(*) OVER w AS n_within_100,
               ROUND(SUM(c_acctbal) OVER w, 2) AS bal_within_100
        FROM customer_rf
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal
                     RANGE BETWEEN 100.0 PRECEDING AND CURRENT ROW)
        """
    )


@query(
    "window_ntile_cume",
    oracle="""
        SELECT quartile, COUNT(*) AS n,
               ROUND(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                     / 100.0, 2) AS total,
               ROUND(MAX(cd), 6) AS max_cume_dist
        FROM (
            SELECT o_totalprice,
                   NTILE(4) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS quartile,
                   CUME_DIST() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS cd
            FROM orders
        )
        GROUP BY quartile
    """,
)
def window_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE + CUME_DIST ranking, as a DISTRIBUTED two-pass rank
    (round-8 re-plan — the r7 verdict's task 4; the registered plan
    was a single-partition global sort, the classic row-scale
    WindowExec scale-killer).

    Plan: (1) ``repartitionByRange`` on the sort key — the standard
    distributed sort shuffle; partition i holds strictly-lower keys
    than partition i+1, so partition ids order globally. (2) LOCAL
    rank: ``row_number`` over a window PARTITIONED by
    ``spark_partition_id()`` — each sort partition ranks
    independently, n/P rows per task. (3) global rank = local rank +
    the preceding partitions' row counts: a P-row aggregate, a P-row
    running-sum window (bounded support — P = parallelism, never
    row-scale), one broadcast join back. (4) NTILE/CUME_DIST derive
    from the global rank in closed form — the ordering includes the
    unique ``o_orderkey``, so every rank is distinct: cume_dist =
    rank/N exactly, and ntile(4)'s first (N mod 4) buckets take
    ⌈N/4⌉ rows (the SQL-standard sizing both engines implement). N
    comes from the parquet footer — no count job.

    Float discipline: the per-quartile revenue total follows the
    exact-integer-moment rule (2dp prices quantize ×100 to BIGINT and
    SUM exactly in decimal(38,0)) — the re-plan changes partition
    order, and a float SUM's rounding boundary must not depend on it;
    the oracle quantizes identically."""
    n_rows = footer_rows(spark, sf_dir, "orders")
    par = spark.sparkContext.defaultParallelism
    q4, r4 = divmod(n_rows, 4)
    o = load(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    ranked = (
        o.repartitionByRange(
            par, F.col("o_totalprice").desc(), F.col("o_orderkey")
        )
        .withColumn("pid", F.spark_partition_id())
        .withColumn(
            "lrank",
            F.row_number().over(
                Window.partitionBy("pid").orderBy(
                    F.col("o_totalprice").desc(), F.col("o_orderkey")
                )
            ),
        )
    )
    # P-row relation: per-partition counts -> exclusive running sum.
    # The unpartitioned window here is over ≤ parallelism rows —
    # bounded support, the allowlisted shape, never row-scale.
    offsets = (
        ranked.groupBy("pid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "pid",
            F.coalesce(
                F.sum("cnt").over(
                    Window.orderBy("pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).alias("off"),
        )
    )
    rank = (F.col("off") + F.col("lrank")).alias("rank")
    g = ranked.join(F.broadcast(offsets), "pid").select(
        "o_totalprice", rank
    )
    head = r4 * (q4 + 1)  # rows in the ⌈N/4⌉-sized leading buckets
    quartile = (
        F.when(
            F.col("rank") <= head,
            F.floor((F.col("rank") - 1) / (q4 + 1)) + 1,
        )
        .otherwise(
            r4 + F.floor((F.col("rank") - 1 - head) / max(q4, 1)) + 1
        )
        .cast("int")
    )
    cd = F.col("rank").cast("double") / F.lit(float(n_rows))
    return (
        g.select(
            "o_totalprice", quartile.alias("quartile"), cd.alias("cd")
        )
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(
                    F.round(F.col("o_totalprice") * 100, 0)
                    .cast("decimal(38,0)")
                ).cast("double")
                / 100.0,
                2,
            ).alias("total"),
            F.round(F.max("cd"), 6).alias("max_cume_dist"),
        )
    )


@query(
    "explode_tokens",
    oracle="""
        SELECT tok, COUNT(*) AS n
        FROM (SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents)
        WHERE tok <> ''
        GROUP BY tok
        ORDER BY n DESC, tok
        LIMIT 100
    """,
)
def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral explode (UNNEST) of tokenized text → global token
    frequencies. The generate+agg pattern behind every vocabulary /
    BPE-corpus-statistics job; partial aggregation collapses the token
    stream before the shuffle."""
    d = load(spark, sf_dir, "documents")
    return (
        widen(d).select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "tok")
        .limit(100)
    )


@query(
    "scalar_array_funcs",
    oracle="""
        SELECT vec_id,
               len(embedding) AS dim,
               ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
               ROUND(list_aggregate(CAST(embedding AS DOUBLE[]), 'max'), 6) AS max_val,
               ROUND(sqrt(list_aggregate(
                   list_transform(CAST(embedding AS DOUBLE[]), x -> x * x),
                   'sum')), 6) AS l2_norm,
               len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0)) AS n_pos
        FROM embeddings
    """,
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions (SURVEY.md §2.9 ABSENT row):
    size / element_at / array_max / fold (F.aggregate) / filter — all
    JVM codegen'd, the building blocks of the vector operators."""
    e = load(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at(v, 1), 6).alias("first_val"),
        F.round(F.array_max(v), 6).alias("max_val"),
        F.round(
            F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)), 6
        ).alias("l2_norm"),
        F.size(F.filter(v, lambda x: x > 0)).alias("n_pos"),
    )


@query(
    "scalar_null_funcs",
    oracle="""
        SELECT COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status,
               COUNT(NULLIF(o_orderstatus, 'O')) AS n_nonnull,
               COUNT(*) AS n
        FROM orders
        GROUP BY COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN')
    """,
)
def scalar_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling scalars: NULLIF / COALESCE and the COUNT(col)
    null-skipping contract (ANSI semantics — the deliberate divergence
    from the reference's Null==Null quirk, SURVEY.md §1.2)."""
    o = load(spark, sf_dir, "orders")
    status = F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN"))
    return o.groupBy(status.alias("status")).agg(
        F.count(F.nullif(F.col("o_orderstatus"), F.lit("O"))).alias("n_nonnull"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "subquery_exists",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
    """,
)
def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS subquery — Catalyst decorrelates it to a left
    semi join (RewriteCorrelatedScalarSubquery / RewritePredicate
    Subquery), so no per-row re-execution ever happens."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_sq")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_sq")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer_sq c
        WHERE EXISTS (SELECT 1 FROM orders_sq o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
        """
    )


@query(
    "subquery_scalar",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders)
    """,
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: the inner AVG computes once and
    broadcasts as a literal into the outer filter."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_ssq")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders_ssq
        WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders_ssq)
        """
    )


@query(
    "ann_ivf_topk",
    oracle="""
        WITH v AS (
            SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
        ),
        cents AS (SELECT id AS centroid, vec AS cvec FROM v WHERE id < 8),
        scored AS (
            SELECT v.id, v.vec, c.centroid,
                   ROUND(list_cosine_similarity(v.vec, c.cvec), 6) AS cent_sim
            FROM v CROSS JOIN cents c
        ),
        assigned AS (
            SELECT id, vec, centroid FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY id ORDER BY cent_sim DESC, centroid) AS rn
                FROM scored
            ) WHERE rn = 1
        ),
        q AS (SELECT centroid AS qcent, vec AS qvec FROM assigned WHERE id = 42)
        SELECT a.id, a.centroid,
               ROUND(list_cosine_similarity(a.vec, q.qvec), 6) AS cos_sim
        FROM assigned a CROSS JOIN q
        WHERE a.centroid = q.qcent AND a.id <> 42
        ORDER BY cos_sim DESC, a.id
        LIMIT 5
    """,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: coarse-quantize every vector to its nearest
    centroid (broadcast codebook, one scan), then probe only the query
    vector's inverted list. The scale path alongside ann_lsh_topk —
    probe cost ~1/n_centroids of the corpus, recall tunable by
    multi-probe."""
    emb = load(spark, sf_dir, "embeddings")
    return S.ivf_topk(emb, "vec_id", "embedding", query_id=42, n_centroids=8, k=5)


@query(
    "join_full_outer",
    oracle="""
        SELECT n.n_name, s.s_suppkey, s.s_name
        FROM (SELECT * FROM nation WHERE n_regionkey <= 1) n
        FULL OUTER JOIN (SELECT * FROM supplier WHERE s_acctbal > 3000.0) s
          ON n.n_nationkey = s.s_nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join — completes the join-type matrix (inner / left /
    semi / anti / asof / range live in relational.py & advanced.py).
    Full outer forbids broadcast; Spark plans a sort-merge join on the
    shuffled key, which is the right 100 TB plan anyway."""
    n = load(spark, sf_dir, "nation").where(F.col("n_regionkey") <= 1)
    s = load(spark, sf_dir, "supplier").where(F.col("s_acctbal") > 3000.0)
    return n.join(s, n.n_nationkey == s.s_nationkey, "full_outer").select(
        "n_name", "s_suppkey", "s_name"
    )


@query(
    "join_cross_count",
    oracle="""
        SELECT r.r_name, COUNT(*) AS n_pairs
        FROM region r CROSS JOIN nation n
        GROUP BY r.r_name
    """,
)
def join_cross_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit CROSS join (tiny dims only — a documented anti-pattern
    on fact tables; Catalyst plans BroadcastNestedLoopJoin here)."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return r.crossJoin(n).groupBy("r_name").agg(F.count(F.lit(1)).alias("n_pairs"))


@query(
    "agg_stats",
    oracle="""
        SELECT l_returnflag,
               ROUND(STDDEV_SAMP(l_quantity), 4) AS sd_qty,
               ROUND(VAR_SAMP(l_discount), 6) AS var_disc,
               ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 2) AS cov_qty_price,
               ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
               ROUND(SKEWNESS(l_quantity), 4) AS skew_qty
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (stddev/variance/covariance/correlation/
    skewness) — single-pass moment accumulators, partial+final split
    like any hash aggregate."""
    l = load(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "cov_qty_price"
        ),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.skewness("l_quantity"), 4).alias("skew_qty"),
    )


@query(
    "window_first_last",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice,
               FIRST_VALUE(o_totalprice) OVER w AS first_price,
               LAST_VALUE(o_totalprice) OVER
                   (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS last_price,
               NTH_VALUE(o_totalprice, 2) OVER w AS second_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE / LAST_VALUE / NTH_VALUE navigation functions
    (deterministic: ORDER BY includes the unique o_orderkey;
    last_price uses an unbounded frame — the default growing frame
    would make it equal the current row)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w_full).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


@query(
    "set_union_all",
    oracle="""
        SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
        UNION ALL
        SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL — bag union, no dedup shuffle (vs set_union's
    DISTINCT): a pure concatenation of partitions."""
    a = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "MACHINERY")
        .select(F.col("c_custkey").alias("custkey"))
    )
    b = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("custkey"))
    )
    return a.unionAll(b)


@query(
    "tpch_q5",
    oracle="""
        SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 local-supplier volume: the 6-table join. Fact-fact
    joins (customer⋈orders⋈lineitem⋈supplier) shuffle on their keys
    with AQE replanning; nation/region broadcast. The orderdate range
    pushes into the orders scan."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "scalar_regexp_funcs",
    oracle="""
        SELECT doc_id,
               regexp_extract(text, '([A-Za-z]+)', 1) AS first_word,
               len(regexp_extract_all(text, '[0-9]+')) AS n_numbers,
               length(regexp_replace(text, '[aeiou]', '', 'g')) AS len_no_vowels,
               CASE WHEN regexp_matches(text, '^[A-Z]') THEN 1 ELSE 0 END
                   AS starts_upper
        FROM documents
    """,
)
def scalar_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp scalar functions (extract / extract-all / replace /
    match) — JVM-side regex over the corpus, the workhorse of text
    cleaning at scale."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"([A-Za-z]+)", 1).alias("first_word"),
        F.size(F.regexp_extract_all("text", F.lit(r"[0-9]+"))).cast("bigint").alias(
            "n_numbers"
        ),
        F.length(F.regexp_replace("text", r"[aeiou]", "")).alias("len_no_vowels"),
        F.when(F.col("text").rlike(r"^[A-Z]"), 1).otherwise(0).alias("starts_upper"),
    )


@query(
    "tpch_q14",
    oracle="""
        SELECT ROUND(100.00 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                         THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                     / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-03-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
    """,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 promotion effect: fact⋈dim with a conditional
    aggregate ratio. part broadcasts under the 64 MB threshold at
    bench scale; the one-month shipdate range prunes the lineitem
    scan."""
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type").like("PROMO%"), rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue")
        )
    )


@query(
    "tpch_q18",
    oracle="""
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               ROUND(SUM(l_quantity), 2) AS total_qty
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING SUM(l_quantity) > 180
        )
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume customers: IN-subquery over a grouped
    HAVING (Catalyst plans it as a semi join on the aggregated key) +
    a 3-table join + top-100."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 180)
        .select("l_orderkey")
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(big.withColumnRenamed("l_orderkey", "big_key"),
              F.col("o_orderkey") == F.col("big_key"), "left_semi")
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@query(
    "events_retention",
    oracle="""
        WITH e AS (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
                   FROM events GROUP BY 1, 2),
        pairs AS (
            SELECT a.d AS day, COUNT(*) AS retained
            FROM e a JOIN e b ON a.user_id = b.user_id AND b.d = a.d + 1
            GROUP BY a.d
        ),
        actives AS (SELECT d AS day, COUNT(*) AS active FROM e GROUP BY d)
        SELECT actives.day, active, COALESCE(retained, 0) AS retained,
               ROUND(COALESCE(retained, 0) * 1.0 / active, 6) AS retention_rate
        FROM actives LEFT JOIN pairs ON actives.day = pairs.day
    """,
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-day retention over the events stream: distinct (user, day)
    → self-join on day+1 → rate per day. The canonical product-
    analytics query; both sides of the self-join are the same deduped
    relation, shuffled once on user_id."""
    ev = load(spark, sf_dir, "events")
    e = ev.select("user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")).distinct()
    a, b = e.alias("a"), e.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.d") == F.date_add(F.col("a.d"), 1)),
        )
        .groupBy(F.col("a.d").alias("day"))
        .agg(F.count(F.lit(1)).alias("retained"))
    )
    actives = e.groupBy(F.col("d").alias("day")).agg(
        F.count(F.lit(1)).alias("active")
    )
    return actives.join(pairs, "day", "left").select(
        "day",
        "active",
        F.coalesce("retained", F.lit(0)).alias("retained"),
        F.round(F.coalesce("retained", F.lit(0)) / F.col("active"), 6).alias(
            "retention_rate"
        ),
    )


@query(
    "agg_array_collect",
    oracle="""
        SELECT n_nationkey,
               array_to_string(list_sort(list(s_suppkey)), ',') AS suppliers,
               len(list(s_suppkey)) AS n_suppliers
        FROM nation JOIN supplier ON s_nationkey = n_nationkey
        GROUP BY n_nationkey
    """,
)
def agg_array_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARRAY_AGG / collect_list with a deterministic sort inside the
    array (collect order is partition-dependent — sorting makes the
    result engine-stable; same contract as DuckDB's list_sort). The
    sorted array is serialized to a CSV string for the driver compare:
    the driver's pandas canonicalizer cannot hash array-typed cells
    (the r2 corpus_multimodal_features lesson), and a canonical string
    certifies the same element set + order."""
    n = load(spark, sf_dir, "nation")
    s = load(spark, sf_dir, "supplier")
    return (
        n.join(s, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_nationkey")
        .agg(
            F.array_join(F.sort_array(F.collect_list("s_suppkey")), ",").alias(
                "suppliers"
            ),
            F.count(F.lit(1)).alias("n_suppliers"),
        )
    )


@query(
    "set_intersect_all",
    oracle="""
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        INTERSECT ALL
        SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 50000.0
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag intersection (multiplicity = min of the two
    sides), completing §2.8 with the ALL variants."""
    o = load(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    b = o.where(F.col("o_totalprice") > 50000.0).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.intersectAll(b)


@query(
    "set_except_all",
    oracle="""
        SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 100000.0
        EXCEPT ALL
        SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference (per-row multiplicity subtraction)."""
    o = load(spark, sf_dir, "orders")
    a = o.where(F.col("o_totalprice") > 100000.0).select(
        F.col("o_custkey").alias("custkey")
    )
    b = o.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.exceptAll(b)


@query(
    "sample_deterministic",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem
        WHERE ('0x' || substr(md5(l_orderkey::VARCHAR || ':' ||
                              l_linenumber::VARCHAR), 1, 8))::BIGINT % 20 = 0
    """,
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~5% hash sample: md5 of the row key mod 20.
    Unlike TABLESAMPLE/rand() this is reproducible across engines,
    runs, and partitionings — the only defensible way to sample a
    shared corpus (and the basis of stable train/eval splits)."""
    l = load(spark, sf_dir, "lineitem")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return l.where(h % 20 == 0).select("l_orderkey", "l_linenumber", "l_quantity")


@query(
    "agg_histogram",
    oracle="""
        SELECT LEAST(FLOOR(o_totalprice / 50000.0), 9)::BIGINT AS bucket,
               COUNT(*) AS n,
               ROUND(MIN(o_totalprice), 2) AS lo,
               ROUND(MAX(o_totalprice), 2) AS hi
        FROM orders
        GROUP BY 1
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via floor-bucket arithmetic (portable —
    no width_bucket dependency): one scan, one small-key aggregation.
    The first look at any 100 TB numeric column."""
    o = load(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / 50000.0), F.lit(9)).cast(
        "bigint"
    )
    return o.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
    )


@query(
    "agg_argmax",
    oracle="""
        SELECT o_custkey,
               arg_max(o_orderstatus, o_orderkey) AS latest_status,
               arg_max(o_totalprice, o_orderkey) AS latest_price,
               arg_min(o_orderdate, o_orderkey) AS first_date
        FROM orders
        GROUP BY o_custkey
    """,
)
def agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAX_BY / MIN_BY (argmax aggregation) — 'the value of X at the
    row where Y is extreme'. Deterministic because the ordering key
    (o_orderkey) is unique; one hash aggregation, no window needed —
    the cheap way to get latest-per-key at 100 TB (vs a row_number
    window, which must sort every group)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderstatus", "o_orderkey").alias("latest_status"),
        F.max_by("o_totalprice", "o_orderkey").alias("latest_price"),
        F.min_by("o_orderdate", "o_orderkey").alias("first_date"),
    )


@query(
    "reshape_unpivot",
    oracle="""
        SELECT o_orderkey, kind, val FROM (
            SELECT o_orderkey, o_totalprice AS price,
                   o_custkey::DOUBLE AS cust
            FROM orders WHERE o_orderkey < 1000
        ) UNPIVOT (val FOR kind IN (price, cust))
    """,
)
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt (wide → long reshape, the inverse of agg_pivot).
    A per-row expansion — no shuffle; columns become (kind, val)
    pairs."""
    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") < 1000)
        .select(
            "o_orderkey",
            F.col("o_totalprice").alias("price"),
            F.col("o_custkey").cast("double").alias("cust"),
        )
    )
    return o.unpivot("o_orderkey", ["price", "cust"], "kind", "val")


@query(
    "window_moving_avg",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROUND(AVG(o_totalprice) OVER
                   (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS ma7
        FROM orders
    """,
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded ROWS frame (7-row moving average) — constant per-row
    state regardless of partition size, unlike the growing unbounded
    frame in window_running_sum. Deterministic via the unique
    o_orderkey in the ORDER BY."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-6, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.round(F.avg("o_totalprice").over(w), 4).alias("ma7"),
    )


@query(
    "agg_filter_clause",
    oracle="""
        SELECT o_orderstatus,
               COUNT(*) AS n_all,
               COUNT(*) FILTER (WHERE o_totalprice > 200000.0) AS n_big,
               ROUND(SUM(o_totalprice) FILTER (WHERE o_orderpriority = '1-URGENT'),
                     2) AS urgent_total
        FROM orders
        GROUP BY o_orderstatus
    """,
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI FILTER clause on aggregates — per-aggregate predicates in
    one pass over the input (vs scanning once per conditional sum)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_fc")
    return spark.sql(
        """
        SELECT o_orderstatus,
               COUNT(*) AS n_all,
               COUNT(*) FILTER (WHERE o_totalprice > 200000.0) AS n_big,
               ROUND(SUM(o_totalprice) FILTER (WHERE o_orderpriority = '1-URGENT'),
                     2) AS urgent_total
        FROM orders_fc
        GROUP BY o_orderstatus
        """
    )


@query(
    "join_null_safe_eq",
    oracle="""
        WITH a AS (
            SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL
                        ELSE o_orderpriority END AS pr,
                   COUNT(*) AS na
            FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1
        ),
        b AS (
            SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL
                        ELSE o_orderpriority END AS pr,
                   COUNT(*) AS nb
            FROM orders WHERE o_orderkey % 2 = 1 GROUP BY 1
        )
        SELECT a.pr, a.na, b.nb,
               a.na * b.nb AS n_pairs
        FROM a JOIN b ON a.pr IS NOT DISTINCT FROM b.pr
    """,
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM): NULL
    keys MATCH each other instead of silently dropping — the
    semantics CDC and dimension pipelines need when NULL is a real
    attribute state (unknown priority), not an absence. A plain
    equality join here would lose the NULL group entirely; the
    null-safe operator keeps it AND still plans as a hash equi-join
    (NULL hashes to a regular bucket — no fallback to nested loop),
    which is why engines expose it as an operator instead of
    ``(a = b OR (a IS NULL AND b IS NULL))``, which is not
    hash-joinable.

    Scale note: both sides AGGREGATE before joining — the pair count
    per key is na·nb by arithmetic, never by materializing the
    row-level join (a 6-value key over row-level sides is a skew
    bomb: ~10⁹ joined rows at sf0.1, observed at 66 s before this
    aggregate-then-join rewrite cut it to milliseconds — the classic
    pre-aggregation lesson, caught by the repo's own bench)."""
    o = load(spark, sf_dir, "orders")
    pr = F.when(F.col("o_orderkey") % 7 == 0, F.lit(None)).otherwise(
        F.col("o_orderpriority")
    )
    a = (
        o.where(F.col("o_orderkey") % 2 == 0)
        .groupBy(pr.alias("pr"))
        .agg(F.count(F.lit(1)).alias("na"))
    )
    b = (
        o.where(F.col("o_orderkey") % 2 == 1)
        .groupBy(pr.alias("pr_b"))
        .agg(F.count(F.lit(1)).alias("nb"))
    )
    return a.join(b, F.col("pr").eqNullSafe(F.col("pr_b"))).select(
        "pr", "na", "nb", (F.col("na") * F.col("nb")).alias("n_pairs")
    )


@query(
    "scalar_try_arith",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CASE WHEN l_tax = 0 THEN NULL
                    ELSE ROUND(l_extendedprice / l_tax, 4) END AS safe_div,
               TRY_CAST(l_returnflag AS INTEGER) AS flag_as_int,
               TRY_CAST(CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) AS INTEGER) AS qty_int,
               CASE WHEN l_quantity = 0 THEN NULL
                    ELSE CAST(l_orderkey // CAST(l_quantity AS BIGINT)
                         AS BIGINT) END AS int_div
        FROM lineitem WHERE l_orderkey % 50 = 11
    """,
)
def scalar_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI error-safety battery: ``try_divide`` / ``try_cast`` turn
    would-be runtime errors (division by zero, unparseable casts)
    into NULLs — the difference between a 100 TB job dying at hour
    9 on one malformed row and a NULL you can audit afterwards.
    Under ANSI mode these are the ONLY sane defaults for derived
    columns on untrusted data; the oracle mirrors each with its
    explicit guarded form (DuckDB divides-by-zero to inf rather
    than erroring, so the CASE guard IS the portable semantics)."""
    li = load(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 50 == 11)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.try_divide(F.col("l_extendedprice"), F.col("l_tax")), 4
        ).alias("safe_div"),
        F.try_to_number(F.col("l_returnflag"), F.lit("9")).cast("int").alias(
            "flag_as_int"
        ),
        F.col("l_quantity").cast("bigint").cast("string").try_cast("int").alias("qty_int"),
        F.try_divide(
            F.col("l_orderkey"), F.col("l_quantity").cast("bigint")
        )
        .cast("bigint")
        .alias("int_div"),
    )


@query(
    "window_gaps_islands",
    oracle="""
        WITH keyed AS (
            SELECT o_orderpriority AS pr, o_orderkey AS k,
                   o_orderkey - ROW_NUMBER() OVER (
                       PARTITION BY o_orderpriority ORDER BY o_orderkey
                   ) AS grp
            FROM orders
        ),
        islands AS (
            SELECT pr, grp, MIN(k) AS island_start, MAX(k) AS island_end,
                   COUNT(*) AS island_len
            FROM keyed GROUP BY pr, grp
        )
        SELECT pr,
               COUNT(*) AS n_islands,
               CAST(MAX(island_len) AS BIGINT) AS longest_island,
               CAST(SUM(CASE WHEN island_len = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_singletons
        FROM islands GROUP BY pr
    """,
)
def window_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of CONSECUTIVE order keys within
    each priority class — the canonical key−ROW_NUMBER grouping trick
    (consecutive keys share the difference between their value and
    their rank). The production shape behind sequence-gap audits
    (missing invoice numbers, broken offset ranges, hole detection in
    ingestion watermarking).

    One shuffle on the partition key; the rank, the island rollup,
    and the per-class census all reuse that partitioning. Rank runs
    per priority class (5-way split of the table), never globally."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
    keyed = o.select(
        F.col("o_orderpriority").alias("pr"),
        F.col("o_orderkey").alias("k"),
        (F.col("o_orderkey") - F.row_number().over(w)).alias("grp"),
    )
    islands = keyed.groupBy("pr", "grp").agg(
        F.count(F.lit(1)).alias("island_len")
    )
    return islands.groupBy("pr").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.max("island_len").cast("bigint").alias("longest_island"),
        F.sum(F.when(F.col("island_len") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_singletons"),
    )


@query(
    "sql_text_q6",
    oracle="""
        SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
               COUNT(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1994-01-01'
          AND l_shipdate < TIMESTAMP '1995-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
)
def sql_text_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-TEXT surface end-to-end through the driver gate: the
    TPC-H Q6 predicate battery submitted as a literal SQL string over
    a registered temp view — proving the engine's second API (the
    reference's planned-but-unbuilt SQL frontend, SURVEY.md §2.12) is
    the same Catalyst plan as the DataFrame build: identical pushdown
    (three range predicates reach the parquet scan), identical
    codegen, identical result hash. ``spark.sql`` and the DataFrame
    API are one engine — this row certifies it."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("li_sql")
    return spark.sql(
        """
        SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
               COUNT(*) AS n_rows
        FROM li_sql
        WHERE l_shipdate >= TIMESTAMP '1994-01-01'
          AND l_shipdate < TIMESTAMP '1995-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
        """
    )


@query(
    "window_topk_with_ties",
    oracle="""
        WITH ranked AS (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   RANK() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC) AS rk,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC,
                                               o_orderkey) AS rn
            FROM orders WHERE o_custkey % 50 = 3
        )
        SELECT o_custkey, o_orderkey,
               ROUND(o_totalprice, 2) AS price,
               CAST(rk AS BIGINT) AS rk,
               rn <= 3 AS in_strict_top3
        FROM ranked WHERE rk <= 3
    """,
)
def window_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3-WITH-TIES per customer — RANK's cut keeps every row tied
    at the boundary value where ROW_NUMBER would arbitrarily drop
    some (the correctness difference between 'top 3 order values'
    and 'some 3 orders'; SQL:2008 spells it FETCH FIRST n ROWS WITH
    TIES). Emitting both rank flavors side by side makes the
    boundary rows visible: in_strict_top3=false marks exactly the
    rows a ties-blind cut would have lost. Same WindowGroupLimit
    plan family — rank<=k prunes per group before any full sort."""
    o = load(spark, sf_dir, "orders").where(F.col("o_custkey") % 50 == 3)
    w_rank = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc()
    )
    w_rn = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price"),
            F.rank().over(w_rank).alias("rk"),
            F.row_number().over(w_rn).alias("rn"),
        )
        .where(F.col("rk") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            "price",
            F.col("rk").cast("bigint").alias("rk"),
            (F.col("rn") <= 3).alias("in_strict_top3"),
        )
    )


@query(
    "join_lateral_topk",
    oracle="""
        SELECT c.c_custkey, c.c_mktsegment,
               t.o_orderkey, t.o_totalprice, t.rn
        FROM customer c,
        LATERAL (
            SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice,
                   ROW_NUMBER() OVER (
                       ORDER BY o_totalprice DESC, o_orderkey
                   ) AS rn
            FROM orders
            WHERE o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 3
        ) t
        WHERE c.c_mktsegment = 'MACHINERY'
    """,
)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORRELATED LATERAL join — the §2.4 surface beyond equi/theta
    joins: for each MACHINERY customer, the lateral subquery returns
    that customer's top-3 orders by price. Catalyst DECORRELATES the
    lateral into a windowed top-k per key (DecorrelateInnerQuery →
    the same WindowGroupLimit plan ``window_topk_per_group`` gets) —
    the textbook per-row loop becomes one hash-partitioned window, no
    nested execution anywhere. The row set is hash-identical to
    DuckDB's native LATERAL evaluation, certifying the decorrelation
    is semantics-preserving, not just plan-pretty.

    At 100 TB this is THE pattern for "top-k related rows per entity"
    served from SQL: one shuffle on the correlation key, per-group
    state bounded by k."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("cust_lat")
    load(spark, sf_dir, "orders").createOrReplaceTempView("ord_lat")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment,
               t.o_orderkey, t.o_totalprice, t.rn
        FROM cust_lat c
        JOIN LATERAL (
            SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice,
                   ROW_NUMBER() OVER (
                       ORDER BY o_totalprice DESC, o_orderkey
                   ) AS rn
            FROM ord_lat
            WHERE o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 3
        ) t
        WHERE c.c_mktsegment = 'MACHINERY'
        """
    )
