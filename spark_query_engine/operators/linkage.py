"""Record-linkage operators: scale-correct global ranking and
sorted-neighborhood (merge/purge) candidate generation.

Sorted-neighborhood blocking (Hernandez & Stolfo, SIGMOD 1995) is the
classic entity-resolution alternative to attribute blocking
(``dedup_fuzzy_typenames`` blocks on the head noun; this blocks on
SORT ORDER): sort all records by a key, slide a window of w over the
sorted sequence, and compare only records whose positions differ by at
most w.  Candidate volume is O(n*w) regardless of block-size skew —
the property that makes it the safe default when attribute blocks can
be huge (a "Smith" block) — at the price of missing pairs whose sort
keys diverge early (measured here as blocking recall, not assumed).

Reference parity note: the reference engine (athultr1997/
rust-query-engine, src/logical_plan/mod.rs:12-18) has no join at all;
linkage is beyond-parity capability from the brief's training-data
mandate.

Scale design: the one non-trivial primitive is a GLOBAL rank.  A bare
``row_number() OVER (ORDER BY key)`` is a single-partition scale
killer (every row through one task), so :func:`global_rank` uses the
standard two-pass distributed ranking: range-partition by the key,
rank WITHIN each partition (a partition-parallel window), count rows
per partition (a #partitions-row aggregate), prefix-sum those counts
into offsets — as a running-sum WINDOW over the p-row count relation,
broadcast back (r9: no driver collect, so ranking adds zero jobs
beyond the one checkpoint materialization; the triangular self-join
variant was tried first and vetoed by the plan gate — see
``global_rank``'s docstring). The window band-join that follows is
rank-arithmetic — an equi/range join on integers, never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_query_engine.operators import cut_lineage
from pyspark.sql.window import Window


#: Target rows per range partition for a footer-sized global rank:
#: small relations rank in few tasks (per-task overhead, not data,
#: dominates them), corpus-scale relations fan out data-
#: proportionally — the pack-family ⌈n/target⌉ pattern.
RANK_ROWS_PER_PARTITION = 65536


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
    rows_hint: int | None = None,
) -> DataFrame:
    """Dense 1-based global rank by ``order_cols`` without a
    single-partition window.

    Two-pass distributed ranking: ``repartitionByRange`` places rows
    in globally ordered partitions, ``row_number`` partitioned by
    ``spark_partition_id()`` ranks locally in parallel, and the
    per-partition row counts prefix-sum into offsets that a broadcast
    join adds back. The ranked relation is localCheckpoint-ed first
    so the count branch and the rank branch see the SAME physical
    partitioning (range boundaries are sampled and would otherwise be
    free to differ between evaluations).

    r9 (the r8c job-merge discipline): the offsets stay a RELATION —
    the #partitions-row count aggregate prefix-sums via an
    unpartitioned running-sum window over p rows and broadcast-joins
    back, so the ranking adds ZERO driver jobs beyond the one
    checkpoint materialization; the old per-call ``collect`` paid a
    full job per ranked relation. The window's support is BOUNDED BY
    CLUSTER, not data: p ≤ max(default parallelism, 4·parallelism
    under ``rows_hint``) — every consumer query carries a
    GLOBAL_WINDOW_ALLOWLIST entry citing this bound. (A triangular
    p² self-join was tried first; the plan gate flagged its
    BroadcastNestedLoopJoin, and p² is genuinely unbounded once p is
    data-proportional.) Everything downstream of the checkpoint is
    deterministic, so consumers may reference the result many times
    (band joins read it twice) without re-materializing.

    ``rows_hint`` (parquet-footer row count) is an UPPER BOUND on the
    ranked relation's cardinality, not an exact count — callers that
    rank a filtered subset (stats_psi_drift ranks only the is_ref
    rows; the linkage queries pass 2·|part| for a names union) pass
    the cheap footer number and may overshoot the partition count by
    that fraction; sizing-only, never correctness. It footer-sizes
    the range partition count to ⌈rows/65536⌉ CLAMPED to
    [1, 4·parallelism] —
    a handful of tasks for the catalog-scale relations the linkage
    queries rank (per-task overhead dominates them), full cluster
    fan-out at corpus scale with partitions that grow past 65k rows
    only once the cluster is saturated (a per-partition SORT streams
    and spills; it never holds the partition in memory).

    ``order_cols`` must be a total order (unique key tuples) for the
    rank — and anything downstream that is hash-verified — to be
    deterministic.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    if num_partitions is not None:
        n = num_partitions
    elif rows_hint is not None:
        n = min(max(1, -(-rows_hint // RANK_ROWS_PER_PARTITION)), 4 * par)
    else:
        n = par
    ranged = cut_lineage(
        df.repartitionByRange(n, *[F.col(c) for c in order_cols])
        .withColumn("_pid", F.spark_partition_id())
    )
    counts = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    run = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    off = F.broadcast(
        counts.select(
            F.col("_pid").alias("pid"),
            F.coalesce(F.sum("_cnt").over(run), F.lit(0)).alias("_offset"),
        )
    )
    local = F.row_number().over(
        Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
    )
    return (
        ranged.withColumn("_local", local)
        .join(off, ranged["_pid"] == off["pid"])
        .withColumn(rank_col, (F.col("_offset") + F.col("_local")).cast("long"))
        .drop("_pid", "pid", "_offset", "_local")
    )


def sorted_neighborhood_pairs(
    ranked: DataFrame,
    window: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Candidate pairs from a ranked relation: all (a, b) with
    ``0 < rank_b - rank_a <= window``.

    A raw ``ON b.rank - a.rank BETWEEN 1 AND w`` theta join would plan
    as a nested loop over the DATA plane — a scale killer.  Instead
    the band is bucketized into an EQUI join (the repo's range-join
    discipline): with bucket width = w, any qualifying pair sits in
    the same bucket or adjacent buckets, so the left side fans out to
    its two candidate right-buckets (``explode`` — 2x, a constant)
    and the join key is the integer bucket id; the exact gap predicate
    then filters inside the hash join.  Each (a, b) pair is seen
    exactly once because the two exploded keys are distinct.  Output
    is O(n*w) pairs through a shuffled equi join — the skew-immunity
    that motivates sorted-neighborhood blocking.
    """
    rk = F.col(rank_col)
    bucket = F.floor((rk - F.lit(1)) / F.lit(window)).cast("long")
    a = ranked.withColumn(
        "_jk", F.explode(F.array(bucket, bucket + F.lit(1)))
    ).alias("a")
    b = ranked.withColumn("_jk", bucket).alias("b")
    gap = F.col(f"b.{rank_col}") - F.col(f"a.{rank_col}")
    pairs = a.join(b, F.col("a._jk") == F.col("b._jk")).where(
        (gap > F.lit(0)) & (gap <= F.lit(window))
    )
    keep = [
        F.col(f"a.{c}").alias(f"a_{c}") for c in ranked.columns if c != rank_col
    ] + [
        F.col(f"b.{c}").alias(f"b_{c}") for c in ranked.columns if c != rank_col
    ]
    return pairs.select(*keep, gap.cast("long").alias("rank_gap"))
