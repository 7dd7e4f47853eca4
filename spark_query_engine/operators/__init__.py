"""Beyond-parity operators for large-scale training-data pipelines.

The reference engine (SURVEY.md §2) stops at a five-operator
relational core; a 100 TB data-curation pipeline additionally needs
deduplication, similarity search, text analysis, and multimodal column
handling. Each operator here is a pure DataFrame→DataFrame transform,
built from JVM-side expressions (no row-at-a-time Python), designed so
the expensive steps are equi-joins/aggregations that shuffle on
well-distributed keys — never driver-side loops or O(n²) cross
products, except where explicitly documented as small-N baselines.
"""

from pyspark.sql import DataFrame


def widen(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Ensure at least defaultParallelism partitions before expensive
    per-row work (shingling, hashing, UDF batches).

    Small local inputs arrive as a single parquet split, which would
    serialize CPU-heavy expressions onto one core; a real cluster scan
    has splits ≫ cores, making this a no-op there — it only guards the
    under-partitioned case, never collapses a well-partitioned scan.

    The guard reads ``df.inputFiles()`` (leaf-scan metadata, no job,
    no RDD lineage — ``df.rdd.getNumPartitions()`` would force a full
    physical re-plan per call) as the split-count proxy: file count
    under-approximates splits only for multi-split large files, and a
    table that large does not need widening in the first place.
    """
    target = df.sparkSession.sparkContext.defaultParallelism * min_factor
    try:
        n_splits = len(df.inputFiles())
    except Exception:
        n_splits = 0
    if n_splits < target:
        return df.repartition(target)
    return df


from spark_query_engine.operators import (  # noqa: E402
    clustering,
    dedup,
    graph,
    maintenance,
    multimodal,
    similarity,
    skew,
    textanalysis,
    timeseries,
)

__all__ = [
    "clustering",
    "dedup",
    "graph",
    "maintenance",
    "multimodal",
    "similarity",
    "skew",
    "textanalysis",
    "timeseries",
    "widen",
]
