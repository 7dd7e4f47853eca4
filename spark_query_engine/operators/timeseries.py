"""Time-series operators: bucketing, dense-grid generation, and
last-observation-carried-forward gap filling.

The hypertable `time_bucket_gapfill` + `locf` shape (reference has no
time-series surface; this is beyond-parity), built entirely from
declarative ops: aggregation, per-series `sequence`/`explode` grid,
left join, ignore-nulls window. No driver-side range loop — the grid
is O(series x span/bucket) rows generated executor-side, so it stays
tiny relative to the raw events at any corpus size, and the LOCF
window parallelizes across series keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def gap_fill_locf(
    df: DataFrame,
    series_col: str,
    ts_col: str,
    value_col: str,
    bucket: str = "1 hour",
    value_decimals: int = 2,
) -> DataFrame:
    """Bucket ``ts_col`` per series, then fill missing buckets between
    each series' first and last observation, carrying the last
    observed (rounded) bucket total forward.

    Returns (series_col, bucket, observed, value_filled). The carried
    value is ROUND(SUM(value), value_decimals) — a sum, not an
    average, because AVG's division lands on .5-ULP decimal
    boundaries where engines round differently, while sums of the
    same doubles agree bit-for-bit (the repo-wide float discipline).

    Scale: one map-side-combined aggregation over the facts, a grid
    whose size depends only on span/bucket (never on event count), a
    broadcastable left join (grid is the small side per series), and
    one LOCF window partitioned by series — series cardinality is the
    parallelism axis.
    """
    count_s, _, unit_s = bucket.strip().partition(" ")
    count, unit = int(count_s), unit_s.strip().rstrip("s")
    if count == 1:
        # calendar truncation — also handles variable-width units
        bucket_expr = F.date_trunc(unit, ts_col)
    else:
        # true width-bucketing: date_trunc('minute') under a
        # "15 minutes" bucket would truncate to the bare unit while
        # the grid steps by the full interval — buckets that never
        # join. Fixed-width units floor on epoch seconds instead.
        widths = {
            "second": 1,
            "minute": 60,
            "hour": 3600,
            "day": 86400,
            "week": 604800,
        }
        if unit not in widths:
            raise ValueError(
                f"multi-count bucket {bucket!r} needs a fixed-width unit "
                f"({sorted(widths)}); calendar units support count=1 only"
            )
        width = count * widths[unit]
        bucket_expr = F.timestamp_seconds(
            F.floor(F.unix_timestamp(F.col(ts_col)) / width) * width
        ).cast(df.schema[ts_col].dataType)
    agg = df.groupBy(
        bucket_expr.alias("bucket"),
        F.col(series_col),
    ).agg(F.round(F.sum(value_col), value_decimals).alias("bucket_value"))
    span = agg.groupBy(series_col).agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    grid = span.select(
        series_col,
        F.explode(
            F.sequence("lo", "hi", F.expr(f"INTERVAL {bucket.upper()}"))
        ).alias("bucket"),
    )
    filled = grid.join(agg, [series_col, "bucket"], "left")
    w = (
        W.partitionBy(series_col)
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return filled.select(
        series_col,
        "bucket",
        F.col("bucket_value").isNotNull().alias("observed"),
        F.last("bucket_value", ignorenulls=True).over(w).alias("value_filled"),
    )
