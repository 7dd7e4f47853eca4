"""Query registry — the driver-facing catalog of implemented operators.

Every operator from SURVEY.md §2 (and every beyond-parity operator)
registers here as a named query: a callable ``(spark, sf_dir) ->
DataFrame`` plus, where SQL-expressible, a DuckDB oracle string over
the same parquet tables. ``__spark_entry__.py`` re-exports this
registry to the driver.

Float discipline: aggregate/derived float columns are ROUNDed in BOTH
the Spark query and the oracle — cross-engine summation order differs
in the last bits, and the driver compares order-insensitive value
hashes, not approximate values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle`` is DuckDB SQL over the pre-registered
    table views (region nation customer supplier part orders lineitem
    events documents embeddings), or None for non-SQL-expressible ops."""

    def deco(fn):
        REGISTRY[name] = Query(name, fn, oracle)
        return fn

    return deco


#: Oracle-side rewrite of the ``events`` view: the raw parquet carries
#: TIMESTAMP(NANOS); Spark reads it via nanosAsLong + µs truncation (see
#: ``load``), and DuckDB must truncate identically. Use as
#: ``f"({EVENTS_ORACLE}) e"`` or a CTE in oracle SQL.
EVENTS_ORACLE = (
    "SELECT event_id, CAST(date_trunc('microseconds', ts) AS TIMESTAMP) AS ts, "
    "user_id, event_type, value, props FROM events"
)


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read a testdata table; filters/projections applied by callers push
    down into this parquet scan via Catalyst.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark rejects by
    default: read it as long ns (legacy nanosAsLong) and convert to a
    session-TZ-independent ``timestamp_ntz`` truncated to microseconds —
    matching the oracle's ``date_trunc('microseconds', ts)``.
    """
    if table == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        raw = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        return raw.withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts DIV 1000, TIMESTAMP_NTZ'1970-01-01 00:00:00')"
            ),
        )
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import all query modules (they self-register via @query)."""
    global _LOADED
    if _LOADED:
        return
    from spark_query_engine.queries import (  # noqa: F401
        parity,
        relational,
        analytics,
        advanced,
        extended,
        tpch_suite,
        pipeline,
        dedup,
        similarity,
        text,
        multimodal,
        events,
    )

    _LOADED = True
