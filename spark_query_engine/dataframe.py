"""Fluent DataFrame builder over Spark logical plans.

Mirrors the reference's ``Dataframe`` trait + ``DataframeImpl``
(reference: src/dataframe/mod.rs:9-65) — project / filter / aggregate —
and completes the verbs the reference declares but never wires
(``limit``: logical node at src/logical_plan/mod.rs:125-151 with a
``todo!()`` lowering at src/query_planner/mod.rs:98), plus the verbs
the reference lists as absent (SURVEY.md §2.4/2.6/2.7/2.8: joins,
sorts, set ops, windows, distinct).

Each verb wraps the underlying Spark ``DataFrame`` — i.e. appends a
node to Catalyst's logical plan, exactly the shape of the reference's
immutable plan wrapping — and returns a new ``Dataframe``. Execution
is lazy until ``collect``/``show``/``write``.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column
from pyspark.sql import DataFrame as SparkDataFrame
from pyspark.sql import types as T

from spark_query_engine.plans import format_plan


class Dataframe:
    """Thin immutable builder; ``df.to_spark()`` exposes the raw DataFrame."""

    def __init__(self, sdf: SparkDataFrame):
        self._sdf = sdf

    # --- reference-parity verbs (src/dataframe/mod.rs:9-19) ---

    def project(self, *exprs: Column | str) -> "Dataframe":
        """Projection (reference: src/dataframe/mod.rs:26-33)."""
        return Dataframe(self._sdf.select(*exprs))

    def filter(self, expr: Column) -> "Dataframe":
        """Filter/selection (reference: src/dataframe/mod.rs:35-42)."""
        return Dataframe(self._sdf.filter(expr))

    def aggregate(
        self,
        group_expr: Iterable[Column | str],
        aggregate_expr: Iterable[Column],
    ) -> "Dataframe":
        """Group-by aggregate (reference: src/dataframe/mod.rs:44-56)."""
        group = list(group_expr)
        aggs = list(aggregate_expr)
        if group:
            return Dataframe(self._sdf.groupBy(*group).agg(*aggs))
        return Dataframe(self._sdf.agg(*aggs))

    def schema(self) -> T.StructType:
        """Schema of the plan so far (reference: src/dataframe/mod.rs:58-60)."""
        return self._sdf.schema

    # --- verbs the reference declares but never completes ---

    def limit(self, n: int) -> "Dataframe":
        """LIMIT — completes reference src/query_planner/mod.rs:98 todo."""
        return Dataframe(self._sdf.limit(n))

    # --- beyond-parity verbs (SURVEY.md §2 ABSENT rows) ---

    def sort(self, *exprs: Column | str) -> "Dataframe":
        return Dataframe(self._sdf.orderBy(*exprs))

    def join(
        self, other: "Dataframe", on, how: str = "inner"
    ) -> "Dataframe":
        return Dataframe(self._sdf.join(other._sdf, on, how))

    def union(self, other: "Dataframe") -> "Dataframe":
        return Dataframe(self._sdf.unionByName(other._sdf))

    def intersect(self, other: "Dataframe") -> "Dataframe":
        return Dataframe(self._sdf.intersect(other._sdf))

    def except_all(self, other: "Dataframe") -> "Dataframe":
        return Dataframe(self._sdf.exceptAll(other._sdf))

    def distinct(self) -> "Dataframe":
        return Dataframe(self._sdf.distinct())

    def with_column(self, name: str, expr: Column) -> "Dataframe":
        return Dataframe(self._sdf.withColumn(name, expr))

    # --- plan introspection (reference: format(), src/logical_plan/mod.rs:34-45) ---

    def logical_plan(self) -> str:
        return format_plan(self._sdf, "logical")

    def optimized_plan(self) -> str:
        return format_plan(self._sdf, "optimized")

    def physical_plan(self) -> str:
        return format_plan(self._sdf, "physical")

    def explain_string(self) -> str:
        """All three plan stages, analogous to the reference printing
        logical → optimized → physical in its planner golden tests
        (src/query_planner/mod.rs:150-201)."""
        return (
            "== Logical ==\n"
            + self.logical_plan()
            + "\n== Optimized ==\n"
            + self.optimized_plan()
            + "\n== Physical ==\n"
            + self.physical_plan()
        )

    # --- sinks (SURVEY.md §2.1: the reference has only a debug
    # RecordBatch::to_csv, src/datatypes/mod.rs:308-328) ---

    def write_parquet(
        self,
        path: str,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
    ) -> None:
        """Parquet sink; ``partition_by`` produces the hive-layout
        partitioned table that enables partition pruning downstream."""
        w = self._sdf.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)

    def write_csv(self, path: str, mode: str = "overwrite", header: bool = True) -> None:
        self._sdf.write.mode(mode).option("header", str(header).lower()).csv(path)

    def write_json(self, path: str, mode: str = "overwrite") -> None:
        self._sdf.write.mode(mode).json(path)

    def write_orc(self, path: str, mode: str = "overwrite") -> None:
        self._sdf.write.mode(mode).orc(path)

    def to_csv(self) -> str:
        """Debug CSV serialization of the full result — the engine's
        analogue of the reference's RecordBatch::to_csv
        (src/datatypes/mod.rs:308-328); driver-side, test-sized only."""
        rows = self._sdf.collect()
        return "".join(",".join(str(v) for v in row) + "\n" for row in rows)

    # --- actions ---

    def collect(self):
        return self._sdf.collect()

    def show(self, n: int = 20, truncate: bool = True) -> None:
        self._sdf.show(n, truncate)

    def count(self) -> int:
        return self._sdf.count()

    def to_spark(self) -> SparkDataFrame:
        return self._sdf

    def to_pandas(self):
        return self._sdf.toPandas()

    @property
    def columns(self) -> list[str]:
        return self._sdf.columns
