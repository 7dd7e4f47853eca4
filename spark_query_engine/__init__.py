"""spark_query_engine — a PySpark-native analytic query engine.

A from-scratch re-expression of the capabilities of the reference engine
(athultr1997/rust-query-engine, surveyed in SURVEY.md) on top of Apache
Spark SQL. The reference builds its own columnar batches, Volcano
iterators, and a one-rule optimizer; here the execution substrate is
Catalyst + Tungsten, and this package provides:

- ``ExecutionContext`` — session + source registration (csv/parquet/
  json/memory), mirroring the reference's ``ExecutionContext``
  (reference: src/execution/mod.rs:13-47).
- ``Dataframe`` — the fluent logical-plan builder verbs (project /
  filter / aggregate / limit / sort / join / ...), mirroring and
  completing the reference's builder (src/dataframe/mod.rs:9-19).
- ``expressions`` — column refs, literals, comparisons, casts and
  aggregate expressions (src/logical_plan/mod.rs:244-625).
- ``operators`` — beyond-parity, scale-oriented operators: dedup
  (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
  similarity search (brute-force + LSH ANN), text analysis, multimodal
  column plumbing.
- ``streaming`` — Structured Streaming equivalents over event streams.

Everything is DataFrame/SQL-first: plans are declared, Catalyst picks
the physical strategy, and all hot-path expressions stay JVM-side.
"""

from spark_query_engine.context import ExecutionContext
from spark_query_engine.dataframe import Dataframe
from spark_query_engine.expressions import (
    col,
    lit,
    lit_long,
    lit_string,
    cast,
    count,
    max,
    min,
    sum,
    avg,
)
from spark_query_engine.session import get_session

__all__ = [
    "ExecutionContext",
    "Dataframe",
    "col",
    "lit",
    "lit_long",
    "lit_string",
    "cast",
    "count",
    "max",
    "min",
    "sum",
    "avg",
    "get_session",
]

__version__ = "0.1.0"
