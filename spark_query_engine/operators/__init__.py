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

from spark_query_engine.operators import dedup, multimodal, similarity, textanalysis

__all__ = ["dedup", "multimodal", "similarity", "textanalysis"]
