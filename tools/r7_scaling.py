#!/usr/bin/env python
"""Weak-scaling measurement for the round-7 rewires and the two eval
queries that had no exponent rows (round-6 verdict, task 5):

- corpus_semdedup        — k now grows ∝ n (⌈n/64⌉ footer-sized)
- dedup_embedding_cosine — exact tiled-GEMM plan (r7 rewrite)
- dedup_embedding_scaled — arity-m CP keys (m: 2 at these n)
- ann_ndcg_eval / graph_linkpred_eval — first exponent rows
- graph_ppr_seeds / corpus_graph_pagerank — re-measured after the
  lazy-round rewrite

Uses the round-6 structure-preserving scaler output in
.scaling_data (embeddings: per-replica orthogonal rotations;
documents: token perturbation; lineitem: key-shifted replicas).

Usage: python tools/r7_scaling.py [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DIRS = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf0.3", "/root/repo/.scaling_data/sf0.3"),
    ("sf1", "/root/repo/.scaling_data/sf1"),
]

QUERIES = [
    "corpus_semdedup",
    "dedup_embedding_cosine",
    "dedup_embedding_scaled",
    "ann_ndcg_eval",
    "graph_linkpred_eval",
    "graph_ppr_seeds",
    "corpus_graph_pagerank",
]


def main() -> None:
    from spark_query_engine.queries import queries
    from spark_query_engine.session import get_session

    names = sys.argv[1:] or QUERIES
    spark = get_session("r7-scaling")
    qs = queries()
    for name in names:
        fn = qs[name]
        for label, d in DIRS:
            runs = []
            for i in range(3):
                t0 = time.time()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                if i > 0:
                    runs.append(dt)
                spark.catalog.clearCache()
            print(
                f"{name} {label}: min-of-2 = {min(runs):.2f}s "
                f"(runs {', '.join(f'{r:.2f}' for r in runs)})",
                flush=True,
            )


if __name__ == "__main__":
    main()
