#!/usr/bin/env python
"""Weak-scaling measurement for the round-5d additions.

- agg_kmv_jaccard / graph_ppr_seeds (documents-driven): sketch build +
  LSH candidate graph — per-source sketch state is k rows regardless
  of corpus size; the PPR rounds run on the candidate-pair relation.
- graph_hits_bipartite (orders+lineitem): the fact-fact edge join and
  two half-round joins — linear in edges by construction (replicas
  are disjoint purchase-graph copies).
- join_cardinality_sketch (orders+customer): two CMS builds (constant
  cell count) + the exact audit join.
- data_group_split_audit (events-driven): distinct-user agg + the
  assignment fan-out join.

Replica tables from tools/gen_scaling_data.py + gen_scaling_events.py
+ gen_scaling_tpch.py in .scaling_data/.

Usage: python tools/r5d_scaling.py
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
    "agg_kmv_jaccard",
    "graph_ppr_seeds",
    "graph_hits_bipartite",
    "join_cardinality_sketch",
    "data_group_split_audit",
]


def main() -> None:
    from spark_query_engine.queries import queries
    from spark_query_engine.session import get_session

    spark = get_session("r5d-scaling")
    qs = queries()
    for name in QUERIES:
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
            print(f"{name} {label}: min-of-2 = {min(runs):.2f}s", flush=True)


if __name__ == "__main__":
    main()
