#!/usr/bin/env python
"""Weak-scaling measurement for the round-5g heavyweights (dedup cascade, PPR
unigram prune, hard negatives, assortativity).

Usage: python tools/r5g_scaling.py
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

# NOTE: the .scaling_data replicas carry documents/lineitem/events/
# orders/customer/part but NOT embeddings (vector replicas cannot be
# naively cloned without creating cross-replica cosine cliques that
# break the linear ground truth), so the embedding-plane heavyweights
# (pipeline_dedup_cascade stage 3, ann_hard_negatives) are excluded -
# their components are measured elsewhere (minhash r4, CP-LSH curve,
# star-CC r4).
QUERIES = [
    "graph_ppr_seeds",
    "corpus_unigram_prune",
    "graph_assortativity",
    "corpus_ccnet_buckets",
]


def main() -> None:
    from spark_query_engine.queries import queries
    from spark_query_engine.session import get_session

    spark = get_session("r5g-scaling")
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
