#!/usr/bin/env python
"""Weak-scaling measurement for corpus_pack_sequences (round 5).

Packing's plan is one partitioned-window shuffle + a narrow fan-out,
so the replica-scaled documents tables (tools/gen_scaling_data.py)
predict LINEAR time in sf. Measures sf0.1 (driver testdata) vs sf0.3
and sf1 (.scaling_data replicas), min-of-2 after a warmup run.

Usage: python tools/pack_scaling.py
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


def main() -> None:
    from spark_query_engine.queries import queries
    from spark_query_engine.session import get_session

    spark = get_session("pack-scaling")
    fn = queries()["corpus_pack_sequences"]
    for label, d in DIRS:
        runs = []
        for i in range(3):
            t0 = time.time()
            fn(spark, d).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            if i > 0:
                runs.append(dt)
            spark.catalog.clearCache()
        print(f"{label}: min-of-2 = {min(runs):.2f}s", flush=True)


if __name__ == "__main__":
    main()
