#!/usr/bin/env python
"""Weak-scaling measurement for the round-5f additions (experimentation
suite: CUPED, mSPRT, policy replay, jackknife, SRM).

Usage: python tools/r5f_scaling.py
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
    "stats_cuped_adjusted",
    "stats_msprt_sequential",
    "events_policy_replay",
    "stats_jackknife_ratio",
    "stats_srm_check",
]


def main() -> None:
    from spark_query_engine.queries import queries
    from spark_query_engine.session import get_session

    spark = get_session("r5f-scaling")
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
