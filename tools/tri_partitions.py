#!/usr/bin/env python
"""Measure graph_triangle_count at sf1 across shuffle-partition
settings — the round-4 scaling study's one superlinear query
(exponent 1.14): the ~1.5 B-row wedge shuffle spills at 32
partitions on local[32]. This quantifies the partition-count knob.

Usage: python tools/tri_partitions.py [parts ...] (default 32 128 256)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/repo/.scaling_data/sf1"


def main() -> None:
    parts_list = [int(x) for x in sys.argv[1:]] or [32, 128, 256]
    from pyspark.sql import SparkSession

    for parts in parts_list:
        spark = (
            SparkSession.builder.master("local[32]")
            .config("spark.sql.shuffle.partitions", str(parts))
            .config("spark.driver.memory", "64g")
            .config("spark.sql.adaptive.enabled", "true")
            .appName(f"tri-parts-{parts}")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        from spark_query_engine.queries import queries

        fn = queries()["graph_triangle_count"]
        runs = []
        for i in range(3):
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            if i > 0:
                runs.append(dt)
            spark.catalog.clearCache()
        print(f"parts={parts}: min-of-2 = {min(runs):.2f}s (runs: "
              + ", ".join(f"{r:.2f}" for r in runs) + ")", flush=True)
        spark.stop()


if __name__ == "__main__":
    main()
