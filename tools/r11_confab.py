"""Round-11 config A/B harness.

Runs a named subset of headline queries under a config variant (fresh
process per variant → fresh JVM) with the bench.py methodology
(noop sink, 1 warmup + 2 recorded, min) and prints one JSON line.

Usage:
    python tools/r11_confab.py VARIANT_NAME query1 query2 ...

Variants are defined in VARIANTS below; "base" = session defaults.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

VARIANTS: dict[str, dict[str, str]] = {
    "base": {},
    # guide §3.1/§9: allow shuffled-hash join instead of sort-merge
    "shj": {
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64MB",
    },
    # guide §4.2 caveat: bigger Arrow batches for the mapInPandas ops
    "arrow50k": {
        "spark.sql.execution.arrow.maxRecordsPerBatch": "50000",
    },
    # guide §2.3: zstd shuffle compression (vs default lz4)
    "zstd": {
        "spark.io.compression.codec": "zstd",
    },
    # kryo for RDD paths (localCheckpoint) and broadcasts
    "kryo": {
        "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    },
    "shj_arrow": {
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64MB",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "50000",
    },
}


def main() -> None:
    variant = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_rec = int(os.environ.get("R11_PROFILE_RUNS", "2"))

    from spark_query_engine import queries as registry
    from spark_query_engine.session import get_session

    spark = get_session("r11_confab", extra_conf=VARIANTS[variant])
    qs = registry.queries()

    qs["limit_topk"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.catalog.clearCache()

    timings: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"r11:{variant}:{name}")
        runs: list[float] = []
        for i in range(1 + n_rec):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            if i > 0:
                runs.append(time.time() - t0)
            spark.catalog.clearCache()
        timings[name] = round(min(runs), 3)
        print(f"{name} {timings[name]}", flush=True)
    print(
        json.dumps(
            {
                "variant": variant,
                "total": round(sum(timings.values()), 3),
                "queries": timings,
            }
        )
    )


if __name__ == "__main__":
    main()
