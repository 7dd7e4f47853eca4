"""Split profiler: construction wall vs action wall per query.

Construction = calling the query function (plan building, any driver
collects/persists the operator pays at build time). Action = the noop
sink execution of the returned DataFrame. Methodology mirrors
r11_profile.py (1 warmup + N recorded, min), but each recorded run
times the two phases separately so optimization effort lands on the
right side of the boundary.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
        python tools/r11_split_profile.py q1 q2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_rec = int(os.environ.get("R11_PROFILE_RUNS", "2"))

    from spark_query_engine import queries as registry
    from spark_query_engine.session import get_session

    spark = get_session("r11_split_profile")
    qs = registry.queries()

    qs["limit_topk"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.catalog.clearCache()

    out: dict[str, dict[str, float]] = {}
    for name in names:
        builds: list[float] = []
        actions: list[float] = []
        for i in range(1 + n_rec):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            if i > 0:
                builds.append(t1 - t0)
                actions.append(t2 - t1)
            spark.catalog.clearCache()
        out[name] = {
            "build": round(min(builds), 3),
            "action": round(min(actions), 3),
        }
        print(
            f"{name} build={out[name]['build']} action={out[name]['action']}",
            flush=True,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
