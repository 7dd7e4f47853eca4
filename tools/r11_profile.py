"""Round-11 optimization profiler.

For each named query: capture ``explain("formatted")`` to
``plans/r11/<name>_<tag>.txt`` and time the noop-sink execution
(1 warmup + N recorded, keep min — the bench.py methodology).

Usage:
    python tools/r11_profile.py before tpch_q1 dedup_minhash ...
    python tools/r11_profile.py after  tpch_q1 ...
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/r11_profile.py ...

Prints one line per query: ``<name> <min_sec> <runs>`` and a total.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_rec = int(os.environ.get("R11_PROFILE_RUNS", "2"))

    from spark_query_engine import queries as registry
    from spark_query_engine.session import get_session

    spark = get_session("r11_profile")
    qs = registry.queries()
    plans_dir = ROOT / "plans" / "r11"
    plans_dir.mkdir(parents=True, exist_ok=True)

    # codegen warmup
    qs["limit_topk"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.catalog.clearCache()

    timings: dict[str, float] = {}
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (plans_dir / f"{name}_{tag}.txt").write_text(buf.getvalue())
        spark.sparkContext.setJobDescription(f"r11:{name}")
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
        print(f"{name} {timings[name]} {[round(r, 3) for r in runs]}", flush=True)
    print(json.dumps({"tag": tag, "total": round(sum(timings.values()), 3), "queries": timings}))


if __name__ == "__main__":
    main()
