"""Dump .explain("formatted") for named queries to plans/<dir>/.

Usage: SPARK_GRAFT_SF_DIR=... python tools/dump_plans.py <outdir> <suffix> q1 q2 ...
Writes plans/<outdir>/<query>_<suffix>.txt for each query.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from spark_query_engine import queries as registry
    from spark_query_engine.session import get_session

    spark = get_session("dump_plans")
    qs = registry.queries()
    d = ROOT / "plans" / outdir
    d.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        (d / f"{name}_{suffix}.txt").write_text(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt.splitlines())} lines)")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
