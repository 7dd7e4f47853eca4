#!/usr/bin/env python
"""Weak-scaling measurement for the round-5b heavyweights.

- graph_link_prediction (lineitem-driven): the wedge join over the
  sparsified co-purchase graph. Edge count grows superlinearly with
  sf (more orders share parts), so the interesting number is how the
  plan's time tracks the EDGE count, not sf itself — both are printed.
- text_source_jsd (documents-driven): the token explode is linear in
  corpus size; the pair matrix is |sources|x(V+1) regardless — time
  should track tokens, flat in the matrix.

Replica tables from tools/gen_scaling_data.py in .scaling_data/.

Usage: python tools/r5b_scaling.py
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

QUERIES = ["stats_psi_drift", "stats_auc_mannwhitney", "stats_chi2_drift", "events_acf_lags", "events_item_cooccurrence", "stats_spearman_daily", "events_holt_backtest"]


def main() -> None:
    from spark_query_engine.queries import queries
    from spark_query_engine.session import get_session

    spark = get_session("r5c-scaling")
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
