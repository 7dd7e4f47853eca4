"""Round-10 scaling measurements (r9 verdict tasks 1 and 6).

Two measurement sets:

``rows`` — sf0.1/0.3/1 exponent rows for the three queries the r9
driver-ambient run pushed over the close gate's heavyweight threshold
(``basket_association_rules``, ``dedup_ngram_jaccard``,
``multimodal_frame_sample``) plus the new priced high-recall MinHash
point (``dedup_minhash_highrecall``) — min-of-2, noop sink, the same
protocol as every other SCALING.md exponent row.

``graph`` — the iterative-graph family at sf1 AND sf3 (30 replicas —
the exponent table previously topped out at sf1, where driver-sync
round costs are still small; at 100× the risk is per-round job latency
× round count). For each of the five queries the ROUND COUNT is
recorded next to the wall time:

- ``corpus_graph_pagerank`` / ``graph_hits_bipartite``: fixed 5 / 2
  rounds by construction (power iteration with pinned state).
- ``graph_kcore_peel``: delta-peel until the frontier empties,
  bounded by the 6-round unroll; rounds exposed via
  ``graph_kcore_peel.last_rounds``.
- ``dedup_cluster_components``: star-contraction fixpoint — the
  O(log n) claim; rounds exposed via
  ``connected_components_star.last_rounds``.
- ``graph_triangle_count``: not iterative (single wedge join pass);
  included because it is the family's heaviest member.

Under weak-scaling by DISJOINT replicas the round count of a fixpoint
loop is the max over components — mathematically scale-invariant here
(every replica repeats the same component structure), so a measured
round-count INCREASE at sf3 would flag a convergence-probe defect;
the wall-time row measures whether per-round job cost stays linear.

sf3 inputs are generated on first use (30 replicas via the existing
structure-preserving generators in gen_scaling_data / gen_scaling_tpch).

Usage:  python tools/r10_scaling.py rows|graph [sf_dirs...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tools"))

SCALING = ROOT / ".scaling_data"

ROWS_QUERIES = [
    "basket_association_rules",
    "dedup_ngram_jaccard",
    "multimodal_frame_sample",
    "dedup_minhash_highrecall",
    "dedup_minhash",  # the default-recall twin, same protocol, for the price ratio
]

GRAPH_QUERIES = [
    "graph_triangle_count",
    "corpus_graph_pagerank",
    "graph_kcore_peel",
    "graph_hits_bipartite",
    "dedup_cluster_components",
]


def ensure_sf3() -> str:
    out = SCALING / "sf3"
    if not (out / "lineitem.parquet").exists():
        print("generating sf3 (30 replicas) ...", flush=True)
        import gen_scaling_data
        import gen_scaling_tpch

        gen_scaling_data.gen(SCALING, 30, "sf3")
        gen_scaling_tpch.gen(SCALING, 30, "sf3")
    return str(out)


def measure(names: list[str], sf_dirs: list[str]) -> None:
    from spark_query_engine import queries as registry
    from spark_query_engine.queries import training
    from spark_query_engine.operators import dedup as D
    from spark_query_engine.session import get_session

    spark = get_session("r10-scaling")
    qs = registry.queries()
    for name in names:
        for sf_dir in sf_dirs:
            runs = []
            rounds = None
            for _ in range(2):
                t0 = time.time()
                try:
                    qs[name](spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                except Exception as e:
                    print(f"{name} @ {sf_dir}: FAILED {e!r:.160}")
                    runs = None
                    break
                finally:
                    spark.catalog.clearCache()
                runs.append(time.time() - t0)
                if name == "dedup_cluster_components":
                    rounds = getattr(
                        D.connected_components_star, "last_rounds", None
                    )
                elif name == "graph_kcore_peel":
                    rounds = getattr(
                        training.graph_kcore_peel, "last_rounds", None
                    )
            if runs is None:
                continue
            tag = f" rounds={rounds}" if rounds is not None else ""
            print(
                f"{name} @ {Path(sf_dir).name}: "
                f"min {min(runs):.2f}s (runs {[round(r, 2) for r in runs]})"
                f"{tag}",
                flush=True,
            )


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "rows"
    if mode == "rows":
        dirs = sys.argv[2:] or [
            "/root/testdata/sf0.1",
            str(SCALING / "sf0.3"),
            str(SCALING / "sf1"),
        ]
        measure(ROWS_QUERIES, dirs)
    elif mode == "graph":
        dirs = sys.argv[2:] or [str(SCALING / "sf1"), ensure_sf3()]
        measure(GRAPH_QUERIES, dirs)
    else:
        raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
