"""One-shot audit for the round-11c defect class: a row-amplifying
``Generate`` (explode) whose input comes STRAIGHT off a file scan with
no shuffle in between.

Why this matters (SCALING.md 11c): Spark sizes scan splits by BYTES
(``spark.sql.files.maxPartitionBytes``), so a fan-out inheriting the
scan's split count runs its amplified, per-row-expensive stage on
however many splits the parquet footer happened to bin-pack — 5 at
sf1 for orders.parquet — regardless of cores. ``stats_poisson_bootstrap``
measured FLAT sf1→sf3 (29.4 → 29.8 s) because of exactly this; adding
the standing ``widen`` guard made it 3.65 / 7.10 s (exponent back to
0.61). On a real 100 TB cluster scan splits ≫ cores and the guard is a
no-op — the defect is that LOCAL/small-table fan-outs serialize, which
poisons both benchmark fidelity and any cluster stage reading a small
dimension table.

This tool walks every registered query's optimized logical plan
(``toJSON`` — plan-only, no execution) and reports each Generate node
whose subtree reaches a relation without crossing a
shuffle-introducing operator (Aggregate / Join / Repartition /
RepartitionByExpression / Window / Sort / GlobalLimit). For each hit
it prints the query, the generator expression, and the relation —
a worklist for manual adjudication (cheap linear fan-outs over tables
that are LARGE at scale are fine; per-row-expensive fan-outs over
small-at-scale inputs want ``widen``).

Usage: python tools/fanout_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

#: Logical operators whose physical translation introduces an
#: Exchange (or otherwise re-partitions to cluster width), breaking
#: the scan-split inheritance chain.
SHUFFLE_NODES = (
    ".Aggregate",
    ".Join",
    ".Repartition",
    ".RepartitionByExpression",
    ".RepartitionOperation",
    ".Window",
    ".Sort",
    ".GlobalLimit",
    ".Distinct",
    ".Deduplicate",
    ".CoGroup",
    ".FlatMapGroupsInPandas",
    ".MapInPandas",  # arrives via mapInPandas AFTER any upstream widen
    ".Intersect",
    ".Except",
)

#: Leaf relation classes — reaching one of these from a Generate with
#: no shuffle node on the path means the fan-out inherits scan splits.
RELATION_NODES = (
    ".LogicalRelation",
    ".LocalRelation",
    ".Range",
    ".View",
    ".UnresolvedRelation",
    ".DataSourceV2Relation",
    ".DataSourceV2ScanRelation",
)


def build_tree(nodes: list[dict]) -> tuple[dict, list[dict]]:
    """Reconstruct the pre-order flat node list into (root, all)."""
    idx = 0

    def rec() -> dict:
        nonlocal idx
        node = dict(nodes[idx])
        idx += 1
        node["_children"] = [rec() for _ in range(node.get("num-children", 0))]
        return node

    root = rec()
    return root, nodes


def scan_reachable(node: dict) -> str | None:
    """First relation name reachable without crossing a shuffle node."""
    cls = node.get("class", "")
    if cls.endswith(RELATION_NODES):
        rel = node.get("relation")
        if isinstance(rel, list):
            rel = rel[0] if rel else None
        return str(rel)[:80] if rel is not None else cls.rsplit(".", 1)[-1]
    if cls.endswith(SHUFFLE_NODES):
        return None
    for ch in node.get("_children", []):
        hit = scan_reachable(ch)
        if hit is not None:
            return hit
    return None


def count_scan_fanouts(root: dict) -> int:
    """Number of Generate nodes in the reconstructed tree whose input
    reaches a relation without crossing a shuffle-introducing node —
    the close-gate entry point (tools/close_gates.py gate 4)."""
    n = 0
    stack = [root]
    while stack:
        node = stack.pop()
        if node.get("class", "").endswith(".Generate"):
            for ch in node.get("_children", []):
                if scan_reachable(ch) is not None:
                    n += 1
                    break
        stack.extend(node.get("_children", []))
    return n


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from spark_query_engine import queries as registry
    from spark_query_engine.session import get_session

    spark = get_session("fanout-audit")
    hits: list[str] = []
    failed: list[str] = []
    n_generate = 0
    for name, fn in registry.queries().items():
        try:
            df = fn(spark, sf_dir)
            flat = json.loads(df._jdf.queryExecution().optimizedPlan().toJSON())
            root, _ = build_tree(flat)
        except Exception as e:
            failed.append(f"{name}: {e!r:.100}")
            continue
        finally:
            spark.catalog.clearCache()

        def walk(node: dict) -> None:
            nonlocal n_generate
            if node.get("class", "").endswith(".Generate"):
                n_generate += 1
                rel = None
                for ch in node.get("_children", []):
                    rel = scan_reachable(ch)
                    if rel is not None:
                        break
                if rel is not None:
                    gen = str(node.get("generator"))[:90]
                    hits.append(f"{name}: Generate({gen}) <- scan {rel}")
            for ch in node.get("_children", []):
                walk(ch)

        walk(root)

    print(f"queries walked: {len(registry.queries()) - len(failed)}")
    print(f"Generate nodes total: {n_generate}")
    print(f"Generate-over-unshuffled-scan sites: {len(hits)}")
    for h in hits:
        print("  " + h)
    for f in failed:
        print("  FAILED " + f)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
