"""Diff two bench records per-query: flags regressions and wins.

Usage: python tools/bench_diff.py BENCH_FULL.json [BENCH_r03.json]

Accepts either the full record written by bench.py (top-level
"queries") or a driver BENCH_r{N}.json capture (extracts the JSON line
embedded in its "tail" field — the driver keeps only the stdout tail,
so older rounds may carry a partial query map).
"""

from __future__ import annotations

import json
import re
import sys


def load_queries(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return d["queries"]
    tail = d.get("tail", "")
    # the bench JSON line may be truncated at the front; recover every
    # "name": seconds pair inside the queries object
    m = re.search(r'"queries"\s*:\s*\{(.*)', tail, re.S)
    blob = m.group(1) if m else tail
    return {
        k: float(v)
        for k, v in re.findall(r'"([a-z0-9_]+)":\s*([0-9.]+)', blob)
        if k not in ("value", "sf", "r1_subset_total")
    }


def main() -> None:
    new_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_FULL.json"
    old_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_r03.json"
    new = load_queries(new_path)
    old = load_queries(old_path)
    common = sorted(set(new) & set(old), key=lambda k: old[k] - new[k])
    print(f"comparable: {len(common)} queries "
          f"(new has {len(new)}, old record carries {len(old)})")
    total_new = sum(new[k] for k in common)
    total_old = sum(old[k] for k in common)
    print(f"common-subset total: {total_old:.2f}s -> {total_new:.2f}s")
    print("\nregressions (>0.5s and >1.5x):")
    for k in common:
        if new[k] - old[k] > 0.5 and new[k] > 1.5 * old[k]:
            print(f"  {k}: {old[k]:.2f} -> {new[k]:.2f}")
    print("\nwins (>0.5s and <0.67x):")
    for k in reversed(common):
        if old[k] - new[k] > 0.5 and new[k] < 0.67 * old[k]:
            print(f"  {k}: {old[k]:.2f} -> {new[k]:.2f}")


if __name__ == "__main__":
    main()
