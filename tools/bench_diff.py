"""Diff two bench records per-query, separating CODE movement from
AMBIENT drift mechanically (r7 verdict task 8).

The shared box shows ±8-24% ambient episodes: uniform per-query
inflation with zero CPU steal, straddled by the committed run pairs.
Round-over-round adjudication therefore needs a canary: the r1 subset
(untouched since round 1) measures the ambient factor of each run, and
per-query deltas are judged AFTER dividing it out.

Output per comparison:
  - canary factor = median(new/old) over the r1-subset queries
    (median, not mean — a single real regression in the canary set
    must not poison the normalizer)
  - ambient-adjusted regressions/wins: adjusted ratio = (new/old) /
    canary_factor, flagged only when the committed run pairs do NOT
    straddle the adjusted delta (a pair that straddles is noise by
    the round-5 dispersion rule)

Calibration (r10, measured): diffing the two SAME-TREE round-9
records (builder close run vs driver re-run, zero code change) flags
15 of 343 rows as "CODE-ATTRIBUTABLE candidates" — same-box sessions
differ consistently PER QUERY beyond the median canary (session-level
episodes: worker warmth, interleaving, cache pressure; the r9h
finding). The candidate list is therefore a RE-MEASUREMENT QUEUE
(isolated cold min-of-2 per name), not a verdict; only an isolated
re-measure that reproduces the delta is code-attributable.

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
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def load_record(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return d
    tail = d.get("tail", "")
    # the bench JSON line may be truncated at the front; recover every
    # "name": seconds pair inside the queries object
    m = re.search(r'"queries"\s*:\s*\{(.*)', tail, re.S)
    blob = m.group(1) if m else tail
    qs = {
        k: float(v)
        for k, v in re.findall(r'"([a-z0-9_]+)":\s*([0-9.]+)', blob)
        if k not in ("value", "sf", "r1_subset_total")
    }
    return {"queries": qs, "runs": {}}


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2.0


def main() -> None:
    from bench import R1_SUBSET

    new_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_FULL.json"
    old_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_r03.json"
    rec_new, rec_old = load_record(new_path), load_record(old_path)
    new, old = rec_new["queries"], rec_old["queries"]
    runs_new = rec_new.get("runs") or {}
    runs_old = rec_old.get("runs") or {}
    common = sorted(set(new) & set(old), key=lambda k: old[k] - new[k])
    print(
        f"comparable: {len(common)} queries "
        f"(new has {len(new)}, old record carries {len(old)})"
    )
    total_new = sum(new[k] for k in common)
    total_old = sum(old[k] for k in common)
    print(f"common-subset total: {total_old:.2f}s -> {total_new:.2f}s")

    canary = [
        k for k in R1_SUBSET if k in common and old[k] > 0 and new[k] > 0
    ]
    if len(canary) >= 5:
        factor = _median([new[k] / old[k] for k in canary])
        print(
            f"ambient canary factor (median new/old over {len(canary)} "
            f"r1-subset queries): {factor:.3f}"
        )
    elif rec_new.get("canary_factor") and rec_old.get("canary_factor"):
        # r10: records committed since round 10 carry their own
        # canary_factor (r1_subset_total / R1_CANARY_BASE) — usable
        # even when the old record is a truncated driver tail that
        # lost the r1-subset per-query rows
        factor = rec_new["canary_factor"] / rec_old["canary_factor"]
        print(
            f"ambient canary factor (committed canary_factor fields "
            f"{rec_old['canary_factor']:.3f} -> "
            f"{rec_new['canary_factor']:.3f}): {factor:.3f}"
        )
    else:
        factor = 1.0
        print("canary unavailable (r1 subset not in both records); factor=1")

    def straddles(k: str) -> bool:
        """True when the committed run pairs overlap — the adjusted
        delta is then within measured dispersion, i.e. ambient."""
        a, b = runs_new.get(k), runs_old.get(k)
        if not a or not b:
            return False
        adj = [r / factor for r in a]
        return min(adj) <= max(b) and min(b) <= max(adj)

    # r10 (r9 verdict task 2): the flag bar is canary-adjusted x1.3
    # (was 1.5) and the straddle adjudication is part of the verdict —
    # a flagged-and-straddling row is ambient BY THE COMMITTED RUN
    # PAIRS, no manual prose needed; only non-straddling rows are
    # CODE-ATTRIBUTABLE candidates.
    print("\nambient-adjusted regressions (adj >1.3x and >0.5s):")
    code_attributable: list[str] = []
    for k in common:
        adj = (new[k] / old[k]) / factor if old[k] > 0 else float("inf")
        if new[k] / factor - old[k] > 0.5 and adj > 1.3:
            if straddles(k):
                tag = " [runs straddle: ambient by committed run pairs]"
            else:
                tag = " [CODE-ATTRIBUTABLE candidate: runs do not straddle]"
                code_attributable.append(k)
            print(f"  {k}: {old[k]:.2f} -> {new[k]:.2f} (adj x{adj:.2f}){tag}")
    print(
        f"code-attributable regression candidates: "
        f"{code_attributable or 'none'}"
    )
    print("\nambient-adjusted wins (adj <0.67x and >0.5s):")
    for k in reversed(common):
        adj = (new[k] / old[k]) / factor if old[k] > 0 else 0.0
        if old[k] - new[k] / factor > 0.5 and adj < 0.67:
            print(f"  {k}: {old[k]:.2f} -> {new[k]:.2f} (adj x{adj:.2f})")


if __name__ == "__main__":
    main()
