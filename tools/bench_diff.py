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
  - r11: non-straddling flags are sub-classified from the committed
    run pairs alone (r10 verdict task 6): when the new pair's
    internal min-of-2 spread exceeds the adjusted delta, the "shift"
    is within this run's own measured dispersion — EPISODE-SUSPECT;
    only a tight pair that moved as a whole is a SHIFT candidate.
  - r11: a chronic-flag counter (r10 verdict task 2): BENCH_FLAGS.json
    at the repo root carries, per query, how many consecutive
    adjudicated comparisons flagged it. Pass --update-flags on the
    round's canonical comparison to advance the counter; queries at
    >= 3 rounds running print an ESCALATE line — the standing order
    is one isolated cold-session min-of-2 (the SCALING.md 10c
    protocol), not another round of prose re-adjudication.

Calibration (r10, measured): diffing the two SAME-TREE round-9
records (builder close run vs driver re-run, zero code change) flags
15 of 343 rows as "CODE-ATTRIBUTABLE candidates" — same-box sessions
differ consistently PER QUERY beyond the median canary (session-level
episodes: worker warmth, interleaving, cache pressure; the r9h
finding). The candidate list is therefore a RE-MEASUREMENT QUEUE
(isolated cold min-of-2 per name), not a verdict; only an isolated
re-measure that reproduces the delta is code-attributable.

Usage: python tools/bench_diff.py BENCH_FULL.json [BENCH_r03.json]
       python tools/bench_diff.py --update-flags NEW.json OLD.json

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

REPO = Path(__file__).resolve().parent.parent
FLAGS_PATH = REPO / "BENCH_FLAGS.json"

#: Top-level numeric fields of the bench record (every generation of
#: its layout) — excluded when the tail is so truncated that only a
#: flat "name": number scan is possible. r10 ADVICE: the r10 record
#: added canary/adjusted fields the old 3-entry list did not cover,
#: so a flat scan admitted them as fake query rows.
_NON_QUERY_FIELDS = frozenset(
    {
        "value",
        "sf",
        "n_queries",
        "run_spread_total",
        "r1_subset_total",
        "r2_subset_total",
        "r3_subset_total",
        "r5_subset_total",
        "canary_base",
        "canary_factor",
        "adjusted_total",
    }
)


def _bounded_object(tail: str, field: str) -> str | None:
    """The flat-map object following ``"field": {`` in a tail capture,
    bounded at its own closing brace (non-greedy — the maps bench.py
    emits are flat, so the first ``}`` closes them). r10 ADVICE: the
    old greedy ``(.*)`` swept past the close and let the ``adjusted``
    map (same query names, later in the record) silently overwrite
    every raw timing."""
    m = re.search(r'"' + field + r'"\s*:\s*\{(.*?)\}', tail, re.S)
    return m.group(1) if m else None


def load_record(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return d
    tail = d.get("tail", "")
    rec: dict = {"runs": {}}
    blob = _bounded_object(tail, "queries")
    if blob is None:
        # the tail window started MID-queries (round 3 lost 61 of 124
        # rows): scan the flat pairs but stop before the first later
        # top-level map ("runs"/"adjusted" re-list the same names as
        # lists / canary-divided twins)
        cut = len(tail)
        for marker in ('"runs"', '"adjusted"'):
            i = tail.find(marker)
            if i != -1:
                cut = min(cut, i)
        blob = tail[:cut]
    rec["queries"] = {
        k: float(v)
        for k, v in re.findall(r'"([a-z0-9_]+)"\s*:\s*([0-9.]+)', blob)
        if k not in _NON_QUERY_FIELDS
    }
    # recover the committed run pairs when the tail kept them — the
    # straddle/spread adjudication then works against driver captures
    runs_blob = _bounded_object(tail, "runs")
    if runs_blob is not None:
        rec["runs"] = {
            k: [float(x) for x in re.findall(r"[0-9.]+", arr)]
            for k, arr in re.findall(
                r'"([a-z0-9_]+)"\s*:\s*\[([0-9.,\s]+)\]', runs_blob
            )
        }
    # r10 ADVICE (low): the documented canary_factor fallback never
    # fired for tail captures because the loader dropped the field —
    # BENCH_r10.json's tail visibly carries it. Extract it (the LAST
    # occurrence wins: the full record's field and the final summary
    # line's repeat are identical by construction).
    cf = re.findall(r'"canary_factor"\s*:\s*([0-9.]+)', tail)
    if cf:
        rec["canary_factor"] = float(cf[-1])
    return rec


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2.0


def load_flags() -> dict:
    if FLAGS_PATH.exists():
        try:
            return json.loads(FLAGS_PATH.read_text())
        except Exception:
            return {}
    return {}


def update_flags(flagged: list[str], compared: set[str], label: str) -> dict:
    """Advance the chronic-flag counters: +1 for every flagged name,
    reset to 0 for every compared-but-clean name (names outside this
    comparison keep their streak — an absent query is no evidence
    either way). Returns the new table; caller decides persistence."""
    flags = load_flags()
    for name in flagged:
        row = flags.get(name) or {"rounds_running": 0}
        row["rounds_running"] = int(row.get("rounds_running", 0)) + 1
        row["last_flag"] = label
        flags[name] = row
    for name in compared:
        if name not in flagged and name in flags:
            flags[name]["rounds_running"] = 0
    # drop fully-reset rows to keep the committed file small
    return {k: v for k, v in flags.items() if v.get("rounds_running", 0) > 0}


def main() -> None:
    from bench import R1_SUBSET

    argv = [a for a in sys.argv[1:] if a != "--update-flags"]
    persist_flags = "--update-flags" in sys.argv[1:]
    new_path = argv[0] if len(argv) > 0 else "BENCH_FULL.json"
    old_path = argv[1] if len(argv) > 1 else "BENCH_r03.json"
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
        # lost the r1-subset per-query rows (the loader now recovers
        # the field from tails, r10 ADVICE)
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
                # r11 (r10 verdict task 6): sub-classify from the
                # committed pair alone — a new pair whose own spread
                # exceeds the adjusted delta moved WITHIN its measured
                # dispersion (within-run episode); only a tight pair
                # that moved as a whole is a shift candidate.
                code_attributable.append(k)
                pair = runs_new.get(k) or []
                spread = max(pair) - min(pair) if len(pair) >= 2 else None
                delta = new[k] / factor - old[k]
                if spread is not None and spread > delta:
                    tag = (
                        f" [CODE-ATTRIBUTABLE candidate — EPISODE-SUSPECT:"
                        f" new-pair spread {spread:.2f}s > adjusted delta"
                        f" {delta:.2f}s]"
                    )
                elif spread is not None:
                    tag = (
                        f" [CODE-ATTRIBUTABLE candidate — SHIFT: pair tight"
                        f" (spread {spread:.2f}s), both runs moved"
                        f" {delta:.2f}s]"
                    )
                else:
                    tag = " [CODE-ATTRIBUTABLE candidate: runs do not straddle]"
            print(f"  {k}: {old[k]:.2f} -> {new[k]:.2f} (adj x{adj:.2f}){tag}")
    print(
        f"code-attributable regression candidates: "
        f"{code_attributable or 'none'}"
    )

    # r11 chronic-flag counter (r10 verdict task 2): streaks survive
    # in BENCH_FLAGS.json; >= 3 rounds running auto-escalates to the
    # 10c cold-session protocol instead of per-round hand adjudication.
    flags = update_flags(
        code_attributable, set(common), label=Path(new_path).name
    )
    for name, row in sorted(flags.items()):
        n = row["rounds_running"]
        note = (
            "  ESCALATE: run the isolated cold-session min-of-2 "
            "(SCALING.md 10c protocol) and commit the verdict"
            if n >= 3
            else ""
        )
        print(f"flag streak: {name} = {n} round(s) running{note}")
    if persist_flags:
        FLAGS_PATH.write_text(json.dumps(flags, indent=1, sort_keys=True) + "\n")
        print(f"flag streaks persisted to {FLAGS_PATH.name}")

    print("\nambient-adjusted wins (adj <0.67x and >0.5s):")
    for k in reversed(common):
        adj = (new[k] / old[k]) / factor if old[k] > 0 else 0.0
        if old[k] - new[k] / factor > 0.5 and adj < 0.67:
            print(f"  {k}: {old[k]:.2f} -> {new[k]:.2f} (adj x{adj:.2f})")


if __name__ == "__main__":
    main()
