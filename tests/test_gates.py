"""The close-gate checks that used to run ONLY via
``tools/close_gates.py``, promoted into the suite (round-6 verdict,
task 7) so every ``pytest tests/`` run enforces them — a future
regression in moment widening, registry/docs consistency, or the
signbit-strict comparator goes red here, not at round close.

(The remaining close_gates stages — the full sf0.01 oracle sweep and
the suite itself — stay in the tool: they ARE pytest + the sweep.)
"""

from __future__ import annotations

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / "tools"))


def test_gate_moment_widening_is_clean():
    """Every `F.sum(F.col(a) * F.col(b))` product sum in the package
    either widens an operand to decimal(38,0) or carries an explicit
    range-bound MOMENT_ALLOWLIST entry (and no allowlist entry is
    stale) — the r5g exact-integer-moment contract, statically."""
    import close_gates

    assert close_gates.gate_moment_widening() == []


def test_gate_registry_docs_consistency():
    """COVERAGE.md's query count equals the live registry, every
    bench.HEADLINE name is registered, and every query carries an
    oracle or is on the documented rows-only list."""
    import close_gates

    assert close_gates.gate_registry_docs() == []


def test_checker_is_signbit_strict():
    """The local comparator must mirror the driver's bit-pattern
    hashing: IEEE -0.0 vs +0.0 on a float column is a FAILURE even
    though == calls them equal (the two-round vec_covariance_matrix
    red). Feed it a signbit skew and a clean frame; it must flag
    exactly the skew."""
    import pandas as pd

    import check_correctness as cc

    a = pd.DataFrame({"x": [1.5, 0.0], "k": [1, 2]})
    b_skew = pd.DataFrame({"x": [1.5, -0.0], "k": [1, 2]})
    ok, msg = cc.compare(a.copy(), b_skew)
    assert not ok and "signbit" in msg

    b_same = pd.DataFrame({"x": [1.5, 0.0], "k": [1, 2]})
    ok, msg = cc.compare(a.copy(), b_same)
    assert ok, msg


def test_gate_no_rowscale_global_windows():
    """No registered query's optimized plan may contain an
    unpartitioned Window/WindowGroupLimit node unless the query is on
    GLOBAL_WINDOW_ALLOWLIST with a bounded-support justification —
    and no allowlist entry may be stale (r7 verdict task 5: the
    window_ntile_cume single-partition global-sort class). Walks all
    ~344 optimized plans at sf0.001 (~3 min)."""
    import close_gates

    assert close_gates.gate_global_windows() == []


def test_sf1_sweep_classify_and_envelopes():
    """r10 (r9 verdict task 4): the sf1 sweep's SUBSET/TRADE
    classifier returns the two-way diff counts the numeric envelopes
    assert on, and the envelope tables stay coherent (every
    DERIVED_OF_BANDING name has a TRADE bound; SUBSET bands are
    ordered and contain the r10 measured calibration points)."""
    import pandas as pd

    import sweep_sf1 as sw

    base = pd.DataFrame({"id": [1, 2, 3], "v": [10, 20, 30]})
    # exact match
    st, _msg, ex, mi = sw.classify(base.copy(), base.copy())
    assert (st, ex, mi) == ("MATCH", 0, 0)
    # proper subset -> SUBSET with the missing count
    st, _msg, ex, mi = sw.classify(base.iloc[:2].copy(), base.copy())
    assert (st, ex, mi) == ("SUBSET", 0, 1)
    # two-way skew -> MISS with both counts
    skew = base.copy()
    skew.loc[0, "v"] = 11
    st, _msg, ex, mi = sw.classify(skew, base.copy())
    assert (st, ex, mi) == ("MISS", 1, 1)
    # schema drift -> counts unavailable
    st, _msg, ex, mi = sw.classify(base.rename(columns={"v": "w"}), base.copy())
    assert (st, ex, mi) == ("MISS", None, None)

    # envelope-table coherence: every DERIVED_OF_BANDING name carries
    # either a two-way TRADE bound or (for 1-row aggregates whose row
    # bound is vacuous) a value-deficit envelope — never neither, and
    # no orphaned bounds
    assert set(sw.TRADE_ENVELOPES) | set(sw.AGG_DEFICIT_ENVELOPES) == set(
        sw.DERIVED_OF_BANDING
    )
    assert not set(sw.TRADE_ENVELOPES) & set(sw.AGG_DEFICIT_ENVELOPES)
    for lo, hi in sw.SUBSET_ENVELOPES.values():
        assert 0 <= lo <= hi
    # measured calibration points sit inside their envelopes
    # (r10 points + the r11 full-registry additions)
    measured = {
        "dedup_minhash": 112,
        "dedup_minhash_highrecall": 1,
        "corpus_contrastive_pairs": 112,
        "dedup_bag_jaccard": 112,
    }
    for name, missed in measured.items():
        lo, hi = sw.SUBSET_ENVELOPES[name]
        assert lo <= missed <= hi, name
    for name, total in {
        "dedup_threshold_sweep": 6,
        "corpus_dedup_keep_best": 115,
        "dedup_cluster_components": 155,
        "dedup_chain_recursive": 144,
        "dedup_source_attribution": 48,
        "dedup_cluster_purity": 123,
        "pipeline_dedup_cascade": 4,
    }.items():
        assert total <= sw.TRADE_ENVELOPES[name], name
    for name, (col, lo, hi) in sw.AGG_DEFICIT_ENVELOPES.items():
        assert name in sw.DERIVED_OF_BANDING and lo <= hi
    # the r11 measured deficit point
    assert sw.AGG_DEFICIT_ENVELOPES["vec_text_alignment_audit"][1] <= 28
    assert 28 <= sw.AGG_DEFICIT_ENVELOPES["vec_text_alignment_audit"][2]


def test_bench_diff_record_loading_and_canary_fallback(tmp_path):
    """r10: bench_diff is the round-over-round adjudicator — pin its
    record loader (full record, truncated driver tail) and the
    committed-canary_factor fallback used when an old tail lost the
    r1-subset per-query rows."""
    import json

    import bench_diff as bd

    full = {
        "queries": {"a": 1.0, "b": 2.0},
        "runs": {"a": [1.0, 1.1]},
        "canary_factor": 1.2,
    }
    p_full = tmp_path / "full.json"
    p_full.write_text(json.dumps(full))
    rec = bd.load_record(str(p_full))
    assert rec["queries"] == {"a": 1.0, "b": 2.0}
    assert rec["canary_factor"] == 1.2

    # driver tail capture: JSON line truncated at the front — the
    # loader must recover every "name": seconds pair after "queries"
    tail = {"tail": 'gibberish "queries": {"q_one": 1.25, "q_two": 0.5}, "sf": 0.1}'}
    p_tail = tmp_path / "tail.json"
    p_tail.write_text(json.dumps(tail))
    rec = bd.load_record(str(p_tail))
    assert rec["queries"] == {"q_one": 1.25, "q_two": 0.5}
    assert rec["runs"] == {}

    # canary fallback ratio: committed fields divide new/old
    assert bd._median([1.0, 2.0, 4.0]) == 2.0
    assert bd._median([1.0, 3.0]) == 2.0


def test_bench_diff_tail_in_new_record_format(tmp_path):
    """r10 ADVICE (medium+low): a driver tail that preserves the FULL
    r10-format record — queries AND runs AND the canary/adjusted
    fields — must recover only the raw timings (bounded at the
    queries object's own close, not swept into the `adjusted` twin),
    must not admit the new top-level numeric fields as fake query
    rows, and must extract canary_factor + run pairs from the tail so
    the fallback branch and the straddle/spread adjudication work
    against driver captures."""
    import json

    import bench_diff as bd

    line = (
        'preamble-cut {"metric": "headline_queries_total", "value": 3.0, '
        '"unit": "sec", "queries": {"q_one": 1.25, "q_two": 0.5}, '
        '"runs": {"q_one": [1.25, 1.4], "q_two": [0.5, 0.52]}, '
        '"run_spread_total": 0.17, "r1_subset_total": 1.75, '
        '"canary_base": 14.16, "canary_factor": 1.0677, '
        '"adjusted": {"q_one": 1.171, "q_two": 0.468}, '
        '"adjusted_total": 2.81, "r2_subset_total": 1.75, "sf": 0.1}'
    )
    p = tmp_path / "tail_new.json"
    p.write_text(json.dumps({"tail": line}))
    rec = bd.load_record(str(p))
    # raw timings, NOT the canary-adjusted twins; no fake rows
    assert rec["queries"] == {"q_one": 1.25, "q_two": 0.5}
    assert rec["runs"] == {"q_one": [1.25, 1.4], "q_two": [0.5, 0.52]}
    assert rec["canary_factor"] == 1.0677

    # mid-queries truncation (the round-3 shape) with the new trailing
    # fields: flat scan must stop before `runs`/`adjusted` and exclude
    # every top-level numeric field
    cut = (
        '5, "q_two": 0.5}, "runs": {"q_one": [1.25, 1.4]}, '
        '"run_spread_total": 0.17, "canary_factor": 1.0677, '
        '"adjusted": {"q_two": 99.0}, "adjusted_total": 2.81, "sf": 0.1}'
    )
    p2 = tmp_path / "tail_cut.json"
    p2.write_text(json.dumps({"tail": cut}))
    rec2 = bd.load_record(str(p2))
    assert rec2["queries"] == {"q_two": 0.5}
    assert rec2["canary_factor"] == 1.0677


def test_bench_diff_flag_streak_counter():
    """r11 (r10 verdict task 2): chronic-flag streaks advance on a
    flag, reset on a clean comparison, and ignore absent names."""
    import bench_diff as bd

    orig = bd.load_flags

    def fake_flags():
        return {
            "chronic": {"rounds_running": 2, "last_flag": "BENCH_r10.json"},
            "recovered": {"rounds_running": 1, "last_flag": "BENCH_r10.json"},
            "absent": {"rounds_running": 4, "last_flag": "BENCH_r09.json"},
        }

    bd.load_flags = fake_flags
    try:
        out = bd.update_flags(
            ["chronic", "fresh"],
            compared={"chronic", "fresh", "recovered"},
            label="BENCH_r11.json",
        )
    finally:
        bd.load_flags = orig
    assert out["chronic"]["rounds_running"] == 3  # escalation bar
    assert out["fresh"]["rounds_running"] == 1
    assert "recovered" not in out  # compared clean -> reset & pruned
    assert out["absent"]["rounds_running"] == 4  # no evidence either way


def test_fanout_audit_tree_classifier():
    """Unit-pin the Generate-over-unshuffled-scan detector on
    synthetic plan trees: a fan-out straight off a relation counts; a
    fan-out whose path to the relation crosses a shuffle-introducing
    node (Repartition — the widen guard's footprint, or Aggregate)
    does not; a Generate above BOTH a guarded and an unguarded branch
    counts once (first reachable relation wins per child)."""
    from fanout_audit import build_tree, count_scan_fanouts

    def n(cls, *children):
        return {
            "class": f"org.apache.spark.sql.catalyst.plans.logical.{cls}",
            "num-children": len(children),
            "_children": list(children),
        }

    rel = n("LogicalRelation")
    # explode straight over the scan: flagged
    assert count_scan_fanouts(n("Generate", rel)) == 1
    # widen's Repartition between explode and scan: clean
    assert count_scan_fanouts(n("Generate", n("Repartition", rel))) == 0
    # aggregate boundary: clean
    assert count_scan_fanouts(n("Generate", n("Aggregate", rel))) == 0
    # project/filter are pass-through: still flagged
    assert (
        count_scan_fanouts(n("Generate", n("Project", n("Filter", rel)))) == 1
    )
    # two stacked generates over one scan: both flagged
    assert (
        count_scan_fanouts(n("Generate", n("Generate", rel))) == 2
    )
    # flat toJSON order reconstructs the same tree
    flat = [
        {
            "class": "org.apache.spark.sql.catalyst.plans.logical.Generate",
            "num-children": 1,
        },
        {
            "class": "org.apache.spark.sql.catalyst.plans.logical.Repartition",
            "num-children": 1,
        },
        {
            "class": (
                "org.apache.spark.sql.execution.datasources.LogicalRelation"
            ),
            "num-children": 0,
        },
    ]
    root, _ = build_tree(flat)
    assert count_scan_fanouts(root) == 0
