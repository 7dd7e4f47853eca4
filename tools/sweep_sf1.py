"""Standing sf1 value-equality sweep over the banded/blocked families
(r8 verdict task 6).

The per-round driver gate runs at sf0.01 and the bench at sf0.1 —
scales where every banded family resolves to its historical small-n
config, so a banding/blocking semantics drift that only shows at
larger n is invisible to both (the r8 ad-hoc sf1 checks caught exactly
such a miss in `corpus_contrastive_pairs`'s fixed-bucket negatives).
This tool promotes those checks to a standing sweep: run each family
representative on Spark AND its DuckDB oracle at a replica-scaled dir
(default ``.scaling_data/sf1``) and classify:

- ``MATCH``  — exact value equality (the dtype-strict driver mirror).
- ``SUBSET`` — engine rows are a proper multiset-subset of oracle
  rows: the documented probabilistic-recall trade of a banded
  candidate generator (MinHash S-curve misses; acceptable IF the
  query's docs price it). Reports missed-row counts so the trade
  stays measured, never silent.
- ``TRADE``  — a would-be MISS on a ``DERIVED_OF_BANDING`` name:
  aggregates/derived views of banded candidates where the banding
  miss surfaces as two-way value skew; adjudicated quantitatively
  (see the allowlist docstring) and priced by ``minhash_config``.
- ``MISS``   — anything else (engine rows absent from the oracle,
  value skew, schema drift): a defect, becomes a round task.

r10: SUBSET/TRADE at the default sf1 dir are additionally checked
against NUMERIC ENVELOPES (``SUBSET_ENVELOPES`` missed-row ranges,
``TRADE_ENVELOPES`` two-way diff bounds — both S-curve-derived, see
their docstrings); a trade outside its envelope reports MISS and
fails the sweep. The adjudication is asserted, not prose.

Only tables present in the dir are registered; queries touching
absent tables are reported ``SKIP``. Results are committed per round
in SCALING.md (grep "sf1 sweep").

Usage:  python tools/sweep_sf1.py [sf_dir] [query ...]
        python tools/sweep_sf1.py [sf_dir] --graph   # GRAPH_FAMILY set
        python tools/sweep_sf1.py [sf_dir] --events  # every events_* query
        python tools/sweep_sf1.py [sf_dir] --all     # banded + graph + events
"""

from __future__ import annotations

import sys
import time
import traceback
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from check_correctness import TABLES, compare, normalize  # noqa: E402

#: The banded / blocked / probabilistic-candidate families — every
#: query whose candidate generation involves banding, bucketing, or
#: blocking whose geometry is footer-sized from n (so its behavior at
#: sf1 differs from the driver scales).
BANDED_FAMILIES = [
    # MinHash-LSH banding
    "dedup_minhash",
    "dedup_minhash_highrecall",
    "dedup_threshold_sweep",
    "corpus_dedup_keep_best",
    "dedup_cluster_components",
    "corpus_contrastive_pairs",
    # SimHash pigeonhole bands (footer-sized width, r9)
    "dedup_simhash",
    # CP-LSH planes (footer-sized arity)
    "ann_cp_topk",
    "dedup_cp_band_balance",
    "dedup_embedding_cosine",
    "dedup_embedding_scaled",
    # random-hyperplane LSH (footer-sized plane count)
    "ann_lsh_topk",
    "ann_lsh_multiprobe_topk",
    # IVF (footer-sized nlist)
    "corpus_ivf_learned",
    "corpus_ivf_occupancy",
    "ann_ivf_topk",
    "ann_ivf_pq_topk",
    # k-means blocking (k ∝ n)
    "corpus_semdedup",
    "corpus_knn_classify",
    # prefix-banded containment / shingle joins
    "dedup_containment",
    "dedup_ngram_jaccard",
]

#: r11 (r10 verdict task 5): the iterative-graph family — sf3 timing
#: and round-count rows exist (SCALING.md 10d) but the r10 value sweep
#: covered only the banded families. These oracles are EXACT (no
#: banding anywhere in their candidate generation), so the expectation
#: is MATCH with no envelopes; any SUBSET/TRADE/MISS is a defect.
#: (dedup_cluster_components is NOT here — its input is banded MinHash
#: candidates, so it stays in BANDED_FAMILIES with its TRADE envelope;
#: graph_components_deep_chain is the exact-CC representative.)
GRAPH_FAMILY = [
    "corpus_graph_pagerank",
    "graph_ppr_seeds",
    "graph_kcore_peel",
    "graph_hits_bipartite",
    "graph_components_deep_chain",
    "graph_link_prediction",
    "graph_linkpred_eval",
    "graph_triangle_count",
    "graph_triangle_sampled",
]


def events_family() -> list[str]:
    """Every registered events_* query — the time-series/sessionization
    plane (r11: third family in the sf1 value sweep; exact oracles,
    MATCH expected, 43/43 on first run — SCALING.md 11g). Derived from
    the registry so new events queries join the sweep automatically."""
    from spark_query_engine import queries as registry

    return [n for n in registry.queries() if n.startswith("events_")]


#: Queries whose output is an AGGREGATE or DERIVED view of MinHash
#: banding candidates: a banding miss surfaces as value skew (rows
#: differing BOTH ways), not a row subset, so the multiset check
#: cannot classify it SUBSET. Each entry carries the r9 adjudication:
#: at sf1 the oracle's exact j≥0.6 pair set is 602 pairs with a
#: measured j-histogram whose 16/4 S-curve expectation is 490.7 hits —
#: the engine candidates number exactly 490 (SCALING.md "minhash
#: recall grid"), so every diff below derives from those 112 missed
#: mid-j pairs, priced by ``minhash_config`` (0.99 recall at j=0.6 →
#: (136, 34) recalls an expected 601.2/602). A MISS on these names is
#: reported TRADE and does not fail the sweep; a CHANGE in its diff
#: counts vs the committed per-round record is still a task.
DERIVED_OF_BANDING = {
    "dedup_threshold_sweep": "per-threshold pair counts over banded candidates",
    "corpus_dedup_keep_best": "representative election over banded components",
    "dedup_cluster_components": "connected components over banded pairs",
    # r11 full-registry sweep additions — all views over the same
    # banded MinHash candidate relation:
    "dedup_chain_recursive": "transitive duplicate chains over banded pairs",
    "dedup_source_attribution": "per-source rollup of banded pairs",
    "dedup_cluster_purity": "purity view over banded components",
    "pipeline_dedup_cascade": (
        "stage census over banded pairs — stage-2/3 survivor counts "
        "carry the missed-pair band; the stage-1 (exact) row is "
        "banding-free, so it must match, which the <=4 two-way row "
        "bound enforces (a stage-1 drift would make it 6)"
    ),
    "vec_text_alignment_audit": (
        "1-row aggregate of banded pairs (pair-count deficit asserted "
        "via AGG_DEFICIT_ENVELOPES)"
    ),
}


#: r11: 1-row AGGREGATES of the banded pair relation — the two-way
#: row-diff bound is vacuous (always 1+1), so the envelope asserts
#: the VALUE deficit on the named count column (oracle − engine must
#: land in [lo, hi] — the banded generator's missed-pair band) and
#: exact equality on every OTHER column (at this corpus the missed
#: mid-j pairs are never the cosine extremes; if that changes the row
#: reports MISS and the entry recalibrates).
AGG_DEFICIT_ENVELOPES: dict[str, tuple[str, int, int]] = {
    # measured deficit 28 of the 342 embedding-covered exact pairs —
    # the covered slice of the global [80, 142] missed-pair band
    "vec_text_alignment_audit": ("n_text_pairs", 0, 142),
}

#: r10 (r9 verdict task 4): the prose adjudications above, promoted to
#: ASSERTED numeric envelopes at the default sf1 replica corpus — a
#: growing trade now fails the sweep mechanically instead of passing
#: as an unchanged-by-eyeball TRADE/SUBSET label.
#:
#: SUBSET rows: allowed range of MISSED oracle rows. Derivation: the
#: sf1 exact j>=0.6 pair set is 602 pairs with measured j-histogram
#: {0.6:139, 0.7:79, 0.8:66, 0.9:48, 1.0:270} (SCALING.md r9c);
#: summing the 16/4 S-curve P=1-(1-j^4)^4 gives mean misses 111.3,
#: binomial std 7.7 -> +-4 sigma = [80, 142]. The (136, 34)
#: high-recall point has mean 0.8 missed, so [0, 6]. The contrastive
#: pairs view is driven by the SAME missed pairs -> same band.
#: (Measured r10: 112 / 1 / 112 — all inside.)
SUBSET_ENVELOPES: dict[str, tuple[int, int]] = {
    "dedup_minhash": (80, 142),
    "dedup_minhash_highrecall": (0, 6),
    "corpus_contrastive_pairs": (80, 142),
    # r11 full-registry sweep: bag-Jaccard verifies the SAME banded
    # candidate relation as dedup_minhash (set-shingle 16/4 LSH), so
    # its misses are the same mid-j candidate misses — measured 112
    # at the default sf1 corpus, identical to dedup_minhash's draw.
    # Same band, framed as shared-candidate calibration (bag-j and
    # set-j rank these pairs closely at the 0.6 threshold).
    "dedup_bag_jaccard": (80, 142),
}

#: TRADE rows: max TOTAL two-way diff (engine-extra + oracle-missing).
#: Two different justifications (r10 ADVICE: don't present the second
#: as a derivation — it isn't one):
#:
#: - ``dedup_threshold_sweep``: one row per threshold, so the whole
#:   surface is 12 — a true bound by construction.
#: - ``corpus_dedup_keep_best``: each doc elects one representative,
#:   so a missed pair perturbs at most the pair's own 2 rows — the
#:   2 × 142 = 284 bound is pair-derived and holds per-row.
#: - ``dedup_cluster_components``: NOT pair-derived. A single missed
#:   BRIDGE edge splits a component and relabels EVERY node of the
#:   split-off subcomponent, so the worst case is bounded by the max
#:   component size over the replica corpus, not by 2×pairs. 284 is
#:   MEASURED CALIBRATION on the default sf1 replica corpus (r9/r10
#:   measured two-way diff 155, stable across rounds because the
#:   replica corpus and the 16/4 banding are both deterministic); a
#:   legitimate corpus/banding change may trip the envelope and then
#:   the right action is recalibration, not a defect hunt. The
#:   envelope's job is to catch UNEXPLAINED growth on an unchanged
#:   corpus, which it still does.
#: (Measured r10: 6 / 115 / 155 — all inside.)
TRADE_ENVELOPES: dict[str, int] = {
    "dedup_threshold_sweep": 12,
    "corpus_dedup_keep_best": 284,
    "dedup_cluster_components": 284,
    # r11 full-registry sweep (measured calibration, same
    # 2-derived-rows-per-missed-pair ceiling as the components bound;
    # measured two-way diffs at the default sf1 corpus in brackets):
    # transitive chains over banded pairs — a missed bridge re-chains
    # a sub-chain, the components failure shape [144]
    "dedup_chain_recursive": 284,
    # per-source rollup of banded pairs — a missed pair perturbs at
    # most its two sources' rows [48]
    "dedup_source_attribution": 284,
    # purity view over banded components [123]
    "dedup_cluster_purity": 284,
    # 3-row stage census: only the stage-2 and stage-3 rows may
    # differ (each both ways) — the stage-1 exact-dedup row is
    # banding-independent and must be identical [4]
    "pipeline_dedup_cascade": 4,
}


def classify(spark_pdf, duck_pdf) -> tuple[str, str, int | None, int | None]:
    """MATCH / SUBSET / MISS with a one-line detail and the two-way
    diff counts (engine-extra, oracle-missing; None when the shapes
    don't even align)."""
    ok, msg = compare(spark_pdf, duck_pdf)
    if ok:
        return "MATCH", f"{len(spark_pdf)} rows", 0, 0
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return "MISS", msg, None, None
    try:
        a, b = normalize(spark_pdf), normalize(duck_pdf)
    except TypeError:
        return "MISS", msg, None, None
    if a.dtypes.to_dict() != b.dtypes.to_dict():
        return "MISS", msg, None, None
    # multiset containment on row tuples
    from collections import Counter

    ca = Counter(map(tuple, a.itertuples(index=False)))
    cb = Counter(map(tuple, b.itertuples(index=False)))
    extra = ca - cb
    missing = cb - ca
    n_extra, n_missing = sum(extra.values()), sum(missing.values())
    if not extra and missing:
        return (
            "SUBSET",
            (
                f"engine {len(a)} ⊂ oracle {len(b)} rows "
                f"(missed {n_missing} — banding recall trade)"
            ),
            n_extra,
            n_missing,
        )
    return (
        "MISS",
        (
            f"{n_extra} engine rows not in oracle, "
            f"{n_missing} oracle rows not in engine"
        ),
        n_extra,
        n_missing,
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else str(
        Path(__file__).resolve().parent.parent / ".scaling_data" / "sf1"
    )
    args = list(sys.argv[2:])
    if args == ["--graph"]:
        only = GRAPH_FAMILY
    elif args == ["--events"]:
        only = events_family()
    elif args == ["--all"]:
        only = BANDED_FAMILIES + GRAPH_FAMILY + events_family()
    else:
        only = args or BANDED_FAMILIES

    from spark_query_engine import queries as registry
    from spark_query_engine.session import get_session

    spark = get_session("sf1_sweep")

    present = [t for t in TABLES if Path(f"{sf_dir}/{t}.parquet").exists()]
    con = duckdb.connect()
    for t in present:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = registry.queries()
    oracles = registry.oracle_sql()
    counts = {"MATCH": 0, "SUBSET": 0, "MISS": 0, "SKIP": 0}
    for name in only:
        if name not in qs:
            print(f"SKIP {name}: not in registry")
            counts["SKIP"] += 1
            continue
        t0 = time.time()
        try:
            spark_pdf = qs[name](spark, sf_dir).toPandas()
        except Exception as e:
            first = str(e).splitlines()[0] if str(e) else type(e).__name__
            if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
                print(f"SKIP {name}: table absent from {sf_dir}")
                counts["SKIP"] += 1
            elif "UNRESOLVED_COLUMN" in str(e):
                # the replica generators emit only the columns the
                # scaling study reads (gen_scaling_*.py) — a query
                # touching other columns of a present table is a
                # replica-schema limitation, not a defect (r11: the
                # full-registry sf1 sweep hit ~70 of these on the
                # 2-column lineitem / pruned orders schemas)
                print(f"SKIP {name}: column absent from replica schema ({first:.90})")
                counts["SKIP"] += 1
            else:
                print(f"MISS {name}: spark error\n{traceback.format_exc()}")
                counts["MISS"] += 1
            continue
        finally:
            spark.catalog.clearCache()
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only: {len(spark_pdf)})")
            counts["SKIP"] += 1
            continue
        try:
            duck_pdf = con.sql(oracles[name]).df()
        except Exception as e:
            first = str(e).splitlines()[0] if str(e) else type(e).__name__
            if "No files found" in str(e) or "does not exist" in str(e):
                print(f"SKIP {name}: oracle table absent from {sf_dir}")
                counts["SKIP"] += 1
            elif "not found in FROM clause" in str(e) or (
                "Binder Error" in str(e) and "column" in str(e).lower()
            ):
                # replica-schema limitation, same class as the Spark
                # UNRESOLVED_COLUMN skip above
                print(f"SKIP {name}: column absent from replica schema ({first:.90})")
                counts["SKIP"] += 1
            else:
                print(f"MISS {name}: duckdb error: {first}")
                counts["MISS"] += 1
            continue
        status, msg, n_extra, n_missing = classify(spark_pdf, duck_pdf)
        if status == "MISS" and name in AGG_DEFICIT_ENVELOPES:
            col, lo, hi = AGG_DEFICIT_ENVELOPES[name]
            try:
                deficit = int(duck_pdf[col].iloc[0]) - int(
                    spark_pdf[col].iloc[0]
                )
                others_equal = compare(
                    spark_pdf.drop(columns=[col]),
                    duck_pdf.drop(columns=[col]),
                )[0]
            except Exception:
                deficit, others_equal = None, False
            if others_equal and deficit is not None and lo <= deficit <= hi:
                status = "TRADE"
                msg = (
                    f"{col} deficit {deficit} within [{lo}, {hi}], "
                    "other columns exact "
                    f"[derived of banding: {DERIVED_OF_BANDING[name]}]"
                )
            else:
                msg += (
                    f" [AGG DEFICIT ENVELOPE VIOLATION: {col} deficit "
                    f"{deficit}, others_equal={others_equal}]"
                )
        elif status == "MISS" and name in DERIVED_OF_BANDING:
            status = "TRADE"
            msg += f" [derived of banding: {DERIVED_OF_BANDING[name]}]"
        # r10: envelopes are calibrated to the default sf1 replica
        # corpus — assert them there; other dirs report raw classes
        if Path(sf_dir).name == "sf1":
            if status == "SUBSET" and name in SUBSET_ENVELOPES:
                lo, hi = SUBSET_ENVELOPES[name]
                if lo <= (n_missing or 0) <= hi:
                    msg += f" [within envelope [{lo}, {hi}]]"
                else:
                    status = "MISS"
                    msg += (
                        f" [ENVELOPE VIOLATION: missed {n_missing} "
                        f"outside [{lo}, {hi}] — the trade GREW]"
                    )
            elif status == "TRADE" and name in TRADE_ENVELOPES:
                bound = TRADE_ENVELOPES[name]
                total = (n_extra or 0) + (n_missing or 0)
                if total <= bound:
                    msg += f" [two-way diff {total} <= envelope {bound}]"
                else:
                    status = "MISS"
                    msg += (
                        f" [ENVELOPE VIOLATION: two-way diff {total} "
                        f"> {bound} — the trade GREW]"
                    )
            elif (
                status in ("SUBSET", "TRADE")
                and name not in AGG_DEFICIT_ENVELOPES
            ):
                # a NEW banded query reaching sf1 without an envelope
                # entry is itself a finding — flag it loudly (still
                # non-fatal: the next round must calibrate it)
                msg += " [NO ENVELOPE CALIBRATED — add one]"
        counts[status] = counts.get(status, 0) + 1
        print(f"{status} {name}: {msg} ({time.time()-t0:.1f}s)")

    print(
        f"\nsf1 sweep @ {sf_dir}: "
        f"{counts['MATCH']} MATCH, {counts['SUBSET']} SUBSET, "
        f"{counts.get('TRADE', 0)} TRADE, "
        f"{counts['MISS']} MISS, {counts['SKIP']} SKIP"
    )
    return 1 if counts["MISS"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
