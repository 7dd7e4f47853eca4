"""Query registry — the driver-facing catalog of implemented operators.

Every operator from SURVEY.md §2 (and every beyond-parity operator)
registers here as a named query: a callable ``(spark, sf_dir) ->
DataFrame`` plus, where SQL-expressible, a DuckDB oracle string over
the same parquet tables. ``__spark_entry__.py`` re-exports this
registry to the driver.

Float discipline: aggregate/derived float columns are ROUNDed in BOTH
the Spark query and the oracle — cross-engine summation order differs
in the last bits, and the driver compares order-insensitive value
hashes, not approximate values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle`` is DuckDB SQL over the pre-registered
    table views (region nation customer supplier part orders lineitem
    events documents embeddings), or None for non-SQL-expressible ops."""

    def deco(fn):
        # duplicate registration silently shadows the earlier (often
        # already-driver-verified) implementation — make it loud
        if name in REGISTRY:
            raise ValueError(
                f"query {name!r} already registered by "
                f"{REGISTRY[name].fn.__module__}; pick a new name"
            )
        REGISTRY[name] = Query(name, fn, oracle)
        return fn

    return deco


#: Oracle-side rewrite of the ``events`` view: the raw parquet carries
#: TIMESTAMP(NANOS); Spark reads it via nanosAsLong + µs truncation (see
#: ``load``), and DuckDB must truncate identically. Use as
#: ``f"({EVENTS_ORACLE}) e"`` or a CTE in oracle SQL.
EVENTS_ORACLE = (
    "SELECT event_id, CAST(date_trunc('microseconds', ts) AS TIMESTAMP) AS ts, "
    "user_id, event_type, value, props FROM events"
)


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read a testdata table; filters/projections applied by callers push
    down into this parquet scan via Catalyst.

    ``events.ts`` has shipped as parquet TIMESTAMP(NANOS) in some
    testdata generations and TIMESTAMP(MICROS, isAdjustedToUTC=false)
    in others, so the loader adapts to what the file actually stores:
    NANOS is read as long ns (legacy nanosAsLong) and rebuilt as
    ``timestamp_ntz`` truncated to microseconds; MICROS already infers
    as ``timestamp_ntz`` (truncation is a no-op). Either way callers
    and the oracle's ``date_trunc('microseconds', ts)`` see identical
    session-TZ-independent values.
    """
    if table == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        raw = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        ts_type = raw.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):  # TIMESTAMP(NANOS) via legacy long
            return raw.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, ts DIV 1000, TIMESTAMP_NTZ'1970-01-01 00:00:00')"
                ),
            )
        if isinstance(ts_type, T.TimestampType):
            # session is pinned UTC (get_session), so the wall values
            # match the NTZ reading of the same micros
            return raw.withColumn("ts", raw["ts"].cast("timestamp_ntz"))
        return raw  # already timestamp_ntz
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def footer_rows(spark: SparkSession, sf_dir: str, table: str) -> int:
    """Row count of a testdata table from PARQUET FOOTER METADATA —
    milliseconds, no Spark job — for queries that size a knob from n
    (k ∝ n blocking, shuffle widths, GEMM tile grids). Falls back to
    a (metadata-optimized) count for directory layouts. This is the
    ``graph_triangle_count`` footer-sizing pattern, shared."""
    try:
        import pyarrow.parquet as _papq

        return int(
            _papq.ParquetFile(f"{sf_dir}/{table}.parquet").metadata.num_rows
        )
    except Exception:
        return load(spark, sf_dir, table).count()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


_LOADED = False

#: Family priority for the driver-verification window. The driver's
#: CORRECTNESS gate checks only the FIRST ~50 registry entries per
#: round, so ordering is a verification-coverage decision: queries with
#: no driver-green row yet go first, and everything a past round
#: already verified rotates to the back. Within the unverified prefix
#: the families (= registration modules) are ROUND-ROBIN interleaved —
#: one query per family per cycle — so even when the unverified
#: backlog exceeds the window, every family gets driver-green
#: representatives each round instead of whole families (r01: all of
#: dedup/ANN/text/events) waiting behind a long block. Driven by the
#: committed CORRECTNESS_r*.json files, so each round's greens
#: automatically free window slots for the next round.
_MODULE_PRIORITY = (
    "dedup",
    "similarity",
    "curation",
    "semantic",
    "text",
    "multimodal",
    "events",
    "pipeline",
    "tpch_suite",
    "analytics",
    "advanced",
    "extended",
    "parity",
    "relational",
)


def _family_rank(name: str) -> int:
    q = REGISTRY.get(name)
    mod = (q.fn.__module__ if q else "").rsplit(".", 1)[-1]
    try:
        return _MODULE_PRIORITY.index(mod)
    except ValueError:
        return len(_MODULE_PRIORITY)  # new module: after known families


def _driver_green_rounds() -> dict[str, int]:
    """For each name with a green row (hash_match, or rows-only for
    no-oracle queries) in any committed CORRECTNESS_r*.json at the
    repo root: the NEWEST round number that signed it. The round
    number drives the r9 stale-row rotation — verified names sort
    oldest-signature-first so the driver's ~50-entry window re-signs
    the stalest third of the registry every round without a
    hand-maintained pin list."""
    import json
    import re
    from pathlib import Path

    latest: dict[str, int] = {}
    root = Path(__file__).resolve().parents[2]
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", p.name)
        rnd = int(m.group(1)) if m else 0
        try:
            rows = json.loads(p.read_text())
        except Exception:
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            green = row.get("hash_match") is True or (
                row.get("err") == "no_oracle" and row.get("spark_rows") is not None
            )  # rows-only is the strongest check a no-oracle query gets
            if green:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def _driver_verified() -> set[str]:
    return set(_driver_green_rounds())


#: Names the round-3 verdict called out by name as must-verify this
#: round (the round-3b/3c families that otherwise sit past the ~50
#: window). They are pinned to the very front of the unverified prefix
#: (in this order) so the driver window cannot round-robin them out;
#: once a name earns a green CORRECTNESS row it leaves the unverified
#: set and this pin becomes a no-op.
_WINDOW_FIRST: tuple[str, ...] = (
    # (r8's 8 never-driver-signed names all landed green in
    # CORRECTNESS_r08 — pruned r9 per the standing drop rule. With
    # every registry entry driver-signed, new entries here should be
    # rare; the r9 stale-row rotation below keeps old signatures
    # fresh automatically.)
)

#: Queries whose implementation was REWRITTEN after their last green
#: driver row, so the committed evidence predates the code now
#: running (the round-4 CP-LSH / star-CC rewrites; the round-5
#: integer-moment conversions). Unlike _WINDOW_FIRST these pin to the
#: front EVEN THOUGH _driver_verified() contains them — the round-4
#: verdict (task 4) wants fresh driver rows under the current code.
#: Drop a name once a CORRECTNESS round NEWER than its rewrite lands.
_REPIN_REWRITTEN = (
    # (r4/r5 rewrites re-verified green in CORRECTNESS_r05, pruned r6;
    # the r6 signed-zero/covariance trio re-verified green in
    # CORRECTNESS_r06, pruned r7 — the docstring's own drop rule.)
    # (r7 rewrites — semdedup k ∝ n, embedding-cosine tiled GEMM —
    # re-verified green in CORRECTNESS_r07 rows 1-2, pruned r8: the
    # docstring's own drop rule.)
    # (r8 rewrites — GEMM assignment substrate, two-pass ntile rank,
    # shingle-family CSE fix, footer-sized knn/contrastive/winnow —
    # all re-verified green in CORRECTNESS_r08, pruned r9: the
    # docstring's own drop rule.)
    # (r9 rewrites — footer-sized simhash bands, the global_rank
    # offsets window + its five callers, the BPE _bpe_pair_winner
    # factoring, aHash multi-index groups — all re-verified green in
    # CORRECTNESS_r09, pruned r10: the docstring's own drop rule.
    # The r10 aHash d>=4 guard and banding validation change no
    # registered query's plan or values — defaults untouched — so
    # nothing re-pins this round; dedup_minhash_highrecall is NEW and
    # enters the window through the unverified prefix instead.)
    #
    # r11: the degree-oriented wedge core of graph_triangle_count was
    # FACTORED into _oriented_triangles so the new DOULION-sampled
    # tier shares it — the plan is unchanged by construction, but the
    # signed evidence (r3, re-signed r9) predates the refactor, so it
    # re-signs under the current code per the standing rule.
    "graph_triangle_count",
    # r11: the ×32 replicate fan-out now spreads to session width
    # before the explode (the sf3 rows caught it serialized onto the
    # scan's 5 byte-sized splits — flat 29 s sf1→sf3, cores idle;
    # 3.5 s after). Values are placement-independent (integer-exact
    # per-(row, replicate) weights), but the plan changed, so it
    # re-signs under the current code.
    "stats_poisson_bootstrap",
    # r11: the plan-level fan-out audit (tools/fanout_audit.py — the
    # 11c defect class made mechanical) found 20 Generate-over-
    # unshuffled-scan sites; these ten queries gained the standing
    # `widen` guard in front of their per-row-expensive explodes
    # (values placement-independent — all re-verified against their
    # oracles at sf0.01 the same session), but the plans changed, so
    # they re-sign under the current code. (winnow_fingerprint's
    # widen was REVERTED on measurement — its Arrow substrate is
    # already zero-shuffle — so it does not re-pin.)
    "corpus_span_dedup",
    "corpus_dup_span_removal",
    "pipeline_pretraining_full",
    "pipeline_rag_index",
    "corpus_bpe_tokenize",
    "corpus_bpe_fertility",
    "corpus_chunk_sliding",
    "corpus_ngram_topk",
    "ann_hybrid_search",
    # r11: the full-registry sf1 value sweep's two defect fixes
    # (SCALING.md 11h) — lgConfigK=16 HLL sketches and the 6dp
    # floor-half-up percentile-bound pinning — change these queries'
    # plans AND oracles; the cascade's oracle gained a counts-CTE
    # materialization (values identical, text changed). All
    # re-verified at sf0.01 + sf1 the same session; they re-sign
    # under the current code per the standing rule.
    "corpus_sketch_merge",
    "data_sketch_time_rollup",
    "stats_winsorized_mean",
    "pipeline_dedup_cascade",
)


def _reorder_registry() -> None:
    green_rounds = _driver_green_rounds()
    verified = set(green_rounds)
    order = list(REGISTRY.items())

    pinned = [n for n in _REPIN_REWRITTEN if n in REGISTRY]
    pinned += [
        n
        for n in _WINDOW_FIRST
        if n in REGISTRY and n not in verified and n not in pinned
    ]

    # Group the remaining unverified names by family, families in
    # priority order, queries within a family in registration order.
    groups: dict[int, list[str]] = {}
    for name, _q in order:
        if name not in verified and name not in pinned:
            groups.setdefault(_family_rank(name), []).append(name)

    ordered: list[str] = list(pinned)
    # Two phases: the KNOWN families (the round-2 backlog the verdict
    # ordered verified first) round-robin into the window; modules
    # outside _MODULE_PRIORITY (this round's additions) append AFTER —
    # new work must not displace the older never-driver-checked
    # queries from the ~50-entry window.
    known_rank = len(_MODULE_PRIORITY)
    for phase in (
        sorted(r for r in groups if r < known_rank),
        sorted(r for r in groups if r >= known_rank),
    ):
        queues = [groups[r] for r in phase]
        while queues:
            for q in queues:
                ordered.append(q.pop(0))
            queues = [q for q in queues if q]

    # r9 stale-row rotation (verdict task 5): verified names follow,
    # OLDEST driver signature first (ties break by registration
    # order), so whatever window space remains after the pins and the
    # unverified backlog re-signs the registry's stalest rows; each
    # round's CORRECTNESS file pushes the re-signed names back, and
    # the next-stalest rotate in by themselves.
    reg_pos = {name: i for i, (name, _q) in enumerate(order)}
    ordered.extend(
        sorted(
            (name for name, _q in order if name in verified and name not in pinned),
            key=lambda n: (green_rounds[n], reg_pos[n]),
        )
    )
    by_name = dict(order)
    REGISTRY.clear()
    for name in ordered:
        REGISTRY[name] = by_name[name]


def _ensure_loaded() -> None:
    """Import all query modules (they self-register via @query)."""
    global _LOADED
    if _LOADED:
        return
    from spark_query_engine.queries import (  # noqa: F401
        parity,
        relational,
        analytics,
        advanced,
        extended,
        tpch_suite,
        pipeline,
        dedup,
        similarity,
        text,
        multimodal,
        events,
        curation,
        semantic,
        training,
    )

    _reorder_registry()
    _LOADED = True
