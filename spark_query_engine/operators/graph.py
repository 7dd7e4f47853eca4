"""Graph analytics over pair relations (near-dup candidate graphs,
interaction graphs): iterative PageRank.

Complements ``dedup.connected_components`` (which labels clusters)
with a CENTRALITY signal — which node in a duplicate cluster is the
canonical one, which document a crawl graph keeps linking back to.
Same distributed shape as CC: a persisted symmetric edge relation,
one equi-join + one aggregation per round, lineage truncated with
``localCheckpoint``. No driver-side loop over data — only the scalar
node count crosses to the driver (the damping constant's 1/N term).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    iterations: int = 5,
    damping: float = 0.85,
    round_decimals: int = 9,
) -> DataFrame:
    """PageRank on the UNDIRECTED graph of ``pairs`` (each pair
    contributes both directions). Fixed ``iterations`` rounds of

        pr'(v) = (1-d)/N + d * Σ_{u~v} pr(u)/deg(u)

    with every round's ranks ROUNDed to ``round_decimals`` — the
    repo's iterative float discipline (see kmeans_fit): rounding
    between rounds pins the running state to values every engine
    agrees on, so an unrolled SQL replay matches bit-for-bit.

    Per round: edges ⋈ ranks (equi-join on the node id both relations
    are already hash-partitioned by) + one sum-aggregation on the
    destination id. Edge+degree relation persists once; each round's
    ranks persist and the previous round unpersists; symmetric edges
    mean every node receives a contribution, so no dangling-mass
    term is needed.

    Returns (id, pr) for every node in ``pairs``.
    """
    e = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # persist the symmetric edges FIRST: pairs is usually a lazy
    # candidate-generation DAG (shingles → signatures → band join), and
    # without this both deg and ed would re-run that whole pipeline
    sym = e.union(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).persist()
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    ed = sym.join(deg, "u").select("u", "v", "deg").persist()

    n = deg.count()  # scalar model state, as in any iterative job
    # derive (1-d)/N from the same /1000 rational the SQL oracle
    # writes literally: (1.0-0.85)/n is 0.15000000000000002/n, one ULP
    # above the oracle's 0.15/n — a divergence feeding the per-round
    # rounded state (the repo's pinned-state float discipline)
    base = round(1000.0 - damping * 1000.0) / 1000.0 / n
    ranks = deg.select("u", F.lit(1.0 / n).alias("pr")).persist()
    for i in range(iterations):
        new = (
            ed.join(ranks, "u")
            .groupBy(F.col("v").alias("u"))
            .agg(
                F.round(
                    F.lit(base)
                    + F.lit(damping) * F.sum(F.col("pr") / F.col("deg")),
                    round_decimals,
                ).alias("pr")
            )
        )
        if i % 5 == 4 or i == iterations - 1:
            # eager localCheckpoint stores the round's blocks AND
            # truncates lineage — no extra persist() handle to leak
            # (the final round always checkpoints, so every cache
            # below can be dropped before returning)
            new = new.localCheckpoint()
        else:
            new = new.persist()
            new.count()
        ranks.unpersist()
        ranks = new
    sym.unpersist()
    ed.unpersist()
    return ranks.select(F.col("u").alias("id"), "pr")


def personalized_pagerank(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    seed_mod: int = 5,
    iterations: int = 5,
    damping: float = 0.85,
    round_decimals: int = 9,
) -> DataFrame:
    """Personalized PageRank (Jeh & Widom 2003) on the undirected graph
    of ``pairs``: the teleport mass restarts at a SEED set (here the
    nodes with ``id % seed_mod == 0`` — a deterministic stand-in for
    "trusted domains" / curated crawl seeds) instead of spreading
    uniformly:

        pr'(v) = (1-d)/|S| * [v in S] + d * Σ_{u~v} pr(u)/deg(u)

    The result ranks every node by its random-walk proximity to the
    seeds — the seeded-crawl / TrustRank-style corpus-selection signal
    (docs tightly linked to trusted seeds score high; isolated spam
    clusters decay geometrically).

    Same distributed shape and float discipline as ``pagerank``: the
    symmetric edge+degree relation persists once, each round is one
    equi-join + one destination-keyed sum with the running state
    rounded to ``round_decimals``, lineage truncated per round. Only
    the seed COUNT crosses to the driver.

    Returns (id, is_seed, pr) for every node in ``pairs``.
    """
    e = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = e.union(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).persist()
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    ed = sym.join(deg, "u").select("u", "v", "deg").persist()

    seed = (F.col("u") % seed_mod == 0).cast("int")
    nodes = deg.select("u", seed.alias("is_seed")).persist()
    ns = nodes.where(F.col("is_seed") == 1).count()
    base = round(1000.0 - damping * 1000.0) / 1000.0 / ns
    ranks = nodes.select(
        "u", (F.col("is_seed") / F.lit(float(ns))).alias("pr")
    ).persist()
    for i in range(iterations):
        new = (
            ed.join(ranks, "u")
            .groupBy(F.col("v").alias("u"))
            .agg(
                F.sum(F.col("pr") / F.col("deg")).alias("mass")
            )
            .join(nodes, "u")
            .select(
                "u",
                F.round(
                    F.col("is_seed") * F.lit(base)
                    + F.lit(damping) * F.col("mass"),
                    round_decimals,
                ).alias("pr"),
            )
        )
        if i == iterations - 1:
            new = new.localCheckpoint()
        else:
            new = new.persist()
            new.count()
        ranks.unpersist()
        ranks = new
    sym.unpersist()
    ed.unpersist()
    nodes.unpersist()
    # derive the seed flag from the id itself — joining the (now
    # unpersisted) nodes relation back would re-run the whole pairs DAG
    return ranks.select(
        F.col("u").alias("id"),
        (F.col("u") % seed_mod == 0).cast("int").alias("is_seed"),
        "pr",
    )
