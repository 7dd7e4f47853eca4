"""r12 task 3 A/B: graph_triangle_count closing-join strategy.

Variants of the closing-edge join (the wedge-scale Exchange):
  A: current code (shuffled SMJ/SHJ of the O(m^1.5) wedge relation
     against the edge relation on (x, y))
  B: broadcast the closing edge relation -> the wedge relation is
     never shuffled for the closing join (guide section 3.1/3.2: the
     small side is the edge set, the big side is the wedges)
  C: B plus an eager lineage cut on `ed` so the edge subtree
     (lineitem self-join + distinct) is computed once instead of
     being re-planned under deg/oriented/closing.

Alternating legs (A B C A B C ...), min per variant, same session.

Usage: SPARK_GRAFT_SF_DIR=... python tools/r12_tri_ab.py [legs_per_variant]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def build(spark, sf_dir, variant: str):
    from spark_query_engine.operators import cut_lineage
    from spark_query_engine.queries import footer_rows, load
    from spark_query_engine.queries.training import (
        _oriented_triangles,
        _session_shuffle_parts,
    )

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    ed = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .distinct()
    )
    if variant == "C":
        ed = cut_lineage(ed, eager=False)
    deg = (
        ed.select(F.explode(F.array("u", "v")).alias("n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    li_rows = footer_rows(spark, sf_dir, "lineitem")
    session_parts = _session_shuffle_parts(spark)
    wp = max(session_parts, min(4096, (li_rows * 128) // 6_000_000))
    if variant == "A":
        tri = _oriented_triangles(ed, deg, wp, session_parts)
    else:
        # inline of _oriented_triangles with a broadcast closing side
        du = deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du")
        dv = deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv")
        oriented = (
            ed.join(du, "u")
            .join(dv, "v")
            .select(
                F.when(
                    (F.col("du") < F.col("dv"))
                    | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                    F.struct(F.col("u").alias("s"), F.col("v").alias("t")),
                )
                .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("t")))
                .alias("e")
            )
            .select("e.s", "e.t")
        )
        if wp > session_parts:
            oriented = oriented.repartition(wp, "s")
        e1, e2 = oriented.alias("e1"), oriented.alias("e2")
        wedges = e1.join(
            e2,
            (F.col("e1.s") == F.col("e2.s")) & (F.col("e1.t") < F.col("e2.t")),
        ).select(F.col("e1.t").alias("x"), F.col("e2.t").alias("y"))
        closing = ed.select(
            F.least("u", "v").alias("cx"), F.greatest("u", "v").alias("cy")
        )
        tri = wedges.join(
            F.broadcast(closing),
            (F.col("x") == F.col("cx")) & (F.col("y") == F.col("cy")),
        ).agg(F.count(F.lit(1)).alias("n_triangles"))
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.coalesce(
            F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("bigint"),
            F.lit(0),
        ).alias("n_wedges"),
        (F.coalesce(F.sum("d"), F.lit(0)) / 2)
        .cast("bigint")
        .alias("n_edges"),
    )
    return stats.crossJoin(tri).select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.when(F.col("n_wedges") == 0, F.lit(0.0))
        .otherwise(
            F.round(3.0 * F.col("n_triangles") / F.col("n_wedges"), 6)
        )
        .alias("transitivity"),
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    legs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    from spark_query_engine.session import get_session

    spark = get_session("r12_tri_ab")
    # warmup both paths' codegen
    for v in ("A", "B", "C"):
        build(spark, sf_dir, v).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
    times: dict[str, list[float]] = {"A": [], "B": [], "C": []}
    for _ in range(legs):
        for v in ("A", "B", "C"):
            t0 = time.time()
            build(spark, sf_dir, v).write.format("noop").mode("overwrite").save()
            times[v].append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
    for v, r in times.items():
        print(v, "min", min(r), "runs", r)
    # value check: all variants agree
    rows = {v: build(spark, sf_dir, v).collect() for v in ("A", "B", "C")}
    print("rows equal:", rows["A"] == rows["B"] == rows["C"], rows["A"])


if __name__ == "__main__":
    main()
