"""r12 task 3 refinement A/B on graph_triangle_count:

  C : committed r12 form (ed lazy-cut + broadcast closing)
  C2: C + explicit broadcast of the node-scale degree table in the
      orientation joins (the checkpoint leaf has no stats, so the
      planner falls back to SMJ there)
  E : C2 + broadcast of the e2 side of the wedge self-join (removes
      the oriented-edge Exchange; wedges generated map-side)

Usage: python tools/r12_tri_ab2.py [legs]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build(spark, variant: str):
    from spark_query_engine.operators import cut_lineage
    from spark_query_engine.queries import footer_rows, load
    from spark_query_engine.queries import training as T

    if variant == "C":
        return T.graph_triangle_count(spark, SF)
    li = load(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    ed = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    ed = cut_lineage(ed, eager=False)
    deg = (
        ed.select(F.explode(F.array("u", "v")).alias("n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = F.broadcast(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"))
    dv = F.broadcast(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"))
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
    if variant == "E":
        oriented = cut_lineage(oriented, eager=False)
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    right = F.broadcast(e2) if variant == "E" else e2
    wedges = e1.join(
        right,
        (F.col("e1.s") == F.col("e2.s")) & (F.col("e1.t") < F.col("e2.t")),
    ).select(F.col("e1.t").alias("x"), F.col("e2.t").alias("y"))
    closing = F.broadcast(
        ed.select(F.least("u", "v").alias("cx"), F.greatest("u", "v").alias("cy"))
    )
    tri = wedges.join(
        closing, (F.col("x") == F.col("cx")) & (F.col("y") == F.col("cy"))
    ).agg(F.count(F.lit(1)).alias("n_triangles"))
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.coalesce(F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("bigint"), F.lit(0)).alias("n_wedges"),
        (F.coalesce(F.sum("d"), F.lit(0)) / 2).cast("bigint").alias("n_edges"),
    )
    return stats.crossJoin(tri).select(
        "n_nodes", "n_edges", "n_wedges", "n_triangles",
        F.when(F.col("n_wedges") == 0, F.lit(0.0))
        .otherwise(F.round(3.0 * F.col("n_triangles") / F.col("n_wedges"), 6))
        .alias("transitivity"),
    )


def main() -> None:
    legs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    from spark_query_engine.session import get_session

    spark = get_session("r12_tri_ab2")
    variants = ("C", "C2", "E")
    for v in variants:
        build(spark, v).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
    times = {v: [] for v in variants}
    for _ in range(legs):
        for v in variants:
            t0 = time.time()
            build(spark, v).write.format("noop").mode("overwrite").save()
            times[v].append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
    for v, r in times.items():
        print(v, "min", min(r), "runs", r)
    rows = {v: build(spark, v).collect() for v in variants}
    print("rows equal:", all(rows[v] == rows["C"] for v in variants))


if __name__ == "__main__":
    main()
