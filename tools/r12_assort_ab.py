"""r12 task: graph_assortativity restructure A/B.

A: current code (two edge-scale degree joins + dd count + ne pass)
B: moments off the degree table (mm=Σd, sx=Σd², sxx=Σd³, ne=Σd/2 —
   node-scale) and sxy via ONE edge-scale join:
   sxy = Σ_u d(u)·(Σ_{v∈N(u)} d(v)). Integer sums are associative,
   so every moment is the same exact integer as in A.

Usage: python tools/r12_assort_ab.py [legs]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_B(spark):
    from spark_query_engine.queries import load

    li = load(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    a, b = li.alias("a"), li.alias("b")
    ed = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
        .persist()
    )
    sym = ed.unionByName(ed.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    ).persist()
    # one edge-scale join: neighbor-degree sums per node
    s = (
        sym.join(deg.select(F.col("node").alias("v"), F.col("d").alias("dy")), "v")
        .groupBy("u")
        .agg(F.sum("dy").cast("bigint").alias("sdy"))
    )
    sxy = (
        s.join(deg.select(F.col("node").alias("u"), "d"), "u")
        .agg(
            F.sum(F.col("d").cast("decimal(38,0)") * F.col("sdy"))
            .cast("bigint")
            .alias("sxy")
        )
    )
    m = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.sum("d").cast("bigint").alias("mm"),
        (F.sum("d").cast("bigint") / 2).cast("bigint").alias("n_edges"),
        F.sum(F.col("d").cast("decimal(38,0)") * F.col("d")).cast("bigint").alias("sx"),
        F.sum(
            F.col("d").cast("decimal(38,0)") * F.col("d") * F.col("d")
        ).cast("bigint").alias("sxx"),
    )
    return (
        m.crossJoin(F.broadcast(sxy))
        .select(
            "n_nodes",
            "n_edges",
            (
                F.floor(
                    F.lit(1000000.0)
                    * (
                        (
                            F.col("mm").cast("decimal(38,0)") * F.col("sxy")
                            - F.col("sx").cast("decimal(38,0)") * F.col("sx")
                        ).cast("double")
                        / (
                            F.col("mm").cast("decimal(38,0)") * F.col("sxx")
                            - F.col("sx").cast("decimal(38,0)") * F.col("sx")
                        ).cast("double")
                    )
                    + 0.5
                )
                / 1000000.0
            ).alias("assortativity"),
        )
    )


def main() -> None:
    legs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    from spark_query_engine import queries as registry
    from spark_query_engine.session import get_session

    spark = get_session("r12_assort_ab")
    qs = registry.queries()

    def run(v):
        df = qs["graph_assortativity"](spark, SF) if v == "A" else build_B(spark)
        df.write.format("noop").mode("overwrite").save()

    for v in ("A", "B"):
        run(v)
        spark.catalog.clearCache()
    times = {"A": [], "B": []}
    for _ in range(legs):
        for v in ("A", "B"):
            t0 = time.time()
            run(v)
            times[v].append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
    for v, r in times.items():
        print(v, "min", min(r), "runs", r)
    ra = qs["graph_assortativity"](spark, SF).collect()
    rb = build_B(spark).collect()
    print("rows equal:", ra == rb, ra, rb)


if __name__ == "__main__":
    main()
