"""Measured MinHash banding recall grid (r8 verdict task 3 — the
cp_curve analog for the MinHash family).

For a replica-scaled corpus, computes the EXACT Jaccard pair set once
(shingle equi-join — every pair sharing ≥1 shingle, exact |∩|/|∪|),
then for each (num_hashes, bands) config measures what the banded
candidate join actually recalls at each Jaccard threshold, plus the
candidate volume the config pays for it. Output is the markdown grid
committed in SCALING.md ("minhash recall grid"), which is what makes
the documented mid-j recall trade a PRICED, SELECTABLE point
(``operators.dedup.minhash_config``) instead of a fixed 16/4 setting.

Usage:  python tools/minhash_curve.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

THRESHOLDS = [0.5, 0.6, 0.7, 0.8, 0.95]

#: (num_hashes, bands) grid points: the historical fixed config, the
#: same hash budget banded finer, and the minhash_config picks for
#: recall 0.75 / 0.9 / 0.99 at j=0.6.
GRID = [(16, 4), (16, 8), (32, 8), (40, 10), (68, 17), (136, 34)]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else str(
        Path(__file__).resolve().parent.parent / ".scaling_data" / "sf0.3"
    )

    from spark_query_engine.operators import dedup as D
    from spark_query_engine.queries import load
    from spark_query_engine.session import get_session

    spark = get_session("minhash_curve")
    docs = load(spark, sf_dir, "documents")

    sh = D.word_shingles(docs, "doc_id", "text", 3).persist()

    # exact Jaccard for every pair sharing >= 1 shingle (the full
    # ground truth — anything below that shares nothing and has j=0)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    exact = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "na"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "nb"), "id_b")
        .select(
            "id_a", "id_b",
            (F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))).alias("j"),
        )
        .where(F.col("j") >= min(THRESHOLDS))
        .persist()
    )
    truth = {t: exact.where(F.col("j") >= t).count() for t in THRESHOLDS}
    print(f"corpus: {sf_dir}")
    print("true pair counts:", {t: truth[t] for t in THRESHOLDS})

    print(
        "\n| hashes | bands | rows | candidates | "
        + " | ".join(f"recall@j≥{t}" for t in THRESHOLDS)
        + " | sec |"
    )
    print("|---|---|---|---|" + "---|" * len(THRESHOLDS) + "---|")
    for h, bands in GRID:
        t0 = time.time()
        sig = D.minhash_signatures(sh, h).persist()
        cand = D.lsh_candidate_pairs(sig, h, bands).persist()
        n_cand = cand.count()
        hit = cand.join(exact, ["id_a", "id_b"]).persist()
        recalls = []
        for t in THRESHOLDS:
            got = hit.where(F.col("j") >= t).count()
            recalls.append(f"{got}/{truth[t]} ({got / max(1, truth[t]):.2f})")
        dt = time.time() - t0
        print(
            f"| {h} | {bands} | {h // bands} | {n_cand} | "
            + " | ".join(recalls)
            + f" | {dt:.1f} |"
        )
        hit.unpersist()
        cand.unpersist()
        sig.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
