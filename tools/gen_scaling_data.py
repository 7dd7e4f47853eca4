"""Synthesize sf>=1 inputs for the scaling study (SCALING.md §ceiling).

The driver testdata stops at sf0.1; this generator weak-scales it by
replication with structure-preserving perturbation, producing ONLY the
columns the three ceiling queries read:

- ``lineitem(l_orderkey, l_partkey)`` — REPLICA r shifts both keys by
  r * (max+1): each replica is a disjoint copy of the co-purchase
  graph, so degree distribution, wedge counts, and triangle counts all
  scale exactly linearly — the known ground truth the measurement is
  checked against.
- ``documents(doc_id, text, lang, source, n_chars)`` — replica r
  offsets doc_id and rewrites ~30% of tokens to replica-salted
  placeholders (md5-deterministic). Token/length statistics and each
  replica's INTERNAL near-dup structure are preserved, while replicas
  of the same doc are NOT near-dups of each other — so qualifying-pair
  counts and cluster sizes scale linearly instead of exploding into
  ×replica cliques.

- ``embeddings(vec_id, embedding, label)`` — replica r applies a
  PER-REPLICA RANDOM ORTHOGONAL ROTATION Q_r (seeded QR of a gaussian;
  Q_0 = identity) to every vector: rotations preserve all norms and
  pairwise cosines WITHIN a replica (internal near-dup structure,
  cluster geometry, and recall targets carry over exactly from sf0.1),
  while cross-replica cosines become ~N(0, 1/d) background noise — so
  near-dup pair counts and cluster populations scale linearly instead
  of every vector gaining replicas-1 exact twins (the failure that
  excluded vector queries from the round-5 scaling study).

Usage: python tools/gen_scaling_data.py [out_root]
Writes {out_root}/sf0.3 and {out_root}/sf1 (default
/root/repo/.scaling_data — gitignored; ~10x sf0.1 at sf1).
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def perturb(text: str, r: int, doc_id: int, p_num: int = 3, p_den: int = 10) -> str:
    if r == 0:
        return text
    toks = text.split(" ")
    out = []
    for i, t in enumerate(toks):
        h = int(
            hashlib.md5(f"sc:{r}:{doc_id}:{i}".encode()).hexdigest()[:8], 16
        )
        if h % p_den < p_num:
            out.append(f"tk{h % 99991}")
        else:
            out.append(t)
    return " ".join(out)


def gen(out_root: Path, replicas: int, name: str) -> None:
    out = out_root / name
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()

    li = con.execute(
        f"SELECT l_orderkey, l_partkey FROM read_parquet('{SRC}/lineitem.parquet')"
    ).fetch_arrow_table()
    max_o = max(li.column("l_orderkey").to_pylist()) + 1
    max_p = max(li.column("l_partkey").to_pylist()) + 1
    okeys, pkeys = [], []
    o = li.column("l_orderkey").to_pylist()
    p = li.column("l_partkey").to_pylist()
    for r in range(replicas):
        okeys.extend(x + r * max_o for x in o)
        pkeys.extend(x + r * max_p for x in p)
    pq.write_table(
        pa.table({"l_orderkey": pa.array(okeys, pa.int64()),
                  "l_partkey": pa.array(pkeys, pa.int64())}),
        out / "lineitem.parquet",
    )

    docs = con.execute(
        f"SELECT doc_id, text, lang, source FROM read_parquet('{SRC}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    max_d = max(d[0] for d in docs) + 1
    ids, texts, langs, sources, nchars = [], [], [], [], []
    for r in range(replicas):
        for doc_id, text, lang, source in docs:
            t = perturb(text, r, doc_id)
            ids.append(doc_id + r * max_d)
            texts.append(t)
            langs.append(lang)
            sources.append(source)
            nchars.append(len(t))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
                "source": pa.array(sources, pa.string()),
                "n_chars": pa.array(nchars, pa.int64()),
            }
        ),
        out / "documents.parquet",
    )
    import numpy as np

    emb = con.execute(
        f"SELECT vec_id, embedding, label FROM "
        f"read_parquet('{SRC}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    vids = np.array([e[0] for e in emb], dtype=np.int64)
    mat = np.array([e[1] for e in emb], dtype=np.float32)
    labels = np.array([e[2] for e in emb], dtype=np.int32)
    d = mat.shape[1]
    max_v = int(vids.max()) + 1
    out_ids, out_vecs, out_labels = [], [], []
    for r in range(replicas):
        if r == 0:
            q = np.eye(d)
        else:
            rng = np.random.default_rng(1_000_003 * r)  # deterministic
            q, rr = np.linalg.qr(rng.standard_normal((d, d)))
            q = q * np.sign(np.diag(rr))  # canonical orthogonal factor
        rot = (mat.astype(np.float64) @ q.T).astype(np.float32)
        out_ids.append(vids + r * max_v)
        out_vecs.append(rot)
        out_labels.append(labels)
    all_vecs = np.concatenate(out_vecs)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.concatenate(out_ids), pa.int64()),
                "embedding": pa.array(
                    [row.tolist() for row in all_vecs],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array(
                    np.concatenate(out_labels), pa.int32()
                ),
            }
        ),
        out / "embeddings.parquet",
    )
    print(
        f"{name}: lineitem {len(okeys)} rows, documents {len(ids)} rows, "
        f"embeddings {len(all_vecs)} rows"
    )


if __name__ == "__main__":
    root = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(
        "/root/repo/.scaling_data"
    )
    gen(root, 3, "sf0.3")
    gen(root, 10, "sf1")
