"""Extend the weak-scaling replicas with orders + customer (the round-5d
HITS / join-cardinality queries read them). Same replication convention
as gen_scaling_data.py: replica r shifts every key by r * (max+1), and
the source maxima line up across tables (max o_orderkey == max
l_orderkey, max c_custkey == max o_custkey), so replicated joins stay
replica-internal — each replica is a disjoint copy of the purchase
graph and truth scales exactly linearly.

Only the columns the scaling queries read are written:
``orders(o_orderkey, o_custkey, o_totalprice)``,
``customer(c_custkey, c_mktsegment)``. (o_totalprice added round 7 so
``stats_poisson_bootstrap`` gets an exponent row — replicas repeat the
same price values under shifted keys, so replicate sums scale exactly
linearly while the md5 Poisson weights stay key-dependent.)

Usage: python tools/gen_scaling_tpch.py [out_root]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def gen(out_root: Path, replicas: int, name: str) -> None:
    out = out_root / name
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()

    # o_orderpriority rides along for graph_components_deep_chain:
    # replica r shifts orderkeys, so consecutive-rank edges WITHIN a
    # priority class link replicas into one chain per class — the
    # component count stays 5 while the diameter grows with the
    # replica count, which is exactly the adversarial shape that
    # query exists to stress (deeper chain = harder, not easier).
    o = con.execute(
        f"SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority"
        f" FROM read_parquet('{SRC}/orders.parquet')"
    ).fetchall()
    max_o = max(r[0] for r in o) + 1
    max_c = max(r[1] for r in o) + 1
    okeys, ckeys, prices, prios = [], [], [], []
    for r in range(replicas):
        okeys.extend(x + r * max_o for x, _, _, _ in o)
        ckeys.extend(c + r * max_c for _, c, _, _ in o)
        prices.extend(p for _, _, p, _ in o)
        prios.extend(pr for _, _, _, pr in o)
    pq.write_table(
        pa.table({"o_orderkey": pa.array(okeys, pa.int64()),
                  "o_custkey": pa.array(ckeys, pa.int64()),
                  "o_totalprice": pa.array(
                      [float(p) for p in prices], pa.float64()
                  ),
                  "o_orderpriority": pa.array(prios, pa.string())}),
        out / "orders.parquet",
    )

    cu = con.execute(
        f"SELECT c_custkey, c_mktsegment FROM read_parquet('{SRC}/customer.parquet')"
    ).fetchall()
    max_cu = max(r[0] for r in cu) + 1
    assert max_cu == max_c, (max_cu, max_c)
    keys, segs = [], []
    for r in range(replicas):
        for k, seg in cu:
            keys.append(k + r * max_cu)
            segs.append(seg)
    pq.write_table(
        pa.table({"c_custkey": pa.array(keys, pa.int64()),
                  "c_mktsegment": pa.array(segs, pa.string())}),
        out / "customer.parquet",
    )
    print(f"{name}: orders {len(okeys)}, customer {len(keys)}")


if __name__ == "__main__":
    root = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(
        "/root/repo/.scaling_data"
    )
    gen(root, 3, "sf0.3")
    gen(root, 10, "sf1")


def gen_part(out_root: Path, replicas: int, name: str) -> None:
    """part(p_name) replicas for the entity-resolution pipeline:
    replica r suffixes every name with ' r<r>' — names stay distinct
    across replicas, each replica contributes its own planted
    (orig, corrupted) cluster population, so cluster counts scale
    linearly while name-length statistics shift by a constant."""
    out = out_root / name
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT p_name FROM read_parquet('{SRC}/part.parquet')"
    ).fetchall()
    names = []
    for r in range(replicas):
        suffix = "" if r == 0 else f" r{r}"
        names.extend(n + suffix for (n,) in rows)
    pq.write_table(
        pa.table({"p_name": pa.array(names, pa.string())}),
        out / "part.parquet",
    )
    print(f"{name}: part {len(names)}")
