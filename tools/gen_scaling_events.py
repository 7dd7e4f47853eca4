"""Extend the .scaling_data replicas with an ``events`` table.

Replica r offsets event_id and user_id by r * (max+1) and keeps ts,
event_type, and value UNCHANGED: each replica is a disjoint cohort of
users producing the same traffic shape over the same 30-day span —
weak scaling in rows/day, not in days. Known ground truths the
measurement can check: PSI and ACF are exactly replica-invariant
(shares and normalized autocovariances), chi-square scales x R (d and
counts both x R), item co-occurrence counts scale x R with identical
cosine/Jaccard/lift.

Usage: python tools/gen_scaling_events.py [out_root]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

SRC = "/root/testdata/sf0.1"


def gen(out_root: Path, replicas: int, name: str) -> None:
    out = out_root / name
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"""
        COPY (
            SELECT e.event_id + r.r * m.mo AS event_id,
                   CAST(date_trunc('microseconds', e.ts) AS TIMESTAMP) AS ts,
                   e.user_id + r.r * m.mu AS user_id,
                   e.event_type, e.value, e.props
            FROM read_parquet('{SRC}/events.parquet') e
            CROSS JOIN range({replicas}) r(r)
            CROSS JOIN (SELECT MAX(event_id) + 1 AS mo,
                               MAX(user_id) + 1 AS mu
                        FROM read_parquet('{SRC}/events.parquet')) m
        ) TO '{out}/events.parquet' (FORMAT PARQUET)
    """)
    n = con.sql(f"SELECT COUNT(*) FROM '{out}/events.parquet'").fetchone()[0]
    print(f"{name}: events {n} rows")


if __name__ == "__main__":
    root = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(
        "/root/repo/.scaling_data"
    )
    gen(root, 3, "sf0.3")
    gen(root, 10, "sf1")
