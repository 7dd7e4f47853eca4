"""Driver-contract test: __spark_entry__ exposes entry/queries/
oracle_sql with consistent keys, and every query runs at sf0.001."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as E  # noqa: E402


def test_entry_returns_rows(spark):
    df = E.entry(spark)
    assert df.count() > 0


def test_registry_shape():
    qs, osql = E.queries(), E.oracle_sql()
    assert len(qs) >= 40
    assert set(osql) <= set(qs)
    # every non-oracled query is a deliberate rows-only exception
    assert set(qs) - set(osql) == {"agg_approx_distinct"}


def test_every_query_runs_at_smoke_sf(spark, sf_dir):
    failures = []
    for name, fn in E.queries().items():
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:  # noqa: BLE001
            failures.append((name, str(e)[:200]))
    assert not failures, failures
