"""Custom Python DataSource (Spark 4 DataSource API): a deterministic
synthetic-corpus generator, the non-file source family next to the
csv/parquet/json/orc readers and the rate/parquet-dir stream sources.

Why a generator source: load tests, shuffle/partitioning experiments,
and CI fixtures all need "a corpus of N documents" without shipping N
documents. The DataSource API is also the integration point a real
connector (REST paginator, message queue, proprietary scanner) plugs
into — `partitions()` declares the parallel split, `read(partition)`
yields rows executor-side: nothing is materialized on the driver, so
N scales to any size the cluster can hold.

Determinism: doc text is a pure function of (seed, doc_id) via md5 —
the same contract as the repo's hash-based samplers — so tests can
assert exact content and repeated reads are identical.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

_WORDS = (
    "the a data spark query join filter merge sort table row column "
    "batch stream window hash key value agg group order part fast slow "
    "big small line customer vector dup"
).split()

SCHEMA_DDL = "doc_id bigint, text string, lang string, n_tokens int"


def _doc(seed: int, doc_id: int) -> tuple[int, str, str, int]:
    """One synthetic document, pure function of (seed, doc_id)."""
    h = hashlib.md5(f"{seed}:{doc_id}".encode()).digest()
    n_tokens = 5 + h[0] % 60
    lang = ("en", "de", "fr", "es")[h[1] % 4]
    toks = []
    x = int.from_bytes(h[2:10], "big")
    for i in range(n_tokens):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        toks.append(_WORDS[(x >> 33) % len(_WORDS)])
    return doc_id, " ".join(toks), lang, n_tokens


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SynthDocsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.seed = int(options.get("seed", 0))
        self.num_partitions = int(options.get("numPartitions", 8))

    def partitions(self) -> Sequence[InputPartition]:
        step = max(1, -(-self.n // self.num_partitions))
        return [
            _RangePartition(i, min(i + step, self.n))
            for i in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for doc_id in range(partition.start, partition.end):
            yield _doc(self.seed, doc_id)


class SynthDocsDataSource(DataSource):
    """Register with ``spark.dataSource.register(SynthDocsDataSource)``
    then read via ``spark.read.format("synth_docs").option("n", 10_000)
    .option("numPartitions", 32).load()``."""

    @classmethod
    def name(cls) -> str:
        return "synth_docs"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> SynthDocsReader:
        return SynthDocsReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> "SynthDocsStreamReader":
        return SynthDocsStreamReader(self.options)


class SynthDocsStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the connector (Spark 4 simple stream-reader
    API): each micro-batch emits the next ``batchSize`` documents; the
    offset is simply the next doc_id, so restarts resume exactly and
    the stream is replayable from any committed offset — the
    at-least-once → exactly-once contract a checkpointed source needs.
    """

    def __init__(self, options: dict):
        self.seed = int(options.get("seed", 0))
        self.batch_size = int(options.get("batchSize", 100))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = int(start["next"])
        hi = lo + self.batch_size
        return (
            iter([_doc(self.seed, i) for i in range(lo, hi)]),
            {"next": hi},
        )

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            _doc(self.seed, i)
            for i in range(int(start["next"]), int(end["next"]))
        )
