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


# --- REST-paginated connector shape ------------------------------------------

PAGED_SCHEMA_DDL = "doc_id bigint, text string, lang string, n_tokens int, page int"


def _fetch_page(endpoint: str, page: int, page_size: int) -> list[tuple]:
    """Fetch one page of records from ``endpoint``.

    ``synthetic:<seed>`` serves the deterministic generator corpus
    in-process (tests, CI, load experiments — no network). An
    ``http(s)://`` endpoint takes the urllib branch: GET
    ``{endpoint}?page={page}&page_size={page_size}`` expecting a JSON
    array of {doc_id, text, lang, n_tokens} objects — the standard
    page-number pagination contract. Executor-side only: the driver
    never fetches data, it only plans page ranges.
    """
    if endpoint.startswith("synthetic:"):
        seed = int(endpoint.split(":", 1)[1] or 0)
        lo = page * page_size
        return [
            (*_doc(seed, i), page) for i in range(lo, lo + page_size)
        ]
    import json as _json
    import urllib.request

    with urllib.request.urlopen(
        f"{endpoint}?page={page}&page_size={page_size}"
    ) as resp:
        rows = _json.loads(resp.read())
    return [
        (r["doc_id"], r["text"], r["lang"], r["n_tokens"], page) for r in rows
    ]


class _PageRangePartition(InputPartition):
    def __init__(self, start_page: int, end_page: int):
        self.start_page, self.end_page = start_page, end_page


class PagedApiReader(DataSourceReader):
    """Batch half: page-NUMBER addressing makes pagination parallel —
    each input partition owns a contiguous page range and fetches its
    pages independently (the scale shape for offset-addressable APIs;
    a cursor-chained API degrades to one partition by construction,
    which is a property of the API, not the connector)."""

    def __init__(self, options: dict):
        self.endpoint = options.get("endpoint", "synthetic:0")
        self.pages = int(options.get("pages", 10))
        self.page_size = int(options.get("pageSize", 100))
        self.num_partitions = int(options.get("numPartitions", 8))

    def partitions(self) -> Sequence[InputPartition]:
        step = max(1, -(-self.pages // self.num_partitions))
        return [
            _PageRangePartition(p, min(p + step, self.pages))
            for p in range(0, self.pages, step)
        ]

    def read(self, partition: _PageRangePartition) -> Iterator[tuple]:
        for page in range(partition.start_page, partition.end_page):
            yield from _fetch_page(self.endpoint, page, self.page_size)


class PagedApiStreamReader(SimpleDataSourceStreamReader):
    """Streaming half: the offset is the next page index — committed
    offsets replay exactly (page contents are immutable under the
    pagination contract), so restarts resume mid-stream without
    duplicates."""

    def __init__(self, options: dict):
        self.endpoint = options.get("endpoint", "synthetic:0")
        self.page_size = int(options.get("pageSize", 100))
        self.pages_per_batch = int(options.get("pagesPerBatch", 1))

    def initialOffset(self) -> dict:
        return {"next_page": 0}

    def read(self, start: dict):
        lo = int(start["next_page"])
        hi = lo + self.pages_per_batch
        rows = [
            r
            for page in range(lo, hi)
            for r in _fetch_page(self.endpoint, page, self.page_size)
        ]
        return iter(rows), {"next_page": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            r
            for page in range(int(start["next_page"]), int(end["next_page"]))
            for r in _fetch_page(self.endpoint, page, self.page_size)
        )


class PagedApiDataSource(DataSource):
    """REST-paginated connector shape (§2.1's second custom source):
    ``spark.dataSource.register(PagedApiDataSource)`` then
    ``spark.read.format("paged_api").option("endpoint", "synthetic:7")
    .option("pages", 20).option("pageSize", 50).load()`` — or
    ``spark.readStream`` with the same options for page-cursor
    micro-batches."""

    @classmethod
    def name(cls) -> str:
        return "paged_api"

    def schema(self) -> str:
        return PAGED_SCHEMA_DDL

    def reader(self, schema: StructType) -> PagedApiReader:
        return PagedApiReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> PagedApiStreamReader:
        return PagedApiStreamReader(self.options)
