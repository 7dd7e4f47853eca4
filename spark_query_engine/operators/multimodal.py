"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video ride through the engine as ``binary`` columns
with a metadata struct, exactly how large-scale multimodal training
pipelines store them in parquet. The Spark-side plumbing here is real
and tested — schema, partition-friendly batch shape, Arrow-batched
``mapInPandas`` UDF signatures — while the actual codec work is
STUBBED (the container has no image/audio libraries): ``decode_image``
raises ``NotImplementedError`` unless given the deterministic fake
codec, which parses our synthetic 16-byte header. Swapping the fake
for Pillow/torchaudio is a one-function change; nothing in the Spark
plan changes.

Synthetic payload format (deterministic, engine-portable):
  bytes 0..3   magic ``QEIM``
  bytes 4..7   width  (ascii, zero-padded)
  bytes 8..11  height (ascii, zero-padded)
  bytes 12..   body (utf-8 text standing in for pixel data)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_query_engine.operators import widen

MAGIC = b"QEIM"

#: Output schema of decode_metadata — typed metadata alongside the payload.
META_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("magic_ok", T.BooleanType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def attach_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a synthetic binary payload column from text (the testdata
    has no real media; this exercises the binary-column path with
    deterministic bytes). Width/height derive from the text length."""
    w = F.lpad((F.length(text_col) % 640).cast("string"), 4, "0")
    h = F.lpad((F.length(text_col) % 480).cast("string"), 4, "0")
    payload = F.encode(
        F.concat(F.lit(MAGIC.decode("ascii")), w, h, F.col(text_col)), "utf-8"
    )
    return widen(df).select(F.col(id_col).alias("id"), payload.alias("payload"))


def decode_metadata(df: DataFrame) -> DataFrame:
    """Parse header metadata from the payload with an Arrow-batched
    mapInPandas — the realistic shape for per-item codec work: one
    Python invocation per Arrow batch (not per row), columnar in/out,
    preserves partitioning (no shuffle)."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raw = pdf["payload"]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "byte_len": raw.str.len().astype("int64"),
                    "magic_ok": raw.str[:4].map(lambda b: bytes(b) == MAGIC),
                    "width": raw.str[4:8].map(lambda b: int(bytes(b).decode())),
                    "height": raw.str[8:12].map(lambda b: int(bytes(b).decode())),
                }
            )

    return df.mapInPandas(parse, META_SCHEMA)


def decode_image(payload: bytes, codec: str = "real"):
    """Decode one payload to a pixel array.

    STUB: the real codec (Pillow/libjpeg) is not in this container —
    ``codec='real'`` raises NotImplementedError by design. The
    deterministic ``codec='fake'`` parses the synthetic header and
    returns a (height, width) shape tuple, enough to exercise the
    plumbing end-to-end in tests."""
    if codec == "fake":
        if payload[:4] != MAGIC:
            raise ValueError("bad magic")
        return (int(payload[8:12].decode()), int(payload[4:8].decode()))
    raise NotImplementedError(
        "real image decoding requires an image library not present in "
        "this environment; use codec='fake' or install Pillow"
    )


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """'Frame sampling' over the synthetic payloads: keep every n-th
    item per partition-stable ordering key — the Spark-side shape of
    video frame subsampling (a filter, no shuffle)."""
    return df.where(F.col("id") % every_n == 0)
