"""Multimodal-column query: binary payload + metadata extraction.

The Spark side runs the REAL plumbing — synthetic binary payload
column, then an Arrow-batched ``mapInPandas`` header decode
(spark_query_engine.operators.multimodal). The oracle reproduces the
metadata arithmetic directly in SQL, proving the Python batch path
computes exactly what the declarative definition says.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spark_query_engine.operators import multimodal as MM
from spark_query_engine.queries import load, query


@query(
    "multimodal_metadata",
    oracle="""
        SELECT doc_id AS id,
               CAST(octet_length(encode(
                   'QEIM'
                   || lpad(CAST(length(text) % 640 AS VARCHAR), 4, '0')
                   || lpad(CAST(length(text) % 480 AS VARCHAR), 4, '0')
                   || text)) AS BIGINT) AS byte_len,
               TRUE AS magic_ok,
               CAST(length(text) % 640 AS INT) AS width,
               CAST(length(text) % 480 AS INT) AS height
        FROM documents
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binary payload → mapInPandas header decode → typed metadata."""
    docs = load(spark, sf_dir, "documents")
    return MM.decode_metadata(MM.attach_payload(docs, "doc_id", "text"))
