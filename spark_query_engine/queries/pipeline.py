"""Composite pipeline queries: operator composition and skew handling.

These exercise what single-operator queries can't — that the engine's
operators compose into the multi-stage shapes a real training-data
curation job uses, and that skew-mitigation rewrites preserve
semantics exactly (the salted join's oracle is the PLAIN join: salting
must change the shuffle layout, never the result).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_query_engine.operators import dedup as D
from spark_query_engine.operators import skew
from spark_query_engine.operators import textanalysis as TA
from spark_query_engine.queries import load, query


@query(
    "join_salted_skew",
    oracle="""
        SELECT o.o_orderkey, c.c_name, o.o_totalprice
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE o.o_totalprice > 250000.0
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join (orders ⋈ customer over 8 salt buckets). The
    oracle is the unsalted join — proving the skew rewrite is a pure
    physical-layout change. At 100 TB this is the fallback when one
    key floods a reducer and the small side is too big to broadcast;
    AQE's skew splitting covers the sort-merge case automatically."""
    o = load(spark, sf_dir, "orders").where(F.col("o_totalprice") > 250000.0)
    c = load(spark, sf_dir, "customer")
    return skew.salted_join(o, c, "o_custkey", "c_custkey", salt=8).select(
        "o_orderkey", "c_name", "o_totalprice"
    )


@query(
    "pipeline_curate",
    oracle=f"""
        WITH reps AS (
            SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
        ),
        kept AS (
            SELECT d.doc_id, d.text FROM documents d
            JOIN reps r ON d.doc_id = r.doc_id
        ),
        t AS (
            SELECT doc_id,
                   list_distinct(string_split(lower(text), ' ')) AS tokset,
                   len(string_split(lower(text), ' ')) AS n_tok,
                   length(text) AS n_chars
            FROM kept
        ),
        s AS (
            SELECT doc_id, n_tok, n_chars,
                   {TA.lang_score_sql('en')} AS score_en,
                   {TA.lang_score_sql('es')} AS score_es,
                   {TA.lang_score_sql('de')} AS score_de,
                   {TA.lang_score_sql('fr')} AS score_fr
            FROM t
        )
        SELECT doc_id AS id, n_tok AS n_tokens,
               CAST(score_en AS INT) AS stopword_hits
        FROM s
        WHERE n_tok >= 30 AND n_chars >= 200
          AND score_en = greatest(score_en, score_es, score_de, score_fr)
          AND score_en > 0
    """,
)
def pipeline_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation slice: exact-dedup (keep min-id
    representative) → length/token floor → English-only (stopword
    language ID) → token counts. Composes three verified operators
    into the standard pre-training filter chain; every stage is a
    hash-partitioned agg or equi-join, no collects, so the same plan
    runs at corpus scale."""
    docs = load(spark, sf_dir, "documents")
    reps = D.exact_duplicates(docs, "doc_id", "text").select(
        F.col("representative_id").alias("doc_id")
    )
    # cheap filters first (pushed to the scan), dedup join after
    kept = docs.where(F.length("text") >= 200).join(reps, "doc_id")
    lang = TA.language_id(kept, "doc_id", "text").where(
        F.col("predicted_lang") == "en"
    )
    toks = TA.token_counts(kept, "doc_id", "text").where(
        F.col("n_ws_tokens") >= 30
    )
    return lang.join(toks, "id").select(
        "id", F.col("n_ws_tokens").alias("n_tokens"), "stopword_hits"
    )
