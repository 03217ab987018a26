"""EXTENSION contract queries — LLM-data-pipeline operators.

No reference citations (the reference has none of these, SURVEY §2.9);
designed per BASELINE.json north_star for 100 TB training-data
pipelines: dedup, similarity search, text analysis, multimodal
plumbing, event windows. Implementations live in ``operators/`` and
``functions/``; these wrappers bind them to the driver's tables.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .contract import query
from .sources.registry import load


@query(
    "ext_dedup_exact",
    oracle="""
    SELECT md5(text) AS content_hash,
           MIN(doc_id) AS canonical_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def ext_dedup_exact(spark, sf_dir):
    """Exact dedup via content-hash groupBy: one shuffle of (hash, id)
    pairs, never of full documents — at 100 TB project-then-shuffle is
    the difference between moving 32-byte keys and moving bodies."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.md5("text").alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@query(
    "ext_text_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           n_chars
    FROM documents
    """,
)
def ext_text_token_count(spark, sf_dir):
    """Whitespace token counting — JVM-side split+size, no UDF."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
        "n_chars",
    )
