"""Full-text retrieval scoring (EXTENSION — no reference analog).

BM25 ranking over the corpus: the standard lexical-retrieval primitive
a training-data pipeline uses for targeted corpus search (mining
positives for retrieval training, finding documents about an eval
topic, building seed sets for importance sampling). Everything is
DataFrame-native: the query set rides along broadcast, corpus bytes
shuffle exactly once (the tf aggregation), and scoring is a pure
column expression on aggregation-bounded rows.

Scale notes (100 TB):
- The corpus-sized work is one ``groupBy(id, term)`` with map-side
  combine — the exploded token stream collapses before the exchange.
- Document frequency is ``count(*) over (partition by term)`` ON the
  tf rows (one row per document containing the term) — the same fused
  shape as ``cleaning.tfidf_topk_terms``; no second pass over the
  corpus and no second plan of the tf subtree.
- Queries are a driver-side list (product queries are human-typed:
  tens-to-thousands). They become a broadcast literal frame; the
  term-match join is broadcast-hash, never a shuffle of corpus rows.
- Corpus stats (N, avgdl) are a 1-row aggregate cross-joined
  broadcast — a scalar, not a shuffle.
- The per-query top-k is a window over (query, candidate) rows —
  bounded by matches, not by the corpus; candidates for a query are
  only documents sharing ≥1 term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import tokenize
from ..session import ensure_min_partitions


def bm25_topk(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[str, str]],
    text_col: str,
    id_col: str,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents per query under Okapi BM25 (Lucene's
    non-negative idf: ``ln(1 + (N - df + 0.5)/(df + 0.5))``) →
    ``(query_id, rank, <id_col>, score_r)``.

    ``queries`` is ``[(query_id, query_text), ...]`` — a bounded,
    human-scale set. Query terms are DISTINCT per query (standard
    BM25 drops query-side term frequency for short queries) and
    tokenized with the same ``functions.text.tokenize`` as the corpus
    so both sides agree on the term space.

    Determinism across engines: tf, df, N and dl are integers; the
    score is one double expression evaluated identically by Spark and
    DuckDB, rounded to 9dp BEFORE the rank window (round-before-rank),
    ties broken by document id ascending.

    Oracle shape (DuckDB): same CTE pipeline — tokens → tf (+ dl) →
    window df → join to a VALUES query-term list → per-query top-k.
    """
    if not queries:
        raise ValueError("queries must be a non-empty list of (id, text)")
    # Corpus side: one explode + one aggregation; dl (document length
    # in tokens) is functionally dependent on the id, so carrying it
    # in the groupBy keys adds no groups.
    toks = ensure_min_partitions(docs.select(id_col, text_col)).select(
        F.col(id_col),
        F.size(tokenize(F.col(text_col))).alias("__dl"),
        F.explode(tokenize(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy(id_col, "term", "__dl").agg(F.count(F.lit(1)).alias("tf"))
    # Document frequency fused onto the tf rows (no second corpus pass).
    with_df = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    )
    # Scalar corpus stats: N docs and average document length.
    stats = docs.select(
        F.size(tokenize(F.col(text_col))).alias("__dl")
    ).agg(
        F.count(F.lit(1)).alias("__n"),
        # exact integer sum / count — avg(double) would be partition-
        # order-dependent and break cross-engine bit parity
        (
            F.sum("__dl").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("__avgdl"),
    )
    # Query side: distinct (query_id, term) literal rows — broadcast.
    qterms = spark.createDataFrame(
        [(qid, qtext) for qid, qtext in queries], ["query_id", "__qtext"]
    ).select(
        "query_id", F.explode(tokenize(F.col("__qtext"))).alias("term")
    ).distinct()
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_part = (F.col("tf") * (F.lit(k1) + 1.0)) / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("__dl") / F.col("__avgdl"))
    )
    # Order-independent sum (parity rule: no raw sum(double)): each
    # per-term addend is rounded to 12dp — identical in both engines —
    # then summed as exact DECIMAL, so partition order cannot perturb
    # the total. Presented as double rounded to 9dp before the rank.
    addend = F.round(idf * tf_part, 12).cast("decimal(38,12)")
    scored = (
        with_df.join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum(addend).cast("double"), 9).alias("score_r"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score_r"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            F.col(id_col),
            "score_r",
        )
    )
