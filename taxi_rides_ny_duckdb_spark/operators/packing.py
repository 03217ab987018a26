"""Sequence packing for LLM training data (EXTENSION — no reference
analog; the standard pretraining preprocessing step of concatenating
documents into fixed-size context windows).

Two modes, different contracts:

- **split** (``pack_sequences_split``): documents are laid out in a
  deterministic order and cut at exact ``max_tokens`` boundaries —
  a document may span two packs (how most pretraining pipelines pack:
  concatenate-then-chunk). Pure window arithmetic over a running token
  sum: pack_id = tokens_before // max_tokens. Fully SQL-expressible,
  so the contract query carries a DuckDB oracle.
- **greedy** (``pack_sequences_greedy``): documents are atomic — one
  that would overflow the current pack starts a new one (first-fit in
  order). Inherently sequential state, so it runs per BUCKET via
  ``applyInPandas``: packs never cross buckets, buckets pack in
  parallel, and the result is deterministic given (bucket, order).
  The waste vs split-mode is bounded by max_tokens-1 per pack.

Scale notes: split-mode's single global window is the textbook
global-order hazard — at 100 TB use ``bucket_col`` (both modes accept
it) so each bucket (e.g. a date or a hash range) packs independently:
one narrow shuffle on the bucket key, no global sort, pack ids are
(bucket, local_id) pairs. Oversized documents (> max_tokens) get
``n_splits = ceil(n_tokens / max_tokens)`` pieces in split mode and a
dedicated pack in greedy mode — no row is ever dropped silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_sequences_split(
    df: DataFrame,
    token_col: str,
    id_col: str,
    max_tokens: int,
    bucket_col: str | None = None,
) -> DataFrame:
    """Concatenate-then-chunk packing: lay documents end-to-end in
    ``id_col`` order (within ``bucket_col`` if given) and cut every
    ``max_tokens``. Output per document: the pack its FIRST token
    lands in, the offset there, and how many packs it spans.

    Oracle shape (DuckDB)::

        SUM(tokens) OVER (ORDER BY id ROWS BETWEEN UNBOUNDED
        PRECEDING AND 1 PRECEDING) → tokens_before;
        pack_id = tokens_before // max_tokens,
        pack_offset = tokens_before % max_tokens,
        n_splits = (pack_offset + tokens + max_tokens - 1) // max_tokens
                   - pack_offset // max_tokens  (clamped ≥ 1)
    """
    def idiv(col, n: int):
        # Exact integer division of a non-negative bigint column:
        # plain `/` is DOUBLE division, which silently rounds once the
        # running token sum passes 2^53 — real at 100 TB (~25T tokens
        # is safe, but a multi-epoch concat is not). Subtracting the
        # remainder first and dividing in decimal keeps it exact at
        # any magnitude; the quotient is integral by construction.
        return ((col - col % n).cast("decimal(38,0)") / n).cast("bigint")

    part = Window.partitionBy(bucket_col) if bucket_col else Window.partitionBy()
    w = part.orderBy(F.col(id_col).asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    tokens = F.col(token_col).cast("bigint")
    before = F.coalesce(F.sum(tokens).over(w), F.lit(0).cast("bigint"))
    offset = before % max_tokens
    # packs spanned = (offset + n - 1) // max + 1 for n ≥ 1 (offset <
    # max by construction); a zero-token document still "lands" in its
    # pack, so clamp at 1.
    spans = F.greatest(
        F.lit(1).cast("bigint"),
        idiv(offset + tokens - 1, max_tokens) + 1,
    )
    out = [
        F.col(id_col),
        tokens.alias("n_tokens"),
        idiv(before, max_tokens).alias("pack_id"),
        offset.alias("pack_offset"),
        spans.alias("n_splits"),
    ]
    if bucket_col:
        out.insert(0, F.col(bucket_col))
    return df.select(*out)


def pack_sequences_greedy(
    df: DataFrame,
    token_col: str,
    id_col: str,
    max_tokens: int,
    bucket_col: str | None = None,
) -> DataFrame:
    """Atomic-document (first-fit-in-order) packing per bucket via
    ``applyInPandas``: a document that would overflow the open pack
    closes it. Deterministic: rows are sorted by id inside the bucket
    before the sequential fold. Each bucket is one Arrow batch — at
    corpus scale pick buckets sized to an executor (date, hash range),
    exactly the ``group_medoid`` contract."""
    import pandas as pd

    itype = dict(df.dtypes)[id_col]
    gtype = dict(df.dtypes)[bucket_col] if bucket_col else "int"
    gname = bucket_col or "__bucket"
    schema = (
        f"{gname} {gtype}, {id_col} {itype}, n_tokens bigint, "
        f"pack_id bigint, pack_offset bigint"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort")
        pack_ids, offsets = [], []
        cur_pack, cur_fill = 0, 0
        for n in pdf["__n"]:
            n = int(n)
            if cur_fill > 0 and cur_fill + n > max_tokens:
                cur_pack += 1
                cur_fill = 0
            pack_ids.append(cur_pack)
            offsets.append(cur_fill)
            cur_fill += n
            if cur_fill >= max_tokens:  # full (or oversized doc): close
                cur_pack += 1
                cur_fill = 0
        return pd.DataFrame(
            {
                gname: pdf[gname],
                id_col: pdf[id_col],
                "n_tokens": pdf["__n"].astype("int64"),
                "pack_id": pd.Series(pack_ids, dtype="int64", index=pdf.index),
                "pack_offset": pd.Series(offsets, dtype="int64", index=pdf.index),
            }
        )

    staged = df.select(
        (F.col(bucket_col) if bucket_col else F.lit(0)).alias(gname),
        F.col(id_col),
        F.col(token_col).cast("bigint").alias("__n"),
    )
    return staged.groupBy(gname).applyInPandas(pack, schema)


def chunk_token_windows(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int,
    stride: int,
) -> DataFrame:
    """Overlapping token-window chunking — the RAG / long-context
    preprocessing step that MATERIALIZES chunk text (unlike the pack_*
    functions, which only assign metadata): chunk ``i`` of a document
    covers tokens ``[i*stride+1, i*stride+window]``; chunks are emitted
    until one reaches the document end (HuggingFace
    ``return_overflowing_tokens`` semantics), so
    ``n_chunks = 1 + ceil(max(n-window, 0)/stride)`` and the final
    chunk may be short. Every token is covered; consecutive chunks
    overlap by ``window - stride`` tokens.

    Plan: tokenize once (staged), build the start list as a pure array
    expression, ``posexplode`` — a narrow per-row expansion with
    fan-out ~n/stride, no shuffle, no UDF. At 100 TB this is a map-only
    stage whose output is ~window/stride × input bytes — the caller
    controls the blow-up with the stride.

    Output: (id, chunk_idx 0-based, chunk_text, n_chunk_tokens).

    Oracle (DuckDB)::

        n_chunks = 1 + (greatest(len(w) - window, 0) + stride - 1) // stride
        starts   = generate_series(0, n_chunks - 1)
        chunk    = array_to_string(w[i*stride+1 : i*stride+window], ' ')
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    from ..functions.text import tokenize

    toks = df.select(F.col(id_col), tokenize(F.col(text_col)).alias("__toks"))
    n = F.size("__toks")
    # ceil(max(n-window,0)/stride) via exact integer division —
    # (x - x % s) / s never routes through double
    over = F.greatest(n - F.lit(window), F.lit(0)) + F.lit(stride - 1)
    n_chunks = F.lit(1) + ((over - over % stride) / stride).cast("long")
    staged = toks.select(
        F.col(id_col),
        F.col("__toks"),
        F.sequence(F.lit(0), (n_chunks - 1).cast("int")).alias("__idx"),
    ).filter(F.size("__toks") > 0)
    ex = staged.select(
        F.col(id_col),
        F.posexplode("__idx").alias("chunk_idx", "__i"),
        F.col("__toks"),
    )
    chunk = F.slice(
        F.col("__toks"), F.col("__i") * stride + 1, window
    )
    return ex.select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
    )
