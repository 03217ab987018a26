"""Distributed BPE tokenizer training and application.

The three primitives behind building a subword tokenizer ON the
corpus it will tokenize — the step every LLM pretraining pipeline
runs before packing (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units"; the word-count
compression is the optimization every fast trainer uses —
pair statistics are computed over the DISTINCT-WORD vocabulary
weighted by word frequency, never over raw corpus tokens):

- :func:`bpe_pair_counts` — one merge-step's pair statistics
  (the oracled arithmetic core);
- :func:`bpe_learn_merges` — the iterative trainer: N rounds of
  (recount pairs → argmax → apply merge), each round a
  vocabulary-sized distributed job;
- :func:`bpe_segment` — apply a learned merge table to every
  document, rebuilding the corpus as subword sequences.

Scale shape at 100 TB: the corpus is read and shuffled ONCE (the
initial word-frequency aggregation, map-side combined). Everything
after runs on the distinct-word vocabulary — Heaps' law puts that at
~sqrt(corpus tokens), i.e. gigabytes where the corpus is terabytes.
Each training round is one vocab-sized shuffle (pair aggregation,
collapsing to ≤|symbols|² groups) plus a map-only merge application;
the per-round driver transfer is exactly ONE row (the argmax pair).
Merge application is a pure Catalyst left-fold (``F.aggregate`` with
struct state) — no UDF anywhere in train or apply. Segmentation
broadcasts the vocab→symbols map and never shuffles the corpus for
it; the rebuild is the one corpus-sized groupBy(doc).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import tokenize
from ..session import ensure_min_partitions

EOW = "</w>"


def word_counts(docs: DataFrame, text_col: str) -> DataFrame:
    """Corpus word-frequency table ``(wd, c)`` — the ONE corpus-sized
    shuffle in BPE training (map-side partial counts; everything
    downstream is vocabulary-sized). ``ensure_min_partitions``: a
    small-file scan (1-2 partitions) would serialize the tokenize +
    explode onto one core; at 100 TB the input is already wide and
    this is a no-op."""
    return (
        ensure_min_partitions(docs.select(F.col(text_col)))
        .select(F.explode(tokenize(F.col(text_col))).alias("wd"))
        .groupBy("wd")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _initial_symbols(wd: Column) -> Column:
    """Characters of the word plus the end-of-word marker — the round-0
    symbol sequence (the marker is what lets merge statistics
    distinguish suffixes from infixes)."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(wd)), lambda i: wd.substr(i, F.lit(1))
    )
    return F.array_append(chars, F.lit(EOW))


def bpe_pair_counts(docs: DataFrame, text_col: str, k: int = 30) -> DataFrame:
    """Top-``k`` adjacent-symbol pair counts over the round-0 symbol
    sequences (chars + ``</w>``), weighted by word frequency — the
    merge-step statistic of BPE training, exposed standalone as the
    oracled arithmetic core of the trainer.

    Output ``(sym_a, sym_b, pair_count, rank)``; counts are exact
    BIGINTs, rank ties broken by ``(sym_a, sym_b)`` — deterministic.

    Oracle (DuckDB): same word counts, pairs via
    ``generate_series(1, length(wd))`` with the ``i = length`` row
    pairing the last char with ``</w>``, ``row_number`` over
    ``(SUM(c) DESC, sym_a, sym_b)``.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    wc = word_counts(docs, text_col)
    # For round-0 symbols (chars + EOW) the adjacent pairs of word wd
    # are exactly: (char_i, char_{i+1}) for i < len, plus
    # (char_len, EOW) — one struct per character position, no array
    # materialization of the symbol sequence needed.
    pairs = wc.select(
        F.col("c"),
        F.explode(
            F.expr(
                "transform(sequence(1, length(wd)), i -> struct("
                " substring(wd, i, 1) AS sym_a,"
                " CASE WHEN i < length(wd) THEN substring(wd, i + 1, 1)"
                f"      ELSE '{EOW}' END AS sym_b))"
            )
        ).alias("p"),
    ).select("p.sym_a", "p.sym_b", "c")
    agg = pairs.groupBy("sym_a", "sym_b").agg(F.sum("c").alias("pair_count"))
    w = Window.orderBy(F.desc("pair_count"), F.asc("sym_a"), F.asc("sym_b"))
    return agg.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= k
    )


def _apply_merge(syms: Column, a: str, b: str) -> Column:
    """Left-to-right non-overlapping merge of adjacent pair (a, b) →
    ``a||b`` in a symbol array — a pure Catalyst left-fold
    (``F.aggregate`` with struct state ``(acc, carry)``): each element
    either completes a merge with the carried symbol, or flushes the
    carry and becomes the new carry. ``'aaa'`` under merge (a, a)
    yields ``['aa', 'a']`` — the same greedy scan every BPE
    implementation does."""
    merged = a + b
    init = F.struct(
        F.array().cast("array<string>").alias("acc"),
        F.lit(None).cast("string").alias("carry"),
    )

    def step(s: Column, x: Column) -> Column:
        hit = s["carry"].eqNullSafe(F.lit(a)) & (x == F.lit(b))
        flushed = F.when(s["carry"].isNull(), s["acc"]).otherwise(
            F.array_append(s["acc"], s["carry"])
        )
        return F.when(
            hit,
            F.struct(
                F.array_append(s["acc"], F.lit(merged)).alias("acc"),
                F.lit(None).cast("string").alias("carry"),
            ),
        ).otherwise(F.struct(flushed.alias("acc"), x.alias("carry")))

    def fin(s: Column) -> Column:
        return F.when(s["carry"].isNull(), s["acc"]).otherwise(
            F.array_append(s["acc"], s["carry"])
        )

    return F.aggregate(syms, init, step, fin)


def _adjacent_pair_counts(syms_df: DataFrame) -> DataFrame:
    """Pair statistics over a ``(c, syms)`` symbol frame — one
    vocab-sized shuffle collapsing to ≤|symbols|² groups."""
    return (
        syms_df.filter(F.size("syms") >= 2)
        .select(
            F.col("c"),
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms) - 1), i -> struct("
                    " element_at(syms, i) AS a,"
                    " element_at(syms, i + 1) AS b))"
                )
            ).alias("p"),
        )
        .groupBy("p.a", "p.b")
        .agg(F.sum("c").alias("pc"))
    )


# Below this many distinct-word vocabulary rows the WHOLE training
# loop (all n_merges rounds of recount → argmax → merge apply) runs
# inside one applyInPandas task instead of one distributed pair
# aggregation + 1-row collect per round: each distributed round costs
# a scheduled job (~0.2-0.4 s fixed overhead at the correctness SFs)
# for integer dict arithmetic that takes milliseconds in-task. The
# vocabulary row count comes from one cheap count over the
# already-checkpointed symbol frame (cached-block scan), so the gate
# costs a fast job and removes n_merges-1 or more. EXACTNESS IS
# TRIVIAL here — counts are exact integers, the argmax tie-break is
# lexicographic (UTF-8 byte order == code-point order == Python str
# order), the greedy merge scan is pure string ops — pinned by
# test_bpe_learn_merges_fused_gate_matches_distributed. The gate is
# WORK-sized: rows bound the task's Arrow payload (Heaps' law keeps
# the vocab ~sqrt(corpus tokens), but a 100 TB corpus still exceeds
# any single task — above the gate the distributed loop is unchanged).
_FUSED_BPE_MAX_VOCAB = 500_000


def _bpe_rounds_fused(
    syms: DataFrame, n_merges: int
) -> list[tuple[int, str, str, int]]:
    """All BPE training rounds inside ONE task over the (c, syms)
    vocabulary frame — the in-task twin of the distributed loop:
    - pair recount: exact integer dict sums over adjacent symbols;
    - argmax: max pair_count, ties to (sym_a, sym_b) ascending —
      Python str order == Spark's binary UTF-8 string order;
    - merge apply: the same left-to-right non-overlapping greedy scan
      as ``_apply_merge``'s Catalyst fold ('aaa' under (a,a) →
      ['aa', 'a']);
    - early stop when no adjacent pair remains."""
    import pandas as pd

    def fn(pdf):
        cnts = pdf["c"].tolist()
        seqs = [list(s) for s in pdf["syms"]]
        merges: list[tuple[int, str, str, int]] = []
        for r in range(n_merges):
            pc: dict[tuple[str, str], int] = {}
            for cnt, ss in zip(cnts, seqs):
                for i in range(len(ss) - 1):
                    p = (ss[i], ss[i + 1])
                    pc[p] = pc.get(p, 0) + cnt
            if not pc:
                break
            (a, b), n = min(
                pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            merges.append((r + 1, a, b, int(n)))
            merged = a + b
            for k, ss in enumerate(seqs):
                if len(ss) < 2:
                    continue
                out, i = [], 0
                while i < len(ss):
                    if i + 1 < len(ss) and ss[i] == a and ss[i + 1] == b:
                        out.append(merged)
                        i += 2
                    else:
                        out.append(ss[i])
                        i += 1
                seqs[k] = out
        return pd.DataFrame(
            {
                "rank": [m[0] for m in merges],
                "sym_a": [m[1] for m in merges],
                "sym_b": [m[2] for m in merges],
                "pair_count": [m[3] for m in merges],
            }
        )

    rows = (
        syms.withColumn("__g", F.lit(0))
        .groupBy("__g")
        .applyInPandas(
            fn, "rank long, sym_a string, sym_b string, pair_count long"
        )
        .collect()
    )
    return sorted(
        (int(r["rank"]), r["sym_a"], r["sym_b"], int(r["pair_count"]))
        for r in rows
    )


def bpe_learn_merges(
    docs: DataFrame,
    text_col: str,
    n_merges: int = 8,
) -> list[tuple[int, str, str, int]]:
    """Learn an ordered BPE merge table from the corpus: ``n_merges``
    rounds of (pair recount → deterministic argmax → merge apply) over
    the frequency-weighted distinct-word vocabulary.

    Returns ``[(rank, sym_a, sym_b, pair_count), ...]`` — the merge
    rules in application order, each with the pair count that won its
    round. Ties at equal count break by ``(sym_a, sym_b)`` ascending;
    training stops early when no adjacent pair remains.

    Scale: corpus → word counts is the single corpus shuffle; each
    round then costs one VOCAB-sized pair aggregation (+1-row
    collect) and a map-only fold. ``localCheckpoint`` per round
    truncates lineage exactly as the large-star/small-star CC loop
    does (operators/dedup.py) — plan depth stays O(1) per round
    instead of O(rounds).
    """
    if n_merges <= 0:
        raise ValueError("n_merges must be positive")
    syms = (
        word_counts(docs, text_col)
        .select("c", _initial_symbols(F.col("wd")).alias("syms"))
        .localCheckpoint()
    )
    # one cached-block count gates the fused path (r13 optimization
    # round, guide §1.2/§2.4): below _FUSED_BPE_MAX_VOCAB all rounds
    # run in one task — n_merges jobs collapse to one.
    if syms.count() <= _FUSED_BPE_MAX_VOCAB:
        return _bpe_rounds_fused(syms, n_merges)
    merges: list[tuple[int, str, str, int]] = []
    for r in range(n_merges):
        best = (
            _adjacent_pair_counts(syms)
            .orderBy(F.desc("pc"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, pc = best[0]["a"], best[0]["b"], int(best[0]["pc"])
        merges.append((r + 1, a, b, pc))
        syms = syms.select(
            "c", _apply_merge(F.col("syms"), a, b).alias("syms")
        )
        # checkpoint every OTHER round, never the last (r13
        # optimization round — the VERDICT r12 fewer-passes rule):
        # plan depth stays bounded at a few merge folds while the
        # eager materialization jobs halve; an unchecked round's pair
        # count re-runs one vocab-sized map fold instead, which is
        # cheaper than a full checkpoint job. The final round's syms
        # frame is never consumed, so checkpointing it was pure waste.
        if r % 2 == 1 and r < n_merges - 1:
            syms = syms.localCheckpoint()
    return merges


def bpe_learn_merges_df(
    spark: SparkSession, docs: DataFrame, text_col: str, n_merges: int = 8
) -> DataFrame:
    """:func:`bpe_learn_merges` as a DataFrame ``(rank, sym_a, sym_b,
    pair_count)`` — the contract-facing shape (bounded: n_merges
    rows)."""
    rows = bpe_learn_merges(docs, text_col, n_merges)
    return spark.createDataFrame(
        rows, "rank long, sym_a string, sym_b string, pair_count long"
    )


def bpe_segment(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[str, str]],
    checkpoint_every: int = 8,
) -> DataFrame:
    """Apply an ordered BPE merge table to every document, rebuilding
    the corpus as subword sequences: output ``(id, bpe_text,
    n_bpe_tokens)`` with ``bpe_text`` the space-joined symbols in
    document order (symbols are whitespace-free, so the join is
    injective) and token-less documents kept with ``('', 0)``.

    Plan: the merge chain runs ONCE over the distinct-word vocabulary
    (each merge a map-only fold; ``localCheckpoint`` every
    ``checkpoint_every`` merges caps codegen/expression depth), the
    word→symbols map then BROADCASTS back onto the corpus — the
    corpus itself is never shuffled for segmentation; the only
    corpus-sized exchange is the per-document rebuild groupBy.
    """
    if checkpoint_every <= 0:
        raise ValueError("checkpoint_every must be positive")
    words = ensure_min_partitions(docs.select(id_col, text_col)).select(
        F.col(id_col), F.posexplode(tokenize(F.col(text_col))).alias("pos", "wd")
    )
    vocab = words.select("wd").distinct()
    mapping = vocab.select("wd", _initial_symbols(F.col("wd")).alias("syms"))
    for i, (a, b) in enumerate(merges):
        mapping = mapping.select(
            "wd", _apply_merge(F.col("syms"), a, b).alias("syms")
        )
        if (i + 1) % checkpoint_every == 0:
            mapping = mapping.localCheckpoint()
    rebuilt = (
        words.join(F.broadcast(mapping), "wd")
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "syms"))).alias("ps"))
        .select(
            F.col(id_col),
            F.concat_ws(
                " ", F.flatten(F.expr("transform(ps, x -> x.syms)"))
            ).alias("bpe_text"),
            F.expr("aggregate(ps, 0L, (n, x) -> n + size(x.syms))").alias(
                "n_bpe_tokens"
            ),
        )
    )
    return (
        docs.select(id_col)
        .join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("bpe_text"), F.lit("")).alias("bpe_text"),
            F.coalesce(F.col("n_bpe_tokens"), F.lit(0).cast("long")).alias(
                "n_bpe_tokens"
            ),
        )
    )
