"""Text-analysis expression library (EXTENSION — no reference analog).

Everything here is a pure Column expression (JVM-side, whole-stage
codegen): tokenization, n-gram shingling, language-ID heuristic,
quality scoring, fingerprinting. At 100 TB these run in the scan
pipeline with zero Python cost; only simhash (operators/dedup.py) drops
to an Arrow-vectorized pandas UDF.

DuckDB-oracle equivalents are noted per function (the contract tests
assert exact parity).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword sets for the n-gram/stopword language-ID
# heuristic. Deliberately small + hardcoded: the heuristic must be
# reproducible in plain SQL for the oracle.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une", "que", "pour"),
    "de": ("der", "die", "und", "das", "von", "zu", "mit", "den", "ein", "nicht"),
    "zh": ("的", "了", "是", "我", "不", "在", "他", "有", "这", "就"),
}


def tokenize(text: Column) -> Column:
    """Lowercase whitespace tokenization.

    Oracle: ``string_split_regex(lower(text), '\\s+')`` (empty tokens
    filtered on both sides)."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    """Whitespace token count (BIGINT for cross-engine schema parity)."""
    return F.size(tokenize(text)).cast("bigint")


def bpe_ish_token_count(text: Column) -> Column:
    """A BPE-ish proxy token count: word-piece splits on letter/digit
    boundaries + punctuation as single tokens — the cheap "how many LLM
    tokens is this corpus" estimator.

    Oracle: ``len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))``."""
    return F.size(
        F.regexp_extract_all(F.lower(text), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)
    ).cast("bigint")


def word_shingles(tokens: Column, n: int = 3) -> Column:
    """Distinct n-word shingles from a token array.

    Pure expression: ``transform(sequence(...), i -> concat_ws(slice))``;
    empty result when the doc has fewer than ``n`` tokens (guarded —
    ``sequence(1, 0)`` would count DOWN in Spark).

    Oracle: ``list_distinct(list_transform(generate_series(1,
    len(w)-n+1), i -> array_to_string(w[i:i+n-1], ' ')))`` with an
    empty-list CASE guard."""
    idx = F.sequence(F.lit(1), F.size(tokens) - F.lit(n - 1))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i, n)))
    return F.when(F.size(tokens) >= n, F.array_distinct(sh)).otherwise(
        F.array().cast("array<string>")
    )


def jaccard(a: Column, b: Column) -> Column:
    """Set Jaccard of two string arrays (assumed pre-distinct) as
    double. int/int division is exact in both engines.

    Oracle: ``len(list_intersect(a, b)) / len(list_distinct(a || b))``."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def stopword_hits(tokens: Column, lang: str) -> Column:
    """Distinct stopwords of ``lang`` present in the token array."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.array_intersect(F.array_distinct(tokens), sw))


def lang_best(tokens: Column) -> Column:
    """The argmax (neg_hits, lang) struct behind ``lang_id`` — exposed
    so multi-use plans can land it in a column ONCE. Higher-order
    lambdas are exempt from codegen subexpression elimination, so every
    textual repetition of this expression re-runs the 5 array_intersects
    per row; referencing a struct column is free."""
    scored = F.array(
        *[
            F.struct(
                stopword_hits(tokens, lang).alias("hits"), F.lit(lang).alias("lang")
            )
            for lang in sorted(STOPWORDS)
        ]
    )
    # sort ascending by (hits, lang), take the last-hits/first-lang winner:
    # reverse-sort on hits desc with lang asc via negative hits.
    return F.array_sort(
        F.transform(
            scored,
            lambda s: F.struct((-s["hits"]).alias("neg_hits"), s["lang"].alias("lang")),
        )
    )[0]


def lang_from_best(best: Column) -> Column:
    """Decode a ``lang_best`` struct: winner if it had any hits, else
    'und'. Pass a *column reference* to avoid re-evaluating the sort."""
    return F.when(-best["neg_hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def lang_id(tokens: Column) -> Column:
    """Stopword-overlap language ID: argmax over per-language hit
    counts; ties broken by language code order; no hits at all → 'und'.

    Implemented as sort of (hits, lang) structs — deterministic, pure
    expression. Oracle: a greatest/CASE chain over the same counts.
    NOTE: inlines ``lang_best`` twice (condition + value); fine as a
    query's single projection, but multi-use plans should stage
    ``lang_best`` in a column and apply ``lang_from_best``."""
    return lang_from_best(lang_best(tokens))


def quality_score(text: Column, tokens: Column | None = None) -> Column:
    """Heuristic document-quality score in [0, 1]:

    0.25·len_ok + 0.25·mean_word_len_ok + 0.25·(1 - punct_ratio) +
    0.25·min(stopword_ratio·5, 1) — the usual cheap pre-training
    filters (length band, word-shape, punctuation density, stopword
    presence). Deterministic per-row double arithmetic.

    Pass ``tokens`` (a staged column of ``tokenize(text)``) when the
    plan evaluates other token expressions too — inlining tokenize here
    repeats the split per textual use (HOFs skip subexpr elimination).
    """
    toks = tokens if tokens is not None else tokenize(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    len_ok = (n_chars >= 100) & (n_chars <= 20000)
    mean_wl = F.when(n_tok > 0, n_chars / n_tok).otherwise(F.lit(0.0))
    wl_ok = (mean_wl >= 3.0) & (mean_wl <= 12.0)
    n_punct = F.length(text) - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    en_sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    sw_ratio = F.when(
        n_tok > 0, F.size(F.filter(toks, lambda t: F.array_contains(en_sw, t))) / n_tok
    ).otherwise(F.lit(0.0))
    return (
        F.when(len_ok, 0.25).otherwise(0.0)
        + F.when(wl_ok, 0.25).otherwise(0.0)
        + 0.25 * (1.0 - punct_ratio)
        + 0.25 * F.least(sw_ratio * 5.0, F.lit(1.0))
    )


def fingerprint(text: Column) -> Column:
    """Canonical content fingerprint: md5 of lowercased,
    whitespace-collapsed, trimmed text. md5 is byte-identical across
    engines, so fingerprints are portable keys.

    Oracle: ``md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))``."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")))


def word_shingles_all(tokens: Column, n: int = 3) -> Column:
    """ALL n-word shingles (duplicates kept), unlike ``word_shingles``
    which dedups — the denominator for intra-document repetition
    measurement. Same empty-guard as word_shingles.

    Oracle: ``CASE WHEN len(w) >= n THEN list_transform(
    generate_series(1, len(w)-n+1), i -> array_to_string(w[i:i+n-1],
    ' ')) ELSE [] END``."""
    idx = F.sequence(F.lit(1), F.size(tokens) - F.lit(n - 1))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i, n)))
    return F.when(F.size(tokens) >= n, sh).otherwise(
        F.array().cast("array<string>")
    )
