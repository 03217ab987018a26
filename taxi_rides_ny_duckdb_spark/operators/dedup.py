"""Deduplication operators (EXTENSION — no reference analog).

The dedup ladder for a 100 TB corpus, cheapest first:

1. **Exact** (``exact_dedup``): md5 content hash → groupBy. One shuffle
   of 32-byte keys. Always run first; typically removes the bulk.
2. **MinHash + LSH** (``minhash_signatures`` → ``lsh_candidate_pairs``
   → verify): near-dup detection in O(n·K) + band-bucket joins, never
   O(n²). Signatures are pure JVM expressions (xxhash64 per seed over
   the shingle array — no Python, no ML-lib vector overhead).
3. **SimHash** (``simhash``): 64-bit fingerprint via one Arrow-batched
   pandas UDF; hamming-banded candidate pairs.
4. **n-gram Jaccard verify** (``ngram_jaccard_pairs``): the exact
   similarity, used brute-force within small blocks or as the verify
   step after LSH pruning.

Design rule: candidates are found by hashing (linear), verified by
exact Jaccard (quadratic only within tiny buckets). The verified output
is hash-scheme-independent, which is what the DuckDB oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import jaccard, tokenize, word_shingles
from ..session import barrier_filter, ensure_min_partitions

from ..cache import scoped_persist


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup groups: content hash → (canonical id = min id,
    copies). Shuffles only (hash, id) pairs, never document bodies."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_" + id_col),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _portable_seeded(h: Column, seed: int) -> Column:
    """Seeded 60-bit rehash of an int64, engine-portable: md5 of
    '<h>-<seed>' decimal text, last 15 hex chars parsed base-16
    (DuckDB: ``CAST(concat('0x', substr(md5(concat(CAST(h AS VARCHAR),
    '-', '<seed>')), 18, 15)) AS BIGINT)``)."""
    return F.conv(
        F.substring(
            F.md5(F.concat_ws("-", h.cast("string"), F.lit(str(seed)))), 18, 15
        ),
        16,
        10,
    ).cast("long")


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = 32,
    shingle_n: int = 3,
    portable: bool = False,
) -> DataFrame:
    """Per-doc MinHash signature as ``num_perm`` int64 columns folded
    into one array.

    h_i(doc) = min over shingles s of xxhash64(s, seed=i) — the
    "permutation" family is the seeded xxhash64 already in the JVM, so
    the whole signature is array_min(transform(...)) per seed: no UDF,
    no explode, no shuffle. Docs with no shingles are dropped (they
    can't near-dup by shingle overlap). ``portable=True`` swaps both
    hash levels for the md5-derived 60-bit family
    (``portable_hash60`` / ``_portable_seeded``) that a SQL oracle can
    replay exactly — same pipeline, slower hashes; production keeps
    the default."""
    # Two-step projection on purpose: tokens land in a column BEFORE the
    # shingle lambda runs. Inlining tokenize() into the lambda makes
    # Spark re-tokenize the document once per shingle position (HOF
    # lambdas don't share subexpressions with their argument) — ~6×
    # slower measured at sf0.1.
    toks = ensure_min_partitions(df).select(
        F.col(id_col), tokenize(F.col(text_col)).alias("__toks")
    )
    # barrier_filter: a plain filter here gets pushed below the staged
    # projections, re-inlining tokenize+shingles into the condition
    base = barrier_filter(
        toks.select(
            F.col(id_col), word_shingles(F.col("__toks"), shingle_n).alias("shingles")
        ),
        F.size("shingles") > 0,
    )
    # Hash each (variable-length) shingle string exactly ONCE; the
    # num_perm "permutations" then rehash the fixed-width int64 —
    # 32 string hashes per shingle would otherwise dominate runtime.
    base_hash = portable_hash60 if portable else F.xxhash64
    base = base.withColumn(
        "__sh_hashes", F.transform(F.col("shingles"), lambda s: base_hash(s))
    )

    def seeded_min(seed: int):
        # single-param lambda on purpose: a 2-param lambda would be
        # interpreted by Spark as (element, index) and shadow the seed
        if portable:
            return F.array_min(
                F.transform(
                    F.col("__sh_hashes"), lambda h: _portable_seeded(h, seed)
                )
            )
        return F.array_min(
            F.transform(F.col("__sh_hashes"), lambda h: F.xxhash64(h, F.lit(seed)))
        )

    return base.withColumn(
        "minhash", F.array(*[seeded_min(i) for i in range(num_perm)])
    ).drop("__sh_hashes")


def _band_key(b: int, r: int, portable: bool) -> Column:
    """Bucket key for band ``b`` over a ``minhash`` array column:
    xxhash64 of the joined signature slice (fixed 8-byte shuffle key)
    by default; ``portable=True`` keeps the joined STRING itself so a
    SQL oracle groups on the identical key (injective by
    construction)."""
    joined = F.concat_ws(
        ",", *[F.col("minhash")[b * r + j].cast("string") for j in range(r)]
    )
    return joined if portable else F.xxhash64(joined)


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str,
    num_bands: int = 8,
    num_perm: int = 32,
    max_bucket_size: int = 2048,
    portable: bool = False,
) -> DataFrame:
    """Band the signatures (rows_per_band = num_perm/num_bands), bucket
    by (band_idx, band_hash), and emit candidate id pairs (a < b).

    The quadratic blow-up is confined to one bucket: docs sharing a
    band. Shuffle volume is num_bands small rows per doc. Skewed buckets
    (boilerplate-heavy corpora: a bucket with B docs emits B² pairs —
    one million identical-boilerplate docs would emit 5·10¹¹ pairs from
    a single bucket) are the 100×-scale hazard, so buckets larger than
    ``max_bucket_size`` are SALTED: split deterministically into
    ``ceil(B / max_bucket_size)`` sub-buckets by ``xxhash64(id)``, and
    pairs form only within a sub-bucket. That bounds a bucket's output
    at B·max_bucket_size pairs (linear in B). Recall cost is confined to
    the oversized buckets — docs that near-dup share ~num_bands bands,
    giving num_bands independent chances to co-land in some sub-bucket,
    and byte-identical docs are already removed by ``exact_dedup``
    (step 1 of the ladder) before LSH runs. Moderate same-size skew
    below the cap is left to AQE's skew-join split."""
    from pyspark.sql.window import Window

    r = num_perm // num_bands
    bands = F.posexplode(
        F.array(*[_band_key(b, r, portable) for b in range(num_bands)])
    )
    # Bucket size via window count: one shuffle on the same
    # (band_idx, band_hash) key the pair-join needs anyway — no extra
    # agg+join round trip, and AQE sees the true key distribution.
    bucket = Window.partitionBy("band_idx", "band_hash")
    banded = (
        sigs.select(F.col(id_col), bands.alias("band_idx", "band_hash"))
        .withColumn("__bsz", F.count(F.lit(1)).over(bucket))
        .withColumn(
            "__salt",
            # Salt on (id, band_idx) — NOT id alone — so a pair's
            # sub-bucket split is independent per band; otherwise every
            # oversized bucket with the same sub-bucket count splits the
            # pair identically and the "num_bands independent chances"
            # guarantee below is void.
            F.when(F.col("__bsz") <= max_bucket_size, F.lit(0)).otherwise(
                F.pmod(
                    F.xxhash64(F.col(id_col), F.col("band_idx")),
                    F.ceil(F.col("__bsz") / max_bucket_size).cast("long"),
                )
            ),
        )
        .drop("__bsz")
    )
    # merge-hint the self-join (r7, same rationale as the verify-join
    # pin in minhash_lsh_dedup_pairs): `banded` is data-sized —
    # num_bands rows per document — but its shuffle bytes compress so
    # well on repetitive corpora (identical band keys) that the
    # broadcast-size accounting can judge one side broadcastable and
    # build a corpus-sized HashedRelation. Both sides are the same
    # frame; at scale this join must be the co-partitioned sort-merge.
    a = banded.alias("a").hint("merge")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.__salt") == F.col("b.__salt"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def minhash_lsh_dedup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    num_perm: int = 32,
    num_bands: int = 8,
    shingle_n: int = 3,
    portable: bool = False,
    max_bucket_size: int = 2048,
) -> DataFrame:
    """Full near-dup pipeline: signatures → LSH candidates → exact
    Jaccard verify ≥ threshold. Output (id_a, id_b, jaccard_sim) is
    independent of the hash scheme (modulo LSH recall); with
    ``portable=True`` the scheme itself is engine-replayable, so even
    the candidate SET is oracle-checkable.

    ``max_bucket_size`` passes through to ``lsh_candidate_pairs``'s
    oversized-bucket salting. An oracle that keeps full buckets must
    disable it (pass an effectively-infinite cap) or its candidate set
    silently diverges once any band bucket outgrows the cap."""
    # Persist: signatures feed the band join AND both sides of the
    # verify join — without a materialization boundary Catalyst inlines
    # the (expensive) signature expressions into every consumer.
    sigs = minhash_signatures(
        df, text_col, id_col, num_perm, shingle_n, portable=portable
    ).transform(scoped_persist)
    cands = lsh_candidate_pairs(
        sigs, id_col, num_bands, num_perm,
        max_bucket_size=max_bucket_size, portable=portable,
    )
    # merge-hint the shingle side of the verify joins (r7, found by the
    # sf10 probe): the (id, shingles) frame is DATA-SIZED — the whole
    # corpus's shingle arrays — but repeated-text corpora compress its
    # SHUFFLE bytes so well that AQE's compressed-size accounting can
    # judge it broadcastable and then build a multi-GB in-memory
    # HashedRelation from a "small" exchange (observed: a ~1 GB
    # broadcast build OOMing an 8 g heap at sf10 while the final plan
    # on a retry was plain SMJ). Same hazard class and same fix as the
    # q9/q4 fact-projection pins; measured neutral-to-faster at sf0.1.
    sh = sigs.select(F.col(id_col), F.col("shingles")).hint("merge")
    return (
        cands.join(sh.withColumnsRenamed({id_col: "id_a", "shingles": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({id_col: "id_b", "shingles": "sh_b"}), "id_b")
        .withColumn("jaccard_sim", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard_sim") >= threshold)
        .select("id_a", "id_b", "jaccard_sim")
    )


def incremental_minhash_dedup(
    batch: DataFrame,
    history_sigs: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    num_perm: int = 32,
    num_bands: int = 8,
    shingle_n: int = 3,
    portable: bool = False,
    max_history_bucket: int = 65536,
) -> DataFrame:
    """Incremental near-dup detection: match a NEW batch against a
    PERSISTED history signature index — the daily-ingest shape at
    100 TB, where re-running ``minhash_lsh_dedup_pairs`` over
    history ∪ batch would re-pair the (enormous, already-deduped)
    history with itself every day. Here history contributes zero
    quadratic work: its signatures are computed ONCE
    (``minhash_signatures`` over the historical corpus — persist the
    output, ideally bucketed on the band key via
    ``operators.scale.write_bucketed`` so daily joins never reshuffle
    it), and each batch pays only its own signature pass plus an
    (batch-bands × history-bands) bucket join.

    ``history_sigs`` must carry (id, minhash, shingles) — exactly what
    ``minhash_signatures`` emits — computed with the SAME num_perm /
    shingle_n / portable scheme (the signature is the index contract;
    mixing schemes silently yields zero matches).

    ``max_history_bucket``: a history band bucket larger than this is
    boilerplate-keyed (one band key shared by ≳64 k docs) and is
    DROPPED from candidate generation — its matches are better handled
    by ``remove_duplicated_spans``; keeping it would fan every
    colliding batch doc out against the whole bucket. Bounded loss,
    explicitly chosen; raise the cap to 2**31 for exact parity with a
    full-bucket oracle.

    Output: (batch_id, history_id, jaccard_sim) for verified matches —
    the batch docs to drop (or link) before appending to history.
    """
    from pyspark.sql.window import Window

    r = num_perm // num_bands
    bands = F.posexplode(
        F.array(*[_band_key(b, r, portable) for b in range(num_bands)])
    )
    bsigs = minhash_signatures(
        batch, text_col, id_col, num_perm, shingle_n, portable=portable
    ).transform(scoped_persist)
    hb = history_sigs.select(
        F.col(id_col).alias("history_id"), bands.alias("band_idx", "band_hash")
    ).withColumn(
        "__hbsz", F.count(F.lit(1)).over(Window.partitionBy("band_idx", "band_hash"))
    ).filter(F.col("__hbsz") <= max_history_bucket).drop("__hbsz")
    bb = bsigs.select(
        F.col(id_col).alias("batch_id"), bands.alias("band_idx", "band_hash")
    )
    # merge-pin, same hazard class as every pair-finder join (r7 sf10
    # probe): band frames are data-sized but compress to "small"
    # shuffle bytes; a broadcast build of the history side is the OOM.
    cands = (
        bb.hint("merge")
        .join(hb, ["band_idx", "band_hash"])
        .select("batch_id", "history_id")
        .distinct()
    )
    hsh = history_sigs.select(
        F.col(id_col).alias("history_id"), F.col("shingles").alias("sh_h")
    ).hint("merge")
    bsh = bsigs.select(
        F.col(id_col).alias("batch_id"), F.col("shingles").alias("sh_b")
    ).hint("merge")
    return (
        cands.join(bsh, "batch_id")
        .join(hsh, "history_id")
        .withColumn("jaccard_sim", jaccard(F.col("sh_b"), F.col("sh_h")))
        .filter(F.col("jaccard_sim") >= threshold)
        .select("batch_id", "history_id", "jaccard_sim")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float,
    block_cols: tuple[str, ...] = (),
    shingle_n: int = 3,
    round_dp: int | None = None,
) -> DataFrame:
    """Exact pairwise n-gram Jaccard ≥ threshold via an INVERTED-INDEX
    self-join (AllPairs/PPJoin family), optionally blocked on equality
    columns (e.g. lang). Result is IDENTICAL to the brute-force
    all-pairs ``jaccard(array, array)`` formulation for any
    ``threshold > 0`` — a qualifying pair shares ≥1 shingle, so it
    appears in the index join; |A∪B| = |A|+|B|−|A∩B| exactly because
    per-doc shingles are distinct — but the work is proportional to
    actual shingle co-occurrence, not |block|² array intersections:

    1. explode (doc, shingle) — narrow;
    2. self-join on (shingle, blocks) with id_a < id_b and a LOSSLESS
       size-ratio prune (J ≤ min/max ⇒ |A| ≥ t·|B| and |B| ≥ t·|A|,
       with 1e-9 slack so round-before-threshold can never be cut);
    3. groupBy pair → COUNT(*) = |A∩B| (map-side combined);
    4. jaccard from (n_a, n_b, inter), round, filter.

    At sf0.1 this is ~20× faster than the pairwise-array form (0.7 s
    vs 14.5 s) and at 100 TB it is the only viable exact shape: the
    shuffles are keyed by shingle then by pair, both data-sized, and a
    stop-shingle's f² pair blow-up is the documented hazard that the
    MinHash-LSH path exists to avoid. Brute force remains only for
    ``threshold <= 0`` (every pair qualifies, index buys nothing).

    ``round_dp`` applies round-before-threshold (same 9dp trick as the
    ANN rank paths): the similarity is rounded BEFORE the ≥ filter so
    a pair sitting exactly on the threshold boundary cannot flip
    in/out of the result on a 1-ulp cross-engine difference. Jaccard
    here is a single int/int IEEE division so both engines agree
    bit-for-bit in practice, but the contract query pins 9dp so the
    guarantee is by construction, not by luck."""
    # Two-step tokens→shingles projection (see minhash_signatures note);
    # barrier_filter keeps the size() gate from re-inlining it, and
    # persist keeps the a/b sides of the self-join from re-shingling
    # the corpus twice (same pattern as the simhash fingerprint persist).
    sh = barrier_filter(
        ensure_min_partitions(df)
        .select(
            F.col(id_col),
            *[F.col(c) for c in block_cols],
            tokenize(F.col(text_col)).alias("__toks"),
        )
        .select(
            F.col(id_col),
            *[F.col(c) for c in block_cols],
            word_shingles(F.col("__toks"), shingle_n).alias("shingles"),
        ),
        F.size("shingles") > 0,
    ).transform(scoped_persist)

    if threshold <= 0:  # degenerate: index prunes nothing — brute force
        # merge-hint: both sides are the corpus's shingle arrays
        # (data-sized); see the broadcast-compression hazard note in
        # minhash_lsh_dedup_pairs (r7).
        a, b = sh.alias("a").hint("merge"), sh.alias("b")
        cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
        for c in block_cols:
            cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
        sim = jaccard(F.col("a.shingles"), F.col("b.shingles"))
        if round_dp is not None:
            sim = F.round(sim, round_dp)
        return (
            a.join(b, cond)
            .withColumn("jaccard_sim", sim)
            .filter(F.col("jaccard_sim") >= threshold)
            .select(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                "jaccard_sim",
            )
        )

    ex = sh.select(
        F.col(id_col),
        *[F.col(c) for c in block_cols],
        F.size("shingles").alias("__n"),
        F.explode("shingles").alias("__s"),
    )
    # merge-hint: both sides are the exploded (id, shingle) stream —
    # strictly data-sized (≫ corpus rows); a broadcast here would build
    # an exploded-corpus-sized hashed relation. Same hazard class as
    # the minhash pins (r7).
    a, b = ex.alias("a").hint("merge"), ex.alias("b")
    cond = (
        (F.col("a.__s") == F.col("b.__s"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        # lossless size-ratio prune (slack covers round_dp uplift)
        & (F.col("a.__n") >= F.lit(threshold - 1e-9) * F.col("b.__n"))
        & (F.col("b.__n") >= F.lit(threshold - 1e-9) * F.col("a.__n"))
    )
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    inter = (
        a.join(b, cond)
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.__n").alias("__na"),
            F.col("b.__n").alias("__nb"),
        )
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    sim = F.col("__inter") / (F.col("__na") + F.col("__nb") - F.col("__inter"))
    if round_dp is not None:
        sim = F.round(sim, round_dp)
    return (
        inter.withColumn("jaccard_sim", sim)
        .filter(F.col("jaccard_sim") >= threshold)
        .select("id_a", "id_b", "jaccard_sim")
    )


# ---------------------------------------------------------------------------
# SimHash — 64-bit fingerprints via one vectorized pandas UDF.
# ---------------------------------------------------------------------------


def _simhash_from_hashes(hashes):  # pragma: no cover - exercised via Spark
    import numpy as np
    import pandas as pd

    out = np.zeros(len(hashes), dtype=np.int64)
    for row_i, hs in enumerate(hashes):
        if hs is None or len(hs) == 0:
            continue
        arr = np.asarray(hs, dtype=np.int64).astype(np.uint64)
        bits = ((arr[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
        counts = bits.sum(axis=0)  # ones per bit position
        maj = (counts * 2 >= len(arr)).astype(np.uint64)  # majority vote
        out[row_i] = np.int64((maj << np.arange(64, dtype=np.uint64)).sum().astype(np.uint64))
    return pd.Series(out)


def portable_hash60(t):
    """60-bit token hash reproducible in any SQL engine with md5:
    the last 15 hex chars of md5 parsed base-16 (DuckDB:
    ``CAST(concat('0x', substr(md5(t), 18, 15)) AS BIGINT)``). Slower
    than xxhash64 (md5 + string slice per token) — use only where the
    fingerprints themselves must be oracle-verifiable."""
    return F.conv(F.substring(F.md5(t), 18, 15), 16, 10).cast("long")


def simhash(
    df: DataFrame,
    text_col: str,
    id_col: str,
    token_hash=None,
    num_bits: int = 64,
) -> DataFrame:
    """``num_bits``-wide SimHash per document (default 64).

    Token hashing stays JVM-side (``token_hash``, default seeded
    xxhash64); only the bit-majority vote runs in Python — one
    Arrow-batched pandas UDF over an int64 array column, vectorized
    with numpy bit tricks. Linear scan, no shuffle. Pass
    ``token_hash=portable_hash60, num_bits=60`` for a fingerprint an
    external SQL oracle can recompute exactly (the majority vote is
    width-agnostic: bit positions above the hash width never reach
    majority, so the same UDF serves both schemes).

    Output columns: (``id_col``, ``simhash``) — the fingerprint column
    name is a fixed contract with ``simhash_candidate_pairs`` (ADVICE
    r4: previously 'simhash64', misleading for non-64-bit widths)."""
    from pyspark.sql.functions import pandas_udf

    if token_hash is None:
        token_hash = F.xxhash64
    fn = pandas_udf(_simhash_from_hashes, "long")
    token_hashes = F.transform(
        F.array_distinct(tokenize(F.col(text_col))), lambda t: token_hash(t)
    )
    return ensure_min_partitions(df).select(F.col(id_col), fn(token_hashes).alias("simhash"))


def simhash_candidate_pairs(
    hashed: DataFrame, id_col: str, max_hamming: int = 3, num_bits: int = 64
) -> DataFrame:
    """Near-dup candidates by SimHash: band the ``num_bits``-wide hash
    into ``max_hamming + 1`` chunks (pigeonhole: hamming ≤ h ⇒ at least
    one of h+1 chunks identical), bucket-join on (chunk_idx, chunk),
    verify exact hamming distance via bit_count(xor). Same
    candidates-then-verify economics as MinHash-LSH.

    ``hashed`` must carry the fingerprint in a ``simhash`` column —
    the fixed output contract of ``simhash()`` above."""
    # Persist the fingerprints (16 bytes/doc) before the self-join:
    # without the materialization boundary, (a) both join sides re-run
    # the pandas-UDF lineage, and (b) the inferred isnotnull(join key)
    # constraint gets pushed below the repartition and evaluates the
    # UDF a second time per side — 4 Python passes for 1 (measured).
    # Same persist-the-small-derivative pattern as minhash_lsh above.
    hashed = hashed.transform(scoped_persist)
    n_chunks = max_hamming + 1
    chunk_bits = num_bits // n_chunks
    mask = (1 << chunk_bits) - 1
    chunks = F.posexplode(
        F.array(
            *[
                F.shiftrightunsigned(F.col("simhash"), chunk_bits * i).bitwiseAND(
                    F.lit(mask)
                )
                for i in range(n_chunks)
            ]
        )
    )
    banded = hashed.select(F.col(id_col), F.col("simhash"), chunks.alias("chunk_idx", "chunk"))
    # merge-hint: n_chunks rows per document on both sides — data-sized
    # self-join; see the broadcast-compression hazard note in
    # minhash_lsh_dedup_pairs (r7).
    a = banded.alias("a").hint("merge")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias(
                "hamming"
            ),
        )
        # filter BEFORE distinct: the hamming test is per-row cheap and
        # prunes the candidate explosion before it hits the dedup shuffle
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def _union_find(edge_list, node_ids):
    """Driver-side union-find with path compression; returns
    {id: min id of its component}."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min so the root IS the component id
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {n: find(n) for n in node_ids}


def _star_components(sym: DataFrame, ids: DataFrame, max_iter: int) -> DataFrame:
    """Distributed CC via alternating large-star/small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the skew-robust alternative to min-label propagation:
    each round REWRITES the edge set toward a star rooted at the
    component minimum, so a high-degree hub's neighborhood collapses
    in O(1) rounds instead of fanning its label through every
    neighbor list again and again; total rounds are O(log n) on any
    graph, independent of diameter AND degree skew.

    ``sym``: symmetric edge list (src, dst) both directions.
    Returns (id, component) covering every id in ``ids``.

    large-star(u): m = min(Γ(u) ∪ {u}); emit (v, m) for v ∈ Γ(u),
    v > u. small-star(u), over canonical big→small edges: m =
    min(Γ₋(u) ∪ {u}); emit (v, m) for v ∈ Γ₋(u) ∪ {u}, v ≠ m. Both
    emit canonical (big, small) pairs, so the invariant holds for
    free. Convergence = edge multiset stable, detected by
    (count, xxhash64-sum) — one tiny aggregate per round instead of
    an exceptAll shuffle (a 64-bit collision masking a real change is
    ~2⁻⁶⁴ per round; the union-find property tests pin equivalence).
    At the fixpoint the edges ARE the answer: every non-minimum node
    holds exactly one edge to its component minimum."""
    e = (
        sym.filter(F.col("src") != F.col("dst"))
        .select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _sig(df: DataFrame) -> tuple:
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal sum: a long sum of 2^63-scale hashes overflows
            # ANSI arithmetic after ~2 rows
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (r["n"], r["h"])

    sig = _sig(e)
    for _ in range(max_iter):
        # large-star: neighbors strictly above u link to u's minimum.
        s = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        mins = (
            s.groupBy("src")
            .agg(F.min("dst").alias("__mn"))
            .select("src", F.least("__mn", F.col("src")).alias("__m"))
        )
        large = (
            s.join(mins, "src")
            .where(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("__m").alias("dst"))
            .distinct()
        )
        # small-star over canonical edges: everything at-or-below u
        # (plus u itself) links to the minimum.
        mins2 = (
            large.groupBy("src")
            .agg(F.min("dst").alias("__mn"))
            .select("src", F.least("__mn", F.col("src")).alias("__m"))
        )
        nbrs = large.select("src", "dst").union(
            large.select("src", F.col("src").alias("dst")).distinct()
        )
        e = (
            nbrs.join(mins2, "src")
            .where(F.col("dst") != F.col("__m"))
            .select(F.col("dst").alias("src"), F.col("__m").alias("dst"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        new_sig = _sig(e)
        if new_sig == sig:
            break
        sig = new_sig
    # Final per-id canonicalization (ADVICE r6): if max_iter exhausts
    # before the edge multiset stabilizes (or a 2^-64 signature
    # collision masks a change), a node can still hold edges to two
    # targets; without this groupBy that would emit duplicate
    # (id, component) rows silently. At the fixpoint it's a no-op, and
    # it runs at id-pair size — never document-sized.
    return (
        ids.join(
            e.select(F.col("src").alias("id"), F.col("dst").alias("component")),
            "id",
            "left",
        )
        .groupBy("id")
        .agg(F.min(F.coalesce("component", "id")).alias("component"))
    )


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    nodes: DataFrame | None = None,
    max_iter: int = 50,
    driver_threshold_edges: int = 1_000_000,
    algorithm: str = "auto",
    emit: str = "full",
) -> DataFrame:
    """Transitive closure over a near-dup pair list: (id, component)
    where component = min node id reachable through the pairs.

    Every pair-finder above emits EDGES; collapsing a corpus needs
    CLUSTERS (a≈b, b≈c ⇒ {a,b,c} is one group even if a≉c).

    Size-gated physical strategy, the same economics as Catalyst's
    broadcast-vs-sort-merge choice: the edge list is a tiny derivative
    of the corpus (near-dup pairs, not documents), so when it fits the
    driver comfortably (≤ ``driver_threshold_edges``), collect it and
    run union-find with path compression — O(E α(E)), 4 small jobs
    total. Above the threshold, ``algorithm`` picks the distributed
    strategy:

    - ``"star"`` (and the ``"auto"`` default above the gate):
      alternating large-star/small-star (Kiveris et al., "Connected
      Components in MapReduce and Beyond") — O(log n) rounds
      regardless of graph diameter or degree skew, because each round
      REWRITES edges toward the component-minimum star instead of
      re-flooding a hub's full neighbor list. The web-scale choice.
    - ``"label"``: min-label propagation with a pointer-jump shortcut
      (Shiloach-Vishkin): each round every node's label becomes
      min(label, neighbors' labels, label-of-label). Kept as the
      independent second implementation the property tests compare
      against (three-way: union-find ≡ label ≡ star on random graphs
      plus hub/chain fixtures).
    - ``"driver"``: force the union-find path regardless of size.

    Both distributed paths ``localCheckpoint`` per round (an iterative
    plan otherwise grows a join per round until analysis dominates)
    and shuffle only (id, id)-sized pairs — never document payloads.

    ``nodes``: optional single-column DataFrame of ALL ids; members
    absent from ``edges`` come back as singleton components (a corpus
    dedup must keep non-duplicated documents).

    ``emit="mapping"`` (r13): return rows ONLY for edge-touched ids —
    every id absent from the result is its own singleton component by
    definition, so the caller applies the closure as
    ``corpus LEFT JOIN mapping`` + ``coalesce(component, id)`` instead
    of joining a corpus-sized (id, component) frame. On the
    driver/union-find path the mapping is a LITERAL frame (collected
    pairs → createDataFrame): zero upstream lineage, broadcast-sized,
    so the closure costs the consumer one broadcast hash join — no
    corpus exchange, no nodes distinct, no singleton anti-join. The
    semdedup collapse tail runs on this. ``nodes`` is ignored under
    ``emit="mapping"``.
    """
    if algorithm not in ("auto", "star", "label", "driver"):
        raise ValueError(
            f"algorithm must be one of 'auto', 'star', 'label', 'driver'; "
            f"got {algorithm!r}"
        )
    if emit not in ("full", "mapping"):
        raise ValueError(f"emit must be 'full' or 'mapping', got {emit!r}")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    ids = sym.select(F.col("src").alias("id")).distinct()
    if nodes is not None and emit == "full":
        first = nodes.columns[0]
        ids = ids.union(nodes.select(F.col(first).alias("id"))).distinct()

    e = e.persist()
    # Gate = one map-side COUNT over the cached edges, then collect
    # only when it passes. (r13 note: a limit(threshold+1)-collect
    # probe that fused gate+fetch into one action was tried and
    # REVERTED — when the graph is big it ships threshold+1 rows to
    # the driver for nothing before the distributed path runs;
    # measured ~5-10 s of pure py4j deserialization on the 2.4M-edge
    # sf10 semdedup graph, against ~0.2 s saved at the correctness SF.)
    out_type = dict(ids.dtypes)["id"]
    if algorithm == "driver" or (
        algorithm == "auto" and e.count() <= driver_threshold_edges
    ):
        edge_list = [(r["src"], r["dst"]) for r in e.collect()]
        e.unpersist()
        # Union-find over EDGE-TOUCHED ids only (r13): the old path
        # collected every node id to the driver and rebuilt the full
        # (id, component) frame there — bounded edges but UNBOUNDED
        # nodes (a 100 TB corpus with a handful of near-dup pairs
        # would ship every id through the driver). Touched ids are
        # ≤ 2·|edges| (bounded by the same gate); untouched nodes are
        # singletons by definition and map to themselves DISTRIBUTED,
        # via one left join against the small mapping frame (AQE
        # broadcasts it) — no corpus-sized driver sync anywhere.
        touched = sorted({x for ab in edge_list for x in ab})
        comp = _union_find(edge_list, touched)
        spark = edges.sparkSession
        mapping = spark.createDataFrame(
            [(n, comp[n]) for n in touched],
            schema=f"id {out_type}, component {out_type}",
        )
        if emit == "mapping" or nodes is None:
            return mapping
        singles = (
            nodes.select(F.col(first).alias("id"))
            .distinct()
            .join(mapping.select("id"), "id", "left_anti")
            .select(F.col("id"), F.col("id").alias("component"))
        )
        return mapping.union(singles)
    # Distributed path: checkpoint sym AND ids off the still-cached
    # edge frame BEFORE dropping it. The previous order (unpersist,
    # then let the star/label path checkpoint sym and read ids from
    # raw lineage) re-evaluated the caller's pair-finder 2-3× — for
    # semdedup_auto at sf10 that was a 25M-candidate cosine join run
    # three times: 119.5 s collapse vs 41 s with the cache held
    # (profiled r9). Edges are (id, id)-sized; the checkpoints are
    # cheap and every round localCheckpoints anyway.
    sym = sym.localCheckpoint(eager=True)
    ids = ids.localCheckpoint(eager=True)
    e.unpersist()

    if algorithm in ("star", "auto"):
        return _star_components(sym, ids, max_iter)

    labels = ids.withColumn("component", F.col("id")).localCheckpoint(eager=True)
    sym = sym.localCheckpoint(eager=True)
    for _ in range(max_iter):
        cand = sym.join(
            labels.withColumnRenamed("id", "src"), "src"
        ).select(F.col("dst").alias("id"), "component")
        stepped = (
            labels.select("id", "component")
            .union(cand)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        )
        # Pointer-jump shortcut (Shiloach-Vishkin): follow the label one
        # more step — id's label becomes min(label, label-of-label).
        # Labels are node ids and `stepped` covers every node, so the
        # self-join always hits. Propagation distance doubles per round:
        # a diameter-d chain converges in O(log d) rounds instead of d
        # (measured 8 → 4 rounds on the sf0.1 near-dup graph, and each
        # round is fixed-cost-dominated at any data size).
        jump = stepped.select(
            F.col("id").alias("component"), F.col("component").alias("__jump")
        )
        new = (
            stepped.join(jump, "component")
            .select("id", F.least("component", "__jump").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.join(labels.withColumnRenamed("component", "old"), "id")
            .filter(F.col("component") != F.col("old"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    return labels


def cluster_dedup(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Collapse near-dup clusters to one survivor each: connected
    components over ``pairs``, keep the min-id member per component
    (deterministic — safe to rerun, safe to oracle). Rows of ``df``
    not mentioned in ``pairs`` are singletons and always survive."""
    comp = connected_components(pairs, src, dst, nodes=df.select(id_col))
    survivors = comp.filter(F.col("id") == F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(survivors, id_col, "inner")


def edit_distance_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_distance: int,
    block_exprs: list,
    broadcast_build: bool = False,
) -> DataFrame:
    """Near-dup pairs by bounded Levenshtein distance within blocks.

    All-pairs edit distance is O(n²·len²) — never viable at corpus
    scale. The standard fix is blocking: only compare documents that
    agree on cheap invariants near-dups must share (language, coarse
    length bucket, a fingerprint prefix...). ``block_exprs`` ARE the
    semantics: the operator finds pairs within ``max_distance`` that
    agree on every block expression — a recall/cost dial the caller
    owns (an edit of k changes length by ≤ k, so a length bucket of
    width ≥ 2k+1 with neighbor overlap is lossless; a single bucketing
    trades the boundary-straddling pairs for one fewer self-join).

    Physically: the probe side is spread to full parallelism first
    (``ensure_min_partitions`` — a small input otherwise arrives as one
    partition and the whole pair scan runs in ONE task; measured 3.8 s
    → 0.5 s at sf0.1), joined on the block key, then Spark's threshold
    form of ``levenshtein`` — which abandons a pair once the running
    minimum exceeds ``max_distance`` (O(k·len) per pair, not O(len²))
    — runs as the join residual, so distance compute parallelizes with
    the probe side, not with the (few, skewed) block keys.
    ``broadcast_build=True`` broadcasts the build side — right whenever
    one copy of the corpus slice fits an executor; at corpus sizes past
    that, leave False: the block-keyed sort-merge join takes one
    shuffle per side and AQE skew-split handles oversized blocks.
    Emits (id_a < id_b, distance)."""
    from ..session import ensure_min_partitions

    blocks = [e.alias(f"__b{i}") for i, e in enumerate(block_exprs)]
    keys = [f"__b{i}" for i in range(len(block_exprs))]
    base = df.select(
        F.col(id_col), F.col(text_col), *blocks
    )
    a = ensure_min_partitions(
        base.select(
            *keys,
            F.col(id_col).alias("id_a"),
            F.col(text_col).alias("text_a"),
        )
    )
    b = base.select(
        *keys,
        F.col(id_col).alias("id_b"),
        F.col(text_col).alias("text_b"),
    )
    if broadcast_build:
        b = F.broadcast(b)
    else:
        # merge-hint unless the caller explicitly opted into a
        # broadcast build: both sides carry full document text —
        # data-sized, and highly compressible in shuffle form (the
        # broadcast-accounting hazard of minhash_lsh_dedup_pairs, r7).
        a = a.hint("merge")
    dist = F.levenshtein(F.col("text_a"), F.col("text_b"), max_distance)
    return (
        a.join(b, on=keys)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dist.alias("distance"))
        .filter(F.col("distance") >= 0)  # threshold form returns -1 above k
        .withColumn("distance", F.col("distance").cast("bigint"))
    )


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing at
    least one word ``shingle_n``-gram with a benchmark/eval set, with
    the count of distinct overlapping shingles (the standard
    train-set hygiene step before pretraining — contaminated docs are
    dropped or audited).

    Scale shape: the benchmark is tiny relative to the corpus, so its
    distinct shingle set BROADCASTS; the corpus side is one explode +
    broadcast-hash semi-join + per-doc count — no shuffle of corpus
    text, no pairwise anything. The corpus shingle explode is the same
    staged tokens→shingles projection as the MinHash path (HOF staging
    law)."""

    def shingles_of(df: DataFrame) -> DataFrame:
        toks = ensure_min_partitions(df).select(
            F.col(id_col), tokenize(F.col(text_col)).alias("__toks")
        )
        return toks.select(
            F.col(id_col),
            F.explode(
                F.array_distinct(word_shingles(F.col("__toks"), shingle_n))
            ).alias("sh"),
        )

    bench_sh = F.broadcast(shingles_of(benchmark).select("sh").distinct())
    return (
        shingles_of(corpus)
        .join(bench_sh, "sh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )

def bloom_bitset(
    shingles: DataFrame, sh_col: str, m_bits: int, k: int
) -> list[int]:
    """Build a Bloom-filter bitset (packed int64 words) over a shingle
    column, distributed-first: each shingle expands to its ``k`` bit
    positions JVM-side (``xxhash64(sh, seed)`` pmod ``m_bits``), the
    DISTINCT positions are aggregated, and only those reach the driver.

    The driver transfer is bounded by ``m_bits`` (≤ m distinct
    positions), NOT by the shingle count — a 100 M-shingle benchmark
    suite and a 1 k-shingle one both ship ≤ m/8 bytes. That is the
    whole point: the bitset is a constant-size summary of an
    arbitrarily large set.
    """
    if m_bits % 64 != 0:
        raise ValueError("m_bits must be a multiple of 64")
    pos = shingles.select(
        F.explode(
            F.array(
                *[
                    F.pmod(
                        F.xxhash64(F.col(sh_col), F.lit(i)), F.lit(m_bits)
                    ).cast("long")
                    for i in range(k)
                ]
            )
        ).alias("p")
    ).distinct()
    words = [0] * (m_bits // 64)
    for row in pos.collect():
        p = int(row["p"])
        words[p // 64] |= 1 << (p % 64)
    # Python ints are unbounded; re-pack bit 63 into the int64 sign bit.
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_prefilter_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 8,
    m_bits: int = 1 << 17,
    k: int = 5,
) -> DataFrame:
    """``ngram_contamination`` with a Bloom prefilter — same EXACT
    output (false positives are eliminated by a verify join), different
    scale economics.

    The broadcast-semi-join path in ``ngram_contamination`` assumes the
    benchmark shingle set fits in executor memory as a *hash relation*
    (~50 bytes/entry).  When the eval suite is large (every benchmark
    ever published, ~10⁸ shingles ≈ 5 GB hashed), that stops being
    broadcastable — but a Bloom bitset of the same set is m/8 bytes
    (16 KiB at the default 2¹⁷ bits; 120 MB for a 10⁸-shingle set at
    10 bits/key), and it ships inside the plan as a literal array of
    int64 words evaluated in whole-stage codegen.

    Pipeline (all JVM until the final tiny join):

    1. ``bloom_bitset`` over the benchmark shingles (driver cost
       bounded by m, not by benchmark size).
    2. Corpus shingles test all ``k`` bits map-side — the expected
       survivor rate is the contamination rate + the FP rate
       ~(1-e^{-kn/m})^k: at the defaults with n ≈ 3·10³ benchmark
       shingles that is ~10⁻⁵; sizing m at ~10 bits per key holds ~1 %
       at ANY n. Either way almost nothing non-contaminated shuffles,
       and FPs only cost a little verify-join traffic, never
       correctness.
    3. Survivors verify against the exact benchmark shingle set with a
       plain (shuffle) semi-join — correct even when the benchmark is
       NOT broadcastable, and cheap because only survivors shuffle.

    The final per-doc distinct-overlap counts are bit-for-bit the same
    as ``ngram_contamination`` — which is what the oracle checks.
    """

    def shingles_of(df: DataFrame) -> DataFrame:
        toks = ensure_min_partitions(df).select(
            F.col(id_col), tokenize(F.col(text_col)).alias("__toks")
        )
        return toks.select(
            F.col(id_col),
            F.explode(
                F.array_distinct(word_shingles(F.col("__toks"), shingle_n))
            ).alias("sh"),
        )

    bench_sh = shingles_of(benchmark).select("sh").distinct()
    words = bloom_bitset(bench_sh, "sh", m_bits, k)

    # Stage the k bit positions as columns, then test each against the
    # literal word array. shiftleft/element_at/& are all plain codegen
    # expressions — the whole prefilter is one map-only stage.
    cand = shingles_of(corpus).select(
        "*",
        F.lit(words).alias("__bloom_bits"),
        *[
            F.pmod(F.xxhash64(F.col("sh"), F.lit(i)), F.lit(m_bits))
            .cast("long")
            .alias(f"__p{i}")
            for i in range(k)
        ],
    )
    bit_tests = [
        F.expr(
            f"(element_at(__bloom_bits, CAST(__p{i} DIV 64 AS INT) + 1)"
            f" & shiftleft(1L, CAST(__p{i} % 64 AS INT))) != 0"
        )
        for i in range(k)
    ]
    test = bit_tests[0]
    for t in bit_tests[1:]:
        test = test & t
    cand = cand.filter(test).select(id_col, "sh")

    return (
        cand.join(bench_sh, "sh", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )


def cluster_representatives(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    score_col: str,
    src: str = "id_a",
    dst: str = "id_b",
    components: DataFrame | None = None,
) -> DataFrame:
    """Quality-aware cluster collapse: like ``cluster_dedup`` but the
    survivor per near-dup cluster is the HIGHEST-``score_col`` member
    (ties → min id), not the min id — the policy a curation pipeline
    actually wants: when five scrapes of the same article survive to
    the cluster stage, keep the cleanest one, not the first-crawled.

    Returns (component, ``id_col``, ``score_col``) — one row per
    cluster (singletons included). Plan: connected components over the
    pair list (size-gated / star variants, see
    ``connected_components``), join scores back, one window rank per
    component — the window shuffles (component, id, score) triples
    only, never document bodies. ``components``: optional precomputed
    cluster index (id, component) — the shared-index shape (one CC
    per corpus snapshot, many consumers), r10."""
    from pyspark.sql.window import Window

    comp = (
        components
        if components is not None
        else connected_components(pairs, src, dst, nodes=df.select(id_col))
    )
    # Alias the score frame's columns before joining: when id_col is
    # 'id' (or 'component') an unqualified F.col(id_col) would be
    # ambiguous between the two join sides (ADVICE r6).
    scores = df.select(
        F.col(id_col).alias("__rid"), F.col(score_col).alias("__rscore")
    )
    scored = comp.join(scores, comp["id"] == F.col("__rid")).select(
        "component",
        F.col("__rid").alias(id_col),
        F.col("__rscore").alias(score_col),
    )
    w = Window.partitionBy("component").orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    w: int = 4,
    token_hash=None,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting",
    SIGMOD'03 — the MOSS algorithm): hash every ``k``-token shingle,
    slide a window of ``w`` consecutive shingle hashes, and keep each
    window's MINIMUM — a provably bounded-density fingerprint set that
    still guarantees every shared run of ``k + w - 1`` tokens between
    two documents shares at least one selected fingerprint. The
    standard copy-detection sketch where MinHash answers "how similar
    are these documents?" but winnowing answers "do they share a
    PASSAGE?" (plagiarism / license-text / quote detection).

    Output: one row per (document, selected fingerprint) —
    ``(id_col, fingerprint)``, distinct per document. A doc with fewer
    than ``k`` tokens yields no rows; with fewer than ``w`` shingles it
    yields its single global-minimum hash (the window degenerates
    gracefully — rowsBetween truncates at the partition edge).

    Physical shape — EXPLODED rows, not per-row arrays, deliberately:
    the selection could be written as one zero-shuffle Column program
    (transform → md5 per element → sliding array_min), but Catalyst
    INTERPRETS higher-order-function lambdas — a per-element md5 chain
    inside transform() runs ~10× slower than the same hash in a
    whole-stage-codegen projection (measured: 51 s vs ~6 s at sf1).
    So: posexplode tokens → k-token gram via lead() over (doc, pos) →
    ROW-LEVEL portable_hash60 (codegen) → sliding min via a window
    over the SAME sort (no second exchange) → per-doc distinct. Two
    token-stream-sized shuffles total, every hash JIT-compiled; window
    partitions are document-bounded. ``token_hash`` picks the shingle
    hash: default ``portable_hash60`` (md5-based) keeps fingerprints
    engine-replayable for the oracle; pass ``F.xxhash64`` for
    production ingest — same pipeline, native 64-bit hash, no hex
    round-trip (the simhash token_hash convention)."""
    from pyspark.sql.window import Window

    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1, got k={k}, w={w}")
    if token_hash is None:
        token_hash = portable_hash60
    toks = tokenize(F.col(text_col))
    staged = df.select(F.col(id_col), toks.alias("__t")).select(
        F.col(id_col),
        F.size("__t").alias("__n"),
        F.posexplode("__t").alias("pos", "tok"),
    )
    order = Window.partitionBy(id_col).orderBy("pos")
    gram = F.concat_ws(
        " ", F.col("tok"), *[F.lead("tok", i).over(order) for i in range(1, k)]
    )
    hashed = staged.select(
        F.col(id_col),
        F.col("pos"),
        F.col("__n"),
        token_hash(gram).alias("__h"),
    ).filter(F.col("pos") <= F.col("__n") - k)  # grams 0..n-k (0-based)
    # sliding min over the NEXT w shingle hashes; same (doc, pos) sort
    # as the lead() window, so no second exchange. Valid start
    # positions: 0..max(m-w, 0) with m = n-k+1 shingles — the max(.,0)
    # arm IS the short-doc degenerate case (one global min).
    win = Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, w - 1)
    sel = hashed.select(
        F.col(id_col),
        F.col("pos"),
        F.col("__n"),
        F.min("__h").over(win).alias("fingerprint"),
    ).filter(
        F.col("pos")
        <= F.greatest(F.col("__n") - F.lit(k) - F.lit(w) + 1, F.lit(0))
    )
    return sel.select(F.col(id_col), "fingerprint").distinct()


def winnow_passage_matches(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 10,
) -> DataFrame:
    """Cross-document passage detection on winnowed fingerprints: two
    documents "share a passage" when they share ≥ ``min_shared``
    selected fingerprints — the copy-detection join (quotes, licenses,
    plagiarized spans) that document-level MinHash misses because the
    documents AROUND the shared passage differ.

    Fingerprints occurring in more than ``max_df`` documents are
    excluded before pairing — they are boilerplate (navbars, license
    headers) whose buckets would otherwise explode quadratically; the
    same heavy-hitters economics as ``remove_duplicated_spans``'s
    blacklist, applied as a pair-join guard. Singleton fingerprints
    (df = 1) can't produce a pair and are pruned in the same pass.

    Scale shape: the fingerprint frame is a winnowed derivative
    (≈ 2/(w+1) of shingles, 16 bytes a row — never documents); the
    document-frequency pass is one aggregation-bounded groupBy; the
    self-join buckets on the fingerprint VALUE with bucket size capped
    at ``max_df`` by construction, so worst-case pair fan-out per
    fingerprint is max_df·(max_df-1)/2 regardless of corpus size.
    merge-hinted like every data-sized self-join here (the
    broadcast-compression hazard, r7).

    Output: (id_a, id_b, n_shared) with id_a < id_b.

    Cache note: the fingerprint frame is persisted for intra-query
    reuse (the df pass and the pair join both read it) and — like
    every operator-level persist in this repo — NOT unpersisted here,
    because the returned frame is lazy and unpersisting before the
    caller's action would recompute fingerprints twice. The persist
    routes through the r10 session-scoped cache registry
    (``cache.scoped_persist``): pipeline drivers open a
    ``cache_scope()`` per query/node and the registered frames drop at
    scope exit — no global clearCache convention anymore."""
    if min_shared < 1:
        raise ValueError(f"min_shared must be >= 1, got {min_shared}")
    if max_df < 2:
        raise ValueError(f"max_df must be >= 2, got {max_df}")
    fp = winnow_fingerprints(df, text_col, id_col, k=k, w=w).transform(scoped_persist)
    dfc = fp.groupBy("fingerprint").agg(F.count(F.lit(1)).alias("__df"))
    elig = dfc.filter((F.col("__df") >= 2) & (F.col("__df") <= max_df)).select(
        "fingerprint"
    )
    fpe = fp.join(elig, "fingerprint")
    a = fpe.select(F.col("fingerprint"), F.col(id_col).alias("id_a")).hint("merge")
    b = fpe.select(F.col("fingerprint"), F.col(id_col).alias("id_b"))
    return (
        a.join(b, ["fingerprint"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
