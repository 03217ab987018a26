"""Deterministic sampling & dataset splitting (EXTENSION — no
reference analog; a training-data pipeline primitive).

Train/val/test splits and downsampling for a 100 TB corpus must be
**content-addressed**, not random: ``rand()`` changes under retries,
task re-execution, and partition re-planning, silently leaking rows
across splits between runs. Hashing a stable id instead gives a split
that is (a) reproducible across runs/engines/cluster sizes, (b) a pure
per-row projection — no shuffle, no state, trivially parallel, and
(c) stable under incremental appends: a doc keeps its split forever,
so yesterday's val set never bleeds into today's train set.

The bucket function is md5-based so an external system (here: the
DuckDB oracle; in production: any SQL engine doing QA on the split)
reproduces the exact assignment from the same expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..cache import scoped_persist

# First 8 hex chars of md5 → 32-bit integer → uniform fraction. 2^32
# buckets is plenty: split boundaries are exact to ~2.3e-10.
_BUCKETS = float(1 << 32)


def hash_fraction(id_col: Column, salt: str = "") -> Column:
    """Uniform-[0,1) fraction from a stable id: the first 32 bits of
    md5(salt || ':' || id). Change ``salt`` to draw an independent
    split (e.g. per experiment) from the same ids."""
    key = F.concat_ws(":", F.lit(salt), id_col.cast("string"))
    return (F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("double") / F.lit(_BUCKETS))


def hash_sample(df: DataFrame, id_col: str, fraction: float, salt: str = "") -> DataFrame:
    """Deterministic Bernoulli-style sample: keep rows whose hash
    fraction < ``fraction``. Unlike ``df.sample()`` the result is a
    function of content only — re-runs, retries, and different
    cluster layouts return the identical row set."""
    return df.filter(hash_fraction(F.col(id_col), salt) < fraction)


def hash_split(df: DataFrame, id_col: str, splits: dict[str, float],
               salt: str = "split") -> DataFrame:
    """Label every row with a split name by cumulative hash-fraction
    thresholds, e.g. ``{"train": 0.8, "val": 0.1, "test": 0.1}``.
    Weights must sum to 1 (±1e-9). Pure projection: the plan is a
    scan + one chained CASE — no shuffle at any scale."""
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    u = hash_fraction(F.col(id_col), salt)
    expr: Column | None = None
    cum = 0.0
    names = list(splits)
    for name in names[:-1]:
        cum += splits[name]
        branch = F.when(u < F.lit(cum), F.lit(name))
        expr = branch if expr is None else expr.when(u < F.lit(cum), F.lit(name))
    # last split takes the remainder so the thresholds always cover [0,1)
    label = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn("split", label)


def hash_fraction_sql(id_expr: str, salt: str = "") -> str:
    """The DuckDB-side rendering of ``hash_fraction`` — documented here
    so the two expressions stay in lockstep (contract oracles and any
    external QA query must use exactly this form)."""
    key = f"concat('{salt}', ':', CAST({id_expr} AS VARCHAR))"
    return (
        f"(CAST(concat('0x', substring(md5({key}), 1, 8)) AS BIGINT)"
        f" / 4294967296.0)"
    )


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 1.0,
    salt: str = "",
) -> DataFrame:
    """Deterministic stratified (per-class) sample: keep a different
    hash fraction per stratum — the class-rebalancing primitive (e.g.
    downsample the dominant language of a corpus without touching the
    rare ones). Same guarantees as ``hash_sample``: content-addressed,
    pure per-row projection (scan + CASE + filter — no shuffle, no
    per-stratum pass), reproducible across runs/engines/cluster
    layouts. Strata absent from ``fractions`` keep ``default_fraction``."""
    threshold: Column = F.lit(default_fraction)
    for value, frac in fractions.items():
        threshold = (
            F.when(F.col(stratum_col) == value, F.lit(frac)).otherwise(threshold)
        )
    return df.filter(hash_fraction(F.col(id_col), salt) < threshold)


def mixture_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    target_shares: dict[str, float],
    salt: str = "mix",
    weight_col: str | None = None,
) -> DataFrame:
    """Deterministic pretraining-mix rebalancer: downsample strata so
    the output composition matches ``target_shares`` (e.g. 40 % en,
    30 % zh, 30 % de) at the largest feasible output size — the
    "data mixing" step that turns raw source inventories into a
    training mixture with pinned proportions.

    Downsample-only semantics: the feasible output size is
    ``N_out = min_s(n_s / share_s)`` (the stratum that runs out first
    caps the mixture); each stratum then keeps
    ``f_s = share_s * N_out / n_s ≤ 1`` of its rows by content hash.
    Strata absent from ``target_shares`` are dropped (share 0).
    Upsampling (epoch repetition of low-resource strata) is the
    separate ``epoch_upsample`` operator — mixing itself never
    duplicates rows.

    Scale shape: one aggregation-bounded counts pass (column-pruned
    scan → groupBy stratum, rows = #strata, collected driver-side —
    bounded by the stratum vocabulary, never data-sized), then the
    same scan + CASE + filter projection as
    ``stratified_hash_sample``. Two scans total; the first reads one
    column. Determinism: per-stratum fractions are computed with the
    identical IEEE double operations the oracle SQL spells
    (``share * n_out / n``), and row selection is the engine-portable
    ``hash_fraction`` — re-runs and engines agree bit-for-bit.

    ``weight_col`` switches the budget unit: shares become fractions
    of Σweight (e.g. token counts — what a pretraining mix actually
    specifies) instead of row counts; selection stays per-row by hash,
    so each stratum's EXPECTED token share hits its target.
    """
    total = sum(target_shares.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"target shares must sum to 1, got {total}")
    if weight_col is None:
        agg = df.groupBy(stratum_col).count()
    else:
        # Token-weighted mixing: shares are fractions of the TOKEN
        # budget, not the document count — what a pretraining mix
        # actually specifies. Weights sum through the exact decimal
        # route so the derived rates are order-independent.
        agg = df.groupBy(stratum_col).agg(
            F.sum(F.col(weight_col).cast("decimal(38,6)"))
            .cast("double")
            .alias("count")
        )
    counts = {
        r[0]: r[1] for r in agg.collect() if r[0] in target_shares
    }
    missing = [s for s in target_shares if s not in counts]
    if missing:
        raise ValueError(f"strata absent from data: {missing}")
    n_out = min(counts[s] / share for s, share in target_shares.items())
    fractions = {
        s: min(1.0, share * n_out / counts[s])
        for s, share in target_shares.items()
    }
    return stratified_hash_sample(
        df, id_col, stratum_col, fractions, default_fraction=0.0, salt=salt
    )


def epoch_upsample(
    df: DataFrame, id_col: str, epochs: float, salt: str = "epoch"
) -> DataFrame:
    """Deterministic fractional-epoch upsampling — the complement of
    ``mixture_sample``'s downsampling for high-quality / low-resource
    sources that should be seen more than once per training pass
    (e.g. epochs=2.3: every row twice, a content-hashed 30 % of rows a
    third time).

    Each output row carries ``epoch_idx`` (0-based) so downstream
    shuffling/packing can interleave epochs instead of replaying the
    corpus back-to-back. Pure narrow expansion: per-row epoch count is
    ``floor(epochs) + (hash < frac)``, materialized with
    ``explode(sequence(...))`` — no shuffle, no join, no driver state;
    the descending-``sequence`` hazard at count 0 (epochs < 1 rows
    drawn out) is guarded exactly like ``word_shingles``."""
    if epochs <= 0:
        raise ValueError(f"epochs must be > 0, got {epochs}")
    whole = int(epochs)
    # Round the fractional part to 9dp: raw double subtraction gives
    # 2.3 → 0.29999999999999982, which only matched an oracle's literal
    # 0.3 because no 32-bit hash fraction k/2^32 falls in the ~1.7e-16
    # gap. Rounding makes the threshold the same literal both engines
    # compare against — no coincidence needed (ADVICE r6).
    frac = round(epochs - whole, 9)
    n = F.lit(whole) + F.when(
        hash_fraction(F.col(id_col), salt) < F.lit(frac), F.lit(1)
    ).otherwise(F.lit(0))
    idx = F.when(
        n >= 1,
        F.sequence(F.lit(0).cast("long"), (n - F.lit(1)).cast("long")),
    ).otherwise(F.array().cast("array<long>"))
    return df.select("*", F.explode(idx).alias("epoch_idx"))


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    splits: dict[str, float],
    src: str = "id_a",
    dst: str = "id_b",
    salt: str = "leak",
    components: DataFrame | None = None,
) -> DataFrame:
    """Train/val split with GROUP integrity: every member of a near-dup
    cluster lands in the same split. Plain per-row splitting leaks —
    a document in train and its near-copy in val inflates eval — so
    the split unit must be the connected component of the near-dup
    graph, not the document.

    Connected components over ``pairs`` (size-gated / star variants,
    see ``connected_components``), then the COMPONENT label (not the
    row id) drives the ``hash_split`` draw — one deterministic draw
    per cluster, every member inherits it. Rows absent from ``pairs``
    are singleton components and split independently, so the expected
    proportions still hold. Output: df columns + component + split.
    ``components``: optional precomputed cluster index (id,
    component) — the shared-index shape, see ``purged_kfold``."""
    from ..operators.dedup import connected_components

    comp = (
        components
        if components is not None
        else connected_components(pairs, src, dst, nodes=df.select(id_col))
    )
    labeled = df.join(
        comp.select(F.col("id").alias(id_col), "component"), id_col
    )
    u = hash_fraction(F.col("component"), salt)
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    expr = None
    cum = 0.0
    names = list(splits)
    for name in names[:-1]:
        cum += splits[name]
        expr = (
            F.when(u < F.lit(cum), F.lit(name))
            if expr is None
            else expr.when(u < F.lit(cum), F.lit(name))
        )
    label = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return labeled.withColumn("split", label)


def cap_per_group(
    df: DataFrame,
    id_col: str,
    group_col: str,
    cap: int,
    salt: str = "cap",
    two_level: bool = True,
) -> DataFrame:
    """Frequency cap: keep at most ``cap`` rows per group — the
    anti-dominance curation rule ("no single domain/source contributes
    more than N documents"), which a plain fraction can't express
    (a 10⁶-doc boilerplate domain downsampled 10 % still swamps a
    100-doc one).

    Survivors are the ``cap`` LOWEST-HASH members, so the choice is
    content-addressed like every sampler here — reproducible across
    runs/engines, and stable under appends up to hash displacement
    (a new doc can displace at most one old survivor).

    Two-level top-K (the default, VERDICT r6 #2): a per-PARTITION
    partial top-cap runs BEFORE the exchange — an Arrow ``mapInPandas``
    pass that keeps only each group's ``cap`` lowest-hash rows seen in
    that partition (state bounded by groups-per-partition × cap, folded
    batch-by-batch) — then the exact global window runs over at most
    cap × n_partitions rows per group. Output is IDENTICAL to the
    single-window form (every global winner is necessarily inside its
    partition's top-cap); what changes is the physics: the exchange
    carries cap-bounded survivors instead of the full corpus, and a
    group holding 50 % of all rows arrives at its one window task
    already pruned to cap × P rows instead of serializing the corpus
    half through one reducer. ``two_level=False`` keeps the plain
    single-window plan (fine when groups are known-bounded and the
    Arrow pass isn't worth it)."""
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    return _keyed_top_per_group(
        df, hash_fraction(F.col(id_col), salt), id_col, group_col, cap, two_level
    )


def _keyed_top_per_group(
    df: DataFrame,
    key,
    id_col: str,
    group_col: str,
    cap: int,
    two_level: bool,
) -> DataFrame:
    """Keep the ``cap`` rows with the SMALLEST ``(key, id)`` per group —
    the shared engine behind ``cap_per_group`` (key = content hash) and
    ``weighted_sample_per_group`` (key = negated Efraimidis–Spirakis
    draw). ``two_level=True`` runs the Arrow per-partition partial
    top-cap BEFORE the exchange (identical output — every global winner
    is inside its partition's top-cap — with cap-bounded shuffle and no
    single-reducer skew; see cap_per_group docstring for the full
    rationale)."""
    from pyspark.sql.window import Window

    src = df
    if two_level:
        import pandas as pd

        with_u = df.withColumn("__u", key)
        n_keep = cap

        def prune(batches):
            state: pd.DataFrame | None = None
            for pdf in batches:
                both = (
                    pdf
                    if state is None
                    else pd.concat([state, pdf], ignore_index=True)
                )
                # sort by the window's exact order, then first `cap`
                # per group (dropna=False: null groups are groups to
                # the window too)
                state = (
                    both.sort_values(["__u", id_col], kind="mergesort")
                    .groupby(group_col, dropna=False, sort=False)
                    .head(n_keep)
                )
            if state is not None and len(state):
                yield state

        src = with_u.mapInPandas(prune, schema=with_u.schema)
        order_u = F.col("__u")
    else:
        order_u = key
    w = Window.partitionBy(group_col).orderBy(order_u.asc(), F.col(id_col).asc())
    out = (
        src.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )
    return out.drop("__u") if two_level else out


def weighted_sample_per_group(
    df: DataFrame,
    id_col: str,
    group_col: str,
    n: int,
    weight_col: str,
    salt: str = "wsample",
    two_level: bool = True,
) -> DataFrame:
    """Deterministic WEIGHTED sampling without replacement, ``n`` per
    group (Efraimidis–Spirakis A-ES): each row draws ``u^(1/w)`` with
    ``u = hash_fraction(id, salt)`` and the ``n`` LARGEST draws win —
    selection probability rises with weight exactly as sequential
    weighted sampling without replacement prescribes. The quality- or
    token-weighted downsampler: "keep 10 k docs per language, favoring
    high quality" is this with w = quality; a plain fraction can't
    express it and unweighted capping ignores quality entirely.

    Content-addressed like every sampler here (``rand()`` would change
    under retries): the draw is a pure function of (id, salt, weight),
    so reruns, engines, and appends agree; change ``salt`` for a fresh
    sample. Rows with ``w <= 0`` or NULL weight are excluded (they
    have no well-defined draw). The draw is 9dp-rounded BEFORE ranking
    (round-before-rank: libm ``pow`` may differ in the last ulp across
    engines) with the id as tiebreak.

    Same two-level scale path as ``cap_per_group``: Arrow partial
    top-n before the exchange, exact window after — a group holding
    half the corpus arrives at its reducer pre-pruned.

    Oracle: ``round(-pow(u, 1.0/w), 9)`` ascending, ``row_number()``
    per group, ``rn <= n``."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    u = hash_fraction(F.col(id_col), salt)
    # negate so "largest draw wins" becomes the shared engine's
    # "smallest key wins"; round BEFORE the sign so the oracle's
    # round(-pow(...)) matches bit-for-bit (round is odd: r(-x)=-r(x))
    key = -F.round(F.pow(u, F.lit(1.0) / F.col(weight_col)), 9)
    eligible = df.filter(F.col(weight_col) > 0)
    return _keyed_top_per_group(eligible, key, id_col, group_col, n, two_level)


def corpus_shuffle(
    df: DataFrame,
    id_col: str,
    salt: str = "shuffle",
    epoch_col: str | None = None,
    n_buckets: int = 1024,
    out_col: str = "shuffle_pos",
) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets a
    0-based ``out_col`` position equal to its rank under the
    content-addressed order (hash_fraction, id) — the shuffle step
    between packing and training. ``rand()``-based shuffles change
    under retries and re-planning; this order is a pure function of
    content (plus ``salt`` — change it per training run to draw a
    fresh permutation), so a resumed/re-executed job sees the exact
    same order, and an external engine can replay it.

    ``epoch_col``: include the epoch index (from ``epoch_upsample``)
    in the hash key, so a document's copies land at independent
    positions — epochs interleave instead of replaying back-to-back.

    Scale shape — exact global rank WITHOUT a global sort or
    single-reducer window: rows are range-bucketed by the hash
    fraction (``floor(u·B)``, order-preserving across buckets), the
    aggregation-bounded counts pass (B rows) prefix-sums through one
    bounded window (B = n_buckets is a CONSTANT, not data-sized) into
    a (bucket, offset) frame that broadcast-joins back, and the final
    position is bucket_offset + within-bucket rank — one window per
    bucket, B-way parallel. This is the standard distributed ranking
    decomposition; B controls reducer granularity (≈ corpus/B rows
    per window partition). (r13 optimization round: the offsets used
    to collect to the driver and re-enter the plan as a
    2B-literal ``create_map`` — at B = 1024 a ~2 000-child expression
    tree that cost ~1.6 s of per-run driver analysis, measured as a
    zero-jobs gap in ext_sorted_run_export's timeline; the broadcast
    join carries the identical integers with no driver round trip.)
    """
    from pyspark.sql.window import Window

    key = (
        F.col(id_col).cast("string")
        if epoch_col is None
        else F.concat_ws("#", F.col(id_col).cast("string"), F.col(epoch_col).cast("string"))
    )
    u = hash_fraction(key, salt)
    bucket = F.floor(u * n_buckets).cast("int")
    with_u = df.withColumn("__u", u).withColumn("__b", bucket)
    counts = with_u.groupBy("__b").agg(F.count(F.lit(1)).alias("__n"))
    woff = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    off = counts.select(
        "__b",
        F.coalesce(F.sum("__n").over(woff), F.lit(0))
        .cast("long")
        .alias("__offset"),
    )
    order_cols = [F.col("__u").asc(), F.col(id_col).asc()]
    if epoch_col is not None:
        order_cols.append(F.col(epoch_col).asc())
    w = Window.partitionBy("__b").orderBy(*order_cols)
    return (
        with_u.join(F.broadcast(off), "__b")
        .withColumn(
            out_col,
            (F.col("__offset") + F.row_number().over(w) - F.lit(1)).cast(
                "long"
            ),
        )
        .drop("__u", "__b", "__offset")
    )


def dsir_scores(
    docs: DataFrame,
    target: DataFrame | Column,
    text_col: str,
    id_col: str,
    buckets: int = 64,
    alpha: float = 0.5,
) -> DataFrame:
    """DSIR-style importance score (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling", hashed-n-gram
    variant with n=1): per-document log-likelihood ratio between a
    TARGET domain's hashed-unigram language model and the full
    corpus's background model —
    ``score(d) = Σ_tokens ln(p_target[h(t)] / p_bg[h(t)])``.
    Documents that look like the target domain score high; feeding the
    scores to ``hash_sample``-style thresholding (or Gumbel top-k)
    IS importance resampling.

    Hashing is md5-based (``hash_fraction`` precedent) so an external
    engine reproduces the bucketing bit-for-bit. Both models are
    add-``alpha``-smoothed over a DENSE ``buckets``-bucket spine, so
    empty buckets still carry probability mass and the ratio is always
    finite.

    Determinism: bucket counts and totals are integers; each bucket's
    ``ln(p_t/p_b)`` is one double expression on exact integers
    (identical in both engines), rounded to 12dp, and the per-document
    sum runs as exact DECIMAL (order-independent — the parity
    no-raw-sum(double) rule), presented rounded to 9dp.

    ``target`` is either a boolean Column predicate over ``docs``
    rows (preferred — the fused single-pass plan below) or a separate
    DataFrame with the same text/id columns (e.g. an external
    high-quality seed set — three passes).

    Plan at 100 TB: with a predicate target, ONE tokenize+bucket pass
    (persisted) feeds both model aggregations — each COLLAPSING to
    ``buckets`` rows map-side — and the scoring groupBy(id); the
    B-row model rides back broadcast. No all-pairs, no Python,
    nothing driver-sized but the model.

    Output: ``(id, n_tokens, dsir_score_r)``, one row per document
    with ≥1 token.
    """
    from ..functions.text import tokenize

    if buckets <= 0:
        raise ValueError("buckets must be positive")

    def bucket(term: Column) -> Column:
        return (
            F.conv(F.substring(F.md5(term), 1, 8), 16, 10).cast("long")
            % F.lit(buckets)
        )

    def toks(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("__term")
        ).select(F.col(id_col), bucket(F.col("__term")).alias("__b"))

    spine = docs.sparkSession.range(0, buckets).select(
        F.col("id").alias("__b")
    )
    if isinstance(target, Column):
        # Fused single-pass form: the target is a row predicate on
        # ``docs``, so ONE tokenize+md5-bucket pass serves all three
        # consumers (target model, background model, scoring) through a
        # persist boundary — the DataFrame form below re-plans the
        # explode per consumer (measured 3.2× vs DuckDB at sf1; fused:
        # 1.3×). The cached frame is ~13 bytes/token; at corpus sizes
        # where that outgrows the cluster's storage tier, drop back to
        # the DataFrame form and pay the recompute.
        bucketed = docs.select(
            F.col(id_col),
            target.alias("__t"),
            F.explode(tokenize(F.col(text_col))).alias("__term"),
        ).select(
            F.col(id_col), F.col("__t"), bucket(F.col("__term")).alias("__b")
        ).transform(scoped_persist)
        t_counts = (
            bucketed.filter(F.col("__t"))
            .groupBy("__b")
            .agg(F.count(F.lit(1)).alias("__tc"))
        )
        b_counts = bucketed.groupBy("__b").agg(
            F.count(F.lit(1)).alias("__bc")
        )
        score_stream = bucketed.select(F.col(id_col), "__b")
    else:
        t_counts = toks(target).groupBy("__b").agg(
            F.count(F.lit(1)).alias("__tc")
        )
        b_counts = toks(docs).groupBy("__b").agg(
            F.count(F.lit(1)).alias("__bc")
        )
        score_stream = toks(docs)
    model = (
        spine.join(t_counts, "__b", "left")
        .join(b_counts, "__b", "left")
        .select(
            "__b",
            F.coalesce("__tc", F.lit(0)).cast("long").alias("__tc"),
            F.coalesce("__bc", F.lit(0)).cast("long").alias("__bc"),
        )
    )
    totals = model.agg(
        F.sum("__tc").alias("__tt"), F.sum("__bc").alias("__bt")
    )
    # ln(p_t / p_b) with add-alpha smoothing over B buckets; pure
    # integer-derived doubles, identical in both engines.
    lr = F.round(
        F.log(
            ((F.col("__tc") + F.lit(alpha)) / (F.col("__tt") + F.lit(alpha * buckets)))
            / ((F.col("__bc") + F.lit(alpha)) / (F.col("__bt") + F.lit(alpha * buckets)))
        ),
        12,
    )
    model_lr = model.crossJoin(F.broadcast(totals)).select(
        "__b", lr.cast("decimal(38,12)").alias("__lr")
    )
    return (
        score_stream
        .join(F.broadcast(model_lr), "__b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("__lr").cast("double"), 9).alias("dsir_score_r"),
        )
    )


def curriculum_interleave(
    df: DataFrame,
    group_col: str,
    id_col: str,
    order_col: str | None = None,
    descending: bool = False,
) -> DataFrame:
    """Deterministic source-interleaved training order: position
    ``pos = rank_within_group * n_groups + group_index`` — round-robin
    across groups, so consecutive training examples come from
    different sources (the anti-clumping ordering a shuffled-but-
    source-skewed corpus doesn't give you), with the WITHIN-group
    order either content-addressed (md5 hash of the id — a stable
    shuffle) or curriculum-driven (``order_col``, e.g. a quality or
    difficulty score, ascending = easy-first).

    Output: input columns + ``(group_rank, group_index, pos)`` —
    ``pos`` is globally unique and dense through the balanced prefix
    (min group size × n_groups); groups that run out simply stop
    contributing (documented tail clumping — the standard behavior of
    round-robin interleave).

    Determinism: within-group ranks tie-break by id; group indexes
    are the group keys in sorted order (broadcast map). Re-running on
    the same data yields the identical ordering on any cluster
    layout — which is what makes the training order reproducible.

    Plan at scale: ONE window shuffle on the group key (the rank);
    the group-index map is a |groups|-row broadcast; ``pos`` is a
    pure projection. Consumers write with
    ``sort_within_partitions(pos)`` after a range repartition on pos
    (the ``sorted_run_export`` machinery) — no global sort here.
    """
    from pyspark.sql.window import Window

    order = (
        hash_fraction(F.col(id_col))
        if order_col is None
        else (F.col(order_col).desc() if descending else F.col(order_col).asc())
    )
    w = Window.partitionBy(group_col).orderBy(order, F.col(id_col).asc())
    # group-index MAP (broadcast hash join), not an array scanned per
    # row: at web scale group_col is a domain with millions of values,
    # so array_position would cost O(|groups|) per row and the array
    # itself would ride inside every task's row. The index window runs
    # on the |groups|-row distinct frame — groups-bounded.
    gw = Window.orderBy(F.asc(group_col))
    gidx = F.broadcast(
        df.select(F.col(group_col)).distinct().select(
            F.col(group_col),
            (F.row_number().over(gw) - 1).cast("long").alias("group_index"),
            F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias(
                "__ng"
            ),
        )
    )
    with_rank = df.withColumn(
        "group_rank", (F.row_number().over(w) - 1).cast("long")
    )
    return (
        with_rank.join(gidx, group_col)
        .withColumn(
            "pos", F.col("group_rank") * F.col("__ng") + F.col("group_index")
        )
        .drop("__ng")
    )


def purged_kfold(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    k: int,
    src: str = "id_a",
    dst: str = "id_b",
    salt: str = "fold",
    components: DataFrame | None = None,
) -> DataFrame:
    """K-fold cross-validation assignment with near-dup PURGING: every
    member of a near-dup cluster lands in the same fold, so no fold's
    held-out set contains a near-copy of another fold's training rows
    — the k-fold generalization of ``leakage_safe_split`` (per-row
    folding leaks exactly the way per-row splitting does).

    Connected components over ``pairs`` (size-gated / star variants,
    see ``connected_components``); the COMPONENT label drives one
    deterministic draw ``fold = floor(hash_fraction(component) * k)``
    that every member inherits. Rows absent from ``pairs`` are
    singleton components and fold independently, so folds stay
    near-balanced. Output: df columns + (component, fold).

    Scale shape: CC is pair-list-sized (never document-sized); the
    labeling join shuffles (id, component) pairs; the fold itself is a
    pure projection. hash_fraction values are exact k/2^32 doubles, so
    the floor is engine-portable with no rounding step. Pass a
    precomputed ``components`` frame (id, component) to reuse a shared
    cluster index instead of re-running CC — the production shape:
    one index per corpus snapshot, many consumers (folds, splits,
    contrastive mining, collapse) — r10, VERDICT r9 task 3."""
    from ..operators.dedup import connected_components

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    comp = (
        components
        if components is not None
        else connected_components(pairs, src, dst, nodes=df.select(id_col))
    )
    labeled = df.join(
        comp.select(F.col("id").alias(id_col), "component"), id_col
    )
    fold = F.floor(hash_fraction(F.col("component"), salt) * F.lit(k)).cast("int")
    return labeled.withColumn("fold", fold)


def contrastive_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    pool_fraction: float = 0.25,
    src: str = "id_a",
    dst: str = "id_b",
    salt: str = "neg",
    n_buckets: int = 8,
    components: DataFrame | None = None,
) -> DataFrame:
    """Contrastive training-pair mining from a near-dup pair list:
    every verified near-dup pair (a, b) becomes an (anchor, positive)
    example, and each gets one deterministic hard-ish NEGATIVE drawn
    from a bounded candidate pool OUTSIDE the anchor's near-dup
    cluster — cluster-aware negative sampling (a negative from the
    anchor's own cluster would be a false negative and poison the
    contrastive loss).

    Mechanics: connected components over ``pairs`` give the cluster
    label; the negative pool is a content-addressed ``pool_fraction``
    hash-sample of the corpus ids (BOUNDED by construction — at 100 TB
    the caller sizes the fraction so the pool broadcasts; the corpus
    itself is never joined all-pairs). The pool is hashed into
    ``n_buckets`` deterministic BUCKETS
    (``floor(hash_fraction(candidate)·B)``) and each (anchor,
    positive) row probes exactly ONE bucket — the one its own hash
    ``floor(hash_fraction(anchor|positive)·B)`` names — keeping
    candidates from other components and selecting the one with the
    smallest ``hash_fraction(anchor|positive|candidate)`` (ties break
    by candidate id). Every draw is a pure function of content, so
    re-runs, retries and different layouts return identical
    negatives; the bucket probe cuts per-pair work from |pool| to
    |pool|/B comparisons — the r8 quadratic-envelope fix (with pairs
    ~ corpus-sized and a fixed pool fraction the unbucketed scan was
    |pairs| × |pool|). The probe is an EQUI-join on the bucket id
    (hash join with the component check as residual), never a
    pairs × pool nested loop — plan-pinned in tests/test_plans.

    Dropout semantics: a pair drops out rather than emit a false
    negative when its probed bucket holds no out-of-component
    candidate (with |pool|/B ≫ cluster sizes the probability is
    negligible, and the dropout set is deterministic).

    Output: (anchor_id, positive_id, negative_id) — one row per
    surviving input pair. Cost: |pairs| × |pool|/B map-side
    comparisons + one window on (anchor, positive); no corpus-sized
    shuffle anywhere. ``components``: optional precomputed cluster
    index (id, component) — the shared-index shape, see
    ``purged_kfold``."""
    from pyspark.sql.window import Window

    from ..operators.dedup import connected_components

    if not (0.0 < pool_fraction <= 1.0):
        raise ValueError(f"pool_fraction must be in (0, 1], got {pool_fraction}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    comp = (
        components
        if components is not None
        else connected_components(pairs, src, dst, nodes=df.select(id_col))
    )
    pos = pairs.select(
        F.col(src).alias("anchor_id"), F.col(dst).alias("positive_id")
    )
    anchored = pos.join(
        comp.select(F.col("id").alias("anchor_id"), F.col("component").alias("__ac")),
        "anchor_id",
    ).withColumn(
        "__probe",
        F.floor(
            hash_fraction(
                F.concat_ws(
                    "|",
                    F.col("anchor_id").cast("string"),
                    F.col("positive_id").cast("string"),
                ),
                salt + ":probe",
            )
            * F.lit(n_buckets)
        ).cast("int"),
    )
    pool = (
        df.select(F.col(id_col).alias("negative_id"))
        .filter(
            hash_fraction(F.col("negative_id"), salt + ":pool") < F.lit(pool_fraction)
        )
        .join(
            comp.select(
                F.col("id").alias("negative_id"), F.col("component").alias("__nc")
            ),
            "negative_id",
        )
        .withColumn(
            "__bkt",
            F.floor(
                hash_fraction(F.col("negative_id"), salt + ":bucket")
                * F.lit(n_buckets)
            ).cast("int"),
        )
    )
    cand = anchored.join(
        F.broadcast(pool),
        (F.col("__probe") == F.col("__bkt")) & (F.col("__ac") != F.col("__nc")),
    )
    draw = hash_fraction(
        F.concat_ws(
            "|",
            F.col("anchor_id").cast("string"),
            F.col("positive_id").cast("string"),
            F.col("negative_id").cast("string"),
        ),
        salt,
    )
    w = Window.partitionBy("anchor_id", "positive_id").orderBy(
        draw.asc(), F.col("negative_id").asc()
    )
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("anchor_id", "positive_id", "negative_id")
    )


def temperature_mixture(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    alpha: float = 0.5,
    salt: str = "mix",
    weight_col: str | None = None,
) -> DataFrame:
    """Temperature-smoothed pretraining mix: target shares are
    ``n_s^alpha / sum(n^alpha)`` — the multilingual-sampling rule
    (alpha < 1 boosts low-resource strata relative to their raw
    share; alpha = 1 is proportional i.e. a no-op mix; alpha = 0 is
    uniform). The caller names a temperature, not hand-tuned shares;
    selection then delegates to the ``mixture_sample`` machinery
    (downsample-only, largest feasible output, content-addressed).

    Engine-portable arithmetic (the oracle replays it bit-for-bit):
    per-stratum weight ``w = round(n^alpha, 9)`` — computed with
    ``sqrt`` when alpha = 0.5 (correctly-rounded IEEE in every libm,
    unlike ``pow``) and rounded half-away-from-zero like SQL ROUND;
    the weight total is summed EXACTLY as DECIMAL(38,9) (order
    independent); shares, the feasible size ``n_out = min(n_s /
    share_s)`` and per-stratum fractions ``f_s = round(share_s * n_out
    / n_s, 9)`` are plain double ops in a pinned order. Scale shape:
    one aggregation-bounded counts pass + the usual scan-CASE-filter
    projection — two scans, no data-sized shuffle."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    if weight_col is None:
        agg = df.groupBy(stratum_col).count()
    else:
        agg = df.groupBy(stratum_col).agg(
            F.sum(F.col(weight_col).cast("decimal(38,6)"))
            .cast("double")
            .alias("count")
        )
    counts = {r[0]: float(r[1]) for r in agg.collect()}
    if not counts:
        raise ValueError("no strata found")

    def _round9(x: float) -> float:
        # SQL ROUND, engine-faithful: both engines round the SHORTEST
        # repr of the double, not its exact binary expansion — see
        # classify._round9_half_up (r13) for the witness
        return float(
            Decimal(repr(x)).quantize(Decimal("1e-9"), rounding=ROUND_HALF_UP)
        )

    pw = (
        (lambda n: math.sqrt(n))
        if alpha == 0.5
        else (lambda n: math.pow(n, alpha))
    )
    weights = {s: _round9(pw(n)) for s, n in counts.items()}
    total = float(sum(Decimal(repr(w)) for w in weights.values()))  # exact sum
    shares = {s: w / total for s, w in weights.items()}
    n_out = min(counts[s] / share for s, share in shares.items())
    fractions = {
        s: min(1.0, _round9(shares[s] * n_out / counts[s])) for s in shares
    }
    return stratified_hash_sample(
        df, id_col, stratum_col, fractions, default_fraction=0.0, salt=salt
    )


def exact_k_sample(df: DataFrame, id_col: str, k: int, salt: str = "exact") -> DataFrame:
    """Exactly-k deterministic uniform sample (without replacement):
    the k rows with the smallest content-addressed hash fraction —
    "give me a reproducible 10k-row eyeball sample of the corpus"
    where Bernoulli sampling's ±sqrt(N) size jitter won't do.

    Physical plan is TakeOrderedAndProject: every partition keeps its
    local top-k and the driver merges k-sized heaps — no global sort,
    no shuffle of the data, O(k) driver memory. That is the whole
    point of expressing it as ORDER BY + LIMIT instead of a window
    rank (which would shuffle the corpus into one ordering). Ties
    (hash collisions) break by id, so the result is a pure function
    of content + salt on any cluster layout."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    u = hash_fraction(F.col(id_col), salt)
    return (
        df.withColumn("__u", u)
        .orderBy(F.col("__u").asc(), F.col(id_col).asc())
        .limit(k)
        .drop("__u")
    )


def quality_bucket_mix(
    df: DataFrame,
    id_col: str,
    score_col: str,
    keep_fractions: list[float],
    salt: str = "qmix",
) -> DataFrame:
    """Quality-paced mixing: bucket rows by exact global score
    quantiles (n buckets for n ``keep_fractions``, bucket 0 = LOWEST
    scores) and keep a different content-addressed fraction per
    bucket — "keep everything reference-like, thin the tail" as one
    declarative pass, the quality-pacing counterpart of
    ``temperature_mixture``'s size-based shares (CCNet keeps/buckets
    crawl text by LM perplexity exactly this way; pass the best
    fraction first when lower scores are better, e.g. perplexity).

    Determinism: cuts are EXACT interpolated percentiles
    (``F.percentile`` bit-matches quantile_cont — the a10 precedent;
    swap percentile_approx at 100 TB and drop the exactness claim),
    bucket is a pure ``score > cut`` sum against those cuts, and the
    per-bucket draw is the engine-portable hash fraction. Plan: one
    aggregation-bounded cuts pass, COLLECTED and inlined as literals
    (r13 optimization round, guide §2.4 — the nb_train/bm25 stats
    rule: kept as a 1-row broadcast frame, every consumer action
    re-built the BroadcastExchange and re-ran the score lineage —
    here often an LM scorer — inside the build; same doubles either
    way), + a pure scan-CASE-filter projection; ``df`` is persisted
    because the cuts pass and the projection both read it. Output:
    df columns + ``bucket``, surviving rows only."""
    from ..cache import scoped_persist

    n = len(keep_fractions)
    if n < 2:
        raise ValueError("need at least 2 buckets")
    if any(not (0.0 <= f <= 1.0) for f in keep_fractions):
        raise ValueError("keep_fractions must be in [0, 1]")
    df = df.transform(scoped_persist)
    crow = df.agg(
        *[
            F.percentile(score_col, F.lit(i / n)).alias(f"__c{i}")
            for i in range(1, n)
        ]
    ).head()
    bucket = None
    for i in range(1, n):
        c = crow[f"__c{i}"]
        cut = F.lit(float(c)) if c is not None else F.lit(None).cast("double")
        term = (F.col(score_col) > cut).cast("int")
        bucket = term if bucket is None else bucket + term
    labeled = df.select(*df.columns, bucket.alias("bucket"))
    thresh = F.lit(keep_fractions[-1])
    for i in range(n - 2, -1, -1):
        thresh = F.when(F.col("bucket") == i, F.lit(keep_fractions[i])).otherwise(
            thresh
        )
    return labeled.filter(hash_fraction(F.col(id_col), salt) < thresh)


def token_budget_select(
    df: DataFrame,
    id_col: str,
    score_col: str,
    tokens_col: str,
    budget: int | None = None,
    n_buckets: int = 256,
    score_lo: float = 0.0,
    score_hi: float = 1.0,
    budget_fraction: float | None = None,
) -> DataFrame:
    """Select the best documents until a global token budget is spent:
    walk the corpus in (score DESC, id ASC) order and keep every row
    whose INCLUSIVE running token total fits inside ``budget`` — the
    curation step every fixed-size pretraining mix ends with ("take
    the highest-quality 2T tokens"), where a per-doc threshold can't
    hit the budget and a fraction-based sample ignores quality.

    Logically this is ``SUM(tokens) OVER (ORDER BY score DESC, id)``
    + a filter — but a global-order window shuffles the corpus into
    ONE partition (Exchange SinglePartition), the canonical 100 TB
    anti-plan. Executed instead as the two-level distributed prefix
    sum:

    1. bucket = floor((score_hi - score) / span · n_buckets), clamped
       — a pure projection, monotone DECREASING in score, so bucket
       ASC + within-bucket (score DESC, id ASC) IS the global order;
    2. per-bucket token totals: one n_buckets-row aggregate, collected
       (driver sync bounded by ``n_buckets``, never by data) and
       prefix-summed into per-bucket offsets;
    3. within-bucket running sums: a window PARTITIONED BY bucket —
       n_buckets-way parallel, no single-partition exchange — plus
       the broadcast offset joined back; ``cum_tokens`` = offset +
       within-bucket prefix, exactly the global inclusive prefix.

    Cost: one n_buckets-row agg + one bucket-keyed window shuffle of
    (id, score, tokens)-sized rows. Skew bound: a bucket holds the
    rows of one score sliver (span/n_buckets wide); a point-mass score
    distribution degrades that bucket's window to the per-value cost —
    inherent to ANY order-exact prefix over tied keys; raise
    ``n_buckets`` to narrow slivers. All token arithmetic is BIGINT —
    exact in any summation order, no decimal route needed.

    Rows with NULL score or NULL/negative tokens are excluded up front
    (they have no place in the order / no well-defined cost).

    ``budget_fraction`` (exclusive with ``budget``) spends that share
    of the corpus's OWN total tokens: budget = floor(frac · Σtokens),
    derived from the SAME n_buckets-row collect that builds the
    offsets — a corpus-relative budget costs no extra pass where a
    caller-side total would re-evaluate the (often expensive) score
    lineage once more. The base frame is persisted for the same
    reason: it feeds the totals aggregate AND the window join, and
    unpersisted each consumer replays the scoring chain (the
    minhash/pmi/vocab persist precedent).

    Output: (id, score, tokens, cum_tokens, keep) for EVERY surviving
    input row — keep=false rows are returned (not dropped) so the
    caller can audit the cut line. Oracle: the single-window form —
    identical semantics, only the physical plan differs.
    """
    if (budget is None) == (budget_fraction is None):
        raise ValueError("pass exactly one of budget / budget_fraction")
    if budget is not None and budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    if budget_fraction is not None and not (0.0 <= budget_fraction <= 1.0):
        raise ValueError(
            f"budget_fraction must be in [0, 1], got {budget_fraction}"
        )
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if not score_hi > score_lo:
        raise ValueError("score_hi must be > score_lo")
    from pyspark.sql import Window

    span = score_hi - score_lo
    base = df.select(
        F.col(id_col),
        F.col(score_col).cast("double").alias("__score"),
        F.col(tokens_col).cast("bigint").alias("__tokens"),
    ).filter(
        F.col("__score").isNotNull()
        & F.col("__tokens").isNotNull()
        & (F.col("__tokens") >= 0)
    )
    bucket = F.least(
        F.greatest(
            F.floor((F.lit(score_hi) - F.col("__score")) / F.lit(span) * n_buckets),
            F.lit(0).cast("bigint"),
        ),
        F.lit(n_buckets - 1).cast("bigint"),
    )
    b = base.withColumn("__bucket", bucket).transform(scoped_persist)
    totals = (
        b.groupBy("__bucket")
        .agg(F.sum("__tokens").alias("__btotal"))
        .orderBy("__bucket")
        .collect()
    )
    offsets, running = [], 0
    for r in totals:
        offsets.append((r["__bucket"], running))
        running += r["__btotal"]
    if budget_fraction is not None:
        budget = int(budget_fraction * running)
    off_df = b.sparkSession.createDataFrame(
        offsets, schema="__bucket bigint, __offset bigint"
    )
    w = (
        Window.partitionBy("__bucket")
        .orderBy(F.col("__score").desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        b.join(F.broadcast(off_df), "__bucket")
        .withColumn("__cum", F.col("__offset") + F.sum("__tokens").over(w))
        .select(
            F.col(id_col),
            F.col("__score").alias(score_col),
            F.col("__tokens").alias(tokens_col),
            F.col("__cum").alias("cum_tokens"),
            (F.col("__cum") <= F.lit(budget)).alias("keep"),
        )
    )
