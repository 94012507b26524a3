"""Deterministic sampling for training-data pipelines.

Every operator here is hash-deterministic (md5 over the row id), so
samples are reproducible across runs, engines, and cluster sizes —
the property that matters for dataset versioning — and every one is
replayable in ANSI SQL for oracle checking. ``df.sample()`` is
intentionally NOT used: its output depends on partitioning and seed
plumbing, which makes lineage audits impossible.

Scale notes (100 TB):
- ``hash_sample`` is a scan-side filter — no shuffle at all; it
  composes with predicate pushdown (the md5 filter evaluates after
  the pushed scan filters).
- ``stratified_sample_exact`` is one window per stratum (hash shuffle
  on the stratum key); skewed strata are bounded by k, so the sort
  inside each stratum is the only per-key cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 16^8 hex prefixes, uniform under md5
_PREFIX_LEN = 8
_SPACE = 16 ** _PREFIX_LEN


def _hash_key(id_col: str | Column) -> Column:
    return F.substring(F.md5(F.col(id_col).cast("string")), 1, _PREFIX_LEN)


def sample_threshold(fraction: float) -> str:
    """Hex-prefix threshold t such that md5-prefix < t keeps ~fraction
    of rows (granularity 16^-8 ≈ 4e-10). Exposed so oracles can embed
    the identical literal."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return format(min(int(fraction * _SPACE), _SPACE - 1), "08x")


def hash_sample(df: DataFrame, id_col: str, fraction: float) -> DataFrame:
    """Keep ~``fraction`` of rows, deterministically by id hash.

    Same id → same verdict everywhere, forever: re-running on a grown
    corpus keeps the previously-sampled rows (append-stable), which
    random sampling cannot promise."""
    return df.filter(_hash_key(id_col) < sample_threshold(fraction))


def stratified_sample(
    df: DataFrame, id_col: str, strata_col: str, fraction: float
) -> DataFrame:
    """~``fraction`` per stratum. With a uniform hash the per-stratum
    rate equals the global rate, so this is ``hash_sample`` with the
    stratum documented: no shuffle, exactness only in expectation."""
    del strata_col  # per-row hash is already uniform within strata
    return hash_sample(df, id_col, fraction)


def stratified_sample_exact(
    df: DataFrame, id_col: str, strata_col: str, k: int
) -> DataFrame:
    """EXACTLY min(k, |stratum|) rows per stratum: rank rows inside
    each stratum by id hash (deterministic, uniform) and keep the
    first k — the distributed, reproducible analog of per-group
    reservoir sampling."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = Window.partitionBy(strata_col).orderBy(_hash_key(id_col), id_col)
    return (
        df.withColumn("_zs_rn", F.row_number().over(w))
        .filter(F.col("_zs_rn") <= k)
        .drop("_zs_rn")
    )


def train_val_split(
    df: DataFrame, id_col: str, val_fraction: float
) -> DataFrame:
    """Append a deterministic 'split' column ('train'/'val') keyed on
    the id hash — the id-keyed sibling of pipeline.content_split
    (which keys on content to make near-identical texts co-split)."""
    return df.withColumn(
        "split",
        F.when(
            _hash_key(id_col) < sample_threshold(val_fraction), "val"
        ).otherwise("train"),
    )


def multi_split(
    df: DataFrame, id_col: str, splits: dict[str, float]
) -> DataFrame:
    """Append an n-way deterministic ``split`` column (train/val/test
    and friends): cumulative hex thresholds over the id hash, one
    scan-side CASE chain — no shuffle, append-stable, and disjoint by
    construction (each id lands in exactly one range). Fractions must
    sum to 1. The generalization of ``train_val_split``; thresholds
    come from ``sample_threshold`` so any SQL engine replays the
    identical assignment."""
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    names = list(splits)
    expr = F.lit(names[-1])
    cum = 0.0
    # build the CASE from the last threshold inward
    pairs = []
    for name, frac in splits.items():
        cum += frac
        pairs.append((name, sample_threshold(cum)))
    for name, thr in reversed(pairs[:-1]):
        expr = F.when(_hash_key(id_col) < thr, name).otherwise(expr)
    return df.withColumn("split", expr)


def leakage_free_split(
    df: DataFrame, text_col: str, id_col: str, splits: dict[str, float]
) -> DataFrame:
    """Train/val/test split that cannot leak near-exact duplicates
    across the boundary: the split hash is taken over the token-set
    FINGERPRINT (md5 of the sorted distinct tokens — the d18 dedup
    tier) instead of the document id, so word-order/repetition/
    whitespace variants of one document always land in the SAME
    split. Plain id-hash splitting puts ~f·(1−f) of every duplicate
    pair across the train/eval boundary — the classic contamination
    that inflates eval scores; keying the hash by content group
    closes it by construction, no join against a dedup table needed.

    Scale shape: identical to ``multi_split`` — the fingerprint and
    the CASE are one scan-side projection, no shuffle, append-stable
    (adding documents never migrates an existing group). Fuzzy
    (MinHash-tier) leakage needs the cluster id from
    ``connected_components`` as the key instead; this operator is
    the exact-tier gate every pipeline should run first."""
    from zappy_spark.operators.dedup import content_key

    with_fp = df.withColumn(
        "fp", content_key(F.col(text_col), "fingerprint")
    )
    return multi_split(with_fp, "fp", splits)


def mixture_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    fractions: dict[str, float],
    default: float = 0.0,
) -> DataFrame:
    """Per-group sampling rates in one scan — the domain-mixture
    knob of a pre-training pipeline ("60% of en, 30% of de, 10% of
    everything else"). Deterministic and append-stable like
    ``hash_sample``; nested across rates (a row kept at 0.3 is also
    kept at 0.6), so mixtures can be tightened without resampling.

    A CASE chain over literal thresholds — scan-side filter, no
    shuffle, no join. The per-group thresholds are plain literals,
    so predicate pushdown and codegen both apply; the group column
    stays an ordinary column (no broadcast table needed below
    thousands of groups — above that, join a broadcast rate table
    instead)."""
    thr: Column = F.lit(sample_threshold(default))
    for g, frac in fractions.items():
        thr = F.when(
            F.col(group_col) == g, F.lit(sample_threshold(frac))
        ).otherwise(thr)
    return df.filter(_hash_key(id_col) < thr)


def quantile_buckets(
    df: DataFrame, col: str, n_buckets: int
) -> DataFrame:
    """Append a ``bucket`` column (0..n_buckets-1) assigning each row
    its quantile bin of ``col`` — curriculum/difficulty binning (train
    easy→hard), quality tiering, or stratified eval splits.

    ONE tiny aggregate computes all n-1 exact percentile edges
    (single pass, partial aggregation), broadcast as a 1-row frame;
    assignment is then a scan-side array count — no sort, no window,
    no second shuffle. Edges are rounded to 6dp so any SQL engine
    replays the identical assignment (quantile interpolation parity
    with DuckDB is verified in the corpus). At extreme scale swap the
    exact percentile for ``approx_percentile`` — assignment is
    unchanged."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    edges = df.agg(
        F.percentile(col, F.array(*[F.lit(f) for f in fracs])).alias("_e")
    ).select(F.transform("_e", lambda e: F.round(e, 6)).alias("_e"))
    return (
        df.join(F.broadcast(edges))
        .withColumn(
            "bucket",
            F.size(F.filter("_e", lambda e: e < F.col(col))).cast("bigint"),
        )
        .drop("_e")
    )


def weighted_sample_exact(
    df: DataFrame, id_col: str, weight_col: str | Column, k: int
) -> DataFrame:
    """EXACTLY k rows, weighted without replacement, deterministic —
    the Efraimidis–Spirakis A-ES scheme: each row draws
    ``key = -ln(u)/w`` with ``u`` uniform from its id hash, and the
    k SMALLEST keys are a weighted sample (inclusion probability
    proportional to weight, sequentially without replacement).

    Same determinism contract as ``hash_sample``: u comes from
    md5(id), so the sample is reproducible across runs, engines and
    cluster sizes, and any SQL engine replays it (hex-prefix →
    integer → the same ln/divide). The global k-smallest compiles to
    TakeOrderedAndProject — per-partition heaps and a k-row driver
    merge, never a global sort. Keys are rounded to 9 dp with the id
    as tie-break so cross-engine libm ulp differences cannot reorder
    the boundary. Rows with weight <= 0 are excluded (a zero weight
    means "never sample"; negative weights are undefined).

    Appends ``aes_key`` (the rounded race key) for auditability."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = (
        F.col(weight_col).cast("double")
        if isinstance(weight_col, str)
        else weight_col.cast("double")
    )
    u = (F.conv(_hash_key(id_col), 16, 10).cast("double") + 1) / float(
        _SPACE + 1
    )
    key = F.round(-F.log(u) / w, 9)
    return (
        df.filter(w > 0)
        .withColumn("aes_key", key)
        .orderBy("aes_key", id_col)
        .limit(k)
    )


def temperature_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    scale: float,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-scaled mixture resampling: keep each row of group
    g with rate ``min(1, scale · |g|^(alpha-1))``, so the expected
    kept count per group is ``min(|g|, scale · |g|^alpha)`` — the
    unigram-temperature knob of multilingual / multi-domain
    pre-training mixes (T5/PaLM style): alpha < 1 flattens the
    head domains toward the tail without starving either. Unlike
    ``mixture_sample`` the rates are DERIVED from corpus statistics,
    not supplied; unlike global normalization, each group's rate
    depends only on its OWN count — no cross-group sum, so for
    alpha = 0.5 (rate = scale/sqrt(|g|), IEEE-exact sqrt + divide)
    the decision is bit-reproducible on any engine, with no
    rounding-boundary class at all.

    Scale shape: one tiny per-group count aggregate, broadcast back
    (thousands of domains = kilobytes), then a scan-side comparison
    of the id-hash integer against rate·2^32 — deterministic,
    append-stable within a corpus snapshot, zero data shuffles."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    counts = df.groupBy(group_col).agg(F.count("*").alias("_zs_cnt"))
    if alpha == 0.5:
        rate = F.lit(float(scale)) / F.sqrt(F.col("_zs_cnt"))
    else:  # pow() is libm-dependent: documented as not oracle-exact
        rate = F.lit(float(scale)) * F.pow(F.col("_zs_cnt"), alpha - 1.0)
    return (
        df.join(F.broadcast(counts), group_col)
        .filter(
            F.conv(_hash_key(id_col), 16, 10).cast("double")
            < F.least(F.lit(1.0), rate) * float(_SPACE)
        )
        .drop("_zs_cnt")
    )


def per_group_cap(
    df: DataFrame, group_col: str, order_col: str, id_col: str, k: int
) -> DataFrame:
    """Keep the top-``k`` rows of each group by ``order_col``
    (descending, id ascending as the total-order tie-break) — the
    per-host / per-domain quota of crawl curation: no single source
    may contribute more than k documents, and the k kept are the
    BEST by the quality signal, not a random subset. The
    quality-ranked sibling of ``stratified_sample_exact`` (which
    ranks by hash, i.e. uniformly).

    One window per group (hash shuffle on the group key); skewed
    groups cost one sort each but emit at most k rows, so the
    output is bounded by k·|groups| regardless of corpus size."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = Window.partitionBy(group_col).orderBy(
        F.desc(order_col), F.asc(id_col)
    )
    return (
        df.withColumn("_zs_rn", F.row_number().over(w))
        .filter(F.col("_zs_rn") <= k)
        .drop("_zs_rn")
    )


def dsir_weights(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target_col: str,
    prefix_len: int = 2,
    smoothing: float = 1.0,
) -> DataFrame:
    """DSIR-style importance weights (Data Selection via Importance
    Resampling, Xie et al. 2023 — the public hashed-n-gram recipe):
    score every document by the average log-likelihood ratio of its
    hashed word-bigram features under the TARGET distribution (rows
    where ``target_col`` is true) vs the RAW corpus distribution,
    both Laplace-smoothed. High weight = "looks like the target
    domain"; resampling by this weight steers a 100 TB crawl toward
    a small high-quality target without training a classifier.

    Feature hashing is the md5 hex prefix (16^prefix_len buckets) —
    a portable string key, so any engine with md5 replays the exact
    bucketing (the DuckDB oracle does). Scale shape: one explode to
    (doc, bucket) partial counts (map-side combine), the bucket LUT
    is bounded at 16^prefix_len rows and broadcast back, totals are
    a 1-row broadcast, and the final agg shuffles only (doc, bucket,
    count) triples — the text column never re-shuffles. Returns
    (id_col, n_grams, dsir_logratio), unrounded.
    """
    from zappy_spark.operators.dedup import word_shingles

    n_buckets = 16 ** prefix_len
    ex = df.select(
        F.col(id_col).alias("_id"),
        F.col(target_col).alias("_tgt"),
        F.explode(word_shingles(F.col(text_col), 2)).alias("_g"),
    )
    cnt = ex.groupBy(
        "_id",
        "_tgt",
        F.substring(F.md5("_g"), 1, prefix_len).alias("_bk"),
    ).agg(F.count("*").alias("_c"))
    lut = cnt.groupBy("_bk").agg(
        F.sum("_c").alias("_raw"),
        F.sum(F.when(F.col("_tgt"), F.col("_c")).otherwise(F.lit(0))).alias(
            "_tc"
        ),
    )
    tot = lut.agg(
        F.sum("_raw").cast("double").alias("_rt"),
        F.sum("_tc").cast("double").alias("_tt"),
    )
    term = F.log(
        (F.col("_tc") + F.lit(smoothing))
        / (F.col("_tt") + F.lit(smoothing * n_buckets))
    ) - F.log(
        (F.col("_raw") + F.lit(smoothing))
        / (F.col("_rt") + F.lit(smoothing * n_buckets))
    )
    return (
        cnt.join(F.broadcast(lut), "_bk")
        .crossJoin(F.broadcast(tot))
        .groupBy("_id")
        .agg(
            F.sum("_c").alias("n_grams"),
            (F.sum(F.col("_c") * term) / F.sum("_c")).alias(
                "dsir_logratio"
            ),
        )
        .select(F.col("_id").alias(id_col), "n_grams", "dsir_logratio")
    )


def token_budget_select(
    df: DataFrame,
    group_cols: tuple[str, ...],
    weight_col: str,
    order_by: tuple,
    budget: int,
) -> DataFrame:
    """Greedy budgeted selection: per group, walk rows in the given
    priority order and keep them while the running ``weight_col``
    total stays ≤ ``budget`` — the token-budget data-mixing
    primitive ("best documents per language until 1B tokens each").
    Prefix-greedy, not knapsack: the production contract is
    determinism and one window pass, not optimality — the d27/d30
    sibling for weighted (token) quotas instead of row-count quotas.

    Scale shape: one window hash-partitioned on the group key; the
    running sum is a per-partition streaming aggregate — no join, no
    second pass. ``order_by`` must be a total order (tie-break on a
    unique id) or the kept set is engine-dependent. The cumulative
    weight stays on the output as ``_cum_w`` for audit/packing use.
    """
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn("_cum_w", F.sum(weight_col).over(w)).filter(
        F.col("_cum_w") <= budget
    )
