"""Skew and balance diagnostics — the measurements that decide which
scale strategy (broadcast, salt, AQE skew-join) a 100 TB job needs.

Every report here is itself a distributed aggregate (group-count +
top-k / stats), so diagnosing a skewed 100 TB table costs one shuffle
of (key, count) pairs, not a collect of data. Use before committing
to a join strategy: ``key_skew_report`` tells you whether the hot key
needs salting (operators/joins.py::salted_join); ``shuffle_balance``
predicts the post-shuffle partition histogram for a key set WITHOUT
running the shuffle, using the same hash family Spark's
HashPartitioner applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def partition_sizes(df: DataFrame) -> DataFrame:
    """Rows per CURRENT partition (post-scan or post-shuffle) —
    (partition_id, rows), one row per non-empty partition."""
    return (
        df.select(F.spark_partition_id().alias("partition_id"))
        .groupBy("partition_id")
        .agg(F.count("*").alias("rows"))
        .orderBy("partition_id")
    )


def key_skew_report(df: DataFrame, key: str, top: int = 20) -> dict:
    """Key distribution stats + the ``top`` heaviest keys.

    Returns {rows, distinct_keys, max_key_rows, mean_key_rows,
    skew_ratio, top_keys}; ``skew_ratio`` = max/mean key frequency —
    the multiplier by which the hottest reducer exceeds the average
    (>~4 with large absolute counts usually means salt or skew-join).
    """
    counts = df.groupBy(key).agg(F.count("*").alias("n"))
    stats = counts.agg(
        F.sum("n").alias("rows"),
        F.count("*").alias("distinct_keys"),
        F.max("n").alias("max_key_rows"),
        F.avg("n").alias("mean_key_rows"),
    ).collect()[0]
    top_rows = counts.orderBy(F.desc("n"), key).limit(top).collect()
    return {
        "rows": stats["rows"],
        "distinct_keys": stats["distinct_keys"],
        "max_key_rows": stats["max_key_rows"],
        "mean_key_rows": float(stats["mean_key_rows"]),
        "skew_ratio": stats["max_key_rows"] / float(stats["mean_key_rows"]),
        "top_keys": [(r[key], r["n"]) for r in top_rows],
    }


def shuffle_balance(
    df: DataFrame, keys: list[str], num_partitions: int
) -> DataFrame:
    """Predicted rows per reducer for a hash shuffle on ``keys`` —
    (bucket, rows) using Spark's own hash family (murmur3 via
    ``F.hash``), so a planned ``groupBy``/``join`` can be sized
    before paying for it. A bucket holding >> rows/num_partitions
    predicts a straggler."""
    return (
        df.select(
            F.pmod(F.hash(*[F.col(k) for k in keys]), F.lit(num_partitions)).alias(
                "bucket"
            )
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("rows"))
        .orderBy("bucket")
    )


def dq_audit(
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    not_null_cols: list[str],
) -> DataFrame:
    """Data-quality audit for a fact→dim relationship: one row of
    counts — total rows, orphan fact rows (FK with no dim match),
    duplicate dim keys, and per-column null counts. The pre-training
    sanity gate every ingest should run before a 12-hour job reads
    bad joins.

    Scale shape: the orphan probe is a left-anti join on the FK (the
    dim side reduces to DISTINCT keys); dup-key and null counts are
    single hash aggregates; the three 1-row results crossJoin
    (broadcast). No collects, no full-table sort.
    """
    total = fact.agg(F.count("*").alias("n_rows"))
    orphans = (
        fact.join(
            dim.select(F.col(dim_key).alias("_k")).distinct(),
            fact[fact_key] == F.col("_k"),
            "left_anti",
        ).agg(F.count("*").alias("n_orphans"))
    )
    dup_keys = (
        dim.groupBy(dim_key)
        .agg(F.count("*").alias("_c"))
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("_c") > 1, F.col("_c") - 1)), F.lit(0)
            ).cast("bigint").alias("n_dup_dim_keys")
        )
    )
    nulls = fact.agg(
        *[
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"nulls_{c}")
            for c in not_null_cols
        ]
    )
    return (
        total.crossJoin(orphans).crossJoin(dup_keys).crossJoin(nulls)
    )


def observed(df: DataFrame, name: str, metrics: dict[str, "F.Column"]):
    """Attach free pipeline metrics to a frame: ``df.observe`` rides
    the NEXT action's execution, so row counts / sums / null rates
    cost ZERO extra passes — at 100 TB the difference between
    monitoring and re-scanning. Returns (observed_df, observation);
    read ``observation.get`` AFTER an action runs.

    Use on long pipelines to publish per-stage health (rows kept by
    the quality gate, bytes sampled, nulls seen) into the job's
    metrics without touching the data path."""
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *[c.alias(k) for k, c in metrics.items()]), obs


def psi_report(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    lo: float,
    width: float,
    n_buckets: int,
) -> DataFrame:
    """Population Stability Index report between a reference and a
    current dataset over fixed equal-width buckets: per bucket,
    (bucket, pr, pc, term) with term = (pr − pc)·ln(pr/pc); the PSI
    is the sum of terms (rule of thumb: < 0.1 stable, > 0.25 drifted).
    The training-data drift alarm — run it between yesterday's and
    today's corpus before a model sees either.

    Fixed literal edges (not quantiles) so the report is replayable
    in any engine and comparable across runs; empty buckets would
    need Laplace smoothing — callers pick ranges that cover both
    sides. Scale shape: one scan + one ≤n_buckets-key aggregate per
    side, then a broadcast-sized join of two tiny frames."""
    if n_buckets < 2 or width <= 0:
        raise ValueError("need n_buckets >= 2 and width > 0")
    bucket = F.least(
        F.lit(n_buckets - 1).cast("bigint"),
        F.floor((F.col(value_col) - lo) / width).cast("bigint"),
    ).alias("bucket")

    def dist(df: DataFrame, out: str) -> DataFrame:
        counts = df.select(bucket).groupBy("bucket").count()
        total = df.count()
        return counts.select(
            "bucket", (F.col("count") / F.lit(float(total))).alias(out)
        )

    pr, pc = dist(ref, "pr"), dist(cur, "pc")
    term = (F.col("pr") - F.col("pc")) * F.log(F.col("pr") / F.col("pc"))
    return (
        pr.join(pc, "bucket")
        .select(
            "bucket",
            F.round("pr", 6).alias("pr"),
            F.round("pc", 6).alias("pc"),
            F.round(term, 6).alias("term"),
        )
        .orderBy("bucket")
    )


def winsorize(
    df: DataFrame,
    col: str,
    group_col: str,
    p_lo: float = 0.05,
    p_hi: float = 0.95,
) -> DataFrame:
    """Winsorized robust scaling: clamp ``col`` to its per-group
    [p_lo, p_hi] DISCRETE percentiles — the standard outlier-taming
    transform for heavy-tailed signals (document lengths, request
    latencies) before they feed a quality score or a curriculum bin.
    The clamp-to-edge sibling of the MAD gate (text.py): MAD drops
    outliers, winsorize keeps them at the fence.

    Discrete (not interpolated) percentiles on purpose: the edge is
    "the smallest value whose cumulative count reaches p·n" over the
    per-(group, value) COUNT aggregate — an ACTUAL data value picked
    by an integer-count comparison (r70's spelling), so there is no
    interpolation arithmetic and the result is exact on any engine.
    Scale shape: the percentile window sorts |distinct values| rows
    per group (not raw rows), the edges broadcast back as a tiny
    frame, and the clamp is a scan-side LEAST/GREATEST."""
    if not 0.0 < p_lo < p_hi < 1.0:
        raise ValueError(f"need 0 < p_lo < p_hi < 1, got {p_lo}, {p_hi}")
    cnt = df.groupBy(group_col, col).agg(F.count("*").alias("_c"))
    w = (
        Window.partitionBy(group_col)
        .orderBy(col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = Window.partitionBy(group_col)
    cum = cnt.select(
        group_col,
        col,
        F.sum("_c").over(w).alias("_cum"),
        F.sum("_c").over(tot).alias("_n"),
    )
    edges = cum.groupBy(group_col).agg(
        F.min(
            F.when(F.col("_cum") >= p_lo * F.col("_n"), F.col(col))
        ).alias("_lo"),
        F.min(
            F.when(F.col("_cum") >= p_hi * F.col("_n"), F.col(col))
        ).alias("_hi"),
    )
    return df.join(F.broadcast(edges), group_col).withColumn(
        f"{col}_wins",
        F.least(F.greatest(F.col(col), F.col("_lo")), F.col("_hi")),
    )


def kappa_agreement(
    df: DataFrame,
    group_col: str,
    a_col: str,
    b_col: str,
    n_classes: int,
) -> DataFrame:
    """Cohen's kappa per group as an EXACT integer fraction (round 8
    — the label-QA step before annotator or model-judge labels drive
    training): raw agreement overstates reliability under class
    imbalance; kappa (Cohen 1960) corrects by the chance agreement of
    the raters' marginals, kappa = (p_o - p_e)/(1 - p_e). Both terms
    share the denominator n^2, so the whole statistic is the integer
    fraction kappa_num/kappa_den with kappa_num = n*n_agree -
    sum_k a_k*b_k and kappa_den = n^2 - sum_k a_k*b_k — no float
    anywhere, so the audit hash-compares across engines.

    ONE conditional hash aggregate with map-side partials over
    (group, class_a, class_b) int columns; no joins, no window —
    scales as a single scan at any corpus size."""
    aggs = [
        F.count("*").cast("bigint").alias("n"),
        F.sum(
            (F.col(a_col) == F.col(b_col)).cast("bigint")
        ).alias("n_agree"),
    ]
    for k in range(n_classes):
        aggs.append(
            F.sum((F.col(a_col) == k).cast("bigint")).alias(f"_a{k}")
        )
        aggs.append(
            F.sum((F.col(b_col) == k).cast("bigint")).alias(f"_b{k}")
        )
    r = df.groupBy(group_col).agg(*aggs)
    src = sum(
        F.col(f"_a{k}") * F.col(f"_b{k}") for k in range(n_classes)
    )
    return r.select(
        group_col,
        "n",
        "n_agree",
        (F.col("n") * F.col("n_agree") - src).alias("kappa_num"),
        (F.col("n") * F.col("n") - src).alias("kappa_den"),
    )
