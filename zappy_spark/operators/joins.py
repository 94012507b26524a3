"""Join operators Spark lacks as built-ins: as-of, salted, binned-range.

As-of (the time-series "most recent value at or before t" join) has
no Spark primitive. The classic emulations:

(a) range self-join + row_number — O(matches) blowup before pruning;
(b) union + last-non-null window — one shuffle on (by, time), state
    is a single struct per row. This is the scale path: partition by
    the equi-key, sort by time, no intermediate blowup, AQE-friendly.

We implement (b). DuckDB's native ASOF JOIN is the test oracle
(tests/test_oracle.py r30 + tests/test_operators.py edge cases).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | None = None,
    direction: str = "backward",
    suffix: str = "_right",
    tolerance=None,
) -> DataFrame:
    """For each left row, attach the right row with the largest
    ``on`` ≤ left.on (backward) / smallest ``on`` ≥ left.on (forward),
    matching on the ``by`` equi-keys. Inner semantics: unmatched left
    rows are dropped (DuckDB ASOF JOIN parity).

    ``tolerance`` (pandas merge_asof parity): a Column bounding the
    match distance — e.g. ``F.expr("INTERVAL 30 MINUTES")`` for
    timestamp keys or a numeric delta for numeric keys. A matched
    right row farther than the tolerance is treated as no match
    (the row drops under inner semantics). Applied as a post-filter
    on the single window pass — no extra shuffle.

    Implementation: tag both sides, union, and take the last
    non-null right payload over a (by)-partitioned window ordered by
    (on, side) — right rows sort before left rows at equal
    timestamps, which yields the inclusive ≤/≥ bound.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    by = by or []
    rcols = [c for c in right.columns if c != on and c not in by]

    rpayload = F.struct(
        F.col(on).alias(f"{on}{suffix}"), *[F.col(c) for c in rcols]
    )
    rp_type = right.select(rpayload.alias("_rp")).schema[0].dataType
    lpayload = F.struct(*[F.col(c) for c in left.columns])
    lp_type = left.select(lpayload.alias("_lp")).schema[0].dataType

    l_tagged = left.select(
        *[F.col(c) for c in by],
        F.col(on).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(rp_type).alias("_rp"),
        lpayload.alias("_lp"),
    )
    r_tagged = right.select(
        *[F.col(c) for c in by],
        F.col(on).alias("_t"),
        F.lit(0).alias("_side"),
        rpayload.alias("_rp"),
        F.lit(None).cast(lp_type).alias("_lp"),
    )
    u = l_tagged.unionByName(r_tagged)

    t_order = F.col("_t").asc() if direction == "backward" else F.col("_t").desc()
    w = (
        Window.partitionBy(*by)
        .orderBy(t_order, F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_m", F.last("_rp", ignorenulls=True).over(w))

    out_cols = [F.col(f"_lp.{c}").alias(c) for c in left.columns]
    rename = {
        c: (c + suffix if c in left.columns else c) for c in rcols
    }
    out_cols += [F.col(f"_m.{on}{suffix}").alias(f"{on}{suffix}")]
    out_cols += [F.col(f"_m.{c}").alias(rename[c]) for c in rcols]
    keep = (F.col("_side") == 1) & F.col("_m").isNotNull()
    if tolerance is not None:
        gap = (
            F.col("_t") - F.col(f"_m.{on}{suffix}")
            if direction == "backward"
            else F.col(f"_m.{on}{suffix}") - F.col("_t")
        )
        keep = keep & (gap <= tolerance)
    return matched.filter(keep).select(*out_cols)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's skewed keys spread over ``salt``
    shuffle partitions: left rows get a deterministic salt from an
    unrelated hash of the whole row position-free tuple, the right
    side is replicated ``salt`` times, and the join key becomes
    (key, salt). Result is EXACTLY the plain join (verified by test).

    Use when one key dominates (power-law key → one straggler task).
    Spark's AQE skew-join splits oversized *sort-merge* partitions
    automatically; explicit salting still wins when the skew is known
    ahead of time, when the join must be shuffled-hash, or when a
    single key exceeds what one task can sort. The replication factor
    multiplies the (smaller) right side only — pick salt ≈ the skew
    ratio, not larger.
    """
    if salt < 1:
        raise ValueError(f"salt must be >= 1, got {salt}")
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    l_salted = left.withColumn(
        "_zs_salt",
        F.pmod(
            F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt)
        ).cast("int"),
    )
    r_salted = right.withColumn(
        "_zs_salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt)])),
    )
    out = l_salted.join(
        r_salted,
        [key, "_zs_salt"],
        how,
    )
    return out.drop("_zs_salt")


def skew_guarded_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    how: str = "inner",
    skew_threshold: float = 4.0,
    min_hot_rows: int = 100_000,
    max_salt: int = 64,
) -> DataFrame:
    """Equi-join that picks its own strategy from a skew diagnostic
    (round 6 — the salted_join production knob automated, the
    auto_max_bucket philosophy applied to joins): run
    ``diagnostics.key_skew_report`` on the left key, and

    - plain join when the key is balanced (skew_ratio below
      ``skew_threshold`` or the hot key smaller than
      ``min_hot_rows`` — salting balanced keys just multiplies the
      right side for nothing);
    - ``salted_join`` with salt ≈ ceil(skew_ratio) capped at
      ``max_salt`` when one key would dominate a reducer.

    The diagnostic costs one (key, count) shuffle + a 4-scalar
    collect — amortized noise next to the join it protects, and the
    same measurement a human would run before choosing. Results are
    strategy-invariant (salted_join == plain join, property-pinned),
    so the choice affects ONLY the physical plan. For sort-merge
    joins under AQE, Spark's skew-join split handles moderate skew
    engine-side; this guard is for the known-pathological keys
    (null-key floods, boilerplate ids) where pre-salting beats
    runtime splitting.
    """
    import math

    from zappy_spark.operators.diagnostics import key_skew_report

    rep = key_skew_report(left, key, top=1)
    skewed = (
        rep["skew_ratio"] >= skew_threshold
        and rep["max_key_rows"] >= min_hot_rows
    )
    if not skewed:
        return left.join(right, key, how)
    salt = min(max_salt, max(2, math.ceil(rep["skew_ratio"])))
    return salted_join(left, right, key, salt=salt, how=how)


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
) -> DataFrame:
    """Point-in-interval join WITHOUT an equi key — the shape Spark
    plans as BroadcastNestedLoop/Cartesian (O(n·m) predicate evals).

    The bucketing trick (Databricks' range-join hint, DuckDB's
    IEJoin solve this engine-side; this is the DataFrame-level
    equivalent): each interval explodes to the bins it covers, each
    point maps to its one bin, the join becomes an EQUI join on the
    bin id plus the exact residual ``lo <= p < hi``. Work drops from
    |points|·|intervals| to Σ_bin |points_b|·|intervals_b| — with
    ``bin_width`` at the typical interval length, intervals cover
    O(1) bins and the join is hash-partitioned, AQE/skew-eligible,
    never nested-loop (plan-pinned in test_plans).

    Pairs cannot duplicate: a point lives in exactly one bin, so each
    (point, interval) pair meets at most once. Choose ``bin_width``
    ≈ the 95th-percentile interval length; much smaller multiplies
    the interval explode, much larger piles points into few buckets.
    Columns must be numeric (cast timestamps to ``unix_micros``
    first). Interval semantics are half-open ``[lo, hi)``.
    """
    w = float(bin_width)
    p_binned = points.withColumn(
        "_bin", F.floor(F.col(point_col) / F.lit(w)).cast("bigint")
    )
    i_binned = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(w)).cast("bigint"),
                F.floor(F.col(hi_col) / F.lit(w)).cast("bigint"),
            )
        ),
    )
    return (
        p_binned.join(i_binned, "_bin")
        .filter(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) < F.col(hi_col))
        )
        .drop("_bin")
    )
