"""Join operators Spark lacks as built-ins. Currently: as-of join.

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
) -> DataFrame:
    """For each left row, attach the right row with the largest
    ``on`` ≤ left.on (backward) / smallest ``on`` ≥ left.on (forward),
    matching on the ``by`` equi-keys. Inner semantics: unmatched left
    rows are dropped (DuckDB ASOF JOIN parity).

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
    return (
        matched.filter((F.col("_side") == 1) & F.col("_m").isNotNull())
        .select(*out_cols)
    )


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
