"""Mergeable sketches: HyperLogLog distinct counts and Count-Min
frequencies (Apache DataSketches / Spark built-in aggregates).

At 100 TB the only viable shape for "distinct users per day, week,
month, all-time" is ONE pass that builds a small mergeable sketch per
fine-grained group, persisted as a binary column; every coarser
rollup is then a cheap union over sketches — no rescan of the fact
table, no giant exact-distinct shuffle. Spark 3.5+ exposes exactly
this as JVM aggregates (``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate``), so the whole pipeline is codegen'd
JVM-side: no Python in the hot path.

Accuracy is a property, not an oracle: estimates are deterministic
for a given lgK but engine-specific, so the corpus entry is
rows-only and tests/test_sketches.py pins the error envelope
(±3·1.04/sqrt(2^lgK)) and the merge identity (union of partials ==
single-pass sketch estimate) instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_LGK = 12  # relative standard error ~1.04/sqrt(2^12) ≈ 1.6%


def hll_build(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lgk: int = DEFAULT_LGK,
    sketch_col: str = "hll",
) -> DataFrame:
    """One mergeable HLL sketch of ``value_col`` per group.

    This is the pass that scans the fact table; persist its output
    (a few KB per group) and never rescan for rollups."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), lgk).alias(sketch_col)
    )


def hll_rollup(
    sketches: DataFrame,
    group_cols: list[str],
    sketch_col: str = "hll",
    estimate_col: str = "approx_distinct",
) -> DataFrame:
    """Merge fine-grained sketches up to ``group_cols`` and estimate.

    Input is the (small) output of :func:`hll_build`; the union is an
    aggregate over sketch binaries, so a year→all-time rollup touches
    megabytes, not the original 100 TB."""
    merged = sketches.groupBy(*group_cols).agg(
        F.hll_union_agg(F.col(sketch_col)).alias(sketch_col)
    )
    return merged.withColumn(
        estimate_col, F.hll_sketch_estimate(F.col(sketch_col))
    ).drop(sketch_col)


def hll_estimate(sketch: str | Column) -> Column:
    return F.hll_sketch_estimate(sketch)


def cms_build(
    df: DataFrame,
    value_col: str,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 1,
) -> DataFrame:
    """One Count-Min sketch of ``value_col`` for the whole frame —
    a 1-row binary result built by a distributed JVM aggregate."""
    return df.agg(
        F.count_min_sketch(
            F.col(value_col), F.lit(eps), F.lit(confidence), F.lit(seed)
        ).alias("cms")
    )


def cms_frequencies(
    spark: SparkSession, cms_df: DataFrame, items: list
) -> dict:
    """Query a built sketch for estimated frequencies of ``items``.

    The sketch is a few KB, so the query side is driver-side by
    design (deserialized via the JVM CountMinSketch reader); the
    expensive part — building it over the fact table — stayed
    distributed. Guarantees: est >= true, est <= true + eps*N with
    probability >= confidence."""
    payload = bytes(cms_df.collect()[0]["cms"])
    jvm = spark._jvm
    bis = jvm.java.io.ByteArrayInputStream(payload)
    sketch = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bis)
    return {item: sketch.estimateCount(item) for item in items}
