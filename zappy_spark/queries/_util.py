"""Shared helpers for query builders."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from zappy_spark.session import configure, load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a testdata table with the session pinned corpus-safe."""
    configure(spark)
    return load_table(spark, sf_dir, name)


def spread(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Round-robin repartition sized to the session's parallelism.

    The testdata parquet files are single row groups, so a scan is
    one unsplittable task (guide §2.5: input skew) — any
    compute-bound operator sitting scan-side (the deliberately
    quadratic pair instruments, heavy per-row expressions) runs on
    one core. This spreads the rows across
    ``sparkContext.defaultParallelism`` partitions (= total cores,
    locally and on a cluster), which is scale-adaptive rather than a
    local[32] constant. Only worth it when downstream per-row work
    dominates the one extra small shuffle — measured r12: q1-shape
    scan+agg got SLOWER (0.34→0.84 s), the d05 pair loop got 14×
    faster — so callers opt in per query, never in ``t()``."""
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)


# Vector math lives in operators/vecmath.py (below both layers, so
# operators modules can import it without a queries->operators->
# queries cycle); re-exported here for the query builders.
from zappy_spark.operators.vecmath import (  # noqa: F401,E402
    cosine,
    dot,
    euclidean,
    norm,
    sq_norm,
    vsum,
)
