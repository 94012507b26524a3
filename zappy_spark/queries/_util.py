"""Shared helpers for query builders."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from zappy_spark.session import configure, load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a testdata table with the session pinned corpus-safe."""
    configure(spark)
    return load_table(spark, sf_dir, name)


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
