"""Vector math over array<float> columns — the shared kernel for
similarity/linalg operators and query builders.

All vector arithmetic is forced to DOUBLE: float32 accumulation
diverges across engines (SURVEY Appendix A, the L8 incident). These
compile to Catalyst HigherOrderFunctions (JVM-side, codegen'd) — the
scale path for 100 TB embedding columns; no Python in the loop.

This module sits BELOW both ``operators`` and ``queries`` and
imports neither, so either layer can use it without a cycle
(``queries._util`` re-exports these names for the query builders).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def vsum(v: Column | str) -> Column:
    return F.aggregate(v, F.lit(0.0), lambda a, x: a + x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def sq_norm(v: Column | str) -> Column:
    return F.aggregate(
        F.transform(v, lambda x: x.cast("double") * x),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(v: Column | str) -> Column:
    return F.sqrt(sq_norm(v))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def euclidean(a: Column | str, b: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                a, b, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
