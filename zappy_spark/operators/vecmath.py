"""Vector math over array<float> columns — the shared kernel for
similarity/linalg operators and query builders.

All vector arithmetic is forced to DOUBLE: float32 accumulation
diverges across engines (SURVEY Appendix A, the L8 incident).

Execution shape (round 12, guide §4.1): Catalyst higher-order
functions (``aggregate``/``zip_with``/``transform``) have no codegen
— they are CodegenFallback expressions, evaluated interpretedly per
row with per-element lambda-variable binding. On the 2M-pair d05
verify that interpretation was ~97% of the query (32.5 s warm at
sf0.1). Every kernel therefore carries an UNROLLED fast path for the
corpus-wide embedding dim (64): a left-associated Add chain starting
from ``lit(0.0)`` — the bit-identical IEEE evaluation order of the
``aggregate`` fold it replaces — over ``element_at`` terms, which
whole-stage codegen compiles to straight-line fused arithmetic. A
runtime ``when(size(v) = dim, unrolled).otherwise(fold)`` guard
keeps semantics identical for every input (mismatched sizes, NULL
arrays, NULL elements all take the original fold path, and CaseWhen
branches evaluate lazily per row).

The unrolled tree is ~1.3k expression nodes per cosine and costs
~1.6 s of EXTRA analysis/codegen time per query plan (measured r12:
l2-shape plan-only 0.58 s fold vs 2.19 s unrolled) — per PLAN, not
per row. So unrolling is OPT-IN (``dim=None`` default keeps the
fold): callers whose evaluation count is quadratic in rows (pair
self-joins — d05/l06-shape, millions of evals) pass
``dim=EMBED_DIM`` and win 10–30 s of interpreted-fold time; linear
per-row callers (top-k scans over thousands of rows) keep the fold,
whose interpretation cost is far below the planning overhead.

This module sits BELOW both ``operators`` and ``queries`` and
imports neither, so either layer can use it without a cycle
(``queries._util`` re-exports these names for the query builders).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Corpus-wide embedding dimensionality (embeddings.parquet at every
# SF and every synth fixture — verified round 12). Only a fast-path
# hint: rows of any other size fall back to the fold.
EMBED_DIM = 64


def _col(v: Column | str) -> Column:
    return v if isinstance(v, Column) else F.col(v)


def _chain(terms) -> Column:
    """Left-associated sum starting from lit(0.0) — the exact IEEE
    evaluation order of ``F.aggregate(…, lit(0.0), acc + x)``."""
    acc = F.lit(0.0)
    for term in terms:
        acc = acc + term
    return acc


def vsum(v: Column | str, dim: int | None = None) -> Column:
    v = _col(v)
    fold = F.aggregate(v, F.lit(0.0), lambda a, x: a + x.cast("double"))
    if not dim:
        return fold
    unrolled = _chain(
        F.element_at(v, i).cast("double") for i in range(1, dim + 1)
    )
    return F.when(F.size(v) == dim, unrolled).otherwise(fold)


def dot(
    a: Column | str, b: Column | str, dim: int | None = None
) -> Column:
    a, b = _col(a), _col(b)
    fold = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    if not dim:
        return fold
    unrolled = _chain(
        F.element_at(a, i).cast("double")
        * F.element_at(b, i).cast("double")
        for i in range(1, dim + 1)
    )
    return F.when(
        (F.size(a) == dim) & (F.size(b) == dim), unrolled
    ).otherwise(fold)


def sq_norm(v: Column | str, dim: int | None = None) -> Column:
    v = _col(v)
    fold = F.aggregate(
        F.transform(v, lambda x: x.cast("double") * x),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    if not dim:
        return fold
    unrolled = _chain(
        F.element_at(v, i).cast("double") * F.element_at(v, i).cast("double")
        for i in range(1, dim + 1)
    )
    return F.when(F.size(v) == dim, unrolled).otherwise(fold)


def norm(v: Column | str, dim: int | None = None) -> Column:
    return F.sqrt(sq_norm(v, dim))


def cosine(
    a: Column | str, b: Column | str, dim: int | None = None
) -> Column:
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))


def euclidean(
    a: Column | str, b: Column | str, dim: int | None = None
) -> Column:
    a, b = _col(a), _col(b)
    fold = F.aggregate(
        F.zip_with(
            a, b, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    if not dim:
        inner = fold
    else:
        diffs = [
            F.element_at(a, i).cast("double") - F.element_at(b, i).cast("double")
            for i in range(1, dim + 1)
        ]
        unrolled = _chain(d * d for d in diffs)
        inner = F.when(
            (F.size(a) == dim) & (F.size(b) == dim), unrolled
        ).otherwise(fold)
    return F.sqrt(inner)
