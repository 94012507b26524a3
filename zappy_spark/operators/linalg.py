"""Distributed dense linear algebra over embedding columns.

The reference's companion workload is scanpy preprocessing —
normalize, then PCA — on a tall-skinny cell×gene matrix (zappy's
``ZappyArray`` exists to feed that; SURVEY §1.1). The tall-skinny
regime (n rows ≫ d dims, d ≤ a few thousand) has a canonical
distributed algorithm, the same one Spark MLlib's RowMatrix uses:

1. **Moments pass** — every partition reduces its rows to
   ``(count, Σx, XᵀX)``: d + d² doubles, computed by numpy over Arrow
   batches (``mapInPandas``). This is the sanctioned Python path —
   vectorized BLAS per batch, one output row per partition — not a
   per-row UDF. The shuffle-free reduce ships partition-count rows to
   the driver (~33 KB each at d=64).
2. **Driver solve** — combine partials, ``cov = (G − n·μμᵀ)/(n−1)``,
   then ``eigh`` on the d×d matrix: driver-side by design, exactly
   like zappy gathers per-chunk partials for axis-0 reductions.
3. **Projection pass** — scores = (x − μ)·Vₖ as JVM array-lambda
   expressions with the k eigenvectors shipped as literals: scan-side,
   codegen'd, no Python, no shuffle.

At 100 TB: two scans (moments, projection), zero data shuffles.
d² must fit on the driver — true through d ≈ 20k, far beyond
embedding widths; wider-than-tall needs a different factorization
(out of scope, as it is for zappy).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def moment_partials(
    df: DataFrame, vec_col: str
) -> tuple[int, np.ndarray, np.ndarray]:
    """Additive moment partials (n, Σx[d], ΣxxT[d*d] flat) of an
    array column in one distributed pass — Arrow-batched per-partition
    numpy, then a driver sum of ≤ num_partitions tiny rows. Additive
    means mergeable: partials from disjoint row sets sum to the whole
    — the property the incremental/streaming moments job builds on."""
    def partials(batches):
        import pandas as pd

        n, s, g = 0, None, None
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            g = x.T @ x if g is None else g + x.T @ x
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
            )

    rows = (
        df.select(vec_col)
        .mapInPandas(partials, schema="n bigint, s array<double>, g array<double>")
        .collect()
    )
    if not rows:
        raise ValueError("moment_partials() of an empty frame")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    g = np.sum([np.asarray(r["g"]) for r in rows], axis=0)
    return n, s, g


def moments_from_partials(
    n: int, s: np.ndarray, g: np.ndarray
) -> tuple[int, np.ndarray, np.ndarray]:
    """(n, mean, cov) from additive partials (ddof=1, numpy.cov
    parity) — the single definition both the batch and the streaming
    moments paths finish with."""
    d = s.shape[0]
    mu = s / n
    cov = (g.reshape(d, d) - n * np.outer(mu, mu)) / max(n - 1, 1)
    return n, mu, cov


def moments(df: DataFrame, vec_col: str) -> tuple[int, np.ndarray, np.ndarray]:
    """(n, mean[d], cov[d,d]) of an array column, one distributed pass.

    Covariance is the sample covariance (ddof=1, numpy.cov parity).
    """
    return moments_from_partials(*moment_partials(df, vec_col))


def pca_fit(
    df: DataFrame, vec_col: str, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(components[k,d], explained_variance[k], mean[d]).

    Deterministic sign convention: each component's largest-|.|
    coordinate is positive (sklearn-style), so results are comparable
    across runs and against local numpy."""
    _, mu, cov = moments(df, vec_col)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T
    signs = np.sign(comps[np.arange(len(order)), np.abs(comps).argmax(axis=1)])
    signs[signs == 0] = 1.0
    return comps * signs[:, None], vals[order], mu


def project(vec: str | Column, components: np.ndarray, mean: np.ndarray) -> list[Column]:
    """Score columns [(x − μ)·Vⱼ for j < k] as pure JVM expressions —
    the eigenvectors ride along as array literals, so the projection
    pass is scan-side whole-stage-codegen with no Python."""
    out = []
    for comp in np.asarray(components, dtype=np.float64):
        c = F.array(*[F.lit(float(v)) for v in comp])
        offset = float(np.dot(mean, comp))
        dotp = F.aggregate(
            F.zip_with(vec, c, lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        out.append(dotp - F.lit(offset))
    return out


def pca_transform(
    df: DataFrame, vec_col: str, id_col: str, k: int
) -> DataFrame:
    """Fit + project: (id, pc0..pc{k-1}). Two scans, no shuffle."""
    comps, _, mu = pca_fit(df, vec_col, k)
    scores = project(vec_col, comps, mu)
    return df.select(
        F.col(id_col),
        *[s.alias(f"pc{j}") for j, s in enumerate(scores)],
    )


def standardize(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Per-dimension z-score standardization of an embedding column —
    the feature-scaling pass before distance-based ops (k-means, kNN)
    when dimensions have heterogeneous scales.

    The stats pass is posexplode → ONE narrow (pos) aggregate —
    plan width constant in ``dim`` (the 2×dim-column spelling
    strained codegen past dim ≈ 1k, same issue VERDICT r3 flagged
    for the kmeans update) — collected as dim rows (2×dim numbers)
    and shipped back as two array literals; the transform is then
    scan-side JVM zip_with arithmetic. Two scans of the column, zero
    data shuffles — same shape as the PCA moments pass. Appends
    ``std_vec`` (array<double>)."""
    rows = (
        df.select(F.posexplode(F.col(vec_col)).alias("pos", "x"))
        .groupBy("pos")
        .agg(
            F.avg("x").alias("m"),
            F.stddev_samp("x").alias("s"),
        )
        .collect()
    )
    if len(rows) != dim:
        raise ValueError(
            f"expected {dim} dimensions, aggregate saw {len(rows)}"
        )
    mu = [0.0] * dim
    sd = [1.0] * dim
    for r in rows:
        mu[r["pos"]] = float(r["m"])
        sd[r["pos"]] = float(r["s"])
    mc = F.array(*[F.lit(v) for v in mu])
    sc = F.array(*[F.lit(v) for v in sd])
    std_vec = F.zip_with(
        F.zip_with(F.col(vec_col), mc, lambda x, m: x.cast("double") - m),
        sc,
        lambda xm, s: xm / s,
    )
    return df.select(*df.columns, std_vec.alias("std_vec"))
