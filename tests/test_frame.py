"""ZappyFrame vs numpy — the reference's oracle style: same
expression on a plain ndarray and on the distributed frame, assert
allclose (zappy's test_base.py pattern, SURVEY §5.1)."""

from __future__ import annotations

import numpy as np
import pytest

from zappy_spark.frame import ZappyFrame


@pytest.fixture(scope="module")
def xz(spark):
    rng = np.random.default_rng(7)
    X = rng.uniform(0.1, 5.0, size=(37, 5))
    return X, ZappyFrame.from_ndarray(spark, X, num_partitions=4)


def test_elementwise_unary(xz):
    X, zf = xz
    assert np.allclose(zf.log1p().asndarray(), np.log1p(X))
    assert np.allclose(zf.sqrt().asndarray(), np.sqrt(X))
    assert np.allclose(zf.square().asndarray(), X * X)
    assert np.allclose((-zf).asndarray(), -X)
    assert np.allclose(zf.floor().asndarray(), np.floor(X))


def test_numpy_ufunc_interop(xz):
    X, zf = xz
    assert np.allclose(np.log1p(zf).asndarray(), np.log1p(X))
    assert np.allclose(np.exp(zf).asndarray(), np.exp(X))
    assert np.allclose((2.0 - zf).asndarray(), 2.0 - X)


def test_extended_unary_ufuncs(xz):
    X, zf = xz
    assert np.allclose(zf.log2().asndarray(), np.log2(X))
    assert np.allclose(zf.log10().asndarray(), np.log10(X))
    assert np.allclose(zf.tanh().asndarray(), np.tanh(X))
    assert np.allclose(zf.rint().asndarray(), np.rint(X))
    assert np.allclose(zf.clip(0.5, 2.0).asndarray(), np.clip(X, 0.5, 2.0))
    assert np.allclose(zf.clip(hi=1.0).asndarray(), np.clip(X, None, 1.0))
    # ufunc dispatch forms
    assert np.allclose(np.tanh(zf).asndarray(), np.tanh(X))
    assert np.allclose(np.clip(zf, 0.5, 2.0).asndarray(), np.clip(X, 0.5, 2.0))
    with pytest.raises(ValueError):
        zf.clip()


def test_broadcast_shapes(xz):
    X, zf = xz
    # scalar
    assert np.allclose((zf * 3 + 1).asndarray(), X * 3 + 1)
    # row vector (1×ncols)
    rv = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    assert np.allclose((zf - rv).asndarray(), X - rv)
    # same shape (aligned zip via row_id join)
    assert np.allclose((zf * zf).asndarray(), X * X)
    # column vector (axis-1 reduction reused as operand)
    norm = zf / zf.sum(axis=1)
    assert np.allclose(norm.asndarray(), X / X.sum(axis=1)[:, None])


def test_axis_aggregations(xz):
    X, zf = xz
    assert np.isclose(zf.sum(), X.sum())
    assert np.allclose(zf.sum(axis=0), X.sum(axis=0))
    assert np.allclose(zf.sum(axis=1).asndarray(), X.sum(axis=1))
    assert np.allclose(zf.mean(axis=0), X.mean(axis=0))
    assert np.allclose(zf.mean(axis=1).asndarray(), X.mean(axis=1))
    assert np.allclose(zf.var(axis=0), X.var(axis=0))
    assert np.allclose(zf.std(axis=0, ddof=1), X.std(axis=0, ddof=1))
    assert np.allclose(zf.min(axis=0), X.min(axis=0))
    assert np.allclose(zf.max(axis=1).asndarray(), X.max(axis=1))
    assert np.isclose(zf.max(), X.max())
    assert zf.count_nonzero() == np.count_nonzero(X)
    assert zf.any() == X.astype(bool).any()
    assert zf.all() == X.astype(bool).all()


def test_boolean_masking(xz):
    X, zf = xz
    mask = zf.sum(axis=1) > 7.5
    assert np.allclose(zf[mask, :].asndarray(), X[X.sum(axis=1) > 7.5, :])
    # empty result keeps shape discipline
    assert zf[zf.sum(axis=1) > 1e9, :].asndarray().shape == (0, 5)


def test_indexing(xz):
    X, zf = xz
    assert np.allclose(zf[:, [0, 2]].asndarray(), X[:, [0, 2]])
    assert np.allclose(zf[:, 1:4].asndarray(), X[:, 1:4])
    assert np.allclose(zf[3:7].asndarray(), X[3:7])
    bools = np.array([True, False, True, False, True])
    assert np.allclose(zf[:, bools].asndarray(), X[:, bools])


def test_comparisons(xz):
    X, zf = xz
    gt = (zf > 2.5).asndarray()
    assert np.array_equal(gt.astype(bool), X > 2.5)


def test_astype(xz):
    X, zf = xz
    out = zf.astype("int64").asndarray()
    assert out.dtype == np.int64
    assert np.array_equal(out, X.astype(np.int64))


def test_scanpy_style_pipeline(xz):
    """The reference's target workload: normalize → log1p → filter."""
    X, zf = xz
    out = (zf / zf.sum(axis=1)).log1p()
    keep = out.sum(axis=1) > 0
    got = out[keep, :].asndarray()
    ref = np.log1p(X / X.sum(axis=1)[:, None])
    ref = ref[ref.sum(axis=1) > 0, :]
    assert np.allclose(got, ref)


def test_parquet_round_trip(xz, tmp_path):
    X, zf = xz
    p = str(tmp_path / "zf.parquet")
    zf.to_parquet(p, num_chunks=3)
    back = ZappyFrame.from_parquet(
        zf.df.sparkSession, p, vec_col="vec", row_id_col="row_id"
    )
    assert np.allclose(back.asndarray(), X)
    assert back.shape == X.shape


def test_scanpy_scale_standardize(xz):
    """scanpy `scale`: (X - mean) / std per column — axis-0 stats
    broadcast back as a row vector (the reference's target pipeline)."""
    X, zf = xz
    mu = zf.mean(axis=0)       # local ndarray (zappy semantics)
    sd = zf.std(axis=0)
    out = (zf - mu) / sd       # row-vector broadcasts
    ref = (X - X.mean(axis=0)) / X.std(axis=0)
    assert np.allclose(out.asndarray(), ref)


def test_vector_arithmetic(xz):
    """ZappyVector scalar arithmetic: X / (rowsum + 1) etc."""
    X, zf = xz
    out = zf / (zf.sum(axis=1) + 1.0)
    ref = X / (X.sum(axis=1) + 1.0)[:, None]
    assert np.allclose(out.asndarray(), ref)
    v = zf.sum(axis=1)
    assert np.allclose((2.0 * v - 1.0).asndarray(), 2.0 * X.sum(axis=1) - 1.0)
    assert np.allclose((1.0 / v).asndarray(), 1.0 / X.sum(axis=1))


def test_row_slice_step_and_negative(xz):
    """Review regression: slices with step / negative bounds must
    match numpy exactly (previously silently wrong)."""
    X, zf = xz
    assert np.allclose(zf[0:10:2].asndarray(), X[0:10:2])
    assert np.allclose(zf[-5:].asndarray(), X[-5:])
    assert np.allclose(zf[:-2].asndarray(), X[:-2])
    assert np.allclose(zf[3:30:7].asndarray(), X[3:30:7])


def test_eq_ne_masks(xz):
    """Review regression: == / != must build masks, not Python bools."""
    X, zf = xz
    v = zf.sum(axis=1)
    mask = v != 0.0
    assert not isinstance(mask, bool)
    assert zf[mask, :].asndarray().shape == X.shape
    eq_mask = v == -1.0  # no row sums to -1
    assert zf[eq_mask, :].asndarray().shape == (0, X.shape[1])


def test_from_parquet_empty_raises(spark, tmp_path, xz):
    X, zf = xz
    p = str(tmp_path / "empty.parquet")
    zf.df.filter("row_id < 0").write.parquet(p)
    with pytest.raises(ValueError, match="empty dataset"):
        ZappyFrame.from_parquet(spark, p, vec_col="vec", row_id_col="row_id")


def test_chained_slices_are_positional(xz):
    """Review regression: slices act on positions of the CURRENT
    frame, not raw row_ids — chained/derived frames must match numpy."""
    X, zf = xz
    assert np.allclose(zf[10:20][-5:].asndarray(), X[10:20][-5:])
    assert np.allclose(zf[0:20:2][::2].asndarray(), X[0:20:2][::2])
    mask = zf.sum(axis=1) > 7.5
    ref = X[X.sum(axis=1) > 7.5, :]
    assert np.allclose(zf[mask, :][2:5].asndarray(), ref[2:5])


def test_slice_step_errors(xz):
    X, zf = xz
    with pytest.raises(ValueError, match="step cannot be zero"):
        zf[0:10:0]
    with pytest.raises(NotImplementedError, match="negative slice steps"):
        zf[::-1]


def test_frame_eq_ne_masks(xz):
    """Frame-level == / != build 0/1 masks (numpy semantics)."""
    X, zf = xz
    m = (zf == X[0, 0]).asndarray()
    assert np.array_equal(m.astype(bool), X == X[0, 0])
    n = (zf != 0.0).asndarray()
    assert np.array_equal(n.astype(bool), X != 0.0)


def test_var_std_axis1_match_numpy(spark):
    import numpy as np

    from zappy_spark.frame import ZappyFrame

    rng = np.random.default_rng(11)
    X = rng.normal(loc=3.0, size=(40, 6))
    zf = ZappyFrame.from_ndarray(spark, X)
    for ddof in (0, 1):
        got_v = np.asarray(zf.var(axis=1, ddof=ddof).asndarray())
        got_s = np.asarray(zf.std(axis=1, ddof=ddof).asndarray())
        assert np.allclose(got_v, X.var(axis=1, ddof=ddof), atol=1e-10)
        assert np.allclose(got_s, X.std(axis=1, ddof=ddof), atol=1e-10)


def test_from_columns_keyless_ids_contiguous_stable_no_window(spark):
    """Keyless from_columns (VERDICT r3 wrong-1): partition-offset row
    ids must be contiguous 0..n-1, identical across two builds of the
    same source, and the plan must contain NO Window node (the old
    spelling was a single-partition global sort)."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_DIR
    from zappy_spark.frame import ZappyFrame

    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_quantity", "l_extendedprice")
        .repartition(7)  # multi-partition on purpose
        .cache()
    )
    n = li.count()
    cols = ["l_quantity", "l_extendedprice"]
    zf = ZappyFrame.from_columns(li, cols)
    ids = zf.df.select("row_id")
    stats = ids.agg(
        F.min("row_id").alias("lo"),
        F.max("row_id").alias("hi"),
        F.countDistinct("row_id").alias("nd"),
        F.count("*").alias("cnt"),
    ).first()
    assert (stats["lo"], stats["hi"]) == (0, n - 1)
    assert stats["nd"] == stats["cnt"] == n
    # stable: same source partitioning → same (id, vec) assignment
    h1 = zf.df.agg(F.sum(F.hash("row_id", "vec"))).first()[0]
    h2 = ZappyFrame.from_columns(li, cols).df.agg(
        F.sum(F.hash("row_id", "vec"))
    ).first()[0]
    assert h1 == h2
    plan = zf.df._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" not in plan, "keyless ingest still uses a window"
    li.unpersist()


def test_dot_matches_numpy(spark):
    import numpy as np

    from zappy_spark.frame import ZappyFrame

    rng = np.random.default_rng(7)
    a = rng.normal(size=(25, 5))
    w = rng.normal(size=5)
    zf = ZappyFrame.from_ndarray(spark, a, num_partitions=3)
    assert np.allclose((zf @ w).asndarray(), a @ w)
    assert np.allclose(zf.dot(w).asndarray(), a @ w)
    try:
        zf.dot([1.0, 2.0])
        raise AssertionError("length mismatch must raise")
    except ValueError:
        pass


def test_where_scalar_and_frame(spark):
    """np.where parity: mask from a comparison, scalar and frame
    'other' operands."""
    rng = np.random.default_rng(21)
    m = rng.normal(size=(15, 6))
    o = rng.normal(size=(15, 6))
    zf = ZappyFrame.from_ndarray(spark, m, num_partitions=3)
    zo = ZappyFrame.from_ndarray(spark, o, num_partitions=2)

    got_scalar = zf.where(zf > 0, -1.0).asndarray()
    assert np.allclose(got_scalar, np.where(m > 0, m, -1.0))

    got_frame = zf.where(zf > 0, zo).asndarray()
    assert np.allclose(got_frame, np.where(m > 0, m, o))


def test_cumsum_axis1_matches_numpy(spark):
    rng = np.random.default_rng(22)
    m = rng.normal(size=(10, 7))
    zf = ZappyFrame.from_ndarray(spark, m, num_partitions=3)
    assert np.allclose(zf.cumsum(axis=1).asndarray(), m.cumsum(axis=1))
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        zf.cumsum(axis=0)


def test_matmul_matrix_matches_numpy(spark):
    rng = np.random.default_rng(23)
    m = rng.normal(size=(12, 5))
    w = rng.normal(size=(5, 3))
    zf = ZappyFrame.from_ndarray(spark, m, num_partitions=2)
    out = zf @ w
    assert out.ncols == 3
    assert np.allclose(out.asndarray(), m @ w)
    # vector path unchanged
    v = rng.normal(size=5)
    assert np.allclose(np.asarray((zf @ v).asndarray()), m @ v)


def test_scrna_recipe_frame_matches_query_and_numpy(spark):
    """The z27 declarative recipe, its ZappyFrame-API spelling, and
    plain numpy all agree: filter_cells (row-sum > 6.4) →
    normalize_total(target=100) → log1p → per-gene mean/var_pop."""
    from tests.conftest import SF_DIR
    from zappy_spark.queries.zappy_ops import z27

    zf = ZappyFrame.from_parquet(
        spark, f"{SF_DIR}/embeddings.parquet", "embedding", "vec_id"
    )
    a = zf.abs()
    tot = a.sum(axis=1)
    kept = a[tot > 6.4]
    norm = (kept / kept.sum(axis=1)) * 100.0
    lg = norm.log1p()
    mu, s2 = lg.mean(axis=0), lg.var(axis=0, ddof=0)

    q = z27(spark, SF_DIR).collect()
    assert len(q) == zf.ncols
    assert np.allclose(mu, [r.mu for r in q], atol=2e-6)
    assert np.allclose(s2, [r.s2 for r in q], atol=2e-6)

    m = np.abs(zf.asndarray())
    keep = m.sum(axis=1) > 6.4
    ref = np.log1p(m[keep] / m[keep].sum(axis=1, keepdims=True) * 100.0)
    assert np.allclose(mu, ref.mean(axis=0))
    assert np.allclose(s2, ref.var(axis=0))


def test_row_median_matches_numpy(spark):
    """median(axis=1) for odd and even widths; axis=0 refused with
    guidance to the aggregate form."""
    import pytest as _pytest

    rng = np.random.default_rng(11)
    for shape in [(9, 7), (8, 6)]:
        m = rng.normal(size=shape)
        zf = ZappyFrame.from_ndarray(spark, m, num_partitions=2)
        assert np.allclose(
            zf.median(axis=1).asndarray(), np.median(m, axis=1)
        )
    with _pytest.raises(NotImplementedError):
        ZappyFrame.from_ndarray(spark, rng.normal(size=(3, 3))).median(axis=0)


def test_argmax_argmin_match_numpy(spark):
    rng = np.random.default_rng(17)
    m = rng.normal(size=(12, 9))
    m[3, 2] = m[3, 7] = m[3].max() + 1.0  # planted tie -> first wins
    zf = ZappyFrame.from_ndarray(spark, m, num_partitions=3)
    assert np.array_equal(
        zf.argmax(axis=1).asndarray().astype(int), np.argmax(m, axis=1)
    )
    assert np.array_equal(
        zf.argmin(axis=1).asndarray().astype(int), np.argmin(m, axis=1)
    )


def test_argmax_argmin_axis0_match_numpy(spark):
    """Round 6: axis=0 arg-extremes are aggregates (struct-max with
    negated-id tie-break) — must match numpy including the
    first-occurrence-on-ties rule."""
    rng = np.random.default_rng(23)
    m = rng.normal(size=(15, 6))
    mx = m[:, 4].max() + 1.0
    m[2, 4] = m[9, 4] = mx  # planted column tie -> row 2 wins
    mn = m[:, 1].min() - 1.0
    m[5, 1] = m[11, 1] = mn  # planted min tie -> row 5 wins
    zf = ZappyFrame.from_ndarray(spark, m, num_partitions=4)
    assert np.array_equal(zf.argmax(axis=0), np.argmax(m, axis=0))
    assert np.array_equal(zf.argmin(axis=0), np.argmin(m, axis=0))
