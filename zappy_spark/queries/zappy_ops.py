"""Z-series: the reference's array-operator surface on DataFrames.

zappy's operator set (SURVEY §2.1; public repo ``zappy/base.py`` —
``_unary_ufunc`` / ``_binary_ufunc`` dispatchers, ``_calc_func_axis``
aggregations, ``__getitem__`` masking) re-expressed as Catalyst column
expressions:

- elementwise ufuncs      → built-in functions (Z3 Z4 Z6 Z7)
- comparisons → bool      → boolean columns (Z9)
- axis=0 aggregation      → ``df.agg`` (partial→final, zappy's
                            per-chunk-then-reduce done by the engine)
                            (Z1 Z2 Z12 Z13 Z15 Z16 Z18)
- axis=1 aggregation      → array lambda reduce, one row at a time,
                            fully distributed (Z5 Z14 Z17 Z19 Z24)
- boolean mask / fancy
  index (``__getitem__``) → filter / select (Z10 Z11)

Everything is JVM-side whole-stage-codegen; no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zappy_spark.queries._util import t, vsum


def z1(spark: SparkSession, d: str) -> DataFrame:
    """sum(axis=0): per-column total → driver-side scalar row.

    b accumulates in DECIMAL(18,2): l_extendedprice is exactly 2dp,
    so the decimal sum is exact and order-independent — the double
    sum was one data refresh from a half-cent ROUND boundary (the
    r56 failure class, scripts/audit_rounding.py). a (quantity) is
    integer-valued, its double sum is already exact below 2^53."""
    return t(spark, d, "lineitem").agg(
        F.round(F.sum("l_quantity"), 2).alias("a"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("b"),
    )


def z2(spark: SparkSession, d: str) -> DataFrame:
    """mean(axis=0). b's mean is spelled exact-decimal-sum ÷ count:
    the sf0.01 double AVG lands 5e-9 from its ROUND(...,6) half
    boundary (audit_rounding.py), so the one-ulp partial-agg
    wobble could flip the 6th digit. Decimal sum + one double
    division is order-independent; a's quantity sum is integer-exact
    already."""
    li = t(spark, d, "lineitem")
    return li.agg(
        F.round(F.avg("l_quantity"), 6).alias("a"),
        F.round(
            F.sum(F.col("l_discount").cast("decimal(18,2)")).cast("double")
            / F.count("l_discount"),
            6,
        ).alias("b"),
    )


def z3(spark: SparkSession, d: str) -> DataFrame:
    return (
        t(spark, d, "lineitem")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.log1p("l_quantity"), 6).alias("v"),
        )
        .orderBy("l_orderkey", "l_linenumber", "v")
        .limit(100)
    )


def z4(spark: SparkSession, d: str) -> DataFrame:
    return (
        t(spark, d, "lineitem")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.exp("l_discount"), 6).alias("e"),
            F.round(F.exp("l_discount") - 1, 6).alias("em"),
        )
        .orderBy("l_orderkey", "l_linenumber", "e", "em")
        .limit(100)
    )


def z5(spark: SparkSession, d: str) -> DataFrame:
    """sum(axis=1): per-row reduce of the array column, distributed."""
    return (
        t(spark, d, "embeddings")
        .select("vec_id", F.round(vsum("embedding"), 4).alias("s"))
        .orderBy("vec_id")
        .limit(100)
    )


def z6(spark: SparkSession, d: str) -> DataFrame:
    li = t(spark, d, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.sqrt("l_quantity"), 6).alias("sq"),
            F.round(F.col("l_discount") * F.col("l_discount"), 6).alias("p2"),
            F.abs(F.col("l_quantity") - 25).alias("ab"),
            (-F.col("l_tax")).alias("neg"),
            F.signum(F.col("l_quantity") - 25.0).alias("sg"),
            F.floor(F.col("l_extendedprice") / 1000).alias("fl"),
            F.ceil(F.col("l_tax") * 100).alias("ce"),
        )
        .orderBy(
            "l_orderkey", "l_linenumber", "sq", "p2", "ab", "neg", "sg", "fl", "ce"
        )
        .limit(100)
    )


def z7(spark: SparkSession, d: str) -> DataFrame:
    """Scalar-broadcast arithmetic; Catalyst constant-folds 3/1.5."""
    return (
        t(spark, d, "lineitem")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round((F.col("l_quantity") + 1.5) * 2 - 3 / 1.5, 6).alias("v"),
        )
        .orderBy("l_orderkey", "l_linenumber", "v")
        .limit(100)
    )


def z9(spark: SparkSession, d: str) -> DataFrame:
    """Comparisons produce bool columns; count via conditional sum."""
    li = t(spark, d, "lineitem")
    return li.agg(
        F.sum(
            F.when(F.col("l_quantity") > F.col("l_discount") * 100, 1).otherwise(0)
        ).alias("c"),
        F.sum(F.when(F.col("l_tax") >= 0.04, 1).otherwise(0)).alias("d"),
    )


def z10(spark: SparkSession, d: str) -> DataFrame:
    """Boolean row mask — zappy's X[mask, :]; a free filter in Spark."""
    return (
        t(spark, d, "lineitem")
        .filter((F.col("l_quantity") > 45) & (F.col("l_discount") < 0.05))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")
        .limit(100)
    )


def z11(spark: SparkSession, d: str) -> DataFrame:
    """Column select — fancy-index on axis 1 → projection (pruned scan)."""
    return (
        t(spark, d, "lineitem")
        .filter(F.col("l_orderkey") < 100)
        .select("l_orderkey", "l_partkey", "l_quantity")
        .orderBy("l_orderkey", "l_partkey", "l_quantity")
        .limit(100)
    )


def z12(spark: SparkSession, d: str) -> DataFrame:
    li = t(spark, d, "lineitem")
    return li.agg(
        F.round(F.var_pop("l_discount"), 8).alias("vp"),
        F.round(F.stddev_pop("l_discount"), 8).alias("sp"),
        F.round(F.var_samp("l_discount"), 8).alias("vs"),
        F.round(F.stddev_samp("l_discount"), 8).alias("ss"),
    )


def z13(spark: SparkSession, d: str) -> DataFrame:
    li = t(spark, d, "lineitem")
    return li.agg(
        F.min("l_quantity").alias("a"),
        F.max("l_quantity").alias("b"),
        F.min("l_shipdate").alias("c"),
        F.max("l_shipdate").alias("d"),
        F.min("l_returnflag").alias("e"),
        F.max("l_returnflag").alias("f"),
    )


def z14(spark: SparkSession, d: str) -> DataFrame:
    return (
        t(spark, d, "embeddings")
        .select(
            "vec_id",
            F.round(F.array_min("embedding"), 6).alias("mn"),
            F.round(F.array_max("embedding"), 6).alias("mx"),
        )
        .orderBy("vec_id")
        .limit(100)
    )


def z15(spark: SparkSession, d: str) -> DataFrame:
    li = t(spark, d, "lineitem")
    return li.agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("a"),
        F.sum((F.col("l_discount") * 100).cast("bigint")).alias("b"),
    )


def z16(spark: SparkSession, d: str) -> DataFrame:
    return (
        t(spark, d, "lineitem")
        .agg(F.sum(F.when(F.col("l_discount") != 0, 1).otherwise(0)).alias("nz"))
    )


def z17(spark: SparkSession, d: str) -> DataFrame:
    """Column-vector broadcast (X / X.sum(axis=1)) — same-row expr,
    no zip-of-aligned-partitions needed (zappy's EP2, SURVEY §3.1)."""
    emb = t(spark, d, "embeddings")
    s = vsum("embedding")
    return (
        emb.select(
            "vec_id",
            F.round(F.element_at("embedding", 1) / s, 6).alias("e1"),
            F.round(F.element_at("embedding", 2) / s, 6).alias("e2"),
        )
        .orderBy("vec_id")
        .limit(100)
    )


def z18(spark: SparkSession, d: str) -> DataFrame:
    return (
        t(spark, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.bool_and(F.col("l_quantity") > 0).alias("ba"),
            F.bool_or(F.col("l_discount") > 0.09).alias("bo"),
        )
        .orderBy("l_returnflag")
    )


def z19(spark: SparkSession, d: str) -> DataFrame:
    return (
        t(spark, d, "embeddings")
        .select(
            "vec_id",
            F.round(vsum("embedding") / F.size("embedding"), 6).alias("m"),
        )
        .orderBy("vec_id")
        .limit(100)
    )


def z20(spark: SparkSession, d: str) -> DataFrame:
    """median / percentile (zappy gathers the vector and calls
    np.median — scanpy normalize_per_cell; we use the exact
    distributed percentile with linear interpolation, verified to
    match DuckDB quantile_cont; at 100 TB swap approx_percentile)."""
    li = t(spark, d, "lineitem")
    return li.agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("m"),
        F.round(F.percentile("l_extendedprice", F.lit(0.25)), 6).alias("q1"),
        F.round(F.percentile("l_discount", F.lit(0.9)), 6).alias("p90"),
    )


def z21(spark: SparkSession, d: str) -> DataFrame:
    """Bivariate stats: corr / covar (beyond-reference numpy-parity
    surface — np.corrcoef/np.cov analogs as single-pass aggregates)."""
    li = t(spark, d, "lineitem")
    return li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 8).alias("c"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("cp"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("cs"),
    )


def z22(spark: SparkSession, d: str) -> DataFrame:
    """Higher moments (4dp: Spark and DuckDB use different numeric
    paths; verified to agree at this precision)."""
    li = t(spark, d, "lineitem")
    return li.agg(
        F.round(F.skewness("l_quantity"), 4).alias("sk"),
        F.round(F.kurtosis("l_quantity"), 4).alias("ku"),
    )


def z23(spark: SparkSession, d: str) -> DataFrame:
    """Linear-regression aggregates (regr_* family)."""
    li = t(spark, d, "lineitem")
    return li.agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias("sl"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias("ic"),
        F.regr_count("l_extendedprice", "l_quantity").alias("n"),
    )


def z24(spark: SparkSession, d: str) -> DataFrame:
    """var/std axis=1 (per-row, over the array column) — centered
    sum-of-squares form, same expression ZappyFrame.var(axis=1) uses."""
    emb = t(spark, d, "embeddings")
    v = F.col("embedding")
    n = F.size(v).cast("double")
    m_expr = F.aggregate(v, F.lit(0.0), lambda a, x: a + x.cast("double")) / n

    # r12: let-bind the mean — referencing the mean fold inside the
    # ssd lambda re-ran it per element (no CSE in interpreted HOFs).
    # Same value, bit-identical result (mirrors ZappyFrame._row_var).
    def _ssd(m):
        return F.aggregate(
            v,
            F.lit(0.0),
            lambda a, x: a + (x.cast("double") - m) * (x.cast("double") - m),
        )

    ssd = F.element_at(F.transform(F.array(m_expr), _ssd), 1)
    return (
        emb.select(
            "vec_id",
            F.round(ssd / n, 6).alias("vp"),
            F.round(F.sqrt(ssd / (n - 1)), 6).alias("ss"),
        )
        .orderBy("vec_id")
        .limit(100)
    )


def z25(spark: SparkSession, d: str) -> DataFrame:
    """Matrix–vector product (zappy ``X @ w``; round 4 —
    ZappyFrame.dot uses the identical expression): weights derived
    from the 0-based index so both engines build the same literal-
    free weight function; one scan-side transform+aggregate lambda,
    zero shuffles — the distributed matvec that underlies every
    projection (PCA scores, linear probes) at 100 TB."""
    emb = t(spark, d, "embeddings")
    weighted = F.transform(
        F.col("embedding"),
        lambda x, i: x.cast("double")
        * F.when(i % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))
        * ((i % 7).cast("double") + 1.0),
    )
    return (
        emb.select(
            "vec_id",
            F.round(
                F.aggregate(weighted, F.lit(0.0), lambda a, x: a + x), 4
            ).alias("xw"),
        )
        .orderBy("vec_id")
        .limit(100)
    )


def z26(spark: SparkSession, d: str) -> DataFrame:
    """np.clip / np.where elementwise (round 4b; zappy's
    ``_unary_ufunc`` clip dispatch and the where ternary —
    ZappyFrame.clip uses the identical least/greatest expression):
    both constant-fold into one codegen'd projection, zero
    shuffles."""
    li = t(spark, d, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.round(
                F.least(
                    F.greatest(F.col("l_quantity"), F.lit(10.0)),
                    F.lit(40.0),
                ),
                2,
            ).alias("clipped"),
            # decimal 0.9 discount: 2dp×0.9 is an exact 3dp decimal,
            # so the half-cent round is an exact engine-consistent
            # tie (round-7 boundary probe caught a live 4e-11 case)
            F.round(
                F.when(
                    F.col("l_discount") > 0.05,
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * F.lit("0.9").cast("decimal(2,1)"),
                ).otherwise(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                ),
                2,
            )
            .cast("double")
            .alias("wh"),
        )
        .orderBy("l_orderkey", "l_linenumber", "clipped", "wh")
        .limit(100)
    )


def z27(spark: SparkSession, d: str) -> DataFrame:
    """End-to-end scanpy preprocessing recipe (round 4c) — the
    reference's real workload, chained as ONE declarative pipeline:
    filter_cells (row-sum threshold) → normalize_total
    (target_sum=100) → log1p → per-gene scale stats (mean, var_pop).
    zappy runs this as four materialized ndarray passes; here it is
    a single logical plan — one scan, the row stages fuse into one
    codegen'd projection (transform/aggregate lambdas, zero
    shuffles), and only the final per-dim stats shuffle ~64 groups of
    partial aggregates. |x| stands in for counts on the synthetic
    embeddings. The ZappyFrame-API spelling of the same chain is
    pinned equal in test_frame.py."""
    emb = t(spark, d, "embeddings")
    c = F.transform("embedding", lambda x: F.abs(x.cast("double")))
    cells = (
        emb.select("vec_id", c.alias("c"))
        .withColumn("tot", F.aggregate("c", F.lit(0.0), lambda a, x: a + x))
        .filter(F.col("tot") > 6.4)
        .withColumn(
            "n",
            F.transform(
                "c", lambda x: F.log1p(x / F.col("tot") * F.lit(100.0))
            ),
        )
    )
    return (
        cells.select(F.posexplode("n").alias("pos", "x"))
        .groupBy("pos")
        .agg(
            F.round(F.avg("x"), 6).alias("mu"),
            F.round(F.var_pop("x"), 6).alias("s2"),
        )
        .orderBy("pos")
    )


def z28(spark: SparkSession, d: str) -> DataFrame:
    """Per-row median (round 4c; np.median(axis=1), the scanpy
    normalize_per_cell gather — ZappyFrame.median uses the identical
    expression): array_sort once per row, interpolate the middle two
    of the 64-wide embedding, all JVM-side in one scan. The oracle
    replays the same sort+interpolate in DuckDB list functions."""
    emb = t(spark, d, "embeddings")
    srt = F.array_sort(
        F.transform("embedding", lambda x: x.cast("double"))
    )
    med = (F.element_at(srt, 32) + F.element_at(srt, 33)) / 2.0
    return (
        emb.select("vec_id", F.round(med, 6).alias("m"))
        .orderBy("vec_id")
        .limit(100)
    )


def z29(spark: SparkSession, d: str) -> DataFrame:
    """Zarr v2 interop, end-to-end as a driver row (round 5): the
    first 500 embedding rows (dense ids in every fixture vintage)
    are written as a REAL zarr v2 store — ``.zarray`` metadata,
    zlib-compressed raw C-order chunks, padded tail — then read back
    through the chunk-per-partition DataSource and reduced to
    per-position (count, min, max). The oracle computes the same
    stats straight from parquet, so any format defect (fill-value
    padding leaking past the trim, dtype/endianness, chunk
    mis-ordering) flips the row. min/max are order-independent, so
    the check is immune to summation-order ulps; chunk_rows=97
    forces an uneven tail chunk. The 500-row cap keeps the entry a
    FORMAT check at any SF — the scale story (one input partition
    per chunk, executor-side decode) is pinned in test_sources."""
    import os
    import shutil
    import tempfile

    from zappy_spark.sources.zarrlite import read_zarrlite, write_zarr_v2

    emb = t(spark, d, "embeddings").filter(F.col("vec_id") < 500)
    df = emb.select(
        F.col("vec_id").alias("row_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("vec"),
    )
    store = os.path.join(
        tempfile.gettempdir(), f"zs_z29_{os.path.basename(d.rstrip('/'))}"
    )
    # fresh store every run: the metadata-written-last torn-read
    # guarantee only holds for fresh directories — a crashed prior
    # writer leaves complete old metadata beside partly overwritten
    # chunks (round-7 ADVICE fix)
    shutil.rmtree(store, ignore_errors=True)
    write_zarr_v2(df, store, chunk_rows=97, ncols=64, compressor="zlib")
    back = read_zarrlite(spark, store)
    return (
        back.select(F.posexplode("vec").alias("pos", "x"))
        .groupBy("pos")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("x"), 6).alias("mn"),
            F.round(F.max("x"), 6).alias("mx"),
        )
        .orderBy("pos")
    )


def z31(spark: SparkSession, d: str) -> DataFrame:
    """zarr v3 disk round-trip (round 6; sources/zarrlite.py): write
    the first 500 embeddings to a REAL zarr v3 store — ``zarr.json``
    core metadata, default ``c/<i>/0`` chunk keys, gzip codec chain,
    padded tail (chunk_rows=97 forces one) — read it back through
    the chunk-per-partition DataSource, and reduce to per-position
    (count, min, max). The oracle computes the same stats straight
    from parquet, so any v3 format defect (key encoding, codec
    framing, endianness, fill-value leak past the trim) flips the
    row. min/max are order-independent — immune to summation-order
    ulps (the z29 discipline, applied to the v3 path)."""
    import os
    import shutil
    import tempfile

    from zappy_spark.sources.zarrlite import read_zarrlite, write_zarr_v3

    emb = t(spark, d, "embeddings").filter(F.col("vec_id") < 500)
    df = emb.select(
        F.col("vec_id").alias("row_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("vec"),
    )
    store = os.path.join(
        tempfile.gettempdir(), f"zs_z31_{os.path.basename(d.rstrip('/'))}"
    )
    # fresh store every run: the metadata-written-last torn-read
    # guarantee only holds for fresh directories — a crashed prior
    # writer leaves complete old metadata beside partly overwritten
    # chunks (round-7 ADVICE fix)
    shutil.rmtree(store, ignore_errors=True)
    write_zarr_v3(df, store, chunk_rows=97, ncols=64, compressor="gzip")
    back = read_zarrlite(spark, store)
    return (
        back.select(F.posexplode("vec").alias("pos", "x"))
        .groupBy("pos")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("x"), 6).alias("mn"),
            F.round(F.max("x"), 6).alias("mx"),
        )
        .orderBy("pos")
    )


def z32(spark: SparkSession, d: str) -> DataFrame:
    """zarr v2 + numcodecs-LZ4 disk round-trip (round 6;
    sources/lz4lite.py): write the first 400 embeddings to a real v2
    store with ``compressor: {"id": "lz4"}`` — uint32-size-framed
    LZ4 blocks, padded tail (chunk_rows=89 forces one) — read it
    back through the DataSource (the pure-Python block decoder),
    and reduce to per-position (count, min, max). The oracle
    computes the same stats straight from parquet, so any codec
    defect (framing, literal/match decode, fill-value leak) flips
    the row; min/max are order-independent (the z29 discipline,
    applied to the lz4 path)."""
    import os
    import shutil
    import tempfile

    from zappy_spark.sources.zarrlite import read_zarrlite, write_zarr_v2

    emb = t(spark, d, "embeddings").filter(F.col("vec_id") < 400)
    df = emb.select(
        F.col("vec_id").alias("row_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("vec"),
    )
    store = os.path.join(
        tempfile.gettempdir(), f"zs_z32_{os.path.basename(d.rstrip('/'))}"
    )
    # fresh store every run: the metadata-written-last torn-read
    # guarantee only holds for fresh directories — a crashed prior
    # writer leaves complete old metadata beside partly overwritten
    # chunks (round-7 ADVICE fix)
    shutil.rmtree(store, ignore_errors=True)
    write_zarr_v2(df, store, 89, 64, compressor="lz4")
    back = read_zarrlite(spark, store)
    return (
        back.select(F.posexplode("vec").alias("pos", "x"))
        .groupBy("pos")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("x"), 6).alias("mn"),
            F.round(F.max("x"), 6).alias("mx"),
        )
        .orderBy("pos")
    )


def z33(spark: SparkSession, d: str) -> DataFrame:
    """zarr v3 ``sharding_indexed`` disk round-trip (round 8, queued
    r9-head; sources/zarrlite.py sharding support): write the first
    400 embeddings to a real sharded v3 store — 3 inner chunks of 30
    rows per 90-row shard object, crc32c-checksummed offset index at
    the shard tail, the last shard's all-padding inner chunk as the
    spec's MISSING sentinel — read it back through the DataSource
    (index parse + crc verify + inner chain decode per shard), and
    reduce to per-position (count, min, max). The oracle computes the
    same stats straight from parquet, so any sharding defect (offset
    arithmetic, crc, missing-chunk fill leak, inner decode) flips the
    row; min/max are order-independent (the z29/z32 discipline).
    Scale: sharding IS the 100 TB zarr layout — it divides object
    count by the packing factor while ranged reads keep inner chunks
    independently fetchable."""
    import os
    import shutil
    import tempfile

    from zappy_spark.sources.zarrlite import read_zarrlite, write_zarr_v3

    emb = t(spark, d, "embeddings").filter(F.col("vec_id") < 400)
    df = emb.select(
        F.col("vec_id").alias("row_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("vec"),
    )
    store = os.path.join(
        tempfile.gettempdir(), f"zs_z33_{os.path.basename(d.rstrip('/'))}"
    )
    # fresh store every run (the z32 torn-read discipline)
    shutil.rmtree(store, ignore_errors=True)
    # 400 rows / 90-row shards -> 5 shards; the last holds 40 live
    # rows across 2 inner chunks + 1 MISSING inner chunk
    write_zarr_v3(df, store, 30, 64, shard_rows=90)
    back = read_zarrlite(spark, store)
    return (
        back.select(F.posexplode("vec").alias("pos", "x"))
        .groupBy("pos")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("x"), 6).alias("mn"),
            F.round(F.max("x"), 6).alias("mx"),
        )
        .orderBy("pos")
    )


def z34(spark: SparkSession, d: str) -> DataFrame:
    """zarr v2 CONSOLIDATED-metadata round-trip (round 9;
    sources/zarrlite.py::write_consolidated_metadata): write the
    first 300 embeddings as a zlib v2 store with ``consolidated=
    True``, then DELETE the per-key ``.zarray`` so the DataSource
    read-back can only succeed through the ``.zmetadata`` document
    (the real zarr ``consolidate_metadata``/``open_consolidated``
    format, ``zarr_consolidated_format: 1``), and reduce to
    per-position (count, min, max) against the parquet oracle.
    Scale: consolidation is the object-store OPEN-cost fix — one
    GET for a whole hierarchy's metadata instead of one per key;
    the z33 sharding entry is the matching data-plane fix."""
    import os
    import shutil
    import tempfile

    from zappy_spark.sources.zarrlite import read_zarrlite, write_zarr_v2

    emb = t(spark, d, "embeddings").filter(F.col("vec_id") < 300)
    df = emb.select(
        F.col("vec_id").alias("row_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("vec"),
    )
    store = os.path.join(
        tempfile.gettempdir(), f"zs_z34_{os.path.basename(d.rstrip('/'))}"
    )
    # fresh store every run (the z32 torn-read discipline)
    shutil.rmtree(store, ignore_errors=True)
    write_zarr_v2(df, store, 64, 64, compressor="zlib", consolidated=True)
    # the proof: with .zarray gone, only .zmetadata can open it
    os.remove(os.path.join(store, ".zarray"))
    back = read_zarrlite(spark, store)
    return (
        back.select(F.posexplode("vec").alias("pos", "x"))
        .groupBy("pos")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("x"), 6).alias("mn"),
            F.round(F.max("x"), 6).alias("mx"),
        )
        .orderBy("pos")
    )


def z35(spark: SparkSession, d: str) -> DataFrame:
    """zarr v2 APPEND + consolidated-refresh round-trip (round 9;
    sources/zarrlite.py::append_zarr_v2): write the first 200
    embeddings as a consolidated zlib v2 store, append rows 200–299
    (driver-side, partial-tail rewrite + atomic ``.zarray`` replace
    + the ``.zmetadata`` REFRESH the reader's consolidated-first
    preference makes mandatory — a stale consolidated doc would
    silently shadow the grown shape), DELETE ``.zarray``, and read
    all 300 rows back through the refreshed document alone. The
    oracle computes the same per-position stats from parquet, so a
    stale-shape bug surfaces as a row-count mismatch, not a hang.
    Scale: append is the metadata-owner's operation (single-writer
    driver); the 100 appended rows are a bounded instrument."""
    import os
    import shutil
    import tempfile

    import numpy as np

    from zappy_spark.sources.zarrlite import (
        append_zarr_v2,
        read_zarrlite,
        write_zarr_v2,
    )

    emb = t(spark, d, "embeddings")
    df = emb.filter(F.col("vec_id") < 200).select(
        F.col("vec_id").alias("row_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("vec"),
    )
    store = os.path.join(
        tempfile.gettempdir(), f"zs_z35_{os.path.basename(d.rstrip('/'))}"
    )
    shutil.rmtree(store, ignore_errors=True)
    write_zarr_v2(df, store, 64, 64, compressor="zlib", consolidated=True)
    # bounded instrument: 100 appended rows, ordered
    tail = (
        emb.filter(
            (F.col("vec_id") >= 200) & (F.col("vec_id") < 300)
        )
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    append_zarr_v2(
        store, np.array([r["embedding"] for r in tail], dtype=np.float64)
    )
    # the proof: with .zarray gone, only the REFRESHED doc can serve
    os.remove(os.path.join(store, ".zarray"))
    back = read_zarrlite(spark, store)
    return (
        back.select(F.posexplode("vec").alias("pos", "x"))
        .groupBy("pos")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("x"), 6).alias("mn"),
            F.round(F.max("x"), 6).alias("mx"),
        )
        .orderBy("pos")
    )


def z30(spark: SparkSession, d: str) -> DataFrame:
    """argmax/argmin(axis=0) (round 6; np.argmax semantics, the op
    frame.py::ZappyFrame._arg_extreme now implements for axis=0):
    for every embedding position, the vec_id attaining the max and
    the min, FIRST occurrence on ties. Window-free on the Spark
    side: one struct-aggregate per extreme — max of (x, -vec_id)
    orders by value then by negated id, so the tie resolves to the
    smallest id with zero window stages; the shuffle carries ncols
    keys (posexplode + groupBy(pos), partial-agg'd map-side — the
    _col_agg scale shape, independent of nrows). The oracle replays
    it with per-position ROW_NUMBER picks."""
    x = t(spark, d, "embeddings").select(
        "vec_id",
        F.posexplode(
            F.transform("embedding", lambda v: v.cast("double"))
        ).alias("pos", "x"),
    )
    smax = F.struct(F.col("x").alias("x"), (-F.col("vec_id")).alias("nr"))
    smin = F.struct(F.col("x").alias("x"), F.col("vec_id").alias("r"))
    return (
        x.select("pos", smax.alias("sx"), smin.alias("sn"))
        .groupBy("pos")
        .agg(
            (-F.max("sx")["nr"]).alias("argmax_id"),
            F.min("sn")["r"].alias("argmin_id"),
            F.round(F.max("sx")["x"], 6).alias("mx"),
            F.round(F.min("sn")["x"], 6).alias("mn"),
        )
        .select(
            (F.col("pos") + 1).cast("bigint").alias("pos"),
            "argmax_id",
            "argmin_id",
            "mx",
            "mn",
        )
        .orderBy("pos")
    )


QUERIES = {
    "z01_sum_axis0": z1,
    "z02_mean_axis0": z2,
    "z03_log1p": z3,
    "z04_exp_expm1": z4,
    "z05_row_sum_axis1": z5,
    "z06_unary_suite": z6,
    "z07_scalar_broadcast": z7,
    "z09_comparisons": z9,
    "z10_bool_mask": z10,
    "z11_column_select": z11,
    "z12_var_std": z12,
    "z13_minmax_axis0": z13,
    "z14_minmax_axis1": z14,
    "z15_astype_cast": z15,
    "z16_count_nonzero": z16,
    "z17_row_normalize": z17,
    "z18_any_all": z18,
    "z19_mean_axis1": z19,
    "z20_median_percentile": z20,
    "z21_corr_covar": z21,
    "z22_skew_kurt": z22,
    "z23_regr": z23,
    "z24_var_axis1": z24,
    "z25_matvec": z25,
    "z26_clip_where": z26,
    "z27_scrna_recipe": z27,
    "z28_row_median": z28,
    "z29_zarr_v2_roundtrip": z29,
    "z30_argminmax_axis0": z30,
    "z31_zarr_v3_roundtrip": z31,
    "z32_zarr_lz4_roundtrip": z32,
    "z33_zarr_sharded_roundtrip": z33,
    "z34_zarr_consolidated_roundtrip": z34,
    "z35_zarr_append_roundtrip": z35,
}

ORACLE = {
    # z31: Spark reduces values that made a zarr-v3 disk round-trip;
    # DuckDB reads the parquet originals — equality proves the v3
    # write/read path is value-preserving (the z29 contract for v3).
    "z31_zarr_v3_roundtrip": (
        "WITH e AS (SELECT "
        "CAST(generate_subscripts(embedding,1)-1 AS INT) pos, "
        "CAST(unnest(embedding) AS DOUBLE) x "
        "FROM embeddings WHERE vec_id < 500) "
        "SELECT pos, COUNT(*) n, ROUND(MIN(x),6) mn, ROUND(MAX(x),6) mx "
        "FROM e GROUP BY pos ORDER BY pos"
    ),
    # z32: same shape as z31's oracle — stats straight from parquet;
    # the Spark side must agree THROUGH the lz4 disk round-trip.
    "z32_zarr_lz4_roundtrip": (
        "WITH e AS (SELECT "
        "CAST(generate_subscripts(embedding,1)-1 AS INT) pos, "
        "CAST(unnest(embedding) AS DOUBLE) x "
        "FROM embeddings WHERE vec_id < 400) "
        "SELECT pos, COUNT(*) n, ROUND(MIN(x),6) mn, ROUND(MAX(x),6) mx "
        "FROM e GROUP BY pos ORDER BY pos"
    ),
    # z33: same parquet-truth oracle as z32 — the Spark side is the
    # only one that touches the sharded store, so the hash attests
    # the whole sharding read/write path.
    "z33_zarr_sharded_roundtrip": (
        "WITH e AS (SELECT "
        "CAST(generate_subscripts(embedding,1)-1 AS INT) pos, "
        "CAST(unnest(embedding) AS DOUBLE) x "
        "FROM embeddings WHERE vec_id < 400) "
        "SELECT pos, COUNT(*) n, ROUND(MIN(x),6) mn, ROUND(MAX(x),6) mx "
        "FROM e GROUP BY pos ORDER BY pos"
    ),
    # z35: stats straight from parquet over ALL 300 rows; the Spark
    # side went write(200) -> append(100, refreshing .zmetadata) ->
    # DELETE .zarray -> read via the refreshed doc only. A stale
    # consolidated shape shows up as n=200 row counts.
    "z35_zarr_append_roundtrip": (
        "WITH e AS (SELECT "
        "CAST(generate_subscripts(embedding,1)-1 AS INT) pos, "
        "CAST(unnest(embedding) AS DOUBLE) x "
        "FROM embeddings WHERE vec_id < 300) "
        "SELECT pos, COUNT(*) n, ROUND(MIN(x),6) mn, ROUND(MAX(x),6) mx "
        "FROM e GROUP BY pos ORDER BY pos"
    ),
    # z34: stats straight from parquet; the Spark side went write ->
    # consolidate -> DELETE .zarray -> read via .zmetadata only.
    "z34_zarr_consolidated_roundtrip": (
        "WITH e AS (SELECT "
        "CAST(generate_subscripts(embedding,1)-1 AS INT) pos, "
        "CAST(unnest(embedding) AS DOUBLE) x "
        "FROM embeddings WHERE vec_id < 300) "
        "SELECT pos, COUNT(*) n, ROUND(MIN(x),6) mn, ROUND(MAX(x),6) mx "
        "FROM e GROUP BY pos ORDER BY pos"
    ),
    # z30: per-position arg-extremes; Spark's window-free
    # struct-aggregate vs the oracle's ROW_NUMBER picks — same
    # first-occurrence tie rule spelled two independent ways.
    "z30_argminmax_axis0": (
        "WITH x AS (SELECT vec_id, "
        "unnest(CAST(embedding AS DOUBLE[])) x, "
        "generate_subscripts(CAST(embedding AS DOUBLE[]), 1) pos "
        "FROM embeddings), "
        "mx AS (SELECT pos, vec_id, x, ROW_NUMBER() OVER "
        "(PARTITION BY pos ORDER BY x DESC, vec_id) rn FROM x), "
        "mn AS (SELECT pos, vec_id, x, ROW_NUMBER() OVER "
        "(PARTITION BY pos ORDER BY x ASC, vec_id) rn FROM x) "
        "SELECT CAST(mx.pos AS BIGINT) pos, mx.vec_id argmax_id, "
        "mn.vec_id argmin_id, ROUND(mx.x, 6) mx, ROUND(mn.x, 6) mn "
        "FROM mx JOIN mn ON mx.pos = mn.pos "
        "WHERE mx.rn = 1 AND mn.rn = 1 ORDER BY pos"
    ),
    # z29: Spark reduces values that made a zarr-v2 disk round-trip;
    # DuckDB reads the parquet originals — equality proves the v2
    # write/read path is value-preserving, not just self-consistent.
    "z29_zarr_v2_roundtrip": (
        "WITH e AS (SELECT "
        "CAST(generate_subscripts(embedding,1)-1 AS INT) pos, "
        "CAST(unnest(embedding) AS DOUBLE) x "
        "FROM embeddings WHERE vec_id < 500) "
        "SELECT pos, COUNT(*) n, ROUND(MIN(x),6) mn, ROUND(MAX(x),6) mx "
        "FROM e GROUP BY pos ORDER BY pos"
    ),
    "z28_row_median": (
        "WITH e AS (SELECT vec_id, "
        "list_sort(list_transform(embedding, x -> CAST(x AS DOUBLE))) s "
        "FROM embeddings) "
        "SELECT vec_id, ROUND((s[32]+s[33])/2.0, 6) m "
        "FROM e ORDER BY vec_id LIMIT 100"
    ),
    "z27_scrna_recipe": (
        "WITH c AS (SELECT vec_id, "
        "list_transform(embedding, x -> abs(CAST(x AS DOUBLE))) c "
        "FROM embeddings), "
        "tt AS (SELECT vec_id, c, list_sum(c) tot FROM c), "
        "f AS (SELECT * FROM tt WHERE tot > 6.4), "
        "e AS (SELECT CAST(generate_subscripts(c,1)-1 AS INT) pos, "
        "unnest(c) x, tot FROM f) "
        "SELECT pos, ROUND(AVG(LN(1 + x/tot*100)),6) mu, "
        "ROUND(var_pop(LN(1 + x/tot*100)),6) s2 "
        "FROM e GROUP BY pos ORDER BY pos"
    ),
    "z26_clip_where": (
        "SELECT l_orderkey, l_linenumber, "
        "ROUND(LEAST(GREATEST(l_quantity, 10.0), 40.0), 2) clipped, "
        "CAST(ROUND(CASE WHEN l_discount > 0.05 "
        "THEN CAST(l_extendedprice AS DECIMAL(18,2)) "
        "* CAST(0.9 AS DECIMAL(2,1)) "
        "ELSE CAST(l_extendedprice AS DECIMAL(18,2)) END, 2) "
        "AS DOUBLE) wh "
        "FROM lineitem ORDER BY l_orderkey, l_linenumber, clipped, wh "
        "LIMIT 100"
    ),
    "z25_matvec": (
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v "
        "FROM embeddings), "
        "x AS (SELECT vec_id, unnest(v) x, generate_subscripts(v,1) p FROM e) "
        "SELECT vec_id, ROUND(SUM(x * (CASE WHEN (p-1)%2=0 THEN 1.0 "
        "ELSE -1.0 END) * ((p-1)%7 + 1)), 4) xw "
        "FROM x GROUP BY vec_id ORDER BY vec_id LIMIT 100"
    ),
    "z21_corr_covar": (
        "SELECT ROUND(corr(l_quantity,l_extendedprice),8) c, "
        "ROUND(covar_pop(l_quantity,l_extendedprice),4) cp, "
        "ROUND(covar_samp(l_quantity,l_extendedprice),4) cs FROM lineitem"
    ),
    "z22_skew_kurt": (
        "SELECT ROUND(skewness(l_quantity),4) sk, "
        "ROUND(kurtosis(l_quantity),4) ku FROM lineitem"
    ),
    "z23_regr": (
        "SELECT ROUND(regr_slope(l_extendedprice,l_quantity),6) sl, "
        "ROUND(regr_intercept(l_extendedprice,l_quantity),4) ic, "
        "CAST(regr_count(l_extendedprice,l_quantity) AS BIGINT) n FROM lineitem"
    ),
    "z20_median_percentile": (
        "SELECT ROUND(quantile_cont(l_quantity,0.5),6) m, "
        "ROUND(quantile_cont(l_extendedprice,0.25),6) q1, "
        "ROUND(quantile_cont(l_discount,0.9),6) p90 FROM lineitem"
    ),
    "z01_sum_axis0": (
        "SELECT ROUND(SUM(l_quantity),2) a, "
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) b "
        "FROM lineitem"
    ),
    "z02_mean_axis0": (
        "SELECT ROUND(AVG(l_quantity),6) a, "
        "ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)"
        "/COUNT(l_discount), 6) b FROM lineitem"
    ),
    "z03_log1p": (
        "SELECT l_orderkey, l_linenumber, ROUND(LN(1+l_quantity),6) v FROM lineitem "
        "ORDER BY l_orderkey, l_linenumber, v LIMIT 100"
    ),
    "z04_exp_expm1": (
        "SELECT l_orderkey, l_linenumber, ROUND(EXP(l_discount),6) e, "
        "ROUND(EXP(l_discount)-1,6) em FROM lineitem "
        "ORDER BY l_orderkey, l_linenumber, e, em LIMIT 100"
    ),
    "z05_row_sum_axis1": (
        "SELECT vec_id, ROUND(list_aggregate(embedding,'sum'),4) s FROM embeddings "
        "ORDER BY vec_id LIMIT 100"
    ),
    # Type-parity CASTs below (r1 driver hash fails, VERDICT §wrong-1):
    # Spark signum→DOUBLE vs DuckDB SIGN→TINYINT; Spark floor/ceil→LONG
    # vs DuckDB→DOUBLE; Spark SUM(int)→LONG vs DuckDB→HUGEINT(→float64
    # in pandas). Values are identical — only the materialized dtype
    # diverged. Enforced corpus-wide by tests/test_dtypes.py.
    "z06_unary_suite": (
        "SELECT l_orderkey, l_linenumber, ROUND(SQRT(l_quantity),6) sq, "
        "ROUND(l_discount*l_discount,6) p2, ABS(l_quantity-25) ab, -l_tax neg, "
        "CAST(SIGN(l_quantity-25.0) AS DOUBLE) sg, "
        "CAST(FLOOR(l_extendedprice/1000) AS BIGINT) fl, "
        "CAST(CEIL(l_tax*100) AS BIGINT) ce "
        "FROM lineitem ORDER BY l_orderkey, l_linenumber, sq, p2, ab, neg, sg, fl, ce "
        "LIMIT 100"
    ),
    "z07_scalar_broadcast": (
        "SELECT l_orderkey, l_linenumber, ROUND((l_quantity+1.5)*2-3/1.5,6) v "
        "FROM lineitem ORDER BY l_orderkey, l_linenumber, v LIMIT 100"
    ),
    "z09_comparisons": (
        "SELECT CAST(SUM(CASE WHEN l_quantity > l_discount*100 THEN 1 ELSE 0 END)"
        " AS BIGINT) c, "
        "CAST(SUM(CASE WHEN l_tax >= 0.04 THEN 1 ELSE 0 END) AS BIGINT) d "
        "FROM lineitem"
    ),
    "z10_bool_mask": (
        "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem "
        "WHERE l_quantity>45 AND l_discount<0.05 "
        "ORDER BY l_orderkey, l_linenumber, l_quantity LIMIT 100"
    ),
    "z11_column_select": (
        "SELECT l_orderkey, l_partkey, l_quantity FROM lineitem WHERE l_orderkey<100 "
        "ORDER BY l_orderkey, l_partkey, l_quantity LIMIT 100"
    ),
    "z12_var_std": (
        "SELECT ROUND(VAR_POP(l_discount),8) vp, ROUND(STDDEV_POP(l_discount),8) sp, "
        "ROUND(VAR_SAMP(l_discount),8) vs, ROUND(STDDEV_SAMP(l_discount),8) ss "
        "FROM lineitem"
    ),
    "z13_minmax_axis0": (
        "SELECT MIN(l_quantity) a, MAX(l_quantity) b, MIN(l_shipdate) c, "
        "MAX(l_shipdate) d, MIN(l_returnflag) e, MAX(l_returnflag) f FROM lineitem"
    ),
    "z14_minmax_axis1": (
        "SELECT vec_id, ROUND(list_aggregate(embedding,'min'),6) mn, "
        "ROUND(list_aggregate(embedding,'max'),6) mx "
        "FROM embeddings ORDER BY vec_id LIMIT 100"
    ),
    "z15_astype_cast": (
        "SELECT CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) a, "
        "CAST(SUM(CAST(l_discount*100 AS BIGINT)) AS BIGINT) b FROM lineitem"
    ),
    "z16_count_nonzero": (
        "SELECT CAST(SUM(CASE WHEN l_discount<>0 THEN 1 ELSE 0 END) AS BIGINT) nz "
        "FROM lineitem"
    ),
    "z17_row_normalize": (
        "SELECT vec_id, "
        "ROUND(list_extract(embedding,1)/list_aggregate(embedding,'sum'),6) e1, "
        "ROUND(list_extract(embedding,2)/list_aggregate(embedding,'sum'),6) e2 "
        "FROM embeddings ORDER BY vec_id LIMIT 100"
    ),
    "z18_any_all": (
        "SELECT l_returnflag, BOOL_AND(l_quantity>0) ba, BOOL_OR(l_discount>0.09) bo "
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    "z19_mean_axis1": (
        "SELECT vec_id, ROUND(list_aggregate(embedding,'sum')/len(embedding),6) m "
        "FROM embeddings ORDER BY vec_id LIMIT 100"
    ),
    "z24_var_axis1": (
        "WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings), "
        "m AS (SELECT vec_id, e, list_aggregate(e,'sum')/len(e) mu FROM b) "
        "SELECT vec_id, "
        "ROUND(list_aggregate(list_transform(e, x -> (x-mu)*(x-mu)),'sum')"
        "/len(e),6) vp, "
        "ROUND(sqrt(list_aggregate(list_transform(e, x -> (x-mu)*(x-mu)),'sum')"
        "/(len(e)-1)),6) ss "
        "FROM m ORDER BY vec_id LIMIT 100"
    ),
}
