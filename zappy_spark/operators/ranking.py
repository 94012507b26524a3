"""Scale-safe global ranking: two-pass range-bucketed window functions.

``Window.orderBy(...)`` with no ``partitionBy`` compiles to a
single-partition sort — correct, but the one plan shape that cannot
survive a 100 TB input (VERDICT r1: r26/r27/r34). This module computes
the same rank/dense_rank/percent_rank/cume_dist/ntile semantics with
no single-partition stage:

1. **Boundaries** (pass A): ``approxQuantile`` on the sort column
   picks ~balanced bucket edges. Accuracy only affects *balance*,
   never correctness — assignment is by value, so tied values always
   land in the same bucket.
2. **Bucket stats** (pass B): per-bucket row/distinct counts — a
   partial-aggregated scan whose shuffle is bucket-count-sized; the
   cumulative offsets are computed on the driver (bucket-count rows,
   i.e. metadata-sized, like a parquet footer read).
3. **Local ranks** (pass C): one balanced hash shuffle on the bucket
   id, a per-bucket sort, then ``global = bucket_offset + local``
   via a broadcast join of the offsets.

Wall-clock at scale is two column-pruned scans plus one full shuffle —
versus the unbounded single-machine sort of the naive form. The
declared oracle queries (r26/r27/r34) keep the naive spelling as the
semantic contract; r40 is this operator run against the same oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_B = "_zs_bucket"


def _bucket_of(key: Column, edges: list[float]) -> Column:
    """Index of ``key`` in ascending ``edges`` (count of edges <= key):
    a JVM-side O(|edges|) scan — edges is bucket-count-sized."""
    arr = F.array(*[F.lit(float(e)) for e in edges])
    return F.size(F.filter(arr, lambda e: e <= key))


def with_global_ranks(
    df: DataFrame,
    value_col: str,
    *,
    ascending: bool = True,
    tiebreak: Sequence[str] = (),
    buckets: int = 64,
    rank_col: str | None = None,
    dense_rank_col: str | None = None,
    row_number_col: str | None = None,
    percent_rank_col: str | None = None,
    cume_dist_col: str | None = None,
    ntile: tuple[int, str] | None = None,
) -> DataFrame:
    """Append global window-rank columns ordered by
    (``value_col`` asc|desc, *tiebreak asc) without a global sort.

    ``value_col`` must be numeric and non-null (the corpus use case;
    rank NULL handling varies across engines anyway). ``ntile`` is
    ``(n, out_col)``. Ties follow the full ordering tuple, exactly as
    ``Window.orderBy(value, *tiebreak)`` would.
    """
    # key-space flip makes one ascending implementation serve desc
    key = F.col(value_col) if ascending else -F.col(value_col)

    # pass A: ~equi-depth edges (relative error only skews balance)
    qs = [i / buckets for i in range(1, buckets)]
    raw = df.stat.approxQuantile(value_col, qs, 0.001)
    edges = sorted({float(v) if ascending else -float(v) for v in raw})

    tup = [key] + [F.col(c) for c in tiebreak]
    bucketed = df.withColumn(_B, _bucket_of(key, edges))

    # pass B: bucket stats -> driver-side cumulative offsets
    stats = (
        bucketed.groupBy(_B)
        .agg(
            F.count("*").alias("n"),
            F.count_distinct(F.struct(*tup)).alias("d"),
        )
        .collect()
    )
    stats.sort(key=lambda r: r[_B])
    total = sum(r["n"] for r in stats)
    offsets, off_n, off_d = [], 0, 0
    for r in stats:
        offsets.append((r[_B], off_n, off_d, r["n"]))
        off_n += r["n"]
        off_d += r["d"]
    spark = df.sparkSession
    off_df = F.broadcast(
        spark.createDataFrame(
            offsets, f"{_B} int, _off_n bigint, _off_d bigint, _bn bigint"
        )
    )

    # pass C: per-bucket windows (balanced hash shuffle on the bucket
    # id) + broadcast offset join
    order = [key.asc()] + [F.col(c).asc() for c in tiebreak]
    w = Window.partitionBy(_B).orderBy(*order)
    w_rev = Window.partitionBy(_B).orderBy(
        *([key.desc()] + [F.col(c).desc() for c in tiebreak])
    )
    local = bucketed.join(off_df, _B)
    grank = (F.col("_off_n") + F.rank().over(w)).cast("bigint")
    grn = (F.col("_off_n") + F.row_number().over(w)).cast("bigint")

    out = local
    if rank_col:
        out = out.withColumn(rank_col, grank)
    if dense_rank_col:
        out = out.withColumn(
            dense_rank_col,
            (F.col("_off_d") + F.dense_rank().over(w)).cast("bigint"),
        )
    if row_number_col:
        out = out.withColumn(row_number_col, grn)
    if percent_rank_col:
        denom = max(total - 1, 1)
        out = out.withColumn(percent_rank_col, (grank - 1) / F.lit(denom))
    if cume_dist_col:
        # rows <= current incl. later peers = bucket_n - rank_desc + 1
        rows_le = F.col("_bn") - F.rank().over(w_rev) + 1
        out = out.withColumn(
            cume_dist_col, (F.col("_off_n") + rows_le) / F.lit(total)
        )
    if ntile is not None:
        k, col_name = ntile
        q, rem = divmod(total, k)
        out = out.withColumn("_zs_grn", grn)
        if q == 0:
            tile = F.col("_zs_grn")
        else:
            # integer div, not float division: exact past 2^53
            big = rem * (q + 1)
            tile = F.when(
                F.col("_zs_grn") <= big,
                F.expr(f"(_zs_grn - 1) div {q + 1}") + 1,
            ).otherwise(
                F.expr(f"(_zs_grn - {big} - 1) div {q}") + rem + 1
            )
        out = out.withColumn(col_name, tile.cast("bigint")).drop("_zs_grn")
    return out.drop(_B, "_off_n", "_off_d", "_bn")
