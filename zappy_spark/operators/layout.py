"""Z-order (Morton) clustering for multi-dimensional data skipping.

Parquet skipping is driven by per-file / per-row-group min-max stats,
which only help on the sort column. Z-ordering interleaves the bits
of several columns into one clustering key, so a range-partitioned +
sorted write produces files whose min-max boxes are tight on EVERY
participating dimension — filters on any of them prune files.

At 100 TB this is a write-amplification-vs-read tradeoff: one
repartitionByRange shuffle at layout time buys file-level pruning on
all clustered columns forever after. The z-value itself is a pure
integer expression (shifts + masks), generated as SQL text that both
Spark and DuckDB parse identically — which is how the corpus entry
(r42) oracle replays it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 8


def zvalue_sql(cols: list[str], bits: int | list[int] = DEFAULT_BITS) -> str:
    """Morton-interleave SQL for ``cols``.

    ``bits`` is the significant bit width per column (one int applies
    to all). Widths SHOULD match each column's actual cardinality:
    interleaving phantom high bits of a narrow column misaligns the
    range-partition cut points and widens per-file boxes on that
    dimension (measured in tests). Columns exhaust round-robin; wider
    columns keep their high bits at the top.

    Plain shifts/masks/adds — valid and identical in Spark SQL and
    DuckDB, so oracles can embed the same text. Inputs must already
    be non-negative integers in [0, 2^bits)."""
    widths = [bits] * len(cols) if isinstance(bits, int) else list(bits)
    if len(widths) != len(cols):
        raise ValueError(f"got {len(widths)} widths for {len(cols)} cols")
    terms, pos = [], 0
    for i in range(max(widths)):
        for c, w in zip(cols, widths):
            if i < w:
                terms.append(f"((({c} >> {i}) & 1) << {pos})")
                pos += 1
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def with_zvalue(
    df: DataFrame,
    cols: list[str],
    bits: int | list[int] = DEFAULT_BITS,
    out_col: str = "zv",
) -> DataFrame:
    return df.withColumn(out_col, F.expr(zvalue_sql(cols, bits)))


def dataset_bytes(spark, path: str) -> int:
    """On-disk size of a dataset via the Hadoop FileSystem API — works
    for any supported scheme (local, HDFS, object stores), not just
    local paths."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.getContentSummary(p).getLength()


def compact_files(
    spark,
    src: str,
    dst: str,
    target_bytes: int = 128 << 20,
    sort_cols: list[str] | None = None,
) -> int:
    """Rewrite a parquet dataset into ~``target_bytes`` files — the
    small-files repair every long-running ingest needs (a 100 TB table
    accreted from streaming micro-batches ends up as millions of tiny
    files whose open/footer cost dominates scans).

    File count is sized from the dataset's actual on-disk bytes.
    With ``sort_cols`` the rewrite re-establishes clustering
    (range-partition + sort, preserving skip-friendly min-max stats);
    without, a plain repartition balances bytes. Writes to ``dst``
    (never in place — readers of ``src`` stay consistent; swap paths
    atomically at the catalog/manifest layer). Returns the file count.
    """
    import math

    n = max(1, math.ceil(dataset_bytes(spark, src) / target_bytes))
    df = spark.read.parquet(src)
    if sort_cols:
        out = df.repartitionByRange(n, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        out = df.repartition(n)
    out.write.mode("overwrite").parquet(dst)
    return n


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int | list[int] = DEFAULT_BITS,
    num_files: int = 32,
) -> None:
    """Cluster ``df`` by the z-value of ``cols`` and write parquet.

    repartitionByRange gives contiguous z-ranges per file (AQE may
    coalesce small ones); sortWithinPartitions tightens row-group
    stats inside each file. The z column itself is dropped — it is
    layout, not data."""
    zdf = with_zvalue(df, cols, bits, "_zv")
    (
        zdf.repartitionByRange(num_files, "_zv")
        .sortWithinPartitions("_zv")
        .drop("_zv")
        .write.mode("overwrite")
        .parquet(path)
    )


def analyze_table(
    spark, table: str, columns: list[str] | None = None
) -> None:
    """Collect catalog statistics for CBO (SURVEY §4 M6): table-level
    row count/size, plus per-column NDV/min/max/null-counts when
    ``columns`` is given. With ``spark.sql.cbo.enabled`` (and
    ``cbo.joinReorder.enabled``) the optimizer uses these to reorder
    multi-way joins and to size joins it cannot infer from files —
    at 100 TB, stats collection after each major write is what keeps
    12-way joins from picking a quadratic order. AQE still refines
    at runtime; CBO fixes the initial shape."""
    spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(columns)
        spark.sql(
            f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS {cols}"
        )


def rendezvous_shard(
    df: DataFrame, id_col: str, n_shards: int, out_col: str = "shard"
) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment: each row
    goes to argmax over shards of md5(id + "/" + shard) — the stable
    data-placement primitive. Growing N→N+1 shards moves EXACTLY the
    rows whose new hash wins (expected 1/(N+1) of them, all onto the
    NEW shard); modulo hashing would reshuffle (N-1)/N of the corpus.
    That stability is what makes incremental re-sharding, cache
    affinity, and partitioned-index growth cheap at 100 TB.

    Pure scan-side projection — the argmax is an array_max over n
    (hash, shard) structs built per row, zero shuffles, and md5 over
    strings makes the assignment engine-portable and replayable in
    SQL (struct ordering breaks the ~2^-128 hash ties identically).
    For thousands of shards switch to a two-level scheme (rendezvous
    over shard groups, then within); the per-row cost here is
    O(n_shards) hash calls."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    entries = [
        F.struct(
            F.md5(
                F.concat(
                    F.col(id_col).cast("string"),
                    F.lit("/"),
                    F.lit(str(s)),
                )
            ).alias("h"),
            F.lit(s).cast("bigint").alias("s"),
        )
        for s in range(n_shards)
    ]
    return df.withColumn(
        out_col, F.array_max(F.array(*entries))["s"]
    )


# ---------------------------------------------------------------
# Hilbert-curve clustering (round 12, r94) — the locality curve
# modern lakehouse clustering uses in place of Z-order: consecutive
# curve positions are ALWAYS Manhattan-adjacent cells (Z-order
# jumps across the grid at power-of-two seams), so range-
# partitioned files get strictly tighter per-dimension min-max
# boxes at the same write cost.
# ---------------------------------------------------------------


def hilbert_level_exprs(bits: int) -> list[tuple[str, str, str]]:
    """Per-level SQL expression triples (hd, hx, hy) of the
    standard iterative xy→d Hilbert transform over a 2^bits grid
    (high bit first): each level reads the PREVIOUS level's
    hd/hx/hy columns and emits the next. Plain CASE/AND/arithmetic
    — Spark SQL and DuckDB parse the identical text, so the layout
    kernel itself is oracle-checkable (the r42 doctrine). The
    (3*rx) XOR ry quadrant addend is spelled as an explicit CASE on
    (rx, ry) because DuckDB's ``^`` is POWER, not XOR — the one
    operator the two dialects disagree on."""
    if bits < 1 or bits > 31:
        raise ValueError(f"bits must be in 1..31, got {bits}")
    n1 = (1 << bits) - 1
    out = []
    for i in reversed(range(bits)):
        s = 1 << i
        rx0 = f"(hx & {s}) = 0"
        ry0 = f"(hy & {s}) = 0"
        dadd = (
            f"CASE WHEN {rx0} AND {ry0} THEN 0 WHEN {rx0} THEN 1 "
            f"WHEN NOT {ry0} THEN 2 ELSE 3 END"
        )
        out.append(
            (
                f"CAST(hd + {s * s} * ({dadd}) AS BIGINT)",
                f"CAST(CASE WHEN {ry0} THEN (CASE WHEN NOT {rx0} "
                f"THEN {n1} - hy ELSE hy END) ELSE hx END AS BIGINT)",
                f"CAST(CASE WHEN {ry0} THEN (CASE WHEN NOT {rx0} "
                f"THEN {n1} - hx ELSE hx END) ELSE hy END AS BIGINT)",
            )
        )
    return out


def with_hilbert(
    df: DataFrame,
    xcol: str,
    ycol: str,
    bits: int = DEFAULT_BITS,
    out_col: str = "hv",
) -> DataFrame:
    """Add the Hilbert curve position of (xcol, ycol) on a 2^bits ×
    2^bits grid. Inputs must be non-negative integers below
    2^bits. The per-level columns are computed SIMULTANEOUSLY
    (withColumns — each level is one projection reading the
    previous level's values), so lineage is linear in ``bits`` and
    Catalyst collapses the chain into one whole-stage projection.

    Scale: a pure scan-side integer expression — clustering by it
    costs exactly one repartitionByRange, same as Z-order, but
    consecutive positions are always Manhattan-adjacent so the
    per-file min-max boxes it buys are tighter on both dimensions."""
    cur = df.withColumns(
        {
            "hd": F.lit(0).cast("bigint"),
            "hx": F.col(xcol).cast("bigint"),
            "hy": F.col(ycol).cast("bigint"),
        }
    )
    for hd, hx, hy in hilbert_level_exprs(bits):
        cur = cur.withColumns(
            {"hd": F.expr(hd), "hx": F.expr(hx), "hy": F.expr(hy)}
        )
    return cur.withColumn(out_col, F.col("hd")).drop("hd", "hx", "hy")


def hilbert_write(
    df: DataFrame,
    path: str,
    xcol: str,
    ycol: str,
    bits: int = DEFAULT_BITS,
    num_files: int = 32,
) -> None:
    """Cluster ``df`` by the Hilbert position of (xcol, ycol) and
    write parquet — zorder_write's shape with the better curve."""
    out = with_hilbert(df, xcol, ycol, bits=bits, out_col="_hv")
    (
        out.repartitionByRange(num_files, "_hv")
        .sortWithinPartitions("_hv")
        .drop("_hv")
        .write.mode("overwrite")
        .parquet(path)
    )
