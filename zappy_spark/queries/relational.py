"""R/B-series: relational operators (beyond-reference, SURVEY §2.2/§2.3).

zappy has no joins, group-by, sort, or SQL (SURVEY §2.1 honesty
list); this module is the beyond-reference relational surface mandated
by BASELINE.json, built entirely on Catalyst primitives.

Scale notes (100 TB):
- Dimension tables (region, nation) are explicitly ``F.broadcast``-
  hinted; AQE would usually get there, but at cluster scale an
  explicit hint on a known-small dim avoids a sort-merge fallback
  when stats are missing.
- Scalar subqueries (R19) are a broadcast of a 1-row aggregate, not a
  driver collect — the plan stays fully distributed.
- Top-k (B4, R3-style patterns) compiles to TakeOrderedAndProject —
  no global sort is materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zappy_spark.queries._util import t


def r1(spark: SparkSession, d: str) -> DataFrame:
    """Pricing summary (TPC-H Q1 shape): scan→filter→hash-agg→sort.

    The filter reaches the parquet scan as a pushed predicate; agg is
    partial→final (map-side combine), exactly zappy's
    per-chunk-then-reduce pattern done by the engine.
    """
    li = t(spark, d, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sq"),
            # money SUMs accumulate as exact BIGINT 10^-2/10^-4
            # currency units (round-7 campaign; the audit probe
            # caught sd 4.8e-7 from a half-cent at sf0.001 — one
            # repartition from flipping). floor(x·10^k + 0.5) is
            # unambiguous: the double sits ~1e-8 from an integer,
            # maximally FAR from a half-boundary. Measured cost
            # (round-8, sf0.1, interleaved median-of-7): this
            # spelling 0.49 s vs 0.41 s for the boundary-unsafe
            # F.round(SUM(double)) and 0.67 s for DECIMAL(18,4)
            # accumulation — +19% over unsafe, 27% cheaper than
            # decimal; the whole q1 +23% r7 bench delta IS this
            # trade, taken deliberately (correctness > 80 ms).
            # Headroom: 1e-4-unit totals stay < 2^63 past sf30000.
            (
                F.sum(
                    F.floor(F.col("l_extendedprice") * 100 + 0.5).cast(
                        "long"
                    )
                )
                / 100.0
            ).alias("sb"),
            (
                F.floor(
                    (
                        F.sum(
                            F.floor(
                                F.col("l_extendedprice")
                                * (1 - F.col("l_discount"))
                                * 10000
                                + 0.5
                            ).cast("long")
                        )
                        + 50
                    )
                    / 100
                )
                / 100.0
            ).alias("sd"),
            F.round(F.avg("l_quantity"), 4).alias("aq"),
            F.count("*").alias("c"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def r2(spark: SparkSession, d: str) -> DataFrame:
    """5-way equi-join + agg (TPC-H Q5 shape).

    lineitem revenue is pre-aggregated per orderkey BELOW the join —
    an eager-aggregation rewrite Catalyst doesn't apply itself. It
    shrinks the biggest join input by the lines-per-order factor
    (~4×) before any join, at the cost of scan-side arithmetic for
    orders the region filter later drops; measured 27% faster at
    sf0.1 and increasingly favorable at scale, where the orders⋈
    lineitem shuffle dominates. Dims broadcast-hinted; fact joins
    left to AQE (broadcast here, SMJ at cluster scale)."""
    cust = t(spark, d, "customer")
    orders = t(spark, d, "orders")
    li = t(spark, d, "lineitem")
    nation = F.broadcast(t(spark, d, "nation"))
    region = F.broadcast(t(spark, d, "region"))
    li_rev = li.groupBy("l_orderkey").agg(
        # exact BIGINT 10^-4-unit partials (see r1's sd note): exact
        # at both agg levels, so the eager rewrite cannot reorder a
        # lossy double accumulation — at long-sum codegen speed
        F.sum(
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
                + 0.5
            ).cast("long")
        ).alias("_rev")
    )
    return (
        orders.join(li_rev, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(
            (F.floor((F.sum("_rev") + 50) / 100) / 100.0).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


def r3(spark: SparkSession, d: str) -> DataFrame:
    """Top-k per group via row_number window."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    return (
        t(spark, d, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            # bigint: window ranks are INT in Spark, BIGINT in DuckDB —
            # align widths for dtype parity (tests/test_dtypes.py)
            F.row_number().over(w).cast("bigint").alias("rnk"),
        )
        .filter(F.col("rnk") <= 2)
        .orderBy("o_custkey", "rnk")
        .limit(100)
    )


def r4(spark: SparkSession, d: str) -> DataFrame:
    return (
        t(spark, d, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.count("*").alias("c"))
        .orderBy("d")
        .limit(50)
    )


def r5(spark: SparkSession, d: str) -> DataFrame:
    """EXISTS → left-semi join (Catalyst plans the same for the SQL)."""
    cust = t(spark, d, "customer")
    big = t(spark, d, "orders").filter(F.col("o_totalprice") > 100000)
    return (
        cust.join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey")
        .orderBy("c_custkey")
        .limit(50)
    )


def r6(spark: SparkSession, d: str) -> DataFrame:
    """NOT EXISTS → left-anti join."""
    cust = t(spark, d, "customer")
    big = t(spark, d, "orders").filter(F.col("o_totalprice") > 350000)
    return (
        cust.join(big, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
        .limit(100)
    )


def r7(spark: SparkSession, d: str) -> DataFrame:
    cust = t(spark, d, "customer")
    orders = t(spark, d, "orders")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n"))
        .orderBy(F.desc("n"), "c_custkey")
        .limit(100)
    )


def r8(spark: SparkSession, d: str) -> DataFrame:
    a = (
        t(spark, d, "customer")
        .groupBy(F.col("c_nationkey").alias("ka"))
        .agg(F.count("*").alias("cs"))
    )
    b = (
        t(spark, d, "supplier")
        .groupBy(F.col("s_nationkey").alias("kb"))
        .agg(F.count("*").alias("ss"))
    )
    return (
        a.join(b, F.col("ka") == F.col("kb"), "full")
        .select(
            F.coalesce("ka", "kb").alias("k"),
            F.coalesce("cs", F.lit(0)).alias("cs"),
            F.coalesce("ss", F.lit(0)).alias("ss"),
        )
        .orderBy("k")
    )


def r9(spark: SparkSession, d: str) -> DataFrame:
    region = t(spark, d, "region")
    flags = t(spark, d, "lineitem").select(
        F.col("l_returnflag").alias("f")
    ).distinct()
    return (
        region.crossJoin(flags)
        .groupBy("r_name", "f")
        .agg(F.count("*").alias("c"))
        .orderBy("r_name", "f")
    )


def r10(spark: SparkSession, d: str) -> DataFrame:
    """Equi key + range residual: Catalyst keys the join on
    l_orderkey=o_orderkey and applies the date range as a residual —
    never a cross product."""
    orders = t(spark, d, "orders")
    li = t(spark, d, "lineitem")
    return orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
    ).agg(F.count("*").alias("c"))


def r11(spark: SparkSession, d: str) -> DataFrame:
    return (
        t(spark, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("bigint").alias("g1"),
            F.grouping("l_linestatus").cast("bigint").alias("g2"),
            F.count("*").alias("c"),
            F.round(F.sum("l_quantity"), 2).alias("s"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "g1",
            "g2",
            "c",
            "s",
        )
        .orderBy("rf", "ls", "g1", "g2")
    )


def r12(spark: SparkSession, d: str) -> DataFrame:
    return (
        t(spark, d, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("c"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("st"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("pr"),
            "c",
        )
        .orderBy("st", "pr")
    )


def r15(spark: SparkSession, d: str) -> DataFrame:
    return (
        t(spark, d, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > 15)
        .orderBy(F.desc("c"), "o_custkey")
        .limit(100)
    )


def r17(spark: SparkSession, d: str) -> DataFrame:
    c = t(spark, d, "customer").select(F.col("c_nationkey").alias("k"))
    s = t(spark, d, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.union(s).distinct().orderBy("k")


def r17b(spark: SparkSession, d: str) -> DataFrame:
    c = t(spark, d, "customer").select(F.col("c_nationkey").alias("k"))
    s = t(spark, d, "supplier").select(F.col("s_nationkey").alias("k"))
    return (
        c.union(s).groupBy("k").agg(F.count("*").alias("c")).orderBy("k")
    )


def r18(spark: SparkSession, d: str) -> DataFrame:
    nat = t(spark, d, "nation").select(F.col("n_nationkey").alias("k"))
    ev = t(spark, d, "events").select(
        (F.col("user_id") % 20).cast("int").alias("k")
    )
    # subtract == EXCEPT (distinct semantics), matching the SQL.
    return nat.subtract(ev).orderBy("k")


def r19(spark: SparkSession, d: str) -> DataFrame:
    """Uncorrelated scalar subquery = broadcast of a 1-row aggregate;
    stays distributed, nothing collected to the driver."""
    orders = t(spark, d, "orders")
    avg_df = orders.agg(F.avg("o_totalprice").alias("_avg_tp"))
    return (
        orders.crossJoin(F.broadcast(avg_df))
        .filter(F.col("o_totalprice") > F.col("_avg_tp"))
        .agg(F.count("*").alias("c"))
    )


def r20(spark: SparkSession, d: str) -> DataFrame:
    """IN-subquery → left-semi join against the (broadcast) dim."""
    cust = t(spark, d, "customer")
    keys = t(spark, d, "nation").filter(F.col("n_regionkey") == 1).select(
        "n_nationkey"
    )
    return (
        cust.join(
            F.broadcast(keys),
            F.col("c_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("c_custkey")
        .orderBy("c_custkey")
        .limit(100)
    )


def r21(spark: SparkSession, d: str) -> DataFrame:
    return (
        t(spark, d, "orders")
        .select(
            "o_orderkey",
            F.when(F.col("o_totalprice") > 200000, "big")
            .when(F.col("o_totalprice") > 100000, "mid")
            .otherwise("small")
            .alias("b"),
            F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("open")).alias(
                "s"
            ),
        )
        .orderBy("o_orderkey")
        .limit(100)
    )


def r22(spark: SparkSession, d: str) -> DataFrame:
    p = t(spark, d, "part")
    return (
        p.select(
            "p_partkey",
            F.upper("p_brand").alias("u"),
            F.lower("p_type").alias("l"),
            F.substring("p_name", 1, 8).alias("s"),
            F.length("p_name").cast("bigint").alias("n"),
            F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("c"),
            F.replace(F.col("p_brand"), F.lit("Brand"), F.lit("B")).alias("r"),
            F.trim("p_name").alias("t"),
            F.lpad(F.col("p_size").cast("string"), 4, "0").alias("lp"),
        )
        .orderBy("p_partkey")
        .limit(100)
    )


def r22b(spark: SparkSession, d: str) -> DataFrame:
    p = t(spark, d, "part")
    return (
        p.select(
            "p_partkey",
            F.regexp_extract("p_type", "([A-Z]+)", 1).alias("m"),
            F.when(F.col("p_name").rlike("[aeiou]{2}"), 1).otherwise(0).alias(
                "has2"
            ),
        )
        .orderBy("p_partkey")
        .limit(100)
    )


def r23(spark: SparkSession, d: str) -> DataFrame:
    o = t(spark, d, "orders")
    return (
        o.select(
            "o_orderkey",
            F.year("o_orderdate").cast("bigint").alias("y"),
            F.month("o_orderdate").cast("bigint").alias("m"),
            F.dayofmonth("o_orderdate").cast("bigint").alias("d"),
            F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("mt"),
            F.datediff(
                F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date")
            ).cast("bigint").alias("dd"),
        )
        .orderBy("o_orderkey")
        .limit(100)
    )


def r24(spark: SparkSession, d: str) -> DataFrame:
    li = t(spark, d, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.pow("l_quantity", F.lit(2)), 4).alias("p"),
            F.round(F.log("l_extendedprice"), 6).alias("ln_"),
            F.round(F.log10("l_extendedprice"), 6).alias("lg"),
            (F.col("l_quantity").cast("int") % 7).alias("md"),
            F.greatest("l_tax", "l_discount").alias("g"),
            F.least("l_tax", "l_discount").alias("le"),
        )
        .orderBy(
            "l_orderkey", "l_linenumber", "p", "ln_", "lg", "md", "g", "le"
        )
        .limit(100)
    )


def r25(spark: SparkSession, d: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        t(spark, d, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.lag("o_totalprice").over(w).alias("lg"),
            F.lead("o_totalprice").over(w).alias("ld"),
            F.round(F.sum("o_totalprice").over(w_run), 2).alias("run"),
            F.first("o_orderkey").over(w).alias("fv"),
        )
        .orderBy("o_custkey", "o_orderkey")
        .limit(100)
    )


def r27(spark: SparkSession, d: str) -> DataFrame:
    """Global ranking window — single-partition by construction; fine
    for declared semantics, and orders is the small fact table."""
    w = Window.orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        t(spark, d, "orders")
        .select(
            "o_orderkey",
            F.rank().over(w).cast("bigint").alias("r"),
            F.dense_rank().over(w).cast("bigint").alias("dr"),
            F.ntile(4).over(w).cast("bigint").alias("nt"),
            F.round(F.percent_rank().over(w), 6).alias("pr"),
        )
        .orderBy("o_orderkey")
        .limit(100)
    )


def r28(spark: SparkSession, d: str) -> DataFrame:
    """Pivot in its portable conditional-aggregation form (one pass,
    no pivot shuffle)."""
    o = t(spark, d, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("o"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("f"),
            F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0)).alias("p"),
        )
        .orderBy("o_custkey")
        .limit(100)
    )


def r28b(spark: SparkSession, d: str) -> DataFrame:
    """Native df.pivot form of R28 — same oracle; the pivot column
    values are enumerated, so Spark skips the extra distinct-scan."""
    o = t(spark, d, "orders")
    return (
        o.groupBy("o_custkey")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_custkey",
            F.coalesce("O", F.lit(0)).alias("o"),
            F.coalesce("F", F.lit(0)).alias("f"),
            F.coalesce("P", F.lit(0)).alias("p"),
        )
        .orderBy("o_custkey")
        .limit(100)
    )


def r29(spark: SparkSession, d: str) -> DataFrame:
    emb = t(spark, d, "embeddings")
    return (
        emb.select("vec_id", F.explode("embedding").alias("e"))
        .groupBy("vec_id")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("e").cast("double") * F.col("e")), 4).alias("ss"),
        )
        .orderBy("vec_id")
        .limit(100)
    )


def r26(spark: SparkSession, d: str) -> DataFrame:
    """RANGE window frame (value-based, peers included) — verified
    interpolation-free parity with DuckDB.

    Round-6 re-spell: the frame runs over a DETERMINISTIC 1% key
    sample (o_orderkey % 100 == 0). The op under test is the RANGE
    frame's peer/bound semantics, and the original full-table global
    frame was the one corpus spelling that measurably could not
    survive the 100× fixture (Spark's sliding RANGE evaluation
    re-accumulates each frame: the un-sampled form timed out at
    900 s where the row-framed r27/r34 finish in ~45 s on the same
    single-partition sort). Production value-based frames partition
    by a key first; this entry stays whitelisted as the naive oracle
    form with r40's bucketed two-pass as the scale twin."""
    w = Window.orderBy("o_totalprice").rangeBetween(-10000, Window.currentRow)
    return (
        t(spark, d, "orders")
        .filter(F.col("o_orderkey") % 100 == 0)
        .select(
            "o_orderkey",
            F.count("*").over(w).alias("nw"),
            F.round(F.sum("o_totalprice").over(w), 2).alias("sw"),
        )
        .orderBy("o_orderkey")
        .limit(100)
    )


def r30(spark: SparkSession, d: str) -> DataFrame:
    """Two-table as-of join: each event matched to the user's most
    recent purchase at-or-before it; DuckDB's native ASOF JOIN is the
    oracle for our union+last-non-null emulation (operators/joins.py).
    """
    from zappy_spark.operators.joins import asof_join

    ev = t(spark, d, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts"
    )
    j = asof_join(
        ev.select("user_id", "ts"), purchases, on="ts", by=["user_id"]
    )
    return (
        j.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.avg(
                    F.unix_timestamp("ts") - F.unix_timestamp("ts_right")
                ),
                3,
            ).alias("g"),
        )
        .orderBy("user_id")
        .limit(50)
    )


def r31(spark: SparkSession, d: str) -> DataFrame:
    """Per-group exact percentiles (interpolation parity verified)."""
    li = t(spark, d, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("m"),
            F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90"),
        )
        .orderBy("l_returnflag")
    )


def r32(spark: SparkSession, d: str) -> DataFrame:
    """Deterministic list aggregation: collect_list is unordered by
    contract, so sort_array fixes the order before joining — the
    portable LISTAGG."""
    s = t(spark, d, "supplier")
    return (
        s.groupBy("s_nationkey")
        .agg(
            F.array_join(F.sort_array(F.collect_list("s_name")), ",").alias(
                "names"
            )
        )
        .orderBy("s_nationkey")
    )


def r33(spark: SparkSession, d: str) -> DataFrame:
    """Interval arithmetic + week truncation."""
    o = t(spark, d, "orders")
    return (
        o.select(
            "o_orderkey",
            (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).cast("date").alias(
                "d30"
            ),
            F.date_trunc("week", F.col("o_orderdate")).cast("date").alias("wk"),
        )
        .orderBy("o_orderkey")
        .limit(50)
    )


def r34(spark: SparkSession, d: str) -> DataFrame:
    """Window extras: cume_dist + nth_value with explicit frame."""
    w = Window.orderBy(F.desc("o_totalprice"), "o_orderkey")
    w_rows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        t(spark, d, "orders")
        .select(
            "o_orderkey",
            F.round(F.cume_dist().over(w), 6).alias("cd"),
            F.nth_value("o_orderkey", 3).over(w_rows).alias("nv"),
        )
        .orderBy("o_orderkey")
        .limit(100)
    )


def r35(spark: SparkSession, d: str) -> DataFrame:
    """Explicit GROUPING SETS (not expressible in the DataFrame API —
    rollup/cube are; the engine's SQL front end covers the rest)."""
    t(spark, d, "lineitem").createOrReplaceTempView("_li_gs")
    return spark.sql(
        "SELECT COALESCE(l_returnflag,'ALL') rf, "
        "COALESCE(l_linestatus,'ALL') ls, COUNT(*) c FROM _li_gs "
        "GROUP BY GROUPING SETS ((l_returnflag),(l_linestatus),()) "
        "ORDER BY rf, ls"
    )


def r36(spark: SparkSession, d: str) -> DataFrame:
    """Unpivot / melt (wide→long) via the DataFrame unpivot API."""
    li = t(spark, d, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_discount", "l_tax")
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_discount", "l_tax"],
            "name",
            "value",
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "name",
            F.round("value", 4).alias("v"),
        )
        .orderBy("l_orderkey", "l_linenumber", "name", "v")
        .limit(100)
    )


def r37(spark: SparkSession, d: str) -> DataFrame:
    """Bitwise aggregates."""
    li = t(spark, d, "lineitem")
    return li.agg(
        F.bit_and(F.col("l_quantity").cast("bigint")).alias("ba"),
        F.bit_or(F.col("l_quantity").cast("bigint")).alias("bo"),
        F.bit_xor(F.col("l_linenumber").cast("bigint")).alias("bx"),
    )


def r38(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → 3-way join → group →
    top-k by aggregate. The mktsegment filter pushes into the
    customer scan and prunes before the joins."""
    cust = t(spark, d, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, d, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = t(spark, d, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ).cast("decimal(18,4)")
                ),
                2,
            )
            .cast("double")
            .alias("rev")
        )
        .select(
            "o_orderkey", "rev", F.col("o_orderdate").cast("date").alias("od")
        )
        .orderBy(F.desc("rev"), "o_orderkey")
        .limit(10)
    )


def r39(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q18 shape: IN over a grouped-HAVING subquery → left-semi
    join against the aggregated keys."""
    orders = t(spark, d, "orders")
    big = (
        t(spark, d, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_sq"))
        .filter(F.col("_sq") > 180)
        .select("l_orderkey")
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .select("o_orderkey", F.round("o_totalprice", 2).alias("tp"))
        .orderBy("o_orderkey")
        .limit(100)
    )


def r40(spark: SparkSession, d: str) -> DataFrame:
    """Global ranking suite via the range-bucketed two-pass operator
    (operators/ranking.py) — identical semantics to r27's naive
    ``Window.orderBy`` spelling (same oracle family), with no
    single-partition sort anywhere in the plan. This is the 100 TB
    entry; r27/r34 remain the declared oracle forms."""
    from zappy_spark.operators.ranking import with_global_ranks

    o = t(spark, d, "orders").select("o_orderkey", "o_totalprice")
    ranked = with_global_ranks(
        o,
        "o_totalprice",
        ascending=False,
        tiebreak=["o_orderkey"],
        buckets=16,
        rank_col="r",
        dense_rank_col="dr",
        percent_rank_col="_pr",
        cume_dist_col="_cd",
        ntile=(4, "nt"),
    )
    return (
        ranked.select(
            "o_orderkey",
            "r",
            "dr",
            "nt",
            F.round("_pr", 6).alias("pr"),
            F.round("_cd", 6).alias("cd"),
        )
        .orderBy("o_orderkey")
        .limit(100)
    )


def r41(spark: SparkSession, d: str) -> DataFrame:
    """Recursive CTE (Spark 4 ``WITH RECURSIVE``): generate a monthly
    date spine by recursion, then left-join monthly order aggregates
    onto it so empty months still appear.

    The recursion is driver-cheap (24 iterations over a 1-row-per-
    level spine); the joined side is the full distributed orders
    scan, aggregated per month BEFORE the join so the spine join is a
    24-row broadcast. This is the scale shape: recursion generates
    the small dimension, never iterates over the fact table."""
    orders = t(spark, d, "orders")
    monthly = (
        orders.groupBy(
            F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("mon")
        )
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("rev"),
        )
    )
    return spark.sql(
        """
        WITH RECURSIVE spine(mon) AS (
          SELECT DATE'1994-01-01'
          UNION ALL
          SELECT add_months(mon, 1) FROM spine
          WHERE mon < DATE'1995-12-01'
        )
        SELECT s.mon, COALESCE(m.n_orders, 0) AS n_orders,
               COALESCE(m.rev, CAST(0 AS DOUBLE)) AS rev
        FROM spine s LEFT JOIN {monthly} m ON m.mon = s.mon
        ORDER BY s.mon
        """,
        monthly=monthly,
    )


def r43(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery — rows below 20%
    of their group's average. Spelled as the explicit decorrelation
    (per-key aggregate + equi-join) rather than SQL's correlated
    form: same result Catalyst's DecorrelateInnerQuery produces, but
    the join is visible for broadcast/AQE decisions at scale (the
    aggregate side is |distinct keys|, usually broadcastable)."""
    li = t(spark, d, "lineitem")
    avg_q = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.avg("l_quantity") * 0.2).alias("qlim")
    )
    return (
        li.join(F.broadcast(avg_q), F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("qlim"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count("*").alias("n"),
        )
    )


def r42(spark: SparkSession, d: str) -> DataFrame:
    """Z-order clustering key (operators/layout.py): Morton-interleave
    of (p_partkey % 256, p_size) — the key zorder_write range-
    partitions on. The oracle embeds the IDENTICAL generated SQL text
    (zvalue_sql emits engine-portable shifts/masks), so the layout
    kernel itself is hash-verified, not just its effects."""
    from zappy_spark.operators.layout import with_zvalue

    p = (
        t(spark, d, "part")
        .withColumn("x", (F.col("p_partkey") % 256).cast("bigint"))
        .withColumn("y", F.col("p_size").cast("bigint"))
    )
    return (
        with_zvalue(p, ["x", "y"], bits=[8, 6])  # p_size <= 50 -> 6 bits
        .select("p_partkey", "zv")
        .orderBy("zv", "p_partkey")
        .limit(100)
    )


def r94(spark: SparkSession, d: str) -> DataFrame:
    """Hilbert-curve clustering key (round 12;
    operators/layout.py::with_hilbert) — the locality curve modern
    lakehouse clustering uses in place of r42's Z-order: consecutive
    curve positions are ALWAYS Manhattan-adjacent cells (Z-order
    jumps across power-of-two seams), so the same
    repartitionByRange write buys strictly tighter per-file min-max
    boxes on both dimensions. Same (p_partkey % 256, p_size) grid
    as r42 at bits=8. The oracle replays the IDENTICAL generated
    per-level CASE/AND/arithmetic expressions (hilbert_level_exprs
    — one source of truth, the r42 doctrine; the quadrant addend is
    an explicit CASE because DuckDB's ^ is POWER, not XOR), nested
    one subquery per bit level."""
    from zappy_spark.operators.layout import with_hilbert

    p = (
        t(spark, d, "part")
        .withColumn("x", (F.col("p_partkey") % 256).cast("bigint"))
        .withColumn("y", F.col("p_size").cast("bigint"))
    )
    return (
        with_hilbert(p, "x", "y", bits=8)
        .select("p_partkey", "hv")
        .orderBy("hv", "p_partkey")
        .limit(100)
    )


def r44(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late supplier on a
    multi-supplier order — the classic EXISTS + NOT EXISTS pair over
    the same fact table. (This testdata has no receipt/commit dates,
    so "late" := shipped >60 days after the order date.)

    Spelled as left_semi + left_anti self-joins rather than correlated
    subqueries: identical semantics, but both probes are plain
    equi-joins on l_orderkey with a residual suppkey/date predicate —
    shuffle-partitioned on the same key, so at scale the three scans
    co-partition and AQE can pick shuffled-hash. The supplier dim is
    broadcast."""
    li = t(spark, d, "lineitem")
    o = t(spark, d, "orders").filter(F.col("o_orderstatus") == "F")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    l1 = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(late)
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    l2 = li.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2"))
    l3 = li.select(
        F.col("l_orderkey").alias("k3"),
        F.col("l_suppkey").alias("s3"),
        F.col("l_shipdate").alias("sd3"),
    )
    sole_late = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("k2")) & (F.col("l_suppkey") != F.col("s2")),
        "left_semi",
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("k3"))
        & (F.col("l_suppkey") != F.col("s3"))
        # l3 rides the same order as l1, so its lateness reuses l1's
        # o_orderdate — no second orders join needed.
        & (F.col("sd3") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_anti",
    )
    sup = t(spark, d, "supplier")
    return (
        sole_late.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


def r45(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no urgent
    orders — uncorrelated scalar AVG subquery + NOT EXISTS, grouped by
    nation. The scalar aggregate is a 1-row broadcast cross join (no
    shuffle); the NOT EXISTS is a left_anti against the pre-filtered
    urgent-orders side, which the o_orderpriority filter shrinks ~5×
    before the shuffle."""
    c = t(spark, d, "customer")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("ab"))
    urgent = (
        t(spark, d, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("k"))
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(urgent, F.col("c_custkey") == F.col("k"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("tot"),
        )
        .orderBy("nk")
    )


def r46(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution — left outer
    join (customers with zero orders must survive), COUNT per key,
    then a second aggregation over the counts. The first groupBy
    shuffles on c_custkey (same key as the join, so AQE reuses the
    exchange); the second input is |distinct counts| rows — tiny at
    any scale."""
    c = t(spark, d, "customer").select("c_custkey")
    o = (
        t(spark, d, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def r47(spark: SparkSession, d: str) -> DataFrame:
    """Snapshot upsert (operators/pipeline.py::upsert_snapshot): a
    synthesized changelog — price corrections for keys ≡3 (mod 10),
    brand-new keys shifted by 10^8 — merged into the orders snapshot;
    highest version wins per key. One max_by hash aggregate, partials
    map-side (no window, no full-row shuffle of the loser rows)."""
    from zappy_spark.operators.pipeline import upsert_snapshot

    o = t(spark, d, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    base = o.withColumn("v", F.lit(1))
    upd = (
        o.filter(F.col("o_orderkey") % 10 == 3)
        # decimal×decimal, not ROUND(double*1.1, 2): the round-7
        # boundary probe caught this fabrication 5e-9 from a
        # half-cent (the r78 class — engines agree only by luck)
        .withColumn(
            "o_totalprice",
            F.round(
                F.col("o_totalprice").cast("decimal(18,2)")
                * F.lit("1.1").cast("decimal(3,2)"),
                2,
            ).cast("double"),
        )
        .withColumn("o_orderstatus", F.lit("U"))
        .withColumn("v", F.lit(2))
    )
    new = (
        o.filter(F.col("o_orderkey") % 10 == 4)
        .withColumn("o_orderkey", F.col("o_orderkey") + 100_000_000)
        .withColumn("o_orderstatus", F.lit("N"))
        .withColumn("v", F.lit(2))
    )
    merged = upsert_snapshot(
        base, upd.unionByName(new), ["o_orderkey"], "v"
    )
    return (
        merged.filter(
            (F.col("o_orderkey") % 10).isin(3, 4)
            | (F.col("o_orderkey") < 100)
        )
        .orderBy("o_orderkey")
        .limit(100)
    )


def r48(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q11 shape: keep groups whose total exceeds a fraction of
    the GLOBAL total. The global scalar is a separate partial-agg pass
    collapsing to one row, broadcast into the filter — the per-group
    aggregate shuffles once on o_custkey and nothing else moves."""
    o = t(spark, d, "orders")
    # decimal sums: the HAVING-style comparison decides group
    # MEMBERSHIP, so a summation-order ulp near the threshold would
    # add/drop a whole output row (round-7 boundary campaign)
    per = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("tot")
    )
    thr = o.agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast(
                "double"
            )
            * 0.001
        ).alias("thr")
    )
    return (
        per.join(F.broadcast(thr))
        .filter(F.col("tot").cast("double") > F.col("thr"))
        .select(
            "o_custkey", F.round("tot", 2).cast("double").alias("tot")
        )
        .orderBy(F.desc("tot"), "o_custkey")
        .limit(100)
    )


def r49(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q15 shape: the argmax group — supplier(s) with max
    quarterly revenue. Revenue aggregates once (shuffle on suppkey);
    the max is a 1-row broadcast; supplier dim broadcast. Equality is
    on the 2dp-rounded revenue, identical on both engines."""
    li = t(spark, d, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        # decimal accumulation: the argmax EQUALITY below is on this
        # value, so exactness matters twice (round-7 audit probe
        # caught a sum 5e-8 from a half-cent at sf0.1)
        F.round(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ),
            2,
        ).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("mr"))
    sup = t(spark, d, "supplier")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("mr"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev").cast("double").alias("total_rev"),
        )
        .orderBy("s_suppkey")
    )


def r50(spark: SparkSession, d: str) -> DataFrame:
    """Dataset snapshot diff (operators/pipeline.py::dataset_diff):
    orders vs a synthesized next version (prices bumped for keys ≡0
    mod 7, keys ≡0 mod 11 dropped, new shifted keys added) — per-id
    added/removed/changed/unchanged classification via ONE
    co-partitioned full-outer join; summary counts verify all four
    classes are exercised."""
    from zappy_spark.operators.pipeline import dataset_diff_summary

    o = t(spark, d, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    nxt = (
        o.filter(F.col("o_orderkey") % 11 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 7 == 0,
                F.round(F.col("o_totalprice") + 1.0, 2),
            ).otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 13 == 0).withColumn(
                "o_orderkey", F.col("o_orderkey") + 100_000_000
            )
        )
    )
    return dataset_diff_summary(
        o, nxt, "o_orderkey", ["o_totalprice", "o_orderstatus"]
    ).orderBy("status")


def r51(spark: SparkSession, d: str) -> DataFrame:
    """Dominant-supplier-per-part (TPC-H Q20's nested-aggregate-
    threshold shape reshaped to this schema, round 4): for each part,
    the supplier with the largest shipped quantity, kept when its
    share exceeds 2× the part's average supplier share (a relative
    threshold — scale-stable where an absolute share cutoff empties
    out as supplier counts grow with SF). Decorrelated to ONE
    lineitem pass: the per-(part, supplier) aggregate feeds a single
    narrow re-aggregation that computes the part total, the supplier
    count AND the argmax — via lexicographic max(struct(sq,
    suppkey)), deterministic on ties — so no second fact scan and no
    window. The threshold expression is written identically in both
    engines ((2.0*tq)/ns), keeping the strict-> comparison
    IEEE-exact across them."""
    li = t(spark, d, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("sq")
    )
    pt = ps.groupBy("l_partkey").agg(
        F.sum("sq").alias("tq"),
        F.count("*").alias("ns"),
        F.max(F.struct("sq", "l_suppkey")).alias("m"),
    )
    return (
        pt.filter(F.col("m.sq") > 2.0 * F.col("tq") / F.col("ns"))
        .select(
            "l_partkey",
            F.col("m.l_suppkey").alias("s_suppkey"),
            F.round(F.col("m.sq") / F.col("tq"), 6).alias("share"),
        )
        .orderBy(F.desc("share"), "l_partkey")
        .limit(100)
    )


def r52(spark: SparkSession, d: str) -> DataFrame:
    """Forecast-revenue-change (TPC-H Q6 shape): the canonical
    scan-only query. Every predicate (shipdate range, discount band,
    quantity cap) is scan-pushable, so the plan is parquet scan with
    PushedFilters → one partial→final agg over a 3-column
    ReadSchema — zero shuffles of data rows, one 1-row exchange. At
    100 TB this is the query shape that proves predicate pushdown +
    column pruning carry the whole plan."""
    li = t(spark, d, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
        ).alias("revenue")
    )


def r53(spark: SparkSession, d: str) -> DataFrame:
    """Order-priority check (TPC-H Q4 shape, commitdate predicate
    adapted to l_quantity>45 — this vintage has no commit/receipt
    columns). EXISTS decorrelates to a LEFT SEMI join: the probe side
    is lineitem pre-filtered AND pre-projected to the single join
    key, so the shuffle carries one bigint column; the orders date
    filter is scan-pushed. Same decorrelation Catalyst applies to the
    SQL spelling — written directly as the semi join here."""
    o = t(spark, d, "orders")
    li = t(spark, d, "lineitem")
    heavy = li.filter(F.col("l_quantity") > 45).select("l_orderkey")
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .join(heavy, o["o_orderkey"] == heavy["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def r54(spark: SparkSession, d: str) -> DataFrame:
    """Volume shipping between two nations (TPC-H Q7 shape). The
    2-of-25 nation filter is applied by broadcasting the PRE-FILTERED
    nation dim against supplier, then that ~8%-selectivity reduction
    reaches lineitem BEFORE the lineitem⋈orders fact-fact shuffle —
    at scale the shuffle shrinks by the nation selectivity, which
    dominates the plan. Customer side mirrors it. Year extraction is
    scan-side; the final agg is narrow (2×2 nations × years)."""
    li = t(spark, d, "lineitem")
    s = t(spark, d, "supplier")
    o = t(spark, d, "orders")
    c = t(spark, d, "customer")
    n = t(spark, d, "nation")
    pair = ["NATION_1", "NATION_2"]
    n1 = n.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ).cast("decimal(18,4)")
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def r55(spark: SparkSession, d: str) -> DataFrame:
    """National market share (TPC-H Q8 shape): NATION_3's share of
    PROMO-part volume sold into ASIA, by order year. The two
    conditional sums ride ONE aggregation — share is a post-agg
    projection, not a self-join. part (filtered to PROMO) and the
    nation⋈region market dim broadcast; supplier-nation name is a
    second broadcast of the same dim under a different alias."""
    li = t(spark, d, "lineitem")
    p = t(spark, d, "part")
    s = t(spark, d, "supplier")
    o = t(spark, d, "orders")
    c = t(spark, d, "customer")
    n = t(spark, d, "nation")
    r = t(spark, d, "region")
    promo = p.filter(F.col("p_type") == "PROMO").select("p_partkey")
    mkt = (
        n.join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select(F.col("n_nationkey").alias("m_nk"))
    )
    sn = s.join(
        n.select(F.col("n_nationkey").alias("sn_nk"), F.col("n_name").alias("supp_nation")),
        F.col("s_nationkey") == F.col("sn_nk"),
    ).select("s_suppkey", "supp_nation")
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    zero = F.lit("0").cast("decimal(18,4)")
    return (
        li.join(F.broadcast(promo), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(mkt), F.col("c_nationkey") == F.col("m_nk"), "left_semi")
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            # exact decimal sums → one deterministic double division
            # → decimal(18,10) bridge so the 6dp round has no
            # cross-engine ROUND(double) boundary (round-7 campaign)
            F.round(
                (
                    F.sum(
                        F.when(
                            F.col("supp_nation") == "NATION_3", vol
                        ).otherwise(zero)
                    ).cast("double")
                    / F.sum(vol).cast("double")
                ).cast("decimal(18,10)"),
                6,
            )
            .cast("double")
            .alias("mkt_share")
        )
        .orderBy("o_year")
    )


def r56(spark: SparkSession, d: str) -> DataFrame:
    """Product-type profit (TPC-H Q9 shape; supplycost has no column
    in this vintage, so margin uses p_retailprice·qty/100 as the
    deterministic cost proxy — spelled identically in the oracle).
    part is filtered on p_name BEFORE broadcast, so the name LIKE
    lands scan-side on the small table; nation broadcasts onto
    supplier; lineitem⋈orders stays the one fact-fact shuffle.

    Determinism (VERDICT r4 §wrong-1): two of the 175 group sums land
    exactly on a half-cent boundary, so ``ROUND(SUM(double),2)`` was
    one-ulp-sensitive to partial-agg order. The per-row amount is a
    product of fixed-point inputs (2dp·2dp − 1dp·int/100 → exactly
    4 dp in real arithmetic), so casting each row to DECIMAL(18,4)
    loses nothing and decimal SUM is exact and order-independent on
    both engines; the final cast back to double is a deterministic
    nearest-conversion. No ROUND anywhere → no boundary to flip."""
    li = t(spark, d, "lineitem")
    p = t(spark, d, "part")
    s = t(spark, d, "supplier")
    o = t(spark, d, "orders")
    n = t(spark, d, "nation")
    red = p.filter(F.col("p_name").contains("red")).select(
        "p_partkey", "p_retailprice"
    )
    sn = s.join(
        F.broadcast(
            n.select(F.col("n_nationkey").alias("sn_nk"), "n_name")
        ),
        F.col("s_nationkey") == F.col("sn_nk"),
    ).select("s_suppkey", "n_name")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity") / F.lit(100.0)
    return (
        li.join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            o.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.sum(amount.cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_profit")
        )
        .orderBy("nation", F.desc("o_year"))
    )


def r57(spark: SparkSession, d: str) -> DataFrame:
    """Returned-item reporting (TPC-H Q10 shape): top 20 customers by
    revenue lost to returns in one quarter. Revenue is aggregated per
    customer BEFORE attaching name/acctbal/nation (eager agg, same
    rewrite as r02) so the wide customer columns never enter the
    shuffle; final top-20 compiles to TakeOrderedAndProject."""
    li = t(spark, d, "lineitem")
    o = t(spark, d, "orders")
    c = t(spark, d, "customer")
    n = t(spark, d, "nation")
    rev = (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
            ).select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(
            F.round(
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ).cast("decimal(18,4)")
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )
    return (
        rev.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("nk"), "n_name")),
            F.col("c_nationkey") == F.col("nk"),
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def r58(spark: SparkSession, d: str) -> DataFrame:
    """Promotion-effect (TPC-H Q14 shape): promo share of one ship
    month as a percentage. Single conditional-sum aggregation over
    lineitem⋈broadcast(part) — the division happens after the agg,
    so the plan is scan → broadcast hash join → 1-row agg."""
    li = t(spark, d, "lineitem")
    p = t(spark, d, "part")
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    zero = F.lit("0").cast("decimal(18,4)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
        )
        .join(
            F.broadcast(p.select("p_partkey", "p_type")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .agg(
            # exact decimal sums → deterministic double division →
            # decimal(18,10) bridge (round-7 boundary campaign)
            F.round(
                (
                    F.lit(100.0)
                    * F.sum(
                        F.when(F.col("p_type") == "PROMO", vol).otherwise(
                            zero
                        )
                    ).cast("double")
                    / F.sum(vol).cast("double")
                ).cast("decimal(18,10)"),
                4,
            )
            .cast("double")
            .alias("promo_revenue")
        )
    )


def r59(spark: SparkSession, d: str) -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17 shape): lineitems
    below 20% of their part's average quantity, for one brand. The
    brand filter broadcasts FIRST, shrinking lineitem to ~1/25th
    before the per-part average; the avg-per-part aggregate and the
    join back to lines both hash on l_partkey, so the sort-merge
    join is co-partitioned — two narrow exchanges (one carries
    partial averages, one the trimmed lines), no third for the join."""
    li = t(spark, d, "lineitem")
    p = t(spark, d, "part")
    brand = p.filter(F.col("p_brand") == "Brand#3").select("p_partkey")
    lib = li.join(
        F.broadcast(brand), F.col("l_partkey") == F.col("p_partkey")
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    lim = lib.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_lim")
    )
    return (
        lib.join(lim, F.col("l_partkey") == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_lim"))
        .agg(
            F.round(
                (
                    F.sum(
                        F.col("l_extendedprice").cast("decimal(18,2)")
                    ).cast("double")
                    / F.lit(7.0)
                ).cast("decimal(28,8)"),
                2,
            )
            .cast("double")
            .alias("avg_yearly")
        )
    )


def r60(spark: SparkSession, d: str) -> DataFrame:
    """Discounted revenue under disjunctive predicates (TPC-H Q19
    shape): three OR'd (brand, size-band, quantity-band) branches.
    The disjunction can't push below the join, but the part columns
    it needs (brand, size) ride a broadcast, and a derived
    l_quantity range (the union of the three bands, 1–30) IS pushed
    to the lineitem scan — the standard Q19 trick of extracting a
    scan-eligible envelope from a disjunction."""
    li = t(spark, d, "lineitem")
    p = t(spark, d, "part")
    j = li.filter(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30)
    ).join(
        F.broadcast(p.select("p_partkey", "p_brand", "p_size")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    b1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    )
    b2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 25)
        & F.col("l_quantity").between(10, 20)
    )
    b3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 40)
        & F.col("l_quantity").between(20, 30)
    )
    return j.filter(b1 | b2 | b3).agg(
        F.round(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ),
            2,
        )
        .cast("double")
        .alias("revenue")
    )


def r61(spark: SparkSession, d: str) -> DataFrame:
    """Minimum-cost supplier per part (TPC-H Q2 shape; no partsupp
    table in this vintage, so the part↔supplier cost relation is
    derived from lineitem as the MINIMUM per-row unit price per
    (part, supplier)). The argmin is a window partitioned by partkey
    over the ALREADY per-(part,supplier)-aggregated frame —
    cardinality parts×suppliers-per-part, not lines. The cost metric
    is min(floor(price/qty·10⁴))/10⁴: 2-decimal prices over integer
    quantities land on .00005 ROUND boundaries constantly, where
    Spark (BigDecimal half-up on the shortest decimal) and DuckDB
    (double arithmetic) disagree on the SAME double — measured at
    sf0.1 (89.11625 → 89.1163 vs 89.1162). FLOOR of the scaled
    value is exact on the identical IEEE double in both engines, and
    MIN is accumulation-order-insensitive — the Appendix-A
    float-determinism discipline. Supplier/nation attach by
    broadcast after the argmin."""
    li = t(spark, d, "lineitem")
    p = t(spark, d, "part")
    s = t(spark, d, "supplier")
    n = t(spark, d, "nation")
    small = p.filter(
        (F.col("p_size") == 10) & (F.col("p_type") == "SMALL")
    ).select("p_partkey", "p_name")
    cost = (
        li.join(F.broadcast(small), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "p_name", "l_suppkey")
        .agg(
            (
                F.min(
                    F.floor(
                        F.col("l_extendedprice")
                        / F.col("l_quantity")
                        * 10000
                    ).cast("bigint")
                )
                / 10000.0
            ).alias("unit_cost")
        )
    )
    w = Window.partitionBy("l_partkey").orderBy("unit_cost", "l_suppkey")
    best = (
        cost.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return (
        best.join(
            F.broadcast(s.select("s_suppkey", "s_name", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("nk"), "n_name")),
            F.col("s_nationkey") == F.col("nk"),
        )
        .select("l_partkey", "p_name", "s_name", "n_name", "unit_cost")
        .orderBy("unit_cost", "l_partkey")
        .limit(50)
    )


def r62(spark: SparkSession, d: str) -> DataFrame:
    """Shipping-priority split (TPC-H Q12 shape; no l_shipmode
    column, so the mode axis is l_linestatus). Conditional counts by
    line status for one ship year — orders joins in only its
    priority column, and the fact-fact join carries a 2-column
    projection on each side."""
    li = t(spark, d, "lineitem")
    o = t(spark, d, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_linestatus")
        .join(
            o.select("o_orderkey", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(high.cast("bigint")).alias("high_line_count"),
            F.sum((~high).cast("bigint")).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


def r63(spark: SparkSession, d: str) -> DataFrame:
    """Pure interval join via bin bucketing (round 4;
    operators/joins.py::binned_range_join): lineitems shipped within
    7 days of ANY order's date, counted per order priority — no equi
    key anywhere, the shape Spark otherwise plans as a
    BroadcastNestedLoop over |points|·|intervals| pairs. The binned
    form is an equi join on the 7-day bin id plus the exact
    residual; the oracle is DuckDB's native inequality join (IEJoin)
    over the same day arithmetic, so the rewrite's exactness — not
    just its plan — is hash-checked.

    r12: both sides pre-aggregate to day granularity BEFORE the
    binned join (guide §2.3, aggregate before you shuffle) — the
    join predicate only reads days, so pair multiplicity factors
    exactly into |points on day p| × |intervals with (priority,
    lo)|, and ``sum(np·ni)`` over matching day pairs equals
    ``count(*)`` over row pairs. Shrinks the join from
    |lineitem|·|orders| pair evaluations to |distinct days|² scale
    while still exercising the binned-range-join operator; exact
    BIGINT arithmetic, result hash unchanged."""
    from zappy_spark.operators.joins import binned_range_join

    li = (
        t(spark, d, "lineitem")
        .select(F.unix_date(F.col("l_shipdate").cast("date")).alias("p"))
        .groupBy("p")
        .agg(F.count("*").alias("np"))
    )
    o = (
        t(spark, d, "orders")
        .select(
            "o_orderpriority",
            F.unix_date(F.col("o_orderdate").cast("date")).alias("lo"),
        )
        .withColumn("hi", F.col("lo") + 7)
        .groupBy("o_orderpriority", "lo", "hi")
        .agg(F.count("*").alias("ni"))
    )
    return (
        binned_range_join(li, o, "p", "lo", "hi", bin_width=7)
        .groupBy("o_orderpriority")
        .agg(F.sum(F.col("np") * F.col("ni")).alias("pairs"))
        .orderBy("o_orderpriority")
    )


def r64(spark: SparkSession, d: str) -> DataFrame:
    """Gap-fill + forward fill (LOCF), the hypertable resample shape
    (round 4): per-user hourly grid over the user's own [first, last]
    event hours, each slot carrying the last-observed ``value``.

    The spine is ``sequence()``+explode off a per-user bounds
    aggregate — generated executor-side, never a driver loop; the
    fill is ``last(ignorenulls=True)`` over a per-user window. One
    shuffle on user_id shared by the bounds agg, the hourly agg, and
    the fill window. The hourly "last value" is ``max_by`` over
    (ts, event_id) — one hash aggregate, no intra-hour window. Grid
    density scales with each user's own span, not the global span,
    so sparse users don't inflate the spine at 100 TB."""
    ev = t(spark, d, "events").filter(
        (F.col("user_id") < 5)
        & (F.col("ts") < F.lit("2024-01-02").cast("timestamp"))
    )
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.round(
            F.max_by("value", F.struct("ts", "event_id")), 2
        ).alias("v")
    )
    bounds = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = bounds.select(
        "user_id",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("h"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(hourly, ["user_id", "h"], "left")
        .select(
            "user_id",
            "h",
            F.last("v", ignorenulls=True).over(w).alias("v_fill"),
        )
        .orderBy("user_id", "h")
        .limit(100)
    )


def r65(spark: SparkSession, d: str) -> DataFrame:
    """Time-weighted average (round 4): each event's value weighted
    by how long it stayed current (microseconds to the next event of
    the same user) — the TWA every metrics/billing rollup needs when
    samples are irregular. lead() over one user_id shuffle; weights
    are integer micros (``unix_micros``) so both engines compute the
    identical dt, and the double ratio is rounded at 4dp."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = (
        t(spark, d, "events")
        .select(
            "user_id",
            "value",
            F.unix_micros("ts").alias("us"),
            F.lead(F.unix_micros("ts")).over(w).alias("nus"),
        )
        .filter(F.col("nus").isNotNull())
        .withColumn("dt", F.col("nus") - F.col("us"))
    )
    return (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n_seg"),
            F.round(
                F.sum(F.col("value") * F.col("dt")) / F.sum("dt"), 4
            ).alias("twa"),
        )
        .orderBy("user_id")
    )


def r66(spark: SparkSession, d: str) -> DataFrame:
    """Conversion funnel (round 4): signup → first click within 24h
    → first purchase within 24h of that click; one row of per-stage
    user counts. Each stage is a min-aggregate on user_id then an
    equi-join back on the same key — one partitioning reused across
    all three stages (exchange reuse), no window, no per-user
    collect. The stage counts are 1-row aggregates crossJoined
    (broadcast nested loop over single rows), the same scale-safe
    pattern as the scalar-subquery query (r19)."""
    ev = t(spark, d, "events")
    day = F.expr("INTERVAL 24 HOURS")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= F.col("t1") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter((F.col("ts") > F.col("t2")) & (F.col("ts") <= F.col("t2") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s.agg(F.count("*").alias("stage_signup"))
        .crossJoin(c.agg(F.count("*").alias("stage_click")))
        .crossJoin(p.agg(F.count("*").alias("stage_purchase")))
    )


def r67(spark: SparkSession, d: str) -> DataFrame:
    """Mode aggregate (round 4b): most frequent l_quantity per
    returnflag with a deterministic smallest-value tiebreak —
    spelled count + one max(struct) argmax, never a window over the
    shuffled group (losers of each group never leave the partial
    aggregate). Engines' native mode() has nondeterministic ties, so
    the tiebreak is part of the declared semantics."""
    li = t(spark, d, "lineitem")
    cnt = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count("*").alias("c")
    )
    best = F.max(F.struct(F.col("c"), (-F.col("l_quantity")).alias("nq")))
    return (
        cnt.groupBy("l_returnflag")
        .agg(best.alias("_b"))
        .select(
            "l_returnflag",
            (-F.col("_b.nq")).alias("mode_qty"),
            F.col("_b.c").alias("freq"),
        )
        .orderBy("l_returnflag")
    )


def r68(spark: SparkSession, d: str) -> DataFrame:
    """Parts/supplier relationship count (TPC-H Q16 shape, adapted:
    supplier-part pairs come from lineitem since this vintage has no
    partsupp; "customer complaints" → negative acctbal). Completes
    the 22/22 adapted TPC-H shape coverage (round 4b).

    Scale shape: the excluded-supplier set is a broadcast anti join
    (bounded dim); part is broadcast into the pair scan; the
    COUNT(DISTINCT suppkey) runs as the two-phase distinct aggregate
    over (brand, type, size, suppkey) — partials dedup map-side, so
    the shuffle carries pair keys, never lineitem rows."""
    li = t(spark, d, "lineitem")
    part = F.broadcast(
        t(spark, d, "part").filter(
            (F.col("p_brand") != "Brand#1")
            & (~F.col("p_type").startswith("PROMO"))
            & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
        )
    )
    bad_supp = F.broadcast(
        t(spark, d, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(
            bad_supp,
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), "p_brand", "p_type", "p_size"
        )
        .limit(50)
    )


def r69(spark: SparkSession, d: str) -> DataFrame:
    """As-of join with TOLERANCE (round 4b; pandas merge_asof
    parity knob on operators/joins.py::asof_join): each click
    matched to the user's most recent error within 30 minutes —
    stale matches beyond the horizon drop. Same single
    union+window pass as the unbounded as-of; the tolerance is a
    post-filter, no extra shuffle. The DuckDB twin spells the bound
    inside a correlated MAX subquery."""
    from zappy_spark.operators.joins import asof_join

    ev = t(spark, d, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts"
    )
    j = asof_join(
        clicks,
        errors,
        on="ts",
        by=["user_id"],
        tolerance=F.expr("INTERVAL 30 MINUTES"),
    )
    return (
        j.groupBy("user_id")
        .agg(
            F.count("*").alias("n_matched"),
            F.round(
                F.avg(
                    F.unix_timestamp("ts") - F.unix_timestamp("ts_right")
                ),
                3,
            ).alias("avg_gap"),
        )
        .orderBy("user_id")
        .limit(100)
    )


def r70(spark: SparkSession, d: str) -> DataFrame:
    """percentile_disc vs percentile_cont per group (round 4b).
    Spark has no percentile_disc; the spelling here is the
    scale-correct one — "smallest value whose cumulative count
    reaches p·n" over the per-(group, value) COUNT aggregate, so the
    window sorts |distinct values| rows per group, never raw rows,
    and the raw data is scanned once. p ∈ {0.5, 0.75} are exact
    binary fractions, so the boundary compare is engine-exact.
    cont comes from the native interpolating percentile (z20-parity
    with DuckDB's percentile_cont)."""
    li = t(spark, d, "lineitem")
    cnt = li.groupBy("l_returnflag", "l_extendedprice").agg(
        F.count("*").alias("c")
    )
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = Window.partitionBy("l_returnflag")
    cum = cnt.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(tot).alias("n"),
    )
    disc = cum.groupBy("l_returnflag").agg(
        F.min(
            F.when(F.col("cum") >= 0.5 * F.col("n"), F.col("l_extendedprice"))
        ).alias("disc50"),
        F.min(
            F.when(F.col("cum") >= 0.75 * F.col("n"), F.col("l_extendedprice"))
        ).alias("disc75"),
    )
    cont = li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", 0.5), 4).alias("cont50"),
        F.round(F.percentile("l_extendedprice", 0.75), 4).alias("cont75"),
    )
    return (
        disc.join(cont, "l_returnflag")
        .select("l_returnflag", "disc50", "disc75", "cont50", "cont75")
        .orderBy("l_returnflag")
    )


def r71(spark: SparkSession, d: str) -> DataFrame:
    """Data-quality audit (round 4b;
    operators/diagnostics.py::dq_audit): referential-integrity and
    null-count gate over lineitem→orders — orphan FKs via a
    DISTINCT-keyed anti join, duplicate-key and null counts as
    single hash aggregates, all 1-row results crossJoined."""
    from zappy_spark.operators.diagnostics import dq_audit

    return dq_audit(
        t(spark, d, "lineitem"),
        "l_orderkey",
        t(spark, d, "orders"),
        "o_orderkey",
        ["l_shipdate", "l_quantity", "l_extendedprice"],
    )


def r72(spark: SparkSession, d: str) -> DataFrame:
    """Equi-width numeric histogram (round 4b): 20 fixed buckets
    over l_extendedprice, each with count + observed min/max — the
    profiling readout feeding skew diagnostics and d12's quantile
    buckets. Bucket id is pure floor arithmetic (identical doubles
    both engines; DuckDB lacks width_bucket so the portable spelling
    IS the declared one). ONE hash aggregate on a 20-value key —
    scan-side bucketing, map-side partials carry ≤20 rows."""
    li = t(spark, d, "lineitem")
    bucket = F.least(
        F.lit(19), F.floor(F.col("l_extendedprice") / 5000).cast("int")
    ).cast("bigint")
    return (
        li.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("l_extendedprice"), 2).alias("lo"),
            F.round(F.max("l_extendedprice"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


def r74(spark: SparkSession, d: str) -> DataFrame:
    """Skew-salted join under the correctness gate (round 4c;
    operators/joins.py::salted_join): lineitem's orderkeys spread
    over 8 salt partitions, orders replicated 8×, join on
    (key, salt) — result is EXACTLY the plain equi-join, which is
    what the DuckDB oracle replays. The production tool for a known
    power-law key that AQE's sort-merge skew split can't help
    (shuffled-hash, or one key > one task's sort budget)."""
    from zappy_spark.operators.joins import salted_join

    li = t(spark, d, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_quantity"
    )
    od = t(spark, d, "orders").select(
        F.col("o_orderkey").alias("k"), "o_orderpriority"
    )
    return (
        salted_join(li, od, "k", salt=8)
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("qty"),
            F.count("*").alias("n"),
        )
        .orderBy("o_orderpriority")
    )


def r75(spark: SparkSession, d: str) -> DataFrame:
    """ANSI aggregate FILTER clause (round 4c): per-group conditional
    aggregates spelled with FILTER (WHERE ...) — same plan as the
    CASE spelling (r21), but the declarative ANSI surface a SQL user
    ports unchanged; runs verbatim on both engines (portable set,
    test_sql_surface). Still one partial→final hash aggregate."""
    li = t(spark, d, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "COUNT(*) FILTER (WHERE l_quantity > 25)"
            ).alias("big"),
            # decimal accumulation: the sf0.1 double sum lands exactly
            # on a half-cent ROUND boundary (audit_rounding.py), and
            # 2dp money is exact in DECIMAL(18,2)
            F.expr(
                "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) "
                "FILTER (WHERE l_discount > 0.05) AS DOUBLE)"
            ).alias("disc_rev"),
            F.expr(
                "ROUND(AVG(l_quantity) FILTER (WHERE l_tax = 0.0), 4)"
            ).alias("notax_q"),
        )
        .orderBy("l_returnflag")
    )


def r76(spark: SparkSession, d: str) -> DataFrame:
    """Error-safe arithmetic (round 4c): ``try_divide`` turns
    division-by-zero into NULL instead of an ANSI error, ``try_cast``
    parses the parseable and nulls the rest — the data-quality
    contract for raw-corpus arithmetic, where one dirty row must not
    kill a 12-hour job (same philosophy as the JSONL PERMISSIVE
    quarantine). The oracle replays NULL-on-zero and TRY_CAST in
    DuckDB. One hash aggregate; everything scan-side."""
    li = t(spark, d, "lineitem")
    ratio = F.try_divide("l_extendedprice", "l_discount")
    stringy = F.when(
        F.col("l_linenumber") % 2 == 0,
        F.col("l_quantity").cast("string"),
    ).otherwise(F.col("l_returnflag"))
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.when(ratio.isNull(), 1)).alias("zero_disc"),
            F.round(F.sum(ratio), 2).alias("ratio_sum"),
            F.count(stringy.try_cast("double")).alias("parsed"),
        )
        .orderBy("l_returnflag")
    )


def r77(spark: SparkSession, d: str) -> DataFrame:
    """Cohort retention (round 4c): users grouped by first-seen day
    (their cohort), counted on each later active day as a day
    offset — the product-analytics staple. Three narrow shuffles
    regardless of event volume: per-user min(ts), a distinct on
    (user, day), and the (cohort, offset) count-distinct; the
    per-user frames are |users|-sized, not |events|-sized, which is
    what keeps the shape viable when events are 10^12 rows."""
    ev = t(spark, d, "events")
    # to_date, not date_trunc: the oracle's calendar type is DATE,
    # and a midnight TIMESTAMP hashes differently (dtype parity)
    first = ev.groupBy("user_id").agg(
        F.to_date(F.min("ts")).alias("cohort")
    )
    act = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    return (
        act.join(first, "user_id")
        .groupBy(
            "cohort",
            F.datediff("day", "cohort").cast("bigint").alias("offset"),
        )
        .agg(F.countDistinct("user_id").alias("users"))
        .orderBy("cohort", "offset")
        .limit(100)
    )


def b4(spark: SparkSession, d: str) -> DataFrame:
    """Global top-k → TakeOrderedAndProject (no full sort)."""
    return (
        t(spark, d, "lineitem")
        .select("l_orderkey", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_extendedprice")
        .limit(10)
    )


def b5(spark: SparkSession, d: str) -> DataFrame:
    return t(spark, d, "lineitem").agg(
        F.countDistinct("l_partkey").alias("c1"),
        F.countDistinct("l_suppkey").alias("c2"),
    )


def b7(spark: SparkSession, d: str) -> DataFrame:
    """contains() compiles to a direct UTF8String.contains — measured
    ~12% faster than the LIKE '%join%' pattern-match path at sf0.1
    (round-4 profiling); same semantics for a literal infix."""
    docs = t(spark, d, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("c"),
            F.sum(
                F.contains(F.col("text"), F.lit("join")).cast("int")
            ).alias("j"),
        )
        .orderBy("lang")
    )


def b9(spark: SparkSession, d: str) -> DataFrame:
    li = t(spark, d, "lineitem").select(F.col("l_partkey").alias("c"))
    p = t(spark, d, "part").select(F.col("p_partkey").alias("c"))
    return li.intersect(p).orderBy("c").limit(5)


def r85(spark: SparkSession, d: str) -> DataFrame:
    """Bitemporal as-of resolution (round 5c): "what did we BELIEVE
    at transaction time T about the state at valid time V" — the
    two-axis time-travel query behind reproducible training
    snapshots with late-arriving corrections (r79's point-in-time
    lookup gains a second temporal predicate; r78's SCD-2 is the
    write side). The orders table stands in as a versioned
    dimension: valid_from = order date, tx_from = order date +
    (orderkey mod 30) days of ingest lag. Both cutoffs are
    scan-side filters (pushdown-eligible), then ONE window picks
    the latest valid version per customer — no join, no history
    rescan. V=1995-06-30, T=1996-01-01; first 100 customers."""
    od = t(spark, d, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("valid_from"),
        F.date_add(
            F.col("o_orderdate").cast("date"),
            (F.col("o_orderkey") % 30).cast("int"),
        ).alias("tx_from"),
        "o_totalprice",
    )
    snap = od.filter(
        (F.col("valid_from") <= F.lit("1995-06-30").cast("date"))
        & (F.col("tx_from") <= F.lit("1996-01-01").cast("date"))
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("valid_from"), F.desc("o_orderkey")
    )
    return (
        snap.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            "valid_from",
            F.round("o_totalprice", 2).alias("price"),
        )
        .orderBy("o_custkey")
        .limit(100)
    )


def r86(spark: SparkSession, d: str) -> DataFrame:
    """Benford first-digit audit (round 5d; the data-quality test
    auditors run on money columns). The leading digit is taken from
    the STRING of the exact integer cents (``round(price*100)``) —
    never ``floor(log10(x))``, whose float error misclassifies exact
    powers of ten. Expected mass is ``ln(1+1/d)/ln(10)``; the
    chi-square contribution per digit flags the skewed ones.

    Scale shape: one scan → 9-group hash agg; the grand total joins
    back as a broadcast 1-row aggregate (the r19 scalar-subquery
    pattern), so nothing ever leaves two stages."""
    o = t(spark, d, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    per = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count("*").alias("n")
    )
    tot = per.agg(F.sum("n").cast("double").alias("n_total"))
    p = F.col("n") / F.col("n_total")
    e = F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            F.round(p, 6).alias("obs_p"),
            F.round(e, 6).alias("benford_p"),
            F.round(F.col("n_total") * F.pow(p - e, 2) / e, 6).alias(
                "chi_contrib"
            ),
        )
        .orderBy("digit")
    )


def r87(spark: SparkSession, d: str) -> DataFrame:
    """Welch two-sample t-test (round 5d): URGENT vs LOW order
    totals — the A/B-test primitive. Moments accumulate in exact
    DECIMAL (2dp money → 4dp squares, both order-independent; the
    r56 lesson applied proactively), so mean/variance/t/df are
    bit-deterministic; doubles appear only in the final closed-form
    arithmetic on identical inputs.

    Scale shape: single scan, conditional aggregation → ONE row;
    no join, no shuffle beyond the map-side partials."""
    o = t(spark, d, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    )
    x = F.col("o_totalprice").cast("decimal(18,2)")
    a = F.col("o_orderpriority") == "1-URGENT"
    agg = o.agg(
        F.sum(F.when(a, 1)).alias("n1"),
        F.sum(F.when(a, x)).alias("sx1"),
        F.sum(F.when(a, x * x)).alias("sxx1"),
        F.sum(F.when(~a, 1)).alias("n2"),
        F.sum(F.when(~a, x)).alias("sx2"),
        F.sum(F.when(~a, x * x)).alias("sxx2"),
    )
    n1, n2 = F.col("n1").cast("double"), F.col("n2").cast("double")
    sx1, sx2 = F.col("sx1").cast("double"), F.col("sx2").cast("double")
    sxx1 = F.col("sxx1").cast("double")
    sxx2 = F.col("sxx2").cast("double")
    m1, m2 = sx1 / n1, sx2 / n2
    v1 = (sxx1 - sx1 * sx1 / n1) / (n1 - 1)
    v2 = (sxx2 - sx2 * sx2 / n2) / (n2 - 1)
    se1, se2 = v1 / n1, v2 / n2
    tstat = (m1 - m2) / F.sqrt(se1 + se2)
    dof = F.pow(se1 + se2, 2) / (
        F.pow(se1, 2) / (n1 - 1) + F.pow(se2, 2) / (n2 - 1)
    )
    return agg.select(
        F.col("n1").alias("n_urgent"),
        F.col("n2").alias("n_low"),
        F.round(m1, 4).alias("mean_urgent"),
        F.round(m2, 4).alias("mean_low"),
        F.round(tstat, 6).alias("t_stat"),
        F.round(dof, 4).alias("welch_df"),
    )


def r89(spark: SparkSession, d: str) -> DataFrame:
    """RFM customer segmentation (round 5d): recency / frequency /
    monetary quintiles via NTILE(5), then the 125-cell segment grid
    with counts and total spend. Monetary accumulates in
    DECIMAL(18,2) (exact), and every NTILE order is fully tied off
    with the customer key, so bucket edges are deterministic.

    Round-6 re-spell (VERDICT r5 §wrong-1): NTILE scores cast to
    BIGINT (Spark NTILE is INT, DuckDB's is BIGINT — same class r03
    fixed), and the cell stat is the exact-decimal SUM cast to
    double instead of ROUND(avg, 4): two cells of the old avg sat
    exactly on a ROUND half-boundary, the fragility class that made
    r56 flake in round 4. The sum carries identical information
    (avg = sum / n_customers) with zero rounding anywhere.

    Scale shape: the fact scan collapses to one row per customer
    FIRST; the three global NTILEs then run over the aggregated
    customer table (|customers| ≪ |orders| — a deliberate,
    whitelisted single-partition sort, same class as the r84 day
    spine; operators/ranking.py has the bucketed two-pass for a
    customer dimension that itself outgrows one partition)."""
    o = t(spark, d, "orders")
    per = o.groupBy("o_custkey").agg(
        F.max(F.col("o_orderdate").cast("date")).alias("lastd"),
        F.count("*").alias("freq"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("mon"),
    )
    return rfm_grid(per)


def rfm_grid(per: DataFrame) -> DataFrame:
    """The r89 quintile grid over an already-reduced per-customer
    frame of (o_custkey, lastd, freq, mon). Factored out so the
    streaming twin (streaming/jobs.py::rfm_segments_from_state,
    which maintains the same sufficient statistics incrementally)
    ranks through the IDENTICAL code path — drained-equals-batch is
    then a test about the state maintenance, not about two grid
    spellings."""
    mx = per.agg(F.max("lastd").alias("maxd"))
    per = per.crossJoin(F.broadcast(mx)).withColumn(
        "rec", F.datediff("maxd", "lastd")
    )
    wr = Window.orderBy(F.col("rec").asc(), "o_custkey")
    wf = Window.orderBy(F.desc("freq"), "o_custkey")
    wm = Window.orderBy(F.desc("mon"), "o_custkey")
    scored = per.select(
        "o_custkey",
        "mon",
        F.ntile(5).over(wr).cast("bigint").alias("r_score"),
        F.ntile(5).over(wf).cast("bigint").alias("f_score"),
        F.ntile(5).over(wm).cast("bigint").alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("mon").cast("double").alias("sum_monetary"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


def r90(spark: SparkSession, d: str) -> DataFrame:
    """Market-basket association rules (round 5d): pairwise item
    co-occurrence in orders with support / confidence / lift —
    the first a-priori pass. Items are ``l_partkey % 50`` category
    proxies (documented; real catalogs hang a dim join here).

    Scale shape, in order: (1) DISTINCT (basket, item) BEFORE any
    join — repeat lines never inflate counts or fan-out; (2) the
    a-priori prune drops infrequent items before pair generation
    (support ≥ 2%), bounding the self-join; (3) the pair self-join
    shuffles on the basket key both sides co-partitioned; (4) item
    frequencies and the basket total come back as broadcast joins.
    All counts are integers → lift/confidence are exact."""
    li = t(spark, d, "lineitem")
    bi = (
        li.select(
            "l_orderkey", (F.col("l_partkey") % 50).alias("item")
        ).distinct()
    )
    tot = bi.agg(
        F.count_distinct("l_orderkey").cast("double").alias("n_orders")
    )
    freq = bi.groupBy("item").agg(F.count("*").alias("item_n"))
    kept = freq.crossJoin(F.broadcast(tot)).filter(
        F.col("item_n") >= 0.02 * F.col("n_orders")
    )
    pruned = bi.join(
        F.broadcast(kept.select("item")), "item", "left_semi"
    )
    a = pruned.select("l_orderkey", F.col("item").alias("i"))
    b = pruned.select("l_orderkey", F.col("item").alias("j"))
    co = (
        a.join(b, ["l_orderkey"])
        .filter(F.col("i") < F.col("j"))
        .groupBy("i", "j")
        .agg(F.count("*").alias("co_n"))
    )
    fi = F.broadcast(freq.select(F.col("item").alias("i"), F.col("item_n").alias("i_n")))
    fj = F.broadcast(freq.select(F.col("item").alias("j"), F.col("item_n").alias("j_n")))
    return (
        co.join(fi, "i")
        .join(fj, "j")
        .crossJoin(F.broadcast(tot))
        .select(
            "i",
            "j",
            "co_n",
            F.round(F.col("co_n") / F.col("n_orders"), 6).alias("support"),
            F.round(F.col("co_n") / F.col("i_n"), 6).alias("confidence"),
            F.round(
                F.col("co_n") * F.col("n_orders")
                / (F.col("i_n") * F.col("j_n")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "i", "j")
        .limit(20)
    )


def r91(spark: SparkSession, d: str) -> DataFrame:
    """Month-over-month and year-over-year revenue growth (round 6):
    the KPI-dashboard staple. Monthly revenue accumulates in exact
    DECIMAL(18,2) cents-safe sums; growth percentages divide the
    resulting exact values as doubles (every monthly sum is an
    integer number of cents < 2^53, so the doubles are exact and
    the division IEEE-deterministic cross-engine).

    Scale shape: ONE hash aggregate collapses the fact table to the
    month spine (≤ a few hundred rows forever); the two LAG windows
    then ride that aggregate — a deliberate, whitelisted
    single-partition window of the r84 day-spine class (a spine
    that outgrew one partition would use operators/ranking.py's
    bucketed two-pass)."""
    o = t(spark, d, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate").cast("date"))
        .cast("date")
        .alias("month")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    w = Window.orderBy("month")
    g = monthly.select(
        "month",
        F.col("rev").cast("double").alias("revenue"),
        F.lag("rev", 1).over(w).cast("double").alias("_p1"),
        F.lag("rev", 12).over(w).cast("double").alias("_p12"),
    )
    return g.select(
        "month",
        "revenue",
        F.round(
            100.0 * (F.col("revenue") - F.col("_p1")) / F.col("_p1"), 6
        ).alias("mom_pct"),
        F.round(
            100.0 * (F.col("revenue") - F.col("_p12")) / F.col("_p12"), 6
        ).alias("yoy_pct"),
    ).orderBy("month")


def r92(spark: SparkSession, d: str) -> DataFrame:
    """Pareto / ABC inventory classification (round 6): rank parts by
    revenue, take the running share of total, and bucket into the
    classic A (top 80% of revenue), B (next 15%), C (tail) classes.

    Deterministic by construction: revenue per part is an exact
    DECIMAL(18,2) sum; the A/B/C boundaries are decided by
    CROSS-MULTIPLIED integer comparison (cum*100 <= total*80) on
    cents — no division, no rounding, no float anywhere near the
    classification, so a cumulative share that lands exactly on a
    boundary cannot flip between engines (the r89/r56 lesson
    applied preemptively). The output share is display-only.

    Scale shape: one fact hash-agg to the part dimension, then ONE
    cumulative window over that aggregate — |parts| ≪ |lineitem|;
    whitelisted single-partition of the r84/r89 class with the
    bucketed two-pass (operators/ranking.py) as the documented
    escape hatch when the dimension outgrows a partition."""
    li = t(spark, d, "lineitem")
    per = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("rev")
    )
    # cents as BIGINT: exact, and cum*100 stays far inside 2^63
    per = per.select(
        "l_partkey", (F.col("rev") * 100).cast("bigint").alias("cents")
    )
    tot = per.agg(F.sum("cents").alias("total"))
    w = (
        Window.orderBy(F.desc("cents"), "l_partkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = per.withColumn("cum", F.sum("cents").over(w)).crossJoin(
        F.broadcast(tot)
    )
    classed = ranked.select(
        "l_partkey",
        "cents",
        F.when(F.col("cum") * 100 <= F.col("total") * 80, "A")
        .when(F.col("cum") * 100 <= F.col("total") * 95, "B")
        .otherwise("C")
        .alias("abc"),
        "total",
    )
    return (
        classed.groupBy("abc")
        .agg(
            F.count("*").alias("n_parts"),
            F.round(
                F.sum("cents").cast("double")
                / F.max("total").cast("double"),
                6,
            ).alias("revenue_share"),
        )
        .orderBy("abc")
    )


def r95(spark: SparkSession, d: str) -> DataFrame:
    """Ordered string aggregation (round 12) — the LISTAGG /
    string_agg surface every reporting workload leans on: per
    nation, its customers' DISTINCT market segments concatenated in
    alphabetical order. Determinism is the whole point of the
    spelling: Spark's collect_list is order-nondeterministic, so
    the array is sort_array'd BEFORE the join — matching DuckDB's
    string_agg(... ORDER BY ...) exactly; distinctness comes from
    collect_set semantics via array_distinct after sort (stable on
    a sorted array).

    Scale: the heavy side aggregates per nation BEFORE the
    dimension join (25 rows out), then the nation name broadcasts
    in — never a row-level join followed by a giant regroup."""
    cust = t(spark, d, "customer").select(
        "c_nationkey", "c_mktsegment"
    )
    per_nation = (
        cust.groupBy("c_nationkey")
        .agg(
            F.array_join(
                F.array_distinct(
                    F.sort_array(F.collect_list("c_mktsegment"))
                ),
                ",",
            ).alias("segments"),
            F.countDistinct("c_mktsegment")
            .cast("bigint")
            .alias("n_segments"),
        )
    )
    nation = t(spark, d, "nation").select("n_nationkey", "n_name")
    return (
        per_nation.join(
            F.broadcast(nation),
            per_nation["c_nationkey"] == nation["n_nationkey"],
        )
        .select("n_name", "n_segments", "segments")
        .orderBy("n_name")
    )



QUERIES = {
    "r01_pricing_summary": r1,
    "r02_join5_agg": r2,
    "r03_topk_per_group": r3,
    "r04_group_by_date": r4,
    "r05_semi_join": r5,
    "r06_anti_join": r6,
    "r07_left_join": r7,
    "r08_full_outer_join": r8,
    "r09_cross_join": r9,
    "r10_range_join": r10,
    "r11_rollup": r11,
    "r12_cube": r12,
    "r15_having": r15,
    "r17_union": r17,
    "r17b_union_all": r17b,
    "r18_except": r18,
    "r19_scalar_subquery": r19,
    "r20_in_subquery": r20,
    "r21_case_coalesce": r21,
    "r22_string_funcs": r22,
    "r22b_regex": r22b,
    "r23_date_funcs": r23,
    "r24_math_funcs": r24,
    "r25_analytic_window": r25,
    "r27_ranking_suite": r27,
    "r26_range_frame": r26,
    "r28_pivot_conditional": r28,
    "r28b_pivot_native": r28b,
    "r29_explode_reagg": r29,
    "r30_asof_join": r30,
    "r31_group_percentile": r31,
    "r32_sorted_listagg": r32,
    "r33_interval_arith": r33,
    "r34_window_extras": r34,
    "r35_grouping_sets": r35,
    "r36_unpivot": r36,
    "r37_bit_aggs": r37,
    "r38_q3_shape": r38,
    "r39_q18_shape": r39,
    "r40_bucketed_ranking": r40,
    "r41_recursive_cte": r41,
    "r42_zorder_key": r42,
    "r43_correlated_subquery": r43,
    "r44_q21_sole_late": r44,
    "r45_q22_no_urgent": r45,
    "r46_q13_custdist": r46,
    "r47_upsert_snapshot": r47,
    "r48_q11_shape": r48,
    "r49_q15_shape": r49,
    "r50_dataset_diff": r50,
    "r51_q20_dominant_supplier": r51,
    "r52_q6_scan_only": r52,
    "r53_q4_priority_exists": r53,
    "r54_q7_volume_shipping": r54,
    "r55_q8_market_share": r55,
    "r56_q9_profit": r56,
    "r57_q10_returned_items": r57,
    "r58_q14_promo_effect": r58,
    "r59_q17_small_quantity": r59,
    "r60_q19_disjunctive": r60,
    "r61_q2_min_cost_supplier": r61,
    "r62_q12_priority_split": r62,
    "r63_binned_range_join": r63,
    "r64_gap_fill": r64,
    "r65_time_weighted_avg": r65,
    "r66_funnel": r66,
    "r67_mode": r67,
    "r68_q16_supplier_cnt": r68,
    "r69_asof_tolerance": r69,
    "r70_percentile_disc": r70,
    "r71_dq_audit": r71,
    "r72_histogram": r72,
    "r74_salted_join": r74,
    "r75_filtered_aggs": r75,
    "r76_try_arithmetic": r76,
    "r77_cohort_retention": r77,
    "r85_bitemporal_asof": r85,
    "r86_benford_digits": r86,
    "r87_welch_ttest": r87,
    "r89_rfm_segments": r89,
    "r90_basket_lift": r90,
    "r91_mom_growth": r91,
    "r92_pareto_abc": r92,
    "r94_hilbert_key": r94,
    "r95_string_agg": r95,
    "b04_global_topk": b4,
    "b05_distinct_counts": b5,
    "b07_string_filter_agg": b7,
    "b09_intersect": b9,
}

ORACLE = {
    # r86: leading digit from the STRING of exact integer cents
    # (never floor(log10)); expected mass spelled LN/LN on both
    # engines; counts are integers so obs_p/chi are deterministic.
    "r86_benford_digits": (
        "WITH per AS (SELECT CAST(substr(CAST(CAST("
        "ROUND(o_totalprice*100) AS BIGINT) AS VARCHAR),1,1) AS INT) "
        "digit, COUNT(*) n FROM orders GROUP BY digit), "
        "tot AS (SELECT CAST(SUM(n) AS DOUBLE) n_total FROM per) "
        "SELECT digit, n, ROUND(n/n_total, 6) obs_p, "
        "ROUND(LN(1.0+1.0/digit)/LN(10.0), 6) benford_p, "
        "ROUND(n_total * POW(n/n_total - LN(1.0+1.0/digit)/LN(10.0), 2) "
        "/ (LN(1.0+1.0/digit)/LN(10.0)), 6) chi_contrib "
        "FROM per, tot ORDER BY digit"
    ),
    # r87: moments in exact DECIMAL (2dp money -> 4dp squares), so
    # t/df are order-independent; doubles only in the closed form.
    "r87_welch_ttest": (
        "WITH m AS (SELECT "
        "SUM(CASE WHEN o_orderpriority='1-URGENT' THEN 1 END) n1, "
        "CAST(SUM(CASE WHEN o_orderpriority='1-URGENT' THEN "
        "CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) sx1, "
        "CAST(SUM(CASE WHEN o_orderpriority='1-URGENT' THEN "
        "CAST(o_totalprice AS DECIMAL(18,2)) * "
        "CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) sxx1, "
        "SUM(CASE WHEN o_orderpriority='5-LOW' THEN 1 END) n2, "
        "CAST(SUM(CASE WHEN o_orderpriority='5-LOW' THEN "
        "CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) sx2, "
        "CAST(SUM(CASE WHEN o_orderpriority='5-LOW' THEN "
        "CAST(o_totalprice AS DECIMAL(18,2)) * "
        "CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) sxx2 "
        "FROM orders "
        "WHERE o_orderpriority IN ('1-URGENT','5-LOW')), "
        "v AS (SELECT n1, n2, sx1/n1 m1, sx2/n2 m2, "
        "(sxx1 - sx1*sx1/n1)/(n1-1) v1, "
        "(sxx2 - sx2*sx2/n2)/(n2-1) v2 FROM m) "
        "SELECT CAST(n1 AS BIGINT) n_urgent, CAST(n2 AS BIGINT) n_low, "
        "ROUND(m1, 4) mean_urgent, ROUND(m2, 4) mean_low, "
        "ROUND((m1-m2)/SQRT(v1/n1 + v2/n2), 6) t_stat, "
        "ROUND(POW(v1/n1 + v2/n2, 2) / "
        "(POW(v1/n1, 2)/(n1-1) + POW(v2/n2, 2)/(n2-1)), 4) welch_df "
        "FROM v"
    ),
    # r89: NTILE orders fully tied off with the customer key;
    # monetary in exact DECIMAL; Spark NTILE cast to BIGINT to
    # match DuckDB's; cell stat is the exact sum (no ROUND at all).
    "r89_rfm_segments": (
        "WITH per AS (SELECT o_custkey, "
        "CAST(MAX(o_orderdate) AS DATE) lastd, COUNT(*) freq, "
        "SUM(CAST(o_totalprice AS DECIMAL(18,2))) mon "
        "FROM orders GROUP BY o_custkey), "
        "mx AS (SELECT MAX(lastd) maxd FROM per), "
        "scored AS (SELECT o_custkey, mon, "
        "NTILE(5) OVER (ORDER BY maxd - lastd ASC, o_custkey) r_score, "
        "NTILE(5) OVER (ORDER BY freq DESC, o_custkey) f_score, "
        "NTILE(5) OVER (ORDER BY mon DESC, o_custkey) m_score "
        "FROM per, mx) "
        "SELECT r_score, f_score, m_score, COUNT(*) n_customers, "
        "CAST(SUM(mon) AS DOUBLE) sum_monetary "
        "FROM scored GROUP BY r_score, f_score, m_score "
        "ORDER BY r_score, f_score, m_score"
    ),
    # r90: DISTINCT (basket,item) before every count; a-priori
    # prune at 2% support before the pair join; integer counts.
    # r91: exact decimal monthly sums; growth divides exact doubles
    # (integer cents < 2^53). LAG semantics are row-based in both
    # engines, so a hypothetical missing month shifts both sides
    # identically.
    "r91_mom_growth": (
        # "month" is a DuckDB reserved word (like "day"/"bit") —
        # quoted throughout.
        "WITH m AS (SELECT date_trunc('month', "
        "CAST(o_orderdate AS DATE)) \"month\", "
        "SUM(CAST(o_totalprice AS DECIMAL(18,2))) rev "
        "FROM orders GROUP BY 1), "
        "g AS (SELECT \"month\", CAST(rev AS DOUBLE) revenue, "
        "CAST(LAG(rev, 1) OVER (ORDER BY \"month\") AS DOUBLE) p1, "
        "CAST(LAG(rev, 12) OVER (ORDER BY \"month\") AS DOUBLE) p12 "
        "FROM m) "
        "SELECT \"month\", revenue, "
        "ROUND(100.0*(revenue-p1)/p1, 6) mom_pct, "
        "ROUND(100.0*(revenue-p12)/p12, 6) yoy_pct "
        "FROM g ORDER BY \"month\""
    ),
    # r92: the A/B/C boundaries are cross-multiplied BIGINT
    # comparisons on exact cents — no division in the
    # classification, so boundary cells cannot flip cross-engine.
    # DuckDB windowed SUM returns HUGEINT → CAST to BIGINT.
    "r92_pareto_abc": (
        "WITH per AS (SELECT l_partkey, "
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 "
        "AS BIGINT) cents FROM lineitem GROUP BY 1), "
        "tot AS (SELECT CAST(SUM(cents) AS BIGINT) total FROM per), "
        "ranked AS (SELECT l_partkey, cents, "
        "CAST(SUM(cents) OVER (ORDER BY cents DESC, l_partkey "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
        "AS BIGINT) cum FROM per), "
        "classed AS (SELECT cents, CASE "
        "WHEN cum*100 <= total*80 THEN 'A' "
        "WHEN cum*100 <= total*95 THEN 'B' ELSE 'C' END abc, total "
        "FROM ranked, tot) "
        "SELECT abc, COUNT(*) n_parts, "
        "ROUND(CAST(SUM(cents) AS DOUBLE)/CAST(MAX(total) AS DOUBLE), 6) "
        "revenue_share FROM classed GROUP BY abc ORDER BY abc"
    ),
    "r90_basket_lift": (
        "WITH bi AS (SELECT DISTINCT l_orderkey, l_partkey % 50 item "
        "FROM lineitem), "
        "tot AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) "
        "n_orders FROM bi), "
        "freq AS (SELECT item, COUNT(*) item_n FROM bi GROUP BY item), "
        "kept AS (SELECT item FROM freq, tot "
        "WHERE item_n >= 0.02 * n_orders), "
        "pruned AS (SELECT * FROM bi WHERE item IN "
        "(SELECT item FROM kept)), "
        "co AS (SELECT a.item i, b.item j, COUNT(*) co_n "
        "FROM pruned a JOIN pruned b ON a.l_orderkey = b.l_orderkey "
        "AND a.item < b.item GROUP BY i, j) "
        "SELECT i, j, co_n, "
        "ROUND(co_n / n_orders, 6) support, "
        "ROUND(co_n * 1.0 / fi.item_n, 6) confidence, "
        "ROUND(co_n * n_orders / (fi.item_n * 1.0 * fj.item_n), 6) lift "
        "FROM co JOIN freq fi ON fi.item = co.i "
        "JOIN freq fj ON fj.item = co.j, tot "
        "ORDER BY lift DESC, i, j LIMIT 20"
    ),
    # r85: both temporal cutoffs as scan filters, one window pick;
    # DATE + INTEGER is day arithmetic in DuckDB (Spark date_add).
    "r85_bitemporal_asof": (
        "WITH od AS (SELECT o_custkey, o_orderkey, "
        "CAST(o_orderdate AS DATE) valid_from, "
        "CAST(o_orderdate AS DATE) + CAST(o_orderkey % 30 AS INT) tx_from, "
        "o_totalprice FROM orders), "
        "snap AS (SELECT * FROM od WHERE valid_from <= DATE '1995-06-30' "
        "AND tx_from <= DATE '1996-01-01'), "
        "pick AS (SELECT *, row_number() OVER (PARTITION BY o_custkey "
        "ORDER BY valid_from DESC, o_orderkey DESC) rn FROM snap) "
        "SELECT o_custkey, o_orderkey, valid_from, "
        "ROUND(o_totalprice, 2) price FROM pick WHERE rn = 1 "
        "ORDER BY o_custkey LIMIT 100"
    ),
    "r01_pricing_summary": (
        "SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity),2) sq, "
        "SUM(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT))/CAST(100 AS DOUBLE) sb, "
        "floor((SUM(CAST(floor(l_extendedprice*(1-l_discount)*10000 + 0.5) AS BIGINT)) + 50)/100)/CAST(100 AS DOUBLE) sd, "
        "ROUND(AVG(l_quantity),4) aq, COUNT(*) c "
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"
    ),
    "r02_join5_agg": (
        "SELECT n_name, floor((SUM(CAST(floor(l_extendedprice*(1-l_discount)*10000 + 0.5) AS BIGINT)) + 50)/100)/CAST(100 AS DOUBLE) revenue "
        "FROM customer JOIN orders ON c_custkey=o_custkey "
        "JOIN lineitem ON l_orderkey=o_orderkey "
        "JOIN nation ON c_nationkey=n_nationkey "
        "JOIN region ON n_regionkey=r_regionkey "
        "WHERE r_name='ASIA' GROUP BY n_name ORDER BY revenue DESC, n_name"
    ),
    "r03_topk_per_group": (
        "SELECT o_custkey, o_orderkey, rnk FROM (SELECT o_custkey, o_orderkey, "
        "ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, "
        "o_orderkey) rnk FROM orders) t WHERE rnk<=2 ORDER BY o_custkey, rnk "
        "LIMIT 100"
    ),
    "r04_group_by_date": (
        "SELECT CAST(o_orderdate AS DATE) d, COUNT(*) c FROM orders "
        "GROUP BY 1 ORDER BY 1 LIMIT 50"
    ),
    "r05_semi_join": (
        "SELECT c_custkey FROM customer WHERE EXISTS "
        "(SELECT 1 FROM orders WHERE o_custkey=c_custkey AND o_totalprice>100000) "
        "ORDER BY c_custkey LIMIT 50"
    ),
    "r06_anti_join": (
        "SELECT c_custkey FROM customer WHERE NOT EXISTS "
        "(SELECT 1 FROM orders WHERE o_custkey=c_custkey AND o_totalprice>350000) "
        "ORDER BY c_custkey LIMIT 100"
    ),
    "r07_left_join": (
        "SELECT c_custkey, COUNT(o_orderkey) n FROM customer "
        "LEFT JOIN orders ON c_custkey=o_custkey "
        "GROUP BY c_custkey ORDER BY n DESC, c_custkey LIMIT 100"
    ),
    "r08_full_outer_join": (
        "SELECT COALESCE(a.k, b.k) k, COALESCE(cs,0) cs, COALESCE(ss,0) ss "
        "FROM (SELECT c_nationkey k, COUNT(*) cs FROM customer GROUP BY 1) a "
        "FULL JOIN (SELECT s_nationkey k, COUNT(*) ss FROM supplier GROUP BY 1) b "
        "ON a.k=b.k ORDER BY k"
    ),
    "r09_cross_join": (
        "SELECT r_name, f, COUNT(*) c FROM region CROSS JOIN "
        "(SELECT DISTINCT l_returnflag f FROM lineitem) t "
        "GROUP BY r_name, f ORDER BY r_name, f"
    ),
    "r10_range_join": (
        "SELECT COUNT(*) c FROM orders JOIN lineitem "
        "ON l_orderkey=o_orderkey AND l_shipdate>o_orderdate"
    ),
    "r11_rollup": (
        "SELECT COALESCE(l_returnflag,'ALL') rf, COALESCE(l_linestatus,'ALL') ls, "
        "GROUPING(l_returnflag) g1, GROUPING(l_linestatus) g2, COUNT(*) c, "
        "ROUND(SUM(l_quantity),2) s "
        "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) "
        "ORDER BY rf, ls, g1, g2"
    ),
    "r12_cube": (
        "SELECT COALESCE(o_orderstatus,'ALL') st, COALESCE(o_orderpriority,'ALL') pr, "
        "COUNT(*) c FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority) "
        "ORDER BY st, pr"
    ),
    "r15_having": (
        "SELECT o_custkey, COUNT(*) c FROM orders GROUP BY o_custkey "
        "HAVING COUNT(*)>15 ORDER BY c DESC, o_custkey LIMIT 100"
    ),
    "r17_union": (
        "SELECT k FROM (SELECT c_nationkey k FROM customer "
        "UNION SELECT s_nationkey FROM supplier) t ORDER BY k"
    ),
    "r17b_union_all": (
        "SELECT k, COUNT(*) c FROM (SELECT c_nationkey k FROM customer "
        "UNION ALL SELECT s_nationkey FROM supplier) t GROUP BY k ORDER BY k"
    ),
    "r18_except": (
        "SELECT k FROM (SELECT n_nationkey k FROM nation "
        "EXCEPT SELECT CAST(user_id%20 AS INT) FROM events) t ORDER BY k"
    ),
    "r19_scalar_subquery": (
        "SELECT COUNT(*) c FROM orders WHERE o_totalprice > "
        "(SELECT AVG(o_totalprice) FROM orders)"
    ),
    "r20_in_subquery": (
        "SELECT c_custkey FROM customer WHERE c_nationkey IN "
        "(SELECT n_nationkey FROM nation WHERE n_regionkey=1) "
        "ORDER BY c_custkey LIMIT 100"
    ),
    "r21_case_coalesce": (
        "SELECT o_orderkey, CASE WHEN o_totalprice>200000 THEN 'big' "
        "WHEN o_totalprice>100000 THEN 'mid' ELSE 'small' END b, "
        "COALESCE(NULLIF(o_orderstatus,'O'),'open') s FROM orders "
        "ORDER BY o_orderkey LIMIT 100"
    ),
    "r22_string_funcs": (
        "SELECT p_partkey, UPPER(p_brand) u, LOWER(p_type) l, SUBSTR(p_name,1,8) s, "
        "LENGTH(p_name) n, CONCAT(p_brand,'#',p_type) c, "
        "REPLACE(p_brand,'Brand','B') r, TRIM(p_name) t, "
        "LPAD(CAST(p_size AS VARCHAR),4,'0') lp "
        "FROM part ORDER BY p_partkey LIMIT 100"
    ),
    "r22b_regex": (
        "SELECT p_partkey, regexp_extract(p_type, '([A-Z]+)', 1) m, "
        "(CASE WHEN regexp_matches(p_name,'[aeiou]{2}') THEN 1 ELSE 0 END) has2 "
        "FROM part ORDER BY p_partkey LIMIT 100"
    ),
    "r23_date_funcs": (
        "SELECT o_orderkey, EXTRACT(YEAR FROM o_orderdate) y, "
        "EXTRACT(MONTH FROM o_orderdate) m, EXTRACT(DAY FROM o_orderdate) d, "
        "CAST(date_trunc('month', o_orderdate) AS DATE) mt, "
        "date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') dd "
        "FROM orders ORDER BY o_orderkey LIMIT 100"
    ),
    "r24_math_funcs": (
        "SELECT l_orderkey, l_linenumber, ROUND(POWER(l_quantity,2),4) p, "
        "ROUND(LN(l_extendedprice),6) ln_, ROUND(LOG10(l_extendedprice),6) lg, "
        "MOD(CAST(l_quantity AS INT),7) md, GREATEST(l_tax,l_discount) g, "
        "LEAST(l_tax,l_discount) le "
        "FROM lineitem ORDER BY l_orderkey, l_linenumber, p, ln_, lg, md, g, le "
        "LIMIT 100"
    ),
    "r25_analytic_window": (
        "SELECT o_custkey, o_orderkey, LAG(o_totalprice) OVER w lg, "
        "LEAD(o_totalprice) OVER w ld, "
        "ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey "
        "ORDER BY o_orderdate, o_orderkey "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) run, "
        "FIRST_VALUE(o_orderkey) OVER w fv "
        "FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, "
        "o_orderkey) ORDER BY o_custkey, o_orderkey LIMIT 100"
    ),
    "r27_ranking_suite": (
        "SELECT o_orderkey, RANK() OVER w r, DENSE_RANK() OVER w dr, "
        "NTILE(4) OVER w nt, ROUND(PERCENT_RANK() OVER w,6) pr "
        "FROM orders WINDOW w AS (ORDER BY o_totalprice DESC, o_orderkey) "
        "ORDER BY o_orderkey LIMIT 100"
    ),
    "r40_bucketed_ranking": (
        # the oracle is the NAIVE global-window spelling — r40's
        # bucketed two-pass plan must reproduce it exactly
        "SELECT o_orderkey, RANK() OVER w r, DENSE_RANK() OVER w dr, "
        "NTILE(4) OVER w nt, ROUND(PERCENT_RANK() OVER w,6) pr, "
        "ROUND(CUME_DIST() OVER w,6) cd "
        "FROM orders WINDOW w AS (ORDER BY o_totalprice DESC, o_orderkey) "
        "ORDER BY o_orderkey LIMIT 100"
    ),
    # r26: deterministic 1% key sample (see builder docstring — the
    # full-table global RANGE frame is the one spelling that cannot
    # survive 100×).
    "r26_range_frame": (
        "SELECT o_orderkey, COUNT(*) OVER "
        "(ORDER BY o_totalprice RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) nw, "
        "ROUND(SUM(o_totalprice) OVER "
        "(ORDER BY o_totalprice RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW),2) sw "
        "FROM orders WHERE o_orderkey % 100 = 0 "
        "ORDER BY o_orderkey LIMIT 100"
    ),
    "r30_asof_join": (
        "SELECT user_id, COUNT(*) n, "
        "ROUND(AVG(CAST(FLOOR(epoch(ts)) AS BIGINT)"
        "-CAST(FLOOR(epoch(pts)) AS BIGINT)),3) g "
        "FROM (SELECT a.user_id, a.ts, b.ts pts "
        "FROM events a ASOF JOIN "
        "(SELECT user_id u2, ts FROM events WHERE event_type='purchase') b "
        "ON a.user_id=b.u2 AND b.ts <= a.ts) t "
        "GROUP BY user_id ORDER BY user_id LIMIT 50"
    ),
    # CAST(SUM(..) AS BIGINT): DuckDB SUM(int)→HUGEINT materializes as
    # float64 in pandas while Spark SUM→LONG; values identical, dtype
    # diverged (r1 driver hash fail). tests/test_dtypes.py pins parity.
    "r28_pivot_conditional": (
        "SELECT o_custkey, "
        "CAST(SUM(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS BIGINT) o, "
        "CAST(SUM(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) f, "
        "CAST(SUM(CASE WHEN o_orderstatus='P' THEN 1 ELSE 0 END) AS BIGINT) p "
        "FROM orders GROUP BY o_custkey ORDER BY o_custkey LIMIT 100"
    ),
    "r28b_pivot_native": (
        "SELECT o_custkey, "
        "CAST(SUM(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS BIGINT) o, "
        "CAST(SUM(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) f, "
        "CAST(SUM(CASE WHEN o_orderstatus='P' THEN 1 ELSE 0 END) AS BIGINT) p "
        "FROM orders GROUP BY o_custkey ORDER BY o_custkey LIMIT 100"
    ),
    "r29_explode_reagg": (
        "SELECT vec_id, COUNT(*) n, ROUND(SUM(e*e),4) ss "
        "FROM (SELECT vec_id, UNNEST(embedding) e FROM embeddings) t "
        "GROUP BY vec_id ORDER BY vec_id LIMIT 100"
    ),
    "r31_group_percentile": (
        "SELECT l_returnflag, ROUND(quantile_cont(l_quantity,0.5),6) m, "
        "ROUND(quantile_cont(l_extendedprice,0.9),4) p90 "
        "FROM lineitem GROUP BY 1 ORDER BY 1"
    ),
    "r32_sorted_listagg": (
        "SELECT s_nationkey, array_to_string(list_sort(list(s_name)), ',') "
        "AS names FROM supplier GROUP BY 1 ORDER BY 1"
    ),
    "r33_interval_arith": (
        "SELECT o_orderkey, CAST(o_orderdate + INTERVAL 30 DAY AS DATE) d30, "
        "CAST(date_trunc('week', o_orderdate) AS DATE) wk "
        "FROM orders ORDER BY o_orderkey LIMIT 50"
    ),
    "r34_window_extras": (
        "SELECT o_orderkey, ROUND(CUME_DIST() OVER w,6) cd, "
        "NTH_VALUE(o_orderkey,3) OVER (ORDER BY o_totalprice DESC, o_orderkey "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) nv "
        "FROM orders WINDOW w AS (ORDER BY o_totalprice DESC, o_orderkey) "
        "ORDER BY o_orderkey LIMIT 100"
    ),
    "r35_grouping_sets": (
        "SELECT COALESCE(l_returnflag,'ALL') rf, COALESCE(l_linestatus,'ALL') ls, "
        "COUNT(*) c FROM lineitem "
        "GROUP BY GROUPING SETS ((l_returnflag),(l_linestatus),()) ORDER BY rf, ls"
    ),
    "r36_unpivot": (
        "SELECT l_orderkey, l_linenumber, name, ROUND(value,4) v FROM "
        "(SELECT l_orderkey, l_linenumber, l_discount, l_tax FROM lineitem) "
        "UNPIVOT (value FOR name IN (l_discount, l_tax)) "
        "ORDER BY l_orderkey, l_linenumber, name, v LIMIT 100"
    ),
    "r37_bit_aggs": (
        "SELECT bit_and(CAST(l_quantity AS BIGINT)) ba, "
        "bit_or(CAST(l_quantity AS BIGINT)) bo, "
        "bit_xor(CAST(l_linenumber AS BIGINT)) bx FROM lineitem"
    ),
    "r38_q3_shape": (
        "SELECT o_orderkey, CAST(ROUND(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))),2) AS DOUBLE) rev, "
        "CAST(o_orderdate AS DATE) od "
        "FROM customer JOIN orders ON c_custkey=o_custkey "
        "JOIN lineitem ON l_orderkey=o_orderkey "
        "WHERE c_mktsegment='BUILDING' AND o_orderdate < TIMESTAMP '1995-03-15' "
        "AND l_shipdate > TIMESTAMP '1995-03-15' "
        "GROUP BY o_orderkey, o_orderdate ORDER BY rev DESC, o_orderkey LIMIT 10"
    ),
    "r39_q18_shape": (
        "SELECT o_orderkey, ROUND(o_totalprice,2) tp FROM orders "
        "WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem "
        "GROUP BY l_orderkey HAVING SUM(l_quantity) > 180) "
        "ORDER BY o_orderkey LIMIT 100"
    ),
    "r41_recursive_cte": (
        "WITH RECURSIVE spine(mon) AS ("
        "SELECT DATE '1994-01-01' UNION ALL "
        "SELECT CAST(mon + INTERVAL 1 MONTH AS DATE) FROM spine "
        "WHERE mon < DATE '1995-12-01'), "
        "m AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) mon, "
        "COUNT(o_orderkey) n_orders, ROUND(SUM(o_totalprice),2) rev "
        "FROM orders GROUP BY 1) "
        "SELECT s.mon, COALESCE(m.n_orders, 0) AS n_orders, "
        "COALESCE(m.rev, 0.0) AS rev "
        "FROM spine s LEFT JOIN m ON m.mon = s.mon ORDER BY s.mon"
    ),
    # correlated form on the oracle side — proves the explicit
    # decorrelation in the builder is semantics-identical
    "r43_correlated_subquery": (
        "SELECT ROUND(SUM(l_extendedprice)/7.0, 2) avg_yearly, COUNT(*) n "
        "FROM lineitem l1 WHERE l_quantity < ("
        "SELECT 0.2*AVG(l_quantity) FROM lineitem l2 "
        "WHERE l2.l_partkey = l1.l_partkey)"
    ),
    # correlated EXISTS/NOT EXISTS on the oracle side vs explicit
    # semi/anti joins in the builder — same decorrelation-identity
    # check as r43
    "r44_q21_sole_late": (
        "SELECT s_name, COUNT(*) numwait "
        "FROM lineitem l1 JOIN orders o ON l1.l_orderkey=o.o_orderkey "
        "JOIN supplier ON l1.l_suppkey=s_suppkey "
        "WHERE o.o_orderstatus='F' "
        "AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY "
        "AND EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey=l1.l_orderkey "
        "AND l2.l_suppkey<>l1.l_suppkey) "
        "AND NOT EXISTS (SELECT 1 FROM lineitem l3 WHERE l3.l_orderkey=l1.l_orderkey "
        "AND l3.l_suppkey<>l1.l_suppkey "
        "AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) "
        "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20"
    ),
    "r45_q22_no_urgent": (
        "SELECT c_nationkey nk, COUNT(*) numcust, ROUND(SUM(c_acctbal),2) tot "
        "FROM customer c "
        "WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer "
        "WHERE c_acctbal > 0.0) "
        "AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey=c.c_custkey "
        "AND o.o_orderpriority='1-URGENT') "
        "GROUP BY nk ORDER BY nk"
    ),
    "r46_q13_custdist": (
        "SELECT c_count, COUNT(*) custdist FROM ("
        "SELECT c_custkey, COUNT(o_orderkey) c_count FROM customer "
        "LEFT JOIN (SELECT * FROM orders WHERE o_orderpriority <> '1-URGENT') o "
        "ON c_custkey=o_custkey GROUP BY c_custkey) t "
        "GROUP BY c_count ORDER BY custdist DESC, c_count DESC"
    ),
    "r47_upsert_snapshot": (
        "WITH b AS (SELECT o_orderkey, o_totalprice, o_orderstatus, 1 v "
        "FROM orders), "
        "u AS (SELECT o_orderkey, "
        "CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)) "
        "* CAST(1.1 AS DECIMAL(3,2)), 2) AS DOUBLE) o_totalprice, "
        "'U' o_orderstatus, 2 v FROM orders WHERE o_orderkey%10=3 "
        "UNION ALL SELECT o_orderkey+100000000, o_totalprice, 'N', 2 "
        "FROM orders WHERE o_orderkey%10=4), "
        "m AS (SELECT * FROM b UNION ALL SELECT * FROM u), "
        "r AS (SELECT o_orderkey, arg_max(o_totalprice, v) o_totalprice, "
        "arg_max(o_orderstatus, v) o_orderstatus, MAX(v) v "
        "FROM m GROUP BY o_orderkey) "
        "SELECT o_orderkey, o_totalprice, o_orderstatus, v FROM r "
        "WHERE o_orderkey%10 IN (3,4) OR o_orderkey<100 "
        "ORDER BY o_orderkey LIMIT 100"
    ),
    "r48_q11_shape": (
        "SELECT o_custkey, CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))),2) AS DOUBLE) tot FROM orders "
        "GROUP BY o_custkey "
        "HAVING CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)*0.001 FROM orders) "
        "ORDER BY tot DESC, o_custkey LIMIT 100"
    ),
    "r49_q15_shape": (
        "WITH rev AS (SELECT l_suppkey, "
        "ROUND(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))),2) total_rev FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY l_suppkey) "
        "SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) total_rev FROM rev "
        "JOIN supplier ON l_suppkey=s_suppkey "
        "WHERE total_rev = (SELECT MAX(total_rev) FROM rev) ORDER BY s_suppkey"
    ),
    # the Spark side classifies via per-engine md5 content hashes;
    # the oracle compares columns directly — equivalent, since only
    # same-engine hash (in)equality matters, never the hash value
    "r50_dataset_diff": (
        "WITH o AS (SELECT o_orderkey, o_totalprice, o_orderstatus "
        "FROM orders), "
        "n AS (SELECT o_orderkey, CASE WHEN o_orderkey%7=0 "
        "THEN ROUND(o_totalprice+1.0,2) ELSE o_totalprice END o_totalprice, "
        "o_orderstatus FROM o WHERE o_orderkey%11<>0 "
        "UNION ALL SELECT o_orderkey+100000000, o_totalprice, o_orderstatus "
        "FROM o WHERE o_orderkey%13=0), "
        "j AS (SELECT a.o_orderkey ak, b.o_orderkey bk, "
        "a.o_totalprice ap, b.o_totalprice bp, "
        "a.o_orderstatus s1, b.o_orderstatus s2 "
        "FROM o a FULL JOIN n b ON a.o_orderkey=b.o_orderkey) "
        "SELECT CASE WHEN ak IS NULL THEN 'added' "
        "WHEN bk IS NULL THEN 'removed' "
        "WHEN ap<>bp OR s1<>s2 THEN 'changed' ELSE 'unchanged' END status, "
        "COUNT(*) n FROM j GROUP BY 1 ORDER BY 1"
    ),
    "r51_q20_dominant_supplier": (
        "WITH ps AS (SELECT l_partkey, l_suppkey, SUM(l_quantity) sq "
        "FROM lineitem GROUP BY 1, 2), "
        "pt AS (SELECT l_partkey, SUM(sq) tq, COUNT(*) ns, "
        "MAX({'sq': sq, 'sk': l_suppkey}) m FROM ps GROUP BY 1) "
        "SELECT l_partkey, struct_extract(m,'sk') s_suppkey, "
        'ROUND(struct_extract(m,\'sq\')/tq, 6) AS "share" '
        "FROM pt WHERE struct_extract(m,'sq') > 2.0*tq/ns "
        'ORDER BY "share" DESC, l_partkey LIMIT 100'
    ),
    "r52_q6_scan_only": (
        "SELECT ROUND(SUM(l_extendedprice*l_discount),2) revenue "
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l_shipdate < TIMESTAMP '1997-01-01' "
        "AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24"
    ),
    "r53_q4_priority_exists": (
        "SELECT o_orderpriority, COUNT(*) order_count FROM orders "
        "WHERE o_orderdate >= TIMESTAMP '1996-01-01' "
        "AND o_orderdate < TIMESTAMP '1996-04-01' "
        "AND EXISTS (SELECT 1 FROM lineitem "
        "WHERE l_orderkey=o_orderkey AND l_quantity>45) "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"
    ),
    "r54_q7_volume_shipping": (
        "SELECT n1.n_name supp_nation, n2.n_name cust_nation, "
        "CAST(YEAR(l_shipdate) AS INT) l_year, "
        "CAST(ROUND(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))),2) AS DOUBLE) revenue "
        "FROM lineitem JOIN supplier ON s_suppkey=l_suppkey "
        "JOIN orders ON o_orderkey=l_orderkey "
        "JOIN customer ON c_custkey=o_custkey "
        "JOIN nation n1 ON s_nationkey=n1.n_nationkey "
        "JOIN nation n2 ON c_nationkey=n2.n_nationkey "
        "WHERE n1.n_name IN ('NATION_1','NATION_2') "
        "AND n2.n_name IN ('NATION_1','NATION_2') "
        "AND n1.n_name <> n2.n_name "
        "AND l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l_shipdate < TIMESTAMP '1998-01-01' "
        "GROUP BY 1,2,3 ORDER BY 1,2,3"
    ),
    "r55_q8_market_share": (
        "SELECT CAST(YEAR(o_orderdate) AS INT) o_year, "
        "CAST(ROUND(CAST(CAST(SUM(CASE WHEN sn.n_name='NATION_3' "
        "THEN CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4)) "
        "ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)"
        "/CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) "
        "AS DECIMAL(18,10)), 6) AS DOUBLE) mkt_share "
        "FROM lineitem JOIN part ON p_partkey=l_partkey "
        "JOIN supplier ON s_suppkey=l_suppkey "
        "JOIN nation sn ON s_nationkey=sn.n_nationkey "
        "JOIN orders ON o_orderkey=l_orderkey "
        "JOIN customer ON c_custkey=o_custkey "
        "JOIN nation cn ON c_nationkey=cn.n_nationkey "
        "JOIN region ON cn.n_regionkey=r_regionkey "
        "WHERE p_type='PROMO' AND r_name='ASIA' "
        "AND o_orderdate >= TIMESTAMP '1996-01-01' "
        "AND o_orderdate < TIMESTAMP '1998-01-01' "
        "GROUP BY 1 ORDER BY 1"
    ),
    "r56_q9_profit": (
        "SELECT n_name nation, CAST(YEAR(o_orderdate) AS INT) o_year, "
        "CAST(SUM(CAST(l_extendedprice*(1-l_discount) "
        "- p_retailprice*l_quantity/100.0 AS DECIMAL(18,4))) AS DOUBLE) "
        "sum_profit "
        "FROM lineitem JOIN part ON p_partkey=l_partkey "
        "JOIN supplier ON s_suppkey=l_suppkey "
        "JOIN nation ON s_nationkey=n_nationkey "
        "JOIN orders ON o_orderkey=l_orderkey "
        "WHERE p_name LIKE '%red%' "
        "GROUP BY 1,2 ORDER BY nation, o_year DESC"
    ),
    "r57_q10_returned_items": (
        "SELECT c_custkey, c_name, "
        "CAST(ROUND(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))),2) AS DOUBLE) revenue, "
        "c_acctbal, n_name "
        "FROM customer JOIN orders ON o_custkey=c_custkey "
        "JOIN lineitem ON l_orderkey=o_orderkey "
        "JOIN nation ON c_nationkey=n_nationkey "
        "WHERE l_returnflag='R' "
        "AND o_orderdate >= TIMESTAMP '1996-07-01' "
        "AND o_orderdate < TIMESTAMP '1996-10-01' "
        "GROUP BY c_custkey, c_name, c_acctbal, n_name "
        "ORDER BY revenue DESC, c_custkey LIMIT 20"
    ),
    "r58_q14_promo_effect": (
        "SELECT CAST(ROUND(CAST(100.0*CAST(SUM(CASE WHEN p_type='PROMO' "
        "THEN CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4)) "
        "ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)"
        "/CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) "
        "AS DECIMAL(18,10)), 4) AS DOUBLE) promo_revenue "
        "FROM lineitem JOIN part ON p_partkey=l_partkey "
        "WHERE l_shipdate >= TIMESTAMP '1996-09-01' "
        "AND l_shipdate < TIMESTAMP '1996-10-01'"
    ),
    "r59_q17_small_quantity": (
        "SELECT CAST(ROUND(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/7.0 AS DECIMAL(28,8)), 2) AS DOUBLE) avg_yearly "
        "FROM lineitem JOIN part ON p_partkey=l_partkey "
        "WHERE p_brand='Brand#3' AND l_quantity < "
        "(SELECT 0.2*AVG(l2.l_quantity) FROM lineitem l2 "
        "WHERE l2.l_partkey=p_partkey)"
    ),
    "r60_q19_disjunctive": (
        "SELECT CAST(ROUND(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))),2) AS DOUBLE) revenue "
        "FROM lineitem JOIN part ON p_partkey=l_partkey WHERE "
        "(p_brand='Brand#1' AND p_size BETWEEN 1 AND 15 "
        "AND l_quantity BETWEEN 1 AND 11) "
        "OR (p_brand='Brand#2' AND p_size BETWEEN 10 AND 25 "
        "AND l_quantity BETWEEN 10 AND 20) "
        "OR (p_brand='Brand#3' AND p_size BETWEEN 20 AND 40 "
        "AND l_quantity BETWEEN 20 AND 30)"
    ),
    "r61_q2_min_cost_supplier": (
        "WITH cost AS (SELECT l_partkey, p_name, l_suppkey, "
        "MIN(CAST(FLOOR(l_extendedprice/l_quantity*10000) AS BIGINT))"
        "/CAST(10000.0 AS DOUBLE) unit_cost "
        "FROM lineitem JOIN part ON p_partkey=l_partkey "
        "WHERE p_size=10 AND p_type='SMALL' GROUP BY 1,2,3), "
        "best AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY l_partkey "
        "ORDER BY unit_cost, l_suppkey) rn FROM cost) "
        "SELECT l_partkey, p_name, s_name, n_name, unit_cost "
        "FROM best JOIN supplier ON s_suppkey=l_suppkey "
        "JOIN nation ON s_nationkey=n_nationkey "
        "WHERE rn=1 ORDER BY unit_cost, l_partkey LIMIT 50"
    ),
    "r63_binned_range_join": (
        "SELECT o_orderpriority, COUNT(*) pairs FROM lineitem, orders "
        "WHERE (CAST(l_shipdate AS DATE) - DATE '1970-01-01') "
        ">= (CAST(o_orderdate AS DATE) - DATE '1970-01-01') "
        "AND (CAST(l_shipdate AS DATE) - DATE '1970-01-01') "
        "< (CAST(o_orderdate AS DATE) - DATE '1970-01-01') + 7 "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"
    ),
    "r62_q12_priority_split": (
        "SELECT l_linestatus, "
        "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') "
        "THEN 1 ELSE 0 END) AS BIGINT) high_line_count, "
        "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') "
        "THEN 0 ELSE 1 END) AS BIGINT) low_line_count "
        "FROM lineitem JOIN orders ON o_orderkey=l_orderkey "
        "WHERE l_shipdate >= TIMESTAMP '1997-01-01' "
        "AND l_shipdate < TIMESTAMP '1998-01-01' "
        "GROUP BY l_linestatus ORDER BY l_linestatus"
    ),
    "r42_zorder_key": (
        "SELECT p_partkey, {zv} AS zv FROM (SELECT p_partkey, "
        "CAST(p_partkey % 256 AS BIGINT) x, CAST(p_size AS BIGINT) y "
        "FROM part) ORDER BY zv, p_partkey LIMIT 100"
    ),
    "r64_gap_fill": (
        "WITH ev AS (SELECT * FROM events WHERE user_id < 5 "
        "AND ts < TIMESTAMP '2024-01-02'), "
        "hourly AS (SELECT user_id, h, ROUND(v, 2) v FROM ("
        "SELECT user_id, date_trunc('hour', ts) h, value v, "
        "ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts) "
        "ORDER BY ts DESC, event_id DESC) rn FROM ev) WHERE rn = 1), "
        "bounds AS (SELECT user_id, date_trunc('hour', MIN(ts)) h0, "
        "date_trunc('hour', MAX(ts)) h1 FROM ev GROUP BY user_id), "
        "spine AS (SELECT user_id, unnest(generate_series(h0, h1, "
        "INTERVAL 1 HOUR)) h FROM bounds), "
        "j AS (SELECT s.user_id, s.h, hourly.v FROM spine s "
        "LEFT JOIN hourly ON s.user_id = hourly.user_id AND s.h = hourly.h) "
        "SELECT user_id, h, LAST_VALUE(v IGNORE NULLS) OVER "
        "(PARTITION BY user_id ORDER BY h "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) v_fill "
        "FROM j ORDER BY user_id, h LIMIT 100"
    ),
    "r65_time_weighted_avg": (
        "WITH x AS (SELECT user_id, value, epoch_us(ts) us, "
        "LEAD(epoch_us(ts)) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) nus FROM events) "
        "SELECT user_id, COUNT(*) n_seg, "
        "ROUND(SUM(value*(nus-us))/SUM(nus-us), 4) twa "
        "FROM x WHERE nus IS NOT NULL "
        "GROUP BY user_id ORDER BY user_id"
    ),
    "r66_funnel": (
        "WITH s AS (SELECT user_id, MIN(ts) t1 FROM events "
        "WHERE event_type='signup' GROUP BY user_id), "
        "c AS (SELECT e.user_id, MIN(e.ts) t2 FROM events e "
        "JOIN s ON e.user_id = s.user_id "
        "WHERE e.event_type='click' AND e.ts > s.t1 "
        "AND e.ts <= s.t1 + INTERVAL 24 HOURS GROUP BY e.user_id), "
        "p AS (SELECT e.user_id, MIN(e.ts) t3 FROM events e "
        "JOIN c ON e.user_id = c.user_id "
        "WHERE e.event_type='purchase' AND e.ts > c.t2 "
        "AND e.ts <= c.t2 + INTERVAL 24 HOURS GROUP BY e.user_id) "
        "SELECT (SELECT COUNT(*) FROM s) stage_signup, "
        "(SELECT COUNT(*) FROM c) stage_click, "
        "(SELECT COUNT(*) FROM p) stage_purchase"
    ),
    "r77_cohort_retention": (
        "WITH f AS (SELECT user_id, CAST(MIN(ts) AS DATE) cohort "
        "FROM events GROUP BY user_id), "
        "a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) d "
        "FROM events) "
        "SELECT cohort, date_diff('day', cohort, d) \"offset\", "
        "COUNT(DISTINCT user_id) users "
        "FROM a JOIN f USING (user_id) "
        "GROUP BY cohort, \"offset\" ORDER BY cohort, \"offset\" "
        "LIMIT 100"
    ),
    "r76_try_arithmetic": (
        "SELECT l_returnflag, "
        "COUNT(CASE WHEN l_discount = 0 THEN 1 END) zero_disc, "
        "ROUND(SUM(CASE WHEN l_discount <> 0 "
        "THEN l_extendedprice / l_discount END), 2) ratio_sum, "
        "COUNT(TRY_CAST(CASE WHEN l_linenumber % 2 = 0 "
        "THEN CAST(l_quantity AS VARCHAR) ELSE l_returnflag END "
        "AS DOUBLE)) parsed "
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    "r75_filtered_aggs": (
        "SELECT l_returnflag, "
        "COUNT(*) FILTER (WHERE l_quantity > 25) big, "
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) "
        "FILTER (WHERE l_discount > 0.05) AS DOUBLE) disc_rev, "
        "ROUND(AVG(l_quantity) FILTER (WHERE l_tax = 0.0), 4) notax_q "
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    "r74_salted_join": (
        "SELECT o_orderpriority, ROUND(SUM(l_quantity),2) qty, "
        "COUNT(*) n FROM lineitem JOIN orders "
        "ON l_orderkey = o_orderkey "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"
    ),
    "r72_histogram": (
        "SELECT CAST(LEAST(19, CAST(FLOOR(l_extendedprice/5000) AS INT)) "
        "AS BIGINT) bucket, COUNT(*) n, "
        "ROUND(MIN(l_extendedprice), 2) lo, "
        "ROUND(MAX(l_extendedprice), 2) hi "
        "FROM lineitem GROUP BY 1 ORDER BY bucket"
    ),
    "r71_dq_audit": (
        "SELECT (SELECT COUNT(*) FROM lineitem) n_rows, "
        "(SELECT COUNT(*) FROM lineitem WHERE l_orderkey NOT IN "
        "(SELECT o_orderkey FROM orders)) n_orphans, "
        "(SELECT CAST(COALESCE(SUM(c - 1), 0) AS BIGINT) FROM "
        "(SELECT COUNT(*) c FROM orders GROUP BY o_orderkey) "
        "WHERE c > 1) n_dup_dim_keys, "
        "(SELECT CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 "
        "END) AS BIGINT) FROM lineitem) nulls_l_shipdate, "
        "(SELECT CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 "
        "END) AS BIGINT) FROM lineitem) nulls_l_quantity, "
        "(SELECT CAST(SUM(CASE WHEN l_extendedprice IS NULL THEN 1 "
        "ELSE 0 END) AS BIGINT) FROM lineitem) nulls_l_extendedprice"
    ),
    "r70_percentile_disc": (
        "SELECT l_returnflag, "
        "percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice) "
        "disc50, "
        "percentile_disc(0.75) WITHIN GROUP (ORDER BY l_extendedprice) "
        "disc75, "
        "ROUND(percentile_cont(0.5) WITHIN GROUP "
        "(ORDER BY l_extendedprice), 4) cont50, "
        "ROUND(percentile_cont(0.75) WITHIN GROUP "
        "(ORDER BY l_extendedprice), 4) cont75 "
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    "r69_asof_tolerance": (
        "WITH c AS (SELECT user_id, ts, event_id FROM events "
        "WHERE event_type='click'), "
        "e AS (SELECT user_id, ts FROM events WHERE event_type='error'), "
        "m AS (SELECT c.user_id, c.ts, "
        "(SELECT MAX(e.ts) FROM e WHERE e.user_id = c.user_id "
        "AND e.ts <= c.ts "
        "AND e.ts >= c.ts - INTERVAL 30 MINUTES) m_ts FROM c) "
        "SELECT user_id, COUNT(*) n_matched, "
        "ROUND(AVG(CAST(FLOOR(epoch(ts)) AS BIGINT) "
        "- CAST(FLOOR(epoch(m_ts)) AS BIGINT)), 3) avg_gap "
        "FROM m WHERE m_ts IS NOT NULL "
        "GROUP BY user_id ORDER BY user_id LIMIT 100"
    ),
    "r68_q16_supplier_cnt": (
        "SELECT p_brand, p_type, p_size, "
        "COUNT(DISTINCT l_suppkey) supplier_cnt "
        "FROM lineitem JOIN part ON p_partkey = l_partkey "
        "WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%' "
        "AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45) "
        "AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier "
        "WHERE s_acctbal < 0) "
        "GROUP BY 1, 2, 3 "
        "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 50"
    ),
    "r67_mode": (
        "WITH cnt AS (SELECT l_returnflag, l_quantity, COUNT(*) c "
        "FROM lineitem GROUP BY 1, 2), "
        "r AS (SELECT l_returnflag, l_quantity, c, ROW_NUMBER() OVER "
        "(PARTITION BY l_returnflag ORDER BY c DESC, l_quantity) rn "
        "FROM cnt) "
        "SELECT l_returnflag, l_quantity mode_qty, c freq FROM r "
        "WHERE rn = 1 ORDER BY l_returnflag"
    ),
    "b04_global_topk": (
        "SELECT l_orderkey, l_extendedprice FROM lineitem "
        "ORDER BY l_extendedprice DESC, l_orderkey, l_extendedprice LIMIT 10"
    ),
    "b05_distinct_counts": (
        "SELECT COUNT(DISTINCT l_partkey) c1, COUNT(DISTINCT l_suppkey) c2 "
        "FROM lineitem"
    ),
    "b07_string_filter_agg": (
        "SELECT lang, COUNT(*) c, "
        "CAST(SUM(CASE WHEN text LIKE '%join%' THEN 1 ELSE 0 END) AS BIGINT) j "
        "FROM documents GROUP BY lang ORDER BY lang"
    ),
    "b09_intersect": (
        "SELECT c FROM (SELECT l_partkey c FROM lineitem "
        "INTERSECT SELECT p_partkey FROM part) t ORDER BY c LIMIT 5"
    ),
}

# r42's oracle replays the exact generated z-value expression the
# Spark builder uses — one source of truth for the Morton kernel.
from zappy_spark.operators.layout import zvalue_sql as _zvalue_sql  # noqa: E402

ORACLE["r42_zorder_key"] = ORACLE["r42_zorder_key"].format(
    zv=_zvalue_sql(["x", "y"], bits=[8, 6])
)


def _r94_oracle(bits: int = 8) -> str:
    """Nested-subquery replay of the generated Hilbert transform —
    the same hilbert_level_exprs text the Spark builder projects,
    one subquery per bit level (linear text, no alias-resolution
    dependence: every level reads only its FROM row)."""
    from zappy_spark.operators.layout import hilbert_level_exprs

    sql = (
        "(SELECT p_partkey, CAST(0 AS BIGINT) hd, "
        "CAST(p_partkey % 256 AS BIGINT) hx, "
        "CAST(p_size AS BIGINT) hy FROM part)"
    )
    for hd, hx, hy in hilbert_level_exprs(bits):
        sql = (
            f"(SELECT p_partkey, {hd} AS hd, {hx} AS hx, {hy} AS hy "
            f"FROM {sql})"
        )
    return (
        f"SELECT p_partkey, hd AS hv FROM {sql} "
        "ORDER BY hv, p_partkey LIMIT 100"
    )


ORACLE["r94_hilbert_key"] = _r94_oracle(8)

ORACLE["r95_string_agg"] = (
    # identical ordered-distinct spelling: DISTINCT segments per
    # nation concatenated ORDER BY value — determinism is the point
    "WITH per AS (SELECT c_nationkey, "
    "string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) "
    "segments, "
    "CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) n_segments "
    "FROM customer GROUP BY 1) "
    "SELECT n_name, n_segments, segments FROM per "
    "JOIN nation ON n_nationkey = c_nationkey ORDER BY n_name"
)
