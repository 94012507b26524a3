"""Property-style tests (SURVEY §5.2 items 4/6): mapInPandas parity
with native plans (the zappy escape hatch), approx aggregates vs
exact, map-type round-trips, canonicalizer robustness."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from zappy_spark.canon import canon_rows


def _hash_df(df):
    import hashlib

    return hashlib.sha256(
        canon_rows([tuple(r) for r in df.collect()]).encode()
    ).hexdigest()[:12]


def test_mapinpandas_matches_native_sum(spark):
    """Z1 re-implemented as arbitrary-pandas-per-partition (zappy's
    per-chunk numpy pattern) must hash-match the native agg."""
    from zappy_spark.queries.zappy_ops import z1

    native = z1(spark, SF_DIR)

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")

    def partial(batches):
        q = e = 0.0
        for pdf in batches:
            q += pdf["l_quantity"].sum()
            e += pdf["l_extendedprice"].sum()
        yield pd.DataFrame({"q": [q], "e": [e]})

    via_udf = (
        li.select("l_quantity", "l_extendedprice")
        .mapInPandas(partial, schema="q double, e double")
        .agg(
            F.round(F.sum("q"), 2).alias("a"),
            F.round(F.sum("e"), 2).alias("b"),
        )
    )
    assert _hash_df(via_udf) == _hash_df(native)


def test_mapinpandas_matches_native_rowsum(spark):
    """Z5 (axis=1 reduce) via mapInPandas vs the lambda-expression
    plan."""
    from zappy_spark.queries.zappy_ops import z5

    native = z5(spark, SF_DIR)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    def rowsum(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "s": pdf["embedding"].map(
                        lambda v: round(float(sum(float(x) for x in v)), 4)
                    ),
                }
            )

    via_udf = (
        emb.mapInPandas(rowsum, schema="vec_id long, s double")
        .orderBy("vec_id")
        .limit(100)
    )
    assert _hash_df(via_udf) == _hash_df(native)


def test_approx_count_distinct_within_5pct(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    row = li.agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey").alias("approx"),
    ).first()
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05


def test_approx_percentile_close_to_exact(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    row = li.agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("exact"),
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000)).alias(
            "approx"
        ),
    ).first()
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.01


def test_map_type_round_trip(spark):
    """props JSON → map<string,int> → keys/values (engine-side map
    support; cross-engine map ordering differs, hence no SQL oracle)."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    m = ev.select(
        "event_id",
        F.from_json("props", "map<string,int>").alias("m"),
        F.get_json_object("props", "$.k").cast("int").alias("k_direct"),
    )
    row = m.filter(F.col("k_direct").isNotNull()).first()
    assert row["m"]["k"] == row["k_direct"]
    bad = m.filter(
        F.element_at("m", "k") != F.col("k_direct")
    ).count()
    assert bad == 0


def test_canon_cell_robustness():
    from zappy_spark.canon import canon_cell

    assert canon_cell(True) == "true"
    assert canon_cell(None) == "NULL"
    assert canon_cell(1.0) == "1"
    assert canon_cell(0.30000000000000004) == "0.3"
    assert canon_cell(-0.0) == "-0"
    assert canon_cell(float("inf")) == "inf"
    import datetime

    assert canon_cell(datetime.datetime(2024, 1, 2, 3, 4, 5, 999999)) == (
        "2024-01-02T03:04:05"
    )


@pytest.mark.parametrize("x", [0.5, 1.5, 2.5, 123456.789, 1e-7, 9.999999e5])
def test_canon_float_12g_stability(x):
    """f'{v:.12g}' must be identical for values that round-trip
    through Spark doubles and DuckDB doubles (same IEEE754 value).
    12 digits (raised from 6 in round 7) so cent-level drift inside
    ~1e9 money sums is visible to the local gate."""
    from zappy_spark.canon import canon_cell

    assert canon_cell(x) == canon_cell(float(f"{x!r}"))
    assert not math.isnan(float(f"{x:.12g}"))
    # the r78 class: $0.02 inside 1.07e9 must NOT canon-collapse
    assert canon_cell(1070000000.02) != canon_cell(1070000000.04)


def test_grouped_agg_pandas_udaf_matches_native(spark):
    """The documented Python-UDAF surface (SURVEY §4.3): grouped-agg
    pandas_udf must match the native aggregate."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def my_avg(v: pd.Series) -> float:
        return float(v.mean())

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    native = orders.groupBy("o_orderstatus").agg(
        F.round(F.avg("o_totalprice"), 4).alias("a")
    )
    udaf = orders.groupBy("o_orderstatus").agg(
        F.round(my_avg("o_totalprice"), 4).alias("a")
    )
    assert _hash_df(native.orderBy("o_orderstatus")) == _hash_df(
        udaf.orderBy("o_orderstatus")
    )


def test_wide_tall_encoding_round_trip(spark):
    """SURVEY §1.2 wide encoding: named numeric columns ↔ vec array."""
    import numpy as np

    from zappy_spark.frame import ZappyFrame

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(500)
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    zf = ZappyFrame.from_columns(li, cols)
    assert zf.ncols == 4
    # axis-0 means must equal the native column means
    native = li.agg(*[F.avg(c).alias(c) for c in cols]).first()
    assert np.allclose(zf.mean(axis=0), [native[c] for c in cols])
    wide = zf.to_columns(cols)
    assert wide.columns == ["row_id"] + cols
    back = wide.agg(*[F.avg(c).alias(c) for c in cols]).first()
    assert np.allclose([back[c] for c in cols], [native[c] for c in cols])


def test_canon_hypothesis_floats():
    """hypothesis: canonical float form is total and stable under
    IEEE round-trip (the property the cross-engine hash relies on)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from zappy_spark.canon import canon_cell

    @given(st.floats(allow_nan=False))
    @settings(max_examples=300, deadline=None)
    def check(x):
        c = canon_cell(x)
        assert isinstance(c, str) and len(c) > 0
        assert canon_cell(float(repr(x))) == c  # repr round-trip stable

    check()


def test_canon_hypothesis_rows():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from zappy_spark.canon import hash_rows

    cell = st.one_of(
        st.integers(-10**12, 10**12),
        st.floats(allow_nan=False),
        st.text(max_size=20),
        st.booleans(),
        st.none(),
    )

    @given(st.lists(st.tuples(cell, cell), max_size=30))
    @settings(max_examples=200, deadline=None)
    def check(rows):
        h = hash_rows(rows)
        assert h == hash_rows(list(rows))  # deterministic
        assert len(h) == 12

    check()


def test_nanos_repair_integer_division(spark, tmp_path):
    """Review regression: non-microsecond-aligned nanos must floor
    exactly (double division shifted ~5% of values by 1us)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = 1704067200_000_000_000  # 2024-01-01 in ns
    offsets = [0, 896, 999, 1000, 1023, 1999, 501_000_000_000]
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(offsets)), pa.int64()),
            "ts": pa.array([base + o for o in offsets], pa.timestamp("ns")),
            "user_id": pa.array([1] * len(offsets), pa.int64()),
            "event_type": pa.array(["x"] * len(offsets)),
            "value": pa.array([0.0] * len(offsets)),
            "props": pa.array(["{}"] * len(offsets)),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))

    from zappy_spark.session import load_table

    got = {
        r["event_id"]: r["us"]
        for r in load_table(spark, str(d), "events")
        .selectExpr("event_id", "unix_micros(ts) us")
        .collect()
    }
    for i, o in enumerate(offsets):
        assert got[i] == (base + o) // 1000, (i, o, got[i])


def test_nanos_repair_floors_pre_epoch(spark, tmp_path):
    """`div` truncates toward zero; the repair must FLOOR, including
    pre-epoch (negative) nanos."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    offsets = [-500, -1000, -1999, 0, 500, 1500]
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(offsets)), pa.int64()),
            "ts": pa.array(offsets, pa.timestamp("ns")),
            "user_id": pa.array([1] * len(offsets), pa.int64()),
            "event_type": pa.array(["x"] * len(offsets)),
            "value": pa.array([0.0] * len(offsets)),
            "props": pa.array(["{}"] * len(offsets)),
        }
    )
    d = tmp_path / "sfneg"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))
    from zappy_spark.session import load_table

    got = {
        r["event_id"]: r["us"]
        for r in load_table(spark, str(d), "events")
        .selectExpr("event_id", "unix_micros(ts) us")
        .collect()
    }
    for i, o in enumerate(offsets):
        assert got[i] == o // 1000, (o, got[i], o // 1000)  # Python floors


def test_bucketed_ranks_match_naive_window_with_ties(spark):
    """with_global_ranks == Window.orderBy on data engineered so tied
    values straddle bucket-boundary candidates (the failure mode a
    bucketed ranker must not have)."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from zappy_spark.operators.ranking import with_global_ranks

    rng = random.Random(42)
    # few distinct values + many rows => ties everywhere, including at
    # every quantile edge; id makes row_number deterministic
    rows = [(i, float(rng.choice([1, 2, 2, 3, 5, 5, 5, 8]))) for i in range(500)]
    df = spark.createDataFrame(rows, "id bigint, v double")

    got = with_global_ranks(
        df,
        "v",
        ascending=False,
        tiebreak=["id"],
        buckets=7,  # deliberately not a divisor of anything
        rank_col="r",
        dense_rank_col="dr",
        row_number_col="rn",
        percent_rank_col="pr",
        cume_dist_col="cd",
        ntile=(3, "nt"),
    )

    w = Window.orderBy(F.desc("v"), "id")
    want = df.select(
        "id",
        F.rank().over(w).cast("bigint").alias("r"),
        F.dense_rank().over(w).cast("bigint").alias("dr"),
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.ntile(3).over(w).cast("bigint").alias("nt"),
    )
    g = {r["id"]: r for r in got.collect()}
    for exp in want.collect():
        act = g[exp["id"]]
        for c in ("r", "dr", "rn", "nt"):
            assert act[c] == exp[c], (exp["id"], c, act[c], exp[c])
        for c in ("pr", "cd"):
            assert abs(act[c] - exp[c]) < 1e-12, (exp["id"], c, act[c], exp[c])


def test_binned_range_join_hypothesis(spark):
    """hypothesis: for random integer points/intervals and any bin
    width, the binned rewrite returns exactly the nested-loop pair
    set (computed in plain Python)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from zappy_spark.operators.joins import binned_range_join

    @settings(max_examples=12, deadline=None)
    @given(
        pts=st.lists(st.integers(-50, 50), min_size=0, max_size=12),
        ivs=st.lists(
            st.tuples(st.integers(-50, 50), st.integers(0, 25)),
            min_size=0,
            max_size=8,
        ),
        w=st.sampled_from([1, 3, 7, 100]),
    )
    def check(pts, ivs, w):
        want = sorted(
            (p, i)
            for p in pts
            for i, (lo, ln) in enumerate(ivs)
            if lo <= p < lo + ln
        )
        pdf = spark.createDataFrame(
            [(p,) for p in pts] or [(None,)], "p bigint"
        ).dropna()
        idf = spark.createDataFrame(
            [(i, lo, lo + ln) for i, (lo, ln) in enumerate(ivs)]
            or [(None, None, None)],
            "i bigint, lo bigint, hi bigint",
        ).dropna()
        got = sorted(
            (r["p"], r["i"])
            for r in binned_range_join(pdf, idf, "p", "lo", "hi", w).collect()
        )
        assert got == want

    check()


def test_gap_fill_matches_pandas_ffill(spark):
    """Random sparse per-key hourly series: the r64 spine+LOCF
    pattern must equal pandas resample('h').ffill() within each
    key's own [first, last] span."""
    import datetime as dt

    import numpy as np
    from pyspark.sql import Window

    rng = np.random.default_rng(9)
    base = dt.datetime(2024, 3, 1)
    rows = []
    for key in range(6):
        ts = sorted(
            rng.choice(72 * 3600, size=rng.integers(3, 25), replace=False)
        )
        for t in ts:
            rows.append(
                (key, base + dt.timedelta(seconds=int(t)), float(rng.integers(0, 100)))
            )
    df = spark.createDataFrame(rows, ["k", "ts", "v"])

    hourly = df.groupBy(
        "k", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.max_by("v", F.col("ts")).alias("v"))
    bounds = df.groupBy("k").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = bounds.select(
        "k", F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    w = Window.partitionBy("k").orderBy("h").rowsBetween(
        Window.unboundedPreceding, 0
    )
    got = {
        (r.k, r.h): r.vf
        for r in spine.join(hourly, ["k", "h"], "left")
        .select("k", "h", F.last("v", ignorenulls=True).over(w).alias("vf"))
        .collect()
    }

    pdf = pd.DataFrame(rows, columns=["k", "ts", "v"])
    for key, g in pdf.groupby("k"):
        # last value per hour, reindexed to the full hourly range, ffilled
        s = (
            g.set_index("ts")
            .sort_index()["v"]
            .resample("h")
            .last()
            .ffill()
        )
        for h, v in s.items():
            assert got[(key, h.to_pydatetime())] == v, (key, h)


def test_twa_matches_numpy(spark):
    """r65's TWA must equal the numpy trapezoid-free step-function
    average on random irregular series."""
    import datetime as dt

    import numpy as np
    from pyspark.sql import Window

    rng = np.random.default_rng(13)
    base = dt.datetime(2024, 3, 1)
    rows = []
    for key in range(5):
        ts = np.sort(rng.choice(10**6, size=20, replace=False))
        vals = rng.normal(50, 10, size=20)
        for t, v in zip(ts, vals):
            rows.append((key, base + dt.timedelta(microseconds=int(t)), float(v)))
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    w = Window.partitionBy("k").orderBy("ts")
    seg = (
        df.select(
            "k",
            "v",
            F.unix_micros("ts").alias("us"),
            F.lead(F.unix_micros("ts")).over(w).alias("nus"),
        )
        .filter(F.col("nus").isNotNull())
        .withColumn("dt", F.col("nus") - F.col("us"))
    )
    got = {
        r.k: r.twa
        for r in seg.groupBy("k")
        .agg((F.sum(F.col("v") * F.col("dt")) / F.sum("dt")).alias("twa"))
        .collect()
    }
    pdf = pd.DataFrame(rows, columns=["k", "ts", "v"])
    for key, g in pdf.groupby("k"):
        g = g.sort_values("ts")
        us = g["ts"].astype("int64").to_numpy() // 1000
        v = g["v"].to_numpy()
        dt_ = np.diff(us)
        want = float((v[:-1] * dt_).sum() / dt_.sum())
        assert abs(got[key] - want) < 1e-9


def test_bm25_matches_numpy_reference(spark):
    """bm25_scores against a direct numpy Okapi BM25 (+1 idf) on a
    random corpus."""
    import numpy as np

    from zappy_spark.operators.text import bm25_scores

    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(30)]
    docs = [
        (i, " ".join(rng.choice(vocab, size=rng.integers(5, 40)).tolist()))
        for i in range(40)
    ]
    terms = ("w1", "w2", "w3")
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r.doc_id: r.bm25
        for r in bm25_scores(df, "text", "doc_id", terms).collect()
    }

    k1, b = 1.2, 0.75
    toks = {i: t.split() for i, t in docs}
    N = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / N
    dfreq = {
        t: sum(1 for v in toks.values() if t in v) for t in terms
    }
    for i, tk in toks.items():
        score = 0.0
        for t in terms:
            tf = tk.count(t)
            if tf == 0:
                continue
            idf = math.log(1 + (N - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            score += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(tk) / avgdl))
        if score > 0:
            assert abs(got[i] - round(score, 4)) <= 1e-4, i
        else:
            assert i not in got


def test_mapinarrow_matches_native_rowsum(spark):
    """Z5 via mapInArrow — the zero-copy sibling of the mapInPandas
    escape hatch (no pandas materialization; compute directly on
    Arrow buffers). Must hash-match the native lambda plan, like the
    pandas variant above."""
    import pyarrow as pa

    from zappy_spark.queries.zappy_ops import z5

    native = z5(spark, SF_DIR)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )

    def rowsum(batches):
        import numpy as np

        for b in batches:
            la = b.column("embedding").cast(pa.list_(pa.float64()))
            flat = np.asarray(la.values)
            offs = np.asarray(la.offsets)
            # reduceat over list offsets: vectorized per-row sums
            # straight off the Arrow buffers (rows here are never
            # empty; an empty row would need masking)
            sums = np.round(np.add.reduceat(flat, offs[:-1]), 4)
            yield pa.RecordBatch.from_arrays(
                [b.column("vec_id"), pa.array(sums, pa.float64())],
                ["vec_id", "s"],
            )

    via_arrow = (
        emb.mapInArrow(rowsum, schema="vec_id long, s double")
        .orderBy("vec_id")
        .limit(100)
    )
    assert _hash_df(via_arrow) == _hash_df(native)


def test_udtf_chunk_plan_matches_expression_form(spark):
    """Spark 4 Python UDTF surface (the table-function escape hatch,
    LATERAL-joinable): a UDTF chunk planner must tile payloads
    exactly like the m01 sequence+explode expression form — which
    stays the production path (JVM-side); the UDTF is for logic a
    Column expression can't say."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="i int, nb bigint")
    class ChunkPlan:
        def eval(self, doc_id: int, total: int, size: int):
            k = 0
            while k * size < total:
                yield k, min(size, total - k * size)
                k += 1

    spark.udtf.register("zs_chunk_plan", ChunkPlan)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.selectExpr(
        "doc_id", "source", "CAST(octet_length(CAST(text AS BINARY)) AS INT) nb"
    ).createOrReplaceTempView("zs_docs")
    via_udtf = spark.sql(
        "SELECT d.source, COUNT(*) n_chunks, "
        "CAST(SUM(c.nb) AS BIGINT) bytes, MAX(CAST(c.i AS BIGINT)) mx "
        "FROM zs_docs d, LATERAL zs_chunk_plan(CAST(d.doc_id AS INT), "
        "d.nb, 256) c "
        "GROUP BY d.source ORDER BY d.source"
    )
    from zappy_spark.queries.pipeline_ops import QUERIES as PQ

    native = PQ["m01_binary_chunk_plan"](spark, SF_DIR)
    assert _hash_df(via_udtf) == _hash_df(native)


def test_hash_sample_nesting_hypothesis(spark):
    """hypothesis: for ANY pair of fractions f1 <= f2 the
    hash-sampled id sets NEST (kept at f1 ⊆ kept at f2) — the
    tighten-without-resampling property mixture_sample documents —
    and observed rates stay near the requested fractions."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from zappy_spark.operators.sampling import hash_sample

    ids = spark.range(0, 2000).withColumnRenamed("id", "k")
    ids.cache().count()

    @settings(max_examples=12, deadline=None)
    @given(
        f1=st.floats(min_value=0.05, max_value=0.95),
        f2=st.floats(min_value=0.05, max_value=0.95),
    )
    def check(f1, f2):
        lo, hi = sorted([f1, f2])
        kept_lo = {r.k for r in hash_sample(ids, "k", lo).collect()}
        kept_hi = {r.k for r in hash_sample(ids, "k", hi).collect()}
        assert kept_lo <= kept_hi
        assert abs(len(kept_hi) / 2000 - hi) < 0.06

    check()
    ids.unpersist()


def test_native_listagg_matches_portable_spelling(spark):
    """Spark 4's native listagg(... ORDER BY ...) equals the r32
    portable spelling (sort_array(collect_list) + array_join) —
    users can take either path."""
    sup = spark.read.parquet(f"{SF_DIR}/supplier.parquet")
    # native listagg is unordered like collect_list; the WITHIN GROUP
    # clause applies the same deterministic ordering contract
    sup.createOrReplaceTempView("zs_sup")
    native = spark.sql(
        "SELECT s_nationkey, "
        "listagg(s_name, ',') WITHIN GROUP (ORDER BY s_name) names "
        "FROM zs_sup GROUP BY s_nationkey"
    )
    from zappy_spark.queries.relational import QUERIES as RQ

    portable = RQ["r32_sorted_listagg"](spark, SF_DIR)
    assert _hash_df(native.orderBy("s_nationkey")) == _hash_df(portable)


def test_dsir_weights_invariant_to_row_order(spark):
    """DSIR weights are a function of corpus statistics, not of row
    or partition order — the determinism contract every sampling
    decision in the pipeline leans on."""
    import numpy as np
    from pyspark.sql import functions as F

    from zappy_spark.operators.sampling import dsir_weights

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(60)]
    rows = [
        (i, " ".join(rng.choice(vocab, size=25)), bool(i % 3 == 0))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "tgt"])
    shuffled = (
        df.withColumn("_r", F.md5(F.col("doc_id").cast("string")))
        .repartition(13, "_r")
        .drop("_r")
    )
    a = {
        r["doc_id"]: (r["n_grams"], round(r["dsir_logratio"], 9))
        for r in dsir_weights(df, "text", "doc_id", "tgt").collect()
    }
    b = {
        r["doc_id"]: (r["n_grams"], round(r["dsir_logratio"], 9))
        for r in dsir_weights(shuffled, "text", "doc_id", "tgt").collect()
    }
    assert a == b


def test_token_budget_prefix_property(spark):
    """For any budget, the kept set is exactly the maximal prefix of
    the priority order whose cumulative weight fits — checked
    against a python replay across budgets (including 0 and 'all')."""
    import numpy as np
    from pyspark.sql import functions as F

    from zappy_spark.operators.sampling import token_budget_select

    rng = np.random.default_rng(11)
    rows = [
        ("g" + str(int(i % 3)), int(i), int(rng.integers(1, 50)))
        for i in range(90)
    ]
    df = spark.createDataFrame(rows, ["grp", "doc_id", "tok"])
    for budget in (0, 37, 200, 10_000):
        kept = {
            (r["grp"], r["doc_id"])
            for r in token_budget_select(
                df, ("grp",), "tok", (F.asc("doc_id"),), budget
            ).collect()
        }
        want = set()
        for g in {"g0", "g1", "g2"}:
            cum = 0
            for grp, did, tok in sorted(rows):
                if grp != g:
                    continue
                cum += tok
                if cum > budget:
                    break
                want.add((g, did))
        assert kept == want, budget


def test_sign_word_matches_python_reference(spark):
    """Horner bit-pack == the straightforward python pack on random
    sign patterns (both 32-bit words, including all-negative and
    all-positive edge vectors)."""
    import numpy as np

    from zappy_spark.operators.similarity import sign_word

    rng = np.random.default_rng(5)
    vecs = [
        [float(x) for x in rng.normal(size=64)] for _ in range(20)
    ]
    vecs.append([-1.0] * 64)
    vecs.append([1.0] * 64)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], ["vec_id", "embedding"]
    )
    got = {
        r["vec_id"]: (r["w0"], r["w1"])
        for r in df.select(
            "vec_id",
            sign_word("embedding", 1, 32).alias("w0"),
            sign_word("embedding", 33, 32).alias("w1"),
        ).collect()
    }
    for i, v in enumerate(vecs):
        w0 = sum(1 << j for j in range(32) if v[j] > 0)
        w1 = sum(1 << j for j in range(32) if v[32 + j] > 0)
        assert got[i] == (w0, w1), i


def test_prefix_filter_pairs_matches_bruteforce(spark):
    """d37's engine contract (the AllPairs prefix lemma): on a corpus
    with planted near-dups, prefix_filter_pairs must return EXACTLY
    the brute-force set of shingle-Jaccard >= theta pairs — with
    max_token_df unset (the default) the prefix filter is a pure
    optimization, never a recall trade — and be invariant to
    partitioning. (An explicit df cap IS a recall trade when it
    binds; that opt-in mode is the caller's contract, not this
    lemma's — ADVICE r5 item 5.)"""
    import numpy as np

    from zappy_spark.operators.dedup import prefix_filter_pairs

    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(300)]
    base = [" ".join(rng.choice(vocab, size=30)) for _ in range(25)]
    docs = []
    for i, b in enumerate(base):
        docs.append((2 * i, b))
        ws = b.split()
        ws[rng.integers(0, 30)] = "mut"  # near-dup: one word changed
        docs.append((2 * i + 1, " ".join(ws)))
    df = spark.createDataFrame(docs, ["doc_id", "text"])

    def shingles(text, k=3):
        ws = text.split()
        return {" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)}

    want = set()
    sets = {i: shingles(t) for i, t in docs}
    for i in sets:
        for j in sets:
            if i < j:
                inter = len(sets[i] & sets[j])
                jac = round(inter / len(sets[i] | sets[j]), 6)
                if jac >= 0.5:
                    want.add((i, j, inter, jac))

    got = {
        (r["i"], r["j"], r["inter"], r["jac"])
        for r in prefix_filter_pairs(
            df, "text", "doc_id", theta=0.5, shingle_k=3
        ).collect()
    }
    assert got == want and len(want) >= 20  # every planted pair found
    got_shuffled = {
        (r["i"], r["j"], r["inter"], r["jac"])
        for r in prefix_filter_pairs(
            df.repartition(7, "text"), "text", "doc_id", 0.5, 3
        ).collect()
    }
    assert got_shuffled == want


def test_welch_ttest_matches_numpy(spark):
    """r87's closed form vs numpy's textbook Welch computation on the
    same rows (sf0.001)."""
    import numpy as np

    from zappy_spark.queries.relational import QUERIES as RQ

    row = RQ["r87_welch_ttest"](spark, SF_DIR).collect()[0]
    pdf = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_orderpriority", "o_totalprice")
        .toPandas()
    )
    a = pdf[pdf.o_orderpriority == "1-URGENT"].o_totalprice.to_numpy()
    b = pdf[pdf.o_orderpriority == "5-LOW"].o_totalprice.to_numpy()
    se = a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
    t_np = (a.mean() - b.mean()) / np.sqrt(se)
    df_np = se**2 / (
        (a.var(ddof=1) / len(a)) ** 2 / (len(a) - 1)
        + (b.var(ddof=1) / len(b)) ** 2 / (len(b) - 1)
    )
    assert row["n_urgent"] == len(a) and row["n_low"] == len(b)
    assert abs(row["t_stat"] - t_np) < 1e-4
    assert abs(row["welch_df"] - df_np) < 0.01


def test_acf_matches_numpy(spark):
    """r88's five-sum Pearson vs numpy.corrcoef over the same daily
    series (sf0.001)."""
    import numpy as np

    from zappy_spark.queries.events_ops import QUERIES as EQ
    from zappy_spark.session import load_table

    got = {r["lag"]: r["acf"] for r in EQ["r88_acf_daily"](spark, SF_DIR).collect()}
    daily = (
        load_table(spark, SF_DIR, "events")
        .groupBy(F.col("ts").cast("date").alias("dy"))
        .agg(F.sum("value").alias("s"))
        .orderBy("dy")
        .toPandas()
    )
    days = {d: v for d, v in zip(daily.dy, daily.s)}
    import datetime

    for lag, acf in got.items():
        xs, ys = [], []
        for d, v in days.items():
            d2 = d + datetime.timedelta(days=lag)
            if d2 in days:
                xs.append(v)
                ys.append(days[d2])
        r_np = np.corrcoef(xs, ys)[0, 1]
        assert abs(acf - r_np) < 1e-5, (lag, acf, r_np)


def test_retrieval_eval_metric_invariants(spark):
    """v24: every metric in [0,1], hits<=10, and MRR==0 exactly when
    no exact-relevant item is retrieved (hits==0)."""
    from zappy_spark.queries.pipeline_ops import QUERIES as PQ

    rows = PQ["v24_retrieval_eval"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["hits_at_10"] <= 10
        assert 0.0 <= r["recall_at_10"] <= 1.0
        assert 0.0 <= r["mrr_at_10"] <= 1.0
        assert 0.0 <= r["ndcg_at_10"] <= 1.0 + 1e-9
        assert (r["mrr_at_10"] == 0.0) == (r["hits_at_10"] == 0)
        assert r["recall_at_10"] == r["hits_at_10"] / 10.0


def test_benford_distribution_is_complete(spark):
    """r86: digits are exactly a subset of 1..9, observed mass sums
    to 1, chi contributions are non-negative."""
    from zappy_spark.queries.relational import QUERIES as RQ

    rows = RQ["r86_benford_digits"](spark, SF_DIR).collect()
    assert {r["digit"] for r in rows} <= set(range(1, 10))
    assert abs(sum(r["obs_p"] for r in rows) - 1.0) < 1e-4
    assert all(r["chi_contrib"] >= 0 for r in rows)
    assert abs(sum(r["benford_p"] for r in rows) - 1.0) < 1e-4


def test_rfm_grid_covers_all_customers(spark):
    """r89: every score in 1..5 and segment counts sum to the number
    of customers with orders."""
    from zappy_spark.queries.relational import QUERIES as RQ

    rows = RQ["r89_rfm_segments"](spark, SF_DIR).collect()
    n_cust = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r["n_customers"] for r in rows) == n_cust
    for r in rows:
        for c in ("r_score", "f_score", "m_score"):
            assert 1 <= r[c] <= 5


def test_basket_lift_and_woe_reconstruct(spark):
    """r90: support/confidence consistent (conf >= support, both in
    (0,1], lift > 0, i < j). t26: WOE reconstructable from the
    emitted counts."""
    import math as m

    from zappy_spark.queries.pipeline_ops import QUERIES as PQ
    from zappy_spark.queries.relational import QUERIES as RQ

    for r in RQ["r90_basket_lift"](spark, SF_DIR).collect():
        assert r["i"] < r["j"] and r["co_n"] >= 1
        assert 0 < r["support"] <= 1 and 0 < r["confidence"] <= 1
        assert r["lift"] > 0 and r["confidence"] >= r["support"] - 1e-9

    rows = PQ["t26_woe_iv"](spark, SF_DIR).collect()
    gt = float(sum(r["n_good"] for r in rows))
    bt = float(sum(r["n_bad"] for r in rows))
    for r in rows:
        gr = (r["n_good"] + 0.5) / (gt + 0.5)
        br = (r["n_bad"] + 0.5) / (bt + 0.5)
        assert abs(r["woe"] - m.log(gr / br)) < 1e-5
        assert abs(r["iv_contrib"] - (gr - br) * m.log(gr / br)) < 1e-5


def test_exploded_verify_matches_array_form(spark):
    """Round-6 re-spell guard: the narrow exploded-gram verify in
    near_dup_pairs / containment_pairs must reproduce EXACTLY what
    the original array-carrying form computed — brute-force Jaccard
    and containment over the same candidate semantics on a planted
    corpus, plus partitioning invariance. (The re-spell exists for
    spill shape at 100×, not for semantics: SCALE.md round 6.)"""
    import numpy as np

    from zappy_spark.operators.dedup import (
        containment_pairs,
        near_dup_pairs,
    )

    rng = np.random.default_rng(29)
    vocab = [f"w{i}" for i in range(200)]
    base = [" ".join(rng.choice(vocab, size=24)) for _ in range(20)]
    docs = []
    for i, b in enumerate(base):
        docs.append((3 * i, b))
        ws = b.split()
        ws[rng.integers(0, 24)] = "mut"  # near-dup twin
        docs.append((3 * i + 1, " ".join(ws)))
        # embedded copy: the first 16 words quoted inside noise —
        # containment 14/22 ≈ 0.64, Jaccard 14/42 ≈ 0.33
        quote = " ".join(ws[:16])
        noise = " ".join(rng.choice(vocab, size=24))
        docs.append((3 * i + 2, f"{noise} {quote}"))
    df = spark.createDataFrame(docs, ["doc_id", "text"])

    def shingles(text, k=3):
        ws = text.split()
        return {" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)}

    sets = {i: shingles(t) for i, t in docs}

    got_j = {
        (r["i"], r["j"], round(r["jac"], 6))
        for r in near_dup_pairs(
            df, "text", "doc_id", threshold=0.5
        ).collect()
    }
    for i, j, jac in got_j:  # every emitted pair is exactly right
        inter = len(sets[i] & sets[j])
        assert jac == round(inter / len(sets[i] | sets[j]), 6)
    assert len(got_j) >= 15  # the planted twins actually surface

    got_c = {
        (r["i"], r["j"], round(r["cont"], 6))
        for r in containment_pairs(
            df, "text", "doc_id", threshold=0.5, anchors=4
        ).collect()
    }
    for i, j, cont in got_c:
        inter = len(sets[i] & sets[j])
        assert cont == round(
            inter / min(len(sets[i]), len(sets[j])), 6
        )
    # the embedded copies are found only via containment: at least
    # one (twin, quote-host) pair must exceed 0.5 containment while
    # sitting below 0.5 Jaccard
    only_cont = {
        (i, j)
        for (i, j, _) in got_c
        if len(sets[i] & sets[j]) / len(sets[i] | sets[j]) < 0.5
    }
    assert only_cont, "anchored path found no Jaccard-invisible pair"
    # partitioning invariance
    got_j2 = {
        (r["i"], r["j"], round(r["jac"], 6))
        for r in near_dup_pairs(
            df.repartition(7, "text"), "text", "doc_id", threshold=0.5
        ).collect()
    }
    assert got_j2 == got_j


def test_substring_spans_match_bruteforce(spark):
    """d40 property: the relational spans (overlapping-shingle
    islands) must equal a pure-Python reference that marks every
    k-window duplicated across docs and merges runs — randomized
    docs over a small alphabet, seeded for reproducibility."""
    import random

    from zappy_spark.operators.dedup import substring_dup_spans

    k = 4
    rng = random.Random(7)
    docs = [
        (i, " ".join(rng.choice("abcdef") for _ in range(rng.randint(4, 30))))
        for i in range(14)
    ]

    # reference: positions whose k-gram occurs in >= 2 distinct docs
    grams = {}
    toks = {i: t.split() for i, t in docs}
    for i, tk in toks.items():
        for p in range(len(tk) - k + 1):
            grams.setdefault(tuple(tk[p : p + k]), set()).add(i)
    want = {}
    for i, tk in toks.items():
        dup = [
            p
            for p in range(len(tk) - k + 1)
            if len(grams[tuple(tk[p : p + k])]) >= 2
        ]
        spans = []
        for p in dup:
            if spans and p == spans[-1][1] + 1:
                spans[-1] = (spans[-1][0], p)
            else:
                spans.append((p, p))
        if spans:
            lens = [e - s + k for s, e in spans]
            want[i] = (len(spans), max(lens), sum(lens))

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_spans"], r["max_span_tokens"], r["dup_tokens"])
        for r in substring_dup_spans(df, "text", "doc_id", k=k).collect()
    }
    assert got == want and len(want) > 0


def test_containment_direction_matches_bruteforce(spark):
    """d42 property: verdicts equal a set-arithmetic reference on
    randomized grouped docs (all four classes decided by the same
    integer cross-multiplications)."""
    import random

    from zappy_spark.operators.dedup import containment_direction

    rng = random.Random(11)
    rows = []
    for g in "ABCD":
        for i in range(3):
            rows.append(
                (g, " ".join(rng.choice("pqrs") for _ in range(rng.randint(3, 12))))
            )
    k, hi = 3, 30
    gram_sets: dict[str, set] = {}
    for g, t in rows:
        tk = t.split(" ")
        gram_sets.setdefault(g, set()).update(
            tuple(tk[p : p + k]) for p in range(len(tk) - k + 1)
        )
    want = {}
    gs = sorted(gram_sets)
    for i, a in enumerate(gs):
        for b in gs[i + 1 :]:
            sh = len(gram_sets[a] & gram_sets[b])
            na, nb = len(gram_sets[a]), len(gram_sets[b])
            if sh == 0:
                continue  # no join row
            ia, ib = sh * 100 >= hi * na, sh * 100 >= hi * nb
            v = (
                "mutual" if ia and ib else
                "a_in_b" if ia else
                "b_in_a" if ib else "weak"
            )
            want[(a, b)] = (sh, na, nb, v)
    df = spark.createDataFrame(rows, ["source", "text"])
    got = {
        (r["grp_a"], r["grp_b"]): (
            r["shared"], r["n_a"], r["n_b"], r["verdict"]
        )
        for r in containment_direction(
            df, "text", "source", k=k, hi_pct=hi
        ).collect()
    }
    assert got == want and len(want) > 0


def test_wav_attest_divisor_formula_hypothesis():
    """hypothesis: the m05 oracle's closed-form zero-crossing count
    (divisor counting: multiples of h in [1, na-1] that are not
    multiples of lcm(h,160)) must equal a brute-force per-sample
    simulation of the fabricated square wave, for arbitrary ids —
    far beyond the 100-id driver panel."""
    import math

    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(st.integers(0, 10**6))
    @settings(max_examples=300, deadline=None)
    def check(mid):
        h = 4 + mid % 13
        n = 800 + (mid % 7) * 160
        na = n - (mid % 5) * 160
        t = np.arange(n)
        x = np.where((t // h) % 2 == 0, 1, -1).astype(np.int64)
        x[na:] = 0
        fr = x.reshape(n // 160, 160)
        brute = int((fr[:, 1:] * fr[:, :-1] < 0).sum())
        lcm = h * 160 // math.gcd(h, 160)
        closed = (na - 1) // h - (na - 1) // lcm
        assert brute == closed
        assert ((na + 159) // 160) == int(
            (np.abs(fr).max(axis=1) > 0).sum()
        )

    check()


def test_kappa_integer_fraction_hypothesis():
    """hypothesis: t35's cross-multiplied integer kappa fraction
    equals the textbook float formula kappa = (p_o - p_e)/(1 - p_e)
    on arbitrary 3x3 contingency tables (when the denominator is
    nonzero)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        st.lists(
            st.tuples(st.integers(0, 2), st.integers(0, 2)),
            min_size=1,
            max_size=60,
        )
    )
    @settings(max_examples=300, deadline=None)
    def check(pairs):
        n = len(pairs)
        agree = sum(1 for a, b in pairs if a == b)
        ak = [sum(1 for a, _ in pairs if a == k) for k in range(3)]
        bk = [sum(1 for _, b in pairs if b == k) for k in range(3)]
        src = sum(ak[k] * bk[k] for k in range(3))
        num = n * agree - src
        den = n * n - src
        if den == 0:
            # all mass in one (a,b) diagonal cell: kappa undefined
            # (p_e = 1); the integer form exposes this as den = 0
            # instead of a float division error.
            assert num == 0
            return
        po = agree / n
        pe = src / (n * n)
        kappa = (po - pe) / (1 - pe)
        assert abs(num / den - kappa) < 1e-12

    check()


@pytest.mark.slow
def test_bpe_hypothesis_reconstruction_and_schedule(spark):
    """hypothesis (round 9): for a random small corpus, the trained
    merge schedule equals a plain-Python BPE reference (Sennrich
    get_stats/merge semantics, same tie-break), and applying the
    schedule to every vocab word preserves the word — symbols always
    concatenate back to the original (no byte is ever lost or
    duplicated by the delimiter-string merge trick)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from zappy_spark.operators.text import (
        bpe_apply_merges,
        bpe_discover_merges,
    )
    from pyspark.sql import functions as F

    word = st.text(alphabet="ab c", min_size=1, max_size=8)

    def py_bpe(texts, k):
        vocab = {}
        for t in texts:
            for w in t.split(" "):
                w = w.lower()
                if w and all("a" <= c <= "z" or "0" <= c <= "9" for c in w):
                    vocab[w] = vocab.get(w, 0) + 1
        syms = {w: list(w) for w in vocab}
        merges = []
        for _ in range(k):
            pairs = {}
            for w, f in vocab.items():
                s = syms[w]
                for i in range(len(s) - 1):
                    pairs[(s[i], s[i + 1])] = (
                        pairs.get((s[i], s[i + 1]), 0) + f
                    )
            if not pairs:
                break
            best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            merges.append(best)
            for w in syms:
                s, out, i = syms[w], [], 0
                while i < len(s):
                    if (
                        i + 1 < len(s)
                        and (s[i], s[i + 1]) == best
                    ):
                        out.append(s[i] + s[i + 1])
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                syms[w] = out
        return merges, syms

    @settings(max_examples=8, deadline=None)
    @given(texts=st.lists(word, min_size=1, max_size=10))
    def check(texts):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
        )
        got = bpe_discover_merges(df, "text", 4)
        want, ref_syms = py_bpe(texts, 4)
        assert got == want, (texts, got, want)
        if not ref_syms:
            return
        # reconstruction: apply the schedule, split, concat == word
        wdf = spark.createDataFrame(
            [(w,) for w in ref_syms], ["w"]
        ).select(
            "w",
            bpe_apply_merges(
                F.regexp_replace("w", "(.)", "|$1|"), got
            ).alias("s"),
        )
        for r in wdf.collect():
            parts = [x for x in r["s"].split("|") if x != ""]
            assert "".join(parts) == r["w"], (r["w"], parts)
            assert parts == ref_syms[r["w"]], (r["w"], parts)

    check()


def test_strip_markup_idempotent_and_tagfree(spark):
    """hypothesis (round 9): strip_markup output never contains a
    well-formed tag span, and the chain is idempotent on its own
    output for tag-only inputs (entity decode is deliberately
    single-pass, so idempotence is asserted on the tag/whitespace
    dimensions)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pyspark.sql import functions as F
    from zappy_spark.operators.text import strip_markup

    frag = st.lists(
        st.sampled_from(
            ["<b>", "</b>", "<div a=1>", "text", "more words",
             "<script>x<y</script>", "<!--c-->", "  ", "plain"]
        ),
        min_size=0,
        max_size=8,
    )

    @settings(max_examples=10, deadline=None)
    @given(parts=frag)
    def check(parts):
        s = "".join(parts)
        df = spark.createDataFrame([(s,)], ["s"])
        once = df.select(strip_markup(F.col("s")).alias("c")).collect()[0][
            "c"
        ]
        import re as _re

        assert not _re.search(r"<[^>]*>", once), (s, once)
        assert "  " not in once and once == once.strip()
        twice = (
            spark.createDataFrame([(once,)], ["s"])
            .select(strip_markup(F.col("s")).alias("c"))
            .collect()[0]["c"]
        )
        assert twice == once, (s, once, twice)

    check()


def test_winnow_reference_hypothesis(spark):
    """Property (round 12): for random lowercase strings the Spark
    winnowing selection equals the pure-Python robust-winnowing
    reference — one batched Spark job over all generated examples
    (hypothesis drives generation, the comparison is per-row)."""
    import hashlib
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from zappy_spark.operators.dedup import winnow_fingerprints

    def ref(txt: str, k: int, w: int) -> set:
        c = re.sub("[^a-z0-9]", "", txt.lower())
        if len(c) < k + w - 1:
            return set()
        keys = [
            hashlib.md5(c[i : i + k].encode()).hexdigest()[:10]
            for i in range(len(c) - k + 1)
        ]
        out = set()
        for p in range(len(keys) - w + 1):
            best = p
            for q in range(p + 1, p + w):
                if keys[q] <= keys[best]:
                    best = q
            out.add((keys[best], best + 1))
        return out

    cases: list[str] = []

    @settings(max_examples=25, deadline=None)
    @given(st.text(alphabet="ab c1.", min_size=0, max_size=40))
    def collect(s):
        cases.append(s)

    collect()
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(cases)], ["doc_id", "text"]
    )
    got: dict = {i: set() for i in range(len(cases))}
    for r in winnow_fingerprints(df, "text", "doc_id", k=4, w=3).collect():
        got[r["doc_id"]].add((r["fp_hash"], r["fp_pos"]))
    for i, s in enumerate(cases):
        assert got[i] == ref(s, 4, 3), (i, s)


def test_cdc_tiling_hypothesis(spark):
    """Property (round 12): CDC chunk spans tile [1, L] exactly and
    chunk hashes re-derive from the text for arbitrary strings
    (including empty-after-filter and shorter-than-window)."""
    import hashlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from zappy_spark.operators.dedup import cdc_chunks

    cases: list[str] = []

    @settings(max_examples=25, deadline=None)
    @given(st.text(alphabet="abcde fgh.XY", min_size=1, max_size=80))
    def collect(s):
        cases.append(s)

    collect()
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(cases)], ["doc_id", "text"]
    )
    rows = cdc_chunks(df, "text", "doc_id", k=8, mask="0").collect()
    by: dict = {i: [] for i in range(len(cases))}
    for r in rows:
        by[r["doc_id"]].append(r)
    for i, s in enumerate(cases):
        spans = sorted((r["chunk_start"], r["chunk_end"]) for r in by[i])
        assert spans[0][0] == 1 and spans[-1][1] == len(s), (i, s, spans)
        for (a, b), (c, _) in zip(spans, spans[1:]):
            assert c == b + 1
        for r in by[i]:
            seg = s[r["chunk_start"] - 1 : r["chunk_end"]]
            assert (
                hashlib.md5(seg.encode()).hexdigest() == r["chunk_hash"]
            )


def test_hilbert_bijection_hypothesis(spark):
    """Property (round 12): with_hilbert is a bijection onto
    [0, 4^bits) for every bits in 2..4 (full-grid check — stronger
    than sampling)."""
    from zappy_spark.operators.layout import with_hilbert

    for bits in (2, 3, 4):
        n = 1 << bits
        df = spark.createDataFrame(
            [(x, y) for x in range(n) for y in range(n)], ["x", "y"]
        )
        hv = [
            r["hv"] for r in with_hilbert(df, "x", "y", bits=bits).collect()
        ]
        assert sorted(hv) == list(range(n * n)), bits


def test_auc_from_hist_brute_force_and_class_swap(spark):
    """Property (round 12): for random (group, z, n1, n0)
    histograms the shared auc_from_hist derivation equals the
    quadratic pair count, and swapping the classes maps
    auc_num -> auc_den - auc_num (AUC antisymmetry) with auc_den
    invariant — one batched Spark job over all generated
    examples."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from zappy_spark.operators.training import auc_from_hist

    cases: list[list] = []

    @settings(max_examples=20, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(-5, 5),
                st.integers(0, 3),
                st.integers(0, 3),
            ),
            min_size=1,
            max_size=8,
            unique_by=lambda t: t[0],
        )
    )
    def collect(h):
        cases.append(h)

    collect()
    rows = []
    for gi, h in enumerate(cases):
        for z, n1, n0 in h:
            rows.append((f"g{gi}", z, n1, n0))
        rows += [(f"s{gi}", z, n0, n1) for z, n1, n0 in h]
    df = spark.createDataFrame(rows, ["grp", "_z", "_n1", "_n0"])
    got = {r["grp"]: r for r in auc_from_hist(df, "grp").collect()}
    for gi, h in enumerate(cases):
        # brute force over expanded individuals
        pos = [z for z, n1, _ in h for _i in range(n1)]
        neg = [z for z, _, n0 in h for _i in range(n0)]
        conc = sum(1 for p in pos for n in neg if p > n)
        tied = sum(1 for p in pos for n in neg if p == n)
        r = got[f"g{gi}"]
        assert (r["concordant"], r["tied"]) == (conc, tied)
        assert r["auc_num"] == 2 * conc + tied
        assert r["auc_den"] == 2 * len(pos) * len(neg)
        s = got[f"s{gi}"]
        assert s["auc_den"] == r["auc_den"]
        assert s["auc_num"] == r["auc_den"] - r["auc_num"]


def test_nb_ledger_accounts_for_every_holdout_doc(spark):
    """Property (round 12): whatever the corpus (including empty
    and one-token texts), v35's ledger rows sum exactly to the
    holdout population — no document ever silently vanishes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from zappy_spark.operators.sampling import (
        _hash_key,
        sample_threshold,
    )
    from zappy_spark.operators.training import nb_holdout_eval

    word = st.sampled_from(["the", "data", "word", "junk", "x"])
    text = st.lists(word, min_size=0, max_size=6).map(" ".join)
    cases: list[str] = []

    @settings(max_examples=30, deadline=None)
    @given(text)
    def collect(t):
        cases.append(t)

    collect()
    # ensure both classes exist in training (guard would fire)
    cases += ["the a the"] * 5 + ["junk only"] * 5
    rows = [(i, f"g{i % 3}", t) for i, t in enumerate(cases)]
    df = spark.createDataFrame(rows, ["doc_id", "src", "text"])
    out = nb_holdout_eval(
        df, "text", "doc_id", "src", holdout_frac=0.5
    ).collect()
    n_ho = df.filter(
        _hash_key("doc_id") < sample_threshold(0.5)
    ).count()
    assert sum(r["n_eval"] for r in out) == n_ho > 0
    for r in out:
        assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == r["n_eval"]
