"""Mergeable-sketch properties (operators/sketches.py).

Sketch estimates are engine-specific, so there is no DuckDB oracle;
instead these tests pin the two contracts that make sketches usable
at scale: the error envelope, and the merge identity (rolling up
partial sketches must equal the single-pass sketch — the property
that lets a 100 TB pipeline persist daily sketches and never rescan).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from zappy_spark.operators.sketches import (
    DEFAULT_LGK,
    cms_build,
    cms_frequencies,
    hll_build,
    hll_rollup,
)
from zappy_spark.session import load_table

RSE = 1.04 / math.sqrt(2**DEFAULT_LGK)


def _events(spark):
    return load_table(spark, SF_DIR, "events").withColumn(
        "day", F.to_date("ts")
    )


def test_hll_estimate_within_error_envelope(spark):
    ev = _events(spark)
    exact = ev.select("user_id").distinct().count()
    est = (
        hll_rollup(hll_build(ev, ["day"], "user_id"), [])
        .collect()[0]["approx_distinct"]
    )
    assert abs(est - exact) <= max(3 * RSE * exact, 1)


def test_hll_merge_identity(spark):
    """Union of per-day sketches == one global sketch (same lgK)."""
    ev = _events(spark)
    merged = (
        hll_rollup(hll_build(ev, ["day"], "user_id"), [])
        .collect()[0]["approx_distinct"]
    )
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", DEFAULT_LGK)).alias(
            "e"
        )
    ).collect()[0]["e"]
    assert merged == direct


def test_hll_per_group_matches_grouped_exact(spark):
    ev = _events(spark)
    exact = {
        r["day"]: r["c"]
        for r in ev.groupBy("day")
        .agg(F.countDistinct("user_id").alias("c"))
        .collect()
    }
    est = hll_rollup(hll_build(ev, ["day"], "user_id"), ["day"]).collect()
    assert len(est) == len(exact)
    for r in est:
        e, x = r["approx_distinct"], exact[r["day"]]
        assert abs(e - x) <= max(3 * RSE * x, 1)


def test_cms_frequency_bounds(spark):
    """CMS guarantees: true <= est <= true + eps*N (w.h.p.)."""
    ev = _events(spark)
    eps = 0.001
    total = ev.count()
    truth = {
        r["event_type"]: r["c"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("c")).collect()
    }
    sketch = cms_build(ev, "event_type", eps=eps)
    est = cms_frequencies(spark, sketch, list(truth))
    for item, true_c in truth.items():
        assert true_c <= est[item] <= true_c + eps * total + 1


def test_native_hll_sketch_merges_and_bounds_error(spark):
    """Spark 4's native DataSketches HLL (the JVM fast path next to
    our portable md5 HLL): per-group sketches union-merge to a
    global estimate within the sketch's error bound of the exact
    count — the build-once-rollup-forever contract, natively."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    per_group = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_partkey").alias("sk")
    )
    est = per_group.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e")
    ).first()["e"]
    direct = li.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey")).alias("e")
    ).first()["e"]
    exact = li.select("l_partkey").distinct().count()
    # union-of-partials and direct sketch may transition HLL modes
    # differently, so they need not be bit-identical — both must sit
    # inside the sketch's error bound of the truth
    assert abs(est - exact) / exact < 0.05
    assert abs(direct - exact) / exact < 0.05


@pytest.mark.slow
def test_bloom_no_false_negatives_and_mergeable(spark):
    from pyspark.sql import functions as F

    from zappy_spark.operators.sketches import (
        bloom_build,
        bloom_might_contain,
    )

    a = spark.range(0, 200).withColumnRenamed("id", "k")
    b = spark.range(200, 400).withColumnRenamed("id", "k")
    wa = bloom_build(a, "k").first()
    wb = bloom_build(b, "k").first()
    wu = bloom_build(a.union(b), "k").first()
    # mergeable: OR of partial filters == filter of the union
    for w in range(8):
        assert wu[f"word_{w}"] == wa[f"word_{w}"] | wb[f"word_{w}"]
    # no false negatives: every inserted key must hit
    probed = bloom_might_contain(a, "k", wa)
    assert probed.filter(~F.col("bloom_hit")).count() == 0
    # false-positive rate on disjoint keys stays within ~3x theory
    # for m=256, k=3, n=200: p = (1-exp(-kn/m))^3 ≈ 0.74 — saturated
    # filter; use a roomier one for the rate check
    big = bloom_build(a, "k", n_bits=4096)
    wbig = big.first()
    fp = (
        bloom_might_contain(b, "k", wbig, n_bits=4096)
        .filter(F.col("bloom_hit"))
        .count()
    )
    assert fp / 200 < 0.05  # theory ≈ 0.002 at m=4096,k=3,n=200


def test_bloom_empty_input_is_all_false_filter(spark):
    """bit_or over zero rows is NULL; bloom_build must coalesce each
    word to 0 so an empty build yields a valid all-false filter
    instead of crashing the probe (ADVICE r5 item 4)."""
    from pyspark.sql import functions as F

    from zappy_spark.operators.sketches import (
        bloom_build,
        bloom_might_contain,
    )

    a = spark.range(0, 50).withColumnRenamed("id", "k")
    empty = a.filter(F.col("k") < 0)
    w = bloom_build(empty, "k").first()
    assert all(w[f"word_{i}"] == 0 for i in range(8))
    probed = bloom_might_contain(a, "k", w)
    assert probed.filter(F.col("bloom_hit")).count() == 0
