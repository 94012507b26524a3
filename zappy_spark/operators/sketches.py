"""Mergeable sketches: HyperLogLog distinct counts and Count-Min
frequencies (Apache DataSketches / Spark built-in aggregates).

At 100 TB the only viable shape for "distinct users per day, week,
month, all-time" is ONE pass that builds a small mergeable sketch per
fine-grained group, persisted as a binary column; every coarser
rollup is then a cheap union over sketches — no rescan of the fact
table, no giant exact-distinct shuffle. Spark 3.5+ exposes exactly
this as JVM aggregates (``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate``), so the whole pipeline is codegen'd
JVM-side: no Python in the hot path.

Accuracy is a property, not an oracle: estimates are deterministic
for a given lgK but engine-specific, so the corpus entry is
rows-only and tests/test_sketches.py pins the error envelope
(±3·1.04/sqrt(2^lgK)) and the merge identity (union of partials ==
single-pass sketch estimate) instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_LGK = 12  # relative standard error ~1.04/sqrt(2^12) ≈ 1.6%


def hll_build(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lgk: int = DEFAULT_LGK,
    sketch_col: str = "hll",
) -> DataFrame:
    """One mergeable HLL sketch of ``value_col`` per group.

    This is the pass that scans the fact table; persist its output
    (a few KB per group) and never rescan for rollups."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), lgk).alias(sketch_col)
    )


def hll_rollup(
    sketches: DataFrame,
    group_cols: list[str],
    sketch_col: str = "hll",
    estimate_col: str = "approx_distinct",
) -> DataFrame:
    """Merge fine-grained sketches up to ``group_cols`` and estimate.

    Input is the (small) output of :func:`hll_build`; the union is an
    aggregate over sketch binaries, so a year→all-time rollup touches
    megabytes, not the original 100 TB."""
    merged = sketches.groupBy(*group_cols).agg(
        F.hll_union_agg(F.col(sketch_col)).alias(sketch_col)
    )
    return merged.withColumn(
        estimate_col, F.hll_sketch_estimate(F.col(sketch_col))
    ).drop(sketch_col)


def hll_estimate(sketch: str | Column) -> Column:
    return F.hll_sketch_estimate(sketch)


def cms_build(
    df: DataFrame,
    value_col: str,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 1,
) -> DataFrame:
    """One Count-Min sketch of ``value_col`` for the whole frame —
    a 1-row binary result built by a distributed JVM aggregate."""
    return df.agg(
        F.count_min_sketch(
            F.col(value_col), F.lit(eps), F.lit(confidence), F.lit(seed)
        ).alias("cms")
    )


def cms_frequencies(
    spark: SparkSession, cms_df: DataFrame, items: list
) -> dict:
    """Query a built sketch for estimated frequencies of ``items``.

    The sketch is a few KB, so the query side is driver-side by
    design (deserialized via the JVM CountMinSketch reader); the
    expensive part — building it over the fact table — stayed
    distributed. Guarantees: est >= true, est <= true + eps*N with
    probability >= confidence."""
    payload = bytes(cms_df.collect()[0]["cms"])
    jvm = spark._jvm
    bis = jvm.java.io.ByteArrayInputStream(payload)
    sketch = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bis)
    return {item: sketch.estimateCount(item) for item in items}


BLOOM_WORD_BITS = 32  # 32-bit words: portable (no engine overflows
# on << 31; 1<<63 is an error in some engines)


def _bloom_bit(key: Column, salt: int, n_bits: int) -> Column:
    """Bit index for hash ``salt``: md5 is THE portable hash family
    (the minhash convention — any engine replays it bit-for-bit)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}|"), key)), 1, 8), 16, 10
    ).cast("long")
    return h % n_bits


def bloom_build(
    df: DataFrame,
    key_col: str,
    n_bits: int = 256,
    k: int = 3,
) -> DataFrame:
    """Portable mergeable Bloom filter over ``key_col``: k md5-salted
    bit positions per key, OR-folded into ``n_bits/32`` 32-bit words
    — the approximate-membership gate that turns "have we ever seen
    this document?" into an 8-word broadcast instead of a 100 TB
    anti-join. bit_or is commutative/associative, so partial filters
    build map-side and merge by word — the same algebra HLL rides;
    a day×filter table rolls up to month/all-time without rescans.

    Returns ONE row of words (word_0 … word_{n_bits/32-1}), each an
    exact integer — portable to any engine with md5 + bit_or, which
    is what makes the corpus oracle replay the filter bit-for-bit.
    """
    n_words = n_bits // BLOOM_WORD_BITS
    key = F.col(key_col).cast("string")
    bits = [
        _bloom_bit(key, j, n_bits).alias(f"_b{j}") for j in range(k)
    ]
    b = df.select(*bits)
    words = []
    for w in range(n_words):
        per_hash = []
        for j in range(k):
            bit = F.col(f"_b{j}")
            # 2^(bit mod 32) via pow: exact for exponents ≤ 31 (the
            # word-size choice), and portable — engines disagree on
            # variable-shift builtins, not on small powers of two
            per_hash.append(
                F.when(
                    (bit >= w * BLOOM_WORD_BITS)
                    & (bit < (w + 1) * BLOOM_WORD_BITS),
                    F.pow(F.lit(2.0), bit % BLOOM_WORD_BITS).cast("long"),
                ).otherwise(F.lit(0).cast("long"))
            )
        acc = per_hash[0]
        for p in per_hash[1:]:
            acc = acc.bitwiseOR(p)
        # bit_or over zero rows is NULL; an empty input must yield
        # the all-zero (all-false) filter, not a crash in the probe
        # (ADVICE r5 item 4)
        words.append(
            F.coalesce(
                F.bit_or(acc), F.lit(0).cast("long")
            ).alias(f"word_{w}")
        )
    return b.agg(*words)


def bloom_might_contain(
    df: DataFrame,
    key_col: str,
    words_row,
    n_bits: int = 256,
    k: int = 3,
) -> DataFrame:
    """Probe: key claimed-present iff ALL k bits are set in the
    filter words (shipped as plain integer literals — the filter is
    bytes, it rides the task closure like a query vector). No false
    negatives by construction; false-positive rate ≈ (1-e^{-kn/m})^k.
    Adds a boolean ``bloom_hit`` column."""
    key = F.col(key_col).cast("string")
    cond = F.lit(True)
    for j in range(k):
        bit = _bloom_bit(key, j, n_bits)
        # select the word holding this bit via nested whens (JVM-side)
        sel = F.lit(0).cast("long")
        for w in range(n_bits // BLOOM_WORD_BITS):
            wv = F.lit(int(words_row[f"word_{w}"])).cast("long")
            sel = F.when(
                F.floor(bit / BLOOM_WORD_BITS) == w, wv
            ).otherwise(sel)
        # sel < 2^32 is exact in a double, and dividing by a power of
        # two is pure binary scaling — floor(sel / 2^b) mod 2 is the
        # portable bit test
        hit = (
            F.floor(sel / F.pow(F.lit(2.0), bit % BLOOM_WORD_BITS))
            .cast("long")
            % 2
            == 1
        )
        cond = cond & hit
    return df.withColumn("bloom_hit", cond)
