"""S-series: streaming-shaped operators over the ``events`` table.

Each builder is the **batch-equivalent** of a Structured Streaming
job (SURVEY §2.4): the same logical plan runs under ``readStream``
(see ``zappy_spark.streaming``), and in complete/append mode must
converge to exactly this result after consuming the whole table —
that equivalence is what tests/test_streaming.py asserts.

``events.ts`` arrives as parquet TIMESTAMP(NANOS); the session
registry repairs it to a micros timestamp (see session.py) before any
of these run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zappy_spark.queries._util import t


def s1(spark: SparkSession, d: str) -> DataFrame:
    """Tumbling 1h window agg. Batch spelling uses
    ``date_trunc('hour', ts)`` — for an epoch-aligned 1h tumbling
    window this is value-identical to ``F.window('ts','1 hour')
    .start`` (equality pinned in test_streaming), and measured ~40%
    faster: the window struct expansion + struct group key cost ~180
    ms at sf0.1 vs a scalar timestamp key (round-4 profiling). The
    streaming twin (streaming/jobs.py) keeps ``F.window`` — state
    eviction needs the real window; drained-stream == this-batch
    equivalence is what test_streaming asserts."""
    ev = t(spark, d, "events")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("w"), "event_type")
        .agg(F.count("*").alias("c"), F.round(F.sum("value"), 2).alias("s"))
        .orderBy("w", "event_type")
        .limit(50)
    )


def s2(spark: SparkSession, d: str) -> DataFrame:
    """Sliding window (2h width / 1h slide): each event lands in two
    windows; Spark expands rows window-side, no self-union needed."""
    ev = t(spark, d, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour"), "event_type")
        .agg(F.count("*").alias("c"))
        .select(F.col("window.start").alias("w"), "event_type", "c")
        .orderBy("w", "event_type")
        .limit(100)
    )


def s3(spark: SparkSession, d: str) -> DataFrame:
    """Session windows, 30-minute gap; the DuckDB oracle does the
    same via gaps-and-islands."""
    ev = t(spark, d, "events")
    per_session = ev.groupBy(
        "user_id", F.session_window("ts", "30 minutes")
    ).agg(F.count("*").alias("n"))
    return (
        per_session.groupBy("user_id")
        .agg(F.count("*").alias("sessions"), F.sum("n").alias("events"))
        .orderBy("user_id")
    )


def s4(spark: SparkSession, d: str) -> DataFrame:
    """Dedup keep-first per (user_id, event_type) — batch spelling of
    streaming ``dropDuplicates`` with event-time preference."""
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        t(spark, d, "events")
        .select(
            "user_id", "event_type", "event_id", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id")
        .orderBy("user_id", "event_type")
        .limit(100)
    )


def s5(spark: SparkSession, d: str) -> DataFrame:
    """Stream-static enrichment: fact stream ⋈ broadcast dim."""
    ev = t(spark, d, "events")
    nation = F.broadcast(t(spark, d, "nation"))
    return (
        ev.join(
            nation, (F.col("user_id") % 25).cast("int") == F.col("n_nationkey")
        )
        .groupBy("n_name")
        .agg(F.count("*").alias("c"), F.round(F.sum("value"), 2).alias("s"))
        .orderBy("n_name")
    )


def s6(spark: SparkSession, d: str) -> DataFrame:
    """Batch twin of the stream-stream interval join
    (streaming/jobs.py::interval_stream_join): clicks matched to the
    same user's purchases within 1 hour AFTER the click. The streaming
    form adds watermarks for state eviction; the result set over a
    replayed table is identical — which is exactly what this oracle
    pins. Aggregated per user to keep the declared output bounded."""
    ev = t(spark, d, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"),
        F.col("ts").alias("c_ts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"),
        F.col("ts").alias("p_ts"),
    )
    j = c.join(
        p,
        (F.col("cu") == F.col("pu"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    return (
        j.groupBy(F.col("cu").alias("user_id"))
        .agg(F.count("*").alias("pairs"))
        .orderBy("user_id")
        .limit(100)
    )


def s7(spark: SparkSession, d: str) -> DataFrame:
    """Prev-event gap analytics (as-of self-join via lag).

    Epoch-floor on both engines — DuckDB date_diff counts boundary
    crossings while Spark floors, so both sides difference floored
    epoch seconds (SURVEY Appendix A)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = t(spark, d, "events").select(
        "user_id", "ts", F.lag("ts").over(w).alias("prev_ts")
    )
    return (
        ev.filter(F.col("prev_ts").isNotNull())
        .groupBy("user_id")
        .agg(
            F.round(
                F.avg(F.unix_timestamp("ts") - F.unix_timestamp("prev_ts")), 3
            ).alias("avg_gap")
        )
        .orderBy("user_id")
    )


def s8(spark: SparkSession, d: str) -> DataFrame:
    """Windowed top-k: the 2 most frequent event types per tumbling
    hour (ties → event_type order). Streaming form: window functions
    aren't allowed on streams, so the job runs the same aggregation
    with ``foreachBatch`` applying this ranking per micro-batch
    (streaming/jobs.py::windowed_topk) — this batch result is what it
    converges to. Ranking is on exact integer counts, so cross-engine
    order is deterministic without float ties."""
    ev = t(spark, d, "events")
    counts = (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("c"))
        .select(F.col("window.start").alias("w"), "event_type", "c")
    )
    rank_w = Window.partitionBy("w").orderBy(F.desc("c"), "event_type")
    return (
        counts.withColumn("rn", F.row_number().over(rank_w).cast("bigint"))
        .filter(F.col("rn") <= 2)
        .orderBy("w", "rn")
        .limit(100)
    )


def s10(spark: SparkSession, d: str) -> DataFrame:
    """Batch twin of the LEFT OUTER stream-stream interval join
    (streaming/jobs.py::interval_stream_join_outer): every click
    emits — matched to same-user purchases within 1 hour after it,
    or with nulls if none — aggregated to per-user click/unmatched
    counts so the declared output stays bounded."""
    ev = t(spark, d, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_id"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"),
        F.col("ts").alias("p_ts"),
    )
    j = c.join(
        p,
        (F.col("cu") == F.col("pu"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        "left",
    )
    return (
        j.groupBy(F.col("cu").alias("user_id"))
        .agg(
            F.countDistinct("c_id").alias("clicks"),
            F.countDistinct(
                F.when(F.col("p_ts").isNull(), F.col("c_id"))
            ).alias("unmatched"),
        )
        .orderBy("user_id")
        .limit(100)
    )


def s9(spark: SparkSession, d: str) -> DataFrame:
    """Watermark-bounded dedup, batch twin: keep the FIRST event per
    (user_id, event_type) within each 1-hour bucket, plus the bucket's
    duplicate count. The streaming form is
    ``dropDuplicatesWithinWatermark`` on the bucketed key
    (streaming/jobs.py::dedup_bucket_first) — bucketing makes the
    dedup horizon deterministic (event time, not arrival chains), so
    batch and stream converge to the same kept set.

    ONE min_by hash aggregate (partials map-side) rather than a
    row_number window — the losers of each bucket never shuffle."""
    ev = t(spark, d, "events")
    return (
        ev.withColumn("bucket", F.date_trunc("hour", F.col("ts")))
        .groupBy("user_id", "event_type", "bucket")
        .agg(
            F.min_by("event_id", F.struct("ts", "event_id")).alias("event_id"),
            F.count("*").alias("dups"),
        )
        .select("user_id", "event_type", "bucket", "event_id", "dups")
        .orderBy("user_id", "event_type", "bucket")
        .limit(100)
    )


def s11(spark: SparkSession, d: str) -> DataFrame:
    """Per-session spans (round 4): session_window (30-min gap) with
    the session's event count and active span max(ts)−min(ts) in
    milliseconds — the session-duration facts a funnel/engagement
    rollup needs. Spark's session_window start IS min(ts) and its
    end is max(ts)+gap, so the span is computed from the aggregated
    max(ts) directly; the DuckDB twin is the classic gaps-and-
    islands (LAG > gap → new island). One shuffle on user_id; state
    merges sessions incrementally in the streaming form."""
    ev = t(spark, d, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n"), F.max("ts").alias("_mx"))
        .select(
            "user_id",
            F.col("session_window.start").alias("s"),
            (
                F.unix_millis("_mx")
                - F.unix_millis(F.col("session_window.start"))
            ).alias("dur_ms"),
            "n",
        )
        .orderBy("user_id", "s")
        .limit(100)
    )


def s12(spark: SparkSession, d: str) -> DataFrame:
    """Rolling z-score anomaly detection (round 4): per event_type,
    each event scored against the trailing 1-hour value
    distribution; |z| > 2 with ≥8 peers flags it.

    The RANGE frame orders by ``unix_micros(ts)`` — events carry
    microsecond timestamps, so a seconds-floored order key would
    disagree with the oracle's INTERVAL arithmetic on boundary rows
    (same precision trap as SURVEY Appendix A's epoch-floor note).
    Scale: one shuffle on event_type; the frame is evaluated with a
    sliding aggregate per partition, no self-join. The streaming
    twin of this shape is jobs.py's stateful per-key running stats
    (applyInPandasWithState); batch spelling stays window-based."""
    ev = t(spark, d, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    scored = ev.select(
        "event_id",
        "event_type",
        "value",
        F.count("*").over(w).alias("n_win"),
        F.avg("value").over(w).alias("_avg"),
        F.stddev_samp("value").over(w).alias("_std"),
    )
    return (
        scored.filter((F.col("n_win") >= 8) & (F.col("_std") > 0))
        .withColumn(
            "z", F.round((F.col("value") - F.col("_avg")) / F.col("_std"), 3)
        )
        .filter(F.abs("z") > 2)
        .select("event_id", "event_type", F.round("value", 2).alias("value"), "n_win", "z")
        .orderBy("event_type", "event_id")
        .limit(100)
    )


def s13(spark: SparkSession, d: str) -> DataFrame:
    """Windowed distinct cardinality (round 4): exact distinct users
    per tumbling hour × event_type — the unique-visitors rollup.
    Batch spelling is a plain COUNT(DISTINCT); the streaming twin
    (streaming/jobs.py::windowed_distinct_users) gets the same
    EXACT answer incrementally by chaining two stateful operators —
    watermarked dropDuplicates on (user, type, hour) followed by the
    windowed count — so per-window state is one row per distinct
    key, evicted at watermark passage, never a full user set."""
    ev = t(spark, d, "events")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("w"), "event_type")
        .agg(F.countDistinct("user_id").alias("du"))
        .orderBy("w", "event_type")
        .limit(100)
    )


def s14(spark: SparkSession, d: str) -> DataFrame:
    """Windowed VARIANT extraction (round 4c): tumbling 1h stats of a
    parse_json/variant_get typed field per event_type — the batch
    spelling of streaming/jobs.py::variant_window_stats (drained
    equality pinned in test_streaming). The semi-structured rollup
    every event pipeline runs: parse once per arriving payload,
    aggregate typed values under window state."""
    ev = t(spark, d, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("w"), "event_type")
        .agg(
            F.round(F.avg(k), 3).alias("avg_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("w", "event_type")
        .limit(100)
    )


def s15(spark: SparkSession, d: str) -> DataFrame:
    """Event-transition matrix (round 4c): per-user lag(event_type)
    over event time, counted into (prev, cur) transition pairs — the
    Markov-chain readout behind sessionized behavior models. Batch
    spelling of the prev-event state machine (s7's stateful twin
    keeps one last-event row per user in streaming). One window
    shuffle on user_id, then a ≤|types|² aggregate."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        t(spark, d, "events")
        .select(
            F.lag("event_type").over(w).alias("prev"),
            F.col("event_type").alias("cur"),
        )
        .filter(F.col("prev").isNotNull())
        .groupBy("prev", "cur")
        .agg(F.count("*").alias("n"))
        .orderBy("prev", "cur")
    )


def s16(spark: SparkSession, d: str) -> DataFrame:
    """Per-user EWMA (round 4c): a sequential recurrence
    (acc = 0.7·acc + 0.3·x over event-time order) expressed as ONE
    Catalyst array fold — array_sort(collect_list(struct)) then
    ``aggregate``, no UDF, no iterative driver loop. The per-user
    array is bounded by events-per-user (state the same size the
    streaming stateful twin would keep), so the shuffle is one
    user-keyed aggregate; at 10^12 events the per-user bound, not
    the event count, sizes memory. DuckDB replays it with
    list(ORDER BY)+list_reduce."""
    ev = t(spark, d, "events")
    ordered = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("evs")
    )
    vs = F.transform("evs", lambda e: e["value"])
    ewma = F.aggregate(
        F.slice(vs, 2, 2_000_000_000),
        F.element_at(vs, 1),
        lambda acc, x: acc * 0.7 + x * 0.3,
    )
    return (
        ordered.select("user_id", F.round(ewma, 6).alias("ewma"))
        .orderBy("user_id")
        .limit(100)
    )


def s17(spark: SparkSession, d: str) -> DataFrame:
    """Gaps-and-islands sessionization (round 4c): the classic
    lag + running-cumsum spelling — a new session starts where the
    gap to the previous event exceeds 30 minutes; the cumulative sum
    of starts IS the session id. Same truth as s3's session_window
    (engine-native) but expressed in plain windows any engine has,
    plus per-session facts the struct form doesn't expose: longest
    session and max duration. Two window passes + two aggregates,
    all hashed on user_id."""
    ev = t(spark, d, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    df = ev.select("user_id", "ts", "event_id").withColumn(
        "ns", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    )
    df = df.withColumn("sid", F.sum("ns").over(w))
    per = df.groupBy("user_id", "sid").agg(
        F.count("*").alias("n"),
        (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long")))
        .alias("dur"),
    )
    return (
        per.groupBy("user_id")
        .agg(
            F.count("*").alias("sessions"),
            F.max("n").alias("longest"),
            F.max("dur").alias("max_dur"),
        )
        .orderBy("user_id")
    )



def r93(spark: SparkSession, d: str) -> DataFrame:
    """Sessionized strict-order funnel (round 7): sessionize by the
    s17 gaps-and-islands machinery (6-HOUR inactivity — the synthetic
    event cadence is sparse, so a 30-min gap yields one-event
    sessions and a vacuous funnel; verified non-vacuous at every
    step with 6h), then demand
    view -> click -> purchase IN ORDER *within one session* — the
    product-analytics funnel r66 cannot express (r66's stages are
    time-bounded per user across the whole history; this one resets
    at every session boundary, the form diagnostic for UX changes).
    Step times chain as three conditional min-aggregates, each
    joined back on (user_id, sid) — one partitioning reused across
    all three stages, no per-session collect.

    Output per session-start date: sessions, sessions reaching each
    step — exact counts only."""
    ev = t(spark, d, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    df = ev.withColumn(
        "ns", F.when(gap.isNull() | (gap > 21600), 1).otherwise(0)
    ).withColumn("sid", F.sum("ns").over(w))
    base = df.groupBy("user_id", "sid").agg(
        F.min("ts").alias("s_start"),
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "tv"
        ),
    )
    c2 = (
        df.join(base, ["user_id", "sid"])
        .filter((F.col("event_type") == "click") & (F.col("ts") > F.col("tv")))
        .groupBy("user_id", "sid")
        .agg(F.min("ts").alias("tc"))
    )
    c3 = (
        df.join(c2, ["user_id", "sid"])
        .filter(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("tc"))
        )
        .groupBy("user_id", "sid")
        .agg(F.min("ts").alias("tp"))
    )
    full = base.join(c2, ["user_id", "sid"], "left").join(
        c3, ["user_id", "sid"], "left"
    )
    return (
        full.groupBy(F.col("s_start").cast("date").alias("day"))
        .agg(
            F.count("*").alias("n_sessions"),
            F.count("tv").alias("n_view"),
            F.count("tc").alias("n_view_click"),
            F.count("tp").alias("n_full_funnel"),
        )
        .orderBy("day")
    )


def s18(spark: SparkSession, d: str) -> DataFrame:
    """Dynamic-gap session windows (round 5;
    streaming/jobs.py::dynamic_session_counts): the gap is a
    PER-EVENT expression — an 'error' only holds a session open 5
    minutes while normal activity holds 30 — i.e. Spark's native
    ``session_window`` with a Column gap, a surface the fixed-gap
    s3 does not touch. The oracle replays the merge semantics as
    running-max-of-window-end gaps-and-islands (an event opens a new
    session iff its ts is at or past the max end of every earlier
    window), which is exactly the [ts, ts+gap) overlap-merge rule.
    State scales with live sessions; same rollup ledger as s3."""
    from zappy_spark.streaming.jobs import dynamic_session_counts

    per = dynamic_session_counts(t(spark, d, "events"))
    return (
        per.groupBy("user_id")
        .agg(F.count("*").alias("sessions"), F.sum("n").alias("events"))
        .orderBy("user_id")
    )


def r80(spark: SparkSession, d: str) -> DataFrame:
    """Rolling median baseline (round 5b): per user, the median of
    the trailing 10 events' values — the robust sibling of s16's
    EWMA and s12's z-score: one boilerplate spike shifts a mean,
    not a rolling median. Spark has no median window function;
    ``percentile(value, 0.5)`` over a ROWS frame is the exact
    spelling (interpolating, matching DuckDB's windowed median on
    DOUBLE — both compute (a+b)/2 of the same two doubles on even
    frames). Ordering inside the frame is (ts, event_id): unique, so
    frame contents are engine-identical. One shuffle on user_id; the
    frame is a sliding aggregate per partition, no self-join."""
    ev = t(spark, d, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, 0)
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            F.round("value", 2).alias("value"),
            F.round(
                F.expr("percentile(value, 0.5)").over(w), 4
            ).alias("med10"),
        )
        .orderBy("user_id", "event_id")
        .limit(200)
    )


def r81(spark: SparkSession, d: str) -> DataFrame:
    """Approximate-quantile envelope attestation (round 5b, the v07
    trick applied to sketched percentiles): the GK-sketch
    ``approx_percentile`` estimate is engine-specific, but the claim
    it makes — "within rank error 1/accuracy of the true quantile" —
    is not. Per event_type the entry outputs the EXACT interpolated
    p50/p90 (oracle-checkable) plus booleans attesting the
    accuracy=1000 sketch landed inside the exact [p−0.02, p+0.02]
    rank band (20× the guaranteed 0.001 rank error — a robust
    envelope, not a tuned one). The oracle replays the exacts and
    expects TRUE: a sketch regression flips the driver row red.
    All percentiles ride ONE aggregate pass (partial-merge GK +
    exact sort-based percentile per group)."""
    ev = t(spark, d, "events")
    ex = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.5), 4).alias("p50"),
        F.round(F.percentile("value", 0.9), 4).alias("p90"),
        F.percentile("value", 0.48).alias("_l50"),
        F.percentile("value", 0.52).alias("_u50"),
        F.percentile("value", 0.88).alias("_l90"),
        F.percentile("value", 0.92).alias("_u90"),
        F.percentile_approx("value", 0.5, 1000).alias("_a50"),
        F.percentile_approx("value", 0.9, 1000).alias("_a90"),
    )
    return ex.select(
        "event_type",
        "p50",
        "p90",
        (
            (F.col("_a50") >= F.col("_l50"))
            & (F.col("_a50") <= F.col("_u50"))
        ).alias("p50_within"),
        (
            (F.col("_a90") >= F.col("_l90"))
            & (F.col("_a90") <= F.col("_u90"))
        ).alias("p90_within"),
    ).orderBy("event_type")


def r82(spark: SparkSession, d: str) -> DataFrame:
    """First/last-touch conversion attribution (round 5b): for each
    purchase, the earliest and latest click by the same user inside
    the trailing 7-day window — the marketing-attribution primitive
    (who gets credit: the click that STARTED the journey or the one
    that CLOSED it). One RANGE-framed window over the unified event
    stream — no conversions×clicks join, so cost is one shuffle on
    user_id regardless of window width; the conditional struct
    confines the min/max to clicks while the frame rides the full
    stream. Tie-safe by construction: the (us, event_id) struct
    ordering breaks same-microsecond click ties identically on both
    engines (the 100× fixture actually has such collisions), and
    the [−7d, −1µs] frame excludes same-instant clicks on both.
    No-click purchases attribute to NULL (kept — the unattributed
    rate is itself the signal)."""
    day7 = 7 * 24 * 3600 * 1_000_000
    ev = t(spark, d, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    click = F.when(
        F.col("event_type") == "click", F.struct("us", "event_id")
    )
    w = Window.partitionBy("user_id").orderBy("us").rangeBetween(-day7, -1)
    return (
        ev.select(
            "user_id",
            "event_id",
            "event_type",
            F.min(click).over(w).alias("_fc"),
            F.max(click).over(w).alias("_lc"),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            F.col("_fc.event_id").alias("first_click"),
            F.col("_lc.event_id").alias("last_click"),
        )
        .orderBy("user_id", "event_id")
        .limit(200)
    )


def r83(spark: SparkSession, d: str) -> DataFrame:
    """Interval-overlap sweep (round 5c): peak concurrency per
    event_type — each event opens a half-open interval
    [ts, ts + (⌊value⌋ mod 60 + 1) minutes) and the question is the
    classic capacity one: how many were ever open at once. The
    spelling is the ±1 marker sweep: every interval emits (+1 at
    start, −1 at end), one cumulative sum over (time, delta, id)
    order gives instantaneous concurrency, max per group is the
    answer. Delta sorts before +1 at equal timestamps, so half-open
    semantics (end exactly at another's start ≠ overlap) hold
    identically on both engines; all arithmetic is integer
    microseconds — no float anywhere. Scale shape: one shuffle on
    the group key, then a per-partition sort-sweep — at 100 TB the
    group key becomes (type, day-bucket) so each sweep is bounded;
    no interval×interval self-join ever."""
    ev = t(spark, d, "events")
    iv = ev.select(
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("s"),
        (
            F.unix_micros("ts")
            + (
                F.floor("value").cast("bigint") % 60 + 1
            )
            * 60_000_000
        ).alias("e"),
    )
    m = iv.select(
        "event_type", "event_id", F.col("s").alias("tm"), F.lit(1).alias("d")
    ).unionAll(
        iv.select(
            "event_type",
            "event_id",
            F.col("e").alias("tm"),
            F.lit(-1).alias("d"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("tm", "d", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        m.withColumn("c", F.sum("d").over(w))
        .groupBy("event_type")
        .agg(
            F.max("c").alias("max_concurrent"),
            (F.count("*") / 2).cast("bigint").alias("n_intervals"),
        )
        .orderBy("event_type")
    )


def s19(spark: SparkSession, d: str) -> DataFrame:
    """Behavioral path mining (round 5c): the most common 3-step
    event-type sequences across user journeys — the "what do users
    do before purchasing" primitive behind funnel design (r66) and
    transition matrices (s15, which this generalizes from 2-step to
    3-step). Two LAGs over one (user, time, id)-ordered window build
    the trigram; one count aggregate ranks paths. Scale: a single
    shuffle on user_id for the window (the lag frames are
    per-partition streaming), then a count-only shuffle on the
    bounded path vocabulary (|event_types|³). Top-20 by (count desc,
    path) — integer-deterministic cut."""
    ev = t(spark, d, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = ev.select(
        F.lag("event_type", 2).over(w).alias("_a"),
        F.lag("event_type", 1).over(w).alias("_b"),
        F.col("event_type").alias("_c"),
    ).filter(F.col("_a").isNotNull())
    return (
        tri.groupBy(
            F.concat_ws(">", "_a", "_b", "_c").alias("path")
        )
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(20)
    )


def s20(spark: SparkSession, d: str) -> DataFrame:
    """Per-user one-sided CUSUM drift detection (round 6): the
    classic S_t = max(0, S_{t-1} + (x_t − k)) change-point monitor,
    spelled scan-shaped via its prefix-sum closed form
    S_t = P_t − min(0, min_{s≤t} P_s) — two window functions over
    ONE (user, event_id)-ordered pass instead of a recursive
    dependency, which is what makes it runnable as a declarative
    plan (and as the streaming twin's running state). x is the
    event value in exact cents; k = 5500 sits above the corpus mean
    (~4963), so S hovers near 0 and excursions mark sustained
    drift; h = 20000 is the alarm line. Every quantity is an exact
    BIGINT — no float accumulation anywhere.

    Scale: the window partitions by user_id (high-cardinality key,
    one shuffle); the rollup is a hash agg; top-20 by
    (max_cusum, user_id) is TakeOrderedAndProject."""
    ev = t(spark, d, "events")
    base = ev.select(
        "user_id",
        "event_id",
        (
            F.round(F.col("value") * 100).cast("bigint") - F.lit(5500)
        ).alias("dx"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    p = base.select(
        "user_id", "event_id", F.sum("dx").over(w).alias("ps")
    )
    c = p.select(
        "user_id",
        (
            F.col("ps")
            - F.least(F.min("ps").over(w), F.lit(0).cast("bigint"))
        ).alias("cusum"),
    )
    return (
        c.groupBy("user_id")
        .agg(
            F.max("cusum").alias("max_cusum"),
            F.sum(
                F.when(F.col("cusum") >= 20000, 1).otherwise(0)
            ).alias("n_alarms"),
        )
        .orderBy(F.desc("max_cusum"), "user_id")
        .limit(20)
    )


def r84(spark: SparkSession, d: str) -> DataFrame:
    """Cumulative distinct users by day (round 5c): the DAU-growth
    curve — "how many unique users have we EVER seen as of day X".
    The naive spelling is a count-distinct per day over an expanding
    window (quadratic rescans); the scale spelling is first-seen
    reduction: one hash agg to each user's MIN day (the only pass
    over the fact table), then new-user counts per day and a running
    sum over the bounded day spine. The final window is
    single-partition by construction but over CALENDAR DAYS, not
    rows — bounded forever. Exact integers; v17's bitmap/HLL rollups
    are the sketch siblings when per-segment curves are needed."""
    ev = t(spark, d, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("day")
    )
    daily = first_seen.groupBy("day").agg(F.count("*").alias("n_new"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        F.col("day").cast("date").alias("day"),
        "n_new",
        F.sum("n_new").over(w).alias("cum_users"),
    ).orderBy("day")


def r88(spark: SparkSession, d: str) -> DataFrame:
    """Daily-revenue autocorrelation at lags 1..7 (round 5d): the
    seasonality probe run before fitting any forecast. The daily
    series accumulates in DECIMAL(18,6) (order-independent — the
    r56 lesson), each day emits its 7 lag probes via EXPLODE (no
    cross join), and Pearson r per lag comes from the closed-form
    five-sum identity computed over exact decimal sums, so the
    result is bit-deterministic on both engines.

    Scale shape: the fact scan collapses to |days| rows first;
    everything after — the lag self-join and the 7-group agg — runs
    on the bounded calendar spine. Never a point-wise window over
    raw events."""
    ev = t(spark, d, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("dy")).agg(
        F.sum(F.col("value").cast("decimal(18,6)")).alias("s")
    )
    probes = daily.select(
        F.col("dy").alias("d0"),
        F.col("s").alias("x"),
        F.explode(F.sequence(F.lit(1), F.lit(7))).alias("lag"),
    )
    rhs = daily.select(F.col("dy").alias("d1"), F.col("s").alias("y"))
    pairs = probes.join(
        rhs, F.expr("d1 = date_add(d0, lag)")
    ).select("lag", F.col("x"), F.col("y"))
    agg = pairs.groupBy("lag").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    r = (n * sxy - sx * sy) / F.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    return agg.select(
        F.col("lag").cast("int").alias("lag"),
        "n",
        F.round(r, 6).alias("acf"),
    ).orderBy("lag")


QUERIES = {
    "s1_tumbling_window": s1,
    "s2_sliding_window": s2,
    "s3_session_window": s3,
    "s4_dedup_keep_first": s4,
    "s5_stream_static_join": s5,
    "s6_interval_join": s6,
    "s7_prev_event_gap": s7,
    "s8_windowed_topk": s8,
    "s9_bucket_dedup": s9,
    "s10_outer_interval_join": s10,
    "s11_session_spans": s11,
    "s12_rolling_anomaly": s12,
    "s13_window_distinct": s13,
    "s14_variant_window": s14,
    "s15_transition_matrix": s15,
    "s16_user_ewma": s16,
    "s17_gaps_islands": s17,
    "r93_sessionized_funnel": r93,
    "s18_dynamic_session": s18,
    "r80_rolling_median": r80,
    "r81_quantile_envelope": r81,
    "r82_attribution": r82,
    "r83_interval_overlap": r83,
    "s19_path_trigrams": s19,
    "s20_cusum_drift": s20,
    "r84_cumulative_users": r84,
    "r88_acf_daily": r88,
}

ORACLE = {
    # r88: exact decimal daily sums -> closed-form Pearson r per
    # lag; DATE + INT is day arithmetic in DuckDB (Spark date_add).
    "r88_acf_daily": (
        "WITH daily AS (SELECT CAST(ts AS DATE) dy, "
        "SUM(CAST(value AS DECIMAL(18,6))) s "
        "FROM events GROUP BY dy), "
        "probes AS (SELECT dy d0, s x, "
        "unnest(generate_series(1, 7)) lag FROM daily), "
        "pairs AS (SELECT lag, x, d2.s y FROM probes "
        "JOIN daily d2 ON d2.dy = probes.d0 + CAST(lag AS INT)), "
        "agg AS (SELECT lag, CAST(COUNT(*) AS DOUBLE) n, "
        "CAST(SUM(x) AS DOUBLE) sx, CAST(SUM(y) AS DOUBLE) sy, "
        "CAST(SUM(x*y) AS DOUBLE) sxy, "
        "CAST(SUM(x*x) AS DOUBLE) sxx, "
        "CAST(SUM(y*y) AS DOUBLE) syy FROM pairs GROUP BY lag) "
        "SELECT CAST(lag AS INT) lag, CAST(n AS BIGINT) n, "
        "ROUND((n*sxy - sx*sy) / "
        "SQRT((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) acf "
        "FROM agg ORDER BY lag"
    ),
    # r84: first-seen reduction replay; windowed SUM casts away
    # DuckDB's HUGEINT (the dtype-drift lesson).
    "r84_cumulative_users": (
        "WITH fs AS (SELECT user_id, "
        "CAST(date_trunc('day', MIN(ts)) AS DATE) dy "
        "FROM events GROUP BY user_id), "
        "daily AS (SELECT dy, COUNT(*) n_new FROM fs GROUP BY dy) "
        "SELECT dy AS day, n_new, CAST(SUM(n_new) OVER "
        "(ORDER BY dy ROWS BETWEEN UNBOUNDED PRECEDING AND "
        "CURRENT ROW) AS BIGINT) cum_users "
        "FROM daily ORDER BY dy"
    ),
    # s19: two LAGs over the same (user, ts, id) order; counts are
    # integers, cut is (n desc, path) — deterministic.
    "s19_path_trigrams": (
        "WITH tri AS (SELECT "
        "LAG(event_type, 2) OVER w a, LAG(event_type, 1) OVER w b, "
        "event_type c FROM events "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) "
        "SELECT concat(a, '>', b, '>', c) path, COUNT(*) n "
        "FROM tri WHERE a IS NOT NULL "
        "GROUP BY path ORDER BY n DESC, path LIMIT 20"
    ),
    # s20: the prefix-sum CUSUM closed form replayed; windowed SUM
    # returns HUGEINT in this engine — cast to BIGINT before the
    # arithmetic. Exact cents in, exact integers all the way out.
    "s20_cusum_drift": (
        "WITH e AS (SELECT user_id, event_id, "
        "CAST(ROUND(value*100) AS BIGINT) - 5500 dx FROM events), "
        "p AS (SELECT user_id, event_id, "
        "CAST(SUM(dx) OVER (PARTITION BY user_id ORDER BY event_id) "
        "AS BIGINT) ps FROM e), "
        "c AS (SELECT user_id, ps - LEAST(CAST(MIN(ps) OVER "
        "(PARTITION BY user_id ORDER BY event_id) AS BIGINT), 0) "
        "cusum FROM p) "
        "SELECT user_id, CAST(MAX(cusum) AS BIGINT) max_cusum, "
        "CAST(SUM(CASE WHEN cusum >= 20000 THEN 1 ELSE 0 END) "
        "AS BIGINT) n_alarms "
        "FROM c GROUP BY user_id ORDER BY max_cusum DESC, user_id "
        "LIMIT 20"
    ),
    # r83: the ±1 marker sweep replayed verbatim; integer micros,
    # delta=-1 sorts before +1 at ties = half-open intervals.
    "r83_interval_overlap": (
        "WITH iv AS (SELECT event_type, event_id, epoch_us(ts) s, "
        "epoch_us(ts) + (CAST(floor(value) AS BIGINT) % 60 + 1) "
        "* 60000000 e FROM events), "
        "m AS (SELECT event_type, event_id, s tm, 1 d FROM iv "
        "UNION ALL SELECT event_type, event_id, e, -1 FROM iv), "
        "c AS (SELECT event_type, SUM(d) OVER "
        "(PARTITION BY event_type ORDER BY tm, d, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) c "
        "FROM m) "
        "SELECT event_type, CAST(MAX(c) AS BIGINT) max_concurrent, "
        "CAST(COUNT(*) / 2 AS BIGINT) n_intervals "
        "FROM c GROUP BY event_type ORDER BY event_type"
    ),
    "r80_rolling_median": (
        "SELECT user_id, event_id, ROUND(value,2) AS \"value\", "
        "ROUND(median(CAST(value AS DOUBLE)) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 4) AS med10 "
        "FROM events ORDER BY user_id, event_id LIMIT 200"
    ),
    "r82_attribution": (
        "WITH x AS (SELECT user_id, event_id, event_type, "
        "epoch_us(ts) us FROM events), "
        "w AS (SELECT user_id, event_id, event_type, "
        "MIN(CASE WHEN event_type = 'click' "
        "THEN {'u': us, 'i': event_id} END) OVER win AS fc, "
        "MAX(CASE WHEN event_type = 'click' "
        "THEN {'u': us, 'i': event_id} END) OVER win AS lc "
        "FROM x WINDOW win AS (PARTITION BY user_id ORDER BY us "
        "RANGE BETWEEN 604800000000 PRECEDING AND 1 PRECEDING)) "
        "SELECT user_id, event_id, fc.i AS first_click, "
        "lc.i AS last_click FROM w WHERE event_type = 'purchase' "
        "ORDER BY user_id, event_id LIMIT 200"
    ),
    "r81_quantile_envelope": (
        "SELECT event_type, "
        "ROUND(quantile_cont(value, 0.5), 4) AS p50, "
        "ROUND(quantile_cont(value, 0.9), 4) AS p90, "
        "TRUE AS p50_within, TRUE AS p90_within "
        "FROM events GROUP BY event_type ORDER BY event_type"
    ),
    # s18: replay dynamic session merge as running-max-of-end islands
    "s18_dynamic_session": (
        "WITH e AS (SELECT user_id, ts, event_id, "
        "ts + CASE WHEN event_type='error' THEN INTERVAL '5 minutes' "
        "ELSE INTERVAL '30 minutes' END ed FROM events), "
        "m AS (SELECT user_id, ts, event_id, ed, "
        "MAX(ed) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) me FROM e), "
        "isl AS (SELECT user_id, "
        "SUM(CASE WHEN me IS NULL OR ts >= me THEN 1 ELSE 0 END) "
        "OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS UNBOUNDED PRECEDING) sid FROM m), "
        "s AS (SELECT user_id, sid, COUNT(*) n FROM isl GROUP BY 1, 2) "
        "SELECT user_id, COUNT(*) sessions, CAST(SUM(n) AS BIGINT) events "
        "FROM s GROUP BY user_id ORDER BY user_id"
    ),
    # r93: the s17 session machinery + chained conditional-min
    # funnel steps; counts only.
    "r93_sessionized_funnel": (
        "WITH g AS (SELECT user_id, event_id, ts, event_type, "
        "CASE WHEN LAG(ts) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) IS NULL "
        "OR date_diff('second', LAG(ts) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id), ts) "
        "> 21600 THEN 1 ELSE 0 END ns FROM events), "
        "sx AS (SELECT *, SUM(ns) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) sid FROM g), "
        "b AS (SELECT user_id, sid, MIN(ts) s_start, "
        "MIN(CASE WHEN event_type = 'view' THEN ts END) tv "
        "FROM sx GROUP BY 1,2), "
        "c2 AS (SELECT sx.user_id, sx.sid, MIN(sx.ts) tc "
        "FROM sx JOIN b ON b.user_id = sx.user_id AND b.sid = sx.sid "
        "WHERE sx.event_type = 'click' AND sx.ts > b.tv GROUP BY 1,2), "
        "c3 AS (SELECT sx.user_id, sx.sid, MIN(sx.ts) tp "
        "FROM sx JOIN c2 ON c2.user_id = sx.user_id AND c2.sid = sx.sid "
        "WHERE sx.event_type = 'purchase' AND sx.ts > c2.tc GROUP BY 1,2) "
        "SELECT CAST(b.s_start AS DATE) AS \"day\", COUNT(*) n_sessions, "
        "COUNT(b.tv) n_view, COUNT(c2.tc) n_view_click, "
        "COUNT(c3.tp) n_full_funnel "
        "FROM b LEFT JOIN c2 ON c2.user_id = b.user_id AND c2.sid = b.sid "
        "LEFT JOIN c3 ON c3.user_id = b.user_id AND c3.sid = b.sid "
        "GROUP BY 1 ORDER BY 1"
    ),
    "s17_gaps_islands": (
        "WITH g AS (SELECT user_id, ts, event_id, "
        "CASE WHEN date_diff('second', LAG(ts) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id), ts) "
        "> 1800 OR LAG(ts) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) IS NULL "
        "THEN 1 ELSE 0 END ns FROM events), "
        "s AS (SELECT user_id, ts, SUM(ns) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) sid FROM g), "
        "per AS (SELECT user_id, sid, COUNT(*) n, "
        "CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) dur "
        "FROM s GROUP BY user_id, sid) "
        "SELECT user_id, COUNT(*) sessions, MAX(n) longest, "
        "MAX(dur) max_dur FROM per GROUP BY user_id ORDER BY user_id"
    ),
    "s16_user_ewma": (
        "WITH u AS (SELECT user_id, "
        "list(value ORDER BY ts, event_id) vs FROM events "
        "GROUP BY user_id) "
        "SELECT user_id, "
        "ROUND(list_reduce(vs, (acc, x) -> acc*0.7 + x*0.3), 6) ewma "
        "FROM u ORDER BY user_id LIMIT 100"
    ),
    "s15_transition_matrix": (
        "WITH x AS (SELECT user_id, event_type, "
        "LAG(event_type) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) prev FROM events) "
        "SELECT prev, event_type cur, COUNT(*) n FROM x "
        "WHERE prev IS NOT NULL GROUP BY prev, cur "
        "ORDER BY prev, cur"
    ),
    "s14_variant_window": (
        "SELECT date_trunc('hour', ts) w, event_type, "
        "ROUND(AVG(CAST(json_extract_string(props,'$.k') AS INT)),3) avg_k, "
        "MAX(CAST(json_extract_string(props,'$.k') AS INT)) max_k "
        "FROM events GROUP BY 1, 2 ORDER BY w, event_type LIMIT 100"
    ),
    "s12_rolling_anomaly": (
        "WITH s AS (SELECT event_id, event_type, value, "
        "COUNT(*) OVER w n_win, AVG(value) OVER w a, "
        "STDDEV_SAMP(value) OVER w sd FROM events "
        "WINDOW w AS (PARTITION BY event_type ORDER BY ts "
        "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)) "
        'SELECT event_id, event_type, ROUND(value,2) AS "value", n_win, '
        "ROUND((value-a)/sd, 3) z FROM s "
        "WHERE n_win >= 8 AND sd > 0 AND ABS(ROUND((value-a)/sd, 3)) > 2 "
        "ORDER BY event_type, event_id LIMIT 100"
    ),
    "s11_session_spans": (
        "WITH g AS (SELECT user_id, ts, event_id, CASE WHEN ts - LAG(ts) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL '30 minutes' "
        "OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL "
        "THEN 1 ELSE 0 END ns FROM events), "
        "s AS (SELECT user_id, ts, SUM(ns) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) sid FROM g) "
        "SELECT user_id, MIN(ts) s, "
        "date_diff('millisecond', MIN(ts), MAX(ts)) dur_ms, COUNT(*) n "
        "FROM s GROUP BY user_id, sid ORDER BY user_id, s LIMIT 100"
    ),
    "s13_window_distinct": (
        "SELECT date_trunc('hour', ts) w, event_type, "
        "COUNT(DISTINCT user_id) du FROM events "
        "GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 100"
    ),
    "s1_tumbling_window": (
        "SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP) w, "
        "event_type, COUNT(*) c, ROUND(SUM(value),2) s "
        "FROM events GROUP BY 1,2 ORDER BY 1,2 LIMIT 50"
    ),
    "s2_sliding_window": (
        "SELECT w, event_type, COUNT(*) c FROM ("
        "SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP) w, event_type "
        "FROM events UNION ALL "
        "SELECT CAST(time_bucket(INTERVAL '1 hour', ts) - INTERVAL '1 hour' "
        "AS TIMESTAMP) w, event_type FROM events) t "
        "GROUP BY w, event_type ORDER BY w, event_type LIMIT 100"
    ),
    # event_id tiebreak in BOTH window orders: with duplicate (user,
    # ts) rows, "ORDER BY ts" alone lets the LAG pass and the
    # cumulative-SUM pass disagree on tie order, migrating tied rows
    # across session ids (caught by the 10x-replicated synth-sf1
    # fixture, where every timestamp is duplicated). Spark's
    # session_window groups by time values only and has no such
    # sensitivity.
    "s3_session_window": (
        "WITH g AS (SELECT user_id, ts, event_id, CASE WHEN ts - LAG(ts) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL '30 minutes' "
        "OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL "
        "THEN 1 ELSE 0 END ns FROM events), "
        "s AS (SELECT user_id, ts, SUM(ns) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) sid FROM g) "
        "SELECT user_id, COUNT(DISTINCT sid) sessions, COUNT(*) events "
        "FROM s GROUP BY user_id ORDER BY user_id"
    ),
    "s4_dedup_keep_first": (
        "SELECT user_id, event_type, event_id FROM ("
        "SELECT user_id, event_type, event_id, ROW_NUMBER() OVER "
        "(PARTITION BY user_id, event_type ORDER BY ts, event_id) rn FROM events) t "
        "WHERE rn=1 ORDER BY user_id, event_type LIMIT 100"
    ),
    "s5_stream_static_join": (
        "SELECT n_name, COUNT(*) c, ROUND(SUM(value),2) s FROM events "
        "JOIN nation ON CAST(user_id%25 AS INT)=n_nationkey "
        "GROUP BY n_name ORDER BY n_name"
    ),
    "s6_interval_join": (
        "SELECT c.user_id, COUNT(*) pairs "
        "FROM (SELECT user_id, ts FROM events WHERE event_type='click') c "
        "JOIN (SELECT user_id, ts FROM events WHERE event_type='purchase') p "
        "ON c.user_id = p.user_id AND p.ts >= c.ts "
        "AND p.ts <= c.ts + INTERVAL 1 HOUR "
        "GROUP BY c.user_id ORDER BY c.user_id LIMIT 100"
    ),
    "s7_prev_event_gap": (
        "SELECT user_id, ROUND(AVG(CAST(FLOOR(epoch(ts)) AS BIGINT) - "
        "CAST(FLOOR(epoch(prev_ts)) AS BIGINT)),3) avg_gap "
        "FROM (SELECT user_id, ts, LAG(ts) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) prev_ts FROM events) t "
        "WHERE prev_ts IS NOT NULL GROUP BY user_id ORDER BY user_id"
    ),
    "s8_windowed_topk": (
        "WITH b AS (SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP) w, "
        "event_type, COUNT(*) c FROM events GROUP BY 1,2), "
        "r AS (SELECT w, event_type, c, ROW_NUMBER() OVER "
        "(PARTITION BY w ORDER BY c DESC, event_type) rn FROM b) "
        "SELECT w, event_type, c, rn FROM r WHERE rn<=2 ORDER BY w, rn LIMIT 100"
    ),
    # the oracle spells keep-first as a window; the engine's min_by
    # aggregate must select the identical rows
    "s9_bucket_dedup": (
        "WITH r AS (SELECT user_id, event_type, "
        "date_trunc('hour', ts) bucket, event_id, "
        "ROW_NUMBER() OVER (PARTITION BY user_id, event_type, "
        "date_trunc('hour', ts) ORDER BY ts, event_id) rn, "
        "COUNT(*) OVER (PARTITION BY user_id, event_type, "
        "date_trunc('hour', ts)) dups FROM events) "
        "SELECT user_id, event_type, bucket, event_id, dups FROM r "
        "WHERE rn=1 ORDER BY user_id, event_type, bucket LIMIT 100"
    ),
    "s10_outer_interval_join": (
        "SELECT cu user_id, COUNT(DISTINCT c_id) clicks, "
        "COUNT(DISTINCT CASE WHEN p_ts IS NULL THEN c_id END) unmatched "
        "FROM (SELECT c.user_id cu, c.event_id c_id, p.ts p_ts "
        "FROM (SELECT user_id, ts, event_id FROM events "
        "WHERE event_type='click') c "
        "LEFT JOIN (SELECT user_id, ts FROM events "
        "WHERE event_type='purchase') p "
        "ON c.user_id = p.user_id AND p.ts >= c.ts "
        "AND p.ts <= c.ts + INTERVAL 1 HOUR) t "
        "GROUP BY cu ORDER BY cu LIMIT 100"
    ),
}
