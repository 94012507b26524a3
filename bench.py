"""Benchmark runner — reproduces the BASELINE.md protocol.

Runs the 10-query bench suite (B1..B10 ↦ declared corpus ids) at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``; warm engine, one untimed warm run,
median of 5 timed runs (baseline used 3; extra samples only add
robustness to transient load), ``collect()`` included, session
startup excluded. Prints ONE JSON line.

Samples are INTERLEAVED (round 5, VERDICT r4 next-6): 5 full
round-robin passes over the suite rather than 5 back-to-back runs
per query, so a transient load spike degrades one sample of every
query instead of every sample of one query — that consecutive-
sample correlation is what made q7 oscillate 0.24→0.16→0.36 s
across rounds 2–4 while its plan never changed. Medians are taken
per query across passes; totals stay comparable with BASELINE.md.

``fixed_cost_sentinel`` (round 9, VERDICT r8 item 3): the emitted
JSON carries the median of 7 timed ``spark.range(1).collect()``
round-trips measured under the same warm protocol — a query whose
plan does zero data work, so its time IS the per-action fixed cost
(Py4J round-trip + job/stage scheduling). Cross-round bench drift
can now be diagnosed in data: if (query − sentinel) deltas match
the prior round's within noise, the shift is environmental; if a
query moved while the sentinel didn't, profile that query. The r8
episode (suite 3.45 s → 4.40 s with a byte-identical bench path)
motivated this field.

``data_path_sentinel`` (round 11, VERDICT r10 item 3): the fixed
sentinel measures only Py4J + scheduling, so CPU or memory
contention moves data-touching queries WITHOUT moving it — round
10's q5/q7 drifted 1.5–1.6× while the plans were byte-identical
and the protocol could not prove the cause from the artifact
alone. This second sentinel times a fixed-size deterministic
whole-stage-codegen aggregate (4M generated rows across 32
partitions, zero parquet, zero cache — see the in-code note for
why the first cached-frame design was rejected) under the same
warm interleaved protocol; its time tracks machine compute/
scheduler contention and nothing else repo-side. Interpretation
rule (BASELINE.md): fixed moved → harness overhead shift; fixed
flat but data-path moved → environment contention, per-query
drift expected and non-diagnostic; both flat but a query moved →
profile that query.

Self-adjudication (round 12, VERDICT r11 item 2): the artifact
applies the interpretation rule itself. Sentinel acceptance bands
(derived from the r9–r11 settled-machine history, pinned in the
emitted JSON as ``sentinel_bands``) gate each measurement pass; an
out-of-band pass is retried up to 3 times on the same warm engine,
and if no pass lands in band the least-contaminated pass ships
with ``"contaminated": true`` — the BENCH_r11 episode (both
sentinels 2–4x out of band, suite 2.6x, zero plan drift) no longer
needs a judge re-run to classify. ``queries_net_of_fixed_cost``
(per-query median minus the fixed sentinel) makes the short
queries' data-work component readable directly from the artifact.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from zappy_spark.queries import QUERIES  # noqa: E402
from zappy_spark.session import get_session  # noqa: E402

# B-id → corpus key (BASELINE.md mapping: B1=R1, B2=R2, B3=R3, B6=S1,
# B8=L2, B10=L1).
BENCH = {
    "q1": "r01_pricing_summary",
    "q2": "r02_join5_agg",
    "q3": "r03_topk_per_group",
    "q4": "b04_global_topk",
    "q5": "b05_distinct_counts",
    "q6": "s1_tumbling_window",
    "q7": "b07_string_filter_agg",
    "q8": "l02_cosine_topk",
    "q9": "b09_intersect",
    "q10": "l01_json_extract",
}

# median of 5 (baseline protocol used 3 for Spark; more samples make
# the median robust to transient machine-load spikes without bias)
RUNS = 5


# Sentinel acceptance bands (round 12, VERDICT r11 item 2): fixed
# upper bound from the settled-band history 0.066–0.128 s across
# rounds 9–11 (builder + judge runs on an idle box); data-path from
# the settled 0.37–0.52 s. A measurement pass whose sentinel medians
# land OUTSIDE these bands was taken on a contended machine — its
# per-query numbers are non-diagnostic (the BENCH_r11 episode: both
# sentinels 2–4x out of band, suite 2.6x, plans byte-identical).
# The artifact now adjudicates itself: out-of-band passes are
# retried up to MAX_ATTEMPTS, and if no pass lands in band the
# emitted JSON carries "contaminated": true so a loaded-machine
# number can never masquerade as a code regression or a pass.
FIXED_SENTINEL_MAX = 0.15
DATA_SENTINEL_MAX = 0.60
MAX_ATTEMPTS = 3


def _measure(spark, sf_dir, data_probe):
    """One interleaved measurement pass: RUNS round-robin sweeps of
    the suite + per-pass sentinel samples (2 extra sentinel samples
    for a 7-sample median). Returns (per_query, fixed, data)."""
    samples: dict[str, list[float]] = {qid: [] for qid in BENCH}
    sentinel_samples: list[float] = []
    data_samples: list[float] = []
    for _ in range(RUNS):
        for qid, key in BENCH.items():
            t0 = time.perf_counter()
            QUERIES[key](spark, sf_dir).collect()
            samples[qid].append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        spark.range(1).collect()
        sentinel_samples.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        data_probe()
        data_samples.append(time.perf_counter() - t0)
    for _ in range(2):
        t0 = time.perf_counter()
        spark.range(1).collect()
        sentinel_samples.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        data_probe()
        data_samples.append(time.perf_counter() - t0)
    per_query = {
        qid: round(statistics.median(s), 4) for qid, s in samples.items()
    }
    return (
        per_query,
        round(statistics.median(sentinel_samples), 4),
        round(statistics.median(data_samples), 4),
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(Path(sf_dir).name.replace("sf", ""))
    except ValueError:
        sf = -1.0  # unknown layout; still run and report timings

    spark = get_session(app_name="zappy-spark-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # Warm: session up, JIT + parquet footer caches primed, untimed.
    for key in BENCH.values():
        QUERIES[key](spark, sf_dir).collect()

    # Fixed-cost sentinel: a zero-data-work action, same warm
    # protocol (untimed warm, interleaved samples below).
    spark.range(1).collect()

    # Data-path sentinel: a deterministic fixed-size codegen
    # aggregate (4M generated rows across 32 partitions, fully
    # repo-independent) under the identical warm interleaved
    # protocol — measures the machine's CPU/scheduler data path.
    # Deliberately NOT cached: the first design persisted a 128 MB
    # frame and re-aggregated it per pass, which inflated the suite
    # ~30% and the fixed sentinel ~2x (measured back-to-back this
    # round) — a probe must not perturb what it diagnoses. The
    # generated-range form has zero storage footprint and its time
    # still tracks machine contention (it is ~50 ms of pure
    # whole-stage-codegen arithmetic fanned across every core).
    from pyspark.sql import functions as F

    def _data_probe() -> None:
        spark.range(0, 4_000_000, 1, 32).agg(
            F.sum(F.col("id") % 9973 * F.col("id"))
        ).collect()

    _data_probe()  # untimed warm (JIT)

    # Self-adjudication loop: take passes until the sentinels land
    # in band (max MAX_ATTEMPTS); keep the pass with the least
    # sentinel contamination as the fallback.
    best = None  # (fixed + data, per_query, fixed, data)
    attempts = 0
    in_band = False
    for _ in range(MAX_ATTEMPTS):
        attempts += 1
        per_query, fixed, data = _measure(spark, sf_dir, _data_probe)
        if best is None or fixed + data < best[0]:
            best = (fixed + data, per_query, fixed, data)
        if fixed <= FIXED_SENTINEL_MAX and data <= DATA_SENTINEL_MAX:
            best = (fixed + data, per_query, fixed, data)
            in_band = True
            break
    _, per_query, fixed, data = best

    total = round(sum(per_query.values()), 4)
    # Sentinel-subtracted per-query values (VERDICT r11 item 2):
    # each timed action pays the fixed per-action cost (Py4J
    # round-trip + job/stage scheduling) once, so query - fixed is
    # the data-work component — the number to compare against a
    # ~200 ms baseline query without prose (the q6 gate-edge
    # episode). Floored at 0.
    queries_net = {
        qid: round(max(0.0, v - fixed), 4) for qid, v in per_query.items()
    }
    print(
        json.dumps(
            {
                "metric": "bench_suite_warm_total",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "queries_net_of_fixed_cost": queries_net,
                "sf": sf,
                "fixed_cost_sentinel": fixed,
                "data_path_sentinel": data,
                "sentinel_bands": {
                    "fixed_cost_max": FIXED_SENTINEL_MAX,
                    "data_path_max": DATA_SENTINEL_MAX,
                },
                "attempts": attempts,
                "contaminated": not in_band,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
