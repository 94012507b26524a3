"""Scaling-tier bench: the bench.py suite at a ~10x synthetic SF.

r13 (VERDICT r12 item 8): at sf0.1 every bench query is fixed-cost
bound — all ten run FASTER at 8 cores than at 32 (BENCH_r12 scaling
ratios 0.61–0.95) and net-of-fixed-cost times are 0.16–1.07 s, so
the suite can no longer see data-path work. This tier runs the SAME
ten queries with the SAME methodology (bench.py's warm interleaved
median passes, same sentinels, same self-adjudication) against the
deterministic ~sf1 fixture scripts/synth_scale.py derives from
sf0.1, and emits the same one-line JSON with ``"sf": 1.0`` and
``"tier": "scale10x"``. bench.py and its contract are untouched —
this is an ADDITIONS-ONLY sibling entry point:

    SPARK_GRAFT_CPUS=32 python scripts/bench_scale.py

The fixture is INPUT data (synthesized once into
$SPARK_GRAFT_SCALE_DIR, default /tmp/zs_bench_sf1, reused if all
tables are present — generation is deterministic, content-perturbed
replication of sf0.1; see synth_scale.py). No query result or
intermediate is ever persisted across runs: every invocation
computes from the parquet inputs exactly like bench.py.

Sentinel bands: the fixed-cost sentinel band carries over from
bench.py unchanged (it measures Py4J + scheduling, not data). The
data-path sentinel band also carries over — the probe is
repo-independent and fixed-size by design. Suite-time bands for the
tier itself are intentionally NOT enforced on the first recorded
round; the r13 run recorded in OPTIMIZATION_r13.md seeds the
history.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench  # noqa: E402  (reuse BENCH mapping + _measure protocol)
from zappy_spark.session import TABLES, get_session  # noqa: E402

BASE_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALE_DIR = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/zs_bench_sf1")


def _fixture_ready(d: str) -> bool:
    return all((Path(d) / f"{t}.parquet").exists() for t in TABLES)


def main() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if not _fixture_ready(SCALE_DIR):
        r = subprocess.run(
            [
                sys.executable,
                str(REPO / "scripts" / "synth_scale.py"),
                BASE_SF_DIR,
                SCALE_DIR,
            ],
            cwd=str(REPO),
        )
        if r.returncode != 0 or not _fixture_ready(SCALE_DIR):
            print(
                json.dumps(
                    {"metric": "bench_suite_scale10x", "error": "synth failed"}
                )
            )
            return 1

    spark = get_session(app_name="zappy-spark-bench-scale", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # identical warm protocol to bench.py
    for key in bench.BENCH.values():
        bench.QUERIES[key](spark, SCALE_DIR).collect()
    spark.range(1).collect()

    from pyspark.sql import functions as F

    def _data_probe() -> None:
        spark.range(0, 4_000_000, 1, 32).agg(
            F.sum(F.col("id") % 9973 * F.col("id"))
        ).collect()

    _data_probe()

    best = None
    attempts = 0
    in_band = False
    for _ in range(bench.MAX_ATTEMPTS):
        attempts += 1
        per_query, fixed, data = bench._measure(
            spark, SCALE_DIR, _data_probe
        )
        if best is None or fixed + data < best[0]:
            best = (fixed + data, per_query, fixed, data)
        if (
            fixed <= bench.FIXED_SENTINEL_MAX
            and data <= bench.DATA_SENTINEL_MAX
        ):
            best = (fixed + data, per_query, fixed, data)
            in_band = True
            break
    _, per_query, fixed, data = best
    total = round(sum(per_query.values()), 4)
    queries_net = {
        qid: round(max(0.0, v - fixed), 4) for qid, v in per_query.items()
    }
    print(
        json.dumps(
            {
                "metric": "bench_suite_scale10x_warm_total",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "queries_net_of_fixed_cost": queries_net,
                "sf": 1.0,
                "tier": "scale10x",
                "base_sf_dir": BASE_SF_DIR,
                "fixed_cost_sentinel": fixed,
                "data_path_sentinel": data,
                "sentinel_bands": {
                    "fixed_cost_max": bench.FIXED_SENTINEL_MAX,
                    "data_path_max": bench.DATA_SENTINEL_MAX,
                },
                "attempts": attempts,
                "contaminated": not in_band,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
