"""Isolated-session timing for named corpus entries.

Optimization-round tooling (guide §1: measure first): one FRESH
SparkSession per entry (separate python process via --child), three
runs inside it — run 1 is cold (plan + JIT compile), runs 2-3 are
warm; the reported "warm" number is the MIN of the two warm runs
(the settled data-path cost, robust to one-off GC/JIT pauses; the
r13 ADVICE fix — earlier prose called this a median). collect() is
the timed action, matching the driver and bench.

Usage:
    CHECK_SF_DIR=/root/testdata/sf0.1 \
        python scripts/time_isolated.py name [name ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.1")


def child(name: str) -> int:
    sys.path.insert(0, str(REPO))
    from zappy_spark.queries import QUERIES
    from zappy_spark.session import get_session

    spark = get_session(app_name=f"time-isolated-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    times = []
    for i in range(3):
        spark.sparkContext.setJobDescription(f"{name}:run{i}")
        t0 = time.perf_counter()
        rows = len(QUERIES[name](spark, SF_DIR).collect())
        times.append(round(time.perf_counter() - t0, 3))
    print(
        "ISOLATED "
        + json.dumps(
            {
                "name": name,
                "cold": times[0],
                "warm": min(times[1:]),
                "runs": times,
                "rows": rows,
            }
        )
    )
    return 0


def main() -> int:
    if len(sys.argv) < 2:
        print(
            "usage: [CHECK_SF_DIR=...] python scripts/time_isolated.py"
            " name [name ...]",
            file=sys.stderr,
        )
        return 2
    if sys.argv[1] == "--child":
        return child(sys.argv[2])
    for name in sys.argv[1:]:
        r = subprocess.run(
            [sys.executable, __file__, "--child", name],
            capture_output=True,
            text=True,
        )
        for line in r.stdout.splitlines():
            if line.startswith("ISOLATED "):
                print(line[len("ISOLATED "):], flush=True)
                break
        else:
            print(
                json.dumps({"name": name, "error": r.stderr[-300:]}),
                flush=True,
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
