"""Spark-side timing profile of every declared corpus entry.

Optimization-round tooling (guide §1: measure first). Runs each
QUERIES entry at $CHECK_SF_DIR (default sf0.1) on the warm engine and
logs one JSON line per entry: {"name", "sec", "rows"}. Two passes per
entry (cold-in-session, then warm) — the warm number is the one that
ranks where optimization time should go; the cold one exposes
plan-construction overhead. collect() is the timed action, matching
how the driver and bench consume these queries.

Usage:
    CHECK_SF_DIR=/root/testdata/sf0.1 \
        python scripts/profile_corpus.py [out.jsonl] [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from zappy_spark.queries import QUERIES  # noqa: E402
from zappy_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "profile_corpus.jsonl")
    names = sys.argv[2:] or sorted(QUERIES)
    done = set()
    if out.exists():
        for line in out.read_text().splitlines():
            try:
                done.add(json.loads(line)["name"])
            except Exception:
                pass
    spark = get_session(app_name="profile_corpus")
    spark.sparkContext.setLogLevel("ERROR")
    with out.open("a") as fh:
        for name in names:
            if name in done:
                continue
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            try:
                rows = len(QUERIES[name](spark, SF_DIR).collect())
            except Exception as e:  # noqa: BLE001 — log and continue
                fh.write(
                    json.dumps({"name": name, "error": str(e)[:200]}) + "\n"
                )
                fh.flush()
                continue
            cold = time.perf_counter() - t0
            t0 = time.perf_counter()
            QUERIES[name](spark, SF_DIR).collect()
            warm = time.perf_counter() - t0
            fh.write(
                json.dumps(
                    {
                        "name": name,
                        "cold_sec": round(cold, 4),
                        "warm_sec": round(warm, 4),
                        "rows": rows,
                    }
                )
                + "\n"
            )
            fh.flush()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
