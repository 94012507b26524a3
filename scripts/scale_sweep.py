"""Full-corpus scale sweep: run EVERY oracle-backed entry at a
fixture dir, hash-compare Spark vs DuckDB, and log one JSON line per
entry with both engines' wall times — the evidence table SCALE.md
aggregates per family (VERDICT r5 item 5: the long tail had only 10×
evidence; this produces the 100× rows).

Usage:
    CHECK_SF_DIR=/tmp/synth_sf10 python scripts/scale_sweep.py \
        [out.jsonl] [start_idx]

Skips tests/conftest.py's QUADRATIC_ORACLES (the deliberately
quadratic oracle TWINS — their production paths run in full) at any
non-testdata dir, same policy as the 10× pytest run. Resumable:
pass a start index (or it appends and skips names already in the
log), so an interrupted multi-hour sweep never re-pays finished
entries.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb

from tests.conftest import QUADRATIC_ORACLES
from zappy_spark.ramcap import apply_duckdb_caps  # noqa: E402
from zappy_spark.canon import canon_cell
from zappy_spark.queries import ORACLE, QUERIES

SF_DIR = os.environ.get("CHECK_SF_DIR", "/tmp/synth_sf10")
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:12]
    return len(rows), sorted(cols), h


def main() -> int:
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "scale_sweep.jsonl")
    done = set()
    if out.exists():
        for line in out.read_text().splitlines():
            try:
                done.add(json.loads(line)["name"])
            except Exception:
                pass

    from zappy_spark.session import get_session

    spark = get_session(app_name="scale_sweep")

    def _mk_duck():
        # Fresh connection PER ENTRY: a query that hits the memory
        # limit leaves the old connection's allocator wedged (every
        # later 64 KB allocation failed in the first run — four
        # cascade failures), so isolation beats reuse here. Setup is
        # milliseconds. The 100× documents table makes some oracle
        # twins memory-hungry: cap DuckDB well under RAM with a /tmp
        # spill so a heavy oracle gets slow, not OOM-killed (the
        # un-capped run died at 115 GB RSS inside d37's oracle).
        d = duckdb.connect()
        # shared cap + spill posture (zappy_spark/ramcap.py — one
        # definition for this script and check_queries.py; the
        # policy rationale lives there)
        apply_duckdb_caps(d, threads=8)
        for tbl in TABLES:
            p = f"{SF_DIR}/{tbl}.parquet"
            src = f"{p}/*.parquet" if os.path.isdir(p) else p
            d.execute(
                f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{src}')"
            )
        return d
    skip_quadratic = "/testdata/" not in SF_DIR
    # (Round 6: the former heavy_100x set is empty — d37's
    # instrument is now bounded to doc_id < 5000 like d06/d13/d14,
    # so it runs at any fixture; only the conftest QUADRATIC_ORACLES
    # remain skipped outside testdata.)
    heavy_100x: set[str] = set()
    failed = []
    names = [n for n in QUERIES if n in ORACLE]
    with out.open("a") as f:
        for name in names:
            if name in done:
                continue
            if skip_quadratic and name in QUADRATIC_ORACLES:
                f.write(json.dumps({"name": name, "skipped": True}) + "\n")
                f.flush()
                continue
            if name in heavy_100x:
                f.write(
                    json.dumps(
                        {
                            "name": name,
                            "skipped": True,
                            "reason": "heavy_100x (see script note)",
                        }
                    )
                    + "\n"
                )
                f.flush()
                continue
            t0 = time.monotonic()
            duck = _mk_duck()
            # Per-entry watchdog (the r26 lesson: one quadratic-at-
            # this-scale frame evaluation must not stall the other
            # 200 entries): cancel the Spark jobs / interrupt DuckDB
            # once the budget expires; the raised error is recorded
            # like any other and the sweep moves on.
            budget = float(os.environ.get("SWEEP_ENTRY_TIMEOUT", "900"))
            import threading

            cancelled = {"why": None}

            def _cancel(side):
                cancelled["why"] = f"{side} exceeded {budget:.0f}s"
                if side == "spark":
                    spark.sparkContext.cancelAllJobs()
                else:
                    try:
                        duck.interrupt()
                    except Exception:
                        pass

            try:
                timer = threading.Timer(budget, _cancel, ["spark"])
                timer.start()
                try:
                    df = QUERIES[name](spark, SF_DIR)
                    s = _canon(
                        df.columns, [tuple(r) for r in df.collect()]
                    )
                finally:
                    timer.cancel()
                t1 = time.monotonic()
                timer = threading.Timer(budget, _cancel, ["duck"])
                timer.start()
                try:
                    res = duck.execute(ORACLE[name])
                    o = _canon(
                        [c[0] for c in res.description], res.fetchall()
                    )
                finally:
                    timer.cancel()
                t2 = time.monotonic()
                rec = {
                    "name": name,
                    "ok": s == o,
                    "rows": s[0],
                    "spark_s": round(t1 - t0, 3),
                    "duck_s": round(t2 - t1, 3),
                }
                if s[0] == 0 and o[0] == 0:
                    # a 0-row hash "match" is degenerate evidence —
                    # the entry's arithmetic was never exercised at
                    # this fixture (VERDICT r9: d50's perturbed-
                    # corpus vacuity went unnoticed for a round).
                    # Flag it so degeneracy is self-announcing.
                    rec["vacuous"] = True
            except Exception as exc:  # record and continue the sweep
                rec = {
                    "name": name,
                    "ok": False,
                    "error": (
                        f"timeout: {cancelled['why']}"
                        if cancelled["why"]
                        else f"{type(exc).__name__}: {exc}"[:300]
                    ),
                    "at_s": round(time.monotonic() - t0, 3),
                }
            finally:
                try:
                    duck.close()
                except Exception:
                    pass
            f.write(json.dumps(rec) + "\n")
            f.flush()
            print(rec, flush=True)
            if not rec["ok"]:
                failed.append(name)
    # aggregate vacuity count over the WHOLE log (including resumed
    # prior runs), so the degenerate-match tally rides every sweep
    vacuous = [
        json.loads(line)["name"]
        for line in out.read_text().splitlines()
        if line.strip() and json.loads(line).get("vacuous")
    ]
    print(f"vacuous (0-row matches): {len(vacuous)} {sorted(vacuous)}")
    if failed:
        print("FAILED:", failed)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
