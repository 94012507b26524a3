"""Spot-check named queries against their DuckDB oracles.

Usage: [CHECK_SF_DIR=/root/testdata/sf0.1] \
       python scripts/check_queries.py [name ...]
With no names, checks every entry in ORACLE (the full driver sweep)
at $CHECK_SF_DIR (default sf0.01). Mirrors tests/test_oracle.py's
canonical compare (order-insensitive, column-name-sorted,
canon_cell-normalized hash).
"""

from __future__ import annotations

import hashlib
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb

from zappy_spark.canon import canon_cell
from zappy_spark.ramcap import apply_duckdb_caps
from zappy_spark.queries import ORACLE, QUERIES

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
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
    names = sys.argv[1:] or sorted(ORACLE)
    from zappy_spark.session import get_session

    spark = get_session(app_name="check_queries")
    duck = duckdb.connect()
    # shared cap + spill posture (zappy_spark/ramcap.py — one
    # definition for this script and scale_sweep.py): a heavy
    # oracle twin should get slow, not OOM.
    apply_duckdb_caps(duck)
    for tbl in TABLES:
        p = f"{SF_DIR}/{tbl}.parquet"
        # Spark-written tables are directories of part files
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        duck.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{src}')"
        )
    failed = []
    for name in names:
        if name not in ORACLE:
            print(f"{name}: NO ORACLE (rows-only)")
            df = QUERIES[name](spark, SF_DIR)
            print(f"  spark rows={df.count()}")
            continue
        df = QUERIES[name](spark, SF_DIR)
        s = _canon(df.columns, [tuple(r) for r in df.collect()])
        res = duck.execute(ORACLE[name])
        o = _canon([c[0] for c in res.description], res.fetchall())
        ok = s == o
        print(f"{name}: {'OK' if ok else 'FAIL'} rows={s[0]}/{o[0]}")
        if not ok:
            failed.append(name)
            if s[1] != o[1]:
                print(f"  cols: spark={s[1]} oracle={o[1]}")
            elif s[0] == o[0]:
                print(f"  hash: spark={s[2]} oracle={o[2]}")
    if failed:
        print("FAILED:", failed)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
