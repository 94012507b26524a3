"""Assert the planted d50 span-dup chains at a synth fixture are
REAL clusters, not just hash-matched (VERDICT r9 item 2: a 0-row
hash match is vacuous; this proves structure).

For every planted base doc d (d % PLANT_EVERY == 0), replicas 1/2/3
form the chain A~B~C (ids d+S, d+2S, d+3S where S = base max id + 1).
The full-corpus d50 run must contain, for each chain, a component
labeled A's id with n_docs == 3, kept_doc_id == B (the x+y-block doc
is the longest), kept_chars == n_chars(B), and chars_removed ==
n_chars(A) + n_chars(C) — verified against the fixture parquet.

Usage: python scripts/assert_d50_planting.py /tmp/synth_sf10
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb

from scripts.synth_scale import PLANT_EVERY, REPL


def main(sf_dir: str) -> int:
    from zappy_spark.session import get_session

    p = f"{sf_dir}/documents.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    duck = duckdb.connect()
    n_total, max_id = duck.execute(
        f"SELECT COUNT(*), MAX(doc_id) FROM read_parquet('{src}')"
    ).fetchone()
    n_base = n_total // REPL
    shift = n_base  # main() shifts by base max id + 1 == base count
    planted = list(range(0, n_base, PLANT_EVERY))
    assert max_id == n_total - 1, (max_id, n_total)

    sizes = dict(
        duck.execute(
            f"SELECT doc_id, n_chars FROM read_parquet('{src}') "
            f"WHERE doc_id % {PLANT_EVERY} = 0 "
            f"AND doc_id < {4 * shift} AND doc_id >= {shift}"
        ).fetchall()
    )

    spark = get_session(app_name="assert_d50_planting")
    # Drive the UNDERLYING operator, not the corpus query: d50's
    # display spelling caps output at the 200 smallest components,
    # which at the 100x fixture (1000 planted chains) would report
    # the other 800 as spuriously "missing". The structural claim
    # is about the operator; the capped query is just its window.
    from zappy_spark.operators.dedup import (
        D50_LEDGER_PARAMS,
        dedup_cluster_ledger,
    )
    from zappy_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = {
        r["component"]: r
        for r in dedup_cluster_ledger(
            docs, "text", "doc_id", "n_chars",
            **D50_LEDGER_PARAMS,
        ).collect()
    }
    bad = []
    for d in planted:
        a, b, c = d + shift, d + 2 * shift, d + 3 * shift
        r = rows.get(a)
        if r is None:
            bad.append((d, "missing component"))
            continue
        want = (3, b, sizes[b], sizes[a] + sizes[c])
        got = (
            r["n_docs"], r["kept_doc_id"], r["kept_chars"],
            r["chars_removed"],
        )
        if got != want:
            bad.append((d, f"got {got} want {want}"))
    organic = len(rows) - (len(planted) - sum(
        1 for d, why in bad if why == "missing component"
    ))
    print(
        f"{sf_dir}: {len(rows)} clusters total, "
        f"{len(planted)} planted chains checked, {organic} organic, "
        f"{len(bad)} bad"
    )
    for d, why in bad:
        print(f"  base doc {d}: {why}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
