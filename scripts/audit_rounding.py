"""Corpus-wide rounding-boundary audit (VERDICT r4 §wrong-2).

Every oracle that spells ``ROUND(<float aggregate>, k)`` is one data
refresh away from the r56 failure mode: if any group's unrounded
value lands within ~1 ulp of a half boundary (x.xx5), the rounded
result becomes sensitive to Spark's partial-aggregation order while
DuckDB's single-stream sum stays put.  This script finds every such
latent boundary BEFORE it flips a driver row:

  1. scan ORACLE for ``ROUND(...)`` calls (balanced-paren extract),
  2. re-run each affected oracle in DuckDB with the ROUND stripped
     (alias preserved, so the schema is unchanged),
  3. for every float cell, measure the distance from value*10^k to
     the nearest half-integer; flag cells within ATOL.

Exit code 1 + a report line per hit when anything is flagged; the
fix is to re-spell that query with DECIMAL(18,4) accumulation on
both engines (see r56 in queries/relational.py for the pattern).

Usage: python scripts/audit_rounding.py [sf_dir]
"""

from __future__ import annotations

import math
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb

from zappy_spark.queries import ORACLE

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

# values whose scaled distance-to-half-boundary is below this are one
# summation-order ulp away from flipping the rounded digit.
ATOL = 1e-6

# A near-boundary cell is only a correctness RISK when the rounded
# expression is an order-dependent float aggregate (double SUM/AVG/
# moments — Spark's partial-agg order is nondeterministic).  Rounds of
# per-row expressions are bit-identical on both engines (same IEEE
# ops, no reduction order), and integer-exact aggregates commute.
_AGG_RE = re.compile(
    r"\b(SUM|AVG|MEAN|STDDEV\w*|VAR\w*|COVAR\w*|CORR|SKEWNESS|"
    r"KURTOSIS|REGR_\w+)\s*\(",
    re.IGNORECASE,
)

# Queries whose ROUND-wrapped aggregates are exact and therefore
# order-independent despite matching _AGG_RE. Each entry must carry a
# justification; anything not listed that aggregates floats inside a
# ROUND near a boundary fails the audit.
EXACT_AGG_ALLOWLIST = {
    # AVG over BIGINT epoch-gaps: Spark/DuckDB both sum exactly in
    # int64 before one deterministic double division.
    "r30_asof_join",
    "s7_prev_event_gap",
    # AVG(l_quantity): integer-valued doubles, exact below 2^53.
    "z02_mean_axis0",
    "z01_sum_axis0",
    # remaining aggs after the decimal re-spell are AVG over
    # integer-valued operands (exact int sums)
    "r75_filtered_aggs",
    "s14_variant_window",
}


def _strip_rounds(sql: str) -> tuple[str, list[int], list[str]]:
    """Replace each ROUND(expr, k) with (expr); return SQL, ks, exprs."""
    out, ks, exprs, i = [], [], [], 0
    pat = re.compile(r"\bROUND\s*\(", re.IGNORECASE)
    while True:
        m = pat.search(sql, i)
        if not m:
            out.append(sql[i:])
            break
        out.append(sql[i : m.start()])
        depth, j = 1, m.end()
        while depth:
            if sql[j] == "(":
                depth += 1
            elif sql[j] == ")":
                depth -= 1
            j += 1
        inner = sql[m.end() : j - 1]
        # split trailing ", k" at paren depth 0
        depth, cut = 0, None
        for p in range(len(inner) - 1, -1, -1):
            c = inner[p]
            if c == ")":
                depth += 1
            elif c == "(":
                depth -= 1
            elif c == "," and depth == 0:
                cut = p
                break
        if cut is None:  # ROUND(x) == ROUND(x, 0)
            expr, k = inner, 0
        else:
            expr, k = inner[:cut], int(inner[cut + 1 :].strip())
        # recurse: nested ROUND(ROUND(x,2)…) must be stripped too
        sub_sql, sub_ks, sub_exprs = _strip_rounds(expr)
        out.append(f"({sub_sql})")
        ks.append(k)
        ks.extend(sub_ks)
        exprs.append(expr)
        exprs.extend(sub_exprs)
        i = j
    return "".join(out), ks, exprs


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    risk = 0
    info = 0
    audited = 0
    for name, sql in sorted(ORACLE.items()):
        stripped, ks, exprs = _strip_rounds(sql)
        if not ks:
            continue
        audited += 1
        # order-dependent iff some rounded expr is a float aggregate
        # that is not decimal-accumulated and not allowlisted-exact
        risky_query = name not in EXACT_AGG_ALLOWLIST and any(
            _AGG_RE.search(e) and "AS DECIMAL" not in e.upper()
            for e in exprs
        )
        try:
            res = con.execute(stripped)
        except duckdb.Error as e:  # non-SELECT-item ROUND; audit raw
            print(f"SKIP {name}: stripped SQL failed ({e})")
            continue
        cols = [c[0] for c in res.description]
        rows = res.fetchall()
        for row in rows:
            for col, v in zip(cols, row):
                if not isinstance(v, float) or not math.isfinite(v):
                    continue
                for k in set(ks):
                    scaled = abs(v) * 10.0**k
                    if scaled > 2**53:
                        continue
                    dist = abs(scaled - math.floor(scaled) - 0.5)
                    if dist < ATOL:
                        tier = "RISK" if risky_query else "INFO"
                        if risky_query:
                            risk += 1
                        else:
                            info += 1
                        print(
                            f"{tier} {name} col={col} k={k} value={v!r} "
                            f"dist_to_half={dist:.3e}"
                        )
    print(
        f"audited {audited} ROUND-bearing oracles at {sf_dir}: "
        f"{risk} order-dependent boundary cell(s), "
        f"{info} deterministic near-boundary cell(s) (informational)"
    )
    return 1 if risk else 0


if __name__ == "__main__":
    raise SystemExit(main())
