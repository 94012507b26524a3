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

Round-7 extension (VERDICT r6 item 3 — the r78 lesson): per-row
``ROUND(double arithmetic)`` is ALSO cross-engine hazardous near a
half boundary — Spark rounds the exact BigDecimal expansion of the
double while DuckDB rounds the scaled double, and within ~1e-9 of
x.xx5 they disagree (r78's fabricated ×1.1 price). Output-cell
scanning cannot see these when the ROUND lives inside a CTE feeding
an aggregate, so stage 2 probes EVERY ROUND site in place: each
non-decimal ``ROUND(e, k)`` is rewritten to
``CASE WHEN dist_to_half(e·10^k) < ATOL THEN error(...) ELSE
ROUND(e, k) END`` and the oracle re-run — a boundary value anywhere
in the plan (CTE, subquery, select list) then fails loudly with the
offending value. Decimal-typed ROUNDs are skipped: exact decimal
ties are engine-consistent (both round away from zero), which is
precisely why the r78 fix re-spelled the fabrication as
decimal×decimal. The Spark builders mirror these oracle sites
expression-for-expression, so probing the DuckDB side covers the
shared hazard.

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
    # ttr/hapax_ratio are ratios of exact BIGINT counts — one
    # deterministic division, no order-dependent accumulation (the
    # flagged 0.59375 is 19/32, an exactly-representable tie both
    # engines round away from zero).
    "t17_lexical_diversity",
    # after the round-7 campaign sb/sd accumulate as exact BIGINT
    # currency units (integer round-half-up, no ROUND(double)
    # anywhere); the aggs still matching _AGG_RE are
    # SUM/AVG(l_quantity) over integer-valued doubles — exact below
    # 2^53.
    "r01_pricing_summary",
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


def _round_sites(sql: str) -> list[tuple[int, int, str, str]]:
    """Every ROUND(...) span in the SQL, nested ones included:
    (start, end, inner_expr, k_text). The scan resumes just past
    each site's opening ``ROUND(`` (not past its closing paren), so
    a ROUND nested inside another ROUND's argument is returned as
    its own site and gets its own boundary-probe pass (round-8
    ADVICE: the previous resume-at-end skipped inner sites)."""
    sites = []
    pat = re.compile(r"\bROUND\s*\(", re.IGNORECASE)
    i = 0
    while True:
        m = pat.search(sql, i)
        if not m:
            return sites
        depth, j = 1, m.end()
        while depth:
            if sql[j] == "(":
                depth += 1
            elif sql[j] == ")":
                depth -= 1
            j += 1
        inner = sql[m.end() : j - 1]
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
        if cut is None:
            expr, k = inner, "0"
        else:
            expr, k = inner[:cut], inner[cut + 1 :].strip()
        sites.append((m.start(), j, expr, k))
        i = m.end()


# exact-tie floor: a scaled distance at or below this means the
# double sits EXACTLY on the boundary — an intended exact tie (both
# engines round away from zero), not a summation/representation ulp.
PROBE_EXACT = 1e-12

# Per-row ROUND sites that probe near a boundary but are justified.
# Every entry needs an inline reason. These four round TRANSCENDENTAL
# or vector-kernel doubles (log10, cosine) for which no exact decimal
# spelling exists; the rounded double is deterministic GIVEN identical
# inputs, and cross-engine bit-equality of the kernels is verified
# value-level at sf0.001/0.01/0.1 + the 10×/100× fixtures (green in
# round 7 at the very cells the probe flagged). The probe stays armed:
# a future data refresh that actually flips one of these shows up as
# a check_queries/driver mismatch, and the allowlist names where to
# look first. Residual risk: a libm-vs-JVM 1-ulp divergence at a new
# near-boundary cell — accepted, documented.
PROBE_ALLOWLIST: dict[str, str] = {
    "d05_embedding_neardup": "cosine kernel; no exact form",
    "r24_math_funcs": "LOG10 per-row; no exact form",
    "v19_knn_communities": "cosine kernel; no exact form",
    "v24_retrieval_eval": "prefix-dim cosine; no exact form",
}


def _probe_per_row_sites(con, name: str, sql: str) -> list[str]:
    """Stage 2: re-run the oracle once per ROUND site with that site
    rewritten into a boundary tripwire. Returns report lines."""
    hits = []
    for start, end, expr, k in _round_sites(sql):
        if "AS DECIMAL" in expr.upper():
            continue  # exact decimal ties are engine-consistent
        if not k.lstrip("-").isdigit():
            continue  # dynamic scale — nothing to probe statically
        scaled = f"ABS(CAST(({expr}) AS DOUBLE)) * POWER(10, {k})"
        cond = (
            f"(({scaled}) < 9e15 AND "
            f"ABS(({scaled}) - FLOOR({scaled}) - 0.5) > {PROBE_EXACT} AND "
            f"ABS(({scaled}) - FLOOR({scaled}) - 0.5) < {ATOL})"
        )
        probe = (
            f"CASE WHEN {cond} THEN CAST(error('BOUNDARY_PROBE value=' "
            f"|| CAST(({expr}) AS VARCHAR)) AS DOUBLE) "
            f"ELSE {sql[start:end]} END"
        )
        probed_sql = sql[:start] + probe + sql[end:]
        try:
            con.execute(probed_sql).fetchall()
        except duckdb.Error as e:
            msg = str(e)
            if "BOUNDARY_PROBE" in msg:
                val = msg.split("BOUNDARY_PROBE", 1)[1].strip()[:60]
                hits.append(
                    f"PROBE {name} site=ROUND({expr[:60]!r}, {k}) {val}"
                )
            else:
                hits.append(
                    f"PROBESKIP {name} site could not be rewritten "
                    f"({msg.splitlines()[0][:100]})"
                )
    return hits


# Stage 3 (VERDICT r7 item 5): the probe covers ORACLE ROUND sites,
# and relied on builders mirroring them expression-for-expression —
# a convention, not a checked invariant. This check makes it one at
# entry granularity: a builder whose DIRECT body calls F.round while
# its oracle contains NO ROUND site would put a rounded double in
# front of the differential gate with zero probe coverage — exactly
# the escape hatch a future builder-only ROUND(double) needs. Such
# entries fail the audit unless justified here. (Operator-internal
# F.round calls reached THROUGH a builder are outside this scan —
# those pair with oracle ROUNDs, which stage 2 probes, and carry
# their own per-operator value tests.)
BUILDER_ONLY_ROUND_ALLOWLIST: dict[str, str] = {
    # m02's F.round UN-rounds: round(f32_feature * n_bytes) recovers
    # the exact integer bucket count (error ~6e-8·bytes ≪ 0.5), and
    # the oracle recomputes the INTEGER from raw bytes — there is no
    # rounded float on either side of the compare.
    "m02_fake_decode_features": "integer recovery, compare is exact",
}


def _builder_round_gaps() -> list[str]:
    """Entries whose builder body calls F.round but whose oracle has
    no ROUND site for stage 2 to probe."""
    import inspect
    import re as _re

    from zappy_spark.queries import QUERIES

    gaps = []
    for name, sql in sorted(ORACLE.items()):
        fn = QUERIES.get(name)
        if fn is None:
            continue
        try:
            src = inspect.getsource(fn)
        except (OSError, TypeError):
            continue
        n_builder = len(_re.findall(r"\bF\.round\s*\(", src))
        if not n_builder:
            continue
        if _re.search(r"\bROUND\s*\(", sql, _re.IGNORECASE):
            continue
        if name in BUILDER_ONLY_ROUND_ALLOWLIST:
            continue
        gaps.append(
            f"BUILDERGAP {name}: {n_builder} F.round site(s) in the "
            f"builder body but no ROUND in its oracle — probe-blind"
        )
    return gaps


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
    probe_risk = 0
    audited = 0
    builder_gaps = _builder_round_gaps()
    for line in builder_gaps:
        print(line)
    for name, sql in sorted(ORACLE.items()):
        stripped, ks, exprs = _strip_rounds(sql)
        if not ks:
            continue
        audited += 1
        for line in _probe_per_row_sites(con, name, sql):
            if line.startswith("PROBE ") and name not in PROBE_ALLOWLIST:
                probe_risk += 1
            print(line)
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
        f"{probe_risk} per-row ROUND(double) boundary site(s), "
        f"{info} deterministic near-boundary cell(s) (informational); "
        f"{len(builder_gaps)} builder-only F.round gap(s)"
    )
    return 1 if (risk or probe_risk or builder_gaps) else 0


if __name__ == "__main__":
    raise SystemExit(main())
