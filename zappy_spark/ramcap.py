"""DuckDB oracle memory-cap policy, shared by the verification
scripts (round-12 ADVICE: the sysconf/0.8/60GB/4GB computation was
duplicated verbatim in scale_sweep.py and check_queries.py — two
copies drift exactly like the hardcoded 60GB they replaced).

Policy: cap DuckDB's memory_limit at ~80% of physical RAM, ceilinged
at 60 GB (some oracle operators — list aggregates, recursive-CTE
state — cannot spill, and several 100x twins legitimately need
>24 GB; on this 125 GB box with Spark's driver capped at 16 GB,
60 GB still keeps the OS OOM killer out of reach), floored at 1 GB,
falling back to 4 GB where sysconf is unavailable. Pair with a /tmp
spill directory so a heavy oracle twin gets slow, not OOM-killed
(the un-spilled t43 run died allocating at the 100x vocab agg; the
un-capped d37 run died at 115 GB RSS)."""

from __future__ import annotations

import os


def duckdb_memory_cap_gb(
    frac: float = 0.8, ceiling_gb: int = 60, fallback_gb: int = 4
) -> int:
    """The capped DuckDB memory budget in whole GB."""
    try:
        page = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
        return max(1, min(ceiling_gb, int(page * frac / 2**30)))
    except (ValueError, OSError):
        return fallback_gb


def apply_duckdb_caps(conn, threads: int | None = None) -> None:
    """Apply the shared cap + spill posture to a DuckDB connection."""
    conn.execute(f"SET memory_limit='{duckdb_memory_cap_gb()}GB'")
    if threads is not None:
        conn.execute(f"SET threads={threads}")
    conn.execute("SET temp_directory='/tmp/duck_spill'")
