"""DuckDB-oracle correctness for every declared query (SURVEY §5.2).

Mirrors the driver's t2 compare: run the DataFrame-API builder on
Spark and the oracle SQL on DuckDB at sf0.01, then compare
(row count, column names, order-insensitive canonical value hash).
Columns are sorted by name and rows sorted as canonical strings, so
result order never matters — only values.
"""

from __future__ import annotations

import pytest

from tests.conftest import ORACLE_SF_DIR
from zappy_spark.canon import canon_cell
from zappy_spark.queries import ORACLE, QUERIES


def _canon_unordered(cols: list[str], rows: list[tuple]) -> tuple[int, list[str], str]:
    import hashlib

    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(canon_cell(row[i]) for i in order) for row in rows
    )
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:12]
    return len(rows), sorted(cols), h


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark_results, duck, name):
    from tests.conftest import skip_quadratic_at_scale

    skip_quadratic_at_scale(name)
    s_cols, s_rows, _ = spark_results(name)
    s = _canon_unordered(s_cols, s_rows)

    res = duck.execute(ORACLE[name])
    d_cols = [c[0] for c in res.description]
    d_rows = res.fetchall()
    o = _canon_unordered(d_cols, d_rows)

    assert s[1] == o[1], f"{name}: column mismatch {s[1]} vs {o[1]}"
    assert s[0] == o[0], f"{name}: row count {s[0]} vs {o[0]}"
    assert s[2] == o[2], f"{name}: value hash {s[2]} vs {o[2]}"


def test_all_queries_have_unique_keys():
    # since round 5 EVERY declared entry carries a DuckDB oracle —
    # a new rows-only entry is a regression unless deliberately
    # argued (and then this assertion is the place to document it)
    assert set(ORACLE) == set(QUERIES)


def test_bench_keys_resolve():
    """bench.py's B-id mapping must point at live corpus keys."""
    from bench import BENCH

    missing = [k for k in BENCH.values() if k not in QUERIES]
    assert not missing, missing
