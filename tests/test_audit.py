"""Rounding-boundary audit as a suite gate (round 5, VERDICT r4
next-2): scripts/audit_rounding.py must find ZERO order-dependent
float aggregates within 1e-6 of a ROUND half-boundary — the r56
failure class. Runs DuckDB-only (no SparkSession), so it is cheap;
the sf under test follows ZS_TEST_SF_DIR like the oracle suite."""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

import pytest

from tests.conftest import SF_DIR

_spec = importlib.util.spec_from_file_location(
    "audit_rounding",
    Path(__file__).resolve().parents[1] / "scripts" / "audit_rounding.py",
)
audit = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(audit)


@pytest.mark.slow
def test_no_order_dependent_round_boundaries(capsys):
    old_argv = sys.argv
    sys.argv = ["audit_rounding.py", SF_DIR]
    try:
        rc = audit.main()
    finally:
        sys.argv = old_argv
    out = capsys.readouterr().out
    assert rc == 0, f"order-dependent ROUND boundary cells:\n{out}"


def test_strip_rounds_parses_nested_calls():
    sql = "SELECT ROUND(SUM(ROUND(x, 2)) / COUNT(*), 4) a FROM t"
    stripped, ks, exprs = audit._strip_rounds(sql)
    assert ks == [4, 2]
    assert "ROUND" not in stripped.upper()
    assert exprs[0].startswith("SUM(")
