"""Cross-engine OUTPUT-TYPE parity for every oracle pair (VERDICT r1 §wrong-1).

The driver's correctness gate hashes pandas-materialized values, so a
Spark LONG vs DuckDB HUGEINT->float64 divergence hash-fails even when
every value is numerically identical (r1: z06/z09/z15/z16/r28/r28b).
The local oracle test (test_oracle.py) canonicalizes 54026 == 54026.0
and therefore cannot catch this class. This test can: it compares the
*pandas dtypes* of the Spark result and the DuckDB result column by
column, requiring identical numpy kinds (int vs float vs bool vs
object vs datetime) and, for numeric columns, identical itemsize.

Object columns additionally compare the python type of the first
non-null cell (str vs date vs list), since pandas collapses them all
to dtype('O').
"""

from __future__ import annotations

import pytest

from tests.conftest import ORACLE_SF_DIR
from zappy_spark.queries import ORACLE, QUERIES


def _dtype_sig(pdf):
    """Column -> comparable type signature ('i8', 'f8', 'b1', 'M8', or
    'O:<pytype>' with the first non-null python type for object cols)."""
    sig = {}
    for col in pdf.columns:
        dt = pdf[col].dtype
        if dt.kind == "O":
            nn = pdf[col].dropna()
            py = type(nn.iloc[0]).__name__ if len(nn) else "empty"
            # Spark DATE -> object(datetime.date) while DuckDB DATE ->
            # datetime64: driver-verified tolerant in r1 (r04, r23 were
            # hash-green with exactly this divergence), so both map to
            # the calendar signature.
            sig[col] = "CAL" if py == "date" else f"O:{py}"
        elif dt.kind == "M":
            sig[col] = "CAL"
        else:
            sig[col] = f"{dt.kind}{dt.itemsize}"
    return sig


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_output_dtypes_match_oracle(spark_results, duck, name):
    from tests.conftest import skip_quadratic_at_scale

    skip_quadratic_at_scale(name)
    sp = spark_results(name)[2]
    du = duck.execute(ORACLE[name]).df()
    s_sig, d_sig = _dtype_sig(sp), _dtype_sig(du)
    assert sorted(s_sig) == sorted(d_sig), (
        f"{name}: column sets differ {sorted(s_sig)} vs {sorted(d_sig)}"
    )
    diffs = {
        c: (s_sig[c], d_sig[c]) for c in s_sig if s_sig[c] != d_sig[c]
    }
    assert not diffs, f"{name}: dtype divergence spark-vs-duckdb: {diffs}"
