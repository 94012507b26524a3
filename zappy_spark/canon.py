"""Result-set canonicalization + hashing (SURVEY.md Appendix A).

Mirrors the reference's oracle style — zappy asserts
``np.array_equal`` between a ZappyArray result and a plain-numpy
result (``zappy tests``, SURVEY §5.1); we assert hash equality
between a Spark result and a DuckDB result under one canonical text
form. Every declared query hash in SURVEY §2.6 was produced under
exactly this protocol.
"""

from __future__ import annotations

import datetime
import hashlib
from collections.abc import Iterable, Sequence


def canon_cell(v: object) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        # %.12g, not %.6g: a $0.02 error inside a ~1e9 money sum is
        # invisible at 6 significant digits — the round-6 driver
        # caught exactly that (r78) while every local gate stayed
        # green. 12 digits sees cent-level drift at 1e10 magnitude
        # while still absorbing last-ulp double noise.
        return f"{v:.12g}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()[:19]
    if isinstance(v, datetime.date):
        return v.isoformat()[:19]
    return str(v)


def canon_rows(rows: Iterable[Sequence]) -> str:
    return "\n".join("|".join(canon_cell(c) for c in row) for row in rows)


def hash_rows(rows: Iterable[Sequence]) -> str:
    """First 12 hex of sha256 of the canonical form."""
    return hashlib.sha256(canon_rows(rows).encode()).hexdigest()[:12]
