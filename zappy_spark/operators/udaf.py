"""Custom aggregates: the supported UDAF surface (SURVEY §4.3).

Spark has no Python UDAF class; the supported path is a grouped-agg
``pandas_udf`` — one Arrow batch per group per aggregate, vectorized
numpy inside. Rules that keep it scale-safe:

- The group's values MUST fit in one executor's memory (a grouped-agg
  pandas UDF receives the whole group as a pandas Series). Bounded
  groups (per-key stats over reasonable keys) are fine; for unbounded
  groups use an algebraic reformulation (partial aggregates composed
  with built-ins — see ``operators/sketches.py`` and linalg.moments
  for the pattern) instead.
- Prefer built-in JVM aggregates whenever an algebraic form exists;
  a pandas UDAF costs an Arrow transfer per group. These exist for
  the cases where the statistic genuinely needs the whole sample
  (trimmed/winsorized means, exact MAD) and the groups are bounded.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def trimmed_mean_10(v: pd.Series) -> float:
    """10% two-sided trimmed mean (scipy-style proportiontocut=0.1:
    cut floor(0.1*n) from each tail)."""
    a = np.sort(v.to_numpy(dtype="float64"))
    k = int(0.1 * len(a))
    return float(np.mean(a[k : len(a) - k])) if len(a) > 2 * k else float("nan")


@pandas_udf("double")
def median_abs_deviation(v: pd.Series) -> float:
    """Exact MAD (median of |x - median|) — the robust spread
    statistic; needs the full sample, hence a UDAF."""
    a = v.to_numpy(dtype="float64")
    med = np.median(a)
    return float(np.median(np.abs(a - med)))


def winsorized_mean(lo_q: float = 0.05, hi_q: float = 0.95) -> Column:
    """Factory: winsorized-mean UDAF with the clamp quantiles baked
    in (pandas_udf can't take scalar args at call time)."""

    @pandas_udf("double")
    def _wmean(v: pd.Series) -> float:
        a = v.to_numpy(dtype="float64")
        lo, hi = np.quantile(a, [lo_q, hi_q])
        return float(np.mean(np.clip(a, lo, hi)))

    return _wmean
