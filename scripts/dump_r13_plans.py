"""Dump .explain('formatted') for named queries into plans/r13/.

Usage: python scripts/dump_r13_plans.py before|after [name ...]
With no names, dumps the 10 bench queries (bench.BENCH mapping).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import BENCH  # noqa: E402
from zappy_spark.queries import QUERIES  # noqa: E402
from zappy_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    suffix = sys.argv[1]
    assert suffix in ("before", "after"), "arg 1 must be before|after"
    names = sys.argv[2:] or list(BENCH.values())
    outdir = Path(__file__).resolve().parents[1] / "plans" / "r13"
    outdir.mkdir(parents=True, exist_ok=True)
    spark = get_session(app_name="dump-r13-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (outdir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote {name}_{suffix}.txt")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
