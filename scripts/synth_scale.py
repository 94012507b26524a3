"""Generate a synthetic ~sf1 from sf0.1: lineitem/orders/events
replicated REPL× with consistently shifted keys (orderkeys shift
together so joins stay valid; part/supplier/customer dims unchanged).

Usage:
    python scripts/synth_scale.py /root/testdata/sf0.1 /tmp/synth_sf1
    ZS_TEST_SF_DIR=/tmp/synth_sf1 python -m pytest tests/test_oracle.py -q

This is the SCALE.md 10× verification fixture: the oracle corpus must
hash-match DuckDB on a key distribution the queries were never
authored against.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from zappy_spark.session import TABLES, get_session, load_table  # noqa: E402

REPL = 10
SHIFTED = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
}


def main(src: str, dst: str) -> None:
    spark = get_session(app_name="synth-scale", cpus=32, shuffle_partitions=32)
    for name in TABLES:
        df = load_table(spark, src, name)
        if name in SHIFTED:
            keys = SHIFTED[name]
            span = df.agg(*[F.max(k) for k in keys]).first()[0] + 1
            parts = []
            for i in range(REPL):
                p = df
                for k in keys:
                    p = p.withColumn(k, F.col(k) + F.lit(i * span))
                parts.append(p)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        else:
            out = df
        out.write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
        print(name, "->", f"{dst}/{name}.parquet")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
