"""Generate a synthetic ~sf1 from sf0.1: fact tables replicated REPL×
with consistently shifted keys (orderkeys shift together so joins stay
valid; part/supplier/customer dims unchanged). documents/embeddings
replicas are additionally CONTENT-perturbed (text suffix / first
embedding component offset) so dedup queries see 10× corpus size, not
10 verbatim clones of every row — clone floods would trivially explode
every near-dup bucket instead of stressing the realistic shape.

Usage:
    python scripts/synth_scale.py /root/testdata/sf0.1 /tmp/synth_sf1
    ZS_TEST_SF_DIR=/tmp/synth_sf1 python -m pytest tests/test_oracle.py -q

This is the SCALE.md 10× verification fixture: the oracle corpus must
hash-match DuckDB on a key distribution the queries were never
authored against. (The two deliberately-quadratic oracle twins,
l06/d05, are skipped at this scale — tests/conftest.py
QUADRATIC_ORACLES — their production paths d06/v01/v02 run in full.)
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
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def perturb(name: str, df, i: int):
    """Content-perturb replica i (identity for i == 0)."""
    if i == 0:
        return df
    if name == "documents":
        return df.withColumn("text", F.concat("text", F.lit(f" r{i}")))
    if name == "embeddings":
        return df.withColumn(
            "embedding",
            F.expr(
                f"transform(embedding, (x, k) -> CAST(CASE WHEN k = 0 "
                f"THEN x + {i} * 0.001 ELSE x END AS FLOAT))"
            ),
        )
    return df


def main(src: str, dst: str) -> None:
    spark = get_session(app_name="synth-scale", cpus=32, shuffle_partitions=32)
    for name in TABLES:
        df = load_table(spark, src, name)
        if name in SHIFTED:
            keys = SHIFTED[name]
            span = df.agg(*[F.max(k) for k in keys]).first()[0] + 1
            parts = []
            for i in range(REPL):
                p = perturb(name, df, i)
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
