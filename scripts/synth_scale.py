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


PLANT_EVERY = 50  # one 3-doc span-dup chain per 50 base docs


def _chain_text(i, salt: str = ""):
    """Planted TRANSITIVE span-dup chain text for replica role i
    (round-10, VERDICT r9 item 2): the suffix perturbation destroys
    organic span-duplicate clusters (every span shared by all 10
    replicas of a doc exceeds d50's max_df=8 cap), leaving the
    flagship dedup-ledger flow scale-exercised only as "doesn't
    crash". For every PLANT_EVERY-th base doc, replicas 1/2/3
    become a chain A~B~C: A = 9 x-tokens (3 spans), B = the same 9
    x-tokens + 9 y-tokens (6 spans), C = the 9 y-tokens + a 3-token
    z tail. A and B share exactly the 3 x-spans, B and C exactly
    the 3 y-spans, A and C share NOTHING — only the transitive
    closure clusters them (the pairwise-dedup failure mode d50
    exists to catch). Span df = 2 per shared span, far under the
    cap; tokens carry the base doc_id so chains never cross, and
    ``salt`` (main() passes the pass's id shift) so DOUBLE-applying
    the generator (sf0.1 → 10× → 100×) never reuses a span: pass-1
    chain docs re-enter pass 2 as 10 suffix-perturbed copies whose
    spans the df cap rightly kills, and an unsalted pass-2 chain
    for the same base id would collide with them and vanish too —
    exactly the 100-chains-missing failure the 100× assertion
    caught."""
    d = F.col("doc_id").cast("string")
    xs = [F.concat(F.lit(f"px{salt}v"), d, F.lit(f"n{k}")) for k in range(9)]
    ys = [F.concat(F.lit(f"py{salt}v"), d, F.lit(f"n{k}")) for k in range(9)]
    zs = [F.concat(F.lit(f"pz{salt}v"), d, F.lit(f"n{k}")) for k in range(3)]
    toks = {1: xs, 2: xs + ys, 3: ys + zs}[i]
    return F.concat_ws(" ", *toks)


def perturb(name: str, df, i: int, salt: str = "", whale: int | None = None):
    """Content-perturb replica i (identity for i == 0)."""
    if i == 0:
        return df
    if name == "orders" and whale is not None:
        # Round-11 (VERDICT r10 item 6, the d50 planting precedent):
        # replication dilutes every customer's value share below
        # r48's 0.1% HAVING threshold (sf0.1's top share is already
        # under it), leaving the Q11 value-share arithmetic
        # scale-exercised only as "returns empty". Re-keying
        # ~1/173 of each replica's orders (by o_orderkey residue —
        # deterministic, replay-stable) onto the base table's MIN
        # custkey plants ONE whale holding ~0.5% of global value:
        # referential integrity holds (the custkey exists), the
        # share sits 5x above the threshold (no boundary risk), and
        # a second generator pass (10x -> 100x) re-plants onto the
        # same custkey, so the whale survives composition.
        return df.withColumn(
            "o_custkey",
            F.when(
                F.col("o_orderkey") % 173 == 0, F.lit(whale)
            ).otherwise(F.col("o_custkey")),
        )
    if name == "documents":
        out = df.withColumn("text", F.concat("text", F.lit(f" r{i}")))
        if i in (1, 2, 3):
            planted = (F.col("doc_id") % PLANT_EVERY) == 0
            out = out.withColumn(
                "text",
                F.when(planted, _chain_text(i, salt)).otherwise(F.col("text")),
            ).withColumn(
                # keep n_chars == length(text) (the generator's
                # invariant) so d50's keep-best picks B, the longest
                "n_chars",
                F.when(planted, F.length("text").cast("bigint")).otherwise(
                    F.col("n_chars")
                ),
            )
        return out
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
            whale = (
                df.agg(F.min("o_custkey")).first()[0]
                if name == "orders"
                else None
            )
            parts = []
            for i in range(REPL):
                p = perturb(name, df, i, salt=str(span), whale=whale)
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
