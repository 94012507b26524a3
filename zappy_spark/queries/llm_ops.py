"""L-series: LLM-data-pipeline operators (beyond-reference).

Exact dedup, vector similarity (the zappy dense-matrix analog:
``embeddings`` is a 500×64 float32 matrix in DataFrame encoding),
text statistics, tokenization. All vector math in DOUBLE (Appendix A).

Scale notes (100 TB):
- L2/L8 top-k vs one query vector: the query vector is a broadcast
  1-row aggregate → brute-force scan is embarrassingly parallel and
  the ORDER BY+LIMIT compiles to TakeOrderedAndProject. The
  approximate scale path (LSH bucketing, then exact re-rank) lives in
  ``zappy_spark.operators.similarity``.
- L6 threshold self-join is O(n²) by semantics; the scale path is the
  banded-LSH pre-filter in ``operators.dedup`` — this exact form is
  the correctness oracle for it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zappy_spark.queries._util import cosine, euclidean, t


def l1(spark: SparkSession, d: str) -> DataFrame:
    """JSON field extract + agg. Spelled via ``get_json_object``:
    round-7 re-measurement (build+collect, median-of-7, the bench
    protocol) put it at 426 ms vs VARIANT's 610 ms and from_json's
    575 ms at sf0.1 — for a SINGLE typed extraction the string path
    wins because parse_json's plan-analysis and binary-encode cost
    outweighs the one-field parse (this reverses the round-4 note
    that preferred VARIANT; kernel-only times agree: 52 vs 72 ms).
    VARIANT's binary-parse advantage is real for MULTI-field
    extraction and is demonstrated where it wins, in l11's pipeline.
    Result-identical to the VARIANT path (pinned in test_operators
    variant tests)."""
    ev = t(spark, d, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(
                F.avg(F.get_json_object("props", "$.k").cast("int")), 3
            ).alias("k")
        )
        .orderBy("event_type")
    )


def l2(spark: SparkSession, d: str) -> DataFrame:
    import math

    from zappy_spark.queries._util import dot, norm

    emb = t(spark, d, "embeddings")
    # The query vector is ONE row: fetch it at build time and ship it
    # as an array literal + scalar norm — no exchange, no extra job;
    # the literal rides the task closure (same pattern as
    # similarity.cosine_topk). The fetch itself reads the single row
    # driver-side via pyarrow (~5 ms) instead of a Spark job
    # (~150 ms for schedule+scan, round-4 profiling) — reading one
    # query row from the store never needs the cluster.
    import pyarrow.dataset as ds

    tab = ds.dataset(f"{d}/embeddings.parquet").to_table(
        filter=ds.field("vec_id") == 0, columns=["embedding"]
    )
    qv = [float(x) for x in tab.column(0)[0].as_py()]
    qn = math.sqrt(sum(x * x for x in qv))
    qc = F.array(*[F.lit(x) for x in qv])
    return (
        emb.filter(F.col("vec_id") != 0)
        .select(
            "vec_id",
            F.round(
                dot("embedding", qc) / (norm("embedding") * F.lit(qn)), 4
            ).alias("sim"),
        )
        .orderBy(F.desc("sim"), "vec_id")
        .limit(10)
    )


def l3(spark: SparkSession, d: str) -> DataFrame:
    docs = t(spark, d, "documents")
    words = F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "))) + 1
    return (
        docs.groupBy("lang")
        .agg(F.sum(words).alias("words"))
        .orderBy("lang")
    )


def l4(spark: SparkSession, d: str) -> DataFrame:
    """Exact dedup via content hash — count-distinct form; the
    materializing form (keep one representative per hash) lives in
    operators.dedup.exact_dedup."""
    docs = t(spark, d, "documents")
    return docs.agg(
        F.count("*").alias("total"),
        F.countDistinct(F.md5("text")).alias("uniq"),
    )


def l5(spark: SparkSession, d: str) -> DataFrame:
    docs = t(spark, d, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("c"),
            F.round(F.avg("n_chars"), 3).alias("ac"),
            F.min("n_chars").alias("mn"),
            F.max("n_chars").alias("mx"),
        )
        .orderBy("lang")
    )


def l6(spark: SparkSession, d: str) -> DataFrame:
    """Cosine-threshold self-join (exact, O(n²)) — oracle for the LSH
    near-dup path.

    r12 shape (see d05): per-row norms projected before the pair
    join — ``dot/(na·nb)`` is bit-identical to ``cosine`` but O(n)
    norm evaluations instead of O(n²) — the streamed side is spread
    across cores (guide §2.5, single-row-group input) and the
    OTHER side is explicitly broadcast so the build side can never
    flip onto the spread side (a flip serializes the whole O(n²)
    loop into one task — observed 6 s vs 174 s run-to-run). The
    cosine threshold is counted in the AGGREGATE
    (``sum(cond::bigint)`` ≡ ``filter(cond).count(*)``) instead of
    a filter, which Catalyst would push into the join condition —
    one giant un-splittable generated predicate method; as an agg
    projection it codegen-splits normally."""
    from zappy_spark.queries._util import spread
    from zappy_spark.operators.vecmath import EMBED_DIM, dot, norm

    emb = t(spark, d, "embeddings")
    a = spread(emb).select(
        F.col("vec_id").alias("i"),
        F.col("embedding").alias("ea"),
        norm("embedding").alias("_na"),
    )
    b = emb.select(
        F.col("vec_id").alias("j"),
        F.col("embedding").alias("eb"),
        norm("embedding").alias("_nb"),
    )
    pairs = a.join(F.broadcast(b), F.col("i") < F.col("j"))
    hit = (
        dot("ea", "eb", dim=EMBED_DIM) / (F.col("_na") * F.col("_nb"))
        > 0.3
    )
    return pairs.agg(
        F.coalesce(F.sum(hit.cast("bigint")), F.lit(0).cast("bigint")).alias(
            "c"
        )
    )


def l7(spark: SparkSession, d: str) -> DataFrame:
    docs = t(spark, d, "documents")
    return (
        docs.filter(
            F.col("n_chars").between(100, 400) & (F.length("text") > 60)
        )
        .groupBy("source")
        .agg(F.count("*").alias("c"))
        .orderBy("source")
        .limit(100)
    )


def l8(spark: SparkSession, d: str) -> DataFrame:
    emb = t(spark, d, "embeddings")
    q = F.broadcast(
        emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    )
    return (
        emb.crossJoin(q)
        .filter(F.col("vec_id") != 0)
        .select("vec_id", F.round(euclidean("embedding", "qv"), 4).alias("d"))
        .orderBy("d", "vec_id")
        .limit(10)
    )


def l9(spark: SparkSession, d: str) -> DataFrame:
    """Max-inner-product search top-k (round 4b): the retrieval
    metric for UNNORMALIZED embeddings (recommendation scores,
    learned rerankers) — distinct from cosine (l02) and euclidean
    (l08) because magnitude matters. Same scale shape as both: 1-row
    broadcast query, embarrassingly-parallel scan,
    TakeOrderedAndProject."""
    from zappy_spark.queries._util import dot

    emb = t(spark, d, "embeddings")
    q = F.broadcast(
        emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    )
    return (
        emb.crossJoin(q)
        .filter(F.col("vec_id") != 0)
        .select("vec_id", F.round(dot("embedding", "qv"), 4).alias("ip"))
        .orderBy(F.desc("ip"), "vec_id")
        .limit(10)
    )


def l10(spark: SparkSession, d: str) -> DataFrame:
    docs = t(spark, d, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "tok")
        .limit(20)
    )


def l11(spark: SparkSession, d: str) -> DataFrame:
    """Semi-structured props via the VARIANT type (Spark 4):
    ``parse_json`` ONCE into a variant column, then bind every typed
    extraction (``variant_get``) against that single parse. At 100 TB
    this is the ingest-time contract for semi-structured columns —
    parse each payload exactly once (ideally at write time, persisting
    the variant column in parquet), and let every downstream extract
    be a binary field access instead of a per-query string re-parse;
    N extractions cost one parse instead of N ``get_json_object``
    scans of the raw string. The DuckDB oracle replays the same
    aggregates over ``json_extract_string`` casts."""
    ev = t(spark, d, "events")
    parsed = ev.select("event_type", F.parse_json("props").alias("v"))
    k = F.variant_get("v", "$.k", "int")
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.when(k % 2 == 0, 1)).alias("even_k"),
            F.round(F.avg(k), 3).alias("avg_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


QUERIES = {
    "l01_json_extract": l1,
    "l02_cosine_topk": l2,
    "l03_word_counts": l3,
    "l04_exact_dedup_hash": l4,
    "l05_doc_stats": l5,
    "l06_similarity_self_join": l6,
    "l07_quality_filter": l7,
    "l08_euclidean_topk": l8,
    "l09_mips_topk": l9,
    "l10_term_frequency": l10,
    "l11_variant_pipeline": l11,
}

ORACLE = {
    "l01_json_extract": (
        "SELECT event_type, "
        "ROUND(AVG(CAST(json_extract_string(props,'$.k') AS INT)),3) k "
        "FROM events GROUP BY 1 ORDER BY 1"
    ),
    "l02_cosine_topk": (
        # DOUBLE[] casts: Spark computes the lambda reduce in double, so
        # the oracle must too — FLOAT[] cosine returns float32, which
        # both computes and materializes differently (dtype parity,
        # tests/test_dtypes.py).
        "WITH q AS (SELECT CAST(embedding AS DOUBLE[]) qv FROM embeddings "
        "WHERE vec_id=0) "
        "SELECT vec_id, "
        "ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),qv),4) sim "
        "FROM embeddings, q WHERE vec_id<>0 ORDER BY sim DESC, vec_id LIMIT 10"
    ),
    "l03_word_counts": (
        # CAST AS BIGINT: DuckDB SUM(int) is HUGEINT (float64 in pandas);
        # Spark SUM(int) is LONG — align to int64 (dtype parity).
        "SELECT lang, "
        "CAST(SUM(length(text)-length(replace(text,' ',''))+1) AS BIGINT) words "
        "FROM documents GROUP BY lang ORDER BY lang"
    ),
    "l04_exact_dedup_hash": (
        "SELECT COUNT(*) total, COUNT(DISTINCT md5(text)) uniq FROM documents"
    ),
    "l05_doc_stats": (
        "SELECT lang, COUNT(*) c, ROUND(AVG(n_chars),3) ac, MIN(n_chars) mn, "
        "MAX(n_chars) mx FROM documents GROUP BY lang ORDER BY lang"
    ),
    "l06_similarity_self_join": (
        "WITH p AS (SELECT a.vec_id i, b.vec_id j, "
        "list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),"
        "CAST(b.embedding AS DOUBLE[])) s "
        "FROM embeddings a JOIN embeddings b ON a.vec_id<b.vec_id) "
        "SELECT COUNT(*) c FROM p WHERE s>0.3"
    ),
    "l07_quality_filter": (
        "SELECT source, COUNT(*) c FROM documents "
        "WHERE n_chars BETWEEN 100 AND 400 AND LENGTH(text)>60 "
        "GROUP BY source ORDER BY source LIMIT 100"
    ),
    "l08_euclidean_topk": (
        "WITH q AS (SELECT CAST(embedding AS DOUBLE[]) qv FROM embeddings "
        "WHERE vec_id=0) "
        "SELECT vec_id, ROUND(list_distance(CAST(embedding AS DOUBLE[]),qv),4) d "
        "FROM embeddings, q WHERE vec_id<>0 ORDER BY d, vec_id LIMIT 10"
    ),
    "l09_mips_topk": (
        "WITH q AS (SELECT CAST(embedding AS DOUBLE[]) qv FROM embeddings "
        "WHERE vec_id=0) "
        "SELECT vec_id, ROUND(list_inner_product("
        "CAST(embedding AS DOUBLE[]), qv), 4) ip "
        "FROM embeddings, q WHERE vec_id<>0 "
        "ORDER BY ip DESC, vec_id LIMIT 10"
    ),
    "l10_term_frequency": (
        "SELECT tok, COUNT(*) c FROM "
        "(SELECT UNNEST(string_split(text,' ')) tok FROM documents) t "
        "WHERE tok<>'' GROUP BY tok ORDER BY c DESC, tok LIMIT 20"
    ),
    "l11_variant_pipeline": (
        # CAST AS INT (not BIGINT): variant_get(..., 'int') yields
        # int32, so min/max must be INTEGER both sides (dtype parity).
        "SELECT event_type, "
        "COUNT(CASE WHEN CAST(json_extract_string(props,'$.k') AS INT)"
        "%2=0 THEN 1 END) even_k, "
        "ROUND(AVG(CAST(json_extract_string(props,'$.k') AS INT)),3) avg_k, "
        "MIN(CAST(json_extract_string(props,'$.k') AS INT)) min_k, "
        "MAX(CAST(json_extract_string(props,'$.k') AS INT)) max_k "
        "FROM events GROUP BY 1 ORDER BY 1"
    ),
}
