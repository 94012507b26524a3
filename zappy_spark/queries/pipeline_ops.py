"""D/T/V-series: training-data pipeline operators as corpus entries.

Declared queries over ``documents`` / ``embeddings`` exercising
``zappy_spark.operators`` (dedup, text analysis, similarity). Every
hash function used is md5-over-string, so DuckDB replays the exact
computation — the oracles here verify the *operators themselves*,
not just SQL parity. Entries whose physical plan can't be expressed
portably (random-hyperplane LSH, banded candidate generation) are
rows-only here and property-tested in tests/test_operators.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zappy_spark.operators import dedup, similarity, text
from zappy_spark.queries._util import cosine, t

# ---------------------------------------------------------------- dedup


def d01(spark: SparkSession, d: str) -> DataFrame:
    return (
        dedup.exact_dedup(t(spark, d, "documents"), "text", "doc_id")
        .orderBy("h")
        .limit(100)
    )


def d02(spark: SparkSession, d: str) -> DataFrame:
    sig = dedup.minhash_signature(
        t(spark, d, "documents"), "text", "doc_id", num_hashes=4, k=3
    )
    return (
        sig.select(
            "doc_id",
            *[F.element_at("sig", i + 1).alias(f"s{i}") for i in range(4)],
        )
        .orderBy("doc_id")
        .limit(100)
    )


def d03(spark: SparkSession, d: str) -> DataFrame:
    return (
        dedup.simhash_bits(t(spark, d, "documents"), "text", "doc_id", bits=16)
        .orderBy("doc_id")
        .limit(100)
    )


def d04(spark: SparkSession, d: str) -> DataFrame:
    """Exact n-gram Jaccard between consecutive doc ids (the verify
    stage of near-dup, run on a deterministic linear pairing)."""
    docs = t(spark, d, "documents")
    grams = docs.select(
        "doc_id", dedup.word_shingles(F.col("text"), 3).alias("grams")
    ).filter(F.size("grams") > 0)
    a = grams.select(F.col("doc_id").alias("i"), F.col("grams").alias("ga"))
    b = grams.select(F.col("doc_id").alias("j"), F.col("grams").alias("gb"))
    return (
        a.join(b, F.col("j") == F.col("i") + 1)
        .select("i", F.round(dedup.ngram_jaccard("ga", "gb"), 6).alias("jac"))
        .orderBy("i")
        .limit(100)
    )


def d05(spark: SparkSession, d: str) -> DataFrame:
    """Embedding-cosine near-dup: top pairs by similarity (exact)."""
    emb = t(spark, d, "embeddings")
    a = emb.select(F.col("vec_id").alias("i"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("j"), F.col("embedding").alias("vb"))
    return (
        a.join(b, F.col("i") < F.col("j"))
        .select("i", "j", F.round(cosine("va", "vb"), 4).alias("sim"))
        .orderBy(F.desc("sim"), "i", "j")
        .limit(20)
    )


def d06(spark: SparkSession, d: str) -> DataFrame:
    """MinHash-LSH near-dup pipeline end-to-end — signatures, banded
    bucket join, exact-Jaccard verify. Fully oracle-checked: every
    hash is portable md5, so DuckDB replays the identical pipeline
    (signature → band → candidate → verify) and must produce the
    same pair set."""
    pairs = dedup.near_dup_pairs(
        t(spark, d, "documents"), "text", "doc_id", threshold=0.5
    )
    return pairs.select(
        "i", "j", F.round("jac", 6).alias("jac")
    ).orderBy("i", "j")


# ----------------------------------------------------------- text ops


def t01(spark: SparkSession, d: str) -> DataFrame:
    docs = t(spark, d, "documents")
    return (
        docs.select(
            "doc_id",
            # bigint: Spark size()→INT vs DuckDB len()→BIGINT — width
            # alignment for dtype parity (tests/test_dtypes.py)
            text.token_count_ws("text").cast("bigint").alias("n_ws"),
            text.token_count_re("text").cast("bigint").alias("n_re"),
        )
        .orderBy("doc_id")
        .limit(100)
    )


def t02(spark: SparkSession, d: str) -> DataFrame:
    feat = text.quality_features(t(spark, d, "documents"), "text")
    return (
        feat.select(
            "doc_id",
            F.col("q_words").cast("bigint").alias("q_words"),
            "q_mean_word_len",
            "q_punct_ratio",
            "q_alpha_ratio",
            "q_stopword_ratio",
        )
        .orderBy("doc_id")
        .limit(100)
    )


def t03(spark: SparkSession, d: str) -> DataFrame:
    return (
        text.fingerprint(t(spark, d, "documents"), "text", "doc_id", k=8)
        .orderBy("doc_id")
        .limit(100)
    )


def t04(spark: SparkSession, d: str) -> DataFrame:
    """Language-ID heuristic (rows-only: profile tables are engine
    code, not SQL; accuracy is unit-tested on real-language samples)."""
    pred = text.lang_id(t(spark, d, "documents"), "text")
    return (
        pred.select("doc_id", "lang_pred", "lang_conf")
        .orderBy("doc_id")
        .limit(100)
    )


def t05(spark: SparkSession, d: str) -> DataFrame:
    """Edit distance between consecutive docs (capped prefix — the
    classic fuzzy-match verify primitive; full-text edit distance is
    O(len²) per pair, so production use is on bounded fields)."""
    docs = t(spark, d, "documents")
    a = docs.select(F.col("doc_id").alias("i"), F.col("text").alias("ta"))
    b = docs.select(F.col("doc_id").alias("j"), F.col("text").alias("tb"))
    return (
        a.join(b, F.col("j") == F.col("i") + 1)
        .select(
            "i",
            F.levenshtein(
                F.substring("ta", 1, 40), F.substring("tb", 1, 40)
            ).cast("bigint").alias("d"),
        )
        .orderBy("i")
        .limit(100)
    )


def t06(spark: SparkSession, d: str) -> DataFrame:
    """Deterministic content-hash train/val split distribution."""
    from zappy_spark.operators.pipeline import content_split

    docs = content_split(t(spark, d, "documents"), "text")
    return (
        docs.groupBy("split")
        .agg(F.count("*").alias("c"), F.min("doc_id").alias("mn"))
        .orderBy("split")
    )


# -------------------------------------------------------- similarity


def v01(spark: SparkSession, d: str) -> DataFrame:
    """IVF-style ANN probe: exact top-k restricted to the query's
    coarse partition (label); on a partitioned table this is file
    pruning, scanning 1/nlist of the data."""
    emb = t(spark, d, "embeddings")
    q = F.broadcast(
        emb.filter(F.col("vec_id") == 0).select(
            F.col("embedding").alias("qv"), F.col("label").alias("ql")
        )
    )
    return (
        emb.crossJoin(q)
        .filter((F.col("vec_id") != 0) & (F.col("label") == F.col("ql")))
        .select("vec_id", F.round(cosine("embedding", "qv"), 4).alias("sim"))
        .orderBy(F.desc("sim"), "vec_id")
        .limit(10)
    )


def v02(spark: SparkSession, d: str) -> DataFrame:
    """Random-hyperplane LSH ANN (rows-only: the seeded planes are
    engine literals; recall vs exact top-k is property-tested)."""
    emb = t(spark, d, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    out = similarity.rp_lsh_topk(
        emb.filter(F.col("vec_id") != 0),
        "embedding",
        "vec_id",
        qvec,
        k=10,
        num_planes=4,
        probe_radius=2,
    )
    return out.select("vec_id", F.round("sim", 4).alias("sim"))


QUERIES = {
    "d01_exact_dedup_groups": d01,
    "d02_minhash_signature": d02,
    "d03_simhash": d03,
    "d04_ngram_jaccard": d04,
    "d05_embedding_neardup": d05,
    "d06_lsh_neardup_pipeline": d06,
    "t01_token_counts": t01,
    "t02_quality_features": t02,
    "t03_fingerprint": t03,
    "t04_lang_id": t04,
    "t05_levenshtein": t05,
    "t06_content_split": t06,
    "v01_ivf_label_topk": v01,
    "v02_rp_lsh_ann": v02,
}


def _simhash_oracle(bits: int = 16) -> str:
    votes = ", ".join(
        f"SUM(CASE WHEN substr(m,{b + 1},1)>='8' THEN 1 ELSE -1 END) v{b}"
        for b in range(bits)
    )
    concat = ", ".join(
        f"CASE WHEN v{b}>0 THEN '1' ELSE '0' END" for b in range(bits)
    )
    return (
        "WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) tk "
        "FROM documents), "
        "h AS (SELECT doc_id, md5(tk) m FROM tok WHERE tk<>''), "
        f"v AS (SELECT doc_id, {votes} FROM h GROUP BY doc_id) "
        f"SELECT doc_id, concat({concat}) sh FROM v ORDER BY doc_id LIMIT 100"
    )


def _lsh_pipeline_oracle(num_hashes: int = 16, bands: int = 4) -> str:
    """DuckDB replica of near_dup_pairs(num_hashes=16, bands=4,
    threshold=0.5): same md5 hash family, same band keys."""
    rows = num_hashes // bands
    sig_cols = ", ".join(
        f"MIN(md5(concat('{i}|',g))) s{i}" for i in range(num_hashes)
    )
    band_exprs = ", ".join(
        "md5(concat('%d','|',%s))"
        % (b, ",'|',".join(f"s{b * rows + r}" for r in range(rows)))
        for b in range(bands)
    )
    return (
        "WITH t AS (SELECT doc_id, string_split(text,' ') ws FROM documents), "
        "sh AS (SELECT doc_id, concat(ws[CAST(i AS INT)],' ',"
        "ws[CAST(i AS INT)+1],' ',ws[CAST(i AS INT)+2]) g "
        "FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws)-2)) i "
        "FROM t WHERE len(ws)>=3) x), "
        f"sig AS (SELECT doc_id, {sig_cols} FROM sh GROUP BY doc_id), "
        f"band AS (SELECT doc_id, unnest([{band_exprs}]) bucket FROM sig), "
        "cand AS (SELECT DISTINCT a.doc_id i, b.doc_id j FROM band a "
        "JOIN band b ON a.bucket=b.bucket AND a.doc_id<b.doc_id), "
        "grams AS (SELECT doc_id, list(g) gs FROM sh GROUP BY doc_id), "
        "pairs AS (SELECT i, j, "
        "len(list_intersect(list_distinct(ga.gs), list_distinct(gb.gs)))*1.0"
        "/len(list_distinct(list_concat(ga.gs, gb.gs))) jac "
        "FROM cand JOIN grams ga ON ga.doc_id=i JOIN grams gb ON gb.doc_id=j) "
        "SELECT i, j, ROUND(jac,6) jac FROM pairs WHERE jac>=0.5 ORDER BY i, j"
    )


_SHINGLE_CTE = (
    "WITH t AS (SELECT doc_id, string_split(text,' ') ws FROM documents), "
    "sh AS (SELECT doc_id, concat(ws[CAST(i AS INT)],' ',ws[CAST(i AS INT)+1],"
    "' ',ws[CAST(i AS INT)+2]) g "
    "FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws)-2)) i "
    "FROM t WHERE len(ws)>=3) x) "
)

ORACLE = {
    "d01_exact_dedup_groups": (
        "SELECT md5(text) h, MIN(doc_id) keep, COUNT(*) n FROM documents "
        "GROUP BY 1 ORDER BY h LIMIT 100"
    ),
    "d02_minhash_signature": _SHINGLE_CTE
    + (
        "SELECT doc_id, MIN(md5(concat('0|',g))) s0, MIN(md5(concat('1|',g))) s1, "
        "MIN(md5(concat('2|',g))) s2, MIN(md5(concat('3|',g))) s3 "
        "FROM sh GROUP BY doc_id ORDER BY doc_id LIMIT 100"
    ),
    "d03_simhash": _simhash_oracle(16),
    "d04_ngram_jaccard": (
        "WITH t AS (SELECT doc_id, string_split(text,' ') ws FROM documents), "
        "sh AS (SELECT doc_id, list(concat(ws[CAST(i AS INT)],' ',"
        "ws[CAST(i AS INT)+1],' ',ws[CAST(i AS INT)+2])) grams "
        "FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws)-2)) i "
        "FROM t WHERE len(ws)>=3) x GROUP BY doc_id) "
        "SELECT a.doc_id i, ROUND("
        "len(list_intersect(list_distinct(a.grams), list_distinct(b.grams)))*1.0"
        "/len(list_distinct(list_concat(a.grams,b.grams))),6) jac "
        "FROM sh a JOIN sh b ON b.doc_id=a.doc_id+1 ORDER BY i LIMIT 100"
    ),
    "d05_embedding_neardup": (
        "SELECT a.vec_id i, b.vec_id j, "
        "ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),"
        "CAST(b.embedding AS DOUBLE[])),4) sim "
        "FROM embeddings a JOIN embeddings b ON a.vec_id<b.vec_id "
        "ORDER BY sim DESC, i, j LIMIT 20"
    ),
    "t01_token_counts": (
        "SELECT doc_id, len(list_filter(string_split(text,' '), x -> x<>'')) n_ws, "
        r"len(regexp_extract_all(text,'[a-zA-Z0-9]+|[^a-zA-Z0-9\s]')) n_re "
        "FROM documents ORDER BY doc_id LIMIT 100"
    ),
    "t02_quality_features": (
        "WITH b AS (SELECT doc_id, text, length(text) n_chars, "
        "list_filter(string_split(text,' '), x -> x<>'') toks, "
        r"len(regexp_extract_all(text,'[^a-zA-Z0-9\s]')) n_punct, "
        "len(regexp_extract_all(text,'[a-zA-Z]')) n_alpha FROM documents) "
        "SELECT doc_id, len(toks) q_words, "
        "ROUND(list_aggregate(list_transform(toks, x -> length(x)),'sum')*1.0"
        "/greatest(len(toks),1),6) q_mean_word_len, "
        "ROUND(n_punct*1.0/greatest(n_chars,1),6) q_punct_ratio, "
        "ROUND(n_alpha*1.0/greatest(n_chars,1),6) q_alpha_ratio, "
        "ROUND(len(list_filter(toks, x -> x IN ('the','and','of','to','in','is',"
        "'that','it','with','a','an','for','on','as','are')))*1.0"
        "/greatest(len(toks),1),6) q_stopword_ratio "
        "FROM b ORDER BY doc_id LIMIT 100"
    ),
    "t03_fingerprint": (
        "SELECT doc_id, MIN(md5(substr(text, CAST(i AS INT), 8))) fp "
        "FROM (SELECT doc_id, text, "
        "unnest(generate_series(1, greatest(length(text)-7,1))) i "
        "FROM documents) x GROUP BY doc_id ORDER BY doc_id LIMIT 100"
    ),
    "d06_lsh_neardup_pipeline": _lsh_pipeline_oracle(16, 4),
    "t05_levenshtein": (
        "SELECT a.doc_id i, levenshtein(substr(a.text,1,40), substr(b.text,1,40)) d "
        "FROM documents a JOIN documents b ON b.doc_id=a.doc_id+1 "
        "ORDER BY i LIMIT 100"
    ),
    "t06_content_split": (
        "SELECT CASE WHEN substr(md5(text),1,1) < 'c' THEN 'train' ELSE 'val' "
        "END split, COUNT(*) c, MIN(doc_id) mn "
        "FROM documents GROUP BY 1 ORDER BY 1"
    ),
    "v01_ivf_label_topk": (
        "WITH q AS (SELECT embedding qv, label ql FROM embeddings WHERE vec_id=0) "
        "SELECT vec_id, ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),"
        "CAST(qv AS DOUBLE[])),4) sim "
        "FROM embeddings, q WHERE vec_id<>0 AND label=ql "
        "ORDER BY sim DESC, vec_id LIMIT 10"
    ),
    # t04, v02: rows-only (see docstrings) — no oracle entries.
}
