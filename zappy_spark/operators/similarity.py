"""Similarity search over embedding columns (array<float>).

Three tiers, trading recall for scan cost:

- ``cosine_topk``     — exact brute force. At 100 TB this is one
  embarrassingly-parallel scan + TakeOrderedAndProject (no global
  sort, no shuffle of the data); the right baseline and the oracle
  for the approximate tiers.
- ``ivf_topk``        — IVF-style: restrict the scan to the coarse
  partition(s) of the query (any partitioner column works; testdata
  uses ``label``). On disk this maps to partition pruning: store the
  table partitioned by the coarse key and Spark scans only matching
  files.
- ``rp_lsh_topk``     — random-hyperplane LSH: sign-bit bucket from
  R fixed Gaussian planes (seeded, shipped as literals), probe the
  query's bucket, exact re-rank inside. Recall is property-tested
  (tests/test_operators.py), not oracle-hashed.

All distance math in DOUBLE via JVM lambda expressions (Appendix A).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from zappy_spark.operators.vecmath import cosine, dot


def _qcol(query_vec) -> Column:
    return F.array(*[F.lit(float(v)) for v in query_vec])


def cosine_topk(
    df: DataFrame, vec_col: str, id_col: str, query_vec, k: int = 10
) -> DataFrame:
    """Exact brute-force cosine top-k vs a literal query vector."""
    q = _qcol(query_vec)
    return (
        df.select(
            F.col(id_col), cosine(F.col(vec_col), q).alias("sim")
        )
        .orderBy(F.desc("sim"), id_col)
        .limit(k)
    )


def matryoshka_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec,
    prefix_dim: int = 16,
    shortlist: int = 50,
    k: int = 10,
) -> DataFrame:
    """Matryoshka / prefix-dimension retrieval: rank candidates on
    the FIRST ``prefix_dim`` dimensions only (MRL-style embeddings
    front-load information, so the prefix is a usable coarse score),
    keep a ``shortlist``, then exact full-dim cosine re-rank. The
    scan-cost story at 100 TB: the coarse pass reads prefix_dim/dim
    of the float payload (a column-pruned prefix slice if the store
    splits the vector, or 1/4 of the lambda work here), and the full
    vectors are touched only for ``shortlist`` rows — same
    shape as the IVF/PQ re-rank tiers but with zero index build,
    which is why it's the default for freshly-embedded data.

    Deterministic: both passes round before ordering and tie-break
    on id; both compile to TakeOrderedAndProject (per-partition heap
    + k-row driver merge), never a global sort."""
    q = [float(x) for x in query_vec]
    qp = _qcol(q[:prefix_dim])
    qf = _qcol(q)
    pre = df.select(
        F.col(id_col),
        F.col(vec_col).alias("_v"),
        F.round(
            cosine(F.slice(F.col(vec_col), 1, prefix_dim), qp), 6
        ).alias("psim"),
    )
    short = pre.orderBy(F.desc("psim"), id_col).limit(shortlist)
    return (
        short.select(
            id_col,
            F.round(cosine(F.col("_v"), qf), 4).alias("sim"),
            "psim",
        )
        .orderBy(F.desc("sim"), F.col(id_col))
        .limit(k)
    )


def knn_join(
    candidates: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec_col: str,
    query_id_col: str,
    k: int = 10,
    round_digits: int | None = 4,
) -> DataFrame:
    """Batch kNN join: exact cosine top-k for EVERY query vector in
    ``queries`` (the realistic retrieval shape — a batch of queries,
    not one literal vector).

    Scale shape: the query side is broadcast (a query batch is small
    by definition), so the candidate scan stays embarrassingly
    parallel — one pass over candidates scoring all queries, then a
    per-query window top-k. The window partitions by query id, so the
    only shuffle is |candidates|×|queries| scored pairs hashed over
    query ids; with B queries that is B×n rows, never a global sort.
    For huge candidate sets, pre-filter with ``rp_lsh_topk``-style
    bucketing per query before the exact re-rank.

    Ranking uses the rounded similarity (plus id tiebreak) so results
    are reproducible across engines/architectures at the same digits.
    """
    from pyspark.sql import Window

    sim = cosine(F.col(vec_col), F.col(query_vec_col))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = candidates.join(F.broadcast(queries)).select(
        F.col(query_id_col), F.col(id_col), sim.alias("sim")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), id_col)
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= k)
    )


def mmr_rerank_batch(
    cands: DataFrame,
    qid_col: str,
    id_col: str,
    vec_col: str,
    rel_col: str,
    k: int = 3,
    lam: float = 0.7,
    mu: float = 0.3,
    round_digits: int = 4,
) -> DataFrame:
    """BATCH maximal-marginal-relevance diversity re-ranking (round
    9 — Carbonell & Goldstein 1998; the fully-distributed multi-
    query counterpart of the single-query driver-side ``mmr_rerank``
    below, which collects a shortlist² sim matrix per query and
    cannot batch): iteratively select ``k`` of each query's candidates,
    greedy argmax of lam·relevance − mu·max_sim_to_already_selected.
    ``lam``/``mu`` are SEPARATE parameters, not lam/(1−lam) — in
    IEEE doubles 1−0.7 ≠ 0.3, and the oracle writes the literal
    0.3, so deriving mu would diverge the engines at the last ulp.

    ``cands`` has one row per (query, candidate): query id,
    candidate id, candidate vector, relevance (pre-rounded, e.g.
    knn_join's round-4 sim). Pairwise candidate similarities are
    rounded to ``round_digits`` before scoring — the v08 discipline
    that makes every downstream comparison an identical-IEEE-ops
    decision on identical inputs in both engines (ties then break
    on the candidate id).

    Returns (qid, rnk, id, rel) for the selected rows.

    Scale: the selection loop is UNROLLED into k per-query window
    argmaxes over the candidate panel (|Q|·top_k rows after the ANN
    stage — panel-sized, never corpus-sized); each step joins the
    1-row-per-query picks back broadcast. No driver collects, no
    global sort."""
    from pyspark.sql import Window

    from zappy_spark.operators.vecmath import cosine

    cur = cands.select(
        F.col(qid_col).alias("_q"),
        F.col(id_col).alias("_c"),
        F.col(vec_col).alias("_v"),
        F.col(rel_col).alias("_rel"),
    )
    out = None
    sel_vecs: list[str] = []
    for rank in range(1, k + 1):
        if sel_vecs:
            sims = [
                F.round(cosine(F.col("_v"), F.col(sv)), round_digits)
                for sv in sel_vecs
            ]
            maxsim = sims[0] if len(sims) == 1 else F.greatest(*sims)
            score = F.lit(lam) * F.col("_rel") - F.lit(mu) * maxsim
        else:
            score = F.col("_rel")
        w = Window.partitionBy("_q").orderBy(score.desc(), F.col("_c"))
        pick = (
            cur.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("_q", "_c", "_v", "_rel")
        )
        row = pick.select(
            F.col("_q").alias(qid_col),
            F.lit(rank).cast("int").alias("rnk"),
            F.col("_c").alias(id_col),
            F.col("_rel").alias("rel"),
        )
        out = row if out is None else out.unionAll(row)
        if rank < k:
            sv = f"_sel{rank}"
            cur = cur.join(
                F.broadcast(
                    pick.select(
                        F.col("_q"), F.col("_c").alias("_pc"),
                        F.col("_v").alias(sv),
                    )
                ),
                "_q",
            ).filter(F.col("_c") != F.col("_pc")).drop("_pc")
            sel_vecs.append(sv)
    return out


def ivf_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    coarse_col: str,
    query_vec,
    query_coarse,
    k: int = 10,
) -> DataFrame:
    """IVF probe: exact top-k within the query's coarse partition.

    With the table written partitioned by ``coarse_col``, the filter
    prunes to one partition's files — the scan touches 1/nlist of
    the data."""
    return cosine_topk(
        df.filter(F.col(coarse_col) == query_coarse), vec_col, id_col, query_vec, k
    )


def rp_signature(vec_col: str | Column, planes: np.ndarray) -> Column:
    """Sign-bit signature string from R fixed hyperplanes (R×dim)."""
    bits = [
        F.when(dot(vec_col, _qcol(p)) >= 0, "1").otherwise("0") for p in planes
    ]
    return F.concat(*bits)


def make_planes(dim: int, num_planes: int = 8, seed: int = 42) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((num_planes, dim))


def _probe_sigs(qsig: str, radius: int) -> list[str]:
    """The query signature plus all signatures within Hamming
    distance ``radius`` (multi-probe LSH)."""
    sigs = {qsig}
    frontier = {qsig}
    for _ in range(radius):
        nxt = set()
        for s in frontier:
            for b in range(len(s)):
                flipped = s[:b] + ("0" if s[b] == "1" else "1") + s[b + 1 :]
                nxt.add(flipped)
        sigs |= nxt
        frontier = nxt
    return sorted(sigs)


def rp_lsh_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec,
    k: int = 10,
    num_planes: int = 8,
    seed: int = 42,
    probe_radius: int = 1,
) -> DataFrame:
    """Multi-probe LSH ANN: probe the query's sign bucket plus all
    buckets within ``probe_radius`` bit flips, exact re-rank inside.

    At scale the signature is precomputed and the table clustered /
    partitioned by it, so each probe is a partition-pruned scan of
    ~(1+R·num_planes)/2^num_planes of the data. Multi-probe trades a
    few extra bucket reads for much better recall than one bucket —
    the standard knob when vectors are weakly clustered."""
    dim = len(query_vec)
    planes = make_planes(dim, num_planes, seed)
    qsig = "".join(
        "1" if float(np.dot(p, np.asarray(query_vec, dtype=float))) >= 0 else "0"
        for p in planes
    )
    probes = _probe_sigs(qsig, probe_radius)
    bucketed = df.withColumn("_sig", rp_signature(vec_col, planes))
    return cosine_topk(
        bucketed.filter(F.col("_sig").isin(probes)), vec_col, id_col, query_vec, k
    )


def build_ann_index(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    path: str,
    num_planes: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> None:
    """Materialize the LSH index on disk: the table written
    partitioned by signature bucket. At 100 TB this is the point of
    the design — each probe is a partition-PRUNED scan (verified in
    tests via ``PartitionFilters`` in the plan), touching only
    matching bucket directories, ~(1+R·planes)/2^planes of files."""
    if dim is None:
        dim = df.select(F.size(vec_col)).first()[0]
    planes = make_planes(dim, num_planes, seed)
    # 's' prefix: an all-digit partition value would be re-inferred
    # as int on read (partition column type inference), breaking
    # string comparisons against rp_signature output
    (
        df.withColumn(
            "sig", F.concat(F.lit("s"), rp_signature(vec_col, planes))
        )
        .write.mode("overwrite")
        .partitionBy("sig")
        .parquet(path)
    )


def query_ann_index(
    spark,
    path: str,
    query_vec,
    k: int = 10,
    num_planes: int = 8,
    seed: int = 42,
    probe_radius: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe a built index: bucket filter (→ partition pruning on the
    sig directories) + exact cosine re-rank inside the probed buckets."""
    planes = make_planes(len(query_vec), num_planes, seed)
    qsig = "".join(
        "1" if float(np.dot(p, np.asarray(query_vec, dtype=float))) >= 0 else "0"
        for p in planes
    )
    probes = ["s" + p for p in _probe_sigs(qsig, probe_radius)]
    idx = spark.read.parquet(path).filter(F.col("sig").isin(probes))
    return cosine_topk(idx, vec_col, id_col, query_vec, k)


def similarity_join(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float,
    num_planes: int = 6,
    seed: int = 42,
    dim: int | None = None,
    exact: bool = False,
) -> DataFrame:
    """All-pairs cosine ≥ threshold.

    exact=True: full O(n²) self-join (the oracle; fine ≤ ~10⁵ rows).
    exact=False: LSH-blocked — pairs must share a sign bucket first,
    then exact cosine verifies. Misses cross-bucket pairs by design;
    recall is property-tested."""
    a = df.select(F.col(id_col).alias("i"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("j"), F.col(vec_col).alias("vb"))
    if exact:
        pairs = a.join(b, F.col("i") < F.col("j"))
    else:
        if dim is None:
            dim = df.select(F.size(vec_col)).first()[0]
        planes = make_planes(dim, num_planes, seed)
        sa = a.withColumn("_sa", rp_signature("va", planes))
        sb = b.withColumn("_sb", rp_signature("vb", planes))
        pairs = sa.join(
            sb, (F.col("_sa") == F.col("_sb")) & (F.col("i") < F.col("j"))
        )
    return pairs.select(
        "i", "j", cosine("va", "vb").alias("sim")
    ).filter(F.col("sim") >= threshold)


def l2_normalize(vec: str | Column) -> Column:
    """Unit-normalize an embedding (all-zero vectors pass through
    unchanged rather than dividing by zero). Pure array-lambda
    expression — scan-side, no Python.

    r12: the norm is LET-BOUND once per row (interpreted HOFs have
    no CSE — the fold was otherwise re-evaluated per ELEMENT,
    O(dim²) per row). Same ops, bit-identical output."""
    from zappy_spark.operators.vecmath import norm

    v = F.col(vec) if isinstance(vec, str) else vec

    def _scaled(n: Column) -> Column:
        return F.when(
            n > 0,
            F.transform(v, lambda x: x.cast("double") / n),
        ).otherwise(F.transform(v, lambda x: x.cast("double")))

    return F.element_at(F.transform(F.array(norm(v)), _scaled), 1)


def quantize_int8(vec: str | Column) -> Column:
    """Symmetric int8 quantization: q_i = round(v_i * 127 / max|v|)
    (all-zero vectors map to all-zero). Returns array<tinyint> —
    a 4× (float32) / 8× (float64) storage cut for ANN candidate
    tiers; pair with ``dequantize_int8`` to recover within 1/254
    of max|v| per component.

    r12: the scale is LET-BOUND once per row (see l2_normalize)."""
    v = F.col(vec) if isinstance(vec, str) else vec
    mx = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    scale = F.when(mx > 0, F.lit(127.0) / mx).otherwise(F.lit(0.0))

    def _q(s: Column) -> Column:
        return F.transform(
            v, lambda x: F.round(x.cast("double") * s).cast("tinyint")
        )

    return F.element_at(F.transform(F.array(scale), _q), 1)


def dequantize_int8(qvec: str | Column, max_abs: str | Column) -> Column:
    """Inverse of ``quantize_int8`` given the stored per-vector
    max|v| (keep it alongside the quantized column)."""
    mx = F.col(max_abs) if isinstance(max_abs, str) else max_abs
    return F.transform(
        qvec, lambda q: q.cast("double") * mx / F.lit(127.0)
    )


def kmeans_assign(
    df: DataFrame, vec_col: str, centroids: np.ndarray
) -> DataFrame:
    """Append ``cluster`` = index of the nearest centroid (squared
    L2). Centroids ship as literal arrays (broadcast by value);
    assignment is a scan-side JVM argmin — k lambda-expression
    distances, array_min + array_position (ties → lowest index,
    deterministic). No shuffle, no Python."""
    dists = [
        F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(float(c)) for c in cent]),
                lambda x, y: (x.cast("double") - y)
                * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        for cent in centroids
    ]
    darr = F.array(*dists)
    cluster = F.array_position(darr, F.array_min(darr)) - 1
    return df.withColumn("cluster", cluster.cast("int"))


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    max_iter: int = 10,
    tol: float = 1e-6,
) -> np.ndarray:
    """Distributed Lloyd's k-means — trains the coarse quantizer for
    a REAL IVF index (``build_ivf_index``), replacing the pre-labeled
    coarse key ``ivf_topk`` assumes.

    Deterministic: seeds are the k vectors with the smallest
    md5(id) (uniform, reproducible across runs/cluster sizes). Per
    iteration: assignment is the scan-side argmin of
    ``kmeans_assign``; the update is posexplode(vec) → ONE narrow
    hash aggregate on (cluster, pos) — the plan's width is constant
    in ``dim`` (VERDICT r3 wrong-2: the per-dimension-column
    spelling strained codegen past dim≈1k), map-side partials mean
    only k × dim numbers reach the driver, never rows. Driver state
    is k × dim floats; stops at ``max_iter`` or when the max
    centroid shift ≤ ``tol``."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    seeds = (
        df.select(
            F.col(vec_col).alias("_v"),
            F.md5(F.col(id_col).cast("string")).alias("_h"),
        )
        .orderBy("_h")
        .limit(k)
        .collect()
    )
    if len(seeds) < k:
        raise ValueError(f"need >= {k} rows, got {len(seeds)}")
    cents = np.array([list(r["_v"]) for r in seeds], dtype=np.float64)
    dim = cents.shape[1]
    for _ in range(max_iter):
        assigned = kmeans_assign(df, vec_col, cents)
        rows = (
            assigned.select(
                "cluster", F.posexplode(F.col(vec_col)).alias("pos", "x")
            )
            .groupBy("cluster", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        nxt = cents.copy()  # empty clusters keep their centroid
        touched = {r["cluster"] for r in rows}
        for c in touched:
            nxt[c] = 0.0
        for r in rows:
            nxt[r["cluster"], r["pos"]] = r["m"]
        shift = float(np.sqrt(((nxt - cents) ** 2).sum(axis=1)).max())
        cents = nxt
        if shift <= tol:
            break
    return cents


def build_ivf_index(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    path: str,
    k: int = 8,
    max_iter: int = 10,
) -> np.ndarray:
    """Train k-means centroids, assign every vector, and persist the
    table ``partitionBy("cluster")`` — probing then PRUNES to the
    probed clusters' files, scanning ~n_probe/k of the data (same
    layout contract as the RP-LSH index, but with data-adaptive
    cells). Centroids persist next to the data. Returns them."""
    cents = kmeans_fit(df, vec_col, id_col, k, max_iter)
    assigned = kmeans_assign(df, vec_col, cents)
    assigned.write.mode("overwrite").partitionBy("cluster").parquet(path)
    spark = df.sparkSession
    cent_rows = [(i, [float(x) for x in c]) for i, c in enumerate(cents)]
    spark.createDataFrame(
        cent_rows, "cluster int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(path + "_centroids")
    return cents


def query_ivf_index(
    spark,
    path: str,
    query_vec,
    k: int = 10,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe the IVF index: rank centroids driver-side (a k×dim numpy
    op), read ONLY the ``n_probe`` nearest clusters (partition
    pruning — verified in the plan test), exact cosine re-rank
    inside. Raising n_probe trades scan cost for recall."""
    cent_rows = spark.read.parquet(path + "_centroids").collect()
    cents = np.zeros((len(cent_rows), len(cent_rows[0]["centroid"])))
    for r in cent_rows:
        cents[r["cluster"]] = r["centroid"]
    q = np.asarray(query_vec, dtype=np.float64)
    order = np.argsort(((cents - q) ** 2).sum(axis=1))
    probes = [int(c) for c in order[:n_probe]]
    idx = spark.read.parquet(path).filter(F.col("cluster").isin(probes))
    qc = _qcol(query_vec)
    return (
        idx.select(
            id_col, F.round(cosine(F.col(vec_col), qc), 6).alias("sim")
        )
        .orderBy(F.desc("sim"), F.col(id_col))
        .limit(k)
    )


def batch_query_ivf_index(
    spark,
    path: str,
    queries: DataFrame,
    query_vec_col: str,
    query_id_col: str,
    k: int = 10,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe the IVF index for EVERY query in a batch — the
    production retrieval shape (single-query probing re-plans per
    query; a batch amortizes the scan).

    Scale design: centroids are a k×dim table — broadcast-join the
    query batch against them (B×k scored pairs, map-side), keep each
    query's ``n_probe`` nearest as a (query, cluster) probe list.
    That probe list joins the ``partitionBy(cluster)`` index on the
    partition column with the probe side broadcast, so Spark's
    dynamic partition pruning restricts the scan to the union of
    probed clusters (~n_probe/k of the files when queries share
    locality) instead of the full index. Exact cosine re-rank inside,
    per-query window top-k — the same B×bounded-candidates shuffle as
    ``knn_join``, never a global sort."""
    from pyspark.sql import Window

    cents = spark.read.parquet(path + "_centroids")
    qd = queries.select(
        F.col(query_id_col), F.col(query_vec_col).alias("_qv")
    )
    d2 = F.aggregate(
        F.zip_with(
            "_qv", "centroid", lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pw = Window.partitionBy(query_id_col).orderBy(d2.asc(), F.col("cluster"))
    probes = (
        qd.join(F.broadcast(cents))
        .withColumn("_pr", F.row_number().over(pw))
        .filter(F.col("_pr") <= n_probe)
        .select(query_id_col, "_qv", "cluster")
    )
    idx = spark.read.parquet(path)
    scored = idx.join(F.broadcast(probes), "cluster").select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col("_qv")), 6).alias("sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.col(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= k)
    )


def batch_query_ivfpq_index(
    spark,
    path: str,
    queries: DataFrame,
    query_vec_col: str,
    query_id_col: str,
    codebook: np.ndarray | None = None,
    k: int = 10,
    n_probe: int = 2,
    rerank: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Batch IVF-PQ probe — the full production retrieval shape:
    every query in the batch gets its ``n_probe`` cells (broadcast
    centroid join, as in ``batch_query_ivf_index``), candidates are
    scored by ADC over their STORED byte codes, the per-query
    ``rerank`` best re-rank exactly against the float vectors, and
    the per-query top-k returns. ADC LUTs are per-query (m×k
    doubles) computed pandas-side at plan build from the collected
    query batch — a query batch is driver-small by definition — and
    shipped as one broadcast frame, so the big-side scan still reads
    only id + m ints + cluster."""
    if codebook is None:
        codebook = pq_codebook()
    from pyspark.sql import Window

    m = codebook.shape[0]
    cents = spark.read.parquet(path + "_centroids")
    qd = queries.select(
        F.col(query_id_col), F.col(query_vec_col).alias("_qv")
    )
    d2 = F.aggregate(
        F.zip_with("_qv", "centroid", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pw = Window.partitionBy(query_id_col).orderBy(d2.asc(), F.col("cluster"))
    probes = (
        qd.join(F.broadcast(cents))
        .withColumn("_pr", F.row_number().over(pw))
        .filter(F.col("_pr") <= n_probe)
        .select(query_id_col, "_qv", "cluster")
    )
    # per-query ADC LUTs from the collected (driver-small) batch
    q_rows = qd.collect()
    lut_rows = [
        (
            r[query_id_col],
            [float(x) for x in _query_lut(codebook, r["_qv"]).ravel()],
        )
        for r in q_rows
    ]
    luts = spark.createDataFrame(
        lut_rows, f"{query_id_col} long, _lut array<double>"
    )
    probes = probes.join(F.broadcast(luts), query_id_col)
    idx = spark.read.parquet(path)
    kk = codebook.shape[1]
    adist = None
    for si in range(m):
        term = F.element_at(
            "_lut", si * kk + F.col(f"c{si}") + 1
        )
        adist = term if adist is None else adist + term
    scored = idx.join(F.broadcast(probes), "cluster").select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(adist, 6).alias("_adist"),
        F.col(vec_col),
        "_qv",
    )
    sw = Window.partitionBy(query_id_col).orderBy("_adist", F.col(id_col))
    shortlist = scored.withColumn(
        "_srn", F.row_number().over(sw)
    ).filter(F.col("_srn") <= rerank)
    rw = Window.partitionBy(query_id_col).orderBy(
        F.desc("sim"), F.col(id_col)
    )
    return (
        shortlist.select(
            query_id_col,
            id_col,
            F.round(cosine(F.col(vec_col), F.col("_qv")), 6).alias("sim"),
        )
        .withColumn("rn", F.row_number().over(rw).cast("bigint"))
        .filter(F.col("rn") <= k)
    )


def centroid_cohesion(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    group_col: str,
    round_digits: int = 4,
) -> DataFrame:
    """Cluster-quality metric: per group, the mean cosine of members
    to the group centroid (intra-cluster cohesion — the cheap health
    check after ``kmeans_fit`` or for a labeled embedding corpus).

    Scale design: the vector column is posexploded ONCE into
    (group, id, pos, x); centroids are a (group, pos) hash agg over
    it; the member↔centroid cosine needs only (group, pos)-joined
    products re-aggregated per id. Every stage is a narrow hash agg
    or a co-partitioned equi-join — the plan's width is constant in
    ``dim`` (same discipline as ``kmeans_fit``'s update step) and no
    k×dim array is ever built driver-side.
    """
    x = df.select(
        F.col(group_col).alias("_g"),
        F.col(id_col).alias("_id"),
        F.posexplode(F.col(vec_col)).alias("_p", "_x"),
    ).withColumn("_x", F.col("_x").cast("double"))
    c = x.groupBy("_g", "_p").agg(F.avg("_x").alias("_m"))
    dots = (
        x.join(c, ["_g", "_p"])
        .groupBy("_g", "_id")
        .agg(
            F.sum(F.col("_x") * F.col("_m")).alias("_dot"),
            F.sum(F.col("_x") * F.col("_x")).alias("_nv"),
            F.sum(F.col("_m") * F.col("_m")).alias("_nc"),
        )
    )
    return (
        dots.groupBy("_g")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.avg(F.col("_dot") / F.sqrt(F.col("_nv") * F.col("_nc"))),
                round_digits,
            ).alias("cohesion"),
        )
        .select(F.col("_g").alias(group_col), "n", "cohesion")
    )


def knn_classify(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    label_col: str,
    queries: DataFrame,
    query_vec_col: str,
    query_id_col: str,
    k: int = 5,
    round_digits: int = 4,
) -> DataFrame:
    """Distributed kNN majority-vote classifier over an embedding
    column — label propagation for weakly-labeled corpora.

    Scale design: identical join shape to ``knn_join`` (broadcast
    query batch × one candidate scan, per-query-id window) plus two
    narrow aggregations for the vote. Every tie is broken
    deterministically — similarity rounds before ranking with an id
    tie-break, votes break on (count desc, label asc) — so the
    prediction is engine- and partitioning-stable.
    """
    from pyspark.sql import Window

    from zappy_spark.operators.vecmath import cosine

    sim = F.round(cosine(F.col(vec_col), F.col(query_vec_col)), round_digits)
    scored = (
        df.join(F.broadcast(queries))
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            F.col(query_id_col),
            F.col(id_col),
            F.col(label_col),
            sim.alias("sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), id_col)
    top = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )
    votes = top.groupBy(query_id_col, label_col).agg(
        F.count("*").alias("votes")
    )
    wv = Window.partitionBy(query_id_col).orderBy(F.desc("votes"), label_col)
    return (
        votes.withColumn("_vr", F.row_number().over(wv))
        .filter(F.col("_vr") == 1)
        .select(
            query_id_col, F.col(label_col).alias("predicted"), "votes"
        )
    )


def pq_codebook(
    m: int = 4, k: int = 4, sub_dim: int = 16, seed: int = 7,
    scale: float = 0.12,
) -> np.ndarray:
    """Deterministic product-quantization codebook: m subquantizers
    x k centroids x sub_dim values, rounded to 4dp so the literals
    embed exactly in both Spark Column expressions and oracle SQL
    (the same literal-determinism trick as the RP-LSH planes). A
    production codebook comes from per-subspace kmeans_fit; the
    assignment expression below is identical either way."""
    rng = np.random.default_rng(seed)
    return np.round(rng.normal(0.0, scale, (m, k, sub_dim)), 4)


def _pq_sq_dist(sub: Column, centroid: np.ndarray) -> Column:
    cent = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(sub, cent, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _argmin_chain(dists: list[Column]) -> Column:
    """Index of the minimum (ties -> smallest index) as a CASE
    chain — k is small, so this stays one codegen'd expression."""
    out = None
    for c in range(len(dists) - 1):
        cond = None
        for other in range(c + 1, len(dists)):
            leq = dists[c] <= dists[other]
            cond = leq if cond is None else (cond & leq)
        out = F.when(cond, c) if out is None else out.when(cond, c)
    return out.otherwise(len(dists) - 1)


def pq_codes(
    df: DataFrame, vec_col: str, id_col: str, codebook: np.ndarray
) -> DataFrame:
    """Product-quantization codes: split each vector into m
    contiguous subvectors and assign each to its nearest codebook
    centroid (squared L2, ties to the smaller index). Output
    (id, c0..c{m-1}) — the 100 TB ANN compression step: m bytes per
    vector instead of dim floats, scanned JVM-side with zero
    shuffles; a probe re-ranks top candidates against the exact
    vectors afterwards.

    Accumulation order of the squared distance is the list order on
    both engines, so argmin comparisons are bit-exact cross-engine.
    """
    m, k, sub_dim = codebook.shape
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    cols = [F.col(id_col)]
    for s in range(m):
        sub = F.slice(v, s * sub_dim + 1, sub_dim)
        dists = [_pq_sq_dist(sub, codebook[s, c]) for c in range(k)]
        cols.append(_argmin_chain(dists).alias(f"c{s}"))
    return df.select(*cols)


def adc_scores(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    codebook: np.ndarray,
    query_vec,
) -> DataFrame:
    """Asymmetric distance computation (ADC) — the PQ search step:
    approximate ||q - x||² as Σ_s LUT[s][code_s(x)], where the LUT
    holds the query's exact squared distance to every codebook
    centroid. The LUT is computed driver-side (m×k numbers) and
    ships as literals, so scoring a vector is m table lookups over
    its byte codes — no float vector is touched at query time. This
    is what makes 100 TB ANN scans cheap: the scan reads m small int
    columns instead of dim floats, and the exact re-rank only runs
    on the top candidates.

    LUT entries are rounded to 6dp so both engines decode identical
    doubles; the m-term sum is left-associative on both sides.
    """
    m, k, sub_dim = codebook.shape
    q = np.asarray(query_vec, dtype=float)
    lut = np.round(
        np.array(
            [
                [float(((q[s * sub_dim:(s + 1) * sub_dim] - codebook[s, c]) ** 2).sum()) for c in range(k)]
                for s in range(m)
            ]
        ),
        6,
    )
    codes = pq_codes(df, vec_col, id_col, codebook)
    return codes.select(
        F.col(id_col), F.round(_adc_sum(lut), 6).alias("adist")
    )


def _adc_sum(lut: np.ndarray) -> Column:
    """Σ_s LUT[s][c_s] over stored code columns c0..c{m-1} — the ADC
    lookup expression shared by the inline scorer and the IVF-PQ
    index probe."""
    adist = None
    for s in range(lut.shape[0]):
        term = F.element_at(
            F.array(*[F.lit(float(x)) for x in lut[s]]),
            F.col(f"c{s}") + 1,
        )
        adist = term if adist is None else adist + term
    return adist


def _query_lut(codebook: np.ndarray, query_vec) -> np.ndarray:
    m, k, sub_dim = codebook.shape
    q = np.asarray(query_vec, dtype=float)
    return np.round(
        np.array(
            [
                [
                    float(
                        (
                            (q[s * sub_dim : (s + 1) * sub_dim] - codebook[s, c])
                            ** 2
                        ).sum()
                    )
                    for c in range(k)
                ]
                for s in range(m)
            ]
        ),
        6,
    )


def build_ivfpq_index(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    path: str,
    k: int = 8,
    max_iter: int = 10,
    codebook: np.ndarray | None = None,
) -> np.ndarray:
    """IVF-PQ: coarse k-means cells AND per-vector PQ byte codes,
    persisted ``partitionBy(cluster)`` — the FAISS IVFPQ layout
    (global codebook, by_residual=False, so ADC LUTs are shared
    across cells). A probe then (a) partition-prunes to n_probe
    cells and (b) scores candidates by reading ONLY the m small int
    code columns; the exact float vectors are touched just for the
    final re-rank of the shortlist. That column split — codes for
    the scan, vectors for the top-r — is what makes a 100 TB ANN
    probe read megabytes, not terabytes. Returns the centroids."""
    if codebook is None:
        codebook = pq_codebook()
    cents = kmeans_fit(df, vec_col, id_col, k, max_iter)
    assigned = kmeans_assign(df, vec_col, cents)
    codes = pq_codes(assigned, vec_col, id_col, codebook)
    full = assigned.join(codes, id_col).select(
        id_col,
        *[f"c{s}" for s in range(codebook.shape[0])],
        F.col(vec_col),
        "cluster",
    )
    full.write.mode("overwrite").partitionBy("cluster").parquet(path)
    spark = df.sparkSession
    cent_rows = [(i, [float(x) for x in c]) for i, c in enumerate(cents)]
    spark.createDataFrame(
        cent_rows, "cluster int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(path + "_centroids")
    return cents


def query_ivfpq_index(
    spark,
    path: str,
    query_vec,
    codebook: np.ndarray | None = None,
    k: int = 10,
    n_probe: int = 2,
    rerank: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-PQ probe: rank cells driver-side (k×dim numpy), read only
    ``n_probe`` cells (partition pruning), score every member by ADC
    over its STORED byte codes (scan reads id + m ints), shortlist
    the ``rerank`` best, then exact-cosine re-rank just the
    shortlist against the float vectors. Raising n_probe buys
    recall with scan cost; raising rerank buys recall with re-rank
    cost — the two standard IVF-PQ knobs."""
    if codebook is None:
        codebook = pq_codebook()
    cent_rows = spark.read.parquet(path + "_centroids").collect()
    cents = np.zeros((len(cent_rows), len(cent_rows[0]["centroid"])))
    for r in cent_rows:
        cents[r["cluster"]] = r["centroid"]
    q = np.asarray(query_vec, dtype=np.float64)
    order = np.argsort(((cents - q) ** 2).sum(axis=1))
    probes = [int(c) for c in order[:n_probe]]
    idx = spark.read.parquet(path).filter(F.col("cluster").isin(probes))
    lut = _query_lut(codebook, query_vec)
    shortlist = (
        idx.select(id_col, F.round(_adc_sum(lut), 6).alias("adist"))
        .orderBy("adist", F.col(id_col))
        .limit(rerank)
        .select(id_col)
    )
    qc = _qcol(query_vec)
    return (
        idx.join(F.broadcast(shortlist), id_col, "left_semi")
        .select(
            id_col, F.round(cosine(F.col(vec_col), qc), 6).alias("sim")
        )
        .orderBy(F.desc("sim"), F.col(id_col))
        .limit(k)
    )


def mmr_rerank(
    emb: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec,
    shortlist: int = 20,
    k: int = 5,
    lam: float = 0.7,
    mu: float | None = None,
) -> DataFrame:
    """Maximal Marginal Relevance diversification — the standard
    retrieval re-rank that trades relevance against redundancy:
    greedily pick argmax of λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s).
    Near-dup-heavy corpora make plain top-k return five copies of
    one document; MMR is the fix every RAG/eval pipeline ships.

    Two-phase scale shape: the DISTRIBUTED part is the expensive
    part — one full scan for the round-6 cosine shortlist (top
    ``shortlist`` with id tie-break), plus a shortlist×shortlist
    pairwise-sim self-join (bounded at shortlist², tiny) — and the
    greedy loop then runs driver-side over the collected rounded
    matrix (≤ shortlist² rows: a bounded rerank fetch, the
    llm_ops.py:58 precedent). All comparisons use ROUND(...,6)
    values with id tie-breaks, so the selection is engine-exact and
    a recursive-CTE oracle replays it. Returns (rank, id, qsim).

    ``mu`` is the redundancy-penalty weight; it defaults to
    ``1.0 - lam`` but callers whose oracle spells the weight as a
    literal (v22 hardcodes 0.3) MUST pass the same literal here —
    ``1.0 - 0.7`` is 0.30000000000000004 in IEEE double, a ~4e-17
    skew that could flip the greedy argmax on a near-tie (ADVICE
    r5 item 1)."""
    from zappy_spark.operators.vecmath import cosine

    spark = emb.sparkSession
    qc = F.array(*[F.lit(float(x)) for x in query_vec])
    cand = (
        emb.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).alias("_v"),
            F.round(cosine(F.col(vec_col), qc), 6).alias("_qsim"),
        )
        .orderBy(F.desc("_qsim"), "_id")
        .limit(shortlist)
        .localCheckpoint()  # shortlist reused by both collects below
    )
    pairs = (
        cand.alias("a")
        .join(cand.alias("b"), F.col("a._id") != F.col("b._id"))
        .select(
            F.col("a._id").alias("_i"),
            F.col("b._id").alias("_j"),
            F.round(cosine("a._v", "b._v"), 6).alias("_s"),
        )
    )
    if mu is None:
        mu = 1.0 - lam
    qsim = {r["_id"]: r["_qsim"] for r in cand.select("_id", "_qsim").collect()}
    sim = {(r["_i"], r["_j"]): r["_s"] for r in pairs.collect()}
    first = min(qsim, key=lambda i: (-qsim[i], i))
    selected = [first]
    while len(selected) < min(k, len(qsim)):
        best = min(
            (i for i in qsim if i not in selected),
            key=lambda i: (
                -(
                    lam * qsim[i]
                    - mu * max(sim[(i, s)] for s in selected)
                ),
                i,
            ),
        )
        selected.append(best)
    rows = [
        (rank + 1, i, qsim[i]) for rank, i in enumerate(selected)
    ]
    return spark.createDataFrame(rows, ["rank", id_col, "qsim"])


def sign_word(vec: str | Column, start: int, nbits: int) -> Column:
    """One ≤32-bit sign word from a vector slice (1-based ``start``):
    bit i set iff component > 0, packed by an exact integer Horner
    fold (acc*2+b over the reversed bits) — no shift builtins, so
    any engine replays it with plain arithmetic; every intermediate
    fits a BIGINT."""
    v = F.col(vec) if isinstance(vec, str) else vec
    bits = F.transform(
        F.slice(v, start, nbits),
        lambda x: F.when(
            x.cast("double") > 0, F.lit(1).cast("long")
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(
        F.reverse(bits),
        F.lit(0).cast("long"),
        lambda acc, b: acc * 2 + b,
    )


def sign_hamming_topk(
    emb: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec,
    shortlist: int = 20,
    k: int = 5,
) -> DataFrame:
    """Binary-quantized retrieval: 1 bit per dimension (sign), rank
    by Hamming distance, then exact-cosine re-rank the shortlist —
    the cheapest ANN tier there is (64 dims → 8 bytes per vector,
    XOR+popcount per comparison) and the standard first stage for
    100 TB embedding stores where even PQ codes are too big to scan.

    Scale shape: the sign words are scan-side expressions (computed
    once, persistable as two BIGINT columns beside the vector); the
    Hamming cut plans as TakeOrderedAndProject (distributed heap,
    integer keys — no float, fully deterministic with the id
    tie-break); only the ≤``shortlist`` survivors touch float math
    for the re-rank. Returns (id, ham, sim round-4) — top ``k`` by
    re-ranked cosine."""
    from zappy_spark.operators.vecmath import cosine

    q0 = sum(1 << i for i, x in enumerate(query_vec[:32]) if x > 0)
    q1 = sum(1 << i for i, x in enumerate(query_vec[32:64]) if x > 0)
    qc = F.array(*[F.lit(float(x)) for x in query_vec])
    words = emb.select(
        F.col(id_col),
        F.col(vec_col),
        sign_word(vec_col, 1, 32).alias("_w0"),
        sign_word(vec_col, 33, 32).alias("_w1"),
    )
    ham = (
        F.bit_count(F.col("_w0").bitwiseXOR(F.lit(q0).cast("long")))
        + F.bit_count(F.col("_w1").bitwiseXOR(F.lit(q1).cast("long")))
    ).cast("int")
    short = (
        words.select(id_col, vec_col, ham.alias("ham"))
        .orderBy("ham", id_col)
        .limit(shortlist)
    )
    return (
        short.select(
            id_col,
            "ham",
            F.round(cosine(F.col(vec_col), qc), 4).alias("sim"),
        )
        .orderBy(F.desc("sim"), id_col)
        .limit(k)
    )
