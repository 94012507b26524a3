"""End-to-end training-data preparation: the composition the
individual operators exist for.

    raw documents
      → quality filter      (scan-side expressions)
      → exact dedup         (one shuffle on md5)
      → near-dup removal    (MinHash-LSH generate + Jaccard verify)
      → stats               (one aggregation)

Each stage is a DataFrame→DataFrame function from this package. The
filter/dedup/token stages compose lazily; the near-dup stage is the
exception — its connected-components clustering is iterative and
materializes (localCheckpoint per round) when the pipeline is
CONSTRUCTED, not at first action. At 100 TB each stage is scan- or
single-shuffle-bound (see SCALE.md).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from zappy_spark.operators.dedup import drop_exact_dups, near_dup_pairs
from zappy_spark.operators.text import quality_filter, token_count_ws


def remove_near_dups(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    num_hashes: int = 16,
    bands: int = 8,
    max_iter: int = 20,
) -> DataFrame:
    """Drop the higher-id member of every verified near-dup pair
    (keep-first policy, matching exact dedup's min-id choice).

    bands=8/rows=2 by default: band-hit probability is j^rows per
    band, so for j≈0.7 candidates the miss rate is (1-j²)^8 ≈ 0.5% —
    recall belongs to the generate stage, precision to the exact-
    Jaccard verify, so generous banding costs only candidate checks.

    Survivors are chosen per CONNECTED COMPONENT of the pair graph
    (operators/graph.py), not per pair: a~b and b~c collapse to one
    representative even when (a,c) was never generated — the
    transitive case pairwise removal gets wrong."""
    from zappy_spark.operators.graph import drop_cluster_dups

    pairs = near_dup_pairs(
        df, text_col, id_col, threshold=threshold,
        num_hashes=num_hashes, bands=bands,
    )
    return drop_cluster_dups(df, pairs, id_col, max_iter=max_iter)


def prepare_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_chars: int = 50,
    near_dup_threshold: float = 0.8,
    num_hashes: int = 16,
    bands: int = 8,
    max_iter: int = 20,
) -> DataFrame:
    """Full prep pipeline; returns the cleaned corpus with a
    token-count column appended. Lower ``bands``→``rows`` ratio for
    stricter candidate generation; bands=num_hashes (rows=1) for
    max recall near the threshold."""
    # quality_filter appends its q_* feature columns; keep the output
    # contract clean by selecting the caller's schema back
    cleaned = quality_filter(df, text_col, min_chars=min_chars).select(
        *df.columns
    )
    cleaned = drop_exact_dups(cleaned, text_col, id_col)
    cleaned = remove_near_dups(
        cleaned,
        text_col,
        id_col,
        threshold=near_dup_threshold,
        num_hashes=num_hashes,
        bands=bands,
        max_iter=max_iter,
    )
    return cleaned.withColumn("n_tokens", token_count_ws(text_col))


def corpus_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass corpus summary (row for dashboards / data cards)."""
    return df.agg(
        F.count("*").alias("docs"),
        F.sum(token_count_ws(text_col)).alias("tokens"),
        F.round(F.avg(F.length(text_col)), 2).alias("avg_chars"),
        F.countDistinct(F.md5(text_col)).alias("distinct_texts"),
    )


def content_split(
    df: DataFrame,
    text_col: str = "text",
    train_hex_max: str = "c",
) -> DataFrame:
    """Deterministic content-hash train/val split.

    The split key is md5(text), NOT a random number or the row id: a
    document (and all its exact duplicates, across snapshots and
    re-crawls) always lands in the same split, which is what prevents
    train/val contamination in a dataset that gets rebuilt. First hex
    digit < ``train_hex_max`` → train (default 'c' = 12/16 = 75%).
    Portable (md5), so the assignment is oracle-checkable."""
    return df.withColumn(
        "split",
        F.when(
            F.substring(F.md5(text_col), 1, 1) < train_hex_max, "train"
        ).otherwise("val"),
    )


def write_dataset(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    target_rows_per_file: int = 1_000_000,
) -> None:
    """Scale-aware parquet layout: optional hive partitioning on the
    pruning key(s) + bounded file sizes via maxRecordsPerFile (the
    two knobs that decide whether a 100 TB table scans well — see
    SCALE.md). Files stay splittable parquet; partition columns
    should be low-cardinality pruning keys (date, lang, source)."""
    w = df.write.mode("overwrite").option(
        "maxRecordsPerFile", target_rows_per_file
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    budget: int = 2048,
) -> DataFrame:
    """Greedy first-fit-decreasing packing of token sequences into
    fixed-budget bins — the chunk→context-window packing step of a
    training pipeline (minimizes padding waste).

    Packing is PER PARTITION by design: bins never cross partitions,
    so the operator is embarrassingly parallel and deterministic for
    a fixed partitioning (sortWithinPartitions makes the fill order
    canonical). Global optimality is not the goal — first-fit-
    decreasing within a partition is the standard practice and is
    within 11/9 OPT per partition; repartition count trades bin
    fragmentation (one partial bin per partition) against
    parallelism. Items above ``budget`` raise rather than silently
    overflow. Output: (bin_id, ids, total_tokens, n_items) with
    bin_id unique across partitions (partition_id * 2^40 + local)."""
    from collections.abc import Iterator

    import pandas as pd

    over = df.filter(F.col(n_tokens_col) > budget).count()
    if over:
        raise ValueError(f"{over} items exceed budget {budget}")

    src = (
        df.select(
            F.col(id_col).cast("bigint").alias("_id"),
            F.col(n_tokens_col).cast("bigint").alias("_w"),
        )
        .withColumn("_pid", F.spark_partition_id())
        .sortWithinPartitions(F.desc("_w"), "_id")
    )

    def packer(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # state spans batches: the iterator covers one whole partition
        bins: list[tuple[int, list[int], int]] = []  # (free, ids, total)
        pid = None
        for pdf in it:
            if len(pdf) and pid is None:
                pid = int(pdf["_pid"].iloc[0])
            for _id, w in zip(pdf["_id"], pdf["_w"]):
                for i, (free, ids, tot) in enumerate(bins):
                    if w <= free:
                        bins[i] = (free - w, ids + [int(_id)], tot + int(w))
                        break
                else:
                    bins.append((budget - int(w), [int(_id)], int(w)))
        if pid is None:
            return
        yield pd.DataFrame(
            {
                "bin_id": [(pid << 40) + i for i in range(len(bins))],
                "ids": [ids for _, ids, _ in bins],
                "total_tokens": [tot for _, _, tot in bins],
                "n_items": [len(ids) for _, ids, _ in bins],
            }
        )

    return src.mapInPandas(
        packer,
        schema="bin_id bigint, ids array<bigint>, total_tokens bigint, "
        "n_items int",
    )


def upsert_snapshot(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    version_col: str,
) -> DataFrame:
    """Merge a changelog into a snapshot: for every key keep the row
    with the highest ``version_col`` across base ∪ updates — the
    MERGE/upsert primitive (SCD type 1) for maintaining a mutable
    table on an append-only lake without a table format.

    ONE hash aggregate over the union: ``max_by`` of the payload
    struct keyed on the version. Partial aggregation runs map-side,
    so per (partition, key) only one row enters the shuffle — at
    snapshot scale this beats the window-function spelling
    (row_number over key ORDER BY version DESC) which must shuffle
    every row. Versions must be unique per key (monotone commit ids);
    ties would be broken arbitrarily.

    Columns of ``updates`` must match ``base`` (unionByName).
    """
    payload_cols = [c for c in base.columns if c not in keys]
    merged = base.unionByName(updates)
    payload = F.struct(*[F.col(c) for c in payload_cols])
    agg = merged.groupBy(*keys).agg(
        F.max_by(payload, F.col(version_col)).alias("_p")
    )
    return agg.select(
        *keys, *[F.col("_p")[c].alias(c) for c in payload_cols]
    )


def publish_with_audit(
    df: DataFrame,
    path: str,
    audits: "list",
    partition_by: str | None = None,
) -> dict:
    """Write–Audit–Publish: materialize ``df`` into a staging
    directory, run every audit callable against the STAGED data (a
    DataFrame → error-string-or-None check: row counts, null rates,
    PSI vs yesterday, schema expectations), and only then promote it
    with an atomic rename. A failed audit leaves the staging dir for
    inspection and raises — downstream readers NEVER see unaudited
    data, which at 100 TB is the difference between a bad batch
    wasting one write and poisoning a week of training runs. Returns
    {"path", "rows"} on success.

    The promote is ``os.replace`` of a directory pointer-style
    rename (same filesystem); on object stores the same pattern is a
    manifest/pointer swap, as in ``incremental_upsert``."""
    import os
    import shutil

    staging = path + "._staging"
    if os.path.exists(staging):
        shutil.rmtree(staging)
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(partition_by)
    w.parquet(staging)

    spark = df.sparkSession
    staged = spark.read.parquet(staging)
    failures = []
    for audit in audits:
        err = audit(staged)
        if err:
            failures.append(str(err))
    if failures:
        raise ValueError(
            f"audit failed; staged data left at {staging}: "
            + "; ".join(failures)
        )
    rows = staged.count()
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(staging, path)
    return {"path": path, "rows": rows}


def scd2_apply(
    history: DataFrame,
    changes: DataFrame,
    keys: list[str],
    ts_col: str,
) -> DataFrame:
    """Type-2 slowly-changing-dimension apply: keep FULL history.
    ``history`` rows carry (keys, attrs, valid_from, valid_to) with
    valid_to NULL marking the current version; ``changes`` carries
    (keys, attrs, ts_col) — one new version per key per batch. The
    current version of each changed key is CLOSED (valid_to := the
    change timestamp) and the change appended as the new open
    version; prior closed history passes through untouched. This is
    the MERGE-less SCD-2 the guide's CDC pattern calls for — the
    audit-trail sibling of ``upsert_snapshot`` (SCD-1).

    Scale shape: one key-hashed join of current-versions against the
    (small) change batch plus a unionByName — no window over
    history, so cost scales with |current| + |changes|, not with
    |history|. Assumes ≤1 change per key per batch (pre-aggregate
    with ``upsert_snapshot`` semantics if batches can carry more).
    """
    attr_cols = [
        c
        for c in history.columns
        if c not in keys and c not in ("valid_from", "valid_to")
    ]
    closed_hist = history.filter(F.col("valid_to").isNotNull())
    cur = history.filter(F.col("valid_to").isNull())
    chg = changes.select(
        *keys,
        *[F.col(c) for c in attr_cols],
        F.col(ts_col).alias("_chg_ts"),
    )
    chg_keys = chg.select(*keys, "_chg_ts")
    closed_now = cur.join(chg_keys, keys).select(
        *keys,
        *attr_cols,
        "valid_from",
        F.col("_chg_ts").alias("valid_to"),
    )
    untouched = cur.join(chg_keys.select(*keys), keys, "left_anti")
    new_rows = chg.select(
        *keys,
        *attr_cols,
        F.col("_chg_ts").alias("valid_from"),
        F.lit(None).cast(cur.schema["valid_to"].dataType).alias("valid_to"),
    )
    return (
        closed_hist.unionByName(untouched)
        .unionByName(closed_now)
        .unionByName(new_rows)
    )


def dataset_diff(
    a: DataFrame,
    b: DataFrame,
    id_col: str,
    content_cols: list[str],
) -> DataFrame:
    """Diff two dataset snapshots by id: classify every id as
    'added' (only in b), 'removed' (only in a), 'changed' (content
    hash differs) or 'unchanged' — the audit step between dataset
    versions (what did this re-crawl/refilter actually change?).

    ONE full-outer equi-join on the id (both sides hash-partition on
    the same key — co-partitioned, no other shuffle); content equality
    compares a single md5 over the selected columns, so wide rows
    never move twice. Output: (id_col, status)."""
    def h(df: DataFrame) -> Column:
        return F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in content_cols]))

    ha = a.select(F.col(id_col), h(a).alias("_ha"))
    hb = b.select(F.col(id_col), h(b).alias("_hb"))
    j = ha.join(hb, id_col, "full")
    status = (
        F.when(F.col("_ha").isNull(), "added")
        .when(F.col("_hb").isNull(), "removed")
        .when(F.col("_ha") != F.col("_hb"), "changed")
        .otherwise("unchanged")
    )
    return j.select(id_col, status.alias("status"))


def dataset_diff_summary(
    a: DataFrame, b: DataFrame, id_col: str, content_cols: list[str]
) -> DataFrame:
    """(status, n) rollup of ``dataset_diff`` — 4 rows out."""
    return (
        dataset_diff(a, b, id_col, content_cols)
        .groupBy("status")
        .agg(F.count("*").alias("n"))
    )
