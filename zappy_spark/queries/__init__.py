"""The declared query corpus (SURVEY §2.6): name → builder + oracle SQL.

Every builder is pure DataFrame API (Catalyst-optimizable); every
oracle string is the DuckDB spelling verified hash-matching in the
survey session. Keys are shared across both dicts; queries without an
oracle (non-SQL-expressible ops) appear only in QUERIES.

Ordering contract (VERDICT r1 §wrong-2): the external correctness
gate consumes entries in insertion order with a bounded window (50 in
round 1 and round 2), so the dict is ordered to maximize verified
breadth. Rotation state after round 2: rounds 1+2 cumulatively
verified 94 distinct entries green (CORRECTNESS_r01 44/50 +
CORRECTNESS_r02 50/50 counting the two by-design no-oracle rows).

Round-3 ordering (this file): the 39 entries that have never carried
a driver CORRECTNESS row — the round-2 batch additions (r41–r50,
s6/s8–s10, d07–d13, t07–t14, v03–v10) plus z24 and r28b — go first,
followed by family canaries (one previously-green representative per
family, guarding against regressions from this round's changes),
then the remaining green tail. New batch-3 entries are appended to
the *front* block as they are added so they land inside the window.
"""

from __future__ import annotations

from zappy_spark.queries import (
    events_ops,
    llm_ops,
    pipeline_ops,
    relational,
    zappy_ops,
)

_ALL_QUERIES = {
    **zappy_ops.QUERIES,
    **relational.QUERIES,
    **events_ops.QUERIES,
    **llm_ops.QUERIES,
    **pipeline_ops.QUERIES,
}

# Tier 1: every entry with no driver CORRECTNESS row after rounds
# 1+2 (the round-2 batch additions, plus z24 / r28b which sat past
# both windows). New batch-3 entries are appended here as added.
_UNSEEN_R3 = [
    "z24_var_axis1",
    "r28b_pivot_native",
    "r41_recursive_cte",
    "r42_zorder_key",
    "r43_correlated_subquery",
    "r44_q21_sole_late",
    "r45_q22_no_urgent",
    "r46_q13_custdist",
    "r47_upsert_snapshot",
    "r48_q11_shape",
    "r49_q15_shape",
    "r50_dataset_diff",
    "s6_interval_join",
    "s8_windowed_topk",
    "s9_bucket_dedup",
    "s10_outer_interval_join",
    "d07_hash_sample",
    "d08_stratified_sample",
    "d09_dedup_keep_best",
    "d10_decontaminate",
    "d11_mixture_sample",
    "d12_quantile_buckets",
    "d13_containment_pairs",
    "t07_tfidf",
    "t08_pii_redaction",
    "t09_chunking",
    "t10_normalize_text",
    "t11_repetition",
    "t12_domain_distribution",
    "t13_boilerplate",
    "t14_length_histogram",
    "v03_l2_normalize",
    "v04_quantize_int8",
    "v05_covariance",
    "v06_pca_scores",
    "v07_hll_rollup",
    "v08_knn_join",
    "v09_ivf_kmeans",
    "v10_standardize",
]

# Tier 2: previously-green family canaries — one representative per
# family, re-checked each round to catch regressions from this
# round's code changes (notably the events-ts LTZ normalization).
_CANARIES = [
    "s1_tumbling_window",
    "l02_cosine_topk",
    "d06_lsh_neardup_pipeline",
    "t02_quality_features",
    "v01_ivf_label_topk",
    "r30_asof_join",
    "r01_pricing_summary",
    "r02_join5_agg",
    "b04_global_topk",
    "z06_unary_suite",
    "r33_interval_arith",
]

_PRIORITY = _UNSEEN_R3 + _CANARIES

QUERIES = {k: _ALL_QUERIES[k] for k in _PRIORITY}
QUERIES.update({k: v for k, v in _ALL_QUERIES.items() if k not in QUERIES})

ORACLE = {
    **zappy_ops.ORACLE,
    **relational.ORACLE,
    **events_ops.ORACLE,
    **llm_ops.ORACLE,
    **pipeline_ops.ORACLE,
}

__all__ = ["QUERIES", "ORACLE"]
