"""The declared query corpus (SURVEY §2.6): name → builder + oracle SQL.

Every builder is pure DataFrame API (Catalyst-optimizable); every
oracle string is the DuckDB spelling verified hash-matching in the
survey session. Keys are shared across both dicts; queries without an
oracle (non-SQL-expressible ops) appear only in QUERIES.

Ordering contract (VERDICT r1 §wrong-2): the external correctness
gate consumes entries in insertion order with a bounded window (50 in
round 1), so the dict is ordered to maximize verified breadth:

1. One representative per operator family first (streaming, LLM,
   dedup, text, ANN, advanced-relational, bench shapes) — so even a
   small window spans every family.
2. Then the rest of the 50 entries that carried no CORRECTNESS row in
   round 1, plus the round-1 hash-failures (z06 z09 z15 z16 r28,
   fixed via dtype parity this round) for re-verification. r28b
   shares r28's oracle, so its slot goes to the new r40 instead.
3. The 44 entries the round-1 driver already verified green last —
   cumulatively every corpus entry then has an external green row.

Round-3 rotation plan: after the round-2 CORRECTNESS lands, move its
green entries to the tail and promote everything still unverified —
in particular the batch-2 additions (d10–d13, t11–t14, s9–s10,
r47–r49, v09–v10) — into the window, keeping one representative per
family near the front as a regression canary.
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

# Tier 1: family representatives (judge-suggested set, VERDICT r1 next-2).
_REPRESENTATIVES = [
    "s1_tumbling_window",
    "l02_cosine_topk",
    "l04_exact_dedup_hash",
    "d06_lsh_neardup_pipeline",
    "t02_quality_features",
    "v01_ivf_label_topk",
    "r30_asof_join",
    "r31_group_percentile",
    "r35_grouping_sets",
    "r36_unpivot",
    "b04_global_topk",
    "b05_distinct_counts",
    "b09_intersect",
    "r29_explode_reagg",
    "z06_unary_suite",
    "r28_pivot_conditional",
    "r40_bucketed_ranking",
]

# Tier 2: everything else with no round-1 CORRECTNESS row, plus the
# remaining round-1 hash-failures.
_UNSEEN_R1 = [
    "z09_comparisons",
    "z15_astype_cast",
    "z16_count_nonzero",
    "r32_sorted_listagg",
    "r33_interval_arith",
    "r34_window_extras",
    "r37_bit_aggs",
    "r38_q3_shape",
    "r39_q18_shape",
    "b07_string_filter_agg",
    "s2_sliding_window",
    "s3_session_window",
    "s4_dedup_keep_first",
    "s5_stream_static_join",
    "s7_prev_event_gap",
    "l01_json_extract",
    "l03_word_counts",
    "l05_doc_stats",
    "l06_similarity_self_join",
    "l07_quality_filter",
    "l08_euclidean_topk",
    "l10_term_frequency",
    "d01_exact_dedup_groups",
    "d02_minhash_signature",
    "d03_simhash",
    "d04_ngram_jaccard",
    "d05_embedding_neardup",
    "t01_token_counts",
    "t03_fingerprint",
    "t04_lang_id",
    "t05_levenshtein",
    "t06_content_split",
    "v02_rp_lsh_ann",
]

_PRIORITY = _REPRESENTATIVES + _UNSEEN_R1

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
