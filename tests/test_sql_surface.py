"""SQL entry point: a user can run the ANSI subset of the corpus
as plain ``spark.sql(...)`` over ``register_tables`` views and get
hash-identical results to the DataFrame builders.

88 of the 155 oracle spellings are engine-portable ANSI (the rest
use DuckDB-only forms — list_* lambdas, struct literals, epoch()/
time_bucket(), DATE-minus-DATE arithmetic); each portable one is
executed VERBATIM on Spark SQL and compared against its builder.
This pins two things: the SQL surface works, and the builders really
are the declarative plans their oracles describe (excluded: v06,
whose oracle fixes an eigensign convention the builder derives).
"""

from __future__ import annotations

import hashlib

import pytest

from tests.conftest import SF_DIR
from zappy_spark.canon import canon_cell
from zappy_spark.queries import ORACLE, QUERIES

PORTABLE = [
    "b04_global_topk", "b05_distinct_counts", "b07_string_filter_agg",
    "b09_intersect", "d01_exact_dedup_groups", "d09_dedup_keep_best",
    "l03_word_counts", "l04_exact_dedup_hash", "l05_doc_stats",
    "l07_quality_filter", "r01_pricing_summary", "r02_join5_agg",
    "r03_topk_per_group", "r04_group_by_date", "r05_semi_join",
    "r06_anti_join", "r07_left_join", "r08_full_outer_join",
    "r09_cross_join", "r10_range_join", "r11_rollup", "r12_cube",
    "r15_having", "r17_union", "r17b_union_all", "r18_except",
    "r19_scalar_subquery", "r20_in_subquery", "r21_case_coalesce",
    "r24_math_funcs", "r25_analytic_window", "r26_range_frame",
    "r27_ranking_suite", "r28_pivot_conditional", "r28b_pivot_native",
    "r33_interval_arith", "r34_window_extras", "r35_grouping_sets",
    "r36_unpivot", "r37_bit_aggs", "r38_q3_shape", "r39_q18_shape",
    "r40_bucketed_ranking", "r41_recursive_cte", "r42_zorder_key",
    "r43_correlated_subquery", "r44_q21_sole_late", "r45_q22_no_urgent",
    "r46_q13_custdist", "r48_q11_shape", "r49_q15_shape",
    "r74_salted_join", "r75_filtered_aggs",
    "r50_dataset_diff", "r52_q6_scan_only", "r53_q4_priority_exists",
    "r54_q7_volume_shipping", "r55_q8_market_share", "r56_q9_profit",
    "r57_q10_returned_items", "r58_q14_promo_effect",
    "r59_q17_small_quantity", "r60_q19_disjunctive",
    "r61_q2_min_cost_supplier", "r62_q12_priority_split", "s10_outer_interval_join",
    "s3_session_window", "s4_dedup_keep_first", "s5_stream_static_join",
    "s6_interval_join", "s9_bucket_dedup", "t05_levenshtein",
    "t06_content_split", "z01_sum_axis0", "z02_mean_axis0",
    "z03_log1p", "z04_exp_expm1", "z06_unary_suite",
    "z07_scalar_broadcast", "z09_comparisons", "z10_bool_mask",
    "z11_column_select", "z12_var_std", "z13_minmax_axis0",
    "z15_astype_cast", "z16_count_nonzero", "z18_any_all",
    "z21_corr_covar", "z22_skew_kurt", "z23_regr",
]


def _h(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon_cell(r[i]) for i in order) for r in rows)
    digest = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:12]
    return len(rows), sorted(c.lower() for c in cols), digest


@pytest.fixture(scope="module")
def sql_views(spark):
    from zappy_spark.session import register_tables

    register_tables(spark, SF_DIR)
    return spark


@pytest.mark.parametrize("name", PORTABLE)
def test_oracle_sql_runs_verbatim_on_spark(sql_views, name):
    spark = sql_views
    got = spark.sql(ORACLE[name])
    want = QUERIES[name](spark, SF_DIR)
    s = _h(got.columns, [tuple(r) for r in got.collect()])
    o = _h(want.columns, [tuple(r) for r in want.collect()])
    assert s == o, f"{name}: SQL surface diverged from builder"


def test_pipe_syntax_matches_builder(sql_views):
    """Spark 4's SQL pipe syntax (|>) is part of the SQL surface: the
    piped spelling of the r01 pricing summary hash-matches the
    DataFrame builder."""
    spark = sql_views
    got = spark.sql(
        "FROM lineitem "
        "|> WHERE l_shipdate <= DATE '1998-09-02' "
        "|> AGGREGATE "
        "ROUND(SUM(l_quantity), 2) AS sq, "
        "ROUND(SUM(l_extendedprice), 2) AS sb, "
        "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sd, "
        "ROUND(AVG(l_quantity), 4) AS aq, "
        "COUNT(*) AS c "
        "GROUP BY l_returnflag, l_linestatus "
        "|> ORDER BY l_returnflag, l_linestatus"
    )
    want = QUERIES["r01_pricing_summary"](spark, SF_DIR)
    assert _h(got.columns, [tuple(r) for r in got.collect()]) == _h(
        want.columns, [tuple(r) for r in want.collect()]
    )
