"""Pin the driver-contract enumeration invariants.

The correctness harness records rows for the first 50 insertion-order
entries of queries() only. These tests fail fast if a future edit
breaks the ordering contract: every budgeted entry must have a DuckDB
hash oracle, the ANN exact-recall anchors must stay inside the budget,
and queries()/oracle_sql() must stay key-consistent.
"""

from __future__ import annotations

import __spark_entry__ as em

BUDGET = 50
ANCHORS = {
    "ann_ivf_knn_join_exact",
    "ann_ivf_topk_exact",
    "ann_sq_topk_exact",
    "ann_pq_topk_exact",
    "ann_hnsw_topk_exact",  # round-6 numpy-HNSW kernel-parity anchors
    "ann_hnsw_knn_join_exact",
    "text_knn_expr",
}


def test_first_budget_entries_all_hash_oracled():
    q = list(em.queries().keys())
    o = em.oracle_sql()
    missing = [k for k in q[:BUDGET] if k not in o]
    assert not missing, f"budgeted queries without SQL oracle: {missing}"


ROTATED_IN = {
    # hash-oracled queries that had zero driver CORRECTNESS rows through
    # round 5 — promoted into the budget in round 6 (VERDICT r5 item #1)
    "bm25_topk", "hybrid_rrf_topk", "hybrid_linear_topk",
    "ngram_jaccard_scale", "chunk_documents", "mixture_sample",
    "pii_redaction", "top_terms", "winnow_fingerprints",
    "orders_cube", "event_value_median_udaf", "salted_user_counts",
    "events_dedup_first", "ann_ivfpq_topk_exact",
    # round-6 decontamination trio (new this round, 0 prior driver rows)
    "decontam_report", "decontam_filter", "source_overlap",
}


def test_ann_exact_anchors_inside_budget():
    first = set(list(em.queries().keys())[:BUDGET])
    assert ANCHORS <= first, f"anchors outside budget: {ANCHORS - first}"


def test_round6_rotation_inside_budget():
    first = set(list(em.queries().keys())[:BUDGET])
    assert ROTATED_IN <= first, f"rotated queries outside budget: {ROTATED_IN - first}"


def test_every_oracle_has_a_query():
    q = em.queries()
    dangling = [k for k in em.oracle_sql() if k not in q]
    assert not dangling, f"oracle_sql entries with no queries() entry: {dangling}"


def test_all_queries_callable_and_unique():
    q = em.queries()
    assert len(q) >= 76
    assert all(callable(v) for v in q.values())


def test_no_hash_oracled_query_enumerates_below_rows_only():
    # rows-only queries are weaker evidence by design; a hash-oracled
    # query falling into the unordered tail (below them) silently
    # loses driver exposure — pin the invariant instead of comments
    q = list(em.queries().keys())
    o = em.oracle_sql()
    last_hash = max(i for i, k in enumerate(q) if k in o)
    first_rows_only = min(i for i, k in enumerate(q) if k not in o)
    assert last_hash < first_rows_only, (last_hash, first_rows_only)
