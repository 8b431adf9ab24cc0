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
    "text_knn_expr",
}


def test_first_budget_entries_all_hash_oracled():
    q = list(em.queries().keys())
    o = em.oracle_sql()
    missing = [k for k in q[:BUDGET] if k not in o]
    assert not missing, f"budgeted queries without SQL oracle: {missing}"


def test_ann_exact_anchors_inside_budget():
    first = set(list(em.queries().keys())[:BUDGET])
    assert ANCHORS <= first, f"anchors outside budget: {ANCHORS - first}"


def test_every_oracle_has_a_query():
    q = em.queries()
    dangling = [k for k in em.oracle_sql() if k not in q]
    assert not dangling, f"oracle_sql entries with no queries() entry: {dangling}"


def test_all_queries_callable_and_unique():
    q = em.queries()
    assert len(q) >= 76
    assert all(callable(v) for v in q.values())
