"""Scale smoke for the log-structured co-occurrence fold: 1M baskets
(~5M basket-item rows) ingested in 8 micro-batches, served, compacted,
served again — the O(batch)-per-fold claim measured, not asserted.

Usage: python tools/graph_fold_scale_smoke.py [n_baskets] [n_batches]
Prints per-stage timings; exits nonzero on any equivalence failure.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from distributed_vector_database_spark.session import get_spark
from distributed_vector_database_spark.streaming.graph_maintenance import (
    build_graph_fold,
    compact_graph_state,
    read_cooccurrence_graph,
)


def main() -> None:
    n_baskets = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark(app_name="graph-fold-smoke")
    tmp = tempfile.mkdtemp(prefix="dvdb_gfold_smoke_")
    try:
        # ~5 items per basket from a 50k-item catalog, hash-derived so
        # batches are reproducible; item popularity skewed by the mod
        rows = spark.range(n_baskets * 5).select(
            (F.col("id") % n_baskets).alias("basket"),
            (F.abs(F.xxhash64("id")) % 50_000).alias("item"),
        )
        state = f"{tmp}/state"
        fold = build_graph_fold(state, "basket", "item")
        per_batch = []
        for i in range(n_batches):
            b = rows.filter(F.col("basket") % n_batches == i)
            t0 = time.time()
            fold(b, i)
            per_batch.append(time.time() - t0)
        print(
            f"fold x{n_batches} ({n_baskets} baskets total): "
            f"first {per_batch[0]:.1f}s, last {per_batch[-1]:.1f}s "
            f"(flat per-batch cost = O(batch), not O(state))"
        )
        t0 = time.time()
        served = read_cooccurrence_graph(spark, state, min_support=3)
        n_edges = served.count()
        t_read = time.time() - t0
        print(f"serve across {n_batches} segments: {t_read:.1f}s ({n_edges} edges)")

        t0 = time.time()
        absorbed = compact_graph_state(spark, state)
        t_cpt = time.time() - t0
        print(f"compact ({absorbed} segments): {t_cpt:.1f}s")

        t0 = time.time()
        served2 = read_cooccurrence_graph(spark, state, min_support=3)
        n_edges2 = served2.count()
        t_read2 = time.time() - t0
        print(f"serve from compacted base: {t_read2:.1f}s ({n_edges2} edges)")
        assert n_edges == n_edges2, (n_edges, n_edges2)

        # equivalence vs one-shot fold of the whole corpus
        one = f"{tmp}/oneshot"
        build_graph_fold(one, "basket", "item")(rows, 0)
        a = read_cooccurrence_graph(spark, state, 3)
        b = read_cooccurrence_graph(spark, one, 3)
        diff = a.exceptAll(b).count() + b.exceptAll(a).count()
        assert diff == 0, f"batched fold != one-shot fold ({diff} rows differ)"
        print("batched == one-shot: OK")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
