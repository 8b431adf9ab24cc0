"""Posting-list BM25 serving at 2M docs: the round-6 bucketed inverted
index (postings_write / bm25_postings_search) vs the corpus-scan path
(bm25_search inline, and bm25_search with a maintained stats table).

The win case is SELECTIVE queries: rare terms touch a few posting
buckets (partition-pruned) instead of tokenizing/scanning every
document. Verifies the served top-10 is identical across all three
paths before timing.

Usage: python tools/postings_smoke.py [n_docs]   (default 2_000_000)
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from distributed_vector_database_spark.operators.lexical import (
    bm25_postings_search,
    bm25_search,
    postings_write,
    term_stats,
)
from distributed_vector_database_spark.session import get_spark
from scale_smoke import synth_docs

K = 10


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark(app_name="dvds-postings-smoke")
    docs = synth_docs(spark, n).cache()
    docs.count()

    # rare + mid-frequency query terms from the zipf-ish synthetic vocab
    query = ["w900", "w987"]

    idx = tempfile.mkdtemp(prefix="dvdb_lexidx_smoke_")
    t0 = time.time()
    postings_write(docs, idx, n_buckets=64)
    t_build = time.time() - t0

    stats = term_stats(docs).cache()
    stats.count()

    def run(label, fn):
        t0 = time.time()
        rows = [(r["doc_id"], r["score"]) for r in fn().collect()]
        t = time.time() - t0
        print(f"{label}: {t:.2f}s")
        return rows, t

    inline, t_inline = run(
        f"bm25 inline corpus-scan @ {n}", lambda: bm25_search(docs, query, k=K)
    )
    stats_path, t_stats = run(
        f"bm25 stats-table corpus-scan @ {n}",
        lambda: bm25_search(docs, query, k=K, stats=stats),
    )
    served, t_idx = run(
        f"bm25 posting-list serve @ {n} (build {t_build:.1f}s)",
        lambda: bm25_postings_search(spark, idx, query, k=K),
    )
    assert served == inline == stats_path, "ranking mismatch between paths"
    print(
        f"postings serving speedup: {t_inline / t_idx:.1f}x vs inline, "
        f"{t_stats / t_idx:.1f}x vs stats-table scan (identical top-{K})"
    )
    spark.stop()


if __name__ == "__main__":
    main()
