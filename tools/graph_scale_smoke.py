"""Scale smoke for the persisted graph layout: a synthetic ~2M-edge
power-law-ish graph through graph_write (audit included), then the
iterative operators over the served layout — the shape every graph
contract query runs at sf0.1, two decades bigger.

Usage: python tools/graph_scale_smoke.py [n_nodes] [avg_deg]
Prints one timing line per stage; exits nonzero on any audit or
sanity failure.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.graph import (
    graph_meta,
    graph_read,
    graph_update,
    graph_write,
    kcore,
    pagerank,
)
from distributed_vector_database_spark.session import get_spark


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    avg_deg = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app_name="graph-scale-smoke")
    tmp = tempfile.mkdtemp(prefix="dvdb_graph_smoke_")
    try:
        # synthetic undirected edges: each of n*avg_deg/2 one-directional
        # rows connects a hash-spread pair; xxhash64 keeps it deterministic
        # and skews low-id nodes hub-ward (id mod bias), exercising the
        # degree-denormalized layout without a pathological star
        m = n_nodes * avg_deg // 2
        ids = spark.range(m)
        und = ids.select(
            (F.abs(F.xxhash64("id")) % n_nodes).alias("a"),
            (F.abs(F.xxhash64("id", F.lit(1))) % (n_nodes // 4)).alias("b"),
        ).select(
            F.least("a", "b").alias("src"), F.greatest("a", "b").alias("dst")
        ).filter(F.col("src") != F.col("dst")).distinct()
        sym = und.union(
            und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )

        t0 = time.time()
        meta = graph_write(sym, f"{tmp}/g")
        t_write = time.time() - t0
        print(
            f"graph_write+audit: {t_write:.1f}s "
            f"({meta['n_nodes']} nodes, {meta['n_edges']} und-edges)"
        )

        adj = graph_read(spark, f"{tmp}/g")
        t0 = time.time()
        pr = pagerank(adj, iterations=5, use_deg_col=True)
        n_pr = pr.count()
        t_pr = time.time() - t0
        print(f"pagerank x5 over layout: {t_pr:.1f}s ({n_pr} ranks)")
        assert n_pr == meta["n_nodes"], (n_pr, meta)
        # mass conservation: sum(rank_rel) == N (rank sums to 1, scaled)
        total = pr.agg(F.sum("rank_rel")).first()[0]
        assert abs(total - meta["n_nodes"]) < 1.0, total

        t0 = time.time()
        kc = kcore(adj.select("src", "dst"), k=4, rounds=4).count()
        t_kc = time.time() - t0
        print(f"kcore(4) x4 rounds: {t_kc:.1f}s ({kc} survivors)")

        # edge-delta fold: add 1k edges, remove 1k, re-audit + publish
        delta_add = spark.range(1_000).select(
            (F.col("id") + n_nodes).alias("src"),
            (F.col("id") + n_nodes + 1).alias("dst"),
        )
        delta_rm = und.limit(1_000).select("src", "dst")
        t0 = time.time()
        meta2 = graph_update(
            spark, f"{tmp}/g", add_edges=delta_add, remove_edges=delta_rm
        )
        t_upd = time.time() - t0
        print(
            f"graph_update(+1k/-1k)+audit: {t_upd:.1f}s "
            f"(v{meta2['version']}, {meta2['n_edges']} und-edges)"
        )
        assert meta2["version"] == 1
        assert graph_meta(f"{tmp}/g")["version"] == 1
        print("OK")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
