"""Exact IVF range JOIN at 1M vectors: does ball-cover cell-pair
pruning keep the all-pairs-within-radius join near-linear on clustered
(real-embedding-shaped) data, and does it find every planted pair?

Corpus: 1M clustered vectors (mixture of 256 gaussians) + n/10 planted
twins at L2 ≈ 0.08. Radius 0.5 separates twins (true pairs) from
within-cluster neighbors (≈4 apart). Because pruning removes only
provably-empty cell pairs, recall on the planted twins MUST be 1.0 —
a miss is a correctness bug, not a tuning problem.

Reported: admitted vs possible cell pairs, candidate work
Σ|c1|×|c2| vs the n²/2 brute-force space, join wall-time, planted
recall, extra (non-planted) pairs found.

Usage: python tools/range_join_smoke.py [n_base] [radius]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import math

import numpy as np
from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.ann import (
    ivf_build_auto,
    ivf_cell_stats,
    ivf_range_join,
)
from distributed_vector_database_spark.session import get_spark
from ivfpq_smoke import synth_clustered_embeddings


def _with_twins(spark, n, dim=64, twin_every=10, jitter=0.01):
    base = synth_clustered_embeddings(spark, n, dim=dim)
    n_twins = n // twin_every

    def z(x_col, salt):
        u1 = (F.pmod(F.xxhash64(x_col, F.lit(2 * salt)), 1_000_000) + 0.5) / 1e6
        u2 = (F.pmod(F.xxhash64(x_col, F.lit(2 * salt + 1)), 1_000_000) + 0.5) / 1e6
        return F.sqrt(-2.0 * F.log(u1)) * F.cos(2.0 * math.pi * u2)

    twins = (
        spark.range(n_twins)
        .select((F.col("id") * twin_every).alias("vec_id"))
        .join(base, "vec_id")
        .select(
            (F.col("vec_id") + n).alias("vec_id"),
            F.expr(
                "transform(embedding, (x, i) -> x)"
            ).alias("__e"),
            F.col("vec_id").alias("__src"),
        )
    )
    # jittered copy: twin_i = base_i + jitter * z(i)
    twins = twins.select(
        "vec_id",
        F.array(
            *[
                F.element_at("__e", i + 1)
                + jitter * z(F.col("__src") + 1_000_000_007, 9000 + i)
                for i in range(dim)
            ]
        ).alias("embedding"),
    )
    return base.unionByName(twins), n_twins


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    radius = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    spark = get_spark(app_name="dvds-range-join-smoke")
    corpus, n_twins = _with_twins(spark, n)
    corpus = corpus.localCheckpoint()

    t0 = time.time()
    centroids, assigned, _ = ivf_build_auto(corpus)
    assigned = assigned.localCheckpoint()
    stats = ivf_cell_stats(assigned, centroids)
    print(f"build+stats: {len(centroids)} cells in {time.time()-t0:.1f}s")

    # prune accounting (same math as the operator)
    rad = {c: r for c, r, _ in stats}
    sizes = {c: m for c, _, m in stats}
    live = [(c, v) for c, v in centroids if c in rad]
    cm = np.asarray([v for _, v in live])
    rv = np.asarray([rad[c] for c, _ in live])
    sz = np.asarray([sizes[c] for c, _ in live], dtype=np.float64)
    d = np.sqrt(
        np.maximum(
            (cm**2).sum(1)[:, None] - 2 * (cm @ cm.T) + (cm**2).sum(1)[None, :],
            0,
        )
    )
    adm = np.triu(d <= rv[:, None] + rv[None, :] + radius + 1e-3)
    n_adm, n_all = int(adm.sum()), len(live) * (len(live) + 1) // 2
    work = float((sz[:, None] * sz[None, :])[adm].sum())
    total = corpus.count()
    print(
        f"admitted {n_adm}/{n_all} cell pairs "
        f"({100.0*n_adm/n_all:.1f}%); candidate work "
        f"{work:.3g} vs brute {total*(total-1)/2:.3g} "
        f"({100.0*work/(total*(total-1)/2):.2f}%)"
    )

    t0 = time.time()
    pairs = ivf_range_join(
        spark, centroids, assigned, radius, cell_radii=stats
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    el = time.time() - t0
    planted = {(i * 10, n + i * 10) for i in range(n_twins)}
    hit = len(got & planted)
    print(
        f"join: {len(got)} pairs in {el:.1f}s; planted recall "
        f"{hit}/{len(planted)} = {hit/len(planted):.4f}; "
        f"extra pairs {len(got - planted)}"
    )
    assert hit == len(planted), "exact join missed a planted pair"
    spark.stop()
    print("RANGE JOIN SMOKE PASS")


if __name__ == "__main__":
    main()
