"""Exact IVF range search at 1M vectors: how much of the corpus does
triangle-inequality cell pruning actually skip, and is the result still
exactly the brute-force radius answer?

Build an auto-sized IVF layout over a 1M clustered corpus (the
structure real embedding spaces have), persist quantizer + per-cell
bounding radii, then serve radius queries through the restart path
(ivf_read_range_search). Measure per query: (a) wall-time, (b) the
fraction of cells PROVEN empty and never read, (c) rows scanned vs
corpus, (d) exact equality against brute force.

What must hold at scale: pruning is driver-side O(n_centroids) math
over the persisted stats, the scan is parquet partition pruning over
only the admitted cells, and — because pruning removes only provably
empty cells — results are bit-identical to the full scan at any
corpus size.

Usage: python tools/range_search_smoke.py [n_total] [radius...]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import numpy as np
from pyspark.sql import functions as F

from distributed_vector_database_spark.functions.vector import squared_l2
from distributed_vector_database_spark.operators.ann import (
    ivf_build_auto,
    ivf_cell_stats,
    ivf_read_range_search,
    ivf_write,
)
from distributed_vector_database_spark.session import get_spark
from ivfpq_smoke import synth_clustered_embeddings

N_QUERIES = 5


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    radii = [float(r) for r in sys.argv[2:]] or [1.0, 2.0, 4.0]
    spark = get_spark(app_name="dvds-range-smoke")
    corpus = synth_clustered_embeddings(spark, n).localCheckpoint()

    t0 = time.time()
    centroids, assigned, _ = ivf_build_auto(corpus)
    path = tempfile.mkdtemp(prefix="dvds_range_smoke_") + "/ivf"
    stats = ivf_cell_stats(assigned, centroids)
    ivf_write(assigned, path, centroids=centroids, cell_stats=stats)
    build_s = time.time() - t0
    print(
        f"built+persisted {n} rows, {len(centroids)} cells "
        f"(stats incl.) in {build_s:.1f}s"
    )

    qrows = corpus.filter(F.col("vec_id") % (n // N_QUERIES) == 17).limit(
        N_QUERIES
    ).collect()
    rad_by_id = {c: r for c, r, _ in stats}
    for radius in radii:
        for row in qrows:
            q = [float(x) for x in row["embedding"]]
            # driver-side prune accounting (same math as the operator)
            qv = np.asarray(q)
            pruned = sum(
                1
                for cid, cv in centroids
                if cid in rad_by_id
                and float(np.sqrt(((np.asarray(cv) - qv) ** 2).sum()))
                - rad_by_id[cid]
                > radius + 1e-3
            )
            t0 = time.time()
            got = [
                tuple(r)
                for r in ivf_read_range_search(
                    spark, path, q, radius
                ).collect()
            ]
            el = time.time() - t0
            want = [
                tuple(r)
                for r in corpus.select(
                    "vec_id",
                    F.round(squared_l2("embedding", q), 6).alias("score"),
                )
                .filter(F.col("score") <= radius * radius)
                .orderBy("score", "vec_id")
                .collect()
            ]
            ok = got == want
            print(
                f"r={radius} qid={row['vec_id']}: {len(got)} hits in "
                f"{el:.2f}s, pruned {pruned}/{len(centroids)} cells "
                f"({100.0 * pruned / len(centroids):.1f}%), "
                f"exact={'YES' if ok else 'NO'}"
            )
            assert ok, "range search diverged from brute force"
    spark.stop()
    print("RANGE SMOKE PASS")


if __name__ == "__main__":
    main()
