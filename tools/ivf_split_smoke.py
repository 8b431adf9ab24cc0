"""Incremental IVF cell-split maintenance at scale: build a 1M-vector
layout with a persisted quantizer, append a skewed 100k batch that all
lands in one region (the continual-ingest hotspot: new data is never
uniform over the old quantizer's cells), then run ivf_split_fat_cells
and measure (a) split wall-time vs what a full ivf_build_auto rebuild
costs, (b) how many cells were touched, and (c) the probe cost for a
query INSIDE the hotspot before vs after the split.

What must hold at scale: split cost follows the fat cells (their
members re-cluster; everything else keeps its files), and the hotspot
probe reads cell-sized — not hotspot-sized — row counts afterwards.

Usage: python tools/ivf_split_smoke.py [n_base] [n_append] [cells]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.ann import (
    ivf_append,
    ivf_read_quantizer,
    ivf_build,
    ivf_search,
    ivf_split_fat_cells,
    ivf_write,
)
from distributed_vector_database_spark.session import get_spark
from ivfpq_smoke import synth_clustered_embeddings

K = 10


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_append = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    cells = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    spark = get_spark(app_name="dvds-ivf-split-smoke")

    emb = synth_clustered_embeddings(spark, n_base).cache()
    emb.count()
    path = tempfile.mkdtemp(prefix="dvdb_ivf_split_")
    t0 = time.time()
    centroids, assigned = ivf_build(
        emb, n_centroids=cells, train_sample_rows=cells * 128
    )
    ivf_write(assigned, path, centroids=centroids)
    build_s = time.time() - t0
    print(f"# base build {n_base} rows / {cells} cells: {build_s:.1f}s",
          file=sys.stderr)

    # skewed append: 100k rows tightly around ONE existing vector's
    # neighborhood — every row routes to the same few cells
    anchor = emb.filter(F.col("vec_id") == 11).first()["embedding"]
    dim = len(anchor)
    batch = (
        spark.range(n_base, n_base + n_append)
        .select(
            F.col("id").alias("vec_id"),
            F.array(
                *[
                    F.lit(float(anchor[j]))
                    + (F.rand(seed=j) - F.lit(0.5)) * F.lit(0.01)
                    for j in range(dim)
                ]
            ).alias("embedding"),
        )
    )
    t0 = time.time()
    ivf_append(spark, path, batch, centroids, assume_absent=True)
    append_s = time.time() - t0

    stored = spark.read.parquet(path)
    sizes_before = {
        r["centroid_id"]: r["cnt"]
        for r in stored.groupBy("centroid_id").agg(F.count("*").alias("cnt")).collect()
    }
    fat_before = max(sizes_before.values())
    qv = [float(x) for x in anchor]

    def probe_time():
        best = None
        for _ in range(2):
            t0 = time.time()
            ivf_search(
                spark, ivf_read_quantizer(path),
                spark.read.parquet(path), qv, k=K, nprobe=max(2, cells // 8),
            ).collect()
            el = time.time() - t0
            best = el if best is None else min(best, el)
        return best

    probe_before = probe_time()

    t0 = time.time()
    n_split = ivf_split_fat_cells(spark, path, cap_factor=4.0)
    split_s = time.time() - t0
    stored2 = spark.read.parquet(path)
    sizes_after = {
        r["centroid_id"]: r["cnt"]
        for r in stored2.groupBy("centroid_id").agg(F.count("*").alias("cnt")).collect()
    }
    probe_after = probe_time()
    assert stored2.count() == n_base + n_append
    print(
        f"ivf_split n_base={n_base} skewed_append={n_append} cells={cells}: "
        f"append {append_s:.1f}s; split {n_split} fat cells in {split_s:.1f}s "
        f"(vs {build_s:.1f}s full rebuild); max cell {fat_before} -> "
        f"{max(sizes_after.values())} rows ({len(sizes_before)} -> "
        f"{len(sizes_after)} cells); hotspot probe {probe_before:.2f}s -> "
        f"{probe_after:.2f}s"
    )
    assert max(sizes_after.values()) < fat_before
    spark.stop()


if __name__ == "__main__":
    main()
