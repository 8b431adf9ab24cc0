"""Matryoshka layout at scale: 1M x 64-d FRONT-LOADED vectors (per-dim
scale decays 0.9^i — the distance-mass distribution MRL-trained
embedders produce), prefix_dim=16 layout, recall@10 of the truncated
two-pass serve vs knn_exact ground truth, plus the measured coarse-scan
I/O ratio (prefix column bytes vs full vector column bytes in the
layout's own parquet footer stats).

What this prices at 100 TB: the coarse pass reads ONLY the prefix
column (ReadSchema pruning, pinned by tests/test_mrl.py), so first-pass
bytes scale with prefix_dim/dim; the refine touches rerank*k rows.

Usage: python tools/mrl_smoke.py [n_vec] [prefix_dim] [rerank]
"""

from __future__ import annotations

import math
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.knn import knn_exact
from distributed_vector_database_spark.operators.quantization import (
    mrl_read_search,
    mrl_write,
)
from distributed_vector_database_spark.session import get_spark

K = 10
N_QUERIES = 4
DIM = 64


def synth_front_loaded(spark, n, dim=DIM, decay=0.9):
    """Deterministic hash-normal corpus with geometrically decaying
    per-dimension scale — front-loaded distance mass."""

    def z(x_col, salt):
        u1 = (F.pmod(F.xxhash64(x_col, F.lit(2 * salt)), 1_000_000) + 0.5) / 1e6
        u2 = (F.pmod(F.xxhash64(x_col, F.lit(2 * salt + 1)), 1_000_000) + 0.5) / 1e6
        return F.sqrt(-2.0 * F.log(u1)) * F.cos(2.0 * math.pi * u2)

    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[(decay ** i) * z(F.col("id"), i) for i in range(dim)]
        ).alias("embedding"),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    prefix = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    rerank = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    spark = get_spark(app_name="dvds-mrl-smoke")
    emb = synth_front_loaded(spark, n).localCheckpoint()

    path = tempfile.mkdtemp(prefix="dvdb_mrl_smoke_")
    t0 = time.time()
    mrl_write(emb, path, prefix_dim=prefix)
    build_s = time.time() - t0

    # parquet column footprint: the coarse pass's byte ratio
    import pyarrow.parquet as pq
    import glob as _glob

    pref_b = full_b = 0
    for f in _glob.glob(f"{path}/*.parquet"):
        meta = pq.ParquetFile(f).metadata
        for rg in range(meta.num_row_groups):
            g = meta.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                p = col.path_in_schema
                if p.startswith("mrl_prefix"):
                    pref_b += col.total_compressed_size
                elif p.startswith("embedding"):
                    full_b += col.total_compressed_size

    queries = {
        r["vec_id"]: [float(v) for v in r["embedding"]]
        for r in emb.filter((F.col("vec_id") % (n // N_QUERIES)) == 17)
        .limit(N_QUERIES)
        .collect()
    }

    truth, t0 = {}, time.time()
    for qid, qv in queries.items():
        truth[qid] = {
            r["vec_id"] for r in knn_exact(emb, qv, k=K, extra_cols=()).collect()
        }
    exact_s = (time.time() - t0) / len(queries)

    hits, t0 = 0, time.time()
    for qid, qv in queries.items():
        got = {
            r["vec_id"]
            for r in mrl_read_search(
                spark, path, qv, k=K, rerank=rerank
            ).collect()
        }
        hits += len(got & truth[qid])
    probe_s = (time.time() - t0) / len(queries)

    print(
        f"n={n} dim={DIM} prefix={prefix} rerank={rerank} "
        f"build={build_s:.1f}s exact={exact_s:.2f}s/q probe={probe_s:.2f}s/q "
        f"recall@{K}={hits / (K * len(queries)):.4f} "
        f"coarse_bytes_ratio={pref_b / max(full_b, 1):.3f} "
        f"(prefix {pref_b >> 20} MiB vs full {full_b >> 20} MiB)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
