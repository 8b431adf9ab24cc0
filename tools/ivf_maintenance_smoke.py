"""IVF changelog maintenance at 1M vectors (VERDICT r7 #6): build the
persisted centroid-partitioned layout on a 1M base corpus, replay a
100k-op MIXED put/delete changelog through the streaming fold body
(streaming/ivf_maintenance.build_ivf_changelog_fold — the same
function foreachBatch calls), and measure (a) fold wall-time, (b) how
many centroid cell directories were physically rewritten, and (c)
post-replay recall@10 against brute force over the EXPECTED final
corpus.

What must hold at scale: the fold's cost follows the BATCH, not the
corpus — puts assign against the frozen quantizer and append files
into only their target cells (upsert pre-delete included), deletes
rewrite only the victims' cells. Cells untouched by the batch must
keep their files byte-for-byte (mtime check). Recall must be exact at
full probe width: IVF deletion is physical, so serving pays zero
tombstone-filter cost and a full-width search over the maintained
layout equals brute force over (base - deletes - re-puts + puts).

Usage: python tools/ivf_maintenance_smoke.py [n_total] [n_ops] [cells]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.ann import (
    ivf_build,
    ivf_search,
    ivf_write,
)
from distributed_vector_database_spark.operators.knn import knn_exact
from distributed_vector_database_spark.session import get_spark
from distributed_vector_database_spark.streaming.ivf_maintenance import (
    build_ivf_changelog_fold,
)
from ivfpq_smoke import synth_clustered_embeddings

K = 10
N_QUERIES = 6


def _cell_mtimes(path: str) -> dict[str, float]:
    out = {}
    for d in os.listdir(path):
        if not d.startswith("centroid_id="):
            continue
        full = os.path.join(path, d)
        out[d] = max(
            (os.path.getmtime(os.path.join(full, f)) for f in os.listdir(full)),
            default=0.0,
        )
    return out


def main() -> None:
    n_total = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_ops = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    cells = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    spark = get_spark(app_name="dvds-ivf-maint-smoke")

    # base corpus: vec_id < n_total; the changelog then (a) re-puts
    # n_ops/4 existing keys with NEW vectors, (b) puts n_ops/2 brand
    # new keys, (c) deletes n_ops/4 existing keys
    emb = synth_clustered_embeddings(spark, n_total + n_ops).cache()
    emb.count()
    base = emb.filter(F.col("vec_id") < n_total)

    path = tempfile.mkdtemp(prefix="dvdb_ivf_maint_")
    t0 = time.time()
    centroids, assigned = ivf_build(
        base, n_centroids=cells, train_sample_rows=cells * 128
    )
    ivf_write(assigned, path)
    build_s = time.time() - t0
    print(f"# base build+write {n_total} rows / {cells} cells: "
          f"{build_s:.1f}s", file=sys.stderr)

    n_reput, n_del = n_ops // 4, n_ops // 4
    n_new = n_ops - n_reput - n_del
    # re-puts: keys [0, n_reput) get the vector of key+n_total+... use
    # a deterministic perturbed vector = the synth vector of a shifted id
    reputs = (
        emb.filter(F.col("vec_id") >= n_total)
        .limit(n_reput)
        .withColumn("__newkey", F.col("vec_id") - F.lit(n_total))
        .select(
            F.col("__newkey").alias("vec_id"),
            F.col("embedding"),
            F.lit("put").alias("op"),
        )
    )
    news = (
        emb.filter(
            (F.col("vec_id") >= n_total - n_new)
            & (F.col("vec_id") < n_total)
        )
        .select(
            (F.col("vec_id") + F.lit(2 * n_total)).alias("vec_id"),
            "embedding",
            F.lit("put").alias("op"),
        )
    )
    dels = (
        base.filter(
            (F.col("vec_id") >= n_reput)
            & (F.col("vec_id") < n_reput + n_del)
        )
        .select(
            "vec_id",
            F.lit(None).cast("array<double>").alias("embedding"),
            F.lit("delete").alias("op"),
        )
    )
    changelog = (
        reputs.unionByName(news)
        .unionByName(dels)
        .withColumn("seq", F.col("vec_id"))
    )

    before = _cell_mtimes(path)
    fold = build_ivf_changelog_fold(path, centroids)
    t0 = time.time()
    fold(changelog, batch_id=1)
    fold_s = time.time() - t0
    after = _cell_mtimes(path)
    rewritten = sorted(
        d for d in after
        if d not in before or after[d] > before[d]
    )
    untouched = [d for d in before if d in after and after[d] == before[d]]

    # expected final corpus
    expected = (
        base.filter(
            ~((F.col("vec_id") >= n_reput) & (F.col("vec_id") < n_reput + n_del))
        )
        .filter(F.col("vec_id") >= n_reput)  # re-put keys replaced below
        .select("vec_id", "embedding")
        .unionByName(reputs.select("vec_id", "embedding"))
        .unionByName(news.select("vec_id", "embedding"))
        .cache()
    )
    expected_n = expected.count()
    stored = spark.read.parquet(path)
    stored_n = stored.count()
    assert stored_n == expected_n, (stored_n, expected_n)

    # recall at FULL probe width must be exact (physical deletion)
    qrows = expected.filter((F.col("vec_id") % 131) == 7).limit(N_QUERIES).collect()
    hits = denom = 0
    t0 = time.time()
    for r in qrows:
        qv = [float(v) for v in r["embedding"]]
        truth = {
            x["vec_id"] for x in knn_exact(expected, qv, k=K, extra_cols=()).collect()
        }
        got = {
            x["vec_id"]
            for x in ivf_search(
                spark, centroids, stored, qv, k=K, nprobe=10**9
            ).collect()
        }
        hits += len(got & truth)
        denom += K
    recall = hits / denom
    print(
        f"ivf_maintenance n_base={n_total} cells={cells} ops={n_ops} "
        f"(put_new={n_new} re_put={n_reput} delete={n_del}): fold "
        f"{fold_s:.1f}s ({n_ops / max(fold_s, 1e-9):.0f} ops/s), "
        f"cells rewritten {len(rewritten)}/{len(after)} "
        f"(untouched kept files: {len(untouched)}), post-replay "
        f"full-width recall@{K}={recall:.4f} vs brute force over the "
        f"expected {expected_n} rows; base build {build_s:.1f}s"
    )
    assert recall == 1.0, f"full-width recall must be exact: {recall}"
    spark.stop()


if __name__ == "__main__":
    main()
