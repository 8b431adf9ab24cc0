"""IVF physical layout: centroid-partitioned writes give partition-pruned
probe reads, and a pruned-probe search still finds the exact neighbors
when every relevant centroid is probed."""

import numpy as np

from distributed_vector_database_spark.operators.ann import (
    ivf_build,
    ivf_read_probe,
    ivf_write,
)
from distributed_vector_database_spark.operators.knn import knn_exact
from distributed_vector_database_spark.plans.explain import formatted_plan


def test_ivf_partitioned_probe_prunes_and_matches(spark, tables, tmp_path):
    emb = tables["embeddings"]
    centroids, assigned = ivf_build(emb, n_centroids=4)
    path = str(tmp_path / "ivf")
    ivf_write(assigned, path)

    q = list(emb.filter("vec_id = 3").first()["embedding"])
    cmat = np.asarray([c for _, c in centroids])
    d = ((cmat - np.asarray(q)) ** 2).sum(axis=1)
    probe = [int(centroids[i][0]) for i in np.argsort(d)[:2]]

    probed = ivf_read_probe(spark, path, probe)
    plan = formatted_plan(probed)
    assert "PartitionFilters" in plan and "centroid_id" in plan
    # probing all partitions == exact search
    all_probe = ivf_read_probe(spark, path, [c[0] for c in centroids])
    got = {
        r["vec_id"]
        for r in knn_exact(all_probe, q, k=10, extra_cols=()).collect()
    }
    want = {r["vec_id"] for r in knn_exact(emb, q, k=10).collect()}
    assert got == want
    # the 2-probe read touches fewer rows than the corpus
    assert probed.count() < emb.count()
