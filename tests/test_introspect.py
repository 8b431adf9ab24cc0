"""describe_* layout introspection: the numbers an ops runbook reads
before a compact/rebuild decision, checked against layouts whose state
we construct exactly."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def _emb(spark, n=200, dim=8, seed=1):
    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(n, dim))
    return spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )


def test_describe_ivf(spark, tmp_path):
    from distributed_vector_database_spark.operators.ann import (
        ivf_build,
        ivf_write,
    )
    from distributed_vector_database_spark.operators.introspect import (
        describe_ivf,
    )

    centroids, assigned = ivf_build(_emb(spark), n_centroids=4)
    path = str(tmp_path / "ivf")
    ivf_write(assigned, path, centroids=centroids)
    d = describe_ivf(spark, path)
    assert d["n_rows"] == 200 and d["n_cells"] <= 4
    assert d["has_quantizer"] and not d["has_cell_stats"]
    assert d["max_cell"] >= d["min_cell"] and d["cell_skew"] >= 1.0


def test_describe_hnsw_tombstone_pressure(spark, tmp_path):
    from distributed_vector_database_spark.operators.hnsw import (
        hnsw_delete,
        hnsw_write,
    )
    from distributed_vector_database_spark.operators.introspect import (
        describe_hnsw,
    )

    path = str(tmp_path / "hnsw")
    hnsw_write(_emb(spark, n=100), path, num_shards=2)
    hnsw_delete(path, [1, 2, 3])
    d = describe_hnsw(spark, path)
    assert d["n_shards"] == 2 and d["n_nodes"] == 100
    assert d["n_tombstones"] == 3 and d["dead_fraction"] == 0.03


def test_describe_published_counts_orphans(spark, tmp_path):
    from distributed_vector_database_spark.operators.introspect import (
        describe_published,
    )
    from distributed_vector_database_spark.operators.lexical import (
        postings_write,
    )

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "b c")], "doc_id long, text string"
    )
    path = str(tmp_path / "p")
    postings_write(docs, path, n_buckets=2)
    served = describe_published(spark, path)["n_rows_served"]
    # simulate a crashed append: rows under an unpublished attempt id
    spark.read.parquet(f"{path}/postings").limit(1).withColumn(
        "aid", F.lit("deadbeef")
    ).write.mode("append").partitionBy("bucket").parquet(f"{path}/postings")
    d = describe_published(spark, path)
    assert d["n_attempts_published"] == 1
    assert d["n_rows_served"] == served
    assert d["n_rows_orphaned"] == 1 and d["orphaned_attempts"] == ["deadbeef"]
