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


def _two_far_clusters(spark):
    # two tight balls 100 apart: a radius-1 query ball around cluster A
    # can NEVER intersect cluster B's bounding ball, so range search
    # must prove B's cells empty and skip them
    rows = []
    for i in range(20):
        rows.append((i, [0.0 + 0.01 * i, 0.0]))
    for i in range(20, 40):
        rows.append((i, [100.0 + 0.01 * i, 0.0]))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_ivf_range_search_prunes_far_cells_and_stays_exact(spark, tmp_path):
    from distributed_vector_database_spark.operators.ann import (
        ivf_cell_stats,
        ivf_range_search,
    )

    df = _two_far_clusters(spark)
    centroids, assigned = ivf_build(df, n_centroids=2)
    stats = ivf_cell_stats(assigned, centroids)
    assert len(stats) == 2 and all(n == 20 for _, _, n in stats)

    # persist the layout so pruning is visible as parquet partition
    # pruning (in-memory LocalRelations get constant-folded away)
    path = str(tmp_path / "ivf_range")
    ivf_write(assigned, path)
    stored = spark.read.parquet(path)

    q = [0.1, 0.0]
    got = ivf_range_search(
        spark, centroids, stored, q, radius=1.0, cell_radii=stats
    )
    # exactness: matches brute force over everything
    from distributed_vector_database_spark.functions.vector import squared_l2
    from pyspark.sql import functions as F

    brute = (
        df.select("vec_id", F.round(squared_l2("embedding", q), 6).alias("score"))
        .filter(F.col("score") <= 1.0)
        .orderBy("score", "vec_id")
    )
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in brute.collect()]
    # pruning really skipped the far cluster: the scan's partition
    # filter admits ONLY the near cell
    near_cell = min(
        (cid for cid, _ in centroids),
        key=lambda cid: sum(
            (a - b) ** 2 for a, b in zip(dict(centroids)[cid], q)
        ),
    )
    far_cell = next(cid for cid, _ in centroids if cid != near_cell)
    plan = formatted_plan(got)
    assert "PartitionFilters" in plan
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan).group(1)
    # the filter renders as `centroid_id#N = <cell>` or `... IN (<cells>)`;
    # match the literal cell values, not attribute-id digits
    admitted = {int(v) for v in re.findall(r"(?:= |IN \(|, )(\d+)\b", pf)}
    assert near_cell in admitted and far_cell not in admitted


def test_ivf_range_search_empty_and_nulls(spark):
    from distributed_vector_database_spark.operators.ann import (
        ivf_cell_stats,
        ivf_range_search,
    )
    from pyspark.sql import functions as F

    df = _two_far_clusters(spark).unionByName(
        spark.createDataFrame(
            [(99, None)], "vec_id long, embedding array<double>"
        )
    )
    centroids, assigned = ivf_build(
        df.filter(F.col("embedding").isNotNull()), n_centroids=2
    )
    # re-attach the null row to the assigned side (cell 0 arbitrarily):
    # range search must ignore it, not crash or emit it
    null_row = spark.createDataFrame(
        [(99, None, int(centroids[0][0]))],
        "vec_id long, embedding array<double>, centroid_id int",
    )
    assigned = assigned.unionByName(null_row)
    stats = ivf_cell_stats(assigned, centroids)

    # query ball in the void between the clusters: zero results, and
    # every cell is provably empty -> the no-cells fast path
    got = ivf_range_search(
        spark, centroids, assigned, [50.0, 0.0], radius=1.0, cell_radii=stats
    )
    assert got.count() == 0
    assert got.columns == ["vec_id", "score"]

    # a ball around cluster A: the null row (assigned to some cell) is
    # ignored even when its cell is probed
    got2 = ivf_range_search(
        spark, centroids, assigned, [0.1, 0.0], radius=1.0, cell_radii=stats
    )
    ids = {r["vec_id"] for r in got2.collect()}
    assert 99 not in ids and len(ids) == 20


def test_ivf_range_join_prunes_cross_cell_pairs_and_stays_exact(spark):
    from pyspark.sql import functions as F

    from distributed_vector_database_spark.functions.vector import squared_l2
    from distributed_vector_database_spark.operators.ann import (
        ivf_cell_stats,
        ivf_range_join,
    )

    df = _two_far_clusters(spark)
    centroids, assigned = ivf_build(df, n_centroids=2)
    stats = ivf_cell_stats(assigned, centroids)

    got = [
        tuple(r)
        for r in ivf_range_join(
            spark, centroids, assigned, radius=0.5, cell_radii=stats
        ).collect()
    ]
    # brute force over all pairs
    a = df.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = df.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    brute = [
        tuple(r)
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(squared_l2(F.col("va"), F.col("vb")), 6).alias("score"),
        )
        .filter(F.col("score") <= 0.25)
        .orderBy("id_a", "id_b")
        .collect()
    ]
    assert got == brute and len(got) > 0
    # no cross-cluster pair can be within 0.5 of each other (clusters
    # 100 apart): every result pair stays inside one cluster
    assert all((ia < 20) == (ib < 20) for ia, ib, _ in got)
    # the pair-prune math itself: the cross pair's bound exceeds radius
    import numpy as np

    rad = {c: r for c, r, _ in stats}
    (c0, v0), (c1, v1) = centroids
    d = float(np.sqrt(((np.asarray(v0) - np.asarray(v1)) ** 2).sum()))
    assert d - rad[c0] - rad[c1] > 0.5  # cross pair provably empty
