"""Deletion propagation for persisted ANN serving indexes: IVF
physical partition-local rewrite, HNSW tombstones (the reference's
deleted_ids model, src/datanode/handler.py:43,99,123-133) and
shard-local compaction (its _rebuild_hnsw_index, handler.py:90-118)."""

import os

import numpy as np
from pyspark.sql import functions as F


def _emb(spark, n=200, dim=8, seed=5):
    rng = np.random.default_rng(seed)
    rows = [
        (i, [float(x) for x in rng.normal(size=dim)]) for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _ids(df, res):
    return [r["vec_id"] for r in res.collect()]


def test_ivf_delete_matches_exact_over_remaining(spark, tmp_path):
    from distributed_vector_database_spark.operators.ann import (
        ivf_build,
        ivf_delete,
        ivf_search,
        ivf_write,
    )
    from distributed_vector_database_spark.operators.knn import knn_exact

    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    victims = [i for i in range(200) if i % 5 == 2]
    path = str(tmp_path / "ivf")
    centroids, assigned = ivf_build(emb, n_centroids=4)
    ivf_write(assigned, path)

    removed = ivf_delete(spark, path, victims)
    assert removed == len(victims)
    stored = spark.read.parquet(path)
    assert stored.filter(F.col("vec_id").isin(victims)).count() == 0

    got = ivf_search(spark, centroids, stored, q, k=7, nprobe=10**9)
    want = knn_exact(
        emb.filter(~F.col("vec_id").isin(victims)), q, k=7, extra_cols=()
    )
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]

    # deleting absent ids is a no-op
    assert ivf_delete(spark, path, [99999]) == 0


def test_ivf_delete_removes_emptied_cell_dirs(spark, tmp_path):
    from distributed_vector_database_spark.operators.ann import (
        ivf_build,
        ivf_delete,
        ivf_write,
    )

    emb = _emb(spark, n=60)
    path = str(tmp_path / "ivf")
    _, assigned = ivf_build(emb, n_centroids=3)
    ivf_write(assigned, path)
    # wipe one whole cell
    cell = assigned.select("centroid_id").first()["centroid_id"]
    cell_ids = [
        r["vec_id"]
        for r in assigned.filter(F.col("centroid_id") == cell).collect()
    ]
    ivf_delete(spark, path, cell_ids)
    assert not os.path.isdir(f"{path}/centroid_id={cell}")
    left = spark.read.parquet(path)
    assert left.filter(F.col("vec_id").isin(cell_ids)).count() == 0


def test_hnsw_delete_tombstones_filter_at_serve(spark, tmp_path):
    from distributed_vector_database_spark.operators.hnsw import (
        hnsw_delete,
        hnsw_read_search,
        hnsw_write,
    )
    from distributed_vector_database_spark.operators.knn import knn_exact

    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    path = str(tmp_path / "hnsw")
    hnsw_write(emb, path, num_shards=3)
    # delete the CURRENT top-3 so the filter provably changes results
    top = _ids(emb, hnsw_read_search(spark, path, q, k=3, ef=10**9))
    n_tomb = hnsw_delete(path, top)
    assert n_tomb == 3

    got = hnsw_read_search(spark, path, q, k=7, ef=10**9)
    want = knn_exact(
        emb.filter(~F.col("vec_id").isin(top)), q, k=7, extra_cols=()
    ).select("vec_id", "score")
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]

    # tombstone files accumulate across calls; the set unions
    assert hnsw_delete(path, [top[0], 150]) == 4


def test_hnsw_delete_graph_mode_keeps_depth(spark, tmp_path):
    # beam-search mode (ef < n): the shard pool widens by its tombstone
    # count, so deleting the whole current top-k still yields k live
    # results with high recall
    from distributed_vector_database_spark.operators.hnsw import (
        hnsw_delete,
        hnsw_read_search,
        hnsw_write,
    )
    from distributed_vector_database_spark.operators.knn import knn_exact

    emb = _emb(spark, n=400)
    q = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    path = str(tmp_path / "hnsw")
    hnsw_write(emb, path, num_shards=2)
    top = _ids(emb, hnsw_read_search(spark, path, q, k=10, ef=10**9))
    hnsw_delete(path, top)
    got = set(_ids(emb, hnsw_read_search(spark, path, q, k=10, ef=64)))
    assert len(got) == 10 and not (got & set(top))
    truth = set(
        _ids(
            emb,
            knn_exact(
                emb.filter(~F.col("vec_id").isin(top)), q, k=10, extra_cols=()
            ),
        )
    )
    assert len(got & truth) >= 9


def test_hnsw_append_resurrects_tombstoned_key(spark, tmp_path):
    from distributed_vector_database_spark.operators.hnsw import (
        _read_tombstones,
        hnsw_append,
        hnsw_delete,
        hnsw_read_search,
        hnsw_write,
    )

    emb = _emb(spark, n=100)
    q = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    path = str(tmp_path / "hnsw")
    hnsw_write(emb, path, num_shards=2)
    hnsw_delete(path, [0, 50])
    assert 0 not in set(_ids(emb, hnsw_read_search(spark, path, q, k=5, ef=10**9)))

    # re-put key 0 (same vector): it must serve again; 50 stays dead
    hnsw_append(spark, path, emb.filter(F.col("vec_id") == 0))
    got = _ids(emb, hnsw_read_search(spark, path, q, k=5, ef=10**9))
    assert got[0] == 0  # the query vector itself, score 0
    assert _read_tombstones(path) == frozenset({50})


def test_hnsw_compact_equals_fresh_build_and_clears_tombstones(
    spark, tmp_path
):
    from distributed_vector_database_spark.operators.hnsw import (
        _read_tombstones,
        hnsw_compact,
        hnsw_delete,
        hnsw_read_search,
        hnsw_write,
    )

    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    victims = [i for i in range(200) if i % 4 == 1]
    path = str(tmp_path / "hnsw")
    hnsw_write(emb, path, num_shards=3)
    hnsw_delete(path, victims)
    before = [tuple(r) for r in hnsw_read_search(spark, path, q, k=7, ef=10**9).collect()]

    removed = hnsw_compact(spark, path)
    assert removed == len(victims)
    assert _read_tombstones(path) == frozenset()
    stored = spark.read.parquet(path)
    assert stored.filter(F.col("vec_id").isin(victims)).count() == 0

    # results identical before/after reclaim (exhaustive mode)
    after = [tuple(r) for r in hnsw_read_search(spark, path, q, k=7, ef=10**9).collect()]
    assert after == before

    # fresh build over the remaining corpus serves the same answers
    fresh = str(tmp_path / "fresh")
    hnsw_write(emb.filter(~F.col("vec_id").isin(victims)), fresh, num_shards=3)
    assert [
        tuple(r) for r in hnsw_read_search(spark, fresh, q, k=7, ef=10**9).collect()
    ] == after

    # compacting with no tombstones is a no-op
    assert hnsw_compact(spark, path) == 0


def test_hnsw_compact_removes_fully_victim_shard(spark, tmp_path):
    from distributed_vector_database_spark.operators.hnsw import (
        hnsw_compact,
        hnsw_delete,
        hnsw_write,
    )

    emb = _emb(spark, n=80)
    path = str(tmp_path / "hnsw")
    hnsw_write(emb, path, num_shards=2)
    stored = spark.read.parquet(path)
    shard = stored.select("shard_id").first()["shard_id"]
    shard_keys = [
        r["vec_id"]
        for r in stored.filter(F.col("shard_id") == shard).collect()
    ]
    hnsw_delete(path, shard_keys)
    hnsw_compact(spark, path)
    assert not os.path.isdir(f"{path}/shard_id={shard}")
    left = spark.read.parquet(path)
    assert left.filter(F.col("vec_id").isin(shard_keys)).count() == 0
    assert left.count() == 80 - len(shard_keys)


def test_hnsw_reput_changed_vector_serves_new_vector(spark, tmp_path):
    """Newest node wins: a re-put key with a CHANGED vector must serve
    the new vector's score, never the stale node's (the reference
    tombstones the old hnsw_id on re-put, handler.py:253-261)."""
    from distributed_vector_database_spark.operators.hnsw import (
        hnsw_append,
        hnsw_read_search,
        hnsw_write,
    )

    emb = _emb(spark, n=120)
    q = emb.filter(F.col("vec_id") == 3).first()["embedding"]
    path = str(tmp_path / "hnsw")
    hnsw_write(emb, path, num_shards=2)
    # key 3 exactly matches q before the re-put
    assert _ids(emb, hnsw_read_search(spark, path, q, k=1, ef=10**9)) == [3]

    # move key 3 far away from q
    far = [[float(v + 100.0) for v in q]]
    moved = spark.createDataFrame(
        [(3, far[0])], "vec_id long, embedding array<double>"
    )
    hnsw_append(spark, path, moved)

    res = hnsw_read_search(spark, path, q, k=10, ef=10**9).collect()
    by_id = {r["vec_id"]: r["score"] for r in res}
    # stale node (score 0) must not serve; key 3 either drops out of
    # the top-10 entirely or carries the far-away vector's distance
    assert by_id.get(3, float("inf")) > 1.0
    # searching near the NEW location finds key 3 first
    assert _ids(emb, hnsw_read_search(spark, path, far[0], k=1, ef=10**9)) == [3]

    # graph (beam) mode agrees: stale node masked inside the shard pool
    res_beam = hnsw_read_search(spark, path, q, k=10, ef=64).collect()
    assert {r["vec_id"]: r["score"] for r in res_beam}.get(
        3, float("inf")
    ) > 1.0


def test_hnsw_null_vector_put_does_not_resurrect(spark, tmp_path):
    """A put row with a NULL vector appends no node and must leave the
    key's tombstone in place."""
    from distributed_vector_database_spark.operators.hnsw import (
        _read_tombstones,
        hnsw_append,
        hnsw_delete,
        hnsw_write,
    )

    emb = _emb(spark, n=60)
    path = str(tmp_path / "hnsw")
    hnsw_write(emb, path, num_shards=2)
    hnsw_delete(path, [7, 9])
    batch = spark.createDataFrame(
        [(7, None), (11, [0.0] * 8)], "vec_id long, embedding array<double>"
    )
    hnsw_append(spark, path, batch)
    assert _read_tombstones(path) == frozenset({7, 9})


def test_hnsw_resurrection_is_append_only_and_reorderable(spark, tmp_path):
    """Resurrection appends an ordered `remove` record instead of
    rewriting the tombstone log, so unrelated tombstones survive any
    crash between operations, and a later re-delete wins over an
    earlier resurrection."""
    import json
    import os as _os

    from distributed_vector_database_spark.operators.hnsw import (
        _read_tombstones,
        hnsw_append,
        hnsw_delete,
        hnsw_write,
    )

    emb = _emb(spark, n=60)
    path = str(tmp_path / "hnsw")
    hnsw_write(emb, path, num_shards=2)
    hnsw_delete(path, [1, 2, 3])
    files_before = set(_os.listdir(f"{path}/_tombstones"))
    hnsw_append(spark, path, emb.filter(F.col("vec_id") == 2))
    files_after = set(_os.listdir(f"{path}/_tombstones"))
    # append-only: the delete record is untouched, one remove record
    # added (plus its permanent seq-claim sidecar)
    assert files_before <= files_after
    new = [
        f"{path}/_tombstones/{f}"
        for f in files_after - files_before
        if f.endswith(".json")
    ]
    assert len(new) == 1
    with open(new[0]) as fh:
        assert json.load(fh) == {"remove": [2]}
    assert _read_tombstones(path) == frozenset({1, 3})

    # re-delete after resurrection: the newer add record wins
    hnsw_delete(path, [2])
    assert _read_tombstones(path) == frozenset({1, 2, 3})


def test_hnsw_compact_reclaims_stale_duplicate_nodes(spark, tmp_path):
    """Compaction drops the stale node of a re-put key (only the
    newest node per key survives) and results are unchanged."""
    from distributed_vector_database_spark.operators.hnsw import (
        hnsw_append,
        hnsw_compact,
        hnsw_read_search,
        hnsw_write,
    )

    emb = _emb(spark, n=100)
    q = emb.filter(F.col("vec_id") == 5).first()["embedding"]
    path = str(tmp_path / "hnsw")
    hnsw_write(emb, path, num_shards=2)
    far = spark.createDataFrame(
        [(5, [float(v + 50.0) for v in q])],
        "vec_id long, embedding array<double>",
    )
    hnsw_append(spark, path, far)
    assert spark.read.parquet(path).filter(F.col("vec_id") == 5).count() == 2

    before = [tuple(r) for r in hnsw_read_search(spark, path, q, k=7, ef=10**9).collect()]
    removed = hnsw_compact(spark, path)
    assert removed == 1
    assert spark.read.parquet(path).filter(F.col("vec_id") == 5).count() == 1
    after = [tuple(r) for r in hnsw_read_search(spark, path, q, k=7, ef=10**9).collect()]
    assert after == before


def test_ivf_delete_preserves_null_keys(spark, tmp_path):
    """NOT IN is tri-valued: null-key rows in a rewritten cell must
    survive the delete (ADVICE r7)."""
    from distributed_vector_database_spark.operators.ann import (
        ivf_build,
        ivf_delete,
        ivf_write,
    )

    emb = _emb(spark, n=50)
    nulled = emb.withColumn(
        "vec_id",
        F.when(F.col("vec_id") < 5, F.lit(None)).otherwise(F.col("vec_id")),
    )
    path = str(tmp_path / "ivf_nullkey")
    _, assigned = ivf_build(nulled, n_centroids=2)
    ivf_write(assigned, path)
    before_nulls = (
        spark.read.parquet(path).filter(F.col("vec_id").isNull()).count()
    )
    assert before_nulls == 5

    removed = ivf_delete(spark, path, list(range(5, 50)))
    assert removed == 45
    after = spark.read.parquet(path)
    assert after.filter(F.col("vec_id").isNull()).count() == 5
    assert after.count() == 5


def test_ivf_delete_all_rows_leaves_readable_layout(spark, tmp_path):
    """Deleting every row must leave a schema-carrying layout so
    ivf_append / reads still work (ADVICE r7)."""
    from distributed_vector_database_spark.operators.ann import (
        ivf_append,
        ivf_build,
        ivf_delete,
        ivf_write,
    )

    emb = _emb(spark, n=30)
    path = str(tmp_path / "ivf_empty")
    centroids, assigned = ivf_build(emb, n_centroids=2)
    ivf_write(assigned, path)

    removed = ivf_delete(spark, path, list(range(30)))
    assert removed == 30
    # the read that used to fail schema inference
    after = spark.read.parquet(path)
    assert after.count() == 0
    assert "embedding" in after.columns and "centroid_id" in after.columns

    # append into the emptied layout resumes normal partitioned life
    batch = _emb(spark, n=10, seed=9)
    ivf_append(spark, path, batch, centroids)
    again = spark.read.parquet(path)
    assert again.count() == 10
    assert any(
        e.startswith("centroid_id=") for e in os.listdir(path)
    )


def test_ivf_transient_empty_preserves_layout_metadata(spark, tmp_path):
    """A layout that transiently empties must KEEP its restart path:
    _quantizer.json, _cell_stats.json and the _applied_batches replay
    markers survive the delete-everything marker write and the next
    ivf_append's flat-layout cleanup (r8 ADVICE medium — both used to
    wipe _-prefixed metadata from the root)."""
    from distributed_vector_database_spark.operators.ann import (
        ivf_append,
        ivf_build,
        ivf_cell_stats,
        ivf_delete,
        ivf_read_cell_stats,
        ivf_read_quantizer,
        ivf_read_search,
        ivf_write,
    )

    emb = _emb(spark, n=40)
    path = str(tmp_path / "ivf_meta")
    centroids, assigned = ivf_build(emb, n_centroids=2)
    ivf_write(assigned, path, centroids=centroids,
              cell_stats=ivf_cell_stats(assigned, centroids))

    # a replay marker from a prior fold batch
    ivf_append(spark, path, _emb(spark, n=5, seed=7), centroids,
               batch_id="seed-batch")

    removed = ivf_delete(spark, path, list(range(40)))
    assert removed == 40  # the seed-batch re-put overwrote ids 0-4

    # metadata intact after the transient empty
    assert ivf_read_quantizer(path)  # would raise FileNotFoundError
    assert ivf_read_cell_stats(path)
    assert os.path.exists(os.path.join(path, "_applied_batches/b=seed-batch"))

    # replay of the already-applied batch is still a no-op
    ivf_append(spark, path, _emb(spark, n=5, seed=7), centroids,
               batch_id="seed-batch")
    assert spark.read.parquet(path).count() == 0

    # append + serve from the layout alone (the restart path)
    ivf_append(spark, path, _emb(spark, n=10, seed=9), centroids)
    assert ivf_read_quantizer(path)  # cleanup must not have eaten it
    got = ivf_read_search(spark, path, [0.0] * 8, k=3, nprobe=2)
    assert got.count() == 3


def test_hnsw_layout_persists_build_seed(spark, tmp_path):
    """hnsw_compact / hnsw_append must reuse the persisted build seed,
    not their parameter default (ADVICE r7)."""
    from distributed_vector_database_spark.operators.hnsw import (
        hnsw_compact,
        hnsw_delete,
        hnsw_write,
    )

    emb = _emb(spark, n=120)
    path = str(tmp_path / "hnsw_seeded")
    hnsw_write(emb, path, num_shards=4, seed=7)
    nodes = spark.read.parquet(path)
    assert {r["seed"] for r in nodes.select("seed").distinct().collect()} == {7}

    hnsw_delete(path, [3, 4])
    # compact with the DEFAULT seed param — the persisted 7 must win
    hnsw_compact(spark, path)
    after = spark.read.parquet(path)
    assert {r["seed"] for r in after.select("seed").distinct().collect()} == {7}


def test_hnsw_compact_seeded_matches_fresh_build_same_seed(spark, tmp_path):
    """A seed!=42 layout compacted must serve identically to a fresh
    seed!=42 build over the survivors (graph family preserved)."""
    from distributed_vector_database_spark.operators.hnsw import (
        hnsw_compact,
        hnsw_delete,
        hnsw_read_search,
        hnsw_write,
    )

    emb = _emb(spark, n=150)
    q = emb.filter(F.col("vec_id") == 11).first()["embedding"]
    victims = [1, 2, 3]

    p1 = str(tmp_path / "compacted")
    hnsw_write(emb, p1, num_shards=4, seed=7)
    hnsw_delete(p1, victims)
    hnsw_compact(spark, p1)

    p2 = str(tmp_path / "fresh")
    hnsw_write(
        emb.filter(~F.col("vec_id").isin(victims)), p2, num_shards=4, seed=7
    )

    got = hnsw_read_search(spark, p1, q, k=8, ef=16).collect()
    want = hnsw_read_search(spark, p2, q, k=8, ef=16).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_tombstone_seq_claim_is_atomic(tmp_path):
    """Concurrent appenders must serialize: the O_EXCL claim protocol
    (r8 VERDICT #7 — contract enforced, not just documented) gives
    every record a DISTINCT seq even under a thread race, a
    pre-existing claim makes the appender skip that seq, and no
    .claim litter survives a completed append."""
    import re
    from concurrent.futures import ThreadPoolExecutor

    from distributed_vector_database_spark.operators.hnsw import (
        _append_tombstone_record,
        _read_tombstones,
    )

    path = str(tmp_path / "layout")
    os.makedirs(path)

    with ThreadPoolExecutor(max_workers=8) as ex:
        list(ex.map(
            lambda i: _append_tombstone_record(path, [i]), range(32)
        ))
    tdir = os.path.join(path, "_tombstones")
    names = [f for f in os.listdir(tdir) if f.endswith(".json")]
    seqs = [int(f.split("-")[1]) for f in names]
    assert len(names) == 32
    assert len(set(seqs)) == 32, "racing writers shared a seq"
    assert _read_tombstones(path) == frozenset(range(32))
    # claims are permanent: removing one would let a stale scanner
    # re-claim a seq that already has a record
    assert len([f for f in os.listdir(tdir) if f.endswith(".claim")]) == 32

    # a claimed-but-unwritten seq (crashed writer) is skipped, not reused
    top = max(seqs)
    open(os.path.join(tdir, f"s-{top + 1:08d}.claim"), "w").close()
    _append_tombstone_record(path, [99])
    newest = max(
        int(f.split("-")[1])
        for f in os.listdir(tdir)
        if f.endswith(".json") and re.match(r"t-\d{8}-", f)
    )
    assert newest == top + 2
    assert 99 in _read_tombstones(path)


def test_tombstone_tiebreak_is_deterministic():
    """At equal seq, add-records apply before remove-records regardless
    of uuid filename order (ADVICE r7)."""
    from distributed_vector_database_spark.operators.hnsw import (
        _tombstone_sort_key,
    )

    add = "t-00000003-a-ffffffffffff.json"
    rem = "t-00000003-r-000000000000.json"
    assert sorted([rem, add], key=_tombstone_sort_key) == [add, rem]
    # legacy names sort as adds at their seq
    legacy = "t-00000003-deadbeef0123.json"
    assert _tombstone_sort_key(legacy)[1] == 0
    assert _tombstone_sort_key("legacy.json")[0] == 0


def test_hnsw_filtered_serving_matches_filtered_brute_force(spark, tmp_path):
    """Predicate masks nodes inside the shard pool (graph intact);
    exhaustive ef reproduces filtered knn_exact; beam mode keeps full
    candidate depth via the widened fetch."""
    from distributed_vector_database_spark.operators.hnsw import (
        hnsw_read_search,
        hnsw_write,
    )
    from distributed_vector_database_spark.operators.knn import knn_exact

    emb = _emb(spark, n=200).withColumn(
        "label", (F.col("vec_id") % 4).cast("int")
    )
    q = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    path = str(tmp_path / "hnsw_filt")
    hnsw_write(emb, path, num_shards=4, extra_cols=("label",))

    got = hnsw_read_search(
        spark, path, q, k=7, ef=10**9, predicate=F.col("label") == 2
    ).collect()
    want = knn_exact(
        emb.filter(F.col("label") == 2), q, k=7, extra_cols=()
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]

    # beam mode: selective predicate, results still honest top-k
    beam = hnsw_read_search(
        spark, path, q, k=7, ef=32, predicate=F.col("label") == 2
    ).collect()
    got_ids = {r["vec_id"] for r in beam}
    assert len(beam) == 7
    assert all(i % 4 == 2 for i in got_ids)


def test_hnsw_append_carries_metadata_columns(spark, tmp_path):
    from distributed_vector_database_spark.operators.hnsw import (
        hnsw_append,
        hnsw_read_search,
        hnsw_write,
    )

    emb = _emb(spark, n=80).withColumn(
        "label", (F.col("vec_id") % 4).cast("int")
    )
    path = str(tmp_path / "hnsw_meta")
    hnsw_write(emb, path, num_shards=2, extra_cols=("label",))

    batch = _emb(spark, n=100, seed=8).filter(F.col("vec_id") >= 80).withColumn(
        "label", (F.col("vec_id") % 4).cast("int")
    )
    hnsw_append(spark, path, batch)
    nodes = spark.read.parquet(path)
    assert nodes.count() == 100
    assert nodes.filter(F.col("label").isNull()).count() == 0

    # appended rows are filterable immediately
    q = emb.filter(F.col("vec_id") == 1).first()["embedding"]
    res = hnsw_read_search(
        spark, path, q, k=5, ef=10**9, predicate=F.col("label") == 1
    ).collect()
    assert all(r["vec_id"] % 4 == 1 for r in res)

    # a batch missing the metadata column is rejected loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="lacks"):
        hnsw_append(spark, path, _emb(spark, n=5, seed=3))


def test_ivf_append_keeps_layout_vector_element_type(spark, tmp_path):
    """A float-element layout appended with double-element batch rows
    must not produce mixed parquet files (every later read fails with
    PARQUET_COLUMN_DATA_TYPE_MISMATCH)."""
    from distributed_vector_database_spark.operators.ann import (
        ivf_append,
        ivf_build,
        ivf_write,
    )

    emb = _emb(spark, n=40).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    path = str(tmp_path / "ivf_float")
    centroids, assigned = ivf_build(emb, n_centroids=2)
    ivf_write(assigned, path)

    batch = _emb(spark, n=50, seed=4).filter(F.col("vec_id") >= 40)
    assert dict(batch.dtypes)["embedding"] == "array<double>"
    ivf_append(spark, path, batch, centroids)
    after = spark.read.parquet(path)
    assert dict(after.dtypes)["embedding"] == "array<float>"
    assert after.count() == 50
