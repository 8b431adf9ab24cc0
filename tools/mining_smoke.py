"""Scale smokes for the round-10 second batch (mining / graph /
bloom / merge / edit-distance), JVM-synthesized inputs (pattern:
tools/r10ops_smoke.py):

- frequent_pairs: 5M (basket, item) rows — 500k baskets x ~10 items
  over a 10k-item catalog with a hot head; the apriori prune + basket
  cap must keep the pair self-join bounded
- pagerank: 5 iterations over the graph derived from 2M basket rows —
  one shuffle per iteration against the cached adjacency
- skyline: 5M uncorrelated 2-d points — the local-front kernel must
  reduce each partition to a tiny candidate set (logarithmic under
  independence) before the quadratic dominance join
- event_transitions: 10M events, 100k users, 8 types — output is
  |types|^2 regardless of volume
- bloom_semi_join: 20M fact rows vs a 10k-key dim — report the bloom
  pruned fraction and verify exactness vs the plain semi join
- merge_into: 5M-row target, 250k-row source with all four arms
- edit_distance_dedup: 1M short docs, planted near-dup pairs — the
  two-bucket band join must find every plant without an all-pairs blow-up

Usage: python tools/mining_smoke.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from distributed_vector_database_spark.session import get_spark


def timed(label, fn):
    t0 = time.time()
    out = fn()
    print(f"{label}: {time.time() - t0:.1f}s {out}")


def main() -> None:
    spark = get_spark(app_name="dvds-mining-smoke")

    from distributed_vector_database_spark.operators.mining import (
        event_transitions,
        frequent_pairs,
        skyline,
    )

    # --- frequent_pairs: 5M basket-item rows, zipf-ish item head
    bi = spark.range(5_000_000).select(
        (F.col("id") % 500_000).alias("basket"),
        F.when(F.pmod(F.col("id"), 7) == 0, F.pmod(F.col("id"), 50))
        .otherwise(F.pmod(F.xxhash64("id"), 10_000))
        .alias("item"),
    )
    bi.cache().count()
    timed(
        "frequent_pairs 5M rows/500k baskets",
        lambda: frequent_pairs(
            bi, "basket", "item", min_support=50, max_basket=64, top_n=20
        ).count(),
    )

    # --- pagerank over the graph derived from 2M basket rows
    from distributed_vector_database_spark.operators.graph import (
        cooccurrence_edges,
        pagerank,
    )

    bi2 = bi.limit(2_000_000)
    edges = cooccurrence_edges(bi2, "basket", "item", min_support=20)
    ecnt = edges.cache().count()
    timed(
        f"pagerank 5 iters over {ecnt} edges",
        lambda: pagerank(edges, iterations=5).count(),
    )
    edges.unpersist()
    bi.unpersist()

    # --- skyline: 5M uncorrelated 2-d points
    pts = spark.range(5_000_000).select(
        F.col("id"),
        (F.pmod(F.xxhash64("id", F.lit(1)), 1_000_000)).alias("x"),
        (F.pmod(F.xxhash64("id", F.lit(2)), 1_000_000)).alias("y"),
    )
    timed("skyline 5M pts", lambda: skyline(pts, ["x", "y"], "id").count())

    # --- event_transitions: 10M events, 100k users, 8 types
    ev = spark.range(10_000_000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 100_000).alias("user_id"),
        F.concat(F.lit("t"), F.pmod(F.xxhash64("id"), 8)).alias("event_type"),
        F.timestamp_seconds(F.col("id") / 100).alias("ts"),
    )
    timed("event_transitions 10M events", lambda: event_transitions(ev).count())

    # --- bloom_semi_join: 20M fact vs 10k dim — pruned fraction + exactness
    from distributed_vector_database_spark.operators.bloom import (
        bloom_might_contain,
        bloom_bitset,
        bloom_semi_join,
    )

    fact = spark.range(20_000_000).select(
        F.pmod(F.xxhash64("id"), 2_000_000).alias("fk"), F.col("id").alias("v")
    )
    dim = spark.range(10_000).select(
        F.pmod(F.xxhash64("id", F.lit(9)), 2_000_000).alias("dk")
    )
    dim.cache().count()

    def _bloom():
        out = bloom_semi_join(fact, dim, "fk", "dk").count()
        words = bloom_bitset(dim, "dk")
        kept = fact.filter(bloom_might_contain(F.col("fk"), words)).count()
        exact = fact.join(
            dim.withColumnRenamed("dk", "fk"), "fk", "left_semi"
        ).count()
        assert out == exact, (out, exact)
        return f"confirmed={out} bloom_kept={kept} pruned={1 - kept / 20_000_000:.3f}"

    timed("bloom_semi_join 20M fact x 10k dim", _bloom)

    # --- merge_into: 5M target, 250k source, all four arms
    from distributed_vector_database_spark.operators.changelog import merge_into

    target = spark.range(5_000_000).select(
        F.col("id").alias("k"), (F.col("id") % 1000).cast("double").alias("bal")
    )
    source = spark.range(250_000).select(
        (F.col("id") * 25).alias("k"),  # 200k matched + 50k >= 5M (inserts)
        F.lit(1.5).alias("delta"),
        (F.pmod(F.col("id"), 10) == 0).alias("is_del"),
    )
    timed(
        "merge_into 5M target x 250k source",
        lambda: merge_into(
            target,
            source,
            "k",
            when_matched_update={"bal": F.col("t.bal") + F.col("s.delta")},
            when_matched_delete=F.col("s.is_del"),
            when_not_matched_insert={"bal": F.col("s.delta")},
        ).count(),
    )

    # --- edit_distance_dedup: 1M short docs with 1k planted near-dups
    from distributed_vector_database_spark.operators.dedup import (
        edit_distance_dedup,
    )

    # md5 bodies (two distinct hashes differ in ~30 of 32 hex chars, so
    # the ONLY pairs within max_dist are the plants: base id's md5 +X).
    # Blocking regime matches the operator's intended use: a
    # high-cardinality source (web domains) and varied lengths — 10k
    # sources x ~3 length bands keeps every block ~30 docs; a
    # uniform-length single-source corpus would degrade to in-block
    # all-pairs, which is inherent to blocked edit-distance and
    # documented in the operator docstring.
    def _doc(ids, key):
        return ids.select(
            F.col("doc_id"),
            F.concat(
                F.lit("doc "),
                F.md5(key.cast("string")),
                F.repeat(F.lit("x"), F.pmod(key, 64).cast("int")),
            ).alias("text"),
            F.lit("en").alias("lang"),
            F.pmod(key, 10_000).cast("string").alias("source"),
        )

    base = _doc(
        spark.range(1_000_000).select(F.col("id").alias("doc_id"), "id"),
        F.col("id"),
    )
    plants = _doc(
        spark.range(1_000).select(
            (F.col("id") + 2_000_000).alias("doc_id"), (F.col("id") * 1000).alias("id")
        ),
        F.col("id"),
    ).withColumn("text", F.concat(F.col("text"), F.lit("X")))
    docs = base.unionByName(plants).withColumn("n_chars", F.length("text"))

    def _edits():
        found = edit_distance_dedup(docs, band_width=32, max_dist=2).count()
        assert found == 1_000, found
        return f"pairs={found} (== plants)"

    timed("edit_distance_dedup 1M docs + 1k plants", _edits)

    spark.stop()


if __name__ == "__main__":
    main()
