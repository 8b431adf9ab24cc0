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

    # --- frequent_pairs: 5M basket-item rows over 500k baskets. Rows
    # 10b..10b+9 form basket b; slots 0-2 carry the basket's THEME
    # triple (3 items shared by the ~500 baskets with the same
    # basket%1000), the rest are hash background — so the planted
    # signal is 1000 themes x 3 pairwise-frequent item pairs on top of
    # a 100k-item long tail the apriori prune must discard.
    basket = (F.col("id") / 10).cast("long")
    slot = F.pmod(F.col("id"), 10)
    theme = F.pmod(basket, 1_000)
    bi = spark.range(5_000_000).select(
        basket.alias("basket"),
        F.when(slot < 3, theme * 3 + slot)
        .otherwise(F.pmod(F.xxhash64("id"), 100_000) + 1_000_000)
        .alias("item"),
    )
    bi.cache().count()

    def _pairs():
        got = frequent_pairs(
            bi, "basket", "item", min_support=100, max_basket=64, top_n=5000
        ).count()
        assert got == 3_000, got  # 3 pairs per theme
        return f"pairs={got} (== 3 per theme)"

    timed("frequent_pairs 5M rows/500k baskets", _pairs)

    # --- pagerank over the derived theme graph (1000 disjoint
    # triangles — 2-regular, so ranks must stay uniform)
    from distributed_vector_database_spark.operators.graph import (
        cooccurrence_edges,
        pagerank,
    )

    edges = cooccurrence_edges(bi, "basket", "item", min_support=100)
    ecnt = edges.cache().count()

    def _pr():
        rows = pagerank(edges, iterations=5).collect()
        assert len(rows) == 3_000
        assert all(abs(r.rank_rel - 1.0) < 1e-6 for r in rows)
        return f"nodes={len(rows)} uniform"

    timed(f"pagerank 5 iters over {ecnt} edges", _pr)

    # --- triangle_count over the same graph: exactly the 1000 themes
    from distributed_vector_database_spark.operators.graph import (
        triangle_count,
    )

    def _tri():
        row = triangle_count(edges).collect()[0]
        assert row.triangles == 1_000, row
        return f"nodes={row.nodes} edges={row.edges} triangles={row.triangles}"

    timed("triangle_count on theme graph", _tri)
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
