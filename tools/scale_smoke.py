"""Scale smoke: run the core operators at 100-1000x the fixture scale
on synthetic expression-generated data (no files written, no Python in
the data-gen path) and print per-op wall times.

This is the "would the plan survive a scale-up" probe behind
SCALE.md: 1M x 64-d vectors for k-NN, 500k synthetic docs for the
sketch dedups, 10M change-log rows for compaction. All data is
generated JVM-side from spark.range, so the numbers measure the
operator plans, not ingestion.

Usage: python tools/scale_smoke.py [small|big]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.changelog import compact
from distributed_vector_database_spark.operators.dedup import (
    minhash_lsh_pairs,
    simhash_pairs,
)
from distributed_vector_database_spark.operators.knn import knn_exact, knn_join
from distributed_vector_database_spark.session import get_spark

SIZES = {
    "small": dict(n_vec=200_000, n_doc=100_000, n_log=2_000_000),
    "big": dict(n_vec=1_000_000, n_doc=500_000, n_log=10_000_000),
}


def synth_embeddings(spark, n, dim=64):
    # deterministic pseudo-random floats from sin(id*k) — pure codegen
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[F.sin(F.col("id") * (i + 1) * 0.7071) for i in range(dim)]
        ).alias("embedding"),
    )


def synth_gaussian_embeddings(spark, n, dim=64, twin_every=10, jitter=0.02):
    """Gaussian corpus with planted near-duplicates, generated JVM-side:
    n base vectors (hash-derived Box-Muller normals — deterministic, no
    RNG state) plus n/twin_every jittered twins at cosine ≈ 0.9998.

    The sin-based generator above is unusable for near-dup smokes: sin
    aliasing gives it ~0.4% pair density at cosine 0.9 — 2e9 TRUE pairs
    at 1M rows — so any correct operator's output is quadratic. Gaussian
    base vectors have effectively zero random-pair density at 0.9; the
    twins are the ground truth."""

    def z(x_col, salt):
        # Box-Muller from two xxhash64-derived uniforms in (0, 1)
        u1 = (F.pmod(F.xxhash64(x_col, F.lit(2 * salt)), 1_000_000) + 0.5) / 1_000_000.0
        u2 = (F.pmod(F.xxhash64(x_col, F.lit(2 * salt + 1)), 1_000_000) + 0.5) / 1_000_000.0
        import math

        return F.sqrt(-2.0 * F.log(u1)) * F.cos(2.0 * math.pi * u2)

    n_twins = n // twin_every
    base_id = F.when(F.col("id") < n, F.col("id")).otherwise(
        (F.col("id") - n) * twin_every
    )
    noise = F.when(F.col("id") < n, F.lit(0.0)).otherwise(F.lit(float(jitter)))
    return spark.range(n + n_twins).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                z(base_id, i) + noise * z(F.col("id") + 1_000_000_007, dim + i)
                for i in range(dim)
            ]
        ).alias("embedding"),
    )


def synth_docs(spark, n, vocab_size=1000, doc_len=40, start=0):
    # ~40-token docs over a 1000-word vocabulary, chosen by a 64-bit hash
    # mix of (doc_id, position) so texts are effectively unique (a linear
    # id*a+pos*b mod v formula collapses to v distinct docs and explodes
    # every pair-join — found the hard way)
    words = [f"tok{i}" for i in range(vocab_size)]
    vocab = F.array(*[F.lit(w) for w in words])
    return spark.range(start, start + n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(doc_len)),
                lambda i: F.element_at(
                    vocab,
                    (
                        F.pmod(F.xxhash64(F.col("id"), i), vocab_size) + 1
                    ).cast("int"),
                ),
            ),
        ).alias("text"),
    )


def synth_docs_with_twins(spark, n, twin_every=10, **kw):
    """synth_docs plus n/twin_every exact-duplicate twins (ids >= n reuse
    the text of base id (id-n)*twin_every) — ground truth for the sketch
    dedups: every twin is a true near-dup pair at Hamming 0."""
    base = synth_docs(spark, n, **kw)
    twins = (
        spark.range(n, n + n // twin_every)
        .select(
            F.col("id").alias("twin_id"),
            ((F.col("id") - n) * twin_every).alias("doc_id"),
        )
        .join(base, "doc_id")
        .select(F.col("twin_id").alias("doc_id"), "text")
    )
    return base.unionByName(twins)


def synth_log(spark, n, n_keys=1_000_000):
    return spark.range(n).select(
        F.when(F.pmod("id", 10) == 0, "DELETE").otherwise("PUT").alias("op"),
        F.pmod(F.col("id") * 2654435761, n_keys).cast("string").alias("key"),
        (F.col("id") % 1000).cast("double").alias("value"),
        F.col("id").alias("ts"),
        F.col("id").alias("seq"),
    )


def main():
    size = SIZES[sys.argv[1] if len(sys.argv) > 1 else "big"]
    spark = get_spark(app_name="dvds-scale-smoke")
    out = {}

    # warm each operator's codegen path at toy scale first: the sketch
    # aggregates carry a one-time ~40-50s whole-stage-codegen compile
    # cost that is per-JVM, not per-row — measuring it as "minhash time"
    # would misattribute it (the bench harness warms the same way)
    wdocs = synth_docs(spark, 1_000)
    wemb = synth_embeddings(spark, 1_000)
    minhash_lsh_pairs(wdocs).count()
    simhash_pairs(wdocs, max_hamming=0).count()
    knn_exact(wemb, [0.1] * 64, k=5, extra_cols=()).collect()

    emb = synth_embeddings(spark, size["n_vec"]).cache()
    emb.count()
    q = [0.5] * 64

    t0 = time.time()
    knn_exact(emb, q, k=10, extra_cols=()).collect()
    out[f"knn_exact_{size['n_vec']}"] = time.time() - t0

    t0 = time.time()
    queries = emb.filter("vec_id < 8").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    knn_join(queries, emb, k=5).collect()
    out[f"knn_join_8q_{size['n_vec']}"] = time.time() - t0

    # clustered embedding near-dup: the 100 TB path (coarse k-means →
    # within-cluster exact GEMM); exact all-pairs at 1M would be 10^12
    # cosines, the composed operator verifies only co-clustered pairs.
    # Run on a gaussian corpus with planted twins — ground truth =
    # n_vec/10 pairs, so the count doubles as a recall check.
    from distributed_vector_database_spark.operators.dedup import (
        embedding_near_dup_at_scale,
    )

    gemb = synth_gaussian_embeddings(spark, size["n_vec"]).cache()
    gemb.count()
    t0 = time.time()
    n = embedding_near_dup_at_scale(gemb, threshold=0.9).count()
    out[f"embedding_near_dup_scale_{size['n_vec']}"] = time.time() - t0
    print(
        f"# near-dup confirmed pairs @0.9: {n} (planted {size['n_vec'] // 10})",
        file=sys.stderr,
    )
    gemb.unpersist()

    docs = synth_docs(spark, size["n_doc"]).cache()
    docs.count()
    t0 = time.time()
    n = minhash_lsh_pairs(docs).count()
    out[f"minhash_lsh_{size['n_doc']}"] = time.time() - t0
    print(f"# minhash candidate pairs: {n}", file=sys.stderr)

    t0 = time.time()
    n = simhash_pairs(docs, max_hamming=0).count()
    out[f"simhash_{size['n_doc']}"] = time.time() - t0
    print(f"# simhash pairs hd=0: {n}", file=sys.stderr)

    # simhash at 1M+ docs with planted twins: the 60-bit sketch's 15-bit
    # pigeonhole blocks keep block-join candidates ~O(true dups) — the
    # old 32-bit/8-bit-block sketch floor-collided at ~n^2/128 pairs
    # (7.8e9 candidates at 1M, intractable), so finishing here at all IS
    # the sub-quadratic evidence; the planted count is the recall check.
    n_sim = 1_000_000 if size["n_doc"] >= 500_000 else 100_000
    tdocs = synth_docs_with_twins(spark, n_sim).cache()
    tdocs.count()
    t0 = time.time()
    n = simhash_pairs(tdocs, max_hamming=3, bucket_cap=64).count()
    out[f"simhash_twins_{n_sim}"] = time.time() - t0
    print(
        f"# simhash hd<=3 pairs at {n_sim}: {n} (planted {n_sim // 10})",
        file=sys.stderr,
    )
    tdocs.unpersist()

    log = synth_log(spark, size["n_log"])
    t0 = time.time()
    n = compact(log, seq_col="seq").count()
    out[f"changelog_compact_{size['n_log']}"] = time.time() - t0
    print(f"# compacted keys: {n}", file=sys.stderr)

    # as-of join: every PUT joined to the user's latest prior DELETE
    from distributed_vector_database_spark.operators.asof import asof_join

    ev = log.select(
        F.col("key").alias("user_id"),
        F.col("ts"),
        F.col("op"),
        F.col("seq").alias("event_id"),
    )
    left = ev.filter(F.col("op") == "PUT").drop("op")
    right = (
        ev.filter(F.col("op") == "DELETE")
        .drop("op")
        .withColumnRenamed("event_id", "del_id")
    )
    t0 = time.time()
    n = asof_join(left, right, on="ts", by="user_id").count()
    out[f"asof_join_{size['n_log']}"] = time.time() - t0
    print(f"# asof rows: {n}", file=sys.stderr)

    # the full composed pipeline on the synthetic corpus
    from distributed_vector_database_spark.operators.pipeline import training_pipeline

    pdocs = docs.withColumn("lang", (F.col("doc_id") % 5).cast("string"))
    t0 = time.time()
    n = training_pipeline(pdocs).count()
    out[f"training_pipeline_{size['n_doc']}"] = time.time() - t0
    print(f"# pipeline survivors: {n}", file=sys.stderr)

    for k, v in out.items():
        print(f"{k}: {v:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
