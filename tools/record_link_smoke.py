"""Cross-catalog record linkage at scale: two 250k-doc catalogs where
every 10th left record has an exact twin on the right (250k + 25k
planted cross-matches among 250k right-side records), linked with
MinHash-LSH blocking + exact-Jaccard verification + best-match-per-left.

What this prices at 100 TB: each catalog shuffles once into signatures
(one 16-long row per record), the band join is equi-keyed, and the
verify touches only blocked candidates — the catalogs never cross-join
(250k x 250k = 62.5B pairs brute force; the blocked candidate count is
printed).

Usage: python tools/record_link_smoke.py [n_left] [twin_every]
       python tools/record_link_smoke.py --incremental [n_right] [n_batch]

The --incremental mode prices continual ingest against a BIG signed
right catalog: the right side is minhash-signed ONCE (persisted
signatures), then a new-left batch links via record_link_incremental —
batch cost is O(batch shingles + band collisions + candidate
hydrations), never a right-catalog re-shingle. A full record_link
recompute over (batch, right) is timed alongside for the comparison.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.dedup import record_link
from distributed_vector_database_spark.session import get_spark
from scale_smoke import synth_docs


def incremental() -> None:
    n_right = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    n_batch = int(sys.argv[3]) if len(sys.argv) > 3 else 50_000
    twin_every = 10
    spark = get_spark(app_name="dvds-record-link-inc-smoke")

    from distributed_vector_database_spark.operators.dedup import (
        minhash_signatures,
        record_link_incremental,
    )

    right = synth_docs(spark, n_right).localCheckpoint()
    # one-time signing cost (amortized across every future batch)
    t0 = time.time()
    right_sigs = minhash_signatures(right, 16, "doc_id", "text", 3)
    right_sigs = right_sigs.localCheckpoint()
    t_sign = time.time() - t0

    # new-left batch: fresh docs, except every twin_every-th reuses a
    # right text — the planted twin of batch id a sits at right id
    # b = a - 5_000_000 (twins offset right ids by +5M)
    fresh = synth_docs(spark, n_batch, start=2_000_000 + n_right)
    twins = (
        right.filter(F.col("doc_id") % twin_every == 0)
        .limit(n_batch // twin_every)
        .select((F.col("doc_id") + 5_000_000).alias("doc_id"), "text")
    )
    batch = fresh.unionByName(twins).localCheckpoint()
    planted = n_batch // twin_every

    t0 = time.time()
    links = record_link_incremental(
        batch, right_sigs, right, threshold=0.8
    ).localCheckpoint()
    t_inc = time.time() - t0
    n_links = links.count()
    hits = links.filter(
        (F.col("id_a") >= 5_000_000)
        & (F.col("id_b") == F.col("id_a") - 5_000_000)
        & (F.col("jaccard") == 1.0)
    ).count()

    # the recompute this replaces: full record_link re-shingles the
    # whole right catalog for every batch
    t0 = time.time()
    full = record_link(batch, right, threshold=0.8)
    n_full = full.count()
    t_full = time.time() - t0

    print(
        f"n_right={n_right} n_batch={batch.count()} planted={planted} "
        f"sign_once {t_sign:.1f}s; incremental {t_inc:.1f}s "
        f"links={n_links} planted_recall={hits / planted:.4f}; "
        f"full-recompute {t_full:.1f}s links={n_full} "
        f"speedup {t_full / t_inc:.1f}x"
    )
    spark.stop()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    twin_every = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app_name="dvds-record-link-smoke")

    left = synth_docs(spark, n).localCheckpoint()
    # right catalog: fresh docs (ids n..2n), except every twin_every-th
    # right record reuses a left text (the planted true match)
    fresh = synth_docs(spark, n, start=n)
    twins = (
        left.filter(F.col("doc_id") % twin_every == 0)
        .select((F.col("doc_id") + 2 * n).alias("doc_id"), "text")
    )
    right = fresh.unionByName(twins).localCheckpoint()

    t0 = time.time()
    links = record_link(left, right, threshold=0.8).localCheckpoint()
    wall = time.time() - t0
    n_links = links.count()
    planted = left.filter(F.col("doc_id") % twin_every == 0).count()
    # a planted twin of left id d sits at right id d + 2n with jaccard 1.0
    hits = links.filter(
        (F.col("id_b") == F.col("id_a") + 2 * n) & (F.col("jaccard") == 1.0)
    ).count()
    print(
        f"n_left={n} n_right={right.count()} planted={planted} "
        f"link {wall:.1f}s; links={n_links} planted_recall={hits / planted:.4f}"
    )
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--incremental":
        incremental()
    else:
        main()
