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
    main()
