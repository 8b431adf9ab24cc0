"""Salted join under extreme key skew: 10M-row fact with ONE key
holding 30% of rows, joined to a 10k-row dim that is forced off the
broadcast path (the regime salted_join exists for). Measured three
ways so the numbers say when salting is and is NOT worth it:

  1. plain SMJ, AQE skew-join OFF  — the melted-task baseline
  2. plain SMJ, AQE skew-join ON   — what Spark already fixes
  3. salted_join (16 salts), AQE skew OFF — the manual fallback

Usage: python tools/skew_smoke.py [n_fact] [n_dim] [hot_share]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.skew import salted_join
from distributed_vector_database_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_dim = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    hot = float(sys.argv[3]) if len(sys.argv) > 3 else 0.3
    spark = get_spark(app_name="dvds-skew-smoke")

    fact = spark.range(n).select(
        F.when(F.col("id") < int(n * hot), F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_dim)))
        .alias("k"),
        (F.col("id") % 97).alias("payload"),
    ).localCheckpoint()
    dim = spark.range(n_dim).select(
        F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("attr")
    ).localCheckpoint()

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def timed(label, fn):
        t0 = time.time()
        cnt = fn()
        print(f"{label}: {time.time() - t0:.1f}s ({cnt} rows)")

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    timed("plain SMJ, AQE-skew OFF",
          lambda: fact.join(dim, "k").agg(F.sum("payload")).collect() and fact.join(dim, "k").count())
    timed("salted_join(16), AQE-skew OFF",
          lambda: salted_join(fact, dim, "k", n_salts=16).count())
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    timed("plain SMJ, AQE-skew ON",
          lambda: fact.join(dim, "k").count())
    spark.stop()


if __name__ == "__main__":
    main()
