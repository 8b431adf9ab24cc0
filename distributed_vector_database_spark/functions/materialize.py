"""Lineage truncation for iterative per-round state, with a
durability switch.

Iterative operators (pagerank, k-core, label propagation, the dedup
connected-component loop) re-read their previous round's state several
times per round; left lazy, the plan doubles or triples per round, so
each round's state must be materialized. Two modes:

- localCheckpoint(eager=True) — executor-local, GC-managed blocks.
  The right trade on a single JVM and for short-lived state: no
  CacheManager pin, released when unreachable. BUT lineage is
  truncated, so a lost executor makes its blocks unrecoverable
  mid-job.
- checkpoint(eager=True) — durable files under the checkpoint dir,
  recomputable after executor loss. The right trade on clusters where
  executors come and go (dynamic allocation, spot instances).

`reliable=None` auto-selects durable when
spark.dynamicAllocation.enabled is set — the configuration under
which executor loss is routine, not exceptional. Production clusters
should setCheckpointDir to shared storage (HDFS/object store) first;
if unset, a driver-local temp dir is installed as a fallback so local
runs work out of the box (survives executor restarts, not driver
loss).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize(df: DataFrame, reliable: bool | None = None) -> DataFrame:
    spark = df.sparkSession
    if reliable is None:
        reliable = (
            spark.conf.get("spark.dynamicAllocation.enabled", "false")
            == "true"
        )
    if not reliable:
        return df.localCheckpoint(eager=True)
    sc = spark.sparkContext
    if sc.getCheckpointDir() is None:
        import tempfile

        sc.setCheckpointDir(tempfile.mkdtemp(prefix="dvdb_ckpt_"))
    return df.checkpoint(eager=True)
