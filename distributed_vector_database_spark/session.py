"""SparkSession factory tuned for this engine.

Local testing runs on local[N]; the configs below are the ones that
matter identically on a 1000-executor cluster: AQE (runtime re-planning,
skew-join splitting, shuffle coalescing), Arrow (vectorized Python
interop for the few Pandas-UDF kernels), and a shuffle-partition count
sized to the environment (overridable per job; at 100 TB you would set
spark.sql.shuffle.partitions to ~2-3x total cores and rely on AQE
coalescing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "distributed-vector-database-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Env overrides: SPARK_GRAFT_CPUS (local core count),
    SPARK_GRAFT_SHUFFLE_PARTITIONS.
    """
    # Make this package importable in executor Python workers no matter
    # the driver's cwd: Pandas-UDF closures reference module functions by
    # name (cloudpickle serializes installed modules by reference), so
    # workers must be able to import us. Local mode inherits the driver
    # process env; on a cluster you'd ship a wheel via --py-files, and
    # executorEnv below covers it.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{existing}" if existing else pkg_root
        )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # fixture events.parquet stores TIMESTAMP(NANOS); read as long,
        # sources.fixtures converts to micros timestamp (matching DuckDB's
        # nanos->micros truncation)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # small dims (region/nation/...) should always broadcast
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        # orderBy().limit(N) plans TakeOrderedAndProject, whose per-task
        # top-K selector PREALLOCATES 2N slots — an anchor-sized pool
        # (rerank=10**6 → N=10^7) is ~160MB of pointer array per task
        # before any row materializes, which OOMed a gate JVM (r8).
        # Above this threshold Spark plans Sort + GlobalLimit instead,
        # which spills; real top-k (N ≤ 100k) keeps the fast path.
        .config("spark.sql.execution.topKSortFallbackThreshold", "100000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
