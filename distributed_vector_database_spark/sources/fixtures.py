"""Parquet sources for the fixture star schema + vector tables.

Replaces the reference's storage stack (LevelDB point store + HNSW
binary + WAL JSON-lines, src/datanode/handler.py:26-54) with columnar
Parquet scans: predicate pushdown and column pruning come free from the
DataSource V2 reader, so a point lookup (reference O3,
src/datanode/handler.py:411-428) is a pushed-down key filter instead of
a LevelDB get, and "never hydrate 512 floats when only keys are needed"
(the reference always does, src/datanode/handler.py:399) is automatic
column pruning.

At 100 TB the only change is the path (and partitioned layout /
bucketing by key for point-read-heavy workloads); the plan shape is
identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from distributed_vector_database_spark.config import FIXTURE_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. `name` must be a known table.

    `events.ts` is TIMESTAMP(NANOS) in the parquet footer, which Spark
    reads only as long (spark.sql.legacy.parquet.nanosAsLong); convert to
    a micros timestamp here, truncating exactly like DuckDB's
    nanos→micros cast so oracle comparisons stay bit-identical."""
    if name not in FIXTURE_TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {FIXTURE_TABLES}")
    if name == "events":
        # runtime-settable SQL conf; without it a vanilla session throws
        # PARQUET_TYPE_ILLEGAL on the fixture's TIMESTAMP(NANOS) column
        # before the nanos→micros branch below can run.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    from pyspark.sql import functions as F

    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) footer read as long via nanosAsLong.
        # integer `div`, NOT double `/`: epoch nanos (~1.7e18) exceed a
        # double's exact-integer range, so floor(ts/1000.0) is ±1µs off
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # The driver's fixture encoding drifts between rounds: plain
    # timestamp[us] footers (no timezone) infer TIMESTAMP_NTZ under
    # spark.sql.parquet.inferTimestampNTZ (default true), which
    # TIMESTAMP-only builtins (unix_millis/unix_micros/...) reject at
    # analysis time — the r4 contract breakage. Session tz is UTC
    # (session.py) and DuckDB reads the same naive micros as-UTC, so the
    # cast is value-identical and oracle hashes keep matching. Applied to
    # every NTZ column of every table (o_orderdate/l_shipdate drift too).
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read the full fixture catalog as a dict of DataFrames."""
    return {name: load_table(spark, sf_dir, name) for name in FIXTURE_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
