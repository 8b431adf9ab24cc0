"""Deterministic sampling / splitting — training-data-pipeline staples
(SURVEY §2.3 adjacent): content-stable holdout splits and stratified
samples that reproduce bit-identically across engines and runs.

Randomness comes from the md5-derived hash32 of the key (not
rand()/TABLESAMPLE), so membership is a pure function of the key:
re-running at 100 TB, on a different cluster, or in the DuckDB oracle
yields the same split — the property a train/test split must have.
Both operators are single-scan, shuffle-free (the stratified one pays
one window shuffle on the stratum key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from distributed_vector_database_spark.functions.hashing import hash32


def hash_sample(
    df: DataFrame, key_col: str, rate_pct: int, partition_count: int = 100
) -> DataFrame:
    """Keep rows whose hash32(key) % partition_count < rate_pct — a
    deterministic ~rate_pct% sample keyed on content identity."""
    return df.filter(hash32(key_col) % partition_count < rate_pct)


def train_test_split(
    df: DataFrame, key_col: str, test_pct: int = 10
) -> tuple[DataFrame, DataFrame]:
    """Deterministic (train, test) split by key hash; disjoint and
    exhaustive by construction."""
    bucket = hash32(key_col) % 100
    return df.filter(bucket >= test_pct), df.filter(bucket < test_pct)


def stratified_sample(
    df: DataFrame, stratum_col: str, key_col: str, n_per_stratum: int
) -> DataFrame:
    """At most n rows per stratum, chosen by hash order (deterministic,
    unbiased w.r.t. any column correlated with the key): row_number over
    (stratum, hash32(key)) ≤ n."""
    w = Window.partitionBy(stratum_col).orderBy(hash32(key_col), key_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def mixture_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    rates_pct: dict[str, int],
    default_pct: int = 0,
    partition_count: int = 100,
) -> DataFrame:
    """Per-stratum deterministic sampling — the pretraining data-MIXING
    primitive: up/down-weight sources or languages by giving each
    stratum its own keep rate (e.g. {"en": 80, "de": 40}, rest
    `default_pct`). Same content-stable hash membership as hash_sample,
    so the mixture reproduces bit-identically at any scale and in the
    SQL oracle; a single shuffle-free scan (the rate lookup is a CASE
    expression, not a join)."""
    for s, r in rates_pct.items():
        if not 0 <= r <= partition_count:
            raise ValueError(f"rate for {s!r} must be in [0, {partition_count}]")
    rate = F.lit(int(default_pct))
    for s, r in rates_pct.items():
        rate = F.when(F.col(stratum_col) == s, F.lit(int(r))).otherwise(rate)
    return df.filter(hash32(key_col) % partition_count < rate)
