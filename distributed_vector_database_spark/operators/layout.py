"""Physical-layout optimization: clustered and Z-ordered parquet
writes for data skipping.

At 100 TB the cheapest predicate is the one that never reads a row
group: parquet footers carry per-column min/max, and Spark prunes row
groups (and whole files, via partition-level stats) when the data is
CLUSTERED so those ranges are narrow. `cluster_write` sorts by a
column prefix (perfect skipping on the leading column);
`zorder_write` interleaves the bits of two columns so range
predicates on EITHER column prune — the Delta/Iceberg OPTIMIZE
ZORDER shape, done here as pure Catalyst expressions (scale to
16-bit fixed-point from a one-pass min/max agg, then a 32-term
shift/or interleave — no UDFs, no sort beyond the final clustered
write).

The reference has no layout story at all (LevelDB holds pickled
blobs, src/datanode/handler.py); this is where a columnar engine
earns its scan speed."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16  # fixed-point resolution per dimension


def _scaled(col: Column, lo: Column, hi: Column) -> Column:
    """Map col into [0, 2^Z_BITS) fixed-point given global lo/hi."""
    span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
    unit = (col.cast("double") - lo) / span
    return F.least(
        F.floor(unit * ((1 << Z_BITS) - 1)).cast("long"),
        F.lit((1 << Z_BITS) - 1),
    )


def zorder_value(a: Column, b: Column) -> Column:
    """Interleave the bits of two Z_BITS fixed-point values: bit i of
    `a` lands at position 2i, bit i of `b` at 2i+1. Pure shift/and/or
    expression — codegen'd, O(Z_BITS) per row."""
    one = F.lit(1).cast("long")
    z = F.lit(0).cast("long")
    for i in range(Z_BITS):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(one), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(one), 2 * i + 1)
        )
    return z


def with_zorder_key(
    df: DataFrame, col_a: str, col_b: str, out_col: str = "__z"
) -> DataFrame:
    """Attach the Z-curve key for (col_a, col_b) as `out_col`: one
    min/max agg over both columns (a 1-row broadcast cross join, not
    a second scan per bound), 16-bit fixed-point scaling, then the
    pure-expression bit interleave. The reusable front half of
    zorder_write — also the hash-oracle surface for the layout
    family, since every step (floor arithmetic on doubles, shifts,
    ors) mirrors exactly in ANSI SQL."""
    bounds = df.agg(
        F.min(F.col(col_a).cast("double")).alias("__alo"),
        F.max(F.col(col_a).cast("double")).alias("__ahi"),
        F.min(F.col(col_b).cast("double")).alias("__blo"),
        F.max(F.col(col_b).cast("double")).alias("__bhi"),
    )
    z = zorder_value(
        _scaled(F.col(col_a), F.col("__alo"), F.col("__ahi")),
        _scaled(F.col(col_b), F.col("__blo"), F.col("__bhi")),
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(out_col, z)
        .drop("__alo", "__ahi", "__blo", "__bhi")
    )


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    partitions: int = 32,
) -> None:
    """Write df as parquet Z-ordered on (col_a, col_b): the
    with_zorder_key column, a range repartition + within-partition
    sort on the Z value, then a plain parquet write. Row-group
    min/max for BOTH columns come out narrow, so a selective
    predicate on either one prunes most of the file bytes — the
    scan-side win needs no query changes at all (parquet footer
    pruning is automatic)."""
    (
        with_zorder_key(df, col_a, col_b, "__z")
        .repartitionByRange(partitions, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def cluster_write(
    df: DataFrame, path: str, cols: list[str], partitions: int = 32
) -> None:
    """Linear clustering: range repartition + sort on a column prefix.
    Perfect skipping on cols[0]; use zorder_write when two columns
    must both prune."""
    (
        df.repartitionByRange(partitions, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def rowgroup_prune_fraction(path: str, column: str, lo, hi) -> float:
    """Fraction of parquet row groups a [lo, hi] range predicate on
    `column` can SKIP, read straight from the footers — the
    layout-quality audit (driver-side metadata only, no data read)."""
    import glob as _glob

    import pyarrow.parquet as pq

    total = skipped = 0
    for f in sorted(_glob.glob(f"{path}/*.parquet")):
        meta = pq.ParquetFile(f).metadata
        idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}[
            column
        ]
        for g in range(meta.num_row_groups):
            st = meta.row_group(g).column(idx).statistics
            total += 1
            if st is not None and (st.max < lo or st.min > hi):
                skipped += 1
    return skipped / total if total else 0.0


def bucketed_write(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist a table hash-BUCKETED (and bucket-sorted) on the join
    key — Spark's co-located-join layout. Two tables bucketed on the
    same key with the same bucket count join WITHOUT shuffling either
    side: the bucket file layout IS the exchange, paid once at write
    time and amortized over every subsequent join, the single biggest
    recurring-cost lever for a fact⋈fact join at 100 TB (a fresh
    lineitem⋈orders exchange at that scale moves both tables across
    the cluster per query; bucketed, it moves nothing).

    With `sort=True` rows are bucket-locally sorted by the key, so the
    sort-merge join also skips its per-task sort. Bucketing requires
    the session catalog (`saveAsTable`); `spark.sql.sources.
    bucketing.enabled` is on by default.

    Rewrites are self-healing: a managed-table LOCATION left behind by
    a previous process (the in-memory catalog forgets tables on exit,
    the warehouse dir does not) is removed before the write instead of
    failing LOCATION_ALREADY_EXISTS."""
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{wh}/{table.lower()}", ignore_errors=True)
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(int(n_buckets), key)
    )
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(
    spark,
    table_a: str,
    table_b: str,
    key_a: str,
    key_b: str | None = None,
):
    """Join two bucketed tables on their bucket keys. With matching
    bucket layouts Catalyst plans a SortMergeJoin with ZERO Exchange
    (pinned by tests/test_layout.py::test_bucketed_join_no_exchange) —
    the physical proof that the shuffle was pre-paid at write time."""
    a, b = spark.table(table_a), spark.table(table_b)
    cond = (
        a[key_a] == b[key_b if key_b is not None else key_a]
    )
    return a.join(b, cond)
