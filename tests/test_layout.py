"""Z-order / clustered layout: row-group pruning must actually work,
measured from the written parquet footers."""

import pytest
from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.layout import (
    cluster_write,
    rowgroup_prune_fraction,
    zorder_write,
)


@pytest.fixture(scope="module")
def grid(spark):
    # 100k rows over an uncorrelated 2-d grid: the adversarial case
    # for linear clustering (sorting by x leaves y unsorted)
    return spark.range(100_000).select(
        (F.col("id") % 317).cast("double").alias("x"),
        (F.pmod(F.col("id") * 7919, 311)).cast("double").alias("y"),
        F.col("id").alias("payload"),
    )


def test_zorder_prunes_on_both_columns(grid, tmp_path):
    p = str(tmp_path / "z")
    zorder_write(grid, p, "x", "y", partitions=64)
    fx = rowgroup_prune_fraction(p, "x", 10.0, 20.0)
    fy = rowgroup_prune_fraction(p, "y", 10.0, 20.0)
    # a ~3% range on either axis must skip most groups: a thin slice
    # through a 2-d z-curve intersects ~sqrt(P) of the P tiles
    assert fx > 0.7, fx
    assert fy > 0.7, fy


def test_linear_clustering_prunes_leading_column_only(grid, tmp_path):
    p = str(tmp_path / "c")
    cluster_write(grid, p, ["x", "y"], partitions=64)
    assert rowgroup_prune_fraction(p, "x", 10.0, 20.0) > 0.9
    # trailing column can't prune an uncorrelated grid
    assert rowgroup_prune_fraction(p, "y", 10.0, 20.0) < 0.2


def test_zorder_write_roundtrips_rows(grid, tmp_path, spark):
    p = str(tmp_path / "rt")
    zorder_write(grid, p, "x", "y", partitions=4)
    back = spark.read.parquet(p)
    assert back.count() == 100_000
    assert set(back.columns) == {"x", "y", "payload"}
    assert back.agg(F.sum("payload")).first()[0] == grid.agg(F.sum("payload")).first()[0]
