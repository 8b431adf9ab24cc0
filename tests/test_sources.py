"""Source/sink breadth (SURVEY §2.2 Scans): the reference has only
LevelDB/WAL/JSON-file storage; the engine reads/writes parquet, json,
csv, binaryFile, with partition pruning on partitioned layouts."""

from pyspark.sql import functions as F

from distributed_vector_database_spark.plans.explain import formatted_plan


def test_json_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id long, name string, v double"
    )
    path = str(tmp_path / "j")
    df.write.mode("overwrite").json(path)
    back = spark.read.schema("id long, name string, v double").json(path)
    assert {tuple(r) for r in back.collect()} == {(1, "a", 1.5), (2, "b", 2.5)}


def test_csv_roundtrip_with_header(spark, tmp_path):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, name string")
    path = str(tmp_path / "c")
    df.write.mode("overwrite").option("header", True).csv(path)
    back = (
        spark.read.option("header", True)
        .schema("id long, name string")
        .csv(path)
    )
    assert {tuple(r) for r in back.collect()} == {(1, "x"), (2, "y")}


def test_orc_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, [1.0, 2.0]), (2, [3.0, 4.0])], "id long, vec array<double>")
    path = str(tmp_path / "o")
    df.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert {(r["id"], tuple(r["vec"])) for r in back.collect()} == {
        (1, (1.0, 2.0)),
        (2, (3.0, 4.0)),
    }


def test_partitioned_parquet_prunes(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, i % 4, float(i)) for i in range(100)], "id long, shard int, v double"
    )
    path = str(tmp_path / "p")
    df.write.mode("overwrite").partitionBy("shard").parquet(path)
    back = spark.read.parquet(path).filter(F.col("shard") == 2)
    assert back.count() == 25
    # partition pruning: only the shard=2 directory is scanned
    plan = formatted_plan(back)
    assert "PartitionFilters" in plan and "shard" in plan


def test_parquet_write_sorted_within_partitions(spark, tmp_path):
    # the compacted-snapshot layout: key-partitioned, sorted files so
    # point reads prune row groups
    df = spark.createDataFrame([(i, float(i)) for i in range(1000)], "key long, v double")
    path = str(tmp_path / "s")
    (
        df.repartition(4, "key")
        .sortWithinPartitions("key")
        .write.mode("overwrite")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    assert back.count() == 1000
    assert back.filter("key = 42").count() == 1


def test_multi_format_round_trips(spark, tables, tmp_path):
    from distributed_vector_database_spark.sources.formats import (
        read_table,
        write_table,
    )

    nation = tables["nation"]
    schema = nation.schema.simpleString()[7:-1].replace(":", " ").replace(",", ", ")
    want = sorted(map(tuple, nation.collect()))
    for fmt in ("parquet", "orc", "json", "csv"):
        p = str(tmp_path / fmt)
        write_table(nation, p, fmt)
        got = read_table(spark, p, fmt, schema=schema)
        assert sorted(map(tuple, got.collect())) == want, fmt


def test_csv_rejects_complex_columns(spark, tables, tmp_path):
    import pytest as _pytest

    from distributed_vector_database_spark.sources.formats import write_table

    with _pytest.raises(ValueError, match="complex columns"):
        write_table(tables["embeddings"], str(tmp_path / "x"), "csv")
