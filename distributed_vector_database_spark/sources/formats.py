"""Multi-format table IO — the source/sink matrix beside the parquet
default.

Format guidance at 100 TB: parquet/ORC are the only sane corpus
formats (columnar, compressed, footer stats for pruning — see
operators/layout.py); JSON-lines is the interchange/ingest edge
(sources/jsonl.py adds corrupt-record quarantine); CSV exists for
flat exports only. Complex columns (arrays/maps/structs — embeddings,
metadata) do NOT fit CSV: write_table fails fast rather than
silently stringifying vectors."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_FORMATS = ("parquet", "orc", "json", "csv")
_FLAT_ONLY = ("csv",)


def _complex_cols(df: DataFrame) -> list[str]:
    return [
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() in ("array", "map", "struct")
    ]


def write_table(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; pick from {_FORMATS}")
    if fmt in _FLAT_ONLY:
        bad = _complex_cols(df)
        if bad:
            raise ValueError(
                f"CSV cannot represent complex columns {bad}; use parquet/orc/json"
            )
    w = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        w = w.option("header", "true")
    w.save(path)


def read_table(
    spark: SparkSession, path: str, fmt: str = "parquet", schema: str | None = None
) -> DataFrame:
    """Read back a written table. For the schema-less text formats
    (json/csv) pass the DDL schema — inference costs an extra full
    scan and types drift (ints widen, timestamps stringify), which is
    exactly the 100 TB anti-pattern."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; pick from {_FORMATS}")
    r = spark.read.format(fmt)
    if schema is not None:
        r = r.schema(schema)
    if fmt == "csv":
        r = r.option("header", "true")
    return r.load(path)
