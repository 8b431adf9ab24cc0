"""JSONL document ingestion with corrupt-record quarantine.

The reference ingests corpora via ad-hoc scripts (O26,
Scripts/download_dataset.py, Scripts/trasfer_gbk.py) that crash on the
first malformed line. A pipeline fed by web-scale crawls cannot: bad
lines are data, not exceptions. This source reads JSON-lines documents
against an explicit schema and splits the result into (valid,
quarantine) so ingestion never stalls and nothing is silently dropped
— the quarantine side carries the raw offending line for audit/replay.

100 TB shape: one pass, no shuffle — both legs are filters over the
same scan (Spark caches nothing here; at scale, write both legs out of
one job or persist the parsed frame). Schema is explicit, never
inferred: inference would scan the corpus twice and lock in whatever
the first sampled lines looked like.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# documents-fixture shape; callers pass their own schema for other tables
DOCUMENTS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)
_CORRUPT = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str = DOCUMENTS_SCHEMA,
    required: tuple[str, ...] = ("doc_id", "text"),
) -> DataFrame:
    """Parse JSONL at `path` against `schema` in PERMISSIVE mode. The
    returned frame carries every schema column plus `_corrupt_record`
    (the raw line for unparseable rows, null for clean ones) and
    `_valid` (parseable AND every `required` column non-null) — split
    downstream with valid_documents / quarantine."""
    full_schema = f"{schema}, {_CORRUPT} string"
    df = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )
    ok = F.col(_CORRUPT).isNull()
    for c in required:
        ok = ok & F.col(c).isNotNull()
    return df.withColumn("_valid", ok)


def valid_documents(parsed: DataFrame) -> DataFrame:
    """The clean leg: schema columns only, audit columns dropped."""
    return parsed.filter(F.col("_valid")).drop(_CORRUPT, "_valid")


def quarantine(parsed: DataFrame) -> DataFrame:
    """The audit leg: rows that failed parsing or the required-column
    check, with the raw line (when Spark kept one) and a reason."""
    return parsed.filter(~F.col("_valid")).select(
        F.col(_CORRUPT).alias("raw_line"),
        F.when(F.col(_CORRUPT).isNotNull(), F.lit("unparseable"))
        .otherwise(F.lit("missing_required"))
        .alias("reason"),
        *[F.col(c) for c in parsed.columns if c not in (_CORRUPT, "_valid")],
    )


def write_jsonl(df: DataFrame, path: str, mode: str = "error") -> None:
    """Round-trip sink: one JSON object per line, lz4-free plain text
    (interchange format — parquet is the performance format)."""
    df.write.mode(mode).json(path)
