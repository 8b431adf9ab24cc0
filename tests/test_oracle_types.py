"""Oracle-side type hygiene for the driver's hash gate.

DuckDB promotes sum(BIGINT) to HUGEINT (and some arithmetic to
DECIMAL).  The driver canonicalizes both result sets through pandas,
and duckdb's fetchdf maps HUGEINT/DECIMAL to float64 — so an oracle
whose *values* equal Spark's int64 output still value-hash-mismatches
("3.0" vs "3").  This was the root cause of the length_batches driver
hash-fail in rounds 9-10: the only oracle in the contract whose output
carried a HUGEINT column.  Every integer aggregate that reaches the
SELECT list must be CAST(... AS BIGINT).

This test executes every oracle_sql() entry against sf0.001 and
asserts no output column is HUGEINT / UHUGEINT / DECIMAL.
"""

import duckdb
import pytest

import __spark_entry__ as entrymod
from distributed_vector_database_spark.config import FIXTURE_TABLES

SF_DIR = "/root/testdata/sf0.001"

BANNED = ("HUGEINT", "UHUGEINT")


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def test_no_hugeint_or_decimal_oracle_columns(con):
    offenders = {}
    for name, sql in entrymod.oracle_sql().items():
        rel = con.sql(sql)
        flagged = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if str(t) in BANNED or str(t).startswith("DECIMAL")
        ]
        if flagged:
            offenders[name] = flagged
    assert not offenders, (
        "oracle output columns with pandas-float-coercing types "
        f"(cast them to BIGINT): {offenders}"
    )
