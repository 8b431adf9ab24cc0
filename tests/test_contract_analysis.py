"""Analysis-time smoke over the ENTIRE contract.

The r4 incident was an AnalysisException (TIMESTAMP_NTZ vs unix_micros)
in two queries with no pytest coverage — the suite stayed green while
the contract broke. Forcing .schema on every queries() entry makes
Spark fully analyze every plan against the real fixture files, so any
fixture-encoding drift or broken column reference fails HERE, for all
queries at once, without executing the heavy ones.

(Queries whose builders do eager work — KMeans fits, codebook training —
run small jobs at sf0.001; that is the price of covering them at all.)
"""

from __future__ import annotations

import pytest

import __spark_entry__ as em

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", list(em.queries().keys()))
def test_contract_query_analyzes(spark, name):
    from pyspark.sql.types import ArrayType, MapType, StructType

    df = em.queries()[name](spark, SF_DIR)
    assert len(df.schema.fields) > 0
    # Driver-canonicalizer compatibility lint (r9 incident: the
    # length_batches row ERR'd because the driver pandas-sorts result
    # columns and a list cell is unhashable). No contract query may
    # emit a nested-typed column — serialize arrays to a canonical
    # string in the CONTRACT projection, keep the operator typed.
    nested = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not nested, (
        f"{name} emits nested-typed column(s) {nested}; the driver's "
        "canonicalizer cannot hash list/dict cells — serialize to a "
        "string in the contract wiring (see length_batches)"
    )
