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
    df = em.queries()[name](spark, SF_DIR)
    assert len(df.schema.fields) > 0
