"""Vector expression kernels vs numpy ground truth."""

import math

import numpy as np

from distributed_vector_database_spark.functions.vector import (
    cosine_similarity,
    dim_ok,
    dot,
    l2_norm,
    normalize,
    squared_l2,
    vector_lit,
)

A = [1.0, 2.0, -3.0, 0.5]
B = [-1.0, 0.0, 2.0, 4.0]


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_squared_l2(spark):
    got = _one(spark, squared_l2(vector_lit(A), B))
    assert got == sum((a - b) ** 2 for a, b in zip(A, B))


def test_dot(spark):
    assert _one(spark, dot(vector_lit(A), B)) == float(np.dot(A, B))


def test_l2_norm(spark):
    assert _one(spark, l2_norm(vector_lit(A))) == math.sqrt(sum(x * x for x in A))


def test_normalize_unit(spark):
    got = _one(spark, l2_norm(normalize(vector_lit(A))))
    assert abs(got - 1.0) < 1e-12


def test_normalize_zero_guard(spark):
    # zero vector passes through unchanged (src/utils/vector_utils.py:15-17)
    got = _one(spark, normalize(vector_lit([0.0, 0.0])))
    assert got == [0.0, 0.0]


def test_cosine_self(spark):
    assert abs(_one(spark, cosine_similarity(vector_lit(A), A)) - 1.0) < 1e-12


def test_cosine_zero(spark):
    assert _one(spark, cosine_similarity(vector_lit([0.0, 0.0]), [1.0, 1.0])) == 0.0


def test_dim_ok(spark):
    df = spark.createDataFrame([([1.0, 2.0],), (None,)], "v array<double>")
    got = [r[0] for r in df.select(dim_ok("v", 2)).collect()]
    assert got == [True, False]
