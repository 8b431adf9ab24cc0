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


def test_jl_projection_matches_numpy(spark):
    import numpy as np

    from distributed_vector_database_spark.functions.vector import (
        project,
        rademacher_matrix,
    )
    from pyspark.sql import functions as F

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(20, 16)).astype(float)
    m = rademacher_matrix(16, 4, seed=0)
    # matrix is pure f(seed): rebuilding yields identical entries
    assert m == rademacher_matrix(16, 4, seed=0)
    assert {x for row in m for x in row} == {1.0, -1.0}

    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(20)],
        "id long, v array<double>",
    )
    out = {
        r["id"]: r["p"]
        for r in df.select("id", project("v", m).alias("p")).collect()
    }
    expected = vecs @ np.array(m).T / np.sqrt(4.0)
    for i in range(20):
        assert np.allclose(out[i], expected[i], atol=1e-9)
