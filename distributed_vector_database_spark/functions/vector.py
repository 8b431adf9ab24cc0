"""Vector column expressions — the engine's distance/norm kernels.

Reference parity:
- squared L2 distance semantics: hnswlib space='l2' returns SQUARED L2
  and lower score = better (src/datanode/handler.py:46,364;
  src/coordinator/handler.py:212). All k-NN here sorts ascending on
  squared L2, matching that contract.
- L2 normalize with zero-guard: src/utils/vector_utils.py:15-17 and the
  CLIP embedder normalization (clip/embedding.py:64,89).
- dim validation at write: src/datanode/handler.py:228-232,
  src/utils/vector_utils.py:8-13.

Everything here is a NATIVE Catalyst expression (higher-order array
functions) — no Python UDFs — so distance computations stay inside
whole-stage codegen on the JVM and scale linearly with executors. All
arithmetic is done in double regardless of the storage type (fixtures
store array<float>) so results are bit-identical to a double-precision
oracle that folds elements in the same order.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def vector_lit(values: Sequence[float]) -> Column:
    """A literal array<double> column from a Python sequence (the
    broadcast query vector: the Spark analog of shipping
    SearchRequest.query_vector to every node)."""
    return F.array(*[F.lit(float(v)) for v in values])


def _as_double(v: Column | str) -> Column:
    c = F.col(v) if isinstance(v, str) else v
    return c.cast("array<double>")


def squared_l2(a: Column | str, b: Column | str | Sequence[float]) -> Column:
    """Squared L2 distance between two vector columns (or a column and a
    literal). Folds left-to-right in double, matching an ordered SQL
    oracle sum exactly."""
    if isinstance(b, (list, tuple)):
        b = vector_lit(b)
    diff2 = F.zip_with(_as_double(a), _as_double(b), lambda x, y: (x - y) * (x - y))
    return F.aggregate(diff2, F.lit(0.0), lambda acc, v: acc + v)


def dot(a: Column | str, b: Column | str | Sequence[float]) -> Column:
    """Dot product of two vector columns."""
    if isinstance(b, (list, tuple)):
        b = vector_lit(b)
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm of a vector column."""
    sq = F.transform(_as_double(a), lambda x: x * x)
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


def normalize(a: Column | str) -> Column:
    """L2-normalize with zero-vector guard (returns the vector unchanged
    when its norm is 0, mirroring src/utils/vector_utils.py:15-17).

    The norm is LET-BOUND through a one-element array so the division
    lambda sees it as a bound value: Catalyst does not CSE
    subexpressions into lambda bodies, so the naive
    `transform(a, x -> x / l2_norm(a))` re-sums the whole vector once
    per element — O(d²) per row (measured 89x at d=512, 50k rows)."""
    a = _as_double(a)
    return F.element_at(
        F.transform(
            F.array(l2_norm(a)),
            lambda n: F.when(n == 0.0, a).otherwise(
                F.transform(a, lambda x: x / n)
            ),
        ),
        1,
    )


def cosine_similarity(a: Column | str, b: Column | str | Sequence[float]) -> Column:
    """Cosine similarity; 0 when either side is the zero vector."""
    if isinstance(b, (list, tuple)):
        b = vector_lit(b)
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def dim_ok(a: Column | str, dim: int) -> Column:
    """Dimension-validation predicate (reference rejects mismatched dims
    at write, src/datanode/handler.py:228-232)."""
    c = F.col(a) if isinstance(a, str) else a
    return c.isNotNull() & (F.size(c) == dim)


def rademacher_matrix(
    d_in: int, d_out: int, seed: int | str = 0
) -> list[list[float]]:
    """Deterministic ±1 Johnson–Lindenstrauss projection matrix
    (Achlioptas 2003: Rademacher entries preserve pairwise distances
    like Gaussian ones, with exact ±1 arithmetic). Entries derive from
    md5(seed:j:i), so every executor — and a SQL oracle — can
    reconstruct the identical matrix from the seed alone; no RNG state,
    no broadcast of trained parameters."""
    import hashlib

    return [
        [
            1.0
            if hashlib.md5(f"{seed}:{j}:{i}".encode()).digest()[0] % 2 == 0
            else -1.0
            for i in range(d_in)
        ]
        for j in range(d_out)
    ]


def project(
    vec: Column | str,
    matrix: Sequence[Sequence[float]],
    scale: float | None = None,
) -> Column:
    """Project a vector column through a literal matrix (rows =
    output dims), scaled by 1/sqrt(d_out) — the JL dimension-reduction
    map. Pure Catalyst expression: per row O(d_in * d_out) codegen'd
    multiply-adds, zero shuffles, no Python. Fold order is
    left-to-right per output dim, matching an ordered SQL oracle sum.

    The matrix ships as a literal in the plan (fine for the JL regime,
    d_out << d_in << thousands); `vec` should be a staged column when
    reused across several expressions (the no-CSE rule)."""
    v = _as_double(vec)
    # scale=None keeps the JL 1/sqrt(d_out) convention; pass 1.0 for a
    # plain (unscaled) linear map, e.g. PCA projection
    scale = F.lit(float(len(matrix)) ** 0.5 if scale is None else scale)
    rows = F.array(
        *[F.array(*[F.lit(float(x)) for x in row]) for row in matrix]
    )
    return F.transform(
        rows,
        lambda row: F.aggregate(
            F.zip_with(v, row, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, p: acc + p,
        )
        / scale,
    )
