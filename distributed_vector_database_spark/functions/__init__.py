from distributed_vector_database_spark.functions.vector import (
    cosine_similarity,
    dot,
    l2_norm,
    normalize,
    squared_l2,
    vector_lit,
)

__all__ = [
    "cosine_similarity",
    "dot",
    "l2_norm",
    "normalize",
    "squared_l2",
    "vector_lit",
]
