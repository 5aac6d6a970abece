from weaviate_txtai_spark.functions.vector import (
    cosine_dist,
    cosine_sim,
    dot,
    l2_dist,
    l2_norm,
    normalize_cosine_distance,
    normalize_vec,
)

__all__ = [
    "cosine_dist",
    "cosine_sim",
    "dot",
    "l2_dist",
    "l2_norm",
    "normalize_cosine_distance",
    "normalize_vec",
]
