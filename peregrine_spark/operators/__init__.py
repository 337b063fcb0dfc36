from peregrine_spark.operators.triangles import (
    ktruss,
    local_clustering,
    triangle_count,
    triangle_count_per_vertex,
)

__all__ = ["ktruss", "local_clustering", "triangle_count", "triangle_count_per_vertex"]
