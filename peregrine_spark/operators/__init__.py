from peregrine_spark.operators.triangles import (
    local_clustering,
    triangle_count,
    triangle_count_per_vertex,
)

__all__ = ["local_clustering", "triangle_count", "triangle_count_per_vertex"]
