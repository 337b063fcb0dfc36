from peregrine_spark.operators.triangles import triangle_count, triangle_count_per_vertex

__all__ = ["triangle_count", "triangle_count_per_vertex"]
