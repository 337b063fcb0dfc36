from peregrine_spark.graph.build import (
    GraphTables,
    build_graph,
    canonical_edges,
    convert_edge_list,
    edges_from_pairs,
    symmetrized,
)

__all__ = [
    "GraphTables",
    "build_graph",
    "canonical_edges",
    "convert_edge_list",
    "edges_from_pairs",
    "symmetrized",
]
