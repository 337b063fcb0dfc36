from peregrine_spark.patterns.small_graph import SmallGraph, PatternGenerator
from peregrine_spark.patterns.canonical import automorphisms, canonical_form
from peregrine_spark.patterns.po import symmetry_conditions, automorphism_sets

__all__ = [
    "SmallGraph",
    "PatternGenerator",
    "automorphisms",
    "canonical_form",
    "symmetry_conditions",
    "automorphism_sets",
]
