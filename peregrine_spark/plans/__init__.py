from peregrine_spark.plans.compiler import MatchPlan, compile_match
from peregrine_spark.plans.counts import convert_counts, num_mappings

__all__ = ["MatchPlan", "compile_match", "convert_counts", "num_mappings"]
