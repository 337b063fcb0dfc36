from peregrine_spark.similarity.ann import cosine_topk, cosine_topk_lsh

__all__ = ["cosine_topk", "cosine_topk_lsh"]
