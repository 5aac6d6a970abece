from weaviate_txtai_spark.operators.topk import knn_topk, knn_topk_gemm

__all__ = ["knn_topk", "knn_topk_gemm"]
