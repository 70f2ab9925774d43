from anorag_tpu.ops import bm25, fusion, graph, ivf, kmeans, topk
from anorag_tpu.ops.topk import dense_topk, dense_topk_np, dense_topk_xla

__all__ = ["bm25", "fusion", "graph", "ivf", "kmeans", "topk",
           "dense_topk", "dense_topk_np", "dense_topk_xla"]
