from .graph import (
    KGraph,
    build_graph,
    filter_kcore,
    graph_summary,
    relabel_nodes,
    triples,
)
from .splits import split_ratings
from .metrics import map_at_k, ndcg_at_k, evaluate
from .recommend import PopularityRecommender, topk_by_cosine

__all__ = [
    "KGraph",
    "build_graph",
    "filter_kcore",
    "graph_summary",
    "relabel_nodes",
    "triples",
    "split_ratings",
    "map_at_k",
    "ndcg_at_k",
    "evaluate",
    "PopularityRecommender",
    "topk_by_cosine",
]
