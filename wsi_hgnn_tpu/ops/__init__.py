"""Compute kernels: exact KNN, Pearson edge typing, Pallas TPU kernels."""
from .knn import knn_l2, knn_lookup
from .pearson import center_normalize, pearson_edges

__all__ = ["knn_l2", "knn_lookup", "center_normalize", "pearson_edges"]
