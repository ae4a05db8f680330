"""Post-hoc explanation: GNNExplainer, GEM, Camelyon16 pixel-level eval."""
from .gem import GemExplainer, HetGemExplainer
from .gnn_explainer import GNNExplainer
from .explain_graphs import ExplainGraph, parse_annotation_xml, points_in_polygon

__all__ = [
    "GemExplainer",
    "HetGemExplainer",
    "GNNExplainer",
    "ExplainGraph",
    "parse_annotation_xml",
    "points_in_polygon",
]
