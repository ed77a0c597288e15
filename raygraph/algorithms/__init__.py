from raygraph.algorithms.pagerank import pagerank
from raygraph.algorithms.components import connected_components
from raygraph.algorithms.lpa import label_propagation
from raygraph.algorithms.triangles import triangle_count

__all__ = ["pagerank", "connected_components", "label_propagation", "triangle_count"]
