"""Pure-Python/NumPy oracles replicating the reference's exact semantics.

These are single-node float64 re-derivations used only by tests; the engine
itself never imports them on the executor path.
"""

from pagerank_spark.oracle.pagerank_np import pagerank_np, build_matrix
from pagerank_spark.oracle.graph_np import (
    connected_components_np,
    label_propagation_np,
    triangle_count_np,
)

__all__ = [
    "pagerank_np",
    "build_matrix",
    "connected_components_np",
    "label_propagation_np",
    "triangle_count_np",
]
