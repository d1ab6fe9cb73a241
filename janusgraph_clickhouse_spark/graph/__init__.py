from .model import PropertyGraph, star_schema_graph, ID_OFFSETS
from .traversal import Traversal

__all__ = ["PropertyGraph", "star_schema_graph", "ID_OFFSETS", "Traversal"]
