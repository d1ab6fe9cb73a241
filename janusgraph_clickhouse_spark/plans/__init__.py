from .registry import QUERIES, ORACLES, query, get_queries, get_oracles

# Importing the domain modules populates the registry.
from . import relational  # noqa: E402,F401
from . import graph_queries  # noqa: E402,F401
from . import llm_queries  # noqa: E402,F401
from . import streaming_queries  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "query", "get_queries", "get_oracles"]
