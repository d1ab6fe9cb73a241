from . import dedup, incremental, similarity, text, multimodal

__all__ = ["dedup", "incremental", "similarity", "text", "multimodal"]
