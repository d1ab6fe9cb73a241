from .predicates import P, apply_predicate

__all__ = ["P", "apply_predicate"]
