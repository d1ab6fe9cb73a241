"""JanusGraph predicate surface → Spark Column expressions (SURVEY §2.3).

The host system's query predicates (JanusGraph 0.6 `P.*` / `Text.*`,
serialized through the reference adapter as opaque index-range bytes) map
1:1 onto Catalyst-visible column expressions — every one of these pushes
into the parquet scan or stays inside whole-stage codegen:

    eq/neq/gt/gte/lt/lte      ==  !=  >  >=  <  <=
    inside/outside/between     open/closed range conjunctions
    within/without             isin / ~isin
    textContains               split-word membership
    textPrefix                 startswith
    textRegex                  rlike (anchored, Java regex)
    textFuzzy                  levenshtein distance ≤ 2

No Python UDFs: fuzziness uses the built-in levenshtein; everything else
is a comparison Catalyst can reorder, fold, and push down.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


class P:
    """Gremlin-style predicate builders returning Spark Columns."""

    @staticmethod
    def eq(col: str, v) -> Column:
        return F.col(col) == v

    @staticmethod
    def neq(col: str, v) -> Column:
        return F.col(col) != v

    @staticmethod
    def gt(col: str, v) -> Column:
        return F.col(col) > v

    @staticmethod
    def gte(col: str, v) -> Column:
        return F.col(col) >= v

    @staticmethod
    def lt(col: str, v) -> Column:
        return F.col(col) < v

    @staticmethod
    def lte(col: str, v) -> Column:
        return F.col(col) <= v

    @staticmethod
    def between(col: str, lo, hi) -> Column:
        """JanusGraph between: [lo, hi) — half-open, unlike SQL BETWEEN."""
        return (F.col(col) >= lo) & (F.col(col) < hi)

    @staticmethod
    def inside(col: str, lo, hi) -> Column:
        """(lo, hi) — both exclusive."""
        return (F.col(col) > lo) & (F.col(col) < hi)

    @staticmethod
    def outside(col: str, lo, hi) -> Column:
        return (F.col(col) < lo) | (F.col(col) > hi)

    @staticmethod
    def within(col: str, values: Sequence) -> Column:
        return F.col(col).isin(list(values))

    @staticmethod
    def without(col: str, values: Sequence) -> Column:
        return ~F.col(col).isin(list(values))

    @staticmethod
    def text_contains(col: str, word: str) -> Column:
        """JanusGraph textContains matches a whole token, not a substring."""
        return F.array_contains(F.split(F.lower(F.col(col)), r"\W+"),
                                word.lower())

    @staticmethod
    def text_prefix(col: str, prefix: str) -> Column:
        return F.col(col).startswith(prefix)

    @staticmethod
    def text_regex(col: str, pattern: str) -> Column:
        """JanusGraph textRegex matches the WHOLE string value."""
        return F.col(col).rlike(f"^(?:{pattern})$")

    @staticmethod
    def text_fuzzy(col: str, term: str, max_distance: int = 2) -> Column:
        return F.levenshtein(F.lower(F.col(col)), F.lit(term.lower())) \
            <= max_distance


_DISPATCH = {
    "eq": P.eq, "neq": P.neq, "gt": P.gt, "gte": P.gte, "lt": P.lt,
    "lte": P.lte, "within": P.within, "without": P.without,
    "textContains": P.text_contains, "textPrefix": P.text_prefix,
    "textRegex": P.text_regex, "textFuzzy": P.text_fuzzy,
}


def apply_predicate(name: str, col: str, *args) -> Column:
    """Dynamic form: apply_predicate("gt", "age", 30)."""
    if name in ("between", "inside", "outside"):
        return getattr(P, name)(col, *args)
    if name not in _DISPATCH:
        raise ValueError(f"unknown predicate: {name}")
    return _DISPATCH[name](col, *args)
