"""Pregel-on-DataFrames kernel (SURVEY §4 custom work #1).

Catalyst has no fixpoint operator; iterative graph algorithms are a
driver-side loop of declarative steps:

    state ── join edges ──▶ messages ── groupBy(dst) ──▶ agg ──▶ new state

Each superstep is two shuffles (message join + aggregate).  The three
things that make this survive 100 iterations × 100 TB:

1. **Lineage truncation** — every `checkpoint_interval` supersteps the
   state DF is `localCheckpoint(eager=True)`-ed, otherwise the plan tree
   grows linearly and the driver dies re-optimizing it (on a real cluster,
   use reliable `checkpoint()` with a checkpoint dir for fault tolerance).
2. **Stable partitioning** — messages aggregate on `dst` and the result
   joins back on `id`; AQE keeps these co-partitioned shuffle-to-shuffle.
3. **Early exit** — optional convergence probe (an agg, not a collect of
   the state) every `check_interval` supersteps.

The reference system runs the same computation by full-scanning the
edgestore and handing it to an external graph computer (SURVEY §2.3
PageRank row); here it is native.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pregel(
    state: DataFrame,
    edges: DataFrame,
    make_messages: Callable[[DataFrame, DataFrame], DataFrame],
    aggregate_messages: Callable[[DataFrame], DataFrame],
    update_state: Callable[[DataFrame, DataFrame], DataFrame],
    max_iter: int,
    checkpoint_interval: int = 5,
    converged: Callable[[DataFrame, DataFrame], bool] | None = None,
    converge_check_interval: int = 1,
) -> DataFrame:
    """Run supersteps until max_iter or convergence.

    state   : DF keyed by `id`
    edges   : DF with `src`, `dst` (+ props)
    make_messages(state, edges) -> DF with `dst` + message cols
    aggregate_messages(msgs)    -> DF keyed by `dst` (one row per dst)
    update_state(state, agg)    -> new state DF keyed by `id`
    converged(old, new) -> bool : optional early-exit probe
    """
    state = state.localCheckpoint(eager=True)
    for i in range(max_iter):
        msgs = make_messages(state, edges)
        agg = aggregate_messages(msgs)
        new_state = update_state(state, agg)
        if (i + 1) % checkpoint_interval == 0 or i == max_iter - 1:
            new_state = new_state.localCheckpoint(eager=True)
        # the probe is itself a Spark job; for fast-converging algorithms
        # check every round, for long loops amortize with a larger interval
        # (worst case: interval-1 extra supersteps after convergence)
        if (converged is not None
                and (i + 1) % converge_check_interval == 0
                and converged(state, new_state)):
            state = new_state
            break
        state = new_state
    return state


def aggregate_neighbors(state: DataFrame, edges: DataFrame, value_col: str,
                        agg_expr) -> DataFrame:
    """One message round: send state[value_col] along out-edges, aggregate
    at dst.  Returns DF(dst, agg)."""
    return (edges.join(state.select(F.col("id").alias("src"),
                                    F.col(value_col)), "src")
            .groupBy("dst")
            .agg(agg_expr))
