"""The engine-portable hash: first 60 md5 bits as a non-negative BIGINT.

This single expression is the repo's cross-engine determinism keystone —
every hash that participates in a DECISION (LSH buckets, CDC cut points,
sampling keys, sketch registers, MIS priorities, split assignments) uses
it, and every DuckDB oracle re-derives it as
``('0x' || substr(md5(x), 1, 15))::BIGINT``.  Keep the two forms in
lockstep: widening or reseeding this hash means touching every oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_long60(c: Column) -> Column:
    """First 15 hex chars (60 bits) of md5(c) as a BIGINT in [0, 2^60)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")
