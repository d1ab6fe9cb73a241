#!/usr/bin/env python
"""Dump .explain("formatted") for named registered queries to files.

Usage: python tools/dumpplans.py OUTDIR SUFFIX name [name...]
Writes OUTDIR/<name>_<SUFFIX>.txt for each query, built at sf0.1
(override with SPARK_GRAFT_SF_DIR).

Execution caveat (r14 ADVICE): queries built on `_materialize`
(l02/l03/l32/l50/l55 and the other materialize-once names) EXECUTE
their checkpointed subplans — full shingle/bucket passes over the
corpus — during build, because the dumped plan must match the
runtime plan (a checkpoint child appears as a small LogicalRDD).
Other queries pay only bounded driver-side work (codebook collects,
size probes).  Set SPARK_GRAFT_NO_MATERIALIZE=1 to dump the lazy
un-truncated tree instead (what planlint lints by default).
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from janusgraph_clickhouse_spark.plans import get_queries  # noqa: E402
from janusgraph_clickhouse_spark.session import get_spark, tune_session  # noqa: E402


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("jcs-dumpplans")
    tune_session(spark)
    spark.sparkContext.setLogLevel("ERROR")
    queries = get_queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        out = Path(outdir) / f"{name}_{suffix}.txt"
        out.write_text(plan)
        print(f"wrote {out} ({len(plan.splitlines())} lines)")


if __name__ == "__main__":
    main()
