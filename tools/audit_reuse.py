"""Audit executed plans for repeated expensive subtrees.

For each named query (default: the N most expensive from
BENCH_DETAIL.json), execute it once at the given SF and count, in the
EXECUTED plan string: per-table `Scan parquet` occurrences,
`ArrowEvalPython` nodes, `ReusedExchange` and `InMemoryTableScan`
markers. A query whose plan scans the same big table k times with zero
reuse markers is a candidate for the r13 ANN lesson (a shared frame
consumed from multiple branches re-executes its whole lineage per
consumer — persist it or fuse the consumers).

String counts OVER-REPORT for persisted lineage (the in-memory plan
text repeats the child), so read ReusedExchange/InMemoryTableScan
before acting (NOTES r11) — this tool surfaces candidates, it does not
prove waste.

Usage: python tools/audit_reuse.py [sf_dir] [top_n | names...]
"""
from __future__ import annotations

import json
import os
import re
import sys

_TOOLS = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_TOOLS)
sys.path.insert(0, _REPO)

from pinterest_data_pipeline_spark.session import get_spark, release_scoped  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def audit_one(spark, fn, name: str, sf_dir: str) -> dict:
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = {}
    for t in TABLES:
        n = len(re.findall(rf"{t}\.parquet", plan))
        if n:
            scans[t] = n
    out = {
        "query": name,
        "scans": scans,
        "arrow": plan.count("ArrowEvalPython"),
        "reused_exchange": plan.count("ReusedExchange"),
        "inmemory": plan.count("InMemoryTableScan"),
        "reused_subquery": plan.count("ReusedSubquery"),
    }
    release_scoped()
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    rest = sys.argv[2:]
    import __spark_entry__ as entry

    queries = entry.queries()
    if len(rest) == 1 and rest[0].isdigit():
        with open(os.path.join(_REPO, "BENCH_DETAIL.json")) as f:
            detail = json.load(f)
        timings = detail["queries"] if "queries" in detail else detail
        names = [
            k for k, _ in sorted(
                timings.items(), key=lambda kv: -float(kv[1])
            ) if k in queries
        ][: int(rest[0])]
    elif rest:
        names = rest
    else:
        names = list(queries)
    spark = get_spark("audit_reuse")
    for name in names:
        try:
            print(json.dumps(audit_one(spark, queries[name], name, sf_dir)))
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"query": name, "error": str(e)[:200]}))


if __name__ == "__main__":
    main()
