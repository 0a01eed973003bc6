#!/usr/bin/env python
"""32-core vs 8-core A/B on named queries (VERDICT r16 item 1 criterion).

The master URL cannot change inside a session, so each arm is a separate
process (this script, one core count per invocation); interleave
invocations A/B/A/B from the caller and merge mins per query:

    for i in 1 2 3; do
      python tools/core_scaling.py 32 q1 q2 >> /tmp/c32.jsonl
      python tools/core_scaling.py 8  q1 q2 >> /tmp/c8.jsonl
    done

Prints one JSON line: {"cpus": N, "queries": {name: min_sec}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cpus = int(sys.argv[1])
names = sys.argv[2:]
os.environ["SPARK_GRAFT_CPUS"] = str(cpus)

from pinterest_data_pipeline_spark.plans import analytics
from pinterest_data_pipeline_spark.plans import extensions  # noqa: F401
from pinterest_data_pipeline_spark.plans import relational  # noqa: F401
from pinterest_data_pipeline_spark.session import get_spark, release_scoped

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run(spark, name: str) -> float:
    t0 = time.perf_counter()
    analytics.QUERIES[name](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark("core_scaling", cpus=cpus)
    for name in names:  # warm pass: codegen + stores, untimed
        run(spark, name)
        release_scoped()
    out = {}
    for name in names:
        release_scoped()
        out[name] = round(min(run(spark, name) for _ in range(2)), 4)
    print(json.dumps({"cpus": cpus, "queries": out}))


if __name__ == "__main__":
    main()
