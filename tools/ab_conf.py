#!/usr/bin/env python
"""Interleaved same-box A/B of runtime-settable SQL confs over bench queries.

The r16 verdict showed this box's multi-minute load phases make separate
bench invocations incomparable (±40% calib spread); every per-query
conclusion must come from interleaved min-of-N on one session. This tool
flips a conf set between reps INSIDE one session (shuffle partitioning and
AQE coalescing confs are runtime-settable), replicating bench.py's
methodology per arm: release_scoped, then min of REPEAT runs (warm
persist_scoped steady state), repeated REPS times per arm, interleaved.

Usage:
    python tools/ab_conf.py query [query ...]
        [--reps N] [--repeat N]
        [--a k=v,k=v] [--b k=v,k=v]

Prints one JSON line per query: {"query": ..., "a": min, "b": min,
"a_runs": [...], "b_runs": [...]}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pinterest_data_pipeline_spark.plans import analytics
from pinterest_data_pipeline_spark.plans import extensions  # noqa: F401
from pinterest_data_pipeline_spark.plans import relational  # noqa: F401
from pinterest_data_pipeline_spark.session import get_spark, release_scoped

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def parse_conf(s: str) -> dict[str, str]:
    out = {}
    if s:
        for kv in s.split(","):
            k, v = kv.split("=", 1)
            out[k.strip()] = v.strip()
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("queries", nargs="+")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--repeat", type=int, default=2)
    p.add_argument("--a", default="")
    p.add_argument("--b", default="")
    args = p.parse_args()

    conf_a = parse_conf(args.a)
    conf_b = parse_conf(args.b)
    keys = sorted(set(conf_a) | set(conf_b))

    spark = get_spark("ab_conf")
    defaults = {k: spark.conf.get(k, None) for k in keys}

    def apply(conf: dict[str, str]) -> None:
        for k in keys:
            v = conf.get(k, defaults[k])
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    def run(name: str) -> float:
        fn = analytics.QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # Warm-up: codegen + parquet footers + any fingerprint-cached store
    # builds land outside the timed arms (bench.py pre-warms stores too).
    for name in args.queries:
        run(name)
        release_scoped()

    results = {}
    for name in args.queries:
        arms: dict[str, list[float]] = {"a": [], "b": []}
        for rep in range(args.reps):
            for arm, conf in (("a", conf_a), ("b", conf_b)):
                apply(conf)
                release_scoped()
                arms[arm].append(
                    round(min(run(name) for _ in range(args.repeat)), 4)
                )
        results[name] = arms
        line = {
            "query": name,
            "a": min(arms["a"]),
            "b": min(arms["b"]),
            "b_over_a": round(min(arms["b"]) / min(arms["a"]), 3),
            "a_runs": arms["a"],
            "b_runs": arms["b"],
        }
        print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()
