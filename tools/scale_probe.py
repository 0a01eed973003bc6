#!/usr/bin/env python
"""Scale probe: re-run headliners on synthetically multiplied data.

Answers "would this plan survive a scale-up?" with measurements instead of
assertions: each fact table is unioned with key-shifted copies (MULT x rows,
distinct keys, same distributions) and a subset of headline queries runs on
the inflated frames. Near-linear wall-clock growth + no plan degradation
(still broadcast dims, still partial aggs) is the pass condition; output is
one JSON line per (query, mult) for eyeballing or NOTES.md.

Usage: python tools/scale_probe.py [mult ...]   (default: 1 8)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from pinterest_data_pipeline_spark.operators import dedup
from pinterest_data_pipeline_spark.session import get_spark, load_table

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
KEY_STRIDE = 100_000_000


def multiply(df: DataFrame, mult: int, key_cols: list[str]) -> DataFrame:
    """mult x rows: union key-shifted copies so join keys stay consistent."""
    parts = [df]
    for i in range(1, mult):
        shifted = df
        for k in key_cols:
            shifted = shifted.withColumn(k, F.col(k) + i * KEY_STRIDE)
        parts.append(shifted)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def probe_tpch_q5(spark, mult: int) -> float:
    customer = multiply(load_table(spark, SF, "customer"), mult, ["c_custkey"])
    orders = multiply(load_table(spark, SF, "orders"), mult, ["o_orderkey", "o_custkey"])
    lineitem = multiply(load_table(spark, SF, "lineitem"), mult, ["l_orderkey"])
    supplier = load_table(spark, SF, "supplier")
    nation = load_table(spark, SF, "nation")
    region = load_table(spark, SF, "region")
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    q = (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(F.round(revenue, 2).alias("revenue"))
    )
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_simhash(spark, mult: int) -> float:
    docs = multiply(load_table(spark, SF, "documents"), mult, ["doc_id"])
    q = dedup.simhash_near_duplicates(docs, "text", "doc_id", max_distance=10)
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_groupagg(spark, mult: int) -> float:
    lineitem = multiply(load_table(spark, SF, "lineitem"), mult, ["l_orderkey"])
    q = lineitem.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sq"),
        F.avg("l_extendedprice").alias("ap"),
        F.count(F.lit(1)).alias("n"),
    )
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


PROBES = {
    "tpch_q5_6way_join": probe_tpch_q5,
    "simhash_near_dup": probe_simhash,
    "pricing_agg": probe_groupagg,
}


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 8]
    spark = get_spark("scale_probe")
    probe_groupagg(spark, 1)  # warm-up
    for name, fn in PROBES.items():
        for m in mults:
            secs = round(fn(spark, m), 2)
            print(json.dumps({"probe": name, "mult": m, "sec": secs}))


if __name__ == "__main__":
    main()
