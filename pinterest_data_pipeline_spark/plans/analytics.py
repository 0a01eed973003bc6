"""Oracle-checked analytical query battery over the driver testdata.

Each function takes ``(spark, sf_dir)`` and returns a DataFrame; each has an
ANSI-SQL dual in ``oracles.py`` that DuckDB runs over the identical parquet.
The nine ``q*`` queries are structural analogues of the reference's analytical
battery (SURVEY.md §2.8, reference sites
``databricks_notebooks/pintrest_batch_data_transformation.py:176-484``) mapped
onto the TPC-H-ish schema: pin→part/lineitem, geo→nation (country ~ nation),
user→customer/supplier.

Design rules for every query here:

* Declarative DataFrame chains only — Catalyst does pushdown/pruning/join
  selection; small dims (region/nation) get an explicit ``broadcast`` hint.
* Every computed column is aliased identically to the oracle SQL (the driver
  hash-compares by sorted column name).
* Float aggregates are rounded to a fixed scale in BOTH duals so the
  order-insensitive value-hash is stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import load_table

# name -> callable(spark, sf_dir) -> DataFrame; __spark_entry__.queries() re-exports this.
QUERIES: dict = {}


def query(fn):
    """Register a query callable under its function name."""
    QUERIES[fn.__name__] = fn
    return fn


# ---------------------------------------------------------------------------
# Q1 — most popular part brand per nation
# Analogue of reference Q1 "most popular category per country" (BATCH:176-202):
# join → groupBy count → RANK() per partition → rank=1 filter → order.
# RANK (not ROW_NUMBER) so ties all survive, matching reference semantics.
# ---------------------------------------------------------------------------
@query
def q1_top_brand_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")

    counts = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(part, lineitem.l_partkey == part.p_partkey)
        .groupBy("n_name", "p_brand")
        .agg(F.count(F.lit(1)).alias("brand_count"))
    )
    w = Window.partitionBy("n_name").orderBy(F.desc("brand_count"))
    return (
        counts.withColumn("ranking", F.rank().over(w))
        .filter(F.col("ranking") == 1)
        .select("n_name", "p_brand", "brand_count")
        .orderBy(F.desc("brand_count"), F.asc("n_name"), F.asc("p_brand"))
    )
