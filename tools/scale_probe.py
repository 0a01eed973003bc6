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
from pinterest_data_pipeline_spark.session import fan_out, get_spark, load_table

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


def _salt_text(df: DataFrame, mult: int, key_col: str) -> DataFrame:
    """Per-copy text perturbation for content-addressed probes.

    Key-shifted copies carry IDENTICAL text, so minhash/shingle operators
    would see every text duplicated mult times and candidate pairs would
    grow quadratically in multiplicity — a data property, not a plan
    property. Rewriting a common letter per copy ('a' -> 'a<i>') changes
    most shingles, so copies stay below the near-dup threshold and the
    probe measures the operator's scaling, not planted duplication.
    """
    copy_idx = (F.col(key_col) / KEY_STRIDE).cast("int")
    return df.withColumn(
        "text",
        F.when(copy_idx == 0, F.col("text")).otherwise(
            F.regexp_replace(F.col("text"), "a", F.concat(F.lit("a"), copy_idx.cast("string")))
        ),
    )


def probe_pack_sequences(spark, mult: int) -> float:
    from pinterest_data_pipeline_spark.operators import packing, text

    docs = multiply(load_table(spark, SF, "documents"), mult, ["doc_id"])
    sized = docs.select("doc_id", text.token_count(F.col("text")).alias("n_tokens"))
    q = packing.pack_sequences(sized, size_col="n_tokens", order_col="doc_id", budget=2048)
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_cluster_canonical(spark, mult: int) -> float:
    from pyspark.sql import Window

    docs = _salt_text(
        multiply(load_table(spark, SF, "documents"), mult, ["doc_id"]), mult, "doc_id"
    )
    labeled = dedup.near_duplicate_clusters(docs, "text", "doc_id", threshold=0.3)
    scored = labeled.join(
        docs.select("doc_id", F.length("text").cast("long").alias("quality")), "doc_id"
    )
    w = Window.partitionBy("cluster_id").orderBy(F.desc("quality"), F.asc("doc_id"))
    q = (
        scored.withColumn("rn", F.row_number().over(w))
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).alias("canonical_doc_id"),
        )
    )
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_tfidf(spark, mult: int) -> float:
    from pinterest_data_pipeline_spark.operators import text

    docs = _salt_text(
        multiply(load_table(spark, SF, "documents"), mult, ["doc_id"]), mult, "doc_id"
    )
    toks = docs.select("doc_id", F.explode(text.tokens(F.col("text"))).alias("term"))
    dfreq = toks.distinct().groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    tf = (
        toks.filter(F.col("doc_id") % 100 == 0)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .filter(F.col("tf") >= 2)
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    q = (
        dfreq.join(tf, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id", "term",
            (F.col("tf") * F.log(F.col("n_docs") / F.col("doc_freq"))).alias("tfidf"),
        )
    )
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_bucketed_join(spark, mult: int) -> float:
    """Bucketed co-located join at mult x: the no-Exchange property must
    survive growth — bucket COUNT is fixed at write time, bucket SIZE
    grows, and the SortMergeJoin still reads bucket i vs bucket i."""
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").removeprefix("file:")
    t_orders, t_cust = f"probe_orders_bkt_{mult}", f"probe_customer_bkt_{mult}"
    for table, source, keys in (
        (t_orders, "orders", ["o_orderkey", "o_custkey"]),
        (t_cust, "customer", ["c_custkey"]),
    ):
        if not spark.catalog.tableExists(table):
            stale = os.path.join(warehouse, table)
            if os.path.exists(stale):
                shutil.rmtree(stale)
            (
                multiply(load_table(spark, SF, source), mult, keys)
                .write.mode("overwrite")
                .format("parquet")
                .bucketBy(8, keys[-1])
                .sortBy(keys[-1])
                .saveAsTable(table)
            )
    o, c = spark.table(t_orders), spark.table(t_cust)
    q = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("rev"))
    )
    # the operator's regime is fact-join-fact where neither side broadcasts;
    # with the threshold left on, the small probe input would take a
    # BroadcastHashJoin and never exercise the bucketed SMJ path at all
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        plan = q._jdf.queryExecution().executedPlan().toString()
        smj = plan.find("SortMergeJoin")
        assert smj >= 0 and plan[smj:].count("Exchange") == 0, (
            "bucketed join lost no-Exchange"
        )
        t0 = time.perf_counter()
        q.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def probe_quantize_int8(spark, mult: int) -> float:
    from pinterest_data_pipeline_spark.operators import similarity

    emb = multiply(load_table(spark, SF, "embeddings"), mult, ["vec_id"])
    q = similarity.quantize_int8_longform(emb)
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_sessionize(spark, mult: int) -> float:
    from pyspark.sql import Window

    events = multiply(load_table(spark, SF, "events"), mult, ["event_id", "user_id"])
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_us = F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(
        prev_us.isNull() | (F.unix_micros(F.col("ts")) - prev_us > 21_600_000_000), 1
    ).otherwise(0)
    q = (
        events.withColumn("is_new", is_new)
        .withColumn(
            "session_seq", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        .groupBy("user_id", "session_seq")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("v"))
    )
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_column_profile(spark, mult: int) -> float:
    from pinterest_data_pipeline_spark.operators.quality import profile_columns

    orders = multiply(load_table(spark, SF, "orders"), mult, ["o_orderkey", "o_custkey"])
    q = profile_columns(
        orders,
        numeric_cols=["o_orderkey", "o_custkey", "o_totalprice"],
        other_cols=["o_orderstatus", "o_orderpriority", "o_orderdate"],
    )
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_salted_join(spark, mult: int) -> float:
    from pinterest_data_pipeline_spark.operators.skew import salted_join

    lineitem = multiply(load_table(spark, SF, "lineitem"), mult, ["l_orderkey"]).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = multiply(load_table(spark, SF, "orders"), mult, ["o_orderkey"]).select(
        "o_orderkey", "o_orderpriority"
    )
    joined = salted_join(lineitem, orders, on=("l_orderkey", "o_orderkey"), n_salts=8)
    q = joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_funnel_steps(spark, mult: int) -> float:
    # same conditional-min shape as events_funnel_steps (one groupBy(user)
    # pass per step, no self-joins)
    events = multiply(load_table(spark, SF, "events"), mult, ["event_id", "user_id"])
    per_user = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view")
    )
    ordered = (
        events.join(per_user, "user_id")
        .groupBy("user_id")
        .agg(
            F.min("t_view").alias("t_view"),
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")),
                    F.col("ts"),
                )
            ).alias("t_click"),
        )
    )
    q = (
        events.join(ordered, "user_id")
        .groupBy("user_id")
        .agg(
            F.min("t_click").alias("t_click"),
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t_click")),
                    F.col("ts"),
                )
            ).alias("t_purchase"),
        )
        .agg(
            F.count(F.when(F.col("t_click").isNotNull(), 1)).alias("n_click"),
            F.count(F.when(F.col("t_purchase").isNotNull(), 1)).alias("n_purchase"),
        )
    )
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_retention_cohorts(spark, mult: int) -> float:
    events = multiply(load_table(spark, SF, "events"), mult, ["event_id", "user_id"])
    week = lambda c: F.date_trunc("week", c)  # noqa: E731
    first_seen = events.groupBy("user_id").agg(week(F.min("ts")).alias("cohort_week"))
    active = (
        events.select("user_id", week(F.col("ts")).alias("active_week"))
        .distinct()
        .join(first_seen, "user_id")
    )
    q = active.groupBy(
        "cohort_week",
        (F.datediff(F.col("active_week"), F.col("cohort_week")) / 7).cast("int").alias("off"),
    ).agg(F.countDistinct("user_id").alias("n_active"))
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_incremental_rollup(spark, mult: int) -> float:
    """Streaming incremental MV at mult x: one availableNow drain of the
    update-mode day x type aggregate through the keyed upsert sink; state
    and output stay (days x types)-bounded however large the input."""
    import shutil

    from pinterest_data_pipeline_spark.streaming.pipeline import upsert_sink

    work = os.path.join("spark-warehouse", f"_probe_rollup_{mult}")
    if os.path.exists(work):
        shutil.rmtree(work)
    src = os.path.join(work, "src")
    events = multiply(load_table(spark, SF, "events"), mult, ["event_id", "user_id"])
    events.select("event_id", "ts", "event_type", "value").write.parquet(src)
    schema = "event_id long, ts timestamp, event_type string, value double"
    stream = spark.readStream.schema(schema).parquet(src)
    agg = (
        stream.withColumn("day", F.to_date(F.date_trunc("day", F.col("ts"))))
        .groupBy("day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
    )
    t0 = time.perf_counter()
    q = upsert_sink(
        agg,
        os.path.join(work, "table"),
        os.path.join(work, "ckpt"),
        keys=["day", "event_type"],
        available_now=True,
    )
    q.awaitTermination()
    secs = time.perf_counter() - t0
    shutil.rmtree(work, ignore_errors=True)
    return secs


def probe_cms(spark, mult: int) -> float:
    """Count-min sketch at mult x raw rows: the cell table stays 4x256
    however large the stream (map-side partial agg does the compression),
    so growth should be scan-bound."""
    from pinterest_data_pipeline_spark.operators import sketches

    li = multiply(load_table(spark, SF, "lineitem"), mult, ["l_orderkey"])
    cells = sketches.cms_cells(li, "l_partkey", depth=4, width=256)
    probes = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("l_partkey"))
        .limit(10)
    )
    q = sketches.cms_point_estimates(probes, cells, "l_partkey", depth=4, width=256)
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_weighted_sample(spark, mult: int) -> float:
    """A-ES weighted sample at mult x: per-partition k-heaps merged on the
    driver (TakeOrderedAndProject) — scan-bound, no global sort."""
    from pinterest_data_pipeline_spark.operators import sampling

    docs = multiply(load_table(spark, SF, "documents"), mult, ["doc_id"])
    q = sampling.weighted_sample(docs, "doc_id", "n_chars", k=100)
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_pq_topk(spark, mult: int) -> float:
    """PQ ANN at mult x corpus: one Arrow-batched encode pass + ADC scan
    with a fixed 500-candidate shortlist (the at-scale configuration —
    shortlists don't grow with the corpus on clustered data) + bounded
    rerank."""
    from pinterest_data_pipeline_spark.operators import similarity

    emb = multiply(load_table(spark, SF, "embeddings"), mult, ["vec_id"])
    queries = load_table(spark, SF, "embeddings").filter(F.col("vec_id") < 3)
    books = similarity.train_pq_codebooks(emb, n_codes=64)
    q = similarity.pq_topk_rerank(emb, queries, books, k=10, k_coarse=500)
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_recursive_chain(spark, mult: int) -> float:
    """Recursive CTE at mult x orders: each iteration is one join of the
    shrinking frontier against the ranked base — depth stays 5 regardless
    of data size, so growth should track the base ranking cost."""
    orders = multiply(
        load_table(spark, SF, "orders"), mult, ["o_orderkey", "o_custkey"]
    )
    orders.createOrReplaceTempView("_probe_orders")
    q = spark.sql(
        """
        WITH RECURSIVE ordered AS (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (
                     PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ) AS pos
          FROM _probe_orders WHERE o_custkey % 10 = 0
        ), walk AS (
          SELECT o_custkey, pos, o_orderkey,
                 round(o_totalprice, 2) AS running_total
          FROM ordered WHERE pos = 1
          UNION ALL
          SELECT o.o_custkey, o.pos, o.o_orderkey,
                 round(w.running_total + o.o_totalprice, 2)
          FROM walk w
          JOIN ordered o
            ON o.o_custkey = w.o_custkey AND o.pos = w.pos + 1 AND o.pos <= 5
        )
        SELECT o_custkey, pos, o_orderkey, running_total FROM walk
        """
    )
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_ewma_daily(spark, mult: int) -> float:
    """Decayed daily rollup at mult x events: the decay band-join runs on
    the (days x types) rollup whose size is data-independent, so growth
    should be purely the partial-agg scan."""
    from pinterest_data_pipeline_spark.plans import analytics, extensions  # noqa: F401

    events = multiply(load_table(spark, SF, "events"), mult, ["event_id", "user_id"])
    daily = (
        events.withColumn("day", F.to_date(F.date_trunc("day", F.col("ts"))))
        .groupBy("day", "event_type")
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
    )
    a = daily.select(F.col("event_type"), F.col("day").alias("day_a")).distinct()
    b = daily.select(F.col("event_type"), F.col("day").alias("day_b"), "cents")
    diff = F.datediff(F.col("day_a"), F.col("day_b"))
    q = (
        a.join(F.broadcast(b), "event_type")
        .filter((diff >= 0) & (diff <= 19))
        .groupBy("event_type", "day_a")
        .agg(F.round(F.sum(F.col("cents") * F.pow(F.lit(0.5), diff)) / 100.0, 4).alias("ewma_value"))
    )
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0




def probe_lateral_join(spark, mult: int) -> float:
    """ANSI LATERAL top-3-per-nation at mult x customers: Catalyst
    decorrelates to WindowGroupLimit + broadcast join, so growth should
    track the customer scan, never a nested loop."""
    customer = multiply(load_table(spark, SF, "customer"), mult, ["c_custkey"])
    customer.createOrReplaceTempView("_probe_customer")
    nation = load_table(spark, SF, "nation")
    nation.createOrReplaceTempView("_probe_nation")
    q = spark.sql(
        """
        SELECT n.n_name, c.c_name, c.c_acctbal
        FROM _probe_nation n,
        LATERAL (
            SELECT c_name, round(c_acctbal, 2) AS c_acctbal FROM _probe_customer
            WHERE c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_name LIMIT 3
        ) c
        """
    )
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_null_safe_join(spark, mult: int) -> float:
    """Null-safe self-join at mult x documents: <=> plans as a hash join
    on the null-safe key; the null group grows quadratically in PAIRS but
    the join itself stays a key-shuffle (the aggregate collapses pairs)."""
    docs = multiply(load_table(spark, SF, "documents"), mult, ["doc_id"])
    a = docs.select(F.nullif(F.col("lang"), F.lit("en")).alias("k"),
                    F.col("doc_id").alias("id_a"))
    b = docs.select(F.nullif(F.col("lang"), F.lit("en")).alias("k"),
                    F.col("doc_id").alias("id_b"))
    q = (a.join(b, a["k"].eqNullSafe(b["k"]))
         .groupBy(a["k"].alias("lang_key"))
         .agg(F.count(F.lit(1)).alias("n_pairs")))
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_binary_hamming(spark, mult: int) -> float:
    """Sign-packed Hamming top-k at mult x corpus: packing is a narrow
    map, distance is codegen XOR/popcount, ranking is
    TakeOrderedAndProject per query — scan-bound."""
    from pinterest_data_pipeline_spark.operators import similarity

    emb = multiply(load_table(spark, SF, "embeddings"), mult, ["vec_id"])
    queries = load_table(spark, SF, "embeddings").filter(F.col("vec_id") < 3)
    q = similarity.hamming_topk(emb, queries, k=10)
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_pattern_match(spark, mult: int) -> float:
    """Capped relational MATCH_RECOGNIZE at mult x events (post-r7-fix
    shape): row_number cap before any collection bounds per-key state at
    512 single-char entries however hot the key."""
    from pinterest_data_pipeline_spark.plans.extensions import pattern_match_journeys

    events = multiply(load_table(spark, SF, "events"), mult, ["event_id", "user_id"])
    q = pattern_match_journeys(events, cap=512)
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_transition_matrix(spark, mult: int) -> float:
    """First-order transition counts at mult x events: one window pass +
    a (types x types)-bounded aggregate."""
    from pyspark.sql import Window

    events = multiply(load_table(spark, SF, "events"), mult, ["event_id", "user_id"])
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    q = (events.withColumn("prev_type", F.lag("event_type").over(w))
         .filter(F.col("prev_type").isNotNull())
         .groupBy("prev_type", F.col("event_type").alias("next_type"))
         .agg(F.count(F.lit(1)).alias("n_transitions")))
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _multiplied_events_dir(spark, mult: int, name: str) -> str:
    """Write mult x events as an sf-shaped dir for the streaming helpers."""
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "spark-warehouse", f"_probe_{name}_{mult}x")
    events = multiply(load_table(spark, SF, "events"), mult, ["event_id", "user_id"])
    events.write.mode("overwrite").parquet(os.path.join(out, "events.parquet"))
    return out


def probe_streaming_outer(spark, mult: int) -> float:
    """Stream-stream LEFT OUTER interval join at mult x events, full
    bounded drive (two data drains + two heartbeat drains). State stays
    at horizon + watermark per side regardless of mult."""
    import shutil

    from pinterest_data_pipeline_spark.streaming.pipeline import (
        availablenow_attribution_outer,
    )

    sf_dir = _multiplied_events_dir(spark, mult, "outer")
    work = os.path.join(sf_dir, "work")
    t0 = time.perf_counter()
    availablenow_attribution_outer(spark, sf_dir, work).write.format(
        "noop"
    ).mode("overwrite").save()
    secs = time.perf_counter() - t0
    shutil.rmtree(sf_dir, ignore_errors=True)
    return secs


def probe_streaming_sessions(spark, mult: int) -> float:
    """Streaming session_window at mult x events, full bounded drive:
    state is the open-session frontier per user."""
    import shutil

    from pinterest_data_pipeline_spark.streaming.pipeline import (
        availablenow_session_rollup,
    )

    sf_dir = _multiplied_events_dir(spark, mult, "sessions")
    work = os.path.join(sf_dir, "work")
    t0 = time.perf_counter()
    availablenow_session_rollup(spark, sf_dir, work).write.format(
        "noop"
    ).mode("overwrite").save()
    secs = time.perf_counter() - t0
    shutil.rmtree(sf_dir, ignore_errors=True)
    return secs


def probe_bloom_prefilter(spark, mult: int) -> float:
    """Bloom build + literal-probe at mult x orders/customers: build is a
    bounded aggregate, probe is whole-stage codegen — scan-bound both
    sides."""
    from pinterest_data_pipeline_spark.operators import bloom

    m_bits, k_hashes = 16384, 3
    orders = multiply(load_table(spark, SF, "orders"), mult, ["o_orderkey", "o_custkey"])
    customer = multiply(load_table(spark, SF, "customer"), mult, ["c_custkey"])
    urgent = (orders.filter(F.col("o_orderpriority") == "1-URGENT")
              .select("o_custkey").distinct())
    t0 = time.perf_counter()
    dense = bloom.bloom_words_literal(
        bloom.bloom_build(urgent, "o_custkey", m_bits, k_hashes), m_bits
    )
    q = customer.select(
        "c_mktsegment",
        bloom.bloom_maybe_expr(F.col("c_custkey"), dense, m_bits, k_hashes).alias("m"),
    ).groupBy("c_mktsegment").agg(F.sum(F.col("m").cast("int")).alias("n_pass"))
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_kmv_union(spark, mult: int) -> float:
    """KMV sketch + union merge at mult x orders: distinct + k-heap
    TakeOrderedAndProject per half."""
    from pinterest_data_pipeline_spark.operators import sketches

    orders = multiply(load_table(spark, SF, "orders"), mult, ["o_orderkey", "o_custkey"])
    even = orders.filter(F.col("o_orderkey") % 2 == 0)
    odd = orders.filter(F.col("o_orderkey") % 2 == 1)
    q = sketches.kmv_estimate(
        sketches.kmv_merge(sketches.kmv_sketch(even, "o_custkey"),
                           sketches.kmv_sketch(odd, "o_custkey")), 64
    )
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_prefix_clusters(spark, mult: int) -> float:
    """Prefix-template clustering at mult x documents: one hash aggregate
    on a 20-token key."""
    docs = multiply(load_table(spark, SF, "documents"), mult, ["doc_id"])
    pref = F.array_join(F.slice(F.split(F.col("text"), " "), 1, 20), " ")
    q = (docs.select(F.col("doc_id"), pref.alias("prefix"))
         .groupBy("prefix")
         .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_docs"))
         .filter(F.col("n_docs") > 1))
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_cdc_apply(spark, mult: int) -> float:
    """Changelog application at mult x orders: WindowGroupLimit rank-1 +
    window count on one key shuffle."""
    from pinterest_data_pipeline_spark.operators import merge as merge_ops

    orders = multiply(load_table(spark, SF, "orders"), mult, ["o_orderkey", "o_custkey"])
    changes = orders.select(
        "o_custkey", "o_orderdate", "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", F.lit("D")).otherwise(F.lit("U")).alias("op"),
        "o_totalprice",
    )
    q = merge_ops.apply_changelog(changes, ["o_custkey"], "op",
                                  ["o_orderdate", "o_orderkey"])
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_user_streaks(spark, mult: int) -> float:
    """Gaps-and-islands streaks at mult x events: distinct days + window
    + two aggregates, all on the user key."""
    from pyspark.sql import Window

    events = multiply(load_table(spark, SF, "events"), mult, ["event_id", "user_id"])
    days = events.select("user_id",
                         F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    sizes = (days.withColumn("island", F.date_sub(F.col("day"), F.row_number().over(w)))
             .groupBy("user_id", "island").agg(F.count(F.lit(1)).alias("streak_days")))
    q = sizes.groupBy("user_id").agg(
        F.sum("streak_days").alias("n_active_days"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("streak_days").alias("longest_streak"),
    )
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_drift_psi(spark, mult: int) -> float:
    """PSI drift at mult x documents: map-side bucket + 9-bin aggregate."""
    from pinterest_data_pipeline_spark.operators.sampling import uniform_hash

    docs = multiply(load_table(spark, SF, "documents"), mult, ["doc_id"])
    side = (uniform_hash(F.col("doc_id"), "psi") % 2).alias("side")
    bin_ = F.least(F.floor(F.col("n_chars") / 64), F.lit(8)).cast("int").alias("bin")
    counts = (docs.select(side, bin_).groupBy("bin")
              .agg(F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).alias("n_ref"),
                   F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).alias("n_cur")))
    t0 = time.perf_counter()
    counts.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0




def probe_ivf_pq(spark, mult: int) -> float:
    """IVFADC at mult x corpus: cell probe prunes to 4/16 of the codes,
    ADC is codegen table lookups, rerank bounded at 200/query."""
    from pinterest_data_pipeline_spark.operators import similarity

    emb = multiply(load_table(spark, SF, "embeddings"), mult, ["vec_id"])
    queries = load_table(spark, SF, "embeddings").filter(F.col("vec_id") < 3)
    cent = similarity.train_ivf_centroids(emb, n_cells=16)
    books = similarity.train_pq_codebooks(emb, n_codes=64)
    q = similarity.ivf_pq_topk(emb, queries, cent, books, k=10, n_probe=4, k_coarse=200)
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_mad_events(spark, mult: int) -> float:
    """Median/MAD outliers at mult x events: two exact-percentile
    aggregates on the type key + broadcast joins."""
    events = multiply(load_table(spark, SF, "events"), mult, ["event_id", "user_id"])
    med = events.groupBy("event_type").agg(F.percentile("value", F.lit(0.5)).alias("med"))
    dev = events.join(F.broadcast(med), "event_type").withColumn(
        "absdev", F.abs(F.col("value") - F.col("med")))
    mad = dev.groupBy("event_type").agg(F.percentile("absdev", F.lit(0.5)).alias("mad"))
    q = (dev.join(F.broadcast(mad), "event_type").groupBy("event_type")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum((F.col("absdev") > F.lit(4.4478) * F.col("mad")).cast("long")).alias("n_outliers")))
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_boilerplate(spark, mult: int) -> float:
    """8-gram boilerplate mining at mult x documents: explode + one hash
    aggregate on short shingle keys."""
    docs = multiply(load_table(spark, SF, "documents"), mult, ["doc_id"])
    n = 8
    grams = F.expr(
        f"transform(slice(split(text, ' '), 1, size(split(text, ' ')) - {n - 1}),"
        f" (x, i) -> array_join(slice(split(text, ' '), i + 1, {n}), ' '))"
    )
    q = (docs.filter(F.size(F.split(F.col("text"), " ")) >= n)
         .select("doc_id", F.explode(grams).alias("ngram"))
         .groupBy("ngram")
         .agg(F.count_distinct("doc_id").alias("doc_freq"), F.count(F.lit(1)).alias("n_occ"))
         .filter(F.col("doc_freq") > 1)
         .orderBy(F.desc("doc_freq"), F.desc("n_occ"), F.asc("ngram")).limit(50))
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0




def _wau_query(pairs: DataFrame) -> DataFrame:
    """The r9 explode-expand WAU shape (VERDICT r8 item 2): exactly 7
    anchor rows per distinct (day, user) pair into one hash aggregate —
    horizon-independent, no BroadcastNestedLoopJoin."""
    return (
        pairs.select(
            F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6))).alias("anchor"),
            "user_id",
        )
        .groupBy("anchor")
        .agg(F.count_distinct("user_id").alias("wau_7d"))
    )


def probe_rolling_wau(spark, mult: int) -> float:
    """Rolling 7-day WAU at mult x events (day horizon FIXED): the
    distinct (day, user) collapse is the only raw-events pass; the
    explode-expand emits 7 rows per pair regardless of horizon."""
    events = multiply(load_table(spark, SF, "events"), mult, ["event_id", "user_id"])
    pairs = events.select(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"), "user_id"
    ).distinct()
    q = _wau_query(pairs)
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_rolling_wau_horizon(spark, mult: int) -> float:
    """Rolling WAU on the HORIZON axis: mult x rows spread over mult x the
    day span (each copy shifted 45 days), the axis the old band join
    degraded on (D x |pairs| predicate evaluations) and the r8 64x probe
    deliberately held fixed. The explode plan's per-row cost is a
    constant 7, so this must scale like probe_rolling_wau at the same
    mult — flat on the horizon, linear only in rows."""
    base = load_table(spark, SF, "events")
    parts = [base]
    for i in range(1, mult):
        parts.append(
            base.withColumn("user_id", F.col("user_id") + i * KEY_STRIDE)
            .withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {i * 45} DAYS"))
        )
    events = parts[0]
    for p in parts[1:]:
        events = events.unionByName(p)
    pairs = events.select(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"), "user_id"
    ).distinct()
    q = _wau_query(pairs)
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_mode_deterministic(spark, mult: int) -> float:
    """Deterministic grouped mode at mult x orders: count aggregate (tiny
    grouping domain, map-side collapse) + WindowGroupLimit rank-1."""
    from pyspark.sql import Window

    orders = multiply(load_table(spark, SF, "orders"), mult, ["o_orderkey", "o_custkey"])
    counts = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("n"), F.asc("o_orderstatus"))
    q = counts.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_asof_tolerance(spark, mult: int) -> float:
    """Tolerance-bounded as-of join at mult x (events + orders): one
    union + per-key window shuffle; the staleness guard is a free
    post-projection."""
    from pinterest_data_pipeline_spark.operators.joins import asof_join

    events = multiply(load_table(spark, SF, "events"), mult, ["event_id", "user_id"])
    orders = multiply(load_table(spark, SF, "orders"), mult, ["o_orderkey", "o_custkey"])
    obs = events.select("event_id", "user_id", F.to_date("ts").alias("obs_date"))
    daily = (
        orders.withColumn("obs_date", F.to_date("o_orderdate"))
        .groupBy("o_custkey", "obs_date")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("day_spend"))
        .withColumn("order_date", F.col("obs_date"))
    )
    out = asof_join(
        obs, daily, on="obs_date", by=("user_id", "o_custkey"),
        value_cols=["order_date", "day_spend"],
    )
    fresh = F.datediff(F.col("obs_date"), F.col("order_date_asof")) <= 7
    q = out.select(
        "event_id",
        F.when(fresh, F.col("day_spend_asof")).alias("day_spend_recent"),
    )
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_tdigest(spark, mult: int) -> float:
    """Global t-digest quantiles at mult x lineitem: per-partition
    digests (constant state per task) -> one tiny merge group."""
    from pinterest_data_pipeline_spark.operators import sketches

    li = multiply(load_table(spark, SF, "lineitem"), mult, ["l_orderkey"])
    vals = li.select(F.col("l_extendedprice").cast("double").alias("v"))
    q = sketches.tdigest_merged_quantiles(
        sketches.tdigest_partials(vals, "v"), [0.5, 0.95, 0.99]
    )
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_tdigest_grouped(spark, mult: int) -> float:
    """Grouped p95 via two-level t-digest at mult x events: map-side
    digests per (partition, type); the type-key shuffle carries
    centroids, not values."""
    from pinterest_data_pipeline_spark.operators import sketches

    ev = multiply(load_table(spark, SF, "events"), mult, ["event_id", "user_id"])
    src = ev.select("event_type", F.col("value").cast("double").alias("v"))
    q = sketches.tdigest_grouped_quantile(
        sketches.tdigest_grouped_partials(src, "event_type", "v"), "event_type", 0.95
    )
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_rolling_p95(spark, mult: int) -> float:
    """Rolling trailing-7-day p95 from merged daily t-digests at mult x
    events — the OPERATOR path only (daily digests -> explode-expand
    centroids -> per-anchor merge+estimate); the exact certification edge
    is excluded, as it would be at 100 TB."""
    from pinterest_data_pipeline_spark.operators import sketches

    ev = multiply(load_table(spark, SF, "events"), mult, ["event_id", "user_id"])
    src = ev.select(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
        F.col("value").cast("double").alias("v"),
    )
    daily = sketches.tdigest_grouped_partials(src, "day", "v")
    expanded = daily.select(
        F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6))).alias("anchor"),
        "mean",
        "weight",
    )
    q = sketches.tdigest_grouped_quantile(expanded, "anchor", 0.95)
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_jaccard_prefix(spark, mult: int) -> float:
    """Exact prefix-filtered Jaccard join at mult x documents. Plain
    ``multiply`` would copy IDENTICAL text, merging every duplicate
    family across copies and growing the qualifying-pair set
    QUADRATICALLY in mult — that models re-crawling the same corpus, not
    corpus growth. Tagging every token with its copy index gives each
    copy a disjoint token universe: families stay within-copy, true
    pairs grow linearly, and the probe measures the operator (whose
    candidate volume tracks true pairs), not the output explosion."""
    from pinterest_data_pipeline_spark.operators import dedup

    base = load_table(spark, SF, "documents").select("doc_id", "text")
    parts = []
    for i in range(mult):
        parts.append(
            base.select(
                (F.col("doc_id") + i * KEY_STRIDE).alias("doc_id"),
                F.regexp_replace(F.col("text"), r"(\S+)", f"c{i}_$1").alias("text"),
            )
        )
    docs = parts[0]
    for p in parts[1:]:
        docs = docs.unionByName(p)
    q = dedup.jaccard_threshold_join(docs, "doc_id", "text", threshold=0.6)
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_weighted_median(spark, mult: int) -> float:
    """Exact weighted median at mult x lineitem — RESHAPED (r10): a
    fully-parallel map-side-combinable groupBy(key, price) collapses the
    row volume BEFORE the cumulative window, so the single-task per-key
    sort covers distinct prices (fixed domain, ~130k/flag) while rows
    grow mult x. The r9 shape sorted every ROW in one task per flag
    (93x wall at 256x); this shape's window input is scale-invariant —
    only the pre-aggregation grows, and it parallelizes."""
    from pyspark.sql import Window

    li = (
        multiply(load_table(spark, SF, "lineitem"), mult, ["l_orderkey"])
        .select(
            "l_returnflag",
            "l_extendedprice",
            F.col("l_quantity").cast("long").alias("qty"),
        )
        .groupBy("l_returnflag", "l_extendedprice")
        .agg(F.sum("qty").alias("qty"))
    )
    order = [F.col("l_extendedprice")]
    w_cum = (
        Window.partitionBy("l_returnflag").orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    q = (
        li.withColumn("cum", F.sum("qty").over(w_cum))
        .withColumn("tot", F.sum("qty").over(Window.partitionBy("l_returnflag")))
        .filter(2 * F.col("cum") >= F.col("tot"))
        .withColumn(
            "rk",
            F.row_number().over(Window.partitionBy("l_returnflag").orderBy(*order)),
        )
        .filter(F.col("rk") == 1)
    )
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_winnow(spark, mult: int) -> float:
    """Winnowing fingerprint extraction + stop-filter + pair join at
    mult x documents (copy-tagged tokens, same rationale as
    probe_jaccard_prefix: corpus growth, not a re-crawl)."""
    from pinterest_data_pipeline_spark.operators import text as text_ops

    base = load_table(spark, SF, "documents").select("doc_id", "text")
    parts = []
    for i in range(mult):
        parts.append(
            base.select(
                (F.col("doc_id") + i * KEY_STRIDE).alias("doc_id"),
                F.regexp_replace(F.col("text"), r"(\S+)", f"c{i}_$1").alias("text"),
            )
        )
    docs = parts[0]
    for p in parts[1:]:
        docs = docs.unionByName(p)
    fps = text_ops.winnowing_fingerprints(docs, "doc_id", "text", k=5, w=4)
    rare = fps.groupBy("fingerprint").agg(F.count(F.lit(1)).alias("n")).filter(
        F.col("n") <= 50
    )
    kept = fps.join(rare.select("fingerprint"), "fingerprint")
    a = kept.select(F.col("doc_id").alias("id_a"), "fingerprint")
    b = kept.select(F.col("doc_id").alias("id_b"), "fingerprint")
    q = (
        a.join(b, "fingerprint")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 3)
    )
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_wau_kmv(spark, mult: int) -> float:
    """Rolling WAU from merged daily KMV sketches at mult x events —
    sketch path only (daily k-smallest -> explode-expand -> per-anchor
    k-smallest -> estimate); the exact count_distinct edge is excluded,
    as it would be at 100 TB. Post-collapse cost is days x k rows."""
    from pyspark.sql import Window

    from pinterest_data_pipeline_spark.operators.sampling import uniform_hash

    k = 256
    events = multiply(load_table(spark, SF, "events"), mult, ["event_id", "user_id"])
    pairs = events.select(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"), "user_id"
    ).distinct()
    hashes = pairs.select(
        "day", uniform_hash(F.col("user_id"), "kmvwau").alias("h")
    ).distinct()
    w_day = Window.partitionBy("day").orderBy(F.col("h").asc())
    daily = (
        hashes.withColumn("rk", F.row_number().over(w_day))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )
    expanded = daily.select(
        F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6))).alias("anchor"),
        "h",
    ).distinct()
    w_anchor = Window.partitionBy("anchor").orderBy(F.col("h").asc())
    q = (
        expanded.withColumn("rk", F.row_number().over(w_anchor))
        .filter(F.col("rk") <= k)
        .groupBy("anchor")
        .agg(F.count(F.lit(1)).alias("n_sketch"), F.max("h").alias("h_k"))
    )
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_budget_mix(spark, mult: int) -> float:
    """Token-budget mixing at mult x documents: per-group window cumsum
    over hash order + crossing filter — one group-key shuffle."""
    from pyspark.sql import Window

    from pinterest_data_pipeline_spark.operators.sampling import uniform_hash

    docs = multiply(load_table(spark, SF, "documents"), mult, ["doc_id"])
    h = uniform_hash(F.col("doc_id"), "mix")
    w = (
        Window.partitionBy("lang")
        .orderBy(h.asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    q = (
        docs.withColumn("cum_chars", F.sum(F.col("n_chars")).over(w))
        .filter(F.col("cum_chars") - F.col("n_chars") < 30_000)
        .select("doc_id", "lang", "cum_chars")
    )
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_multi_draw(spark, mult: int) -> float:
    """Per-group weighted draw at mult x documents: one group-key shuffle
    with WindowGroupLimit capping at rank 20."""
    from pinterest_data_pipeline_spark.operators import sampling

    docs = multiply(load_table(spark, SF, "documents"), mult, ["doc_id"])
    q = sampling.weighted_sample_per_group(docs, "lang", "doc_id", "n_chars", n=20)
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_weighted_tdigest(spark, mult: int) -> float:
    """Weighted t-digest p50 of price (qty mass) at mult x lineitem: the
    sketch twin of probe_weighted_median — per-partition weighted digests
    (fully parallel mapInPandas), one centroid-only merge. Wall-clock
    should track the scan, never a sort."""
    from pinterest_data_pipeline_spark.operators import sketches

    li = multiply(load_table(spark, SF, "lineitem"), mult, ["l_orderkey"]).select(
        F.col("l_extendedprice").cast("double").alias("v"),
        F.col("l_quantity").cast("double").alias("w"),
    )
    q = sketches.tdigest_merged_quantiles(
        sketches.tdigest_partials(li, "v", weight_col="w"), [0.5]
    )
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_filtered_ann(spark, mult: int) -> float:
    """Filtered IVF at mult x corpus: the label predicate lands BEFORE
    cell assignment, so the probe cost scales with the FILTERED corpus —
    the pre-filter shape's whole point."""
    from pinterest_data_pipeline_spark.operators import similarity

    emb = multiply(load_table(spark, SF, "embeddings"), mult, ["vec_id"])
    queries = load_table(spark, SF, "embeddings").filter(F.col("vec_id") < 3)
    cent = similarity.train_ivf_centroids(emb, n_cells=16)
    filtered = emb.filter(F.col("label") % 2 == 0)
    q = similarity.ivf_topk(filtered, queries, cent, k=10, n_probe=4)
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_cdc_scd2(spark, mult: int) -> float:
    """CDC -> SCD2 roundtrip at mult x customer: two key-partitioned
    full-outer diffs + replay window + history window, all on c_custkey."""
    from pinterest_data_pipeline_spark.operators.merge import (
        apply_changelog,
        scd2_history,
        snapshot_diff,
    )

    customer = multiply(load_table(spark, SF, "customer"), mult, ["c_custkey"])
    s1 = customer.select("c_custkey", "c_mktsegment")
    s2 = customer.select(
        "c_custkey",
        F.when(
            F.col("c_custkey") % 3 == 0,
            F.concat(F.lit("NEW-"), F.col("c_mktsegment")),
        )
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    )
    cl1 = s1.select(
        "c_custkey",
        F.lit("I").alias("op"),
        F.lit("2020-01-01").cast("date").alias("ts"),
        "c_mktsegment",
    )
    diff = snapshot_diff(s1, s2, ["c_custkey"]).select(
        "c_custkey",
        F.lit("U").alias("op"),
        F.lit("2020-06-01").cast("date").alias("ts"),
        F.col("new_c_mktsegment").alias("c_mktsegment"),
    )
    feed = cl1.unionByName(diff)
    replayed = apply_changelog(feed, ["c_custkey"], "op", ["ts"]).select(
        "c_custkey", F.col("c_mktsegment").alias("segment_replayed")
    )
    versions = s1.withColumn("snap_ts", F.lit("2020-01-01").cast("date")).unionByName(
        s2.withColumn("snap_ts", F.lit("2020-06-01").cast("date"))
    )
    current = (
        scd2_history(versions, "c_custkey", "snap_ts", ["c_mktsegment"])
        .filter(F.col("is_current"))
        .select("c_custkey", F.col("c_mktsegment").alias("segment_direct"))
    )
    q = replayed.join(current, "c_custkey").filter(
        ~F.col("segment_replayed").eqNullSafe(F.col("segment_direct"))
    )
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0




def probe_sparse_cosine(spark, mult: int) -> float:
    """Sparse shingle-TF cosine join at mult x documents (copy-tagged
    tokens, same rationale as probe_jaccard_prefix: corpus growth, not a
    re-crawl — each copy gets a disjoint shingle universe so true pairs
    grow linearly and the inverted-index join is what's measured)."""
    from pinterest_data_pipeline_spark.operators import similarity

    base = load_table(spark, SF, "documents").select("doc_id", "text")
    parts = []
    for i in range(mult):
        parts.append(
            base.select(
                (F.col("doc_id") + i * KEY_STRIDE).alias("doc_id"),
                F.regexp_replace(F.col("text"), r"(\S+)", f"c{i}_$1").alias("text"),
            )
        )
    docs = parts[0]
    for p in parts[1:]:
        docs = docs.unionByName(p)
    pairs = similarity.sparse_cosine_pairs(
        docs, "doc_id", "text", threshold=0.1, max_df=50, ngram=3
    )
    q = pairs.groupBy((F.floor(F.col("cosine") * 10)).alias("b")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("dot").alias("s")
    )
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_market_basket(spark, mult: int) -> float:
    """Market-basket pair mining at mult x lineitem (orders multiplied on
    the order key: MORE baskets of the same size — the per-order pair
    fan-out stays O(basket^2) while pair-count aggregation scales)."""
    li = multiply(
        load_table(spark, SF, "lineitem").select("l_orderkey", "l_partkey"),
        mult,
        ["l_orderkey"],
    )
    from pinterest_data_pipeline_spark.plans.extensions import _mineable_baskets
    baskets = _mineable_baskets(li)  # hot-basket guard: probe == operator posture
    totals = baskets.agg(F.count_distinct("l_orderkey").alias("n_orders"))
    item = baskets.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c_item"))
    pairs = (
        baskets.select("l_orderkey", F.col("l_partkey").alias("part_a"))
        .join(
            baskets.select("l_orderkey", F.col("l_partkey").alias("part_b")),
            "l_orderkey",
        )
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("c_pair"))
        .filter(F.col("c_pair") >= 2)
    )
    q = (
        pairs.join(
            item.select(F.col("l_partkey").alias("part_a"), F.col("c_item").alias("c_a")),
            "part_a",
        )
        .join(
            item.select(F.col("l_partkey").alias("part_b"), F.col("c_item").alias("c_b")),
            "part_b",
        )
        .crossJoin(totals)
        .withColumn(
            "lift",
            F.round(
                (F.col("c_pair") * F.col("n_orders")).cast("double")
                / (F.col("c_a") * F.col("c_b")),
                4,
            ),
        )
        .orderBy(F.desc("lift"), F.asc("part_a"), F.asc("part_b"))
        .limit(20)
    )
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_kmv_overlap(spark, mult: int) -> float:
    """KMV set-overlap at mult x orders (custkeys multiplied: the distinct
    sets grow with data; the sketch math stays 3k rows regardless)."""
    from pinterest_data_pipeline_spark.operators import sketches

    k = 256
    orders = multiply(
        load_table(spark, SF, "orders").select("o_custkey", "o_orderdate"),
        mult,
        ["o_custkey"],
    )
    a = orders.filter(F.year("o_orderdate") == 1995)
    b = orders.filter(F.year("o_orderdate") == 1996)
    ska = sketches.kmv_sketch(a, "o_custkey", k=k, salt="kmvov")
    skb = sketches.kmv_sketch(b, "o_custkey", k=k, salt="kmvov")
    sku = sketches.kmv_merge(ska, skb, k=k)
    stats = sku.agg(F.count(F.lit(1)).alias("n_u"), F.max("h").alias("h_k"))
    m = sku.join(ska, "h").join(skb, "h").agg(F.count(F.lit(1)).alias("m"))
    q = stats.crossJoin(m)
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0



def probe_jl_projection(spark, mult: int) -> float:
    """JL projection at mult x embeddings: pure map-side integer
    arithmetic — wall should track the scan exactly."""
    from pinterest_data_pipeline_spark.operators import similarity

    emb = multiply(load_table(spark, SF, "embeddings"), mult, ["vec_id"])
    proj = similarity.jl_project_quantized(emb.select("vec_id", "embedding", "label"))
    q = proj.select("label", F.posexplode("proj").alias("pos", "comp")).groupBy(
        "label", "pos"
    ).agg(F.sum("comp").alias("s"), F.count(F.lit(1)).alias("n"))
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_percent_rank(spark, mult: int) -> float:
    """Global percent rank at mult x lineitem with the PRICE DOMAIN
    tiled alongside (round 11: distinct prices track sample cardinality
    until the value domain saturates, so the probe grows both): the
    rank table now runs through two_phase_running's $100 buckets — the
    serial step is one row per occupied bucket, never per distinct
    value."""
    from pinterest_data_pipeline_spark.operators.ranking import (
        two_phase_running,
    )

    width = 105_000.0  # price domain width of l_extendedprice
    base = multiply(
        load_table(spark, SF, "lineitem").select("l_returnflag", "l_extendedprice", "l_orderkey"),
        mult,
        ["l_orderkey"],
    )
    li = base.select(
        "l_returnflag",
        (
            F.col("l_extendedprice")
            + (F.floor(F.col("l_orderkey") / KEY_STRIDE) * width)
        ).alias("l_extendedprice"),
    )
    counts = li.groupBy("l_extendedprice").agg(F.count(F.lit(1)).alias("cnt"))
    ranked = two_phase_running(
        counts,
        F.floor(F.col("l_extendedprice") / 100).cast("long"),
        ["l_extendedprice"],
        [("cnt", "sum", "cum")],
        current_row=True,
    ).select("l_extendedprice", (F.col("cum") - F.col("cnt")).alias("rank_lt"))
    total = li.agg(F.count(F.lit(1)).alias("n_total"))
    q = (
        li.join(ranked, "l_extendedprice")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("rank_lt").alias("s"))
        .crossJoin(total)
    )
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0



def probe_deletion_join(spark, mult: int) -> float:
    """FastSS deletion-neighborhood join at mult x distinct part names
    (copy-tagged prefixes keep families within-copy; every copy plants
    its own typo population, so true pairs grow linearly)."""
    from pinterest_data_pipeline_spark.operators.joins import (
        deletion_neighborhood_join,
    )
    from pinterest_data_pipeline_spark.operators.sampling import uniform_hash

    base = load_table(spark, SF, "part").select(
        F.col("p_name").alias("name")
    ).distinct()
    parts = []
    for i in range(mult):
        parts.append(base.select(F.concat(F.lit(f"c{i}_"), F.col("name")).alias("name")))
    names = parts[0]
    for q in parts[1:]:
        names = names.unionByName(q)
    typos = names.filter(uniform_hash(F.col("name"), "typo") % 8 == 0).select(
        F.concat(F.col("name"), F.lit("x")).alias("name")
    )
    corpus = names.unionByName(typos).distinct()
    q = deletion_neighborhood_join(corpus, "name")
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0



def probe_triangles(spark, mult: int) -> float:
    """Degree-oriented triangle count at mult x lineitem (orders axis:
    more baskets -> denser support-2 co-occurrence graph; the oriented
    wedge join's fan-out stays bounded by out-degree)."""
    li = multiply(
        load_table(spark, SF, "lineitem").select("l_orderkey", "l_partkey"),
        mult,
        ["l_orderkey"],
    )
    from pinterest_data_pipeline_spark.plans.extensions import _mineable_baskets
    baskets = _mineable_baskets(li)  # hot-basket guard: probe == operator posture
    edges = (
        baskets.select("l_orderkey", F.col("l_partkey").alias("a"))
        .join(baskets.select("l_orderkey", F.col("l_partkey").alias("b")), "l_orderkey")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select("a", "b")
    )
    deg = (
        edges.select(F.col("a").alias("n"))
        .unionByName(edges.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    keyed = deg.select("n", (F.col("deg") * F.lit(1 << 40) + F.col("n")).alias("okey"))
    ek = (
        edges.join(keyed.withColumnRenamed("n", "a").withColumnRenamed("okey", "ka"), "a")
        .join(keyed.withColumnRenamed("n", "b").withColumnRenamed("okey", "kb"), "b")
        .select(
            F.when(F.col("ka") < F.col("kb"), F.col("ka")).otherwise(F.col("kb")).alias("src"),
            F.when(F.col("ka") < F.col("kb"), F.col("kb")).otherwise(F.col("ka")).alias("dst"),
        )
    )
    wedges = (
        ek.alias("x").join(ek.alias("y"), F.col("x.src") == F.col("y.src"))
        .filter(F.col("x.dst") < F.col("y.dst"))
        .select(F.col("x.dst").alias("src"), F.col("y.dst").alias("dst"))
    )
    q = wedges.join(ek, ["src", "dst"]).agg(F.count(F.lit(1)).alias("t"))
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_bm25(spark, mult: int) -> float:
    """BM25 scoring at mult x documents (corpus axis): df/avgdl aggregates
    and the query-term postings probe all grow linearly; top-k stays a
    TakeOrderedAndProject."""
    from pinterest_data_pipeline_spark.operators import text

    docs = multiply(
        load_table(spark, SF, "documents").select("doc_id", "text"),
        mult,
        ["doc_id"],
    )
    k1, b = 1.2, 0.75
    toks = docs.select(
        "doc_id",
        F.size(text.tokens(F.col("text"))).cast("long").alias("dl"),
        F.explode(text.tokens(F.col("text"))).alias("term"),
    )
    postings = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl")
    )
    dfreq = (
        toks.select("doc_id", "term").distinct()
        .groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    )
    qterms = dfreq.orderBy(F.desc("doc_freq"), F.asc("term")).limit(5)
    stats = docs.select(
        F.size(text.tokens(F.col("text"))).cast("long").alias("dl")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    idf = F.log(
        (F.col("n_docs") - F.col("doc_freq") + F.lit(0.5))
        / (F.col("doc_freq") + F.lit(0.5)) + F.lit(1.0)
    )
    per_term = (
        postings.join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (idf * (F.col("tf") * (k1 + 1.0))
             / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
             ).alias("term_score"),
        )
    )
    q = (
        per_term.groupBy("doc_id")
        .agg(F.round(F.sum("term_score"), 4).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id")).limit(20)
    )
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_pagerank(spark, mult: int) -> float:
    """3-iteration PageRank at mult x lineitem (same co-occurrence graph
    axis as the triangles probe: denser support-2 graph)."""
    li = multiply(
        load_table(spark, SF, "lineitem").select("l_orderkey", "l_partkey"),
        mult,
        ["l_orderkey"],
    )
    from pinterest_data_pipeline_spark.plans.extensions import _mineable_baskets
    baskets = _mineable_baskets(li)  # hot-basket guard: probe == operator posture
    edges = (
        baskets.select("l_orderkey", F.col("l_partkey").alias("a"))
        .join(baskets.select("l_orderkey", F.col("l_partkey").alias("b")), "l_orderkey")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select("a", "b")
    )
    dir_edges = edges.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionByName(edges.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    deg = dir_edges.groupBy(F.col("src").alias("n")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    ncnt = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    nodes = deg.crossJoin(F.broadcast(ncnt))
    ranks = nodes.select(
        "n", "deg", "n_nodes", (F.lit(1.0) / F.col("n_nodes")).alias("r")
    )
    for _ in range(3):
        contrib = (
            ranks.select(F.col("n").alias("src"), (F.col("r") / F.col("deg")).alias("c"))
            .join(dir_edges, "src")
            .groupBy("dst").agg(F.sum("c").alias("contrib"))
        )
        ranks = nodes.join(contrib, nodes["n"] == contrib["dst"], "left").select(
            nodes["n"], nodes["deg"], nodes["n_nodes"],
            (F.lit(0.15) / F.col("n_nodes")
             + F.lit(0.85) * F.coalesce(F.col("contrib"), F.lit(0.0))).alias("r"),
        )
    q = ranks.orderBy(F.desc(F.round(F.col("r"), 6)), F.asc("n")).limit(20)
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_equidepth(spark, mult: int) -> float:
    """Equi-depth octile binning at mult x orders: one exact-percentile
    aggregate + one broadcast bucket probe."""
    orders = multiply(load_table(spark, SF, "orders"), mult, ["o_orderkey"])
    cents = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    qs = [i / 8.0 for i in range(1, 8)]
    bounds = cents.agg(
        F.transform(
            F.percentile(F.col("cents"), F.array(*[F.lit(x) for x in qs])),
            lambda v: F.round(v).cast("long"),
        ).alias("bnds")
    )
    q = (
        cents.crossJoin(F.broadcast(bounds))
        .select(
            "cents",
            (F.aggregate(
                F.col("bnds"), F.lit(0),
                lambda acc, bnd: acc + F.when(F.col("cents") > bnd, F.lit(1)).otherwise(F.lit(0)),
            ) + F.lit(1)).alias("bin_id"),
        )
        .groupBy("bin_id")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_interval_join(spark, mult: int) -> float:
    """Bucketed interval join at mult x lineitem (points axis: matched
    pairs grow linearly with shipments; the window side is fixed — at a
    fixed date range, multiplying BOTH sides would inflate pair volume
    quadratically, which no real scale-up does)."""
    epoch = F.lit("1970-01-01").cast("date")
    orders = load_table(spark, SF, "orders")
    windows = orders.filter(F.col("o_orderkey") % 97 == 0).select(
        F.col("o_orderkey").alias("window_id"),
        F.to_date("o_orderdate").alias("lo"),
        F.date_add(F.to_date("o_orderdate"), 14).alias("hi"),
    )
    wk = lambda c: F.floor(F.datediff(c, epoch) / 7)  # noqa: E731
    w_buckets = windows.select(
        "window_id", "lo", "hi",
        F.explode(F.sequence(wk(F.col("lo")), wk(F.col("hi")))).alias("wkb"),
    )
    li = multiply(
        load_table(spark, SF, "lineitem").select("l_orderkey", "l_shipdate", "l_extendedprice"),
        mult,
        ["l_orderkey"],
    )
    points = li.select(
        F.to_date("l_shipdate").alias("ship_date"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    ).select("ship_date", "cents", wk(F.col("ship_date")).alias("wkb"))
    matched = (
        w_buckets.join(points, "wkb")
        .filter((F.col("ship_date") >= F.col("lo")) & (F.col("ship_date") < F.col("hi")))
        .groupBy("window_id")
        .agg(F.count(F.lit(1)).alias("n_shipped"), F.sum("cents").alias("cents"))
    )
    q = windows.join(matched, "window_id", "left")
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_kmeans(spark, mult: int) -> float:
    """Quantized 2-iteration k-means at mult x embeddings: every stage is
    a pos- or vec-keyed partial agg / broadcast join; the centroid frame
    stays k x dim rows at any corpus size."""
    from pinterest_data_pipeline_spark.operators import similarity

    emb = multiply(
        load_table(spark, SF, "embeddings").select("vec_id", "embedding"),
        mult,
        ["vec_id"],
    )
    vecs = emb.select(
        "vec_id",
        F.posexplode(similarity.quantize(F.col("embedding"))).alias("pos", "val"),
    )
    cent = vecs.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("cluster_id"), "pos", F.col("val").alias("code")
    )

    def assign(centroids):
        from pyspark.sql import Window
        d2 = (F.col("val") - F.col("code")) * (F.col("val") - F.col("code"))
        dist = (
            vecs.join(F.broadcast(centroids), "pos")
            .groupBy("vec_id", "cluster_id")
            .agg(F.sum(d2).alias("sqdist"))
        )
        w = Window.partitionBy("vec_id").orderBy(F.asc("sqdist"), F.asc("cluster_id"))
        return (
            dist.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "cluster_id", "sqdist")
        )

    for _ in range(2):
        members = assign(cent).select("vec_id", "cluster_id")
        # members is one row per VECTOR — corpus-sized; never let the
        # static planner broadcast it (the sparse-cosine lesson): pin the
        # vec-keyed shuffle join
        cent = (
            vecs.join(members.hint("shuffle_hash"), "vec_id")
            .groupBy("cluster_id", "pos")
            .agg(F.round(F.avg("val")).cast("long").alias("code"))
        )
    q = assign(cent).groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("sqdist").alias("inertia")
    )
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_bfs(spark, mult: int) -> float:
    """3-hop BFS at mult x lineitem (denser co-occurrence graph — same
    axis as triangles/pagerank)."""
    li = multiply(
        load_table(spark, SF, "lineitem").select("l_orderkey", "l_partkey"),
        mult,
        ["l_orderkey"],
    )
    from pinterest_data_pipeline_spark.plans.extensions import _mineable_baskets
    baskets = _mineable_baskets(li)  # hot-basket guard: probe == operator posture
    edges = (
        baskets.select("l_orderkey", F.col("l_partkey").alias("a"))
        .join(baskets.select("l_orderkey", F.col("l_partkey").alias("b")), "l_orderkey")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select("a", "b")
    )
    dir_edges = edges.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        edges.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    seed = dir_edges.select(F.col("src").alias("n")).distinct().agg(F.min("n").alias("n"))
    reached = F.broadcast(seed).select("n", F.lit(0).alias("dist"))
    for _ in range(3):
        expanded = reached.join(dir_edges, reached["n"] == dir_edges["src"]).select(
            F.col("dst").alias("n"), (F.col("dist") + 1).alias("dist")
        )
        reached = reached.unionByName(expanded).groupBy("n").agg(F.min("dist").alias("dist"))
    q = reached.groupBy("dist").agg(F.count(F.lit(1)).alias("c"), F.sum("n").alias("s"))
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_triples(spark, mult: int) -> float:
    """Apriori-pruned frequent triples at mult x lineitem (orders axis:
    basket-size bound keeps per-order fan-out O(basket^3))."""
    li = multiply(
        load_table(spark, SF, "lineitem").select("l_orderkey", "l_partkey"),
        mult,
        ["l_orderkey"],
    )
    from pinterest_data_pipeline_spark.plans.extensions import _mineable_baskets
    baskets = _mineable_baskets(li)  # hot-basket guard: probe == operator posture
    item = baskets.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c_item"))
    frequent = baskets.join(
        item.filter(F.col("c_item") >= 2).select("l_partkey"), "l_partkey"
    )
    pair_occ = (
        frequent.select("l_orderkey", F.col("l_partkey").alias("part_a"))
        .join(frequent.select("l_orderkey", F.col("l_partkey").alias("part_b")), "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
    )
    freq_pairs = (
        pair_occ.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("c_pair"))
        .filter(F.col("c_pair") >= 2)
        .select("part_a", "part_b")
    )
    pruned_occ = pair_occ.join(freq_pairs, ["part_a", "part_b"], "left_semi")
    q = (
        pruned_occ.join(
            frequent.select("l_orderkey", F.col("l_partkey").alias("part_c")),
            "l_orderkey",
        )
        .filter(F.col("part_b") < F.col("part_c"))
        .groupBy("part_a", "part_b", "part_c")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 2)
    )
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_clamped_balance(spark, mult: int) -> float:
    """Floor-at-zero running balance at mult x lineitem (part axis: more
    keys, constant rows per key — the partition-friendly direction)."""
    from pyspark.sql import Window

    li = multiply(
        load_table(spark, SF, "lineitem").select(
            "l_partkey", "l_orderkey", "l_linenumber", "l_shipdate",
            "l_quantity", "l_returnflag"
        ),
        mult,
        ["l_partkey", "l_orderkey"],
    ).select(
        "l_partkey", "l_orderkey", "l_linenumber",
        F.to_date("l_shipdate").alias("d"),
        F.when(F.col("l_returnflag") == "R", F.col("l_quantity").cast("long"))
        .otherwise(-F.col("l_quantity").cast("long")).alias("delta"),
    )
    w = Window.partitionBy("l_partkey").orderBy(
        "d", "l_orderkey", "l_linenumber"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = li.withColumn("p", F.sum("delta").over(w)).withColumn(
        "m", F.least(F.min("p").over(w), F.lit(0))
    )
    q = cum.withColumn("bal", F.col("p") - F.col("m")).groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_moves"),
        (F.sum("delta") - F.least(F.min("p"), F.lit(0))).alias("final_balance"),
        F.max("bal").alias("peak_balance"),
        F.sum(F.when((F.col("bal") == 0) & (F.col("delta") < 0), 1)
              .otherwise(0)).alias("n_stockouts"),
    )
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_rfm(spark, mult: int) -> float:
    """RFM quartile segmentation at mult x orders (customer axis): the
    percentile boundaries stay one distributed aggregate + broadcast."""
    orders = multiply(
        load_table(spark, SF, "orders").select(
            "o_custkey", "o_totalprice", "o_orderdate"
        ),
        mult,
        ["o_custkey"],
    )
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("mon_cents"),
        F.max(F.to_date("o_orderdate")).alias("last_d"),
    )
    anchor = orders.agg(F.max(F.to_date("o_orderdate")).alias("g_max"))
    rfm = per_cust.crossJoin(F.broadcast(anchor)).select(
        "freq", "mon_cents",
        F.datediff(F.col("g_max"), F.col("last_d")).alias("rec_days"),
    )
    bounds = rfm.agg(
        *[F.percentile(F.col(c), F.lit(q)).alias(f"{c}_{int(q * 100)}")
          for c in ("rec_days", "freq", "mon_cents")
          for q in (0.25, 0.5, 0.75)]
    )
    scored = rfm.crossJoin(F.broadcast(bounds)).select(
        "mon_cents",
        (F.lit(1)
         + F.when(F.col("rec_days") <= F.col("rec_days_75"), 1).otherwise(0)
         + F.when(F.col("rec_days") <= F.col("rec_days_50"), 1).otherwise(0)
         + F.when(F.col("rec_days") <= F.col("rec_days_25"), 1).otherwise(0)
         ).alias("r_score"),
        (F.lit(1)
         + F.when(F.col("freq") > F.col("freq_25"), 1).otherwise(0)
         + F.when(F.col("freq") > F.col("freq_50"), 1).otherwise(0)
         + F.when(F.col("freq") > F.col("freq_75"), 1).otherwise(0)
         ).alias("f_score"),
        (F.lit(1)
         + F.when(F.col("mon_cents") > F.col("mon_cents_25"), 1).otherwise(0)
         + F.when(F.col("mon_cents") > F.col("mon_cents_50"), 1).otherwise(0)
         + F.when(F.col("mon_cents") > F.col("mon_cents_75"), 1).otherwise(0)
         ).alias("m_score"),
    )
    q = scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("mon_cents").alias("seg_cents"),
    )
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_spearman(spark, mult: int) -> float:
    """Exact Spearman at mult x part: values repeat across copies so the
    distinct-value rank tables stay DOMAIN-sized while counts multiply."""
    from pyspark.sql import Window

    part = multiply(
        load_table(spark, SF, "part").select(
            "p_partkey", "p_size", "p_retailprice"
        ),
        mult,
        ["p_partkey"],
    ).select(
        F.col("p_size").cast("long").alias("x"),
        F.round(F.col("p_retailprice") * 100).cast("long").alias("y"),
    )

    def rank2(df, col):
        counts = df.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
        w = Window.orderBy(col).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return counts.withColumn("cum", F.sum("cnt").over(w)).select(
            col,
            (2 * (F.col("cum") - F.col("cnt")) + F.col("cnt") + 1).alias(f"r2_{col}"),
        )

    ranked = part.join(F.broadcast(rank2(part, "x")), "x").join(
        rank2(part, "y"), "y"
    )
    q = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("r2_x").alias("sx"), F.sum("r2_y").alias("sy"),
        F.sum(F.col("r2_x") * F.col("r2_y")).alias("sxy"),
        F.sum(F.col("r2_x") * F.col("r2_x")).alias("sxx"),
        F.sum(F.col("r2_y") * F.col("r2_y")).alias("syy"),
    )
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_bootstrap(spark, mult: int) -> float:
    """Poisson bootstrap at mult x orders: the x50 explode rides one scan,
    weights stay integer CASE arms, the final stage is 50 rows."""
    orders = multiply(
        load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice"),
        mult,
        ["o_orderkey"],
    ).select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    TH = [1580030168, 3160060337, 3950075421, 4213413783, 4279248373]
    rep = orders.select(
        "o_orderkey", "cents",
        F.explode(F.sequence(F.lit(1), F.lit(50))).alias("b"),
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("o_orderkey").cast("string"),
                           F.lit("-boot-"), F.col("b").cast("string"))),
            1, 8),
        16, 10,
    ).cast("long")
    w = (F.when(h < TH[0], 0).when(h < TH[1], 1).when(h < TH[2], 2)
         .when(h < TH[3], 3).when(h < TH[4], 4).otherwise(5))
    q = rep.withColumn("w", w).groupBy("b").agg(
        F.sum(F.col("w") * F.col("cents")).alias("wsum"),
        F.sum("w").alias("wn"),
    )
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0




def probe_bitmap_retention(spark, mult: int) -> float:
    """Bitmap retention at mult x events on the USER axis: more users =
    more (day, word) bitmap rows; the fold stays 63 users/row."""
    ev = multiply(
        load_table(spark, SF, "events").select("user_id", "ts"),
        mult, ["user_id"],
    ).select(
        F.to_date("ts").alias("day"),
        F.expr("user_id div 63").cast("long").alias("word"),
        F.expr("shiftleft(1L, CAST(user_id % 63 AS INT))").alias("bit"),
    )
    words = ev.groupBy("day", "word").agg(F.bit_or("bit").alias("bits"))
    active = words.groupBy("day").agg(
        F.sum(F.bit_count("bits")).alias("n_active"))
    later = words.select(
        F.col("day").alias("day_b"), "word", F.col("bits").alias("bits_b"))
    ret = (
        words.withColumn("offset", F.explode(F.array(F.lit(1), F.lit(7))))
        .withColumn("day_b", F.date_add("day", F.col("offset")))
        .join(later, ["day_b", "word"])
        .groupBy("day", "offset")
        .agg(F.sum(F.bit_count(F.col("bits").bitwiseAND(F.col("bits_b"))))
             .alias("n_retained"))
    )
    q = ret.join(active, "day")
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _max_concurrency_query(events):
    """Sweep-line concurrency query body shared by the user-axis and
    horizon-axis probes (mirrors events_max_concurrency_daily)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_us = F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(
        prev_us.isNull()
        | (F.unix_micros(F.col("ts")) - prev_us > 21600000000), 1
    ).otherwise(0)
    sessions = (
        events.withColumn("is_new", is_new)
        .withColumn("seq", F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "seq")
        .agg(F.unix_micros(F.min("ts")).alias("s"),
             F.unix_micros(F.max("ts")).alias("e"))
    )
    deltas = sessions.select(F.col("s").alias("us"), F.lit(1).alias("d")) \
        .unionAll(sessions.select((F.col("e") + 1).alias("us"),
                                  F.lit(-1).alias("d")))
    per_ts = deltas.groupBy(
        F.to_date(F.timestamp_micros(F.col("us"))).alias("day"), "us"
    ).agg(F.sum("d").alias("d"))
    wd = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    base = per_ts.groupBy("day").agg(F.sum("d").alias("dd")).withColumn(
        "carry", F.coalesce(F.sum("dd").over(wd), F.lit(0)))
    wt = Window.partitionBy("day").orderBy("us").rowsBetween(
        Window.unboundedPreceding, 0)
    peaks = per_ts.withColumn("run", F.sum("d").over(wt)).groupBy("day").agg(
        F.max("run").alias("mp"))
    return peaks.join(base, "day").select(
        "day", (F.col("carry") + F.greatest(F.col("mp"), F.lit(0))).alias("p"))


def probe_max_concurrency(spark, mult: int) -> float:
    """Sweep-line concurrency at mult x events (user axis): session
    build is user-keyed; the carry window stays one row per day."""
    events = multiply(
        load_table(spark, SF, "events").select("user_id", "event_id", "ts"),
        mult, ["user_id", "event_id"],
    )
    q = _max_concurrency_query(events)
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_max_concurrency_horizon(spark, mult: int) -> float:
    """Sweep-line concurrency on the HORIZON axis (mult x rows over
    mult x the day span): the serial carry window grows one row per day,
    so a mult x day domain is the stress direction for the unpartitioned
    day-axis window this query deliberately keeps (domain-bounded by
    contract — this probe is the evidence the bound holds as the domain
    grows)."""
    base = load_table(spark, SF, "events").select("user_id", "event_id", "ts")
    parts = [base]
    for i in range(1, mult):
        parts.append(
            base.withColumn("user_id", F.col("user_id") + i * KEY_STRIDE)
            .withColumn("event_id", F.col("event_id") + i * KEY_STRIDE)
            .withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {i * 45} DAYS"))
        )
    events = parts[0]
    for p in parts[1:]:
        events = events.unionByName(p)
    q = _max_concurrency_query(events)
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_gini(spark, mult: int) -> float:
    """Two-phase-rank Gini at mult x customers/orders: bucket offsets
    stay one row per occupied $5k bucket; row_number partitions per
    (segment, bucket)."""
    from pyspark.sql import Window

    orders = multiply(
        load_table(spark, SF, "orders").select("o_custkey", "o_totalprice"),
        mult, ["o_custkey"],
    )
    customer = multiply(
        load_table(spark, SF, "customer").select("c_custkey", "c_mktsegment"),
        mult, ["c_custkey"],
    )
    rc = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
    pc = rc.join(
        customer.select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment"),
        "o_custkey",
    ).withColumn("bucket", F.expr("cents div 500000"))
    pb = pc.groupBy("c_mktsegment", "bucket").agg(F.count(F.lit(1)).alias("n_b"))
    wb = Window.partitionBy("c_mktsegment").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1)
    offs = pb.withColumn(
        "off", F.coalesce(F.sum("n_b").over(wb), F.lit(0))
    ).select("c_mktsegment", "bucket", "off")
    wi = Window.partitionBy("c_mktsegment", "bucket").orderBy("cents", "o_custkey")
    ranked = pc.join(offs, ["c_mktsegment", "bucket"]).withColumn(
        "i", F.col("off") + F.row_number().over(wi))
    q = ranked.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s0"),
        F.sum((F.col("i") * F.col("cents")).cast("decimal(38,0)"))
        .alias("s1"))
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_pmi(spark, mult: int) -> float:
    """Support-bounded PMI at mult x documents (salted so copies do not
    collapse to identical token sets)."""
    docs = _salt_text(
        multiply(load_table(spark, SF, "documents").select("doc_id", "text"),
                 mult, ["doc_id"]),
        mult, "doc_id",
    )
    n_row = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("t")
    ).filter(F.col("t") != "").distinct()
    df_tok = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    freq = df_tok.crossJoin(F.broadcast(n_row)).filter(
        F.col("c") >= F.ceil(F.col("n_docs") * 0.05)).select("t", "c")
    ft = tok.join(freq.select("t"), "t")
    a = ft.select("doc_id", F.col("t").alias("t1"))
    b = ft.select("doc_id", F.col("t").alias("t2"))
    pairs = (
        a.join(b, "doc_id").filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("df_pair"))
        .crossJoin(F.broadcast(n_row))
        .filter(F.col("df_pair") >= F.ceil(F.col("n_docs") * 0.02))
    )
    q = pairs.join(freq.select(F.col("t").alias("t1"), F.col("c").alias("cx")), "t1") \
        .join(freq.select(F.col("t").alias("t2"), F.col("c").alias("cy")), "t2")
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_ngram_novelty(spark, mult: int) -> float:
    """Trigram novelty at mult x documents (salted: copies stay novel,
    so gram doc-frequency rows scale with the corpus as they would in
    production)."""
    from pinterest_data_pipeline_spark.operators import text

    docs = _salt_text(
        multiply(load_table(spark, SF, "documents").select("doc_id", "text"),
                 mult, ["doc_id"]),
        mult, "doc_id",
    )
    grams = docs.select(
        "doc_id", F.explode(text.shingles(F.col("text"), 3)).alias("g")
    ).distinct()
    gf = grams.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    q = grams.join(gf, "g").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).alias("n_unique"))
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_sorted_neighborhood(spark, mult: int) -> float:
    """Sorted-neighborhood blocking at mult x documents (salted so the
    sort keys stay distinct instead of collapsing into mult-sized tie
    runs of identical twins)."""
    from pyspark.sql import Window

    docs = _salt_text(
        multiply(load_table(spark, SF, "documents").select("doc_id", "text"),
                 mult, ["doc_id"]),
        mult, "doc_id",
    )
    keyed = docs.select(
        "doc_id", "text",
        F.substring(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]", ""),
                    1, 16).alias("sn_key"),
    ).withColumn("bkt", F.substring("sn_key", 1, 2))
    pb = keyed.groupBy("bkt").agg(F.count(F.lit(1)).alias("n_b"))
    wb = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    offs = pb.withColumn(
        "off", F.coalesce(F.sum("n_b").over(wb), F.lit(0))).select("bkt", "off")
    wi = Window.partitionBy("bkt").orderBy("sn_key", "doc_id")
    ranked = keyed.join(offs, "bkt").withColumn(
        "r", F.col("off") + F.row_number().over(wi)).select("doc_id", "r")
    pairs = (
        ranked.withColumn(
            "gap", F.explode(F.array(F.lit(1).cast("long"),
                                     F.lit(2).cast("long"))))
        .withColumn("r_b", F.col("r") + F.col("gap"))
        .select(F.col("doc_id").alias("id_a"), "r_b")
        .join(ranked.select(F.col("doc_id").alias("id_b"),
                            F.col("r").alias("r_b")), "r_b")
    )
    sets_ = dedup.shingle_sets(docs, "text", "doc_id")
    q = dedup.ngram_jaccard_pairs(
        pairs.join(sets_.select(F.col("doc_id").alias("id_a"),
                                F.col("shingle_set").alias("shingle_set_a")),
                   "id_a")
        .join(sets_.select(F.col("doc_id").alias("id_b"),
                           F.col("shingle_set").alias("shingle_set_b")),
              "id_b")
    ).filter(F.col("jaccard_sim") >= 0.3)
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0




def _wau_bitmap_query(events):
    ev = events.select(
        F.to_date("ts").alias("day"),
        F.expr("user_id div 63").cast("long").alias("word"),
        F.expr("shiftleft(1L, CAST(user_id % 63 AS INT))").alias("bit"),
    )
    words = ev.groupBy("day", "word").agg(F.bit_or("bit").alias("bits"))
    expanded = words.select(
        F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6)))
        .alias("anchor"), "word", "bits")
    rolled = expanded.groupBy("anchor", "word").agg(
        F.bit_or("bits").alias("bits"))
    return rolled.groupBy("anchor").agg(
        F.sum(F.bit_count("bits")).alias("wau"))


def probe_rolling_wau_bitmap(spark, mult: int) -> float:
    """Exact bitmap rolling WAU at mult x events (user axis, horizon
    fixed): the explode runs on (day, word) bitmap rows — 63 users per
    row — so window traffic is events-independent after the fold."""
    events = multiply(
        load_table(spark, SF, "events").select("user_id", "ts"),
        mult, ["user_id"],
    )
    q = _wau_bitmap_query(events)
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_rolling_wau_bitmap_horizon(spark, mult: int) -> float:
    """Bitmap rolling WAU on the HORIZON axis (mult x rows over mult x
    the day span): per-word cost is a constant 7 anchors, so this must
    track the user-axis probe at the same mult."""
    base = load_table(spark, SF, "events").select("user_id", "ts")
    parts = [base]
    for i in range(1, mult):
        parts.append(
            base.withColumn("user_id", F.col("user_id") + i * KEY_STRIDE)
            .withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {i * 45} DAYS"))
        )
    events = parts[0]
    for p in parts[1:]:
        events = events.unionByName(p)
    q = _wau_bitmap_query(events)
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_char_entropy(spark, mult: int) -> float:
    """Defined-order-fold char entropy at mult x documents: the fold
    array is bounded by the char alphabet, never document count."""
    docs = multiply(
        load_table(spark, SF, "documents").select("doc_id", "text"),
        mult, ["doc_id"],
    )
    counts = (
        docs.select("doc_id", F.explode(F.split(F.col("text"), "")).alias("ch"))
        .filter(F.col("ch") != "")
        .groupBy("doc_id", "ch")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    q = counts.groupBy("doc_id").agg(
        F.sum("cnt").alias("n"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("ch", "cnt"))),
            F.lit(0.0),
            lambda acc, x: acc
            + x["cnt"].cast("double") * F.log(x["cnt"].cast("double")),
        ).alias("s"),
    )
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_knn_audit(spark, mult: int) -> float:
    """k-NN label audit at mult x embeddings: one corpus scan against the
    fixed 256-query GEMM kernel; Python->JVM traffic stays q*(k+1) rows
    per batch no matter the corpus size, so wall should track the scan.
    Timer covers BOTH actions (the bounded 256-row audit collect and the
    rollup) — the operator's real two-action shape."""
    from pyspark.sql import Window as SqlWindow

    from pinterest_data_pipeline_spark.operators import sampling, similarity

    emb = multiply(load_table(spark, SF, "embeddings"), mult, ["vec_id"])
    t0 = time.perf_counter()
    audited_rows = (
        emb.withColumn("h", sampling.uniform_hash(F.col("vec_id"), "knn_audit"))
        .orderBy(F.asc("h"), F.asc("vec_id"))
        .limit(256)
        .select(
            F.col("vec_id").alias("q_id"),
            similarity.quantize(F.col("embedding")).alias("q_vec"),
            F.col("label").alias("q_label"),
        )
        .collect()
    )
    corpus = emb.select(
        "vec_id", similarity.quantize(F.col("embedding")).alias("c_vec"), "label"
    )
    partials = similarity.knn_partial_topk_matmul(
        corpus, audited_rows, k=5
    ).filter(F.col("vec_id") != F.col("q_id"))
    w = SqlWindow.partitionBy("q_id").orderBy(F.desc("dot_q"), F.asc("vec_id"))
    knn = partials.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= 5
    )
    votes = knn.groupBy("q_id", "q_label").agg(
        F.sum(
            F.when(F.col("label") == F.col("q_label"), 1).otherwise(0)
        ).alias("agree")
    )
    q = votes.agg(F.count(F.lit(1)).alias("n"), F.sum("agree").alias("s"))
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_k_anonymity(spark, mult: int) -> float:
    """k-anonymity audit at mult x customers: one QI-keyed partial agg
    whose output is bounded by the QI domain (here grown with the data
    via the key shift on nationkey — the honest 100 TB model: more
    groups, not row-sized state)."""
    cust = multiply(
        load_table(spark, SF, "customer").select(
            "c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment"
        ),
        mult, ["c_custkey", "c_nationkey"],
    )
    qi = cust.select(
        "c_nationkey", "c_mktsegment",
        F.floor(F.round(F.col("c_acctbal") * 100).cast("long") / F.lit(25000))
        .cast("long").alias("bal_band"),
    )
    groups = qi.groupBy("c_nationkey", "bal_band").agg(
        F.count(F.lit(1)).cast("long").alias("grp_n"),
        F.count_distinct("c_mktsegment").cast("long").alias("l_div"),
    )
    q = groups.select(
        "grp_n", "l_div",
        F.explode(F.array(F.lit(2), F.lit(5), F.lit(10))).alias("k"),
    ).groupBy("k").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(F.col("grp_n") < F.col("k"), F.col("grp_n"))
              .otherwise(0)).alias("rows_at_risk"),
        F.sum(F.when(F.col("l_div") < 2, 1).otherwise(0)).alias("l2"),
    )
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_simpsons(spark, mult: int) -> float:
    """Simpson audit at mult x orders+customers: one (segment, cohort)
    integer rollup off the join — partial-agg bound, decimal sums."""
    orders = multiply(
        load_table(spark, SF, "orders").select(
            "o_custkey", "o_totalprice", "o_orderpriority"
        ),
        mult, ["o_custkey"],
    )
    cust = multiply(
        load_table(spark, SF, "customer").select("c_custkey", "c_mktsegment"),
        mult, ["c_custkey"],
    )
    rows = orders.join(cust, orders["o_custkey"] == cust["c_custkey"]).select(
        "c_mktsegment",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0).alias("is_a"),
    )
    q = rows.groupBy("c_mktsegment").agg(
        F.sum(F.when(F.col("is_a") == 1, F.col("cents")).otherwise(0))
        .cast("decimal(38,0)").alias("s_a"),
        F.sum(F.when(F.col("is_a") == 0, F.col("cents")).otherwise(0))
        .cast("decimal(38,0)").alias("s_b"),
        F.sum("is_a").alias("n_a"),
        F.count(F.lit(1)).alias("n"),
    )
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_split_contamination(spark, mult: int) -> float:
    """Cross-split contamination at mult x documents: one text-keyed
    split pivot + O(1) rollup; wall should track the text shuffle."""
    from pinterest_data_pipeline_spark.operators import sampling

    docs = multiply(
        load_table(spark, SF, "documents").select("doc_id", "text"),
        mult, ["doc_id"],
    )
    tagged = sampling.hash_split(docs, "doc_id")
    per_text = tagged.groupBy("text").agg(
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias("nt"),
        F.sum(F.when(F.col("split") == "valid", 1).otherwise(0)).alias("nv"),
        F.sum(F.when(F.col("split") == "test", 1).otherwise(0)).alias("ns"),
    )
    q = per_text.agg(
        F.sum(F.when(F.col("nt") > 0, F.col("nv") + F.col("ns"))
              .otherwise(0)).alias("leaked"),
        F.sum(F.col("nv") + F.col("ns")).alias("n_eval"),
    )
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_fs_linkage(spark, mult: int) -> float:
    """FS linkage at mult x parts with the BLOCK DOMAIN grown alongside
    (p_size shifted per copy): block count scales, block size stays
    bounded — the honest 100 TB model for a blocked self-join (a
    fixed-domain multiply would square the within-block pair volume,
    which is a property of the probe, not the operator)."""
    base = load_table(spark, SF, "part").select(
        "p_partkey", "p_name", "p_brand", "p_type", "p_size"
    )
    parts_m = [base]
    for i in range(1, mult):
        parts_m.append(
            base.withColumn(
                "p_partkey", F.col("p_partkey") + i * KEY_STRIDE
            ).withColumn("p_size", F.col("p_size") + i * 1000)
        )
    parts = parts_m[0]
    for p in parts_m[1:]:
        parts = parts.unionByName(p)
    parts = parts.select(
        "p_partkey", "p_brand", "p_size",
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("adj"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("noun"),
        "p_type",
    )
    a, b = parts.alias("a"), parts.alias("b")
    # Bounded blocks -> the r12 cost-based planner picks the COARSE
    # enumeration here (avg block ~16 rows << threshold); this probe
    # mirrors that choice. The fine second-pass shape is probed by
    # fs_linkage_fixed_domain, the regime it exists for.
    pairs = a.join(
        b,
        (F.col("a.p_brand") == F.col("b.p_brand"))
        & (F.col("a.p_size") == F.col("b.p_size"))
        & (F.col("a.p_partkey") < F.col("b.p_partkey")),
    )
    q = pairs.groupBy(
        (F.col("a.adj") == F.col("b.adj")).alias("ga"),
        (F.col("a.noun") == F.col("b.noun")).alias("gn"),
        (F.col("a.p_type") == F.col("b.p_type")).alias("gt"),
    ).agg(F.count(F.lit(1)).alias("n"))
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_fs_linkage_fixed_domain(spark, mult: int) -> float:
    """FS linkage with the block domain FIXED (p_size NOT shifted):
    block count stays at |brand| x |size|, block size B grows with
    mult, coarse pair volume grows with B^2 — the regime the r12
    second blocking pass exists for. Probes the FINE shape (what the
    cost-based planner picks once avg block exceeds its threshold):
    three (brand, size, field) joins unioned + pair dedup, so
    enumerated volume grows with sum_f u_f * B^2 instead of B^2 and
    each branch's shuffle keys stay finer-grained (better skew posture).
    Compare against `coarse_fixed` at the same mult to see the gap."""
    base = load_table(spark, SF, "part").select(
        "p_partkey", "p_name", "p_brand", "p_type", "p_size"
    )
    parts_m = [base]
    for i in range(1, mult):
        parts_m.append(
            base.withColumn("p_partkey", F.col("p_partkey") + i * KEY_STRIDE)
        )
    parts = parts_m[0]
    for p in parts_m[1:]:
        parts = parts.unionByName(p)
    parts = parts.select(
        "p_partkey", "p_brand", "p_size",
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("adj"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("noun"),
        "p_type",
    )
    a, b = parts.alias("a"), parts.alias("b")

    def agrees(field):
        return F.coalesce(
            F.col(f"a.{field}") == F.col(f"b.{field}"), F.lit(False)
        )

    def fine_branch(field, not_fields):
        df = a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_size") == F.col("b.p_size"))
            & (F.col(f"a.{field}") == F.col(f"b.{field}"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        for nf in not_fields:
            df = df.filter(~agrees(nf))
        return df.select(
            F.col("a.p_partkey").alias("part_a"),
            F.col("b.p_partkey").alias("part_b"),
            (F.col("a.adj") == F.col("b.adj")).alias("ga"),
            (F.col("a.noun") == F.col("b.noun")).alias("gn"),
            (F.col("a.p_type") == F.col("b.p_type")).alias("gt"),
        )

    # disjoint routing (first agreeing field) -> no pair-dedup shuffle
    pairs = (
        fine_branch("adj", ())
        .unionByName(fine_branch("noun", ("adj",)))
        .unionByName(fine_branch("p_type", ("adj", "noun")))
    )
    q = pairs.groupBy("ga", "gn", "gt").agg(F.count(F.lit(1)).alias("n"))
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_fs_linkage_coarse_fixed(spark, mult: int) -> float:
    """The COARSE enumeration in the fixed-domain regime — the shape
    the r12 planner abandons once blocks grow. Exists purely as the
    measured counterfactual for fs_linkage_fixed_domain."""
    base = load_table(spark, SF, "part").select(
        "p_partkey", "p_name", "p_brand", "p_type", "p_size"
    )
    parts_m = [base]
    for i in range(1, mult):
        parts_m.append(
            base.withColumn("p_partkey", F.col("p_partkey") + i * KEY_STRIDE)
        )
    parts = parts_m[0]
    for p in parts_m[1:]:
        parts = parts.unionByName(p)
    parts = parts.select(
        "p_partkey", "p_brand", "p_size",
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("adj"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("noun"),
        "p_type",
    )
    a, b = parts.alias("a"), parts.alias("b")
    pairs = a.join(
        b,
        (F.col("a.p_brand") == F.col("b.p_brand"))
        & (F.col("a.p_size") == F.col("b.p_size"))
        & (F.col("a.p_partkey") < F.col("b.p_partkey")),
    )
    q = pairs.groupBy(
        (F.col("a.adj") == F.col("b.adj")).alias("ga"),
        (F.col("a.noun") == F.col("b.noun")).alias("gn"),
        (F.col("a.p_type") == F.col("b.p_type")).alias("gt"),
    ).agg(F.count(F.lit(1)).alias("n"))
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_spatial_neighbors(spark, mult: int) -> float:
    """Spatial grid join at mult x points with the WORLD tiled alongside
    (each copy's longitude shifted by a full window) so point density —
    and therefore per-cell occupancy — stays constant: the honest
    100 TB model for a spatial join (a fixed-window multiply would grow
    density and square the within-threshold pair volume, a probe
    artifact, not an operator property)."""
    from pinterest_data_pipeline_spark.operators import sampling

    span, cell = 10_000_000, 250_000
    base = load_table(spark, SF, "customer").select("c_custkey")
    tiles = []
    for i in range(mult):
        tiles.append(
            base.select(
                (F.col("c_custkey") + i * KEY_STRIDE).alias("key"),
                (sampling.uniform_hash(F.col("c_custkey"), "lat") % span)
                .alias("lat_i"),
                (
                    sampling.uniform_hash(F.col("c_custkey"), "lon") % span
                    + F.lit(i * span)
                ).alias("lon_i"),
            )
        )
    pts = tiles[0]
    for t in tiles[1:]:
        pts = pts.unionByName(t)
    from pinterest_data_pipeline_spark.operators import joins as joins_ops

    pairs = joins_ops.grid_neighbor_pairs(pts, cell)
    q = pairs.agg(F.count(F.lit(1)).alias("n"), F.min("dist2").alias("m"))
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_skyline(spark, mult: int) -> float:
    """Pareto skyline at mult x parts with the PRICE DOMAIN tiled
    alongside (each copy's prices shifted by the full $100 domain
    width) — distinct prices and occupied dollar buckets grow linearly,
    the honest model for a price domain that tracks part cardinality.
    The two-phase running max must keep the serial step at one row per
    dollar bucket instead of funneling every distinct price through one
    window task (VERDICT r10 item 4)."""
    from pinterest_data_pipeline_spark.operators.ranking import (
        two_phase_running,
    )

    base = load_table(spark, SF, "part").select("p_retailprice", "p_size")
    tiles = [
        base.select(
            (F.col("p_retailprice") + i * 100.0).alias("price"),
            F.col("p_size").alias("psize"),
        )
        for i in range(mult)
    ]
    parts = tiles[0]
    for t in tiles[1:]:
        parts = parts.unionByName(t)
    pts = parts.groupBy("price").agg(F.max("psize").alias("size"))
    sky = (
        two_phase_running(
            pts,
            F.floor(F.col("price")).cast("long"),
            ["price"],
            [("size", "max", "best_prev")],
            current_row=False,
        )
        .filter(
            F.col("best_prev").isNull() | (F.col("size") > F.col("best_prev"))
        )
        .select("price", "size")
    )
    counted = (
        sky.join(
            parts,
            (sky["price"] == parts["price"]) & (sky["size"] == parts["psize"]),
        )
        .groupBy(sky["price"], sky["size"])
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )
    q = counted.agg(F.count(F.lit(1)).alias("n"), F.min("price").alias("m"))
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_ks_cdf(spark, mult: int) -> float:
    """KS CDF sums at mult x lineitem rows with the CENTS DOMAIN tiled
    alongside (each copy's prices shifted by the full ~$105k domain
    width) — distinct cents grow linearly with the data, the regime
    where the old unpartitioned CDF window funneled everything through
    ONE task; the two-phase reshape keeps the serial step at one row
    per $100 bucket and parallelizes the rest (VERDICT r10 item 4)."""
    from pinterest_data_pipeline_spark.operators.ranking import (
        two_phase_running,
    )

    width = 10_500_000  # cents domain width of l_extendedprice
    base = (
        load_table(spark, SF, "lineitem")
        .filter(F.col("l_returnflag").isin("A", "R"))
        .select(
            F.round(F.col("l_extendedprice") * 100).cast("long").alias(
                "cents0"
            ),
            "l_returnflag",
        )
    )
    tiles = [
        base.select(
            (F.col("cents0") + i * width).alias("cents"), "l_returnflag"
        )
        for i in range(mult)
    ]
    li = tiles[0]
    for t in tiles[1:]:
        li = li.unionByName(t)
    per_value = li.groupBy("cents").agg(
        F.sum(F.when(F.col("l_returnflag") == "A", 1).otherwise(0)).alias(
            "c1"
        ),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias(
            "c2"
        ),
    )
    totals = per_value.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    cum = two_phase_running(
        per_value,
        F.floor(F.col("cents") / 10000).cast("long"),
        ["cents"],
        [("c1", "sum", "cum1"), ("c2", "sum", "cum2")],
        current_row=True,
    )
    gap = F.abs(
        F.col("cum1").cast("double") / F.col("n1")
        - F.col("cum2").cast("double") / F.col("n2")
    )
    q = (
        cum.crossJoin(F.broadcast(totals))
        .select(gap.alias("gap"))
        .agg(F.max("gap").alias("ks_d"))
    )
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_fifo_allocation(spark, mult: int) -> float:
    """FIFO cumulative-interval join at mult x lineitem with the PART
    KEY axis grown alongside (key-shifted copies add new parts, so
    per-part FIFO chain length — and thus pairs per part — stays
    constant): the honest 100 TB model for a part-keyed window + band
    join. Serial risk would be a hot part, not row volume."""
    li = multiply(
        load_table(spark, SF, "lineitem").select(
            "l_partkey", "l_orderkey", "l_linenumber", "l_quantity",
            "l_shipdate", "l_returnflag",
        ),
        mult,
        ["l_partkey", "l_orderkey"],
    ).select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("long").alias("qty"),
        F.to_date("l_shipdate").alias("d"),
        "l_returnflag",
    )
    from pyspark.sql import Window as SqlWindow

    w = SqlWindow.partitionBy("l_partkey").orderBy(
        "d", "l_orderkey", "l_linenumber"
    ).rowsBetween(SqlWindow.unboundedPreceding, SqlWindow.currentRow)
    supply = (
        li.filter(F.col("l_returnflag") != "R")
        .withColumn("cs", F.sum("qty").over(w))
        .select(
            "l_partkey",
            (F.col("cs") - F.col("qty")).alias("s_lo"),
            F.col("cs").alias("s_hi"),
        )
    )
    demand = (
        li.filter(F.col("l_returnflag") == "R")
        .withColumn("cd", F.sum("qty").over(w))
        .select(
            "l_partkey",
            (F.col("cd") - F.col("qty")).alias("d_lo"),
            F.col("cd").alias("d_hi"),
        )
    )
    matched = (
        supply.join(demand, "l_partkey")
        .filter(
            (F.col("s_lo") < F.col("d_hi")) & (F.col("d_lo") < F.col("s_hi"))
        )
        .select(
            "l_partkey",
            (
                F.least(F.col("s_hi"), F.col("d_hi"))
                - F.greatest(F.col("s_lo"), F.col("d_lo"))
            ).alias("m_qty"),
        )
    )
    q = matched.agg(
        F.count_distinct("l_partkey").alias("np"),
        F.sum("m_qty").alias("mq"),
    )
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_rolling_median(spark, mult: int) -> float:
    """7-day rolling median at mult x orders, SAME calendar: rows per
    day grow while the percentile-in-frame window input (the daily
    rollup — day domain x 5 priorities) stays CONSTANT. The map-side
    combinable rollup must absorb the growth; the frame cost is
    calendar-bounded by construction (the axis a 100 TB year grows
    ~10x, not with row volume)."""
    from pyspark.sql import Window as SqlWindow

    orders = multiply(
        load_table(spark, SF, "orders").select(
            "o_orderkey", "o_orderpriority", "o_orderdate", "o_totalprice"
        ),
        mult,
        ["o_orderkey"],
    ).select(
        "o_orderpriority",
        F.to_date("o_orderdate").alias("day"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    daily = orders.groupBy("o_orderpriority", "day").agg(
        F.sum("cents").alias("day_cents")
    )
    w = SqlWindow.partitionBy("o_orderpriority").orderBy("day").rowsBetween(
        -6, 0
    )
    q = (
        daily.withColumn(
            "med", F.percentile(F.col("day_cents"), F.lit(0.5)).over(w)
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("med").alias("s"))
    )
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0



def probe_bigram_logloss(spark, mult: int) -> float:
    """Bigram cross-entropy at mult x documents (r12 birth): key-shifted
    copies keep the bigram vocab fixed while counts scale — two
    bigram/context-keyed shuffles + a doc fold whose array is one doc's
    distinct bigrams. Expect near-linear."""
    from pinterest_data_pipeline_spark.operators import text as text_ops

    docs = multiply(
        load_table(spark, SF, "documents").select("doc_id", "text"),
        mult, ["doc_id"],
    )
    toks = text_ops.tokens(F.col("text"))
    bigrams_arr = F.when(
        F.size(toks) < 2, F.array().cast("array<string>")
    ).otherwise(text_ops.shingles(F.col("text"), 2))
    tfb = (
        docs.select("doc_id", F.explode(bigrams_arr).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    c2 = tfb.groupBy("g").agg(F.sum("tf").cast("long").alias("c2"))
    c1 = c2.groupBy(
        F.split_part(F.col("g"), F.lit(" "), F.lit(1)).alias("t1")
    ).agg(F.sum("c2").cast("long").alias("c1"))
    vocab = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("t")
    ).agg(F.count_distinct("t").cast("long").alias("v"))
    terms = (
        tfb.join(c2, "g")
        .withColumn("t1", F.split_part(F.col("g"), F.lit(" "), F.lit(1)))
        .join(c1, "t1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id", "g", "tf",
            (F.col("tf").cast("double")
             * F.log((F.col("c2") + 1).cast("double")
                     / (F.col("c1") + F.col("v")).cast("double"))).alias("term"),
        )
    )
    q = terms.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("n_bigrams"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("g", "term"))),
            F.lit(0.0), lambda acc, x: acc + x["term"],
        ).alias("s"),
    ).select("doc_id", "n_bigrams", (-F.col("s") / F.col("n_bigrams").cast("double")).alias("x"))
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_shared_ngram(spark, mult: int) -> float:
    """Longest-shared-ngram at mult x documents with the VOCAB tiled
    alongside (each copy's tokens prefixed c{i}_): cross-copy gram
    sharing is zero by construction, so pair volume grows linearly with
    copies — the honest 100 TB model (a verbatim multiply would push
    every gram's df past the cap and measure empty pair work). The
    within-copy near-dup structure is preserved exactly."""
    from pinterest_data_pipeline_spark.operators import text as text_ops

    base = load_table(spark, SF, "documents").select("doc_id", "text")
    tiles = []
    for i in range(mult):
        tiles.append(
            base.select(
                (F.col("doc_id") + i * KEY_STRIDE).alias("doc_id"),
                F.regexp_replace(
                    F.col("text"), r"(\S+)", f"c{i}_$1"
                ).alias("text"),
            )
        )
    docs = tiles[0]
    for t in tiles[1:]:
        docs = docs.unionByName(t)
    docs = fan_out(docs)
    toks = text_ops.tokens(F.col("text"))
    grams_arr = F.when(
        F.size(toks) < 8, F.array().cast("array<string>")
    ).otherwise(text_ops.shingles(F.col("text"), 8))
    grams = docs.select(
        "doc_id", F.posexplode(grams_arr).alias("pos0", "g")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "g")
    rare = (
        grams.groupBy("g").agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") <= 50).select("g")
        .hint("merge")  # data-sized vocab: broadcast build died
        # on driver.maxResultSize at 256x (the sparse-cosine lesson)
    )
    kept = grams.join(rare, "g")
    a = kept.select("g", F.col("doc_id").alias("id_a"), F.col("pos").alias("pa"))
    b = kept.select("g", F.col("doc_id").alias("id_b"), F.col("pos").alias("pb"))
    pairs = (
        a.join(b.hint("merge"), "g")  # kept is data-sized: never broadcast
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "pa", "pb", (F.col("pa") - F.col("pb")).alias("diag"))
    )
    from pyspark.sql import Window as W
    w_diag = W.partitionBy("id_a", "id_b", "diag").orderBy("pa")
    runs = pairs.withColumn("grp", F.col("pa") - F.row_number().over(w_diag))
    spans = runs.groupBy("id_a", "id_b", "diag", "grp").agg(
        (F.count(F.lit(1)) + 7).cast("long").alias("span_tokens")
    )
    q = spans.groupBy("id_a", "id_b").agg(
        F.max("span_tokens").alias("longest")
    ).orderBy(F.desc("longest"), F.asc("id_a"), F.asc("id_b")).limit(20)
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_kendall_tau(spark, mult: int) -> float:
    """Kendall tau-b at mult x parts: the value grid stays bounded by the
    (size, $1-bucket) domain, so only the first hash aggregate scales."""
    part = multiply(
        load_table(spark, SF, "part").select(
            "p_partkey", "p_size", "p_retailprice"
        ),
        mult, ["p_partkey"],
    ).select(
        F.col("p_size").cast("long").alias("x"),
        F.floor(
            F.round(F.col("p_retailprice") * 100).cast("long") / 100
        ).cast("long").alias("y"),
    )
    grid = part.groupBy("x", "y").agg(
        F.count(F.lit(1)).cast("long").alias("n_c")
    )
    a = grid.select(F.col("x").alias("xa"), F.col("y").alias("ya"),
                    F.col("n_c").alias("na"))
    b = grid.select(F.col("x").alias("xb"), F.col("y").alias("yb"),
                    F.col("n_c").alias("nb"))
    pair_sums = a.join(F.broadcast(b), F.col("xa") < F.col("xb")).agg(
        F.coalesce(F.sum(F.when(F.col("ya") < F.col("yb"),
                                F.col("na") * F.col("nb"))), F.lit(0))
        .alias("n_concordant"),
        F.coalesce(F.sum(F.when(F.col("ya") > F.col("yb"),
                                F.col("na") * F.col("nb"))), F.lit(0))
        .alias("n_discordant"),
    )
    t0 = time.perf_counter()
    pair_sums.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_js_divergence(spark, mult: int) -> float:
    """Per-source JS divergence at mult x documents: one (source, token)
    aggregate scales with the corpus; everything after is domain-bounded."""
    docs = multiply(
        load_table(spark, SF, "documents").select("doc_id", "source", "text"),
        mult, ["doc_id"],
    )
    toks = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("t")
    ).filter(F.col("t") != "")
    src_counts = toks.groupBy("source", "t").agg(
        F.count(F.lit(1)).cast("long").alias("c_src")
    )
    corpus_counts = src_counts.groupBy("t").agg(
        F.sum("c_src").cast("long").alias("c_corpus")
    )
    top = corpus_counts.orderBy(F.desc("c_corpus"), F.asc("t")).limit(50)
    q = src_counts.join(
        F.broadcast(top), "t"
    ).groupBy("source").agg(F.sum("c_src").alias("top_mass"))
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_did(spark, mult: int) -> float:
    """DiD at mult x events (user axis): one user-keyed aggregate, one
    global conditional aggregate — nothing else scales."""
    events = multiply(
        load_table(spark, SF, "events").select("user_id", "event_id", "ts", "value"),
        mult, ["user_id", "event_id"],
    )
    cents = F.round(F.col("value") * 100).cast("long")
    per_user = (
        events.groupBy("user_id")
        .agg(
            F.coalesce(F.sum(F.when(F.dayofmonth("ts") <= 15, cents)), F.lit(0)).alias("pre"),
            F.coalesce(F.sum(F.when(F.dayofmonth("ts") > 15, cents)), F.lit(0)).alias("post"),
        )
        .withColumn("arm", (F.col("user_id") % 2).cast("int"))
        .withColumn("d", F.col("post") - F.col("pre"))
    )
    row = per_user.agg(
        F.sum(F.when(F.col("arm") == 1, F.lit(1))).alias("n_t"),
        F.sum(F.when(F.col("arm") == 1, F.col("d"))).alias("sd_t"),
        F.sum(F.when(F.col("arm") == 1, (F.col("d") * F.col("d")).cast("decimal(38,0)"))).alias("sdd_t"),
        F.sum(F.when(F.col("arm") == 0, F.lit(1))).alias("n_c"),
        F.sum(F.when(F.col("arm") == 0, F.col("d"))).alias("sd_c"),
        F.sum(F.when(F.col("arm") == 0, (F.col("d") * F.col("d")).cast("decimal(38,0)"))).alias("sdd_c"),
    )
    t0 = time.perf_counter()
    row.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_pearson_matrix(spark, mult: int) -> float:
    """Pearson matrix at mult x lineitem: one 15-sum scan aggregate."""
    li = multiply(
        load_table(spark, SF, "lineitem").select(
            "l_orderkey", "l_quantity", "l_extendedprice", "l_discount", "l_tax"
        ),
        mult, ["l_orderkey"],
    ).select(
        F.col("l_quantity").cast("long").alias("q"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("p"),
        F.round(F.col("l_discount") * 100).cast("long").alias("d"),
        F.round(F.col("l_tax") * 100).cast("long").alias("t"),
    )
    cols = ["q", "p", "d", "t"]
    aggs = [F.count(F.lit(1)).alias("n")]
    for i, a in enumerate(cols):
        aggs.append(F.sum(a).alias(f"s_{a}"))
        for b_ in cols[i:]:
            aggs.append(F.sum((F.col(a) * F.col(b_)).cast("decimal(38,0)")).alias(f"s_{a}{b_}"))
    q = li.agg(*aggs)
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0





def probe_incremental_dedup(spark, mult: int) -> float:
    """Cross-shard incremental dedup with the STORE multiplied mult x and
    the BATCH held fixed — the stress direction for "cost tracks the
    batch, not the corpus". The store signature table is prebuilt to
    parquet UNTIMED (it is the store's own build job, amortized over
    every future batch); the timed phase is what each arriving batch
    pays: batch signatures, the broadcast-probed store scan, candidate
    verification, decisions. Multiplied store copies are text-salted so
    candidate volume stays a data property, not a multiplication
    artifact."""
    from pinterest_data_pipeline_spark.plans.extensions import load_documents

    docs = load_documents(spark, SF)
    batch = docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) == 0)
    store_docs = _salt_text(
        multiply(
            docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) != 0),
            mult,
            ["doc_id"],
        ),
        mult,
        "doc_id",
    )
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "spark-warehouse", f"_probe_incr_store_{mult}x",
    )
    # store docs AND signatures land in parquet untimed — production
    # reads both from the lake; timing the in-flight union+salt lineage
    # would charge the probe's data synthesis to the operator
    store_docs.write.mode("overwrite").parquet(
        os.path.join(out, "docs.parquet")
    )
    store_docs = spark.read.parquet(os.path.join(out, "docs.parquet"))
    dedup.minhash_signatures(store_docs, "text", "doc_id").write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "sigs.parquet"))
    store_sigs = spark.read.parquet(os.path.join(out, "sigs.parquet"))
    t0 = time.perf_counter()
    decisions, _ = dedup.incremental_minhash_dedup(
        batch, store_sigs, store_docs, "text", "doc_id", threshold=0.3
    )
    decisions.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0



def _multiplied_events_horizon_dir(spark, mult: int, name: str) -> str:
    """mult x events over mult x the day span: copies shift BOTH keys and
    ts (+45 days per copy, past the base span), so the day/week DOMAIN
    grows with the data — the stress direction for the domain-bounded
    unpartitioned day-axis windows (VERDICT r13 item 7). Written as an
    sf-shaped dir so the probes time the REGISTERED queries unmodified."""
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "spark-warehouse", f"_probe_{name}_{mult}x",
    )
    base = load_table(spark, SF, "events")
    parts = [base]
    for i in range(1, mult):
        parts.append(
            base.withColumn("event_id", F.col("event_id") + i * KEY_STRIDE)
            .withColumn("user_id", F.col("user_id") + i * KEY_STRIDE)
            .withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {i * 45} DAYS"))
        )
    events = parts[0]
    for p in parts[1:]:
        events = events.unionByName(p)
    events.write.mode("overwrite").parquet(os.path.join(out, "events.parquet"))
    return out


def probe_cumulative_users_horizon(spark, mult: int) -> float:
    """Growth-accounting cumsum on the HORIZON axis: the unpartitioned
    day window (extensions: events_cumulative_users) sees mult x the day
    rows — the domain-bounded contract's stress direction."""
    from pinterest_data_pipeline_spark.plans import extensions  # noqa: F401
    from pinterest_data_pipeline_spark.plans.analytics import QUERIES

    d = _multiplied_events_horizon_dir(spark, mult, "cumu_users_horizon")
    q = QUERIES["events_cumulative_users"](spark, d)
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_cusum_horizon(spark, mult: int) -> float:
    """CUSUM change-point on the HORIZON axis: the serial day-axis
    cumulative window (anomaly_cusum_daily) grows one row per day."""
    from pinterest_data_pipeline_spark.plans import extensions  # noqa: F401
    from pinterest_data_pipeline_spark.plans.analytics import QUERIES

    d = _multiplied_events_horizon_dir(spark, mult, "cusum_horizon")
    q = QUERIES["anomaly_cusum_daily"](spark, d)
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_kaplan_meier_horizon(spark, mult: int) -> float:
    """Kaplan-Meier on the HORIZON axis: the week-keyed reverse/forward
    cumulative pair (events_kaplan_meier) sees mult x the week domain."""
    from pinterest_data_pipeline_spark.plans import extensions  # noqa: F401
    from pinterest_data_pipeline_spark.plans.analytics import QUERIES

    d = _multiplied_events_horizon_dir(spark, mult, "km_horizon")
    q = QUERIES["events_kaplan_meier"](spark, d)
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0



def probe_incremental_clusters(spark, mult: int) -> float:
    """Incremental cluster maintenance with the STORE multiplied mult x
    and the BATCH fixed: both prebuilt stores (signatures, cluster
    table) land in parquet untimed; the timed arrival path is batch
    signatures + broadcast-probed store scan + verify + contracted CC +
    one broadcast-remap scan of the cluster table."""
    from pinterest_data_pipeline_spark.plans.extensions import load_documents
    from pinterest_data_pipeline_spark.session import persist_scoped

    docs = load_documents(spark, SF)
    batch = docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) == 0)
    store_docs = _salt_text(
        multiply(
            docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) != 0),
            mult,
            ["doc_id"],
        ),
        mult,
        "doc_id",
    )
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "spark-warehouse", f"_probe_incr_cc_{mult}x",
    )
    store_docs.write.mode("overwrite").parquet(os.path.join(out, "docs.parquet"))
    store_docs = spark.read.parquet(os.path.join(out, "docs.parquet"))
    dedup.minhash_signatures(store_docs, "text", "doc_id").write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "sigs.parquet"))
    store_sigs = spark.read.parquet(os.path.join(out, "sigs.parquet"))
    dedup.cluster_pairs(
        dedup.minhash_near_duplicates(store_docs, "text", "doc_id", threshold=0.3)
        .select("id_a", "id_b")
    ).write.mode("overwrite").parquet(os.path.join(out, "clusters.parquet"))
    clusters = spark.read.parquet(os.path.join(out, "clusters.parquet"))
    t0 = time.perf_counter()
    batch_sigs = persist_scoped(
        dedup.minhash_signatures(batch, "text", "doc_id"), "probe_cc_bsigs"
    )
    pairs = dedup.incremental_verified_pairs(
        batch, batch_sigs, store_sigs, store_docs, "text", "doc_id",
        threshold=0.3,
    ).select(F.col("bid").alias("id_a"), F.col("oid").alias("id_b"))
    dedup.incremental_cluster_update(clusters, pairs).write.format(
        "noop"
    ).mode("overwrite").save()
    return time.perf_counter() - t0


IVF_PROBE_CELLS = 16
IVF_PROBE_BASE_ROWS = 100_000
IVF_PROBE_OUTLIERS = 500


def _ivf_probe_index(spark, mult: int) -> tuple[str, list[list[float]]]:
    """Prebuild (untimed) a mult x cell-partitioned IVF index on a
    SYNTHETIC anchored corpus where migration movement is controllable:
    mult x 100k vectors sit exactly on 16 one-hot anchors (their cell
    never changes under the probe's drift), plus a FIXED 500 planted
    outliers between anchors 2 and 3 that flip 2 -> 3 when centroid 3
    leans toward them. Real-embedding drift moves a data-dependent,
    dest-scattered set; the controlled corpus is what lets the probe
    separate the scan floor from the touched-cells rewrite."""
    from pinterest_data_pipeline_spark.operators import similarity

    anchors = [
        [1.0 if j == i else 0.0 for j in range(IVF_PROBE_CELLS)]
        for i in range(IVF_PROBE_CELLS)
    ]
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "spark-warehouse", f"_probe_ivf_retrain_{mult}x",
    )
    path = os.path.join(out, "index")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        anchored = spark.range(IVF_PROBE_BASE_ROWS * mult).select(
            F.col("id").alias("vec_id"),
            F.array(
                *[
                    F.when(
                        F.pmod(F.col("id"), F.lit(IVF_PROBE_CELLS)) == i, 1.0
                    ).otherwise(0.0)
                    for i in range(IVF_PROBE_CELLS)
                ]
            ).alias("embedding"),
            F.pmod(F.col("id"), F.lit(IVF_PROBE_CELLS))
            .cast("int")
            .alias("cell"),
        )
        outlier_vec = [
            0.71 if i == 2 else (0.70 if i == 3 else 0.0)
            for i in range(IVF_PROBE_CELLS)
        ]
        outliers = spark.range(IVF_PROBE_OUTLIERS).select(
            (F.col("id") + KEY_STRIDE * 1000).alias("vec_id"),
            F.array(*[F.lit(float(v)) for v in outlier_vec]).alias(
                "embedding"
            ),
            F.lit(2).cast("int").alias("cell"),  # dot .71 vs .70: cell 2
        )
        anchored.unionByName(outliers).repartition(
            IVF_PROBE_CELLS, F.col("cell")
        ).write.mode("overwrite").partitionBy("cell").parquet(path)
    return path, anchors


def probe_ivf_retrain_noop(spark, mult: int) -> float:
    """Migration floor at mult x index: retrain to IDENTICAL centroids —
    zero vectors move, zero cells rewrite; the timed cost is the
    unavoidable map-only rescoring pass (every vector scored against the
    new centroids to know nothing moved) + the bounded movement
    aggregate. No shuffle, no write."""
    from pinterest_data_pipeline_spark.operators import similarity

    path, anchors = _ivf_probe_index(spark, mult)
    t0 = time.perf_counter()
    _, n_moved, n_touched = similarity.ivf_retrain_migrate(
        spark, path, anchors
    )
    assert (n_moved, n_touched) == (0, 0), (n_moved, n_touched)
    return time.perf_counter() - t0


def probe_ivf_retrain_drift(spark, mult: int) -> float:
    """Localized drift at mult x index: centroid 3 leans toward the FIXED
    500 planted outliers (the drift-monitor trigger scenario), so exactly
    those vectors migrate 2 -> 3 and the rewrite touches 2 of 16 cells.
    Timed cost = the noop probe's scan floor + a rewrite that tracks the
    touched cells' rows — never O(index). The index is rebuilt fresh
    per call (untimed) so repeated runs migrate the same state."""
    import shutil

    from pinterest_data_pipeline_spark.operators import similarity

    path, anchors = _ivf_probe_index(spark, mult)
    work = path + "_drift"
    shutil.rmtree(work, ignore_errors=True)
    shutil.copytree(path, work)
    drifted = [list(c) for c in anchors]
    drifted[3] = [
        0.5 if i == 2 else (0.9 if i == 3 else 0.0)
        for i in range(IVF_PROBE_CELLS)
    ]
    t0 = time.perf_counter()
    _, n_moved, n_touched = similarity.ivf_retrain_migrate(
        spark, work, drifted
    )
    assert n_moved == IVF_PROBE_OUTLIERS and n_touched == 2, (
        n_moved,
        n_touched,
    )
    return time.perf_counter() - t0


BUCKET_PROBE_BANDS = 8
BUCKET_PROBE_PARTS = 16
BUCKET_PROBE_BASE_DOCS = 200_000
BUCKET_PROBE_APPENDS = 12
BUCKET_PROBE_DOCS_PER_APPEND = 2_000


def _bucket_probe_rows(spark, start: int, n: int):
    """Synthetic (doc_id, band, band_hash, bh_part) bucket rows — the
    probe times the ARRIVAL SCAN against the store layout, so bucket
    rows are generated directly (signature computation is the batch's
    O(batch) cost, not the store-side cost under test)."""
    return (
        spark.range(start, start + n)
        .withColumn(
            "band",
            F.explode(F.array(*[F.lit(b) for b in range(BUCKET_PROBE_BANDS)])),
        )
        .select(
            F.col("id").alias("doc_id"),
            F.col("band").cast("int").alias("band"),
            F.xxhash64("id", "band").alias("band_hash"),
        )
        .withColumn(
            "bh_part",
            F.pmod(F.col("band_hash"), F.lit(BUCKET_PROBE_PARTS)).cast("int"),
        )
    )


def _bucket_probe_store(spark, mult: int, compacted: bool) -> str:
    """Prebuild (untimed) a mult x bucket store: clean one-file-per-leaf
    base, then BUCKET_PROBE_APPENDS fragmented delta appends (4 files
    per touched leaf each — the store_delta arrival pathology). The
    compacted twin runs bucket_store_compact after the appends."""
    from pinterest_data_pipeline_spark.operators import dedup as dedup_ops

    tag = "comp" if compacted else "frag"
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "spark-warehouse", f"_probe_bucket_{tag}_{mult}x",
    )
    path = os.path.join(out, "store")
    marker = os.path.join(out, "_READY")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(out, ignore_errors=True)
        (
            _bucket_probe_rows(spark, 0, BUCKET_PROBE_BASE_DOCS * mult)
            .repartition("band", "bh_part")
            .write.mode("overwrite")
            .partitionBy("band", "bh_part")
            .parquet(path)
        )
        for a in range(BUCKET_PROBE_APPENDS):
            (
                _bucket_probe_rows(
                    spark,
                    KEY_STRIDE * (a + 1),
                    BUCKET_PROBE_DOCS_PER_APPEND,
                )
                .repartition(4)
                .write.mode("append")
                .partitionBy("band", "bh_part")
                .parquet(path)
            )
        if compacted:
            dedup_ops.bucket_store_compact(spark, path)
        with open(marker, "w") as fh:
            fh.write("ready")
    return path


def _bucket_probe_scan(spark, path: str) -> float:
    """Timed arrival probe: a 10-doc batch's bucket keys broadcast into
    the store scan (the incremental_candidates store-probe join shape)."""
    probe = _bucket_probe_rows(spark, 0, 10).withColumnRenamed("doc_id", "bid")
    t0 = time.perf_counter()
    (
        spark.read.parquet(path)
        .join(F.broadcast(probe), ["band", "bh_part", "band_hash"])
        .count()
    )
    return time.perf_counter() - t0


def probe_bucket_arrival_fragmented(spark, mult: int) -> float:
    """Arrival-scan cost against the store after 12 fragmented appends —
    the cost that grows with fragments, not data."""
    return _bucket_probe_scan(spark, _bucket_probe_store(spark, mult, False))


def probe_bucket_arrival_compacted(spark, mult: int) -> float:
    """Arrival-scan cost against the same store after compaction — flat
    vs the fragmented twin; tracks data only."""
    return _bucket_probe_scan(spark, _bucket_probe_store(spark, mult, True))


def probe_label_propagation(spark, mult: int) -> float:
    """3-round min-label propagation at mult x lineitem (the registered
    query's exact shape: co-occurrence edges, one lazy plan, edges
    deliberately unpersisted — exchange reuse beats InMemoryRelation)."""
    from pinterest_data_pipeline_spark.plans.extensions import _cooccurrence_edges

    li = multiply(
        load_table(spark, SF, "lineitem").select("l_orderkey", "l_partkey"),
        mult,
        ["l_orderkey"],
    )
    edges = _cooccurrence_edges(li)
    dir_edges = edges.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionByName(edges.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    labels = dir_edges.select(F.col("src").alias("n")).distinct().select(
        "n", F.col("n").alias("lbl")
    )
    for _ in range(3):
        pushed = labels.join(dir_edges, labels["n"] == dir_edges["src"]).select(
            F.col("dst").alias("n"), "lbl"
        )
        labels = labels.unionByName(pushed).groupBy("n").agg(
            F.min("lbl").alias("lbl")
        )
    sizes = labels.groupBy("lbl").agg(F.count(F.lit(1)).alias("sz"))
    q = sizes.groupBy("sz").agg(F.count(F.lit(1)).alias("n_communities"))
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_recall_sweep(spark, mult: int) -> float:
    """IVF-PQ recall sweep at mult x embeddings: index encoded once
    (persisted), both operating points read it — the registered query's
    build-once/query-many shape with the corpus multiplied."""
    from pinterest_data_pipeline_spark.operators import similarity
    from pinterest_data_pipeline_spark.session import persist_scoped, release_scoped

    emb = multiply(load_table(spark, SF, "embeddings"), mult, ["vec_id"])
    q = load_table(spark, SF, "embeddings").filter(F.col("vec_id") < 3)
    centroids = similarity.train_ivf_centroids(emb, n_cells=16)
    books = similarity.train_pq_codebooks(emb, n_codes=64)
    encoded = persist_scoped(
        similarity.build_ivf_pq_index(emb, centroids, books), "probe_pq_index"
    )
    lo = similarity.ivf_pq_topk(
        emb, q, centroids, books, k=10, n_probe=2, k_coarse=200, encoded=encoded
    )
    hi = similarity.ivf_pq_topk(
        emb, q, centroids, books, k=10, n_probe=8, k_coarse=200, encoded=encoded
    )
    t0 = time.perf_counter()
    lo.unionByName(hi).write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    release_scoped("probe_pq_index")
    return dt


def probe_cc_deep_graph(spark, mult: int) -> float:
    """Distributed connected components (driver branch disabled) on a
    synthetic graph of mult x 100k edges arranged as 1000-node chains —
    diameter 999, the shape that punishes O(diameter) min-diffusion.
    With r17 pointer doubling the loop converges in O(log d) rounds, so
    wall-clock should grow near-linearly in edges, not in diameter."""
    from pinterest_data_pipeline_spark.operators import dedup

    n = 100_000 * mult
    pairs = (
        spark.range(n)
        .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
        .filter((F.col("id_b") % 1000) != 0)  # break into 1000-node chains
    )
    # the loop's per-round actions fire INSIDE cluster_pairs, so the whole
    # call is the timed region (unlike the lazy-plan probes)
    t0 = time.perf_counter()
    out = dedup.cluster_pairs(pairs, max_iters=20, driver_cc_cap=0)
    out.groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("cluster_id").alias("s")
    ).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


PROBES = {
    "label_propagation": probe_label_propagation,
    "recall_sweep": probe_recall_sweep,
    "cc_deep_graph": probe_cc_deep_graph,
    "kendall_tau": probe_kendall_tau,
    "js_divergence": probe_js_divergence,
    "did": probe_did,
    "pearson_matrix": probe_pearson_matrix,
    "tpch_q5_6way_join": probe_tpch_q5,
    "simhash_near_dup": probe_simhash,
    "pricing_agg": probe_groupagg,
    # round-5 additions (VERDICT r5 #6)
    "pack_sequences": probe_pack_sequences,
    "cluster_canonical": probe_cluster_canonical,
    "tfidf_post_fix": probe_tfidf,
    "bucketed_join": probe_bucketed_join,
    # round-6 additions
    "quantize_int8": probe_quantize_int8,
    "sessionize_gap": probe_sessionize,
    # round-7 additions (VERDICT r6 #6)
    "column_profile": probe_column_profile,
    "salted_join": probe_salted_join,
    "funnel_steps": probe_funnel_steps,
    "retention_cohorts": probe_retention_cohorts,
    "incremental_rollup": probe_incremental_rollup,
    # late-r7 additions
    "cms_sketch": probe_cms,
    "weighted_sample": probe_weighted_sample,
    "pq_topk": probe_pq_topk,
    "recursive_chain": probe_recursive_chain,
    "ewma_daily": probe_ewma_daily,
    # round-8 additions (VERDICT r7 item 6 roster + the r8 operators)
    "lateral_join": probe_lateral_join,
    "null_safe_join": probe_null_safe_join,
    "binary_hamming": probe_binary_hamming,
    "pattern_match": probe_pattern_match,
    "transition_matrix": probe_transition_matrix,
    "streaming_outer": probe_streaming_outer,
    "streaming_sessions": probe_streaming_sessions,
    "bloom_prefilter": probe_bloom_prefilter,
    "kmv_union": probe_kmv_union,
    "prefix_clusters": probe_prefix_clusters,
    "cdc_apply": probe_cdc_apply,
    "user_streaks": probe_user_streaks,
    "drift_psi": probe_drift_psi,
    "ivf_pq": probe_ivf_pq,
    "mad_events": probe_mad_events,
    "boilerplate": probe_boilerplate,
    "rolling_wau": probe_rolling_wau,
    # round-9 additions (VERDICT r8 items 2/4 + the r9 operators)
    "rolling_wau_horizon": probe_rolling_wau_horizon,
    "mode_deterministic": probe_mode_deterministic,
    "asof_tolerance": probe_asof_tolerance,
    "tdigest": probe_tdigest,
    "tdigest_grouped": probe_tdigest_grouped,
    "multi_draw": probe_multi_draw,
    "rolling_p95": probe_rolling_p95,
    "budget_mix": probe_budget_mix,
    "wau_kmv": probe_wau_kmv,
    "jaccard_prefix": probe_jaccard_prefix,
    "winnow": probe_winnow,
    "weighted_median": probe_weighted_median,
    # round-10 additions
    "weighted_tdigest": probe_weighted_tdigest,
    "filtered_ann": probe_filtered_ann,
    "cdc_scd2": probe_cdc_scd2,
    "sparse_cosine": probe_sparse_cosine,
    "market_basket": probe_market_basket,
    "kmv_overlap": probe_kmv_overlap,
    "jl_projection": probe_jl_projection,
    "percent_rank": probe_percent_rank,
    "deletion_join": probe_deletion_join,
    "triangles": probe_triangles,
    "bm25": probe_bm25,
    "pagerank": probe_pagerank,
    "equidepth": probe_equidepth,
    "interval_join": probe_interval_join,
    "kmeans": probe_kmeans,
    "bfs": probe_bfs,
    "triples": probe_triples,
    # round-10 session-4 additions (kappa and benford share the
    # map-side integer-count shape probed by pricing_agg)
    "clamped_balance": probe_clamped_balance,
    "rfm": probe_rfm,
    "spearman": probe_spearman,
    "bootstrap": probe_bootstrap,
    # round-10 session-5 additions
    "bitmap_retention": probe_bitmap_retention,
    "max_concurrency": probe_max_concurrency,
    "max_concurrency_horizon": probe_max_concurrency_horizon,
    "gini": probe_gini,
    "pmi": probe_pmi,
    "ngram_novelty": probe_ngram_novelty,
    "sorted_neighborhood": probe_sorted_neighborhood,
    "rolling_wau_bitmap": probe_rolling_wau_bitmap,
    "rolling_wau_bitmap_horizon": probe_rolling_wau_bitmap_horizon,
    "char_entropy": probe_char_entropy,
    # round-10 session-6 additions (the GEMM-kernel rewrites + births)
    "knn_audit": probe_knn_audit,
    "k_anonymity": probe_k_anonymity,
    "simpsons": probe_simpsons,
    "split_contamination": probe_split_contamination,
    "fs_linkage": probe_fs_linkage,
    "bigram_logloss": probe_bigram_logloss,
    "shared_ngram": probe_shared_ngram,
    "fs_linkage_fixed_domain": probe_fs_linkage_fixed_domain,
    "fs_linkage_coarse_fixed": probe_fs_linkage_coarse_fixed,
    "spatial_neighbors": probe_spatial_neighbors,
    # round-11 additions (VERDICT r10 item 4: the last distinct-domain
    # global windows reshaped via two_phase_running, probed with the
    # DOMAIN grown alongside the data)
    "skyline": probe_skyline,
    "ks_cdf": probe_ks_cdf,
    "fifo_allocation": probe_fifo_allocation,
    "rolling_median": probe_rolling_median,
    # round-14 addition (VERDICT r13 item 6): incremental dedup must
    # track the BATCH, not the corpus — the store grows, the batch stays
    "incremental_dedup": probe_incremental_dedup,
    "incremental_clusters": probe_incremental_clusters,
    "cumulative_users_horizon": probe_cumulative_users_horizon,
    "cusum_horizon": probe_cusum_horizon,
    "kaplan_meier_horizon": probe_kaplan_meier_horizon,
    # round-16 additions (VERDICT r15 item 1): centroid-retrain migration
    # cost = map-only rescoring floor + rewrite of TOUCHED cells only
    "ivf_retrain_noop": probe_ivf_retrain_noop,
    "ivf_retrain_drift": probe_ivf_retrain_drift,
    # round-16 (VERDICT r15 item 5): bucket-store compaction — the
    # arrival scan is flat after N fragmented appends once compacted
    "bucket_arrival_fragmented": probe_bucket_arrival_fragmented,
    "bucket_arrival_compacted": probe_bucket_arrival_compacted,
}


def main() -> None:
    # integer args are multipliers; string args filter probes by name
    mults = [int(a) for a in sys.argv[1:] if a.isdigit()] or [1, 8]
    names = [a for a in sys.argv[1:] if not a.isdigit()]
    probes = {n: PROBES[n] for n in names} if names else PROBES
    # big-mult text-similarity probes need wider shuffles than the core
    # count (partition row volume, not parallelism, is the constraint)
    extra = {}
    if os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS"):
        extra["spark.sql.shuffle.partitions"] = os.environ[
            "SPARK_GRAFT_SHUFFLE_PARTITIONS"
        ]
    spark = get_spark("scale_probe", extra_conf=extra or None)
    probe_groupagg(spark, 1)  # warm-up
    for name, fn in probes.items():
        for m in mults:
            secs = round(fn(spark, m), 2)
            print(json.dumps({"probe": name, "mult": m, "sec": secs}))


if __name__ == "__main__":
    main()
