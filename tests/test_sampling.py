"""Sampling/splitting invariants: determinism, disjointness, rates, caps."""

from __future__ import annotations

from pyspark.sql import functions as F

from pinterest_data_pipeline_spark.operators import sampling
from pinterest_data_pipeline_spark.session import load_table

SF = "/root/testdata/sf0.01"


def test_hash_split_is_deterministic_under_reordering(spark):
    """Membership is a pure function of the id: shuffling row order and
    partitioning must not move any row between splits."""
    docs = load_table(spark, SF, "documents")
    a = sampling.hash_split(docs, "doc_id").select("doc_id", "split")
    b = sampling.hash_split(
        docs.repartition(7).orderBy(F.desc("n_chars")), "doc_id"
    ).select("doc_id", "split")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_hash_split_partitions_every_row_exactly_once(spark):
    docs = load_table(spark, SF, "documents")
    tagged = sampling.hash_split(docs, "doc_id")
    assert tagged.count() == docs.count()
    assert tagged.filter(F.col("split").isNull()).count() == 0
    # fractions should be near the 80/10/10 weights (binomial tolerance)
    n = docs.count()
    rates = {r.split: r.cnt / n for r in tagged.groupBy("split").agg(F.count("*").alias("cnt")).collect()}
    assert abs(rates["train"] - 0.8) < 0.06
    assert abs(rates.get("valid", 0) - 0.1) < 0.05
    assert abs(rates.get("test", 0) - 0.1) < 0.05


def test_hash_split_stable_under_corpus_growth(spark):
    """Adding rows never reassigns existing ids (incremental-ingest safety)."""
    docs = load_table(spark, SF, "documents")
    subset = docs.filter(F.col("doc_id") < 100)
    full = sampling.hash_split(docs, "doc_id").filter(F.col("doc_id") < 100)
    sub = sampling.hash_split(subset, "doc_id")
    assert full.select("doc_id", "split").exceptAll(sub.select("doc_id", "split")).count() == 0


def test_per_group_sample_caps_and_is_deterministic(spark):
    docs = load_table(spark, SF, "documents")
    capped = sampling.per_group_sample(docs, "lang", "doc_id", n=10)
    sizes = capped.groupBy("lang").agg(F.count("*").alias("n")).collect()
    assert all(r.n <= 10 for r in sizes)
    again = sampling.per_group_sample(docs.repartition(5), "lang", "doc_id", n=10)
    assert capped.select("doc_id").exceptAll(again.select("doc_id")).count() == 0


def test_stratified_sample_rates_within_tolerance(spark):
    docs = load_table(spark, SF, "documents")
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    sampled = sampling.stratified_sample(docs, "lang", {lg: 0.5 for lg in langs})
    totals = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    got = {r.lang: r.n for r in sampled.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lg in langs:
        assert abs(got.get(lg, 0) / totals[lg] - 0.5) < 0.2  # binomial, ~100/stratum


def test_weighted_sample_is_deterministic_and_sized(spark):
    docs = load_table(spark, SF, "documents")
    a = sampling.weighted_sample(docs, "doc_id", "n_chars", k=50)
    b = sampling.weighted_sample(docs.repartition(9), "doc_id", "n_chars", k=50)
    assert a.count() == 50
    assert a.select("doc_id").exceptAll(b.select("doc_id")).count() == 0


def test_weighted_sample_prefers_heavy_rows(spark):
    """10 rows with weight 1e9 against 990 with weight 1: A-ES keys for the
    heavy rows sit at u^(1e-9) ~ 1 while light rows draw plain u, so all 10
    heavy ids must be selected (deterministic under the fixed md5 salt)."""
    rows = [(i, 10**9 if i < 10 else 1) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, w long")
    picked = {r.id for r in sampling.weighted_sample(df, "id", "w", k=10).collect()}
    assert picked == set(range(10))


def test_weighted_sample_clamps_nonpositive_weights(spark):
    df = spark.createDataFrame([(i, 0) for i in range(100)], "id long, w long")
    assert sampling.weighted_sample(df, "id", "w", k=20).count() == 20
