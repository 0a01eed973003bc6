"""Data-quality expectations: declarative constraint checks over a DataFrame.

The gate every production pipeline puts between ingest and publish (Deequ /
dbt-test shape): declare constraints, evaluate them ALL in one aggregation
pass, get a (check, passed, observed) report. One job, no per-check scans —
at 100 TB the difference between a quality gate and a quality bill.

Each check compiles to an aggregate expression; ``run_checks`` unions them
into a single ``agg`` so Catalyst evaluates every constraint in one
map-side-partial pass over the data.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Check:
    name: str
    observed: Column  # aggregate expression producing the observed metric
    passed: Column  # boolean over the observed metric


def not_null(col: str, max_null_frac: float = 0.0) -> Check:
    """Fraction of NULLs in ``col`` must not exceed ``max_null_frac``."""
    frac = F.round(
        F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)) / F.count(F.lit(1)), 6
    )
    name = f"not_null({col})" if max_null_frac == 0.0 else f"not_null({col},max={max_null_frac})"
    return Check(name, frac, frac <= max_null_frac)


def unique(col: str) -> Check:
    """``col`` must have no duplicate values (count == distinct count)."""
    dups = F.count(col) - F.countDistinct(col)
    return Check(f"unique({col})", dups.cast("double"), dups == 0)


def in_range(col: str, lo: float, hi: float) -> Check:
    """Every non-null value of ``col`` must lie in [lo, hi]."""
    viol = F.sum(
        F.when(F.col(col).isNotNull() & ~F.col(col).between(lo, hi), 1).otherwise(0)
    )
    return Check(f"in_range({col},{lo},{hi})", viol.cast("double"), viol == 0)


def accepted_values(col: str, values: list) -> Check:
    """Every non-null value of ``col`` must be in ``values``."""
    viol = F.sum(
        F.when(F.col(col).isNotNull() & ~F.col(col).isin(values), 1).otherwise(0)
    )
    return Check(f"accepted_values({col})", viol.cast("double"), viol == 0)


def row_count_at_least(n: int) -> Check:
    cnt = F.count(F.lit(1))
    return Check(f"row_count_at_least({n})", cnt.cast("double"), cnt >= n)


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate all checks in ONE aggregation pass.

    Returns (check_name, observed, passed) — one row per check, produced by
    unpivoting a single-row aggregate, so the input is scanned exactly once
    regardless of how many constraints are declared.
    """
    agg_cols = []
    for i, c in enumerate(checks):
        agg_cols.append(c.observed.cast("double").alias(f"obs_{i}"))
        agg_cols.append(c.passed.cast("boolean").alias(f"ok_{i}"))
    row = df.agg(*agg_cols)
    entries = F.array(
        *[
            F.struct(
                F.lit(c.name).alias("check_name"),
                F.col(f"obs_{i}").alias("observed"),
                F.col(f"ok_{i}").alias("passed"),
            )
            for i, c in enumerate(checks)
        ]
    )
    return row.select(F.explode(entries).alias("e")).select(
        "e.check_name", "e.observed", "e.passed"
    )


def profile_columns(
    df: DataFrame, numeric_cols: list[str], other_cols: list[str] | None = None
) -> DataFrame:
    """Per-column data profile — the first thing a training-data pipeline
    computes over a new source: rows, nulls, distinct cardinality, numeric
    bounds, one row per column.

    Same single-pass shape as :func:`run_checks`: every column's metrics
    are aggregate expressions in ONE ``agg`` (Catalyst plans the multiple
    DISTINCTs via one Expand), then the single result row unpivots into
    (column_name, n_rows, n_nulls, n_distinct, min_value, max_value) rows.
    At 100 TB this is one scan, not one scan per column; for wider tables,
    swap ``countDistinct`` for ``approx_count_distinct`` (same plan shape,
    no Expand multiplier).
    """
    other_cols = other_cols or []
    cols = list(numeric_cols) + list(other_cols)
    agg_cols = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        agg_cols.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(f"nn_{c}")
        )
        agg_cols.append(F.countDistinct(F.col(c)).alias(f"nd_{c}"))
        if c in numeric_cols:
            agg_cols.append(F.min(F.col(c)).cast("double").alias(f"mn_{c}"))
            agg_cols.append(F.max(F.col(c)).cast("double").alias(f"mx_{c}"))
    row = df.agg(*agg_cols)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("n_rows").alias("n_rows"),
                F.col(f"nn_{c}").alias("n_nulls"),
                F.col(f"nd_{c}").alias("n_distinct"),
                (F.col(f"mn_{c}") if c in numeric_cols else F.lit(None).cast("double")).alias("min_value"),
                (F.col(f"mx_{c}") if c in numeric_cols else F.lit(None).cast("double")).alias("max_value"),
            )
            for c in cols
        ]
    )
    return row.select(F.explode(entries).alias("e")).select("e.*")


def observed_write(df: DataFrame, path: str, metrics: dict[str, Column]):
    """Write with in-flight metrics: ``df.observe`` accumulates the given
    aggregate expressions DURING the write job — row counts, null counts,
    sums — with zero extra passes over the data. The production pattern for
    emit-metrics-with-every-job: at 100 TB a separate metrics scan is a
    second job; observation is free.

    Returns the collected metrics row as a dict.
    """
    from pyspark.sql import Observation

    obs = Observation("write_metrics")
    observed = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    observed.write.mode("overwrite").parquet(path)
    return dict(zip(metrics.keys(), [obs.get[n] for n in metrics]))
