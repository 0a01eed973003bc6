"""DuckDB oracle SQL duals for the query battery in ``analytics.py``.

Each string must be runnable by DuckDB against the pre-registered views
(region nation customer supplier part orders lineitem events documents
embeddings) and produce the same columns (by name) and values as the Spark
DataFrame query of the same key. Keep aliases in lockstep with the Spark side
— the driver sorts columns by name before value-hashing.
"""

from __future__ import annotations

ORACLES: dict[str, str] = {}


def oracle(name: str):
    """Decorator-style registrar so each SQL sits next to its docstring."""

    def _register(sql: str) -> str:
        ORACLES[name] = sql
        return sql

    return _register


oracle("q1_top_brand_per_nation")(
    """
    WITH counts AS (
        SELECT n.n_name, p.p_brand, count(*) AS brand_count
        FROM lineitem l
        JOIN orders o    ON l.l_orderkey = o.o_orderkey
        JOIN customer c  ON o.o_custkey  = c.c_custkey
        JOIN nation n    ON c.c_nationkey = n.n_nationkey
        JOIN part p      ON l.l_partkey  = p.p_partkey
        GROUP BY n.n_name, p.p_brand
    ), ranked AS (
        SELECT n_name, p_brand, brand_count,
               rank() OVER (PARTITION BY n_name ORDER BY brand_count DESC) AS ranking
        FROM counts
    )
    SELECT n_name, p_brand, brand_count
    FROM ranked WHERE ranking = 1
    ORDER BY brand_count DESC, n_name, p_brand
    """
)
