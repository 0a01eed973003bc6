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

oracle("q2_orders_per_brand_year")(
    """
    SELECT year(o.o_orderdate)::int AS order_year, p.p_brand,
           count(*) AS order_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p   ON l.l_partkey  = p.p_partkey
    WHERE year(o.o_orderdate) BETWEEN 1995 AND 1998
    GROUP BY 1, 2
    ORDER BY order_year DESC, p_brand
    """
)

oracle("q3_top_supplier_per_nation")(
    """
    WITH ranked AS (
        SELECT n.n_name, s.s_name, s.s_acctbal,
               rank() OVER (PARTITION BY n.n_name ORDER BY s.s_acctbal DESC) AS ranking
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    )
    SELECT n_name, s_name, round(max(s_acctbal), 2) AS top_acctbal
    FROM ranked WHERE ranking = 1
    GROUP BY n_name, s_name
    ORDER BY top_acctbal
    """
)

oracle("q4_nation_with_top_supplier")(
    """
    WITH ranked AS (
        SELECT n.n_name, s.s_acctbal,
               rank() OVER (PARTITION BY n.n_name ORDER BY s.s_acctbal DESC) AS ranking
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    )
    SELECT n_name, round(max(s_acctbal), 2) AS top_acctbal
    FROM ranked WHERE ranking = 1
    GROUP BY n_name
    ORDER BY top_acctbal DESC, n_name
    LIMIT 1
    """
)

_BALANCE_BAND_SQL = """CASE WHEN c_acctbal >= 0    AND c_acctbal < 2500 THEN '0-2.5k'
         WHEN c_acctbal >= 2500 AND c_acctbal < 5000 THEN '2.5k-5k'
         WHEN c_acctbal >= 5000 AND c_acctbal < 7500 THEN '5k-7.5k'
         WHEN c_acctbal >= 7500 THEN '7.5k+'
         ELSE 'negative' END"""

oracle("q5_top_segment_per_balance_band")(
    f"""
    SELECT {_BALANCE_BAND_SQL} AS balance_band, c_mktsegment,
           count(*) AS customer_count
    FROM customer
    GROUP BY 1, 2
    ORDER BY customer_count DESC, balance_band, c_mktsegment
    """
)

oracle("q6_median_acctbal_per_band")(
    f"""
    SELECT {_BALANCE_BAND_SQL} AS balance_band,
           round(quantile_cont(c_acctbal, 0.5), 4) AS median_acctbal
    FROM customer
    GROUP BY 1
    ORDER BY median_acctbal DESC
    """
)

oracle("q7_orders_per_year")(
    """
    SELECT year(o_orderdate)::int AS order_year, count(*) AS number_orders
    FROM orders
    WHERE year(o_orderdate) BETWEEN 1995 AND 2000
    GROUP BY 1 ORDER BY 1
    """
)

oracle("q8_median_price_by_year")(
    """
    SELECT year(o_orderdate)::int AS order_year,
           round(quantile_cont(o_totalprice, 0.5), 4) AS median_price
    FROM orders
    WHERE year(o_orderdate) BETWEEN 1995 AND 2000
    GROUP BY 1 ORDER BY 1
    """
)

oracle("q9_median_price_by_year_priority")(
    """
    SELECT year(o_orderdate)::int AS order_year, o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4) AS median_price
    FROM orders
    WHERE year(o_orderdate) BETWEEN 1995 AND 2000
    GROUP BY 1, 2 ORDER BY 1, 2
    """
)

# --- cleaning operators over testdata --------------------------------------

oracle("clean_normalize_nulls_documents")(
    """
    SELECT doc_id,
           CASE WHEN lang IS NULL OR lang = '' OR lang IN ('src0','src1','es')
                THEN NULL ELSE lang END AS lang,
           CASE WHEN source IS NULL OR source = '' OR source IN ('src0','src1','es')
                THEN NULL ELSE source END AS source
    FROM documents ORDER BY doc_id
    """
)

oracle("clean_parse_human_count_part")(
    """
    SELECT p_partkey,
           CASE WHEN p_size < 20 THEN p_size::varchar || 'k'
                WHEN p_size < 40 THEN p_size::varchar || 'M'
                ELSE p_size::varchar END AS raw_count,
           CASE WHEN p_size < 20 THEN p_size * 1000
                WHEN p_size < 40 THEN p_size * 1000000
                ELSE p_size END::int AS parsed_count
    FROM part ORDER BY p_partkey
    """
)

oracle("clean_strip_prefix_part")(
    """
    SELECT p_partkey,
           regexp_replace('Local save in /data/' || p_type, '^Local save in', '')
               AS save_location
    FROM part ORDER BY p_partkey
    """
)

oracle("clean_age_group_customers")(
    """
    SELECT CASE WHEN (c_custkey % 80) BETWEEN 18 AND 24 THEN '18-24'
                WHEN (c_custkey % 80) BETWEEN 25 AND 35 THEN '25-35'
                WHEN (c_custkey % 80) BETWEEN 36 AND 50 THEN '36-50'
                WHEN (c_custkey % 80) > 50 THEN '50+' END AS age_bucket,
           count(*) AS customer_count
    FROM customer GROUP BY 1 ORDER BY age_bucket
    """
)

oracle("clean_scalar_functions")(
    """
    SELECT n_nationkey,
           trim('  ' || n_name || ' ') AS trimmed_name,
           n_name || ' ' || n_regionkey::varchar AS name_region,
           upper(n_name) AS upper_name,
           lower(n_name) AS lower_name,
           substring(n_name, 1, 3) AS name_prefix,
           length(n_name)::int AS name_len,
           abs(n_nationkey - 12)::int AS abs_diff,
           coalesce(nullif(n_name, n_name), 'fallback') AS coalesced
    FROM nation ORDER BY n_nationkey
    """
)

oracle("clean_distinct_flag_status")(
    """
    SELECT DISTINCT l_returnflag, l_linestatus
    FROM lineitem ORDER BY l_returnflag, l_linestatus
    """
)

# --- window-function suite --------------------------------------------------

oracle("window_order_sequence")(
    """
    SELECT o_orderkey, o_custkey,
           row_number() OVER w AS order_seq,
           lag(o_totalprice) OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           ntile(4) OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_orderkey
    """
)

oracle("window_running_revenue")(
    """
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS running_total
    FROM orders ORDER BY o_orderkey
    """
)

# --- set ops + semi/anti/outer joins ----------------------------------------

oracle("set_ops_customers")(
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_acctbal < 0
    ORDER BY c_custkey
    """
)

oracle("set_ops_intersect")(
    """
    SELECT o_custkey FROM orders WHERE o_totalprice > 50000
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_totalprice < 5000
    ORDER BY o_custkey
    """
)

oracle("join_semi_customers_with_orders")(
    """
    SELECT c_mktsegment, count(*) AS customer_count
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """
)

oracle("join_anti_customers_without_orders")(
    """
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """
)

oracle("join_outer_order_counts")(
    """
    SELECT c.c_custkey, coalesce(n, 0) AS order_count
    FROM customer c
    LEFT JOIN (SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey) o
           ON c.c_custkey = o.o_custkey
    ORDER BY c.c_custkey
    """
)

# --- rollup / cube / pivot / multi-distinct ---------------------------------

oracle("agg_rollup_region_nation")(
    """
    SELECT r.r_name, n.n_name, count(*) AS customer_count
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    ORDER BY r_name, n_name
    """
)

oracle("agg_cube_flag_status")(
    """
    SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS total_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY l_returnflag, l_linestatus
    """
)

oracle("agg_pivot_status_revenue")(
    """
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_extendedprice END), 2) AS "O",
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_extendedprice END), 2) AS "F"
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """
)

oracle("agg_count_distinct")(
    """
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS distinct_parts,
           count(DISTINCT l_suppkey) AS distinct_suppliers
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """
)

oracle("agg_stats_suite")(
    """
    SELECT l_returnflag,
           round(min(l_extendedprice), 2) AS min_price,
           round(max(l_extendedprice), 2) AS max_price,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(stddev_samp(l_extendedprice), 4) AS stddev_price
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """
)

# --- nested data / json / dates ---------------------------------------------

oracle("explode_document_tokens")(
    """
    SELECT token, count(*) AS token_count
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token HAVING count(*) >= 10
    ORDER BY token_count DESC, token
    """
)

oracle("json_extract_event_props")(
    """
    SELECT event_id, json_extract(props, '$.k')::int AS prop_k
    FROM events
    WHERE json_extract(props, '$.k') IS NOT NULL
    ORDER BY event_id
    """
)

oracle("events_daily_rollup")(
    """
    SELECT date_trunc('day', ts)::date AS day, event_type,
           count(*) AS event_count,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY 1, 2 ORDER BY day, event_type
    """
)

oracle("events_tumbling_window")(
    """
    SELECT strftime(time_bucket(INTERVAL '6 hours', ts), '%Y-%m-%d %H:%M:%S')
               AS window_start,
           event_type, count(*) AS event_count
    FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
    """
)

oracle("top_k_orders")(
    """
    SELECT o_orderkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """
)
