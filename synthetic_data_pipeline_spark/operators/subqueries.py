"""Subquery-shaped relational queries (TPC-H Q2/Q11/Q15/Q18/Q19/Q22
patterns): scalar subqueries, IN-subqueries, HAVING over grouped
aggregates, OR-of-ANDs predicate pushdown, correlated NOT EXISTS.

These are written ONCE in engine-neutral ANSI SQL: the Spark builder
registers the parquet tables as temp views and runs the exact same text
the DuckDB oracle runs — a direct proof of the SQL front-end's
compatibility surface (and Catalyst's subquery decorrelation: scalar
subqueries become broadcast joins, IN becomes a left-semi join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.rounding import apply_sql_eround
from ..sources.tables import register_views

_SQL = {
    # Q2 shape: row(s) holding the per-group minimum, joined back.
    "q70_cheapest_supplier_per_nation": """
        SELECT n_name, s_name, s_acctbal
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN (
          SELECT s_nationkey AS nk, min(s_acctbal) AS min_bal
          FROM supplier GROUP BY s_nationkey
        ) m ON s_nationkey = m.nk AND s_acctbal = m.min_bal
        ORDER BY n_name, s_name
    """,
    # Q11 shape: HAVING against a scalar subquery over the whole table.
    "q71_important_parts": """
        SELECT l_partkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        GROUP BY l_partkey
        HAVING round(sum(l_extendedprice * (1 - l_discount)), 2) > (
          SELECT round(0.0008 * sum(l_extendedprice * (1 - l_discount)), 2)
          FROM lineitem
        )
        ORDER BY l_partkey
    """,
    # Q15 shape: the group(s) achieving the global maximum.
    "q72_top_revenue_nation": """
        WITH nation_rev AS (
          SELECT n_name,
                 round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
          FROM customer
          JOIN orders   ON c_custkey = o_custkey
          JOIN lineitem ON o_orderkey = l_orderkey
          JOIN nation   ON c_nationkey = n_nationkey
          GROUP BY n_name
        )
        SELECT n_name, revenue FROM nation_rev
        WHERE revenue = (SELECT max(revenue) FROM nation_rev)
        ORDER BY n_name
    """,
    # Q18 shape: IN over an aggregated-HAVING subquery.
    "q73_large_quantity_orders": """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE o_orderkey IN (
          SELECT l_orderkey FROM lineitem
          GROUP BY l_orderkey HAVING sum(l_quantity) > 150
        )
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    # Q19 shape: disjunction of conjunctive range predicates — Catalyst
    # must still push the common join key and fold the OR branches.
    "q74_disjunctive_revenue": """
        SELECT round(coalesce(sum(l_extendedprice * (1 - l_discount)), 0.0), 2) AS revenue,
               count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_size <= 10 AND l_quantity >= 1 AND l_quantity <= 20)
           OR (p_size > 40 AND l_quantity >= 30)
           OR (p_retailprice > 1800.0 AND l_discount < 0.02)
    """,
    # Q22 shape: filter against a scalar average + anti-join.
    "q75_wealthy_inactive_customers": """
        SELECT c_mktsegment, count(*) AS n_customers,
               round(sum(c_acctbal), 2) AS total_bal
        FROM customer c
        WHERE c_acctbal > (
          SELECT round(avg(c_acctbal), 2) FROM customer WHERE c_acctbal > 0.0
        )
        AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0
        )
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    # Q7 shape: nation-pair trade volume (customer nation × supplier
    # nation), both dims broadcast twice under different aliases.
    "q77_nation_pair_volume": """
        SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
               count(*) AS n_lineitems,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS volume
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE cn.n_name < sn.n_name
        GROUP BY cn.n_name, sn.n_name
        HAVING count(*) >= 5
        ORDER BY cust_nation, supp_nation
    """,
    # Q14 shape: conditional share of revenue (promo percentage).
    "q78_brand_revenue_share": """
        SELECT round(
                 100.0 * sum(CASE WHEN p_brand = 'Brand#1'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0.0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS brand1_share_pct,
               count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
    # GROUPING SETS (A9 beyond rollup/cube).
    "q76_grouping_sets": """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               count(*) AS n_items,
               round(sum(l_extendedprice), 2) AS total_price
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY returnflag, linestatus
    """,
}

_SQL = {k: apply_sql_eround(v) for k, v in _SQL.items()}

_NEEDED = ["supplier", "nation", "customer", "orders", "lineitem", "part"]


def _builder(sql: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir, _NEEDED)
        return spark.sql(sql)

    return run


QUERIES = {name: _builder(sql) for name, sql in _SQL.items()}
ORACLES = dict(_SQL)
