"""Scalar functions and TPC-H-shaped analytics — QuerySpecs + DuckDB oracle SQL twins (split out of the
single-module registry in round 8; see ozone_spark/registry/__init__.py).
"""

from __future__ import annotations

from ._base import *  # noqa: F401,F403 — shared registry namespace


# ---------------------------------------------------------------------------
# scalar function surface (§2.7: checksums / etag / string fns)
# ---------------------------------------------------------------------------


def _etag_fn(spark, sf):
    import pyspark.sql.functions as F
    keys = views(spark, sf)["keys"]
    return (
        keys.where((F.col("volume") == "vol0") & (F.col("bucket") == "b0"))
        .select(
            "db_key",
            F.md5("db_key").alias("etag"),
            F.sha2(F.col("db_key"), 256).alias("sha256_hex"),
            F.length("db_key").cast("long").alias("key_len"),
        )
    )


SCALAR_QUERIES = [
    _q(
        "etag_checksums",
        _etag_fn,
        with_views(
            """SELECT db_key, md5(db_key) AS etag, sha256(db_key) AS sha256_hex,
  CAST(length(db_key) AS BIGINT) AS key_len
FROM keys WHERE volume = 'vol0' AND bucket = 'b0'""",
            ["keys"],
        ),
    ),
]

# ---------------------------------------------------------------------------
# relational headline queries (bench)
# ---------------------------------------------------------------------------

TPCH_QUERIES = [
    _q(
        "pricing_summary",
        lambda spark, sf: tpch.pricing_summary(views(spark, sf)["lineitem"]),
        """SELECT l_returnflag, l_linestatus,
  round(sum(l_quantity), 2) AS sum_qty,
  round(sum(l_extendedprice), 2) AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
  round(avg(l_quantity), 4) AS avg_qty,
  round(avg(l_extendedprice), 4) AS avg_price,
  round(avg(l_discount), 4) AS avg_disc,
  count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY 1, 2 ORDER BY 1, 2""",
        bench=True,
    ),
    _q(
        "shipping_priority",
        lambda spark, sf: tpch.shipping_priority(
            views(spark, sf)["customer"], views(spark, sf)["orders"],
            views(spark, sf)["lineitem"]),
        """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
  o_orderpriority, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1, 2, 3 ORDER BY revenue DESC, l_orderkey LIMIT 10""",
        bench=True,
    ),
    _q(
        "region_revenue",
        lambda spark, sf: tpch.region_revenue(
            views(spark, sf)["region"], views(spark, sf)["nation"],
            views(spark, sf)["customer"], views(spark, sf)["orders"],
            views(spark, sf)["lineitem"], views(spark, sf)["supplier"]),
        """SELECT r_name, n_name,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
  count(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
GROUP BY 1, 2 ORDER BY 1, 2""",
        bench=True,
    ),
    _q(
        "order_priority_counts",
        lambda spark, sf: tpch.order_priority_counts(
            views(spark, sf)["orders"], views(spark, sf)["lineitem"]),
        """SELECT o_orderpriority, count(*) AS order_count
FROM orders WHERE o_orderkey IN
  (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
GROUP BY 1 ORDER BY 1""",
    ),
]
