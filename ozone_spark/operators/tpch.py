"""General relational benchmark queries over the driver's TPC-H-ish
tables — the engine's headline scan/agg/join workloads (bench.py).

These exercise the same physical shapes the namespace operators rely on
(hash-agg with partial aggregation, broadcast + shuffle joins, top-k)
on the largest fixture tables.  Double aggregates are rounded for
cross-engine comparison.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import broadcast


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1 shape: full-scan groupBy with many aggregates."""
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def shipping_priority(customer: DataFrame, orders: DataFrame,
                      lineitem: DataFrame) -> DataFrame:
    """TPC-H Q3 shape: selective join + agg + top-k."""
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    cutoff = F.lit("1998-01-01").cast("timestamp")
    return (
        customer.where(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .where(F.col("o_orderdate") < cutoff)
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey",
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
                "o_orderpriority", "revenue")
    )


def region_revenue(region: DataFrame, nation: DataFrame, customer: DataFrame,
                   orders: DataFrame, lineitem: DataFrame,
                   supplier: DataFrame) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with broadcast dimensions, revenue per
    nation.  (Supplier-nation == customer-nation as in Q5.)"""
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    dims = (
        region.join(nation, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("r_name", "n_nationkey", "n_name")
    )
    return (
        lineitem
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(broadcast(dims), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("r_name", "n_name")
        .agg(F.round(F.sum(revenue), 2).alias("revenue"),
             F.count("*").alias("n_items"))
        .orderBy("r_name", "n_name")
    )


def order_priority_counts(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q4 shape: semi-join existence check + count per priority."""
    late = lineitem.where(F.col("l_returnflag") == "R").select("l_orderkey").distinct()
    return (
        orders.join(late, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def customer_order_distribution(customer: DataFrame,
                                orders: DataFrame) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed k orders, INCLUDING
    the zero-order customers a plain inner join would drop — the
    left-outer-join + two-level aggregate every retention/engagement
    report needs.

    Scale shape: one outer-join shuffle on the customer key (AQE
    handles the null-key/zero-order skew side), then a tiny second
    aggregate over at most max-orders-per-customer distinct counts."""
    per_cust = (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"),
                      "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def returned_item_customers(customer: DataFrame, orders: DataFrame,
                            lineitem: DataFrame, nation: DataFrame,
                            top_n: int = 20) -> DataFrame:
    """TPC-H Q10 shape: lost-revenue report — customers ranked by the
    revenue of line items they returned, with nation context.

    Scale shape: the returned-lineitem filter pushes to the parquet
    scan before the orders join (the only big-big shuffle); customer is
    a dimension-side hash join and nation a broadcast.  Ordering is on
    the ROUNDED revenue with a c_custkey tiebreak so the top-k cut is
    deterministic across engines despite distributed float-sum order."""
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.where(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(top_n)
        .select("c_custkey", "c_name", "revenue",
                F.round("c_acctbal", 2).alias("c_acctbal"), "n_name")
    )


def priority_line_counts(orders: DataFrame, lineitem: DataFrame,
                         year: str = "1996") -> DataFrame:
    """TPC-H Q12 shape: conditional (CASE) aggregation after a fact
    join — per line status, how many shipped lines belong to
    high-priority vs low-priority orders.  (The synthetic lineitem has
    no l_shipmode/commitdate, so the group key is l_linestatus and the
    window is a ship-date year; the physical shape — pushed range
    filter, one shuffle join, map-side conditional partial agg — is
    Q12's.)"""
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem
        .where((F.col("l_shipdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
               & (F.col("l_shipdate") < F.lit(f"{int(year) + 1}-01-01")
                  .cast("timestamp")))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(F.sum(high.cast("long")).alias("high_line_count"),
             F.sum((~high).cast("long")).alias("low_line_count"))
        .orderBy("l_linestatus")
    )


def promo_revenue_share(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q14 shape: promotion revenue share per ship month — the
    broadcast-dimension join + ratio-of-conditional-sums pattern.

    Scale shape: part projects to (p_partkey, p_type) and broadcasts;
    the fact table is never shuffled (map-side join + partial agg on
    the month key), so the plan is one scan + one tiny final agg
    exchange regardless of lineitem volume."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        lineitem
        .join(broadcast(part.select("p_partkey", "p_type")),
              F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.date_format(F.date_trunc("month", "l_shipdate"),
                               "yyyy-MM").alias("ship_month"))
        .agg(F.round(100 * F.sum(promo) / F.sum(rev), 4).alias("promo_share"),
             F.round(F.sum(rev), 2).alias("revenue"))
        .orderBy("ship_month")
    )


def forecast_revenue_change(lineitem: DataFrame, year: str = "1996",
                            discount: float = 0.05,
                            max_qty: int = 24) -> DataFrame:
    """TPC-H Q6 shape: scan-only aggregate under conjunctive range
    predicates — every filter (ship-date year, discount band, quantity
    cap) pushes to the parquet scan, so the plan is a pruned scan plus
    a one-row partial/final aggregate with no joins and no shuffle of
    data rows."""
    return (
        lineitem
        .where((F.col("l_shipdate") >= F.lit(f"{year}-01-01")
                .cast("timestamp"))
               & (F.col("l_shipdate") < F.lit(f"{int(year) + 1}-01-01")
                  .cast("timestamp"))
               & (F.col("l_discount") >= discount - 0.011)
               & (F.col("l_discount") <= discount + 0.011)
               & (F.col("l_quantity") < max_qty))
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")),
                     2).alias("revenue"),
             F.count("*").alias("n_lines"))
    )


def discounted_brand_revenue(lineitem: DataFrame,
                             part: DataFrame) -> DataFrame:
    """TPC-H Q19 shape: disjunctive (OR-of-ANDs) predicates spanning
    both join sides — the filter can only apply AFTER the part join,
    so the plan is a broadcast hash join with the composite predicate
    evaluated post-join, grouped per brand.

    Scale shape: part broadcasts (two columns); each OR clause alone
    would pre-filter poorly, but the join output is still one map-side
    pass — no shuffle of lineitem, one tiny final agg exchange."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    clause = (
        ((F.col("p_brand") == "Brand#12") & (F.col("l_quantity") >= 1)
         & (F.col("l_quantity") <= 20) & (F.col("p_size") <= 10))
        | ((F.col("p_brand") == "Brand#23") & (F.col("l_quantity") >= 10)
           & (F.col("l_quantity") <= 30) & (F.col("p_size") <= 20))
        | ((F.col("p_brand") == "Brand#34") & (F.col("l_quantity") >= 20)
           & (F.col("l_quantity") <= 40) & (F.col("p_size") <= 30))
    )
    return (
        lineitem
        .join(broadcast(part.select("p_partkey", "p_brand", "p_size")),
              F.col("l_partkey") == F.col("p_partkey"))
        .where(clause)
        .groupBy("p_brand")
        .agg(F.round(F.sum(rev), 2).alias("revenue"),
             F.count("*").alias("n_lines"))
        .orderBy("p_brand")
    )


def large_volume_orders(customer: DataFrame, orders: DataFrame,
                        lineitem: DataFrame,
                        min_quantity: int = 300) -> DataFrame:
    """TPC-H Q18 shape: orders whose total line quantity exceeds a
    threshold, with customer context — the aggregated-filter semi-join
    (HAVING subquery) pattern.

    Scale shape: the heavy-hitter order set is computed by one partial
    aggregation over lineitem and is tiny (it is a top tail by
    construction), so it joins back as a broadcast semi-join; only the
    surviving orders join customer.  No correlated subquery, no
    re-aggregation of the full fact table."""
    heavy = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > min_quantity)
    )
    return (
        orders.join(broadcast(heavy),
                    F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "o_orderkey",
                F.date_format("o_orderdate", "yyyy-MM-dd")
                .alias("order_date"),
                F.round("o_totalprice", 2).alias("o_totalprice"),
                F.round("total_qty", 2).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )
