"""General relational benchmark queries over the driver's TPC-H-ish
tables — the engine's headline scan/agg/join workloads (bench.py).

These exercise the same physical shapes the namespace operators rely on
(hash-agg with partial aggregation, broadcast + shuffle joins, top-k)
on the largest fixture tables.  Double aggregates are rounded for
cross-engine comparison.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.functions import broadcast

from ozone_spark.functions.dedup import _slot_cache


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

def volume_shipping(lineitem: DataFrame, orders: DataFrame,
                    customer: DataFrame, supplier: DataFrame,
                    nation: DataFrame, nation_a: str = "NATION_1",
                    nation_b: str = "NATION_2") -> DataFrame:
    """TPC-H Q7 shape: bilateral trade flows — revenue shipped between
    a nation PAIR (both directions) per ship year.

    Scale shape: both nation lookups broadcast (supplier side is also a
    broadcast — the supplier table is dimension-sized), and the pair
    predicate prunes each broadcast to the two nations BEFORE the fact
    join, so lineitem rows from any other supplier nation never reach
    the orders shuffle; the only big-big exchange is lineitem x orders
    on the order key."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pair = [nation_a, nation_b]
    supp_n = (supplier
              .join(broadcast(nation.where(F.col("n_name").isin(pair))),
                    F.col("s_nationkey") == F.col("n_nationkey"))
              .select("s_suppkey", F.col("n_name").alias("supp_nation")))
    cust_n = (customer
              .join(broadcast(nation.where(F.col("n_name").isin(pair))),
                    F.col("c_nationkey") == F.col("n_nationkey"))
              .select("c_custkey", F.col("n_name").alias("cust_nation")))
    return (
        lineitem
        .join(broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_n, F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("ship_year"))
        .agg(F.round(F.sum(rev), 2).alias("revenue"),
             F.count("*").alias("n_lines"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


def national_market_share(lineitem: DataFrame, orders: DataFrame,
                          customer: DataFrame, supplier: DataFrame,
                          nation: DataFrame, region: DataFrame,
                          target_nation: str = "NATION_3",
                          region_name: str = "ASIA") -> DataFrame:
    """TPC-H Q8 shape: a target nation's market share — the fraction of
    revenue sold to one region's customers that was supplied by one
    nation, per order year (ratio of a conditional sum to the total).

    Scale shape: the customer-region restriction broadcasts (region x
    nation x filter), the supplier-nation tag broadcasts, and the share
    is a single conditional aggregate — no second pass, no join back."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rnations = (nation
                .join(broadcast(region.where(F.col("r_name") == region_name)),
                      F.col("n_regionkey") == F.col("r_regionkey"))
                .select("n_nationkey"))
    rcust = (customer
             .join(broadcast(rnations),
                   F.col("c_nationkey") == F.col("n_nationkey"))
             .select("c_custkey"))
    supp_n = (supplier
              .join(broadcast(nation.select("n_nationkey",
                                            F.col("n_name")
                                            .alias("supp_nation"))),
                    F.col("s_nationkey") == F.col("n_nationkey"))
              .select("s_suppkey", "supp_nation"))
    target = F.when(F.col("supp_nation") == target_nation, rev) \
        .otherwise(F.lit(0.0))
    return (
        lineitem
        .join(broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(rcust), F.col("o_custkey") == F.col("c_custkey"),
              "left_semi")
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(F.round(100 * F.sum(target) / F.sum(rev), 4)
             .alias("market_share_pct"),
             F.round(F.sum(rev), 2).alias("region_revenue"))
        .orderBy("order_year")
    )


def product_type_profit(lineitem: DataFrame, part: DataFrame,
                        supplier: DataFrame, nation: DataFrame,
                        p_type: str = "ECONOMY") -> DataFrame:
    """TPC-H Q9 shape: per supplier-nation, per year, the profit on one
    product type — revenue minus a carrying cost derived from the part's
    retail price (the fixture has no partsupp supplycost; the physical
    shape — pushed part filter, two broadcast dimensions, nation/year
    aggregate — is Q9's).

    Scale shape: the part filter prunes the broadcast BEFORE the fact
    join so only matching-type line items survive the map side; the
    supplier-nation tag broadcasts; the one exchange is the final
    (nation, year) aggregate."""
    profit = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - 0.1 * F.col("p_retailprice") * F.col("l_quantity"))
    typed = part.where(F.col("p_type") == p_type) \
        .select("p_partkey", "p_retailprice")
    supp_n = (supplier
              .join(broadcast(nation.select("n_nationkey",
                                            F.col("n_name").alias("nation"))),
                    F.col("s_nationkey") == F.col("n_nationkey"))
              .select("s_suppkey", "nation"))
    return (
        lineitem
        .join(broadcast(typed), F.col("l_partkey") == F.col("p_partkey"))
        .join(broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("nation", F.year("l_shipdate").alias("ship_year"))
        .agg(F.round(F.sum(profit), 2).alias("profit"),
             F.count("*").alias("n_lines"))
        .orderBy("nation", "ship_year")
    )


def _supplier_quantity(lineitem: DataFrame, date_from: str | None = None,
                       date_to: str | None = None) -> DataFrame:
    """Per-supplier shipped-quantity/revenue aggregate (one lineitem
    pass; quantity sums are exact integers in doubles, so every
    downstream threshold/max comparison is engine-deterministic)."""
    li = lineitem
    if date_from is not None:
        li = li.where(F.col("l_shipdate")
                      >= F.lit(date_from).cast("timestamp"))
    if date_to is not None:
        li = li.where(F.col("l_shipdate")
                      < F.lit(date_to).cast("timestamp"))
    return li.groupBy("l_suppkey").agg(
        F.sum("l_quantity").alias("total_qty"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2).alias("revenue"))


def top_supplier(lineitem: DataFrame, supplier: DataFrame,
                 date_from: str = "1996-01-01",
                 date_to: str = "1996-04-01") -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with the maximum shipped
    quantity in a window — the view-referenced-twice MAX pattern.

    Scale shape: the per-supplier aggregate is computed ONCE (slot
    cache), its one-row max broadcasts back as a scalar crossJoin, and
    the ranking metric is the exact-integer quantity sum so the max
    equality cannot be perturbed by distributed float-sum order."""
    per_supp = _slot_cache(
        _supplier_quantity(lineitem, date_from, date_to), "tpch_top_supp")
    mx = per_supp.agg(F.max("total_qty").alias("max_qty"))
    return (
        per_supp.crossJoin(broadcast(mx))
        .where(F.col("total_qty") == F.col("max_qty"))
        .join(broadcast(supplier.select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name",
                F.round("total_qty", 1).alias("total_qty"), "revenue")
        .orderBy("s_suppkey")
    )


def important_suppliers(lineitem: DataFrame, supplier: DataFrame,
                        fraction: float = 0.0105) -> DataFrame:
    """TPC-H Q11 shape: suppliers whose shipped quantity exceeds a
    FRACTION OF THE GLOBAL TOTAL — the HAVING-against-a-scalar-subquery
    pattern.

    Scale shape: one lineitem pass builds the per-supplier aggregate
    (slot cache); the global total is then a one-row aggregate OVER
    THAT SMALL TABLE (not a second fact pass) broadcast back as a
    scalar crossJoin.  The threshold metric is the exact-integer
    quantity sum, so the cut is engine-deterministic."""
    per_supp = _slot_cache(_supplier_quantity(lineitem), "tpch_imp_supp")
    total = per_supp.agg(F.sum("total_qty").alias("grand_qty"))
    return (
        per_supp.crossJoin(broadcast(total))
        .where(F.col("total_qty") > fraction * F.col("grand_qty"))
        .join(broadcast(supplier.select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name",
                F.round("total_qty", 1).alias("total_qty"),
                F.round(100 * F.col("total_qty") / F.col("grand_qty"), 4)
                .alias("share_pct"))
        .orderBy(F.desc("total_qty"), "s_suppkey")
    )


def small_quantity_revenue(lineitem: DataFrame, part: DataFrame,
                           brand: str = "Brand#12",
                           factor: float = 0.5) -> DataFrame:
    """TPC-H Q17 shape: average yearly revenue lost by not filling
    small-quantity orders — each line compares against ITS PART'S
    average quantity (the correlated-aggregate pattern).

    Scale shape: the brand filter prunes the part broadcast before the
    fact join; the per-part average is a window keyed by p_partkey over
    the brand-filtered subset (ONE shuffle of that small subset, no
    second fact pass, never a global window).  avg(l_quantity) divides
    two exact integers, so the threshold is engine-deterministic."""
    bparts = part.where(F.col("p_brand") == brand).select("p_partkey")
    li = lineitem.join(broadcast(bparts),
                       F.col("l_partkey") == F.col("p_partkey"))
    w = Window.partitionBy("p_partkey")
    return (
        li.withColumn("avg_qty", F.avg("l_quantity").over(w))
        .where(F.col("l_quantity") < factor * F.col("avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2)
             .alias("avg_yearly"),
             F.count("*").alias("n_lines"))
    )


def waiting_orders_suppliers(lineitem: DataFrame, orders: DataFrame,
                             supplier: DataFrame, late_days: int = 60,
                             top_n: int = 20) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on a
    multi-supplier order — the EXISTS / NOT-EXISTS double self-join,
    re-expressed as per-order supplier aggregates.

    Scale shape: instead of two correlated self-joins over lineitem,
    one join to orders, then ONE explicit orderkey exchange that both
    the (orderkey, suppkey) aggregate AND the two per-order window
    counts ride (hashpartitioning on the orderkey satisfies the
    composite group's clustered distribution, so neither re-shuffles);
    the blame filter is then a map-side predicate.  The shuffled rows
    are pre-projected to three narrow columns.  All counts are exact
    integers."""
    late = (F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS"))
    per_os = (
        lineitem
        .join(orders.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_suppkey", late.cast("int").alias("late"))
        .repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("late").alias("was_late"))
    )
    w = Window.partitionBy("l_orderkey")
    blamed = (
        per_os
        .withColumn("n_supp", F.count("*").over(w))
        .withColumn("n_late", F.sum("was_late").over(w))
        .where((F.col("was_late") == 1) & (F.col("n_supp") > 1)
               & (F.col("n_late") == 1))
    )
    return (
        blamed.groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(broadcast(supplier.select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_suppkey")
        .limit(top_n)
    )


def sales_opportunity(customer: DataFrame, orders: DataFrame,
                      nation: DataFrame,
                      dormant_since: str = "2000-01-01") -> DataFrame:
    """TPC-H Q22 shape: per nation, the count and held balance of
    DORMANT customers — above-average positive balance and no order
    since a cutoff — the scalar-average + anti-join pattern.  (The
    fixture's customers nearly all have at least one order ever, so
    the anti-join is against the recent-order subset; the physical
    shape is Q22's NOT EXISTS.)

    Scale shape: the positive-balance average is a one-row aggregate
    broadcast as a scalar crossJoin; the no-recent-orders check is a
    left-anti hash join on the customer key over the date-pruned
    orders scan (never a NOT IN re-scan); nation broadcasts.  The
    threshold compares each 2-dec balance against the rounded scalar,
    so a distributed partial-sum wiggle below the rounding grid cannot
    flip membership."""
    avg_bal = (customer.where(F.col("c_acctbal") > 0)
               .agg(F.round(F.avg("c_acctbal"), 2).alias("avg_bal")))
    recent = orders.where(F.col("o_orderdate")
                          >= F.lit(dormant_since).cast("timestamp")) \
        .select("o_custkey")
    return (
        customer.crossJoin(broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(broadcast(nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count("*").alias("numcust"),
             F.round(F.sum("c_acctbal"), 2).alias("totacctbal"))
        .orderBy("n_name")
    )


def min_cost_supplier(lineitem: DataFrame, part: DataFrame,
                      supplier: DataFrame, max_size: int = 15) -> DataFrame:
    """TPC-H Q2 shape: for each (filtered) part, the supplier offering
    the lowest observed unit price — the correlated-MIN-subquery
    pattern, re-expressed as a keyed window rank.

    Scale shape: the size filter prunes the part broadcast before the
    fact join; unit prices aggregate per (part, supplier) first (one
    exchange), then the winner is row_number() over a window KEYED BY
    p_partkey (same key — no extra shuffle), never a global sort.

    Determinism: the per-row unit price is rounded to the cent grid in
    EXACT INTEGER math — price cents are exact (2-decimal domain, the
    *100 double lands ~1e-9 from an integer, never near a half), and
    half-up cent rounding is (2a + b) DIV (2b).  round(price/qty, 2)
    on the raw double ratio was the r5 sf0.1 sweep's one genuine hash
    mismatch: the two engines disagree on half-approximation doubles,
    and at 60k rows one such ratio finally occurs."""
    sparts = part.where(F.col("p_size") <= max_size) \
        .select("p_partkey", "p_name")
    unit_cents = F.expr(
        f"(2 * CAST(round(l_extendedprice * 100) AS BIGINT)"
        f" + CAST(l_quantity AS BIGINT))"
        f" DIV (2 * CAST(l_quantity AS BIGINT))")
    per_ps = (
        lineitem
        .join(broadcast(sparts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_partkey", "p_name", "l_suppkey")
        .agg((F.min(unit_cents) / 100.0).alias("min_unit_price"))
    )
    w = Window.partitionBy("p_partkey") \
        .orderBy("min_unit_price", "l_suppkey")
    return (
        per_ps.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .join(broadcast(supplier.select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "p_name", "s_suppkey", "s_name",
                "min_unit_price")
        .orderBy("p_partkey")
    )

def parts_supplier_counts(lineitem: DataFrame, part: DataFrame,
                          supplier: DataFrame,
                          exclude_brand: str = "Brand#1") -> DataFrame:
    """TPC-H Q16 shape: how many DISTINCT suppliers serve each
    (brand, type, size-band) part segment, excluding a complaint
    blacklist — the count-distinct + NOT-IN(anti-join) pattern.

    Scale shape: the blacklist (negative-balance suppliers) is a tiny
    aggregate anti-joined as a broadcast; the part dimension broadcasts;
    the distinct-supplier count is one (segment, suppkey) dedup
    exchange then a segment aggregate — never a count(distinct) global
    re-shuffle per segment."""
    blacklist = supplier.where(F.col("s_acctbal") < 0).select("s_suppkey")
    seg = part.where(F.col("p_brand") != exclude_brand).select(
        "p_partkey", "p_brand", "p_type",
        (F.floor(F.col("p_size") / 10) * 10).cast("int").alias("size_band"))
    return (
        lineitem
        .join(broadcast(seg), F.col("l_partkey") == F.col("p_partkey"))
        .join(broadcast(blacklist),
              F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .select("p_brand", "p_type", "size_band", "l_suppkey")
        .distinct()
        .groupBy("p_brand", "p_type", "size_band")
        .agg(F.count("*").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "size_band")
    )


def dominant_part_suppliers(lineitem: DataFrame, part: DataFrame,
                            supplier: DataFrame,
                            name_prefix: str = "small",
                            share: float = 0.2) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped more than a `share`
    fraction of some filtered part's total volume — the nested
    semi-join chain (supplier IN ... partkey IN ... AND qty >
    scalar-of-part).  Classic Q20 cuts at 50%; the default here is 20%
    so the fixture's near-uniform supplier mix still yields dominant
    pairs at every scale factor.

    Scale shape: the part-name filter prunes the broadcast before the
    fact join; then ONE explicit p_partkey exchange that both the
    (part, supplier) aggregate AND the per-part total window ride
    (subset partitioning satisfies the composite group's clustered
    distribution — same trick as waiting_orders_suppliers), no fact
    re-scan; the dominant pairs collapse to a supplier aggregate
    joined broadcast to names.  Quantity sums are exact integers — the
    share cut is engine-deterministic."""
    named = part.where(F.col("p_name").startswith(name_prefix)) \
        .select("p_partkey")
    per_ps = (
        lineitem
        .join(broadcast(named), F.col("l_partkey") == F.col("p_partkey"))
        .select("p_partkey", "l_suppkey", "l_quantity")
        .repartition("p_partkey")
        .groupBy("p_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    w = Window.partitionBy("p_partkey")
    dom = (
        per_ps.withColumn("part_qty", F.sum("qty").over(w))
        .where(F.col("qty") > share * F.col("part_qty"))
    )
    return (
        dom.groupBy("l_suppkey")
        .agg(F.count("*").alias("n_dominated_parts"),
             F.round(F.sum("qty"), 1).alias("dominated_qty"))
        .join(broadcast(supplier.select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "n_dominated_parts", "dominated_qty")
        .orderBy(F.desc("n_dominated_parts"), "s_suppkey")
    )


def order_ship_latency(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Order-to-ship latency distribution per order priority: exact
    p50/p90/p99 and max days between o_orderdate and l_shipdate — the
    fulfillment-SLA report (is URGENT actually shipping faster?).

    Scale shape: the fact join rides the l_orderkey->o_orderkey
    broadcast-or-shuffle hash join with only two narrow date columns
    projected; latencies are exact integer day counts, so the per-
    priority exact percentile (bounded groups: |priorities|) is
    engine-portable."""
    lat = (
        lineitem.select("l_orderkey", F.to_date("l_shipdate").alias("sd"))
        .join(orders.select(F.col("o_orderkey").alias("l_orderkey"),
                            F.to_date("o_orderdate").alias("od"),
                            "o_orderpriority"), "l_orderkey")
        .select("o_orderpriority",
                F.datediff("sd", "od").cast("long").alias("days"))
    )
    p = F.expr("percentile(days, array(0.5, 0.9, 0.99))")
    return (
        lat.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_items"), p.alias("p"),
             F.max("days").alias("max_days"))
        .select("o_orderpriority", "n_items",
                F.round(F.col("p")[0], 4).alias("p50_days"),
                F.round(F.col("p")[1], 4).alias("p90_days"),
                F.round(F.col("p")[2], 4).alias("p99_days"),
                "max_days")
        .orderBy("o_orderpriority")
    )
