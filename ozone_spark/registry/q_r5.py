"""Round-5 additions — QuerySpecs + DuckDB oracle SQL twins (split out of the
single-module registry in round 8; see ozone_spark/registry/__init__.py).
"""

from __future__ import annotations

from ._base import *  # noqa: F401,F403 — shared registry namespace
from .q_events import _SESSIONIZE_CTES  # noqa: F401 — cross-domain helper
from .q_mining import _PQ_CTES  # noqa: F401 — cross-domain helper
from .q_dedup import _MINHASH_BANDS_CTES  # noqa: F401 — cross-domain helper
from .q_dedup import _CLUSTERS_CTE  # noqa: F401 — cross-domain helper
from .q_similarity import _SF01_EMB_N  # noqa: F401 — cross-domain helper
from .q_similarity import _GATE_EMB_N  # noqa: F401 — cross-domain helper
from .q_similarity import _lsh_sig_adaptive_sql  # noqa: F401 — cross-domain helper
from .q_similarity import _DOT  # noqa: F401 — cross-domain helper
from .q_dedup import _minhash_sig_sql  # noqa: F401 — cross-domain helper
from .q_text import _NORM  # noqa: F401 — cross-domain helper
from .q_text import _SH5  # noqa: F401 — cross-domain helper
from .q_insights import _FILE_BIN  # noqa: F401 — cross-domain helper



def _cdc_incremental_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4 for A5 (QuotaRepairTask contract): synthesize the CDC log,
    maintain per-bucket usedNamespace/usedBytes/usedReplicatedBytes
    incrementally through the real streaming drain, return the
    materialized store (oracle: batch recompute over the final key
    state)."""
    import tempfile

    from ozone_spark.streaming import cdc as scdc

    t = views(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="ozs_quota_gate_")
    scdc.synthesize_cdc_log(t["keys"], t["deleted_keys"], f"{work}/cdc")
    scdc.run_incremental_quota(spark, f"{work}/cdc", f"{work}/store",
                               f"{work}/ckpt")
    return spark.read.parquet(f"{work}/store").drop("view_bucket")


def _cdc_task_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST5 as a gate row: drain an incremental view, then read the
    TaskStatusService analog off the streaming checkpoint's commit log
    (cdc.task_status).  Wall-clock columns (commit mtime) and the raw
    batch counter are projected to deterministic booleans: `started`
    (any committed batch) and `drained` (the last committed batch id
    equals pending-file count - 1 — AvailableNow with
    maxFilesPerTrigger=1 commits exactly one batch per log file)."""
    import glob
    import tempfile

    import pyspark.sql.functions as F

    from ozone_spark.streaming import cdc as scdc

    t = views(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="ozs_ts_gate_")
    scdc.synthesize_cdc_log(t["keys"], t["deleted_keys"], f"{work}/cdc")
    scdc.run_incremental_histogram(spark, f"{work}/cdc", f"{work}/store",
                                   f"{work}/ckpt")
    n_files = len(glob.glob(f"{work}/cdc/chunk=*/*.parquet"))
    status = scdc.task_status(spark, {"histogram": f"{work}/ckpt",
                                      "never_ran": f"{work}/no_such_ckpt"})
    return status.select(
        "task",
        (F.col("last_batch_id") >= 0).alias("started"),
        (F.col("last_batch_id") == F.lit(n_files - 1)).alias("drained"),
    ).orderBy("task")


def _cdc_overflow_reprocess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST3 as a gate row: the bounded-buffer fallback.  Runs the SAME
    view maintenance twice — once with capacity 0 (pending log
    overflows, full reprocess() from current state) and once with an
    ample buffer (true incremental drain through Structured Streaming)
    — and unions the two tagged frames.  The oracle is the batch
    histogram crossed with both path labels, so the gate hash-verifies
    process() == reprocess() row-for-row."""
    import tempfile

    from ozone_spark.streaming import cdc as scdc

    t = views(spark, sf_dir)
    keys_now = t["keys"].join(t["deleted_keys"].select("object_id"),
                              "object_id", "left_anti")
    work = tempfile.mkdtemp(prefix="ozs_ovf_gate_")
    scdc.synthesize_cdc_log(t["keys"], t["deleted_keys"], f"{work}/cdc")
    over = scdc.process_or_reprocess(
        spark, f"{work}/cdc", keys_now, f"{work}/store_o", f"{work}/ckpt_o",
        capacity=0)
    # capacity explicitly above any fixture's pending-log size: the
    # point of this branch is the TRUE incremental drain.  The module
    # default (sized to the gate fixture) overflowed at sf0.1, and the
    # silent fallback made both branches reprocess — rows still
    # matched per path-label only by accident of the union, and the
    # sf0.1 sweep caught the hash mismatch.
    incr = scdc.process_or_reprocess(
        spark, f"{work}/cdc", keys_now, f"{work}/store_i", f"{work}/ckpt_i",
        capacity=1 << 40)
    return over.unionByName(incr).orderBy(
        "path", "volume", "bucket", "bin_index")


# Round-5 additions (behind the r3/r4 gate backlog, same freeze rule as
# every round since r2: new registrations never starve the never-gated
# queue out of the driver's per-round cap).
R5_QUERIES: list[QuerySpec] = [
    _q(
        "cdc_task_status",
        _cdc_task_status,
        """SELECT * FROM (VALUES ('histogram', true, true),
  ('never_ran', false, false)) t(task, started, drained) ORDER BY task""",
    ),
    _q(
        "cdc_overflow_reprocess",
        _cdc_overflow_reprocess,
        with_views(
            f"""SELECT volume, bucket, {_FILE_BIN} AS bin_index,
  count(*) AS delta, path
FROM keys, (SELECT unnest(['incremental', 'reprocess']) AS path)
WHERE object_id NOT IN (SELECT object_id FROM deleted_keys)
GROUP BY 1, 2, 3, 5 ORDER BY path, volume, bucket, bin_index""",
            ["keys", "deleted_keys"],
        ),
    ),
    _q(
        "snapshot_diff_job_ids",
        lambda spark, sf: snops.snapshot_diff_job_ids(
            views(spark, sf)["snapshot_chain"]),
        # the same md5 -> 8-4-4-4-12 regrouping with version nibble 3
        # and variant nibble via translate, replayed in DuckDB
        with_views(
            """SELECT previous_snapshot AS from_snapshot,
  snapshot_name AS to_snapshot,
  substr(h, 1, 8) || '-' || substr(h, 9, 4) || '-3' || substr(h, 14, 3)
    || '-' || translate(substr(h, 17, 1), '0123456789abcdef',
                        '89ab89ab89ab89ab') || substr(h, 18, 3)
    || '-' || substr(h, 21, 12) AS job_id
FROM (
  SELECT *, md5('vol1/b1/' || previous_snapshot || '/' || snapshot_name) AS h
  FROM snapshot_chain WHERE previous_snapshot IS NOT NULL
) ORDER BY to_snapshot""",
            ["snapshot_chain"],
        ),
    ),
    _q(
        "cdc_incremental_quota",
        _cdc_incremental_quota,
        # ST4 for A5: incrementally-maintained per-bucket quota usage ==
        # the QuotaRepairTask-style recompute over the final key state
        with_views(
            """SELECT volume, bucket,
  CAST(count(*) AS BIGINT) AS used_namespace,
  CAST(sum(data_size) AS BIGINT) AS used_bytes,
  CAST(sum(replicated_size) AS BIGINT) AS used_replicated_bytes
FROM keys WHERE object_id NOT IN (SELECT object_id FROM deleted_keys)
GROUP BY 1, 2""",
            ["keys", "deleted_keys"],
        ),
    ),
    _q(
        "event_funnel",
        lambda spark, sf: eops.event_funnel(views(spark, sf)["events"]),
        # ordered min-timestamp cascade: step k's clock starts at the
        # user's earliest completion of step k-1
        """WITH s1 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'view' GROUP BY 1
), s2 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts >= s1.t GROUP BY 1
), s3 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= s2.t GROUP BY 1
), counts AS (
  SELECT 1 AS step_idx, 'view' AS step, count(*) AS n_users FROM s1
  UNION ALL SELECT 2, 'click', count(*) FROM s2
  UNION ALL SELECT 3, 'purchase', count(*) FROM s3
)
SELECT step_idx, step, CAST(n_users AS BIGINT) AS n_users,
  CASE WHEN coalesce(lag(n_users) OVER (ORDER BY step_idx), n_users) > 0
    THEN round(n_users / coalesce(lag(n_users) OVER (ORDER BY step_idx),
                                  n_users), 6) END AS conv_from_prev,
  CASE WHEN first_value(n_users) OVER (ORDER BY step_idx) > 0
    THEN round(n_users / first_value(n_users) OVER (ORDER BY step_idx), 6)
  END AS conv_from_top
FROM counts ORDER BY step_idx""",
    ),
    _q(
        "customer_order_distribution",
        lambda spark, sf: tpch.customer_order_distribution(
            views(spark, sf)["customer"], views(spark, sf)["orders"]),
        # TPC-H Q13 shape: left-outer keeps zero-order customers
        """SELECT c_count, count(*) AS custdist FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) GROUP BY c_count ORDER BY custdist DESC, c_count DESC""",
        bench=True,
    ),
    _q(
        "large_volume_orders",
        lambda spark, sf: tpch.large_volume_orders(
            views(spark, sf)["customer"], views(spark, sf)["orders"],
            views(spark, sf)["lineitem"]),
        # TPC-H Q18 shape: aggregated-filter (HAVING) semi-join
        """SELECT c_custkey, o_orderkey,
  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
  round(o_totalprice, 2) AS o_totalprice,
  round(h.total_qty, 2) AS total_qty
FROM orders
JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300) h
  ON o_orderkey = h.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",
        bench=True,
    ),
    _q(
        "decontaminate_bloom",
        lambda spark, sf: pipeline.decontaminate_bloom(
            views(spark, sf)["documents"].where("doc_id % 25 <> 0"),
            views(spark, sf)["documents"].where("doc_id % 25 = 0")),
        # deterministic Bloom membership (k=3, m=2^18) via
        # Kirsch-Mitzenmacher double hashing of ONE md5 per shingle:
        # the oracle replays the filter bit-for-bit, false positives
        # and all
        f"""WITH shl AS (
  SELECT doc_id, {_SH5} AS shs
  FROM (SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents)
  WHERE len(w) >= 5
), ev AS (
  SELECT md5(s) AS h
  FROM (SELECT DISTINCT unnest(shs) AS s FROM shl WHERE doc_id % 25 = 0)
), pos AS (
  SELECT DISTINCT (CAST('0x' || substr(h, 1, 15) AS BIGINT)
    + j * CAST('0x' || substr(h, 17, 15) AS BIGINT))
      % {pipeline.BLOOM_M_BITS} AS p
  FROM ev, range({pipeline.BLOOM_K}) r(j)
), tr AS (
  SELECT doc_id, n_sh,
    CAST('0x' || substr(h, 1, 15) AS BIGINT) AS h1,
    CAST('0x' || substr(h, 17, 15) AS BIGINT) AS h2
  FROM (SELECT doc_id, len(shs) AS n_sh, md5(unnest(shs)) AS h FROM shl
        WHERE doc_id % 25 <> 0)
), mem AS (
  SELECT tr.doc_id, tr.n_sh,
    CASE WHEN p0.p IS NOT NULL AND p1.p IS NOT NULL AND p2.p IS NOT NULL
         THEN 1 ELSE 0 END AS maybe
  FROM tr
  LEFT JOIN pos p0 ON p0.p = tr.h1 % {pipeline.BLOOM_M_BITS}
  LEFT JOIN pos p1 ON p1.p = (tr.h1 + tr.h2) % {pipeline.BLOOM_M_BITS}
  LEFT JOIN pos p2 ON p2.p = (tr.h1 + 2 * tr.h2) % {pipeline.BLOOM_M_BITS}
), agg AS (
  SELECT doc_id, any_value(n_sh) AS n_sh, sum(maybe) AS n_maybe
  FROM mem GROUP BY 1
)
SELECT doc_id, CAST(n_sh AS BIGINT) AS n_shingles,
  CAST(n_maybe AS BIGINT) AS n_bloom_hits,
  round(n_maybe / n_sh, 6) AS bloom_fraction,
  n_maybe / n_sh >= {pipeline.DECONTAM_MIN_OVERLAP} AS flagged
FROM agg ORDER BY doc_id""",
    ),
    _q(
        "source_overlap_matrix",
        lambda spark, sf: pipeline.source_overlap_matrix(
            views(spark, sf)["documents"]),
        # cross-source shingle Jaccard over 60-bit shingle hashes (the
        # distinct/self-join move longs, not strings — same md5 both
        # engines); zero-overlap pairs absent in both engines
        f"""WITH shl AS (
  SELECT source, {_SH5} AS shs
  FROM (SELECT source, string_split({_NORM}, ' ') AS w FROM documents)
  WHERE len(w) >= 5
), sh AS (
  SELECT DISTINCT source,
    CAST('0x' || substr(md5(unnest(shs)), 1, 15) AS BIGINT) AS s
  FROM shl
), sizes AS (
  SELECT source, count(*) AS n_sh FROM sh GROUP BY 1
), shared AS (
  SELECT a.source AS source_a, b.source AS source_b,
    count(*) AS shared
  FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b,
  x.n_sh AS n_a, y.n_sh AS n_b, shared,
  round(shared / (x.n_sh + y.n_sh - shared), 6) AS jaccard
FROM shared
JOIN sizes x ON source_a = x.source
JOIN sizes y ON source_b = y.source
ORDER BY source_a, source_b""",
    ),
    _q(
        "returned_item_customers",
        lambda spark, sf: tpch.returned_item_customers(
            views(spark, sf)["customer"], views(spark, sf)["orders"],
            views(spark, sf)["lineitem"], views(spark, sf)["nation"]),
        # TPC-H Q10 shape: top-k customers by returned-item revenue;
        # top-k cut ordered on the rounded sum + custkey tiebreak
        """SELECT c_custkey, c_name, revenue,
  round(c_acctbal, 2) AS c_acctbal, n_name
FROM (
  SELECT c_custkey, c_name, c_acctbal, n_name,
    round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  WHERE l_returnflag = 'R'
  GROUP BY 1, 2, 3, 4
) ORDER BY revenue DESC, c_custkey LIMIT 20""",
    ),
    _q(
        "priority_line_counts",
        lambda spark, sf: tpch.priority_line_counts(
            views(spark, sf)["orders"], views(spark, sf)["lineitem"]),
        # TPC-H Q12 shape: conditional agg after the fact join
        """SELECT l_linestatus,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1 ORDER BY 1""",
        # benched since r6: the r5 driver-red row (HUGEINT oracle sum)
        # — a tracked number makes any environment sensitivity visible
        bench=True,
    ),
    _q(
        "forecast_revenue_change",
        lambda spark, sf: tpch.forecast_revenue_change(
            views(spark, sf)["lineitem"]),
        # TPC-H Q6 shape: scan-only agg, every predicate pushed
        """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
  count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.039 AND l_discount <= 0.061
  AND l_quantity < 24""",
    ),
    _q(
        "discounted_brand_revenue",
        lambda spark, sf: tpch.discounted_brand_revenue(
            views(spark, sf)["lineitem"], views(spark, sf)["part"]),
        # TPC-H Q19 shape: OR-of-ANDs spanning both join sides
        """SELECT p_brand, round(sum(l_extendedprice * (1 - l_discount)), 2)
    AS revenue,
  count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 20
       AND p_size <= 10)
   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 30
       AND p_size <= 20)
   OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 40
       AND p_size <= 30)
GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "promo_revenue_share",
        lambda spark, sf: tpch.promo_revenue_share(
            views(spark, sf)["lineitem"], views(spark, sf)["part"]),
        # TPC-H Q14 shape: broadcast part join, per-month promo ratio
        """SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m')
    AS ship_month,
  round(100 * sum(CASE WHEN p_type = 'PROMO'
      THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
    / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_share,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "volume_shipping",
        lambda spark, sf: tpch.volume_shipping(
            views(spark, sf)["lineitem"], views(spark, sf)["orders"],
            views(spark, sf)["customer"], views(spark, sf)["supplier"],
            views(spark, sf)["nation"]),
        # TPC-H Q7 shape: bilateral nation-pair trade flows per year
        """SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
  year(l_shipdate) AS ship_year,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
  count(*) AS n_lines
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
WHERE ns.n_name IN ('NATION_1', 'NATION_2')
  AND nc.n_name IN ('NATION_1', 'NATION_2')
  AND ns.n_name <> nc.n_name
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
        bench=True,
    ),
    _q(
        "national_market_share",
        lambda spark, sf: tpch.national_market_share(
            views(spark, sf)["lineitem"], views(spark, sf)["orders"],
            views(spark, sf)["customer"], views(spark, sf)["supplier"],
            views(spark, sf)["nation"], views(spark, sf)["region"]),
        # TPC-H Q8 shape: target nation's share of a region's market
        """SELECT year(o_orderdate) AS order_year,
  round(100 * sum(CASE WHEN ns.n_name = 'NATION_3'
      THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
    / sum(l_extendedprice * (1 - l_discount)), 4) AS market_share_pct,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS region_revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE o_custkey IN (
  SELECT c_custkey FROM customer
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  JOIN region ON nc.n_regionkey = r_regionkey
  WHERE r_name = 'ASIA')
GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "product_type_profit",
        lambda spark, sf: tpch.product_type_profit(
            views(spark, sf)["lineitem"], views(spark, sf)["part"],
            views(spark, sf)["supplier"], views(spark, sf)["nation"]),
        # TPC-H Q9 shape: per-nation, per-year profit on one part type
        """SELECT n_name AS nation, year(l_shipdate) AS ship_year,
  round(sum(l_extendedprice * (1 - l_discount)
            - 0.1 * p_retailprice * l_quantity), 2) AS profit,
  count(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_type = 'ECONOMY'
GROUP BY 1, 2 ORDER BY 1, 2""",
    ),
    _q(
        "top_supplier",
        lambda spark, sf: tpch.top_supplier(
            views(spark, sf)["lineitem"], views(spark, sf)["supplier"]),
        # TPC-H Q15 shape: max-over-aggregated-view; exact-integer qty
        """WITH sq AS (
  SELECT l_suppkey, sum(l_quantity) AS total_qty,
    round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY 1)
SELECT s_suppkey, s_name, round(total_qty, 1) AS total_qty, revenue
FROM sq JOIN supplier ON l_suppkey = s_suppkey
WHERE total_qty = (SELECT max(total_qty) FROM sq)
ORDER BY s_suppkey""",
    ),
    _q(
        "important_suppliers",
        lambda spark, sf: tpch.important_suppliers(
            views(spark, sf)["lineitem"], views(spark, sf)["supplier"]),
        # TPC-H Q11 shape: HAVING against a global-scalar fraction
        """WITH sq AS (
  SELECT l_suppkey, sum(l_quantity) AS total_qty FROM lineitem GROUP BY 1)
SELECT s_suppkey, s_name, round(total_qty, 1) AS total_qty,
  round(100 * total_qty / (SELECT sum(total_qty) FROM sq), 4) AS share_pct
FROM sq JOIN supplier ON l_suppkey = s_suppkey
WHERE total_qty > 0.0105 * (SELECT sum(total_qty) FROM sq)
ORDER BY total_qty DESC, s_suppkey""",
    ),
    _q(
        "small_quantity_revenue",
        lambda spark, sf: tpch.small_quantity_revenue(
            views(spark, sf)["lineitem"], views(spark, sf)["part"]),
        # TPC-H Q17 shape: per-part correlated average-quantity cutoff
        """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
  count(*) AS n_lines
FROM (
  SELECT l_extendedprice, l_quantity,
    avg(l_quantity) OVER (PARTITION BY l_partkey) AS avg_qty
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part
                      WHERE p_brand = 'Brand#12'))
WHERE l_quantity < 0.5 * avg_qty""",
    ),
    _q(
        "waiting_orders_suppliers",
        lambda spark, sf: tpch.waiting_orders_suppliers(
            views(spark, sf)["lineitem"], views(spark, sf)["orders"],
            views(spark, sf)["supplier"]),
        # TPC-H Q21 shape: sole-late-shipper blame via per-order counts
        """WITH per_os AS (
  SELECT l_orderkey, l_suppkey,
    max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
        THEN 1 ELSE 0 END) AS was_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
), blamed AS (
  SELECT l_suppkey FROM (
    SELECT l_suppkey, was_late,
      count(*) OVER (PARTITION BY l_orderkey) AS n_supp,
      sum(was_late) OVER (PARTITION BY l_orderkey) AS n_late
    FROM per_os)
  WHERE was_late = 1 AND n_supp > 1 AND n_late = 1)
SELECT s_suppkey, s_name, numwait
FROM (SELECT l_suppkey, count(*) AS numwait FROM blamed GROUP BY 1)
JOIN supplier ON l_suppkey = s_suppkey
ORDER BY numwait DESC, s_suppkey LIMIT 20""",
        bench=True,
    ),
    _q(
        "sales_opportunity",
        lambda spark, sf: tpch.sales_opportunity(
            views(spark, sf)["customer"], views(spark, sf)["orders"],
            views(spark, sf)["nation"]),
        # TPC-H Q22 shape: above-average balance + dormant anti-join
        """SELECT n_name, count(*) AS numcust,
  round(sum(c_acctbal), 2) AS totacctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT round(avg(c_acctbal), 2) FROM customer
                   WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "min_cost_supplier",
        lambda spark, sf: tpch.min_cost_supplier(
            views(spark, sf)["lineitem"], views(spark, sf)["part"],
            views(spark, sf)["supplier"]),
        # TPC-H Q2 shape: per-part min-unit-price supplier via keyed
        # rank; unit cents in exact integer half-up math ((2a+b)//(2b))
        # — round(double ratio, 2) diverged cross-engine at sf0.1
        """WITH per_ps AS (
  SELECT p_partkey, p_name, l_suppkey,
    min((2 * CAST(round(l_extendedprice * 100) AS BIGINT)
         + CAST(l_quantity AS BIGINT))
        // (2 * CAST(l_quantity AS BIGINT))) / 100.0 AS min_unit_price
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_size <= 15
  GROUP BY 1, 2, 3
), ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY p_partkey ORDER BY min_unit_price, l_suppkey) AS rn
  FROM per_ps)
SELECT p_partkey, p_name, s_suppkey, s_name, min_unit_price
FROM ranked JOIN supplier ON l_suppkey = s_suppkey
WHERE rn = 1 ORDER BY p_partkey""",
    ),
    _q(
        "cohort_retention",
        lambda spark, sf: eops.cohort_retention(views(spark, sf)["events"]),
        # weekly first-touch cohorts x week-offset retention triangle
        """WITH first AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_w
  FROM events GROUP BY 1
), sizes AS (
  SELECT cohort_w, count(*) AS cohort_size FROM first GROUP BY 1
), active AS (
  SELECT f.cohort_w,
    CAST(date_diff('day', f.cohort_w, a.w) / 7 AS INT) AS week_offset,
    count(*) AS n_active
  FROM (SELECT DISTINCT user_id, date_trunc('week', ts) AS w
        FROM events) a
  JOIN first f USING (user_id)
  GROUP BY 1, 2)
SELECT strftime(a.cohort_w, '%Y-%m-%d') AS cohort_week, week_offset,
  n_active, cohort_size, round(n_active * 1.0 / cohort_size, 6) AS retention
FROM active a JOIN sizes s ON a.cohort_w = s.cohort_w
ORDER BY 1, 2""",
    ),
    _q(
        "path_transitions",
        lambda spark, sf: eops.path_transitions(views(spark, sf)["events"]),
        # per-user consecutive event-type Markov transition matrix
        """WITH pairs AS (
  SELECT lag(event_type) OVER (
      PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
    event_type AS next_type
  FROM events
), counts AS (
  SELECT prev_type, next_type, count(*) AS n_trans
  FROM pairs WHERE prev_type IS NOT NULL GROUP BY 1, 2)
SELECT prev_type, next_type, n_trans,
  round(n_trans * 1.0 / sum(n_trans) OVER (PARTITION BY prev_type), 6)
    AS p_next
FROM counts ORDER BY 1, 2""",
    ),
    _q(
        "zipf_curve",
        lambda spark, sf: mining.zipf_curve(views(spark, sf)["documents"]),
        # top-20 token ranks + ln-ln least-squares slope over the top-1000
        """WITH words AS (
  SELECT unnest(string_split(
    regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' ')) AS word
  FROM documents
), vocab AS (
  SELECT word, count(*) AS cnt FROM words WHERE word <> ''
  GROUP BY 1 ORDER BY cnt DESC, word LIMIT 1000
), ranked AS (
  SELECT word, cnt,
    row_number() OVER (ORDER BY cnt DESC, word) AS rank,
    ln(row_number() OVER (ORDER BY cnt DESC, word)) AS lx,
    ln(cnt) AS ly
  FROM vocab
), fit AS (
  SELECT
    round((count(*) * sum(lx * ly) - sum(lx) * sum(ly))
      / (count(*) * sum(lx * lx) - sum(lx) * sum(lx)), 4) AS zipf_slope,
    round((sum(ly) - (count(*) * sum(lx * ly) - sum(lx) * sum(ly))
      / (count(*) * sum(lx * lx) - sum(lx) * sum(lx)) * sum(lx))
      / count(*), 4) AS intercept
  FROM ranked)
SELECT rank, word, cnt, zipf_slope, intercept
FROM ranked, fit WHERE rank <= 20 ORDER BY rank""",
    ),
    _q(
        "parts_supplier_counts",
        lambda spark, sf: tpch.parts_supplier_counts(
            views(spark, sf)["lineitem"], views(spark, sf)["part"],
            views(spark, sf)["supplier"]),
        # TPC-H Q16 shape: distinct suppliers per part segment, NOT IN
        # blacklist as an anti-join
        """SELECT p_brand, p_type,
  CAST(floor(p_size / 10) * 10 AS INT) AS size_band,
  count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, size_band""",
    ),
    _q(
        "dominant_part_suppliers",
        lambda spark, sf: tpch.dominant_part_suppliers(
            views(spark, sf)["lineitem"], views(spark, sf)["part"],
            views(spark, sf)["supplier"]),
        # TPC-H Q20 shape: suppliers shipping >half a part's volume
        """WITH per_ps AS (
  SELECT p_partkey, l_suppkey, sum(l_quantity) AS qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'small%'
  GROUP BY 1, 2
), dom AS (
  SELECT l_suppkey, qty FROM (
    SELECT l_suppkey, qty,
      sum(qty) OVER (PARTITION BY p_partkey) AS part_qty
    FROM per_ps)
  WHERE qty > 0.2 * part_qty)
SELECT s_suppkey, s_name, n_dominated_parts, dominated_qty
FROM (SELECT l_suppkey, count(*) AS n_dominated_parts,
        round(sum(qty), 1) AS dominated_qty
      FROM dom GROUP BY 1)
JOIN supplier ON l_suppkey = s_suppkey
ORDER BY n_dominated_parts DESC, s_suppkey""",
    ),
    _q(
        "minhash_recall",
        lambda spark, sf: dedup.minhash_recall(views(spark, sf)["documents"]),
        # sketch-vs-exact eval over a fixed-COUNT md5-ranked doc slice
        # (the whole corpus at gate scales): replay BOTH pair
        # generators (the exact capped-bucket Jaccard truth at >=0.5
        # and the banded minhash candidates at est>=0.35) and
        # full-outer join the pair keys
        f"""WITH sampdocs AS (
  SELECT doc_id, text FROM documents
  ORDER BY CAST(('0x' || substr(md5('{dedup.MINRECALL_SALT}:'
    || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT), doc_id
  LIMIT {dedup.MINRECALL_SAMPLE_N}
), words AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM sampdocs
  WHERE len(string_split({_NORM}, ' ')) >= 3
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, greatest(len(w) - 2, 0) + 1),
    i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]))) AS shingle
  FROM words
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1
), ok AS (
  SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= 200
), shf AS (
  SELECT sh.* FROM sh JOIN ok USING (shingle)
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), truth AS (
  SELECT doc_a, doc_b FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.5
), hs AS (
  SELECT doc_id, list_transform(
    list_distinct(list_transform(
      range(1, greatest(len(w) - 2, 0) + 1),
      i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])),
    s -> CAST(('0x' || substr(md5(s), 1, 7)) AS BIGINT)) AS hs
  FROM words
), sig AS (
  SELECT doc_id, [{_minhash_sig_sql()}] AS sig FROM hs
), bands AS (
  SELECT doc_id, sig, band,
    md5(concat_ws(',', sig[band * 4 + 1], sig[band * 4 + 2],
                  sig[band * 4 + 3], sig[band * 4 + 4])) AS bucket
  FROM (SELECT doc_id, sig, unnest(range(8)) AS band FROM sig)
), okb AS (
  SELECT band, bucket FROM bands GROUP BY 1, 2
  HAVING count(*) BETWEEN 2 AND 200
), bf AS (
  SELECT bands.* FROM bands JOIN okb USING (band, bucket)
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bf a JOIN bf b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
  WHERE len(list_filter(list_zip(a.sig, b.sig), x -> x[1] = x[2])) / 32.0
    >= 0.35
), ev AS (
  SELECT coalesce(t.doc_a, c.doc_a) AS doc_a,
    (t.doc_a IS NOT NULL)::INT AS in_truth,
    (c.doc_a IS NOT NULL)::INT AS in_cand
  FROM truth t FULL JOIN cand c USING (doc_a, doc_b))
SELECT CAST(sum(in_truth) AS BIGINT) AS n_truth,
  CAST(sum(in_cand) AS BIGINT) AS n_cand,
  CAST(sum(in_truth * in_cand) AS BIGINT) AS n_hit,
  (CAST(sum(in_truth * in_cand) AS BIGINT) * 1000000)
    // CAST(sum(in_truth) AS BIGINT) AS recall_ppm,
  (CAST(sum(in_truth * in_cand) AS BIGINT) * 1000000)
    // CAST(sum(in_cand) AS BIGINT) AS precision_ppm
FROM ev""",
    ),
    _q(
        "ann_recall",
        lambda spark, sf: similarity.ann_recall(
            views(spark, sf)["embeddings"]),
        # recall@10 of the LSH index vs the exact brute-force top-k,
        # replaying both sides (same literal hyperplanes as knn_lsh)
        f"""WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  WHERE vec_id IN (0, 1, 2)
), scored AS (
  SELECT query_id, vec_id,
    round({_DOT.format(a='qe', b='embedding')}
      / (sqrt({_DOT.format(a='qe', b='qe')})
         * sqrt({_DOT.format(a='embedding', b='embedding')})), 6) AS cos_sim
  FROM embeddings, q WHERE vec_id <> query_id
), truth AS (
  SELECT query_id, vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY cos_sim DESC, vec_id) AS rank FROM scored
  ) WHERE rank <= 10
), sig AS (
  SELECT vec_id, embedding,
    ({_lsh_sig_adaptive_sql('embedding')})
    AS sig
  FROM embeddings
), ql AS (
  SELECT vec_id AS query_id, embedding AS qe, sig AS qsig FROM sig
  WHERE vec_id IN (0, 1, 2)
), cand AS (
  SELECT query_id, vec_id,
    round({_DOT.format(a='qe', b='embedding')}
      / (sqrt({_DOT.format(a='qe', b='qe')})
         * sqrt({_DOT.format(a='embedding', b='embedding')})), 6) AS cos_sim
  FROM sig, ql
  WHERE bit_count(xor(sig, qsig)) <= 2 AND vec_id <> query_id
), approx AS (
  SELECT query_id, vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY cos_sim DESC, vec_id) AS rank FROM cand
  ) WHERE rank <= 10
)
SELECT t.query_id,
  CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_hit,
  count(*) AS n_truth,
  (CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    * 1000000) // count(*) AS recall_ppm,
  (SELECT CASE WHEN count(*) <= {_GATE_EMB_N}
     THEN {similarity.suggest_n_planes(_GATE_EMB_N)}
     ELSE {similarity.suggest_n_planes(_SF01_EMB_N)} END
   FROM embeddings) AS n_planes
FROM truth t LEFT JOIN approx a
  ON t.query_id = a.query_id AND t.vec_id = a.vec_id
GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "dedup_cluster_stats",
        lambda spark, sf: dedup.cluster_size_stats(
            views(spark, sf)["documents"]),
        # size histogram over the same cluster membership as
        # dedup_clusters (shared _CLUSTERS_CTE)
        oracle=f"""{_CLUSTERS_CTE},
csizes AS (
  SELECT cluster_id, count(*) AS cluster_size FROM members GROUP BY 1)
SELECT cluster_size, count(*) AS n_clusters,
  cluster_size * count(*) AS n_docs
FROM csizes GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "source_lang_matrix",
        lambda spark, sf: text.source_lang_matrix(
            views(spark, sf)["documents"]),
        # wide per-source language composition (explicit pivot domain)
        """SELECT source,
  count(*) FILTER (lang = 'de') AS de,
  count(*) FILTER (lang = 'en') AS en,
  count(*) FILTER (lang = 'es') AS es,
  count(*) FILTER (lang = 'fr') AS fr,
  count(*) FILTER (lang = 'zh') AS zh,
  count(*) AS n_docs
FROM documents GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "events_weekly_growth",
        lambda spark, sf: eops.weekly_growth(views(spark, sf)["events"]),
        # week-over-week growth via lag over the weekly aggregate
        """WITH weekly AS (
  SELECT event_type, date_trunc('week', ts) AS w,
    count(*) AS n_events
  FROM events GROUP BY 1, 2)
SELECT event_type, strftime(w, '%Y-%m-%d') AS week, n_events,
  lag(n_events) OVER (PARTITION BY event_type ORDER BY w) AS prev_events,
  round((n_events - lag(n_events) OVER (PARTITION BY event_type
      ORDER BY w)) * 100.0
    / lag(n_events) OVER (PARTITION BY event_type ORDER BY w), 4)
    AS wow_pct
FROM weekly ORDER BY 1, 2""",
    ),
    _q(
        "quality_funnel",
        lambda spark, sf: text.quality_funnel(views(spark, sf)["documents"]),
        # sequential Gopher-rule attrition: stage i survivors = conj of
        # rules 1..i (same rule exprs as the gopher_quality oracle)
        f"""WITH m AS (
  SELECT
    len(string_split(text, ' ')) AS n_words,
    (length(text) - len(string_split(text, ' ')) + 1)
      / len(string_split(text, ' ')) AS mean_wl,
    (length(text)
      - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')))
      / greatest(len(string_split(text, ' ')), 1) AS sym_ratio,
    len(list_intersect(list_distinct(string_split(text, ' ')),
        ['the', 'a', 'of', 'and', 'to', 'in'])) AS n_sw,
    len(list_filter(string_split(text, ' '),
        w -> regexp_matches(w, '[a-zA-Z]')))
      / greatest(len(string_split(text, ' ')), 1) AS alpha_ratio
  FROM documents
), f AS (
  SELECT count(*) AS n_in,
    CAST(sum(((n_words >= {text.GOPHER_MIN_WORDS}
      AND n_words <= {text.GOPHER_MAX_WORDS}))::INT) AS BIGINT) AS s0,
    CAST(sum(((n_words >= {text.GOPHER_MIN_WORDS}
      AND n_words <= {text.GOPHER_MAX_WORDS})
      AND (mean_wl >= {text.GOPHER_MIN_MEAN_WORD_LEN}
        AND mean_wl <= {text.GOPHER_MAX_MEAN_WORD_LEN}))::INT)
      AS BIGINT) AS s1,
    CAST(sum(((n_words >= {text.GOPHER_MIN_WORDS}
      AND n_words <= {text.GOPHER_MAX_WORDS})
      AND (mean_wl >= {text.GOPHER_MIN_MEAN_WORD_LEN}
        AND mean_wl <= {text.GOPHER_MAX_MEAN_WORD_LEN})
      AND sym_ratio <= {text.GOPHER_MAX_SYMBOL_RATIO})::INT)
      AS BIGINT) AS s2,
    CAST(sum(((n_words >= {text.GOPHER_MIN_WORDS}
      AND n_words <= {text.GOPHER_MAX_WORDS})
      AND (mean_wl >= {text.GOPHER_MIN_MEAN_WORD_LEN}
        AND mean_wl <= {text.GOPHER_MAX_MEAN_WORD_LEN})
      AND sym_ratio <= {text.GOPHER_MAX_SYMBOL_RATIO}
      AND n_sw >= {text.GOPHER_MIN_DISTINCT_STOPWORDS})::INT)
      AS BIGINT) AS s3,
    CAST(sum(((n_words >= {text.GOPHER_MIN_WORDS}
      AND n_words <= {text.GOPHER_MAX_WORDS})
      AND (mean_wl >= {text.GOPHER_MIN_MEAN_WORD_LEN}
        AND mean_wl <= {text.GOPHER_MAX_MEAN_WORD_LEN})
      AND sym_ratio <= {text.GOPHER_MAX_SYMBOL_RATIO}
      AND n_sw >= {text.GOPHER_MIN_DISTINCT_STOPWORDS}
      AND alpha_ratio >= {text.GOPHER_MIN_ALPHA_WORD_RATIO})::INT)
      AS BIGINT) AS s4
  FROM m
)
SELECT * FROM (
  SELECT CAST(1 AS INT) AS stage, 'ok_word_count' AS rule,
    n_in AS docs_in, s0 AS docs_out, n_in - s0 AS n_dropped,
    round(s0 * 100.0 / n_in, 4) AS cum_pct FROM f
  UNION ALL SELECT CAST(2 AS INT), 'ok_mean_word_len', s0, s1, s0 - s1,
    round(s1 * 100.0 / n_in, 4) FROM f
  UNION ALL SELECT CAST(3 AS INT), 'ok_symbol_ratio', s1, s2, s1 - s2,
    round(s2 * 100.0 / n_in, 4) FROM f
  UNION ALL SELECT CAST(4 AS INT), 'ok_stopwords', s2, s3, s2 - s3,
    round(s3 * 100.0 / n_in, 4) FROM f
  UNION ALL SELECT CAST(5 AS INT), 'ok_alpha_words', s3, s4, s3 - s4,
    round(s4 * 100.0 / n_in, 4) FROM f
) ORDER BY stage""",
    ),
    _q(
        "boilerplate_paragraphs",
        lambda spark, sf: dedup.boilerplate_paragraphs(
            views(spark, sf)["documents"], para_words=20, min_df=3),
        # frequency-threshold boilerplate: every occurrence of a
        # paragraph seen in >= 3 distinct docs removed (no keeper);
        # cleaned_fp = md5 over the kept fingerprints in para order
        f"""WITH w AS (
  SELECT doc_id, string_split_regex(trim({_NORM}), ' +') AS ws
  FROM documents WHERE trim({_NORM}) <> ''
), ix AS (
  SELECT doc_id, ws,
    unnest(range(0, CAST(ceil(len(ws) / 20.0) AS BIGINT))) AS i
  FROM w
), e AS (
  SELECT doc_id, CAST(i AS INT) AS para_idx,
    md5(array_to_string(ws[(i * 20 + 1):(i * 20 + 20)], ' ')) AS fp
  FROM ix
), dfreq AS (
  SELECT fp, count(DISTINCT doc_id) AS df FROM e GROUP BY 1
), flagged AS (
  SELECT e.doc_id, e.para_idx, e.fp, dfreq.df >= 3 AS boiler
  FROM e JOIN dfreq USING (fp)
)
SELECT doc_id, count(*) AS n_paras,
  CAST(sum(boiler::INT) AS BIGINT) AS n_removed,
  round((count(*) - sum(boiler::INT)) / count(*), 6) AS frac_kept,
  md5(coalesce(string_agg(CASE WHEN NOT boiler THEN fp END, ''
    ORDER BY para_idx), '')) AS cleaned_fp
FROM flagged GROUP BY doc_id ORDER BY doc_id""",
        bench=True,
    ),
    _q(
        "embedding_outliers",
        lambda spark, sf: similarity.embedding_outliers(
            views(spark, sf)["embeddings"]),
        # per-label top-5 centroid-distance outliers in the
        # kmeans_assign fixed-point scheme: exact int sums -> one
        # int/int division per mean, same left-assoc distance fold,
        # floored int distances ranked desc with a vec_id tiebreak
        f"""WITH q AS (
  SELECT vec_id, label, list_transform(embedding,
    x -> CAST(round(CAST(x AS DOUBLE) * {similarity.KM_QUANT}) AS BIGINT))
    AS qv
  FROM embeddings
), c AS (
  SELECT label,
    {", ".join(f"sum(qv[{i + 1}]) / count(*) AS m{i + 1}"
               for i in range(64))}
  FROM q GROUP BY label
), s AS (
  SELECT q.vec_id, q.label,
    CAST(floor({" + ".join(
        f"(q.qv[{i + 1}] - c.m{i + 1}) * (q.qv[{i + 1}] - c.m{i + 1})"
        for i in range(64))}) AS BIGINT) AS d
  FROM q JOIN c ON q.label = c.label
), t AS (
  SELECT label, CAST(sum(d) AS BIGINT) AS sum_d, count(*) AS n
  FROM s GROUP BY 1
), r AS (
  SELECT vec_id, label, d,
    CAST(row_number() OVER (PARTITION BY label
      ORDER BY d DESC, vec_id) AS INT) AS rank
  FROM s
)
SELECT r.label, r.rank, r.vec_id, r.d AS dist_sq_q,
  round((r.d * t.n) / t.sum_d, 4) AS dist_ratio
FROM r JOIN t USING (label)
WHERE r.rank <= 5
ORDER BY r.label, r.rank""",
    ),
    _q(
        "ivf_recall",
        lambda spark, sf: similarity.ivf_recall(
            views(spark, sf)["embeddings"]),
        # recall@10 of the IVF index (same centroid/probe math as the
        # knn_ivf oracle) vs the exact brute-force top-k
        f"""WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  WHERE vec_id IN (20, 21, 22)
), scored AS (
  SELECT query_id, vec_id,
    round({_DOT.format(a='qe', b='embedding')}
      / (sqrt({_DOT.format(a='qe', b='qe')})
         * sqrt({_DOT.format(a='embedding', b='embedding')})), 6) AS cos_sim
  FROM embeddings, q WHERE vec_id <> query_id
), truth AS (
  SELECT query_id, vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY cos_sim DESC, vec_id) AS rank FROM scored
  ) WHERE rank <= 10
), ncent AS (
  -- half-even power-of-two rounding; see the knn_ivf oracle note
  SELECT greatest(4, least(65536, CAST(power(2,
    floor(x) + CASE WHEN x - floor(x) > 0.5 THEN 1
      WHEN x - floor(x) = 0.5 THEN CAST(floor(x) AS BIGINT) % 2
      ELSE 0 END) AS BIGINT))) AS nc
  FROM (SELECT log2(greatest(sqrt(count(*) * 1.0), 4)) AS x
        FROM embeddings)
), cents AS (
  SELECT vec_id AS centroid_id, embedding AS c FROM embeddings, ncent
  WHERE vec_id < nc
), assigned AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT e.vec_id, e.embedding, c.centroid_id,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY {_DOT.format(a='e.embedding', b='c.c')} DESC,
                 c.centroid_id DESC) AS rn
    FROM embeddings e, cents c
  ) WHERE rn = 1
), probe AS (
  SELECT query_id, qe, centroid_id FROM (
    SELECT q.query_id, q.qe, c.centroid_id,
      row_number() OVER (PARTITION BY q.query_id
        ORDER BY {_DOT.format(a='q.qe', b='c.c')} DESC,
                 c.centroid_id ASC) AS rn
    FROM q, cents c
  ) WHERE rn <= {similarity.N_PROBE}
), cand AS (
  SELECT p.query_id, a.vec_id,
    round({_DOT.format(a='p.qe', b='a.embedding')}
      / (sqrt({_DOT.format(a='p.qe', b='p.qe')})
         * sqrt({_DOT.format(a='a.embedding', b='a.embedding')})), 6)
      AS cos_sim
  FROM assigned a JOIN probe p ON a.centroid_id = p.centroid_id
  WHERE a.vec_id <> p.query_id
), approx AS (
  SELECT query_id, vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY cos_sim DESC, vec_id) AS rank FROM cand
  ) WHERE rank <= 10
)
SELECT t.query_id,
  CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_hit,
  count(*) AS n_truth,
  (CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    * 1000000) // count(*) AS recall_ppm
FROM truth t LEFT JOIN approx a
  ON t.query_id = a.query_id AND t.vec_id = a.vec_id
GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "lsh_bucket_stats",
        lambda spark, sf: dedup.lsh_bucket_stats(
            views(spark, sf)["documents"]),
        # per-band bucket-size skew report over the same banding as
        # dedup_minhash_lsh (shared _MINHASH_BANDS_CTES prelude)
        _MINHASH_BANDS_CTES.format(norm=_NORM, sig_body=_minhash_sig_sql())
        + """, sizes AS (
  SELECT band, bucket, count(*) AS sz FROM bands GROUP BY 1, 2
)
SELECT CAST(band AS INT) AS band, count(*) AS n_buckets,
  CAST(sum((sz = 1)::INT) AS BIGINT) AS n_singleton,
  CAST(sum((sz BETWEEN 2 AND 200)::INT) AS BIGINT) AS n_pairable,
  CAST(sum((sz > 200)::INT) AS BIGINT) AS n_saturated,
  CAST(sum(CASE WHEN sz > 200 THEN sz ELSE 0 END) AS BIGINT)
    AS docs_in_saturated,
  max(sz) AS max_bucket_sz,
  CAST(sum(CASE WHEN sz BETWEEN 2 AND 200 THEN sz * (sz - 1) // 2
    ELSE 0 END) AS BIGINT) AS pair_candidates
FROM sizes GROUP BY band ORDER BY band""",
        bench=True,
    ),
    _q(
        "events_daily_anomalies",
        lambda spark, sf: eops.daily_anomalies(views(spark, sf)["events"]),
        # median/MAD robust anomaly flag over exact-integer daily counts
        """WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events
  FROM events GROUP BY 1, 2
), med AS (
  SELECT event_type, median(n_events) AS med FROM daily GROUP BY 1
), dev AS (
  SELECT d.event_type, d.day, d.n_events, m.med,
    abs(d.n_events - m.med) AS adev
  FROM daily d JOIN med m USING (event_type)
), mad AS (
  SELECT event_type, median(adev) AS mad FROM dev GROUP BY 1
)
SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day, d.n_events,
  d.med, m.mad, d.adev > 3.0 * m.mad AS is_anomaly
FROM dev d JOIN mad m USING (event_type)
ORDER BY 1, 2""",
    ),
    _q(
        "table_profile",
        lambda spark, sf: sketch.table_profile(
            views(spark, sf)["lineitem"],
            ["l_orderkey", "l_suppkey", "l_linenumber",
             "l_returnflag", "l_linestatus"]),
        # one-pass per-column profile; KMV estimate replays the 52-bit
        # md5 math exactly ((k-1) * 2^52 / h_k, k = 256)
        f"""WITH vals AS (
  SELECT 'l_orderkey' AS col_name, CAST(l_orderkey AS VARCHAR) AS v
  FROM lineitem
  UNION ALL SELECT 'l_suppkey', CAST(l_suppkey AS VARCHAR) FROM lineitem
  UNION ALL SELECT 'l_linenumber', CAST(l_linenumber AS VARCHAR)
  FROM lineitem
  UNION ALL SELECT 'l_returnflag', l_returnflag FROM lineitem
  UNION ALL SELECT 'l_linestatus', l_linestatus FROM lineitem
), stats AS (
  SELECT col_name, count(*) AS n_rows,
    CAST(sum((v IS NULL)::INT) AS BIGINT) AS n_nulls,
    min(v) AS min_val, max(v) AS max_val
  FROM vals GROUP BY 1
), d AS (
  SELECT DISTINCT col_name, v FROM vals WHERE v IS NOT NULL
), h AS (
  SELECT col_name, v,
    CAST(('0x' || substr(md5(v), 1, 13)) AS BIGINT) AS h
  FROM d
), r AS (
  SELECT col_name, h,
    row_number() OVER (PARTITION BY col_name ORDER BY h, v) AS rn
  FROM h
), agg AS (
  SELECT col_name, count(*) AS n_distinct,
    max(CASE WHEN rn = {sketch.KMV_K} THEN h END) AS hk
  FROM r GROUP BY 1
)
SELECT s.col_name, s.n_rows, s.n_nulls, a.n_distinct,
  round(CASE WHEN a.n_distinct < {sketch.KMV_K}
    THEN a.n_distinct * 1.0
    ELSE {(sketch.KMV_K - 1) * float(1 << 52)} / a.hk END, 4)
    AS kmv_estimate,
  s.min_val, s.max_val
FROM stats s JOIN agg a USING (col_name) ORDER BY col_name""",
    ),
    _q(
        "dedup_containment",
        lambda spark, sf: dedup.containment_pairs(
            views(spark, sf)["documents"], threshold=0.8),
        # Broder max-containment over the same capped inverted index as
        # dedup_ngram_jaccard; WHERE applies to the unrounded ratio
        f"""WITH words AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
  WHERE len(string_split({_NORM}, ' ')) >= 3
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, greatest(len(w) - 2, 0) + 1),
    i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]))) AS shingle
  FROM words
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1
), ok AS (
  SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= 200
), shf AS (
  SELECT sh.* FROM sh JOIN ok USING (shingle)
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_common,
  round(n_common / least(sa.n_sh, sb.n_sh), 6) AS containment,
  round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common / least(sa.n_sh, sb.n_sh) >= 0.8
ORDER BY 1, 2""",
    ),
    _q(
        "corpus_growth_curve",
        lambda spark, sf: dedup.growth_curve(views(spark, sf)["documents"]),
        # dedup-saturation curve: first-occurrence fingerprints per
        # doc_id-range decile, with cumulative distinct fraction
        f"""WITH base AS (
  SELECT doc_id, md5({_NORM}) AS fp FROM documents
), mx AS (SELECT max(doc_id) AS m FROM base),
flagged AS (
  SELECT doc_id,
    (row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1)::INT
    AS is_new
  FROM base
), b AS (
  SELECT CAST(doc_id * 10 // (m + 1) AS INT) AS bucket, is_new
  FROM flagged, mx
), agg AS (
  SELECT bucket, count(*) AS n_docs,
    CAST(sum(is_new) AS BIGINT) AS n_new
  FROM b GROUP BY 1
)
SELECT bucket, n_docs, n_new,
  CAST(sum(n_docs) OVER (ORDER BY bucket) AS BIGINT) AS cum_docs,
  CAST(sum(n_new) OVER (ORDER BY bucket) AS BIGINT) AS cum_new,
  round(sum(n_new) OVER (ORDER BY bucket) * 1.0
    / sum(n_docs) OVER (ORDER BY bucket), 6) AS distinct_frac
FROM agg ORDER BY bucket""",
        bench=True,
    ),
    _q(
        "events_stickiness",
        lambda spark, sf: eops.stickiness(views(spark, sf)["events"]),
        # DAU / trailing-7d-WAU: (user, day) pairs fanned to the 7
        # target days they count toward, then exact distinct per day
        """WITH ud AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
), fan AS (
  SELECT ud.day + CAST(o.o AS INT) AS day, ud.user_id
  FROM ud, (SELECT unnest(range(0, 7)) AS o) o
), wau AS (
  SELECT day, count(DISTINCT user_id) AS wau FROM fan GROUP BY 1
), dau AS (
  SELECT day, count(DISTINCT user_id) AS dau FROM ud GROUP BY 1
)
SELECT strftime(d.day, '%Y-%m-%d') AS day, d.dau, w.wau,
  round(d.dau * 1.0 / w.wau, 6) AS stickiness
FROM dau d JOIN wau w USING (day) ORDER BY 1""",
    ),
    _q(
        "events_type_cooccurrence",
        lambda spark, sf: eops.type_cooccurrence(views(spark, sf)["events"]),
        # distinct-user overlap per type pair + lift vs independence
        """WITH ut AS (
  SELECT DISTINCT user_id, event_type FROM events
), per_type AS (
  SELECT event_type, count(*) AS n FROM ut GROUP BY 1
), nu AS (SELECT count(DISTINCT user_id) AS n_users FROM ut),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
    count(*) AS n_both
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b, p.n_both, ta.n AS n_a, tb.n AS n_b,
  round((p.n_both * nu.n_users) / (ta.n * tb.n), 6) AS lift
FROM pairs p
JOIN per_type ta ON ta.event_type = p.type_a
JOIN per_type tb ON tb.event_type = p.type_b
CROSS JOIN nu
ORDER BY 1, 2""",
    ),
    _q(
        "kmv_source_overlap",
        lambda spark, sf: sketch.kmv_source_overlap(
            views(spark, sf)["documents"]),
        # mergeable KMV set algebra per source pair: union k-minima =
        # k smallest of the two k-min lists; inclusion-exclusion for
        # the intersection; same 52-bit md5 hashes as the Spark side
        f"""WITH words AS (
  SELECT source, list_filter(string_split(text, ' '), w -> w <> '') AS w
  FROM documents
), toks AS (
  SELECT DISTINCT source,
    CAST(('0x' || substr(md5(g), 1, 13)) AS BIGINT) AS h
  FROM (
    SELECT source, w[i] || ' ' || w[i + 1] AS g
    FROM (SELECT source, w,
            unnest(range(1, greatest(len(w) - 1, 0) + 1)) AS i
          FROM words))
), stats AS (
  SELECT source, count(*) AS nd FROM toks GROUP BY 1
), r AS (
  SELECT source, h,
    row_number() OVER (PARTITION BY source ORDER BY h) AS rn
  FROM toks
), sk AS (
  SELECT source, list_sort(list(h)) AS hs
  FROM r WHERE rn <= {sketch.KMV_K} GROUP BY 1
), p AS (
  SELECT a.source AS src_a, b.source AS src_b, a.hs AS ha, b.hs AS hb,
    sa.nd AS nd_a, sb.nd AS nd_b
  FROM sk a JOIN sk b ON a.source < b.source
  JOIN stats sa ON sa.source = a.source
  JOIN stats sb ON sb.source = b.source
), m AS (
  SELECT *,
    list_sort(list_distinct(list_concat(ha, hb)))[1:{sketch.KMV_K}] AS mg
  FROM p
), e AS (
  SELECT src_a, src_b,
    CASE WHEN nd_a < {sketch.KMV_K} THEN CAST(nd_a AS DOUBLE)
      ELSE {(sketch.KMV_K - 1) * float(1 << 52)} / ha[{sketch.KMV_K}] END
      AS ea,
    CASE WHEN nd_b < {sketch.KMV_K} THEN CAST(nd_b AS DOUBLE)
      ELSE {(sketch.KMV_K - 1) * float(1 << 52)} / hb[{sketch.KMV_K}] END
      AS eb,
    CASE WHEN len(mg) < {sketch.KMV_K} THEN CAST(len(mg) AS DOUBLE)
      ELSE {(sketch.KMV_K - 1) * float(1 << 52)} / mg[{sketch.KMV_K}] END
      AS eu
  FROM m
)
SELECT src_a, src_b, round(ea, 4) AS est_a, round(eb, 4) AS est_b,
  round(eu, 4) AS union_est,
  round(greatest(0.0, ea + eb - eu), 4) AS inter_est,
  round(greatest(0.0, ea + eb - eu) / eu, 6) AS jaccard_est
FROM e ORDER BY 1, 2""",
    ),
    _q(
        "label_agreement",
        lambda spark, sf: text.label_agreement(views(spark, sf)["documents"]),
        # same stopword-profile classifier as language_id, folded to a
        # per-source agreement/undecided report
        """WITH s AS (
  SELECT source, lang,
    len(list_filter(string_split(text, ' '), w -> w IN ('the', 'a', 'and'))) AS hits_en,
    len(list_filter(string_split(text, ' '), w -> w IN ('der', 'und', 'die'))) AS hits_de,
    len(list_filter(string_split(text, ' '), w -> w IN ('el', 'la', 'los'))) AS hits_es,
    len(list_filter(string_split(text, ' '), w -> w IN ('le', 'et', 'les'))) AS hits_fr
  FROM documents
), p AS (
  SELECT source, lang, CASE
    WHEN greatest(hits_en, hits_de, hits_es, hits_fr) = 0 THEN 'und'
    WHEN hits_en = greatest(hits_en, hits_de, hits_es, hits_fr) THEN 'en'
    WHEN hits_de = greatest(hits_en, hits_de, hits_es, hits_fr) THEN 'de'
    WHEN hits_es = greatest(hits_en, hits_de, hits_es, hits_fr) THEN 'es'
    ELSE 'fr' END AS predicted
  FROM s
)
SELECT source, count(*) AS n_docs,
  CAST(sum((predicted = lang)::INT) AS BIGINT) AS n_agree,
  CAST(sum((predicted = 'und')::INT) AS BIGINT) AS n_undecided,
  round(sum((predicted = lang)::INT) / count(*), 6) AS agree_rate
FROM p GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "frequent_ngrams",
        lambda spark, sf: dedup.frequent_ngrams(views(spark, sf)["documents"]),
        # top-50 8-grams by distinct-document frequency (memorization
        # removal list); ties broken by the ngram string
        f"""WITH words AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, greatest(len(w) - 7, 0) + 1),
    i -> {" || ' ' || ".join(f"w[i + {j}]" for j in range(8))}))) AS shingle
  FROM words WHERE len(w) >= 8
), dfreq AS (
  SELECT shingle, count(*) AS df FROM sh GROUP BY 1
)
SELECT row_number() OVER (ORDER BY df DESC, shingle) AS rank,
  shingle AS ngram, df
FROM dfreq ORDER BY df DESC, shingle LIMIT 50""",
    ),
    _q(
        "pq_reconstruction_report",
        lambda spark, sf: similarity.pq_reconstruction_report(
            views(spark, sf)["embeddings"]),
        # per-label exact-integer PQ reconstruction error over the same
        # codes as pq_codes (shared _PQ_CTES)
        _PQ_CTES + f""", lab AS (
  SELECT vec_id, label FROM embeddings
)
SELECT label,
  CAST(count(*) // {similarity.PQ_M} AS BIGINT) AS n_vecs,
  CAST(sum(dist) AS BIGINT) AS total_err,
  round(sum(dist) * 1.0 / count(*), 4) AS avg_err_per_sub
FROM best JOIN lab USING (vec_id)
WHERE rn = 1 GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "ivf_list_balance",
        lambda spark, sf: similarity.ivf_list_balance(
            views(spark, sf)["embeddings"]),
        # list sizes under the same assignment rule as knn_ivf
        f"""WITH cents AS (
  SELECT vec_id AS centroid_id, embedding AS c FROM embeddings
  WHERE vec_id < {similarity.N_CENTROIDS}
), assigned AS (
  SELECT vec_id, centroid_id FROM (
    SELECT e.vec_id, c.centroid_id,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY {_DOT.format(a='e.embedding', b='c.c')} DESC,
                 c.centroid_id DESC) AS rn
    FROM embeddings e, cents c
  ) WHERE rn = 1
), sizes AS (
  SELECT centroid_id, count(*) AS n_vecs FROM assigned GROUP BY 1
), t AS (SELECT sum(n_vecs) AS tot FROM sizes)
SELECT centroid_id, n_vecs,
  round(n_vecs / tot, 6) AS share,
  round(n_vecs * {similarity.N_CENTROIDS} / tot, 4) AS skew
FROM sizes, t ORDER BY 1""",
    ),
    _q(
        "events_session_distribution",
        lambda spark, sf: eops.session_distribution(
            views(spark, sf)["events"]),
        # one-row session-shape summary over the shared sessionize CTE;
        # quantile_cont matches Spark's exact interpolated percentile
        _SESSIONIZE_CTES + """
SELECT count(*) AS n_sessions,
  round(quantile_cont(n_events, 0.5), 4) AS p50_events,
  round(quantile_cont(n_events, 0.9), 4) AS p90_events,
  round(quantile_cont(n_events, 0.99), 4) AS p99_events,
  max(n_events) AS max_events,
  round(quantile_cont(duration_s, 0.5), 4) AS p50_duration_s,
  round(quantile_cont(duration_s, 0.9), 4) AS p90_duration_s,
  round(quantile_cont(duration_s, 0.99), 4) AS p99_duration_s,
  max(duration_s) AS max_duration_s
FROM sess""",
    ),
    _q(
        "order_ship_latency",
        lambda spark, sf: tpch.order_ship_latency(
            views(spark, sf)["orders"], views(spark, sf)["lineitem"]),
        # exact integer day latencies; per-priority exact percentiles
        """WITH lat AS (
  SELECT o.o_orderpriority,
    date_diff('day', CAST(o.o_orderdate AS DATE),
              CAST(l.l_shipdate AS DATE)) AS days
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT o_orderpriority, count(*) AS n_items,
  round(quantile_cont(days, 0.5), 4) AS p50_days,
  round(quantile_cont(days, 0.9), 4) AS p90_days,
  round(quantile_cont(days, 0.99), 4) AS p99_days,
  CAST(max(days) AS BIGINT) AS max_days
FROM lat GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "split_leakage",
        lambda spark, sf: pipeline.split_leakage(views(spark, sf)["documents"]),
        # same md5 split rule as training_shards; split-set per content
        # fingerprint, leak = a set spanning more than one split
        f"""WITH base AS (
  SELECT CASE
    WHEN CAST('0x' || substr(md5('{pipeline.SPLIT_SALT}:'
      || CAST(doc_id AS VARCHAR)), 1, 7) AS BIGINT) % 10000
      < {pipeline.SPLIT_CUTS[0][1]} THEN 'train'
    WHEN CAST('0x' || substr(md5('{pipeline.SPLIT_SALT}:'
      || CAST(doc_id AS VARCHAR)), 1, 7) AS BIGINT) % 10000
      < {pipeline.SPLIT_CUTS[1][1]} THEN 'val'
    ELSE 'test' END AS split,
    md5(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS fp
  FROM documents
), per AS (
  SELECT fp,
    array_to_string(list_sort(list_distinct(list(split))), '+')
      AS split_set,
    count(*) AS n_docs
  FROM base GROUP BY fp
)
SELECT split_set, count(*) AS n_fingerprints,
  CAST(sum(n_docs) AS BIGINT) AS n_docs,
  contains(split_set, '+') AS is_leak
FROM per GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "events_ewma_forecast",
        lambda spark, sf: eops.ewma_forecast(views(spark, sf)["events"]),
        # alpha=1/2 EWMA: every halving is an exact exponent shift, so
        # the left fold replays bit-identically via list_reduce
        """WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
  FROM events GROUP BY 1, 2
), arr AS (
  SELECT event_type,
    list_transform(list(n ORDER BY day), x -> CAST(x AS DOUBLE)) AS vals
  FROM daily GROUP BY 1
), e AS (
  SELECT event_type, vals, len(vals) AS n_days,
    list_reduce(vals, (a, x) -> (a + x) / 2) AS ewma,
    list_transform(range(2, len(vals) + 1), t -> abs(
      vals[CAST(t AS INT)] - CASE WHEN t = 2 THEN vals[1]
        ELSE list_reduce(vals[1:CAST(t AS INT) - 1],
                         (a, x) -> (a + x) / 2) END)) AS errs
  FROM arr
)
SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
  round(ewma, 6) AS ewma_forecast,
  CASE WHEN n_days >= 2
    THEN round(list_reduce(errs, (a, x) -> a + x) / len(errs), 6)
  END AS backtest_mae
FROM e ORDER BY 1""",
    ),
    _q(
        "approx_group_counts",
        lambda spark, sf: pipeline.approx_group_counts(
            views(spark, sf)["documents"]),
        # Horvitz-Thompson scale-up from the md5 Bernoulli sample (rate
        # 0.1 -> key < 1000 of 10000), exact count alongside
        """WITH k AS (
  SELECT lang,
    (CAST('0x' || substr(md5('htsample-v1:' || CAST(doc_id AS VARCHAR)),
      1, 7) AS BIGINT) % 10000 < 1000) AS in_sample
  FROM documents
)
SELECT lang, count(*) AS exact_docs,
  CAST(sum(in_sample::INT) AS BIGINT) AS sampled_docs,
  round(sum(in_sample::INT) / 0.1, 4) AS ht_estimate,
  round(abs(sum(in_sample::INT) / 0.1 - count(*)) / count(*), 6)
    AS rel_err
FROM k GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "bpe_merge_candidates",
        lambda spark, sf: mining.bpe_merge_candidates(
            views(spark, sf)["documents"]),
        # one BPE training step: adjacent symbol-pair counts over the
        # vocabulary, weighted by word frequency with multiplicity
        f"""WITH w AS (
  SELECT unnest(list_filter(string_split({_NORM}, ' '), x -> x <> ''))
    AS word
  FROM documents
), vocab AS (
  SELECT word, count(*) AS freq FROM w GROUP BY 1
), pairs AS (
  SELECT word, freq, substr(word, CAST(i AS INT), 2) AS pair
  FROM (SELECT word, freq, unnest(range(1, length(word))) AS i
        FROM vocab WHERE length(word) >= 2)
), agg AS (
  SELECT pair, CAST(sum(freq) AS BIGINT) AS total_count,
    count(DISTINCT word) AS n_words
  FROM pairs GROUP BY 1
)
SELECT row_number() OVER (ORDER BY total_count DESC, pair) AS rank,
  pair, total_count, n_words
FROM agg ORDER BY total_count DESC, pair LIMIT 50""",
    ),
]
