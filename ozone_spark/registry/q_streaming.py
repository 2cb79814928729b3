"""CDC / structured streaming drains — QuerySpecs + DuckDB oracle SQL twins (split out of the
single-module registry in round 8; see ozone_spark/registry/__init__.py).
"""

from __future__ import annotations

from ._base import *  # noqa: F401,F403 — shared registry namespace
from .q_text import _NORM  # noqa: F401 — cross-domain helper
from .q_namespace import _ANC_LIST  # noqa: F401 — cross-domain helper
from .q_insights import _FILE_BIN  # noqa: F401 — cross-domain helper


# ---------------------------------------------------------------------------
# streaming plane (ST1-ST6): drained streams returned as batch results
# ---------------------------------------------------------------------------

_stream_seq = [0]


def _cdc_incremental_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST1-ST5 end-to-end: synthesize the CDC log from the key table,
    drain it with AvailableNow maintaining the histogram incrementally,
    return the materialized view (oracle: batch recompute over the final
    key state — the process()==reprocess() contract)."""
    import tempfile

    from ozone_spark.streaming import cdc as scdc

    t = views(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="ozs_cdc_gate_")
    scdc.synthesize_cdc_log(t["keys"], t["deleted_keys"], f"{work}/cdc")
    scdc.run_incremental_histogram(spark, f"{work}/cdc", f"{work}/store",
                                   f"{work}/ckpt")
    return spark.read.parquet(f"{work}/store").drop("view_bucket")


def _cdc_namespace_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4 for the per-directory size distribution (/namespace/dist):
    incrementally-maintained fileSizeBucket counts (oracle: batch dist
    over the final key state)."""
    import tempfile

    from ozone_spark.streaming import cdc as scdc

    t = views(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="ozs_dist_gate_")
    scdc.synthesize_cdc_log(t["keys"], t["deleted_keys"], f"{work}/cdc")
    scdc.run_incremental_namespace_dist(
        spark, f"{work}/cdc", f"{work}/store", f"{work}/ckpt")
    return spark.read.parquet(f"{work}/store").drop("view_bucket")


def _cdc_container_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4 for J5: incrementally-maintained container→key index
    (oracle: batch index over the final key state)."""
    import tempfile

    from ozone_spark.streaming import cdc as scdc

    t = views(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="ozs_cki_gate_")
    # events carry their block_locations payload (the reference decodes
    # locations from the event itself — OMDBUpdatesHandler.java:71-99),
    # so the index consumer needs no side-table join
    scdc.synthesize_cdc_log(t["keys"], t["deleted_keys"], f"{work}/cdc",
                            locations=t["locations"])
    scdc.run_incremental_container_index(
        spark, f"{work}/cdc", None, f"{work}/store", f"{work}/ckpt")
    return spark.read.parquet(f"{work}/store").drop("view_bucket")


def _streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ozone_spark.streaming import windows as swin
    import tempfile

    _stream_seq[0] += 1
    name = f"gate_tumbling_{_stream_seq[0]}"
    stream = swin.read_events_stream(spark, f"{sf_dir}/events.parquet")
    return swin.drain_to_memory(
        swin.streaming_tumbling_daily(stream), spark, name,
        tempfile.mkdtemp(prefix="ozs_ckpt_"))


def _streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ozone_spark.streaming import windows as swin
    import tempfile

    _stream_seq[0] += 1
    name = f"gate_sessions_{_stream_seq[0]}"
    stream = swin.read_events_stream(spark, f"{sf_dir}/events.parquet")
    return swin.drain_to_memory(
        swin.streaming_sessionize(stream), spark, name,
        tempfile.mkdtemp(prefix="ozs_ckpt_"))


def _streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ozone_spark.streaming import windows as swin
    import tempfile

    _stream_seq[0] += 1
    name = f"gate_sdedup_{_stream_seq[0]}"
    stream = swin.read_documents_stream(spark, f"{sf_dir}/documents.parquet")
    return swin.drain_to_memory(
        swin.streaming_dedup_fingerprints(stream), spark, name,
        tempfile.mkdtemp(prefix="ozs_ckpt_"), output_mode="append",
    ).orderBy("fingerprint")


def _streaming_dedup_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ozone_spark.streaming import windows as swin
    import tempfile

    _stream_seq[0] += 1
    name = f"gate_sdedup_wm_{_stream_seq[0]}"
    # The oracle equivalence (survivors == DISTINCT fingerprints) only
    # holds if every duplicate pair's ingest timestamps fall inside the
    # dedup horizon.  The ingest clock is 1 doc/ms of doc_id, so size
    # the horizon to the corpus's actual doc_id span (one cheap scalar
    # agg) instead of assuming a fixed 1 hour covers it — a corpus with
    # ids more than 3.6M apart (e.g. cross-corpus appends with offset
    # ids) would otherwise let late duplicates survive and break the
    # gate.  Production use keeps the fixed-horizon default: there the
    # horizon is the dedup CONTRACT, not an equivalence to batch
    # distinct.
    import pyspark.sql.functions as F
    span_ms = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .agg((F.max("doc_id") - F.min("doc_id") + 1).alias("s"))
        .collect()[0]["s"]
    )
    stream = swin.read_documents_stream(spark, f"{sf_dir}/documents.parquet")
    return swin.drain_to_memory(
        swin.streaming_dedup_within_watermark(
            stream, horizon=f"{int(span_ms)} milliseconds"),
        spark, name,
        tempfile.mkdtemp(prefix="ozs_ckpt_"), output_mode="append",
    ).orderBy("fingerprint")


def _streaming_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ozone_spark.streaming import windows as swin
    import tempfile

    _stream_seq[0] += 1
    name = f"gate_session_stats_{_stream_seq[0]}"
    stream = swin.read_events_stream(spark, f"{sf_dir}/events.parquet")
    return swin.drain_to_memory(
        swin.streaming_session_stats(stream), spark, name,
        tempfile.mkdtemp(prefix="ozs_ckpt_"), output_mode="append",
    ).orderBy("user_id", "session_start_ms")


STREAMING_QUERIES = [
    _q(
        "cdc_incremental_histogram",
        _cdc_incremental_histogram,
        with_views(
            f"""SELECT volume, bucket, {_FILE_BIN} AS bin_index,
  count(*) AS delta
FROM keys WHERE object_id NOT IN (SELECT object_id FROM deleted_keys)
GROUP BY 1, 2, 3""",
            ["keys", "deleted_keys"],
        ),
    ),
    _q(
        "cdc_incremental_namespace_dist",
        _cdc_namespace_dist,
        with_views(
            f"""WITH anc AS (
  SELECT unnest({_ANC_LIST}) AS dir_path, data_size FROM keys
  WHERE object_id NOT IN (SELECT object_id FROM deleted_keys)
)
SELECT dir_path, {_FILE_BIN} AS bin_index,
  count(*) AS file_count
FROM anc GROUP BY 1, 2""",
            ["keys", "deleted_keys"],
        ),
    ),
    _q(
        "cdc_incremental_container_index",
        lambda spark, sf: _cdc_container_index(spark, sf),
        with_views(
            """SELECT container_id, count(*) AS block_count,
  CAST(sum(block_len) AS BIGINT) AS total_bytes
FROM locations
WHERE object_id NOT IN (SELECT object_id FROM deleted_keys)
GROUP BY 1""",
            ["locations", "deleted_keys"],
        ),
    ),
    _q(
        "streaming_tumbling_daily",
        _streaming_tumbling,
        """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
  count(*) AS n_events, round(sum(value), 4) AS total_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    ),
    _q(
        "streaming_sessionize",
        _streaming_sessions,
        # complete-mode AvailableNow drain emits EVERY session (open +
        # closed), so the oracle is the plain batch gap-sessionization;
        # session_window's end = last event ts + gap
        """WITH e AS (
  SELECT user_id, event_id, value, ts, epoch_ms(ts) AS ms FROM events
), l AS (
  SELECT *, lag(ms) OVER (PARTITION BY user_id ORDER BY ts, event_id)
    AS prev FROM e
), s AS (
  SELECT *,
    CASE WHEN prev IS NOT NULL AND ms - prev > 1800000 THEN 1 ELSE 0 END
      AS new_sess
  FROM l
), c AS (
  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts,
    event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid FROM s
)
SELECT user_id,
  CAST(min(ms) AS BIGINT) AS session_start_ms,
  CAST(max(ms) + 1800000 AS BIGINT) AS session_end_ms,
  count(*) AS n_events,
  round(sum(value), 4) AS total_value
FROM c GROUP BY user_id, sid
ORDER BY user_id, session_start_ms""",
    ),
    _q(
        "streaming_session_stats",
        _streaming_session_stats,
        # closed sessions only == batch sessionization minus each user's
        # final (still-open) session; payload carries the order-dependent
        # stats (max internal gap, distinct event types) that the custom
        # applyInPandasWithState operator maintains in its state rows
        """WITH e AS (
  SELECT user_id, event_id, event_type, value, ts, epoch_ms(ts) AS ms
  FROM events
), l AS (
  SELECT *, lag(ms) OVER (PARTITION BY user_id ORDER BY ts, event_id)
    AS prev FROM e
), s AS (
  SELECT *,
    CASE WHEN prev IS NOT NULL AND ms - prev > 1800000 THEN 1 ELSE 0 END
      AS new_sess,
    CASE WHEN prev IS NULL OR ms - prev > 1800000 THEN 0 ELSE ms - prev END
      AS gap
  FROM l
), c AS (
  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts,
    event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid FROM s
), agg AS (
  SELECT user_id, sid,
    CAST(min(ms) AS BIGINT) AS session_start_ms,
    CAST(max(ms) AS BIGINT) AS session_end_ms,
    count(*) AS n_events,
    round(sum(value), 4) AS total_value,
    CAST(max(gap) AS BIGINT) AS max_gap_ms,
    CAST(count(DISTINCT event_type) AS BIGINT) AS n_event_types,
    max(sid) OVER (PARTITION BY user_id) AS last_sid
  FROM c GROUP BY 1, 2
)
SELECT user_id, session_start_ms, session_end_ms, n_events,
  total_value, max_gap_ms, n_event_types
FROM agg WHERE sid < last_sid
ORDER BY user_id, session_start_ms""",
        bench=True,
    ),
    _q(
        "streaming_dedup",
        _streaming_dedup,
        # the surviving fingerprint SET is deterministic (which doc_id
        # won the state race is not, so only the fingerprint is emitted)
        f"""SELECT DISTINCT md5({_NORM}) AS fingerprint
FROM documents ORDER BY fingerprint""",
    ),
    _q(
        "streaming_dedup_bounded",
        _streaming_dedup_bounded,
        # monotone ingest clock + full drain => survivors == DISTINCT
        f"""SELECT DISTINCT md5({_NORM}) AS fingerprint
FROM documents ORDER BY fingerprint""",
    ),
    _q(
        "skewed_event_totals",
        lambda spark, sf: _skewed_event_totals(spark, sf),
        # salting invariant: the two-stage salted aggregation equals the
        # plain GROUP BY (the salt only redistributes partial state)
        """SELECT event_type, count(*) AS count,
  round(sum(value), 4) AS sum_value
FROM events GROUP BY 1 ORDER BY 1""",
    ),
]


def _skewed_event_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof aggregation demo on the hottest real key (event_type:
    a handful of values over the whole table — exactly the shape where
    one reducer melts at 100 TB without salting)."""
    import pyspark.sql.functions as F

    from ozone_spark.functions.skew import salted_sum_count
    ev = views(spark, sf_dir)["events"]
    agg = salted_sum_count(ev, ["event_type"], ["value"])
    return (
        agg.select("event_type", "count",
                   F.round("sum_value", 4).alias("sum_value"))
        .orderBy("event_type")
    )

# ---------------------------------------------------------------------------
# ACL evaluation (P8 neighborhood) + growth view (CLUSTER_GROWTH_DAILY)
# ---------------------------------------------------------------------------

from ozone_spark.operators import acl as aclops  # noqa: E402
