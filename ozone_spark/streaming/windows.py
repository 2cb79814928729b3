"""Streaming event-time analytics (SURVEY.md §2.8 ST6 north star).

The reference has no event-time windows (WAL order is total, no late
data); these are the beyond-reference streaming surface: watermarked
tumbling/sliding windows and session windows over the `events` table,
with batch twins in ozone_spark.operators.events (the invariant tests
assert stream(AvailableNow drain) == batch on the same input).
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def read_events_stream(spark: SparkSession, events_dir_or_file: str,
                       max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream of the events table (ns timestamps handled the
    same way as the batch loader).  The streaming file source requires a
    directory; a bare parquet file is staged via symlink."""
    path = events_dir_or_file
    if os.path.isfile(path):
        staged = tempfile.mkdtemp(prefix="ozs_events_src_")
        os.symlink(os.path.abspath(path),
                   os.path.join(staged, os.path.basename(path)))
        path = staged
    schema = spark.read.parquet(path).schema
    df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # withWatermark requires TIMESTAMP (with local tz); the NTZ→TZ cast
        # keeps the wall-clock instant in the session tz, so window starts
        # and date_format day strings match the batch twin reading NTZ.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def streaming_tumbling_daily(events_stream: DataFrame,
                             watermark: str = "1 day") -> DataFrame:
    """Watermarked tumbling-window twin of operators.events.tumbling_daily:
    late rows beyond the watermark are dropped; in append mode a window
    only emits once it is sealed."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"),
                "event_type", "n_events", "total_value")
    )


def streaming_sessionize(events_stream: DataFrame, gap_minutes: int = 30,
                         watermark: str = "1 hour") -> DataFrame:
    """Session windows per user via session_window() — the stateful
    streaming twin of the batch lag/cumsum sessionization."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", f"{gap_minutes} minutes").alias("w"),
                 "user_id")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 4).alias("total_value"))
        .select("user_id",
                F.unix_millis(F.col("w.start")).alias("session_start_ms"),
                F.unix_millis(F.col("w.end")).alias("session_end_ms"),
                "n_events", "total_value")
    )


def streaming_session_stats(events_stream: DataFrame,
                            gap_minutes: int = 30,
                            watermark: str = "1 hour") -> DataFrame:
    """CUSTOM stateful streaming operator via applyInPandasWithState
    (SURVEY §2.8 ST4's mapGroupsWithState analog): per-user gap
    sessionization carrying ORDER-DEPENDENT session payloads that
    session_window() aggregation cannot express — the maximum internal
    event gap and the distinct event-type count of each session.

    Semantics: per micro-batch, a user's events extend their open
    session; every session CLOSED by a later event (gap exceeded) is
    emitted; the trailing open session persists in the state store
    across batches (and is never emitted — matching an unbounded
    stream, where the last session is always still open).  Emitted
    rows therefore equal the batch sessionization MINUS each user's
    final session, which is exactly what the DuckDB oracle checks.

    Scale shape: state is one fixed-width row per user (the open
    session aggregate), grouped by user_id — the same key the shuffle
    already partitions by; batch rows are Arrow-transferred and
    processed vectorized-ish per group.  The pandas fn is closure-free
    (pure pandas + stdlib), so it runs on any executor without the
    repo on sys.path."""
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (LongType, DoubleType, StringType,
                                   StructField, StructType)

    gap_ms = gap_minutes * 60_000
    out_schema = StructType([
        StructField("user_id", LongType()),
        StructField("session_start_ms", LongType()),
        StructField("session_end_ms", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("max_gap_ms", LongType()),
        StructField("n_event_types", LongType()),
    ])
    state_schema = StructType([
        StructField("start_ms", LongType()),
        StructField("last_ms", LongType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("max_gap", LongType()),
        StructField("types", StringType()),  # \x1f-joined distinct set
    ])

    def fn(key, pdf_iter, state):
        import pandas as pd
        (user_id,) = key
        rows = [p for p in pdf_iter if len(p)]
        closed = []
        if state.exists:
            start, last, n, total, max_gap, types_s = state.get
            types = set(types_s.split("\x1f")) if types_s else set()
        else:
            start = None
            types = set()
        if rows:
            batch = pd.concat(rows).sort_values(["ts_ms", "event_id"])
            for ts, val, etype in zip(batch["ts_ms"], batch["value"],
                                      batch["event_type"]):
                ts, val = int(ts), float(val)
                if start is None:
                    start, last, n, total, max_gap = ts, ts, 1, val, 0
                    types = {etype}
                elif ts - last > gap_ms:
                    # raw total here; rounding happens JVM-side below so
                    # the half-up rule matches the batch/oracle twins
                    # (Python round() is banker's — subtly different)
                    closed.append((user_id, start, last, n,
                                   total, max_gap, len(types)))
                    start, last, n, total, max_gap = ts, ts, 1, val, 0
                    types = {etype}
                else:
                    max_gap = max(max_gap, ts - last)
                    last, n, total = ts, n + 1, total + val
                    types.add(etype)
        if start is not None:
            state.update((start, last, n, total, max_gap,
                          "\x1f".join(sorted(types))))
        yield pd.DataFrame(closed, columns=[f.name for f in out_schema.fields])

    ts_ms = F.unix_millis(F.col("ts"))
    return (
        events_stream.withWatermark("ts", watermark)
        .select("user_id", "event_id", "event_type", "value",
                ts_ms.alias("ts_ms"), "ts")
        .groupBy("user_id")
        .applyInPandasWithState(fn, out_schema, state_schema, "append",
                                GroupStateTimeout.NoTimeout)
        .withColumn("total_value", F.round("total_value", 4))
    )


def read_documents_stream(spark: SparkSession, docs_dir_or_file: str,
                          max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream of the documents table (ingest-crawl shape)."""
    path = docs_dir_or_file
    if os.path.isfile(path):
        staged = tempfile.mkdtemp(prefix="ozs_docs_src_")
        os.symlink(os.path.abspath(path),
                   os.path.join(staged, os.path.basename(path)))
        path = staged
    schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def streaming_dedup_fingerprints(docs_stream: DataFrame) -> DataFrame:
    """Streaming exact dedup: the first arrival of each normalized-text
    fingerprint passes, later copies are dropped by the state store —
    the ingest-time dedup gate of a crawl pipeline (each incoming batch
    is checked against everything already accepted).

    State is one row per distinct fingerprint.  On an unbounded stream
    pair this with `withWatermark` on an ingest-time column +
    `dropDuplicatesWithinWatermark` to bound state; the fixture tables
    carry no ingest timestamp, so this variant keeps full state (the
    RocksDB state store backend is the 100 TB-scale knob)."""
    fp = F.md5(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""))
    return (
        docs_stream.select(fp.alias("fingerprint"))
        .dropDuplicates(["fingerprint"])
    )


def streaming_dedup_within_watermark(docs_stream: DataFrame,
                                     horizon: str = "1 hour") -> DataFrame:
    """Bounded-state streaming dedup — the 100 TB form of
    streaming_dedup_fingerprints: dropDuplicatesWithinWatermark keyed
    on the fingerprint with an ingest-time watermark, so a
    fingerprint's state row is evicted once the watermark passes the
    dedup `horizon` — state is bounded by the horizon instead of
    growing with corpus lifetime (the state-TTL pattern of production
    ingest pipelines).

    The fixture has no ingest timestamp, so a deterministic one is
    derived from doc_id (1 doc/ms from a fixed epoch).  The surviving
    set equals DISTINCT fingerprints only while every duplicate pair's
    ingest times fit inside `horizon`; the gate therefore sizes the
    horizon to the corpus's doc_id span (registry._streaming_dedup
    _bounded) rather than assuming the 1-hour default covers it."""
    fp = F.md5(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""))
    ingest = F.timestamp_millis(F.lit(1009843200000) + F.col("doc_id"))
    return (
        docs_stream.select(fp.alias("fingerprint"),
                           ingest.alias("ingest_ts"))
        .withWatermark("ingest_ts", horizon)
        .dropDuplicatesWithinWatermark(["fingerprint"])
        .select("fingerprint")
    )


def drain_to_memory(stream_df: DataFrame, spark: SparkSession,
                    name: str, checkpoint_dir: str,
                    output_mode: str = "complete") -> DataFrame:
    """Run an AvailableNow drain of a streaming aggregation into an
    in-memory sink and return the result table."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def streaming_attribution(events_stream: DataFrame,
                          attrib_minutes: int = 30,
                          watermark: str = "1 hour") -> DataFrame:
    """Stream-stream interval join (ST6 surface the single-stream windows
    don't exercise): attribute every `click` to the same user's `view`
    events in the preceding `attrib_minutes` — the canonical
    impression->conversion join.  Both sides are branches of ONE source
    stream (a supported streaming self-join); each carries its own
    watermark, and the join's time-range predicate lets Spark expire
    buffered view/click state once the watermark passes the interval —
    bounded state at any corpus size, instead of an ever-growing buffer.

    Inner join in append mode: every (view, click) pair within the
    window, exact and deterministic, so a batch inequality-join oracle
    replays it."""
    views_s = (
        events_stream.where(F.col("event_type") == "view")
        .select("user_id",
                F.col("event_id").alias("view_event_id"),
                F.col("ts").alias("view_ts"))
        .withWatermark("view_ts", watermark)
    )
    clicks_s = (
        events_stream.where(F.col("event_type") == "click")
        .select(F.col("user_id").alias("click_user_id"),
                F.col("event_id").alias("click_event_id"),
                F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", watermark)
    )
    joined = views_s.join(
        clicks_s,
        (F.col("user_id") == F.col("click_user_id"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts")
           <= F.col("view_ts") + F.expr(f"INTERVAL {attrib_minutes} MINUTES")),
        "inner")
    return joined.select(
        "user_id", "view_event_id", "click_event_id",
        (F.unix_micros("click_ts") - F.unix_micros("view_ts"))
        .alias("gap_us"))


def streaming_hdr_histogram(docs_stream: DataFrame,
                            sub: int | None = None) -> DataFrame:
    """Streaming twin of sketch.hdr_histogram: the per-(source, bucket)
    counter table maintained as a stateful streaming aggregation — the
    resident quantile sketch updating as crawl batches arrive, which is
    the production form of hdr_ingest_drift's before/after merge (each
    micro-batch's partial histogram folds into state by counter
    addition; complete-mode output IS the resident sketch).

    State is |sources| x |buckets| rows — bounded by the bucket grammar
    (log2 octaves x sub), NOT by corpus size, so the aggregation never
    needs a watermark: this is exactly the mergeable-sketch property
    that makes the operator safe on an unbounded 100 TB crawl stream.
    The integer bucket math is identical to the batch side, so the
    drained state equals hdr_histogram(batch) row-for-row
    (test_streaming asserts it)."""
    if sub is None:
        # share the batch sketch's tuning constant so a retune can
        # never silently desynchronize the two sides (ADVICE r8)
        from ozone_spark.functions.sketch import HDR_SUB
        sub = HDR_SUB
    x = F.col("n_chars").cast("long")
    return (
        docs_stream.where(x > 0)
        .select(F.col("source").alias("g"),
                (F.length(F.bin(x)) - 1).cast("int").alias("i"), x.alias("x"))
        .withColumn("p", F.expr("shiftleft(CAST(1 AS BIGINT), i)"))
        .groupBy("g",
                 (F.col("i") * sub + F.expr(f"((x - p) * {sub}) div p"))
                 .alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def streaming_ingest_dedup(spark: SparkSession, ingest_stream: DataFrame,
                           corpus: DataFrame, out_dir: str,
                           checkpoint_dir: str, n: int = 3,
                           threshold: float = 0.5,
                           max_bucket: int = 200,
                           recover_saturated: int = 0) -> DataFrame:
    """Streaming twin of dedup.incremental_ingest_dedup — the
    production ingest gate as a foreachBatch drain: the RESIDENT corpus
    probe structures (fingerprint set + capped shingle inverted index)
    are built and PERSISTED once, then every arriving micro-batch is
    classified against that same copy with the exact batch program and
    appended to `out_dir`.  Classification is per-document against the
    resident corpus only, so the drained union is bit-identical to one
    batch run over the whole ingest set regardless of micro-batch
    boundaries (the registry gates it against the same DuckDB oracle
    as the batch query).

    Scale shape: foreachBatch, NOT a stream-static join inside the
    streaming plan — a naive stream-static join re-reads and re-indexes
    the static side per micro-batch; here the corpus index is resident
    (in production: precomputed alongside the corpus), and per-batch
    cost is batch-sized shingling + one probe join.  State lives in the
    persisted index, not the state store, so it is corpus-bounded and
    watermark-free by construction."""
    from ozone_spark.functions import dedup as D

    # recover_saturated > 0 (VERDICT r10 item 4) extends the resident
    # index with the thinned saturated probe index + the uncapped
    # corpus shingle table, so each micro-batch's probe also catches
    # duplication the cap silences — same recipe, same persisted-once
    # cost model (both extra frames are corpus-sized-once structures
    # that in production live next to the capped index)
    # materialize=True: every index frame is computed once NOW (the
    # shared shingle table checkpointed first, so one shingle pass
    # feeds the capped index and the per-doc sizes) and its lineage
    # truncated, so each micro-batch's plan embeds plain scans instead
    # of the corpus-shingle subtrees — per-batch analysis of the deep
    # persisted lineages was the larger half of the drain's fixed
    # per-batch wall (r11 measurement: batches 2.4/2.0/1.8/1.5 s ->
    # 1.7/1.1/1.0/1.05 s at sf0.1).  A cross-drain slot-cached variant
    # was measured and REJECTED: re-checkpointing the cached frames
    # per drain accumulated block-manager copies and regressed rep
    # wall 10->26 s across three drains.
    idx = D.ingest_corpus_index(corpus, n, max_bucket,
                                recover_saturated=recover_saturated,
                                materialize=True)

    def handle(bdf: DataFrame, bid: int) -> None:
        # Exactly-once sink: each micro-batch overwrites its OWN
        # deterministic batch=<id> subdirectory, so a batch retried
        # after a partial failure (checkpoint restart re-delivers the
        # same batch_id) replaces its half-written output instead of
        # appending it twice (ADVICE r9 medium #1 — blind append broke
        # the "drained union == one batch run" contract under retry).
        # ordered=False: the final read-back re-sorts (or the caller
        # does), so the per-batch global orderBy was a pure range-
        # exchange + sort stage per micro-batch with its output order
        # thrown away by the parquet write (r12 optimization round).
        D.incremental_ingest_dedup(
            None, bdf, n=n, threshold=threshold,
            max_bucket=max_bucket, index=idx,
            recover_saturated=recover_saturated, ordered=False) \
            .write.mode("overwrite").parquet(f"{out_dir}/batch={bid}")

    q = (
        ingest_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # (checkpointed index blocks are freed by the ContextCleaner once
    # the frames go out of scope — no explicit unpersist hook exists
    # for localCheckpoint, and the drain-bounded footprint is the same
    # corpus-sized index the persist path held.  Residency bound for
    # multi-drain sessions (ADVICE r11): py4j references can outlive
    # this function by one GC cycle, so at most ONE drain's index
    # (~4-6 corpus-sized frames) may linger beyond its drain until the
    # next driver GC triggers the cleaner — bounded, not cumulative;
    # the slot-cached variant that DID accumulate copies across drains
    # was measured at 10->26 s over three drains and rejected, see the
    # materialize comment above)
    # batch=<id> reads back as a partition column; drop it — batch
    # boundaries are an execution detail, not part of the result.
    return spark.read.parquet(out_dir).drop("batch")
