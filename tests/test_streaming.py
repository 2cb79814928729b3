"""Streaming invariants (SURVEY.md §2.8, FIXTURES.md §3.3/3.6):
  - incremental process() over the drained CDC log == batch reprocess()
    of the final state (the reference's dual-path contract)
  - streaming windowed aggregations (AvailableNow drain) == batch twins
"""

from __future__ import annotations

import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

from ozone_spark import tables
from ozone_spark.operators.events import tumbling_daily
from ozone_spark.streaming import cdc, windows
from tests.util import canon


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="ozs_stream_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_cdc_incremental_histogram_matches_reprocess(spark, sf_dir, tmpdir):
    t = tables.namespace_views(spark, sf_dir)
    keys, deleted = t["keys"], t["deleted_keys"]

    cdc.synthesize_cdc_log(keys, deleted, f"{tmpdir}/cdc", n_chunks=6)
    cdc.run_incremental_histogram(
        spark, f"{tmpdir}/cdc", f"{tmpdir}/store", f"{tmpdir}/ckpt")

    incremental = cdc.IncrementalViewStore(
        spark, f"{tmpdir}/store",
        ["volume", "bucket", "bin_index"], ["delta"]).current()
    assert incremental is not None

    keys_now = keys.join(deleted.select("object_id"), "object_id", "left_anti")
    expected = cdc.reprocess_histogram(keys_now)
    assert canon(incremental.toPandas()) == canon(expected.toPandas())


def test_cdc_resume_from_checkpoint(spark, sf_dir, tmpdir):
    """ST5: offsets checkpoint — a second run over the same log must be a
    no-op (no double-counting)."""
    t = tables.namespace_views(spark, sf_dir)
    keys, deleted = t["keys"], t["deleted_keys"]
    cdc.synthesize_cdc_log(keys, deleted, f"{tmpdir}/cdc", n_chunks=4)
    for _ in range(2):  # second run resumes at the committed offset
        cdc.run_incremental_histogram(
            spark, f"{tmpdir}/cdc", f"{tmpdir}/store", f"{tmpdir}/ckpt")
    incremental = cdc.IncrementalViewStore(
        spark, f"{tmpdir}/store",
        ["volume", "bucket", "bin_index"], ["delta"]).current()
    keys_now = keys.join(deleted.select("object_id"), "object_id", "left_anti")
    expected = cdc.reprocess_histogram(keys_now)
    assert canon(incremental.toPandas()) == canon(expected.toPandas())


def test_stateful_rollup_matches_batch(spark, sf_dir, tmpdir):
    """A4 incremental (applyInPandasWithState) == batch ancestors-explode
    rollup of the final key state (NSSummary propagate contract)."""
    from ozone_spark.operators.namespace import namespace_rollup
    from ozone_spark.streaming import rollup as sroll

    t = tables.namespace_views(spark, sf_dir)
    keys, deleted = t["keys"], t["deleted_keys"]
    cdc.synthesize_cdc_log(keys, deleted, f"{tmpdir}/cdc", n_chunks=5)
    got = sroll.run_incremental_rollup(spark, f"{tmpdir}/cdc", f"{tmpdir}/ck")

    keys_now = keys.join(deleted.select("object_id"), "object_id", "left_anti")
    expected = namespace_rollup(keys_now)
    assert canon(got.toPandas()) == canon(expected.toPandas())


def test_streaming_tumbling_equals_batch(spark, sf_dir, tmpdir):
    ev_batch = tables.load_table(spark, sf_dir, "events")
    stream = windows.read_events_stream(spark, f"{sf_dir}/events.parquet")
    result = windows.drain_to_memory(
        windows.streaming_tumbling_daily(stream), spark,
        "t_tumbling", f"{tmpdir}/ckpt")
    expected = tumbling_daily(ev_batch)
    assert canon(result.toPandas()) == canon(expected.toPandas())


def test_streaming_sessionize_runs(spark, sf_dir, tmpdir):
    """Session totals must cover every event exactly once."""
    ev_batch = tables.load_table(spark, sf_dir, "events")
    stream = windows.read_events_stream(spark, f"{sf_dir}/events.parquet")
    result = windows.drain_to_memory(
        windows.streaming_sessionize(stream), spark,
        "t_sessions", f"{tmpdir}/ckpt")
    total_stream = result.agg(F.sum("n_events")).collect()[0][0]
    assert total_stream == ev_batch.count()
