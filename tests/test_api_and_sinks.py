"""Facade + sink coverage: the user-visible API surface works end-to-end
and exports round-trip."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ozone_spark.api import OzoneSparkNamespace
from ozone_spark.sources import sinks


@pytest.fixture(scope="module")
def ns(spark, sf_dir):
    return OzoneSparkNamespace(spark, sf_dir)


def test_facade_listing_surface(ns):
    assert ns.list_volumes().count() == 4
    assert ns.list_buckets("vol1").count() > 0
    page = ns.list_keys(prefix="/vol1/", max_keys=10).collect()
    assert len(page) == 10 and page[0].is_truncated
    lov2 = ns.list_objects_v2("vol1", "b1").collect()
    assert {r.entry_type for r in lov2} == {"COMMON_PREFIX"}


def test_facade_analytics_surface(ns):
    assert ns.cluster_state().count() == 1
    assert ns.file_size_histogram().count() > 0
    assert ns.du("/vol1/b1", top_k=3).count() <= 3
    assert {r.diff_type for r in ns.snapshot_diff().collect()} == {
        "CREATE", "DELETE", "MODIFY", "RENAME"}
    assert ns.unhealthy_containers().count() > 0


def test_facade_scan_kwargs(ns):
    one = ns.scan(table="keys", filters=[("volume", "EQUALS", "vol1")],
                  fields=["db_key"], limit=5)
    assert one.count() == 5 and one.columns == ["db_key"]
    cnt = ns.scan(table="containers", count=True).collect()[0]["count"]
    assert cnt == 50


def test_facade_sql_surface(ns):
    df = ns.sql("""
        SELECT k.volume, count(*) AS n, sum(k.data_size) AS bytes
        FROM keys k JOIN locations l ON k.object_id = l.object_id
        GROUP BY k.volume ORDER BY k.volume
    """)
    assert df.count() == 4


def test_salted_aggregation_equals_direct(ns, spark):
    from ozone_spark.functions.skew import salted_join_small, salted_sum_count
    from tests.util import canon
    keys = ns.t["keys"]
    direct = (keys.groupBy("volume", "bucket")
              .agg(F.count("*").alias("count"),
                   F.sum("data_size").alias("sum_data_size")))
    salted = salted_sum_count(keys, ["volume", "bucket"], ["data_size"])
    assert canon(salted.toPandas()) == canon(direct.toPandas())

    small = ns.t["containers"].select("container_id", "state")
    big = ns.t["locations"]
    plain = big.join(small, "container_id").count()
    assert salted_join_small(big, small, "container_id").count() == plain


def test_sinks_roundtrip(ns, tmp_path):
    hist = ns.file_size_histogram()
    n = hist.count()
    assert sinks.export_parquet(hist, str(tmp_path / "p"),
                                sort_cols=["volume", "bucket"]) == n
    assert sinks.export_json(hist, str(tmp_path / "j")) == n
    assert sinks.export_csv(hist, str(tmp_path / "c")) == n
    rows = sinks.to_json_rows(hist, limit=5).collect()
    assert len(rows) == 5 and rows[0].json.startswith("{")


def test_audit_log_file_roundtrip(spark, sf_dir, tmp_path):
    """Rendered audit lines written as real text files and re-read with
    read_audit_logs parse to the same entries as the in-memory path —
    including multi-line exception folding across the file boundary
    layout."""
    from ozone_spark import tables
    from ozone_spark.sources import auditlog

    # orderBy pins the subset: bare limit() is nondeterministic across
    # the multiple independent actions below
    events = tables.load_table(spark, sf_dir, "events").orderBy(
        "event_id").limit(200)
    lines = auditlog.render_audit_lines(events, n_files=3)
    direct = auditlog.parse_audit_log(lines)

    # write each synthetic file as an actual log file, in line order
    logdir = tmp_path / "audit"
    logdir.mkdir()
    by_file: dict[str, list[tuple[int, str]]] = {}
    for r in lines.collect():
        by_file.setdefault(r.file, []).append((r.line_no, r.line))
    for fname, rows in by_file.items():
        (logdir / fname).write_text(
            "\n".join(line for _, line in sorted(rows)) + "\n")

    reread = auditlog.parse_audit_log(
        auditlog.read_audit_logs(spark, str(logdir)))

    cols = ["datetime", "level", "logger", "user", "ip", "op",
            "params", "result", "exception"]
    a = sorted(map(tuple, direct.select(*cols).collect()))
    b = sorted(map(tuple, reread.select(*cols).collect()))
    assert a == b
    n_err = events.where(F.col("event_type") == "error").count()
    assert direct.where(F.col("result") == "FAILURE").count() == n_err
    # every FAILURE entry folded both continuation lines
    assert direct.where(
        (F.col("result") == "FAILURE")
        & (F.col("exception").contains("OMException"))
        & (F.col("exception").contains("at org.apache"))).count() == n_err
