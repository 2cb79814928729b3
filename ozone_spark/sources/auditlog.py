"""Audit-log source + the `ozone debug auditparser` template queries.

The reference ships an audit-log analysis CLI
(cli-debug/.../audit/parser/AuditParser.java): it parses log4j audit
lines into a SQLite table (DatabaseHelper.java:139-186 — '|'-split
header lines matched by DATE_REGEX ``^\\d{4}-\\d{2}-\\d{2}.*``,
non-matching lines appended to the previous entry's exception;
AuditEntry.java is the schema) and answers the template queries in
commands.properties: top5users / top5cmds / top5activetimebyseconds.

Spark-first analog: audit lines are just a text DataFrame
(file, line_no, line); parsing is JVM-side regex/split expressions; the
multi-line exception grouping is a running sum of header flags
partitioned BY FILE (the reference parses file-by-file serially — the
file is the natural scale unit, and a fleet of log files parallelizes
across executors); the template queries are plain aggregations.

The fixture ships no log files, so `render_audit_lines` derives a
deterministic audit log from the `events` table (error events become
ret=FAILURE entries with a two-line exception continuation).  The gate
queries run parse(render(events)) and their DuckDB oracles compute the
same aggregates from first principles on `events` — proving the full
render -> parse -> aggregate loop, not just the aggregation.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

HEADER_RE = r"^\d{4}-\d{2}-\d{2}"  # ParserConsts.DATE_REGEX

_EXC_LINE1 = "org.apache.hadoop.ozone.om.exceptions.OMException: simulated"
_EXC_LINE2 = ("    at org.apache.hadoop.ozone.om.OzoneManager"
              ".handle(OzoneManager.java:42)")


def render_audit_lines(events: DataFrame, n_files: int = 4) -> DataFrame:
    """Deterministic audit log derived from the events table, in the
    reference's log4j layout (testaudit.log):

      ``dt | LEVEL | OMAudit | user=u | ip=a.b.c.d | op=OP {params} |
      ret=RET |``

    error events render as ret=FAILURE with a two-line exception
    continuation (no leading date, so the parser must fold them into
    the preceding entry).  Lines are spread round-robin over `n_files`
    log files by event id; an event's continuation lines share its file
    and follow it in line_no order (line_no = event_id*3 + offset), so
    any per-file ordered reader reassembles entries correctly."""
    is_err = F.col("event_type") == "error"
    dt = F.date_format("ts", "yyyy-MM-dd HH:mm:ss,SSS")
    header = F.concat(
        dt, F.lit(" | "),
        F.when(is_err, "ERROR").otherwise("INFO"), F.lit(" | OMAudit | "),
        F.lit("user=user"), F.col("user_id").cast("string"), F.lit(" | "),
        F.lit("ip=172.18.0."), (F.col("user_id") % 250 + 1).cast("string"),
        F.lit(" | op="), F.upper("event_type"),
        F.lit(" {event="), F.col("event_id").cast("string"),
        F.lit(", props="), F.col("props"), F.lit("} | ret="),
        F.when(is_err, "FAILURE").otherwise("SUCCESS"), F.lit(" |"),
    )
    lines = F.when(
        is_err, F.array(header, F.lit(_EXC_LINE1), F.lit(_EXC_LINE2))
    ).otherwise(F.array(header))
    return (
        events.select(
            F.concat(F.lit("om-audit-"),
                     (F.col("event_id") % n_files).cast("string"),
                     F.lit(".log")).alias("file"),
            (F.col("event_id") * 3).alias("base"),
            F.posexplode(lines).alias("off", "line"))
        .select("file", (F.col("base") + F.col("off")).alias("line_no"),
                "line")
    )


def parse_audit_log(lines: DataFrame) -> DataFrame:
    """DatabaseHelper.parseAuditLogs as a DataFrame transform: header
    lines (DATE_REGEX) '|'-split into the AuditEntry columns; a
    non-header line belongs to the most recent header above it in the
    same file (exception continuation).

    Entry assembly is a running sum of header flags over
    Window.partitionBy(file).orderBy(line_no) — one shuffle by file;
    a file's lines sort within its partition.  The reference holds one
    file in a serial reader (DatabaseHelper.java:139), so per-file
    window state is the same unit of work, distributed."""
    w = Window.partitionBy("file").orderBy("line_no")
    tagged = (
        lines.withColumn("is_header", F.col("line").rlike(HEADER_RE))
        .withColumn("entry_id", F.sum(F.col("is_header").cast("long")).over(w))
        .where(F.col("entry_id") > 0)  # stray leading junk has no entry
    )
    fields = F.transform(F.split("line", r"\|"), lambda x: F.trim(x))
    headers = (
        tagged.where("is_header")
        .select(
            "file", "entry_id", fields.alias("e"))
        .select(
            "file", "entry_id",
            F.col("e")[0].alias("datetime"),
            F.col("e")[1].alias("level"),
            F.col("e")[2].alias("logger"),
            F.substring_index(F.col("e")[3], "=", -1).alias("user"),
            F.substring_index(F.col("e")[4], "=", -1).alias("ip"),
            # op field: everything after 'op=' up to the first space is
            # the op; the rest is the params blob (DatabaseHelper's
            # split(" ", 2))
            F.regexp_extract(F.col("e")[5], r"^op=(\S+)", 1).alias("op"),
            F.regexp_extract(F.col("e")[5], r"^op=\S+ ?(.*)$", 1)
            .alias("params"),
            F.substring_index(F.col("e")[6], "=", -1).alias("result"))
    )
    exceptions = (
        tagged.where(~F.col("is_header"))
        .groupBy("file", "entry_id")
        .agg(F.concat_ws(
            "\n", F.array_sort(F.collect_list(F.struct("line_no", "line")))
            .getField("line")).alias("exception"))
    )
    return (
        headers.join(exceptions, ["file", "entry_id"], "left")
        .select("datetime", "level", "logger", "user", "ip", "op",
                "params", "result", "exception", "file", "entry_id")
    )


def read_audit_logs(spark: SparkSession, path: str) -> DataFrame:
    """Convenience file reader: text lines -> (file, line_no, line).
    Line numbers come from the text source's preserved in-split order
    (monotonically_increasing_id is non-decreasing along each split and
    splits follow file offset order), which is all parse_audit_log
    needs — entry grouping only requires that a continuation line sorts
    after its header within the file."""
    return (
        spark.read.text(path)
        .select(F.col("_metadata.file_name").alias("file"),
                F.monotonically_increasing_id().alias("line_no"),
                F.col("value").alias("line"))
    )


def top_users(audit: DataFrame, n: int = 5) -> DataFrame:
    """commands.properties top5users: count per user, DESC, user ASC."""
    return (
        audit.groupBy("user").agg(F.count("*").alias("total"))
        .orderBy(F.desc("total"), F.asc("user")).limit(n)
    )


def top_ops(audit: DataFrame, n: int = 5) -> DataFrame:
    """commands.properties top5cmds: count per op, DESC, op ASC."""
    return (
        audit.groupBy("op").agg(F.count("*").alias("total"))
        .orderBy(F.desc("total"), F.asc("op")).limit(n)
    )


def top_active_seconds(audit: DataFrame, n: int = 5) -> DataFrame:
    """commands.properties top5activetimebyseconds: busiest wall-clock
    seconds — the datetime string truncated at the comma (the log4j
    millisecond separator), counted and ranked."""
    return (
        audit.select(F.substring_index("datetime", ",", 1).alias("dt"))
        .groupBy("dt").agg(F.count("*").alias("thecount"))
        .orderBy(F.desc("thecount"), F.asc("dt")).limit(n)
    )


def failed_ops(audit: DataFrame) -> DataFrame:
    """FAILURE entries per op with exception coverage — the audit
    triage view an operator actually runs after top5cmds: how many of
    each op failed, and do the failures carry stack traces."""
    return (
        audit.where(F.col("result") == "FAILURE")
        .groupBy("op")
        .agg(F.count("*").alias("n_failed"),
             F.sum(F.col("exception").isNotNull().cast("long"))
             .alias("n_with_exception"))
        .orderBy("op")
    )
