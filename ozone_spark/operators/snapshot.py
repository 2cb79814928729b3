"""Snapshot diff (SURVEY.md §2.3 J2, §2.6 E1/E2).

Reference: SnapshotDiffManager.java:994-1230 — full-outer join of two
snapshot key tables on objectId, classified into CREATE / DELETE /
MODIFY / RENAME (rename = same objectId, different key name).

Scale notes: the reference walks a compaction DAG to diff via sequential
SST reads (efficient-snapdiff.md:34-35); the Spark-native equivalent is
a shuffle join on object_id.  At 100 TB both snapshot tables would be
bucketed by object_id on write so the join is co-partitioned (no
shuffle); AQE handles the residual skew.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DIFF_COLS = ["object_id", "diff_type", "old_key", "new_key",
             "old_size", "new_size"]


def _classify(j: DataFrame) -> DataFrame:
    """Shared CREATE/DELETE/RENAME/MODIFY cascade over a joined frame
    with (object_id, old_key, new_key, old_size, new_size)."""
    diff_type = (
        F.when(F.col("new_key").isNull(), "DELETE")
        .when(F.col("old_key").isNull(), "CREATE")
        .when(F.col("old_key") != F.col("new_key"), "RENAME")
        .when(F.col("old_size") != F.col("new_size"), "MODIFY")
        .otherwise("NONE")
    )
    return (
        j.where(F.col("old_key").isNotNull() | F.col("new_key").isNotNull())
        .withColumn("diff_type", diff_type)
        .where(F.col("diff_type") != "NONE")
        .select(*DIFF_COLS)
    )


def snapshot_diff(snap_from: DataFrame, snap_to: DataFrame) -> DataFrame:
    """J2/E1: classify namespace changes between two snapshot versions."""
    a = snap_from.select(
        "object_id",
        F.col("key_name").alias("old_key"),
        F.col("data_size").alias("old_size"),
    )
    b = snap_to.select(
        "object_id",
        F.col("key_name").alias("new_key"),
        F.col("data_size").alias("new_size"),
    )
    return _classify(a.join(b, "object_id", "full_outer"))


def snapshot_diff_page(snap_from: DataFrame, snap_to: DataFrame,
                       start_token: str = "",
                       max_entries: int = 1000) -> DataFrame:
    """J2-as-a-service: the reference serves diff reports in PAGES with
    a resume token (SnapshotDiffManager's maxEntries + page token over
    the persisted diff report), not as one response.  Same S1 token
    contract, keyed by the entry's effective key (new name when
    present, else old) with object_id as the deterministic tiebreak."""
    from ozone_spark.operators.listing import _paged

    d = snapshot_diff(snap_from, snap_to).withColumn(
        "page_key", F.coalesce("new_key", "old_key"))
    if start_token:
        d = d.where(F.col("page_key") > start_token)
    return _paged(d, ["page_key", "object_id"], max_entries)


def compose_diffs(d1: DataFrame, d2: DataFrame) -> DataFrame:
    """Compose two consecutive snapshot diffs (A→B, B→C) into the A→C
    diff WITHOUT reading either endpoint snapshot — the chained-diff
    path along previous-snapshot pointers (SnapshotInfo.java:53-117;
    SnapshotDiffManager composes per-link deltas the same way when
    diffing non-adjacent snapshots).

    Per object: the A-side state comes from d1 when the object changed
    in A→B (else it was stable through B, so d2's old side IS the A
    state); the C-side state symmetrically from d2, else d1.  Objects
    created then deleted within the chain collapse to nothing; rename-
    backs collapse to MODIFY/NONE — exactly what a direct A→C join
    yields.  Scale: diffs are deltas (small vs the snapshots), so the
    composition join shuffles only changed objects."""
    a = d1.select(
        "object_id", F.col("diff_type").alias("_t1"),
        F.col("old_key").alias("_o1"), F.col("new_key").alias("_n1"),
        F.col("old_size").alias("_os1"), F.col("new_size").alias("_ns1"))
    b = d2.select(
        "object_id", F.col("diff_type").alias("_t2"),
        F.col("old_key").alias("_o2"), F.col("new_key").alias("_n2"),
        F.col("old_size").alias("_os2"), F.col("new_size").alias("_ns2"))
    j = a.join(b, "object_id", "full_outer")
    in1, in2 = F.col("_t1").isNotNull(), F.col("_t2").isNotNull()
    merged = j.select(
        "object_id",
        F.when(in1, F.col("_o1")).otherwise(F.col("_o2")).alias("old_key"),
        F.when(in2, F.col("_n2")).otherwise(F.col("_n1")).alias("new_key"),
        F.when(in1, F.col("_os1")).otherwise(F.col("_os2")).alias("old_size"),
        F.when(in2, F.col("_ns2")).otherwise(F.col("_ns1")).alias("new_size"),
    )
    return _classify(merged)


def chain_diff(snapshots: list[DataFrame]) -> DataFrame:
    """Diff across a chain of N snapshots (first → last) by composing
    the N-1 per-link diffs."""
    if len(snapshots) < 2:
        raise ValueError("chain_diff needs at least two snapshots")
    links = [snapshot_diff(snapshots[i], snapshots[i + 1])
             for i in range(len(snapshots) - 1)]
    composed = links[0]
    for link in links[1:]:
        composed = compose_diffs(composed, link)
    return composed


def renamed_entries(snap_from: DataFrame, snap_to: DataFrame,
                    transition: str) -> DataFrame:
    """snapshotRenamedTable analog (OMDBDefinition.java:309-323): one
    row per object whose key name changed between two consecutive
    snapshots — the recorded-rename source the reference's diff
    consults instead of re-deriving renames from names."""
    a = snap_from.select("object_id", F.col("key_name").alias("old_key"))
    b = snap_to.select("object_id", F.col("key_name").alias("new_key"))
    return (
        a.join(b, "object_id")
        .where(F.col("old_key") != F.col("new_key"))
        .withColumn("transition", F.lit(transition))
        .select("transition", "object_id", "old_key", "new_key")
    )


def snapshot_diff_with_renames(snap_from: DataFrame, snap_to: DataFrame,
                               renamed: DataFrame) -> DataFrame:
    """J2 using the recorded rename table: RENAME classification comes
    from snapshotRenamedTable membership (broadcast join on the small
    rename set) rather than name comparison — the reference's actual
    diff path (SnapshotDiffManager.java:994-1230 consults the renamed
    table per objectId)."""
    a = snap_from.select(
        "object_id",
        F.col("key_name").alias("old_key"),
        F.col("data_size").alias("old_size"),
    )
    b = snap_to.select(
        "object_id",
        F.col("key_name").alias("new_key"),
        F.col("data_size").alias("new_size"),
    )
    r = renamed.select("object_id", F.lit(True).alias("_renamed"))
    j = a.join(b, "object_id", "full_outer").join(F.broadcast(r), "object_id", "left")
    diff_type = (
        F.when(F.col("new_key").isNull(), "DELETE")
        .when(F.col("old_key").isNull(), "CREATE")
        .when(F.col("_renamed"), "RENAME")
        .when(F.col("old_size") != F.col("new_size"), "MODIFY")
        .otherwise("NONE")
    )
    return (
        j.withColumn("diff_type", diff_type)
        .where(F.col("diff_type") != "NONE")
        .select(*DIFF_COLS)
    )


def snapshot_diff_summary(snap_from: DataFrame, snap_to: DataFrame) -> DataFrame:
    """Diff class cardinalities + byte delta (delta-file computation
    analog, SnapshotDiffManager.java:1215-1230)."""
    d = snapshot_diff(snap_from, snap_to)
    return (
        d.groupBy("diff_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.coalesce(F.col("new_size"), F.lit(0))
                  - F.coalesce(F.col("old_size"), F.lit(0))).alias("bytes_delta"),
        )
        .orderBy("diff_type")
    )


# ------------------------------------------------- diff job identifiers

def name_uuid(col: F.Column) -> F.Column:
    """RFC-4122 name-based (v3-layout) UUID from the md5 of a string
    column: 8-4-4-4-12 hex groups with the version nibble forced to 3
    and the variant nibble to the 10xx class (hex digit & 0x3 | 0x8,
    i.e. translate over '89ab89ab89ab89ab').  The deterministic sibling
    of Spark's random `uuid()` (SURVEY §2.7): the reference keys
    snapshot-diff jobs by a UUID jobId (SnapshotDiffManager.java:1012-
    1015 uses it as the job's SST-hardlink dir name); a NAME-based id
    derived from the diff request tuple gives the same uniqueness plus
    idempotence (re-submitting the same diff maps to the same job dir)
    and is bit-replayable by any engine with md5."""
    h = F.md5(col)
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.concat(F.lit("3"), F.substring(h, 14, 3)),
        F.concat(F.translate(F.substring(h, 17, 1),
                             "0123456789abcdef", "89ab89ab89ab89ab"),
                 F.substring(h, 18, 3)),
        F.substring(h, 21, 12),
    )


def snapshot_diff_job_ids(snapshot_chain: DataFrame,
                          volume: str = "vol1",
                          bucket: str = "b1") -> DataFrame:
    """One snapshot-diff job row per adjacent chain pair, keyed by the
    deterministic name-UUID of (volume, bucket, fromSnapshot,
    toSnapshot) — the jobKey tuple the reference builds in
    SnapshotDiffManager (snapDiffJobTable keyed by the request,
    jobId UUID per job).  Map-only over the (tiny, broadcast-sized)
    snapshot chain."""
    frm = F.col("previous_snapshot")
    return (
        snapshot_chain.where(frm.isNotNull())
        .select(
            frm.alias("from_snapshot"),
            F.col("snapshot_name").alias("to_snapshot"),
            name_uuid(F.concat_ws("/", F.lit(volume), F.lit(bucket),
                                  frm, F.col("snapshot_name")))
            .alias("job_id"))
        .orderBy("to_snapshot")
    )
