"""Compaction-DAG snapshot-diff pruning (SURVEY.md §1.2 compactionLogTable;
reference: hadoop-hdds/rocksdb-checkpoint-differ).

The reference avoids a full-namespace diff between two snapshots by
walking the RocksDB compaction DAG: for each SST in the newer (src)
snapshot it follows forward-DAG successors (output -> its compaction
inputs, CompactionDag.java:65-80) until it hits a file the older (dest)
snapshot also holds — those are `sameFiles` and need no reading — or a
terminal file, which lands in `differentFiles` and must actually be
diffed (RocksDBCheckpointDiffer.internalGetSSTDiffList, :924-1022):

  - src file already in dest ................. SAME (no traversal)
  - file with no DAG node (never compacted) .. DIFFERENT
  - reached node in dest's live set .......... SAME (stop)
  - node generation < dest generation ........ DIFFERENT (safety stop)
  - node with no forward successors .......... DIFFERENT
  - otherwise ................................ expand (no verdict)

The remaining DIFFERENT files are then key-range pruned against the
diff's bucket prefix (RocksDiffUtils.filterRelevantSstFiles) so only
overlapping SSTs are read.

Spark shape: the traversal is a level-synchronous BFS — each level is
one equi-join of the frontier against the (out_sst -> in_sst) edge
table, deduped against the accumulated `seen` set.  The loop runs
DAG-depth times (LSM depth: single digits), not per-row; every join is
distributed and the edge side can be broadcast when the compaction log
fits (it is tiny relative to the namespace).  No collect() — the
frontier stays a DataFrame throughout.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MAX_DAG_DEPTH = 16  # LSM trees are shallow; fixture depth is 3


def sst_diff_files(sst_snapshot_files: DataFrame, sst_catalog: DataFrame,
                   compaction_edges: DataFrame, src_snapshot: str,
                   dest_snapshot: str, prefix_volume: str) -> DataFrame:
    """Classify every file the differ touches as SAME / DIFFERENT and
    flag DIFFERENT files whose key range overlaps `prefix_volume`
    (e.g. '/vol1') as `relevant` — the set a prefix-scoped snapshot
    diff would actually read.  Intermediate (expanded) DAG nodes get no
    verdict, exactly like the reference's two result maps."""
    src = sst_snapshot_files.where(
        F.col("snapshot_name") == src_snapshot).select("sst_id")
    dest = sst_snapshot_files.where(
        F.col("snapshot_name") == dest_snapshot).select("sst_id")
    dest_gen_df = sst_snapshot_files.where(
        F.col("snapshot_name") == dest_snapshot).select(
        F.max("snapshot_gen").alias("dest_gen"))
    # DAG node set = every file named by any compaction record
    nodes = (compaction_edges.select(F.col("out_sst").alias("sst_id"))
             .unionByName(compaction_edges.select(
                 F.col("in_sst").alias("sst_id"))).distinct())

    direct_same = src.join(dest, "sst_id", "semi")
    not_in_dest = src.join(dest, "sst_id", "anti")
    never_compacted = not_in_dest.join(nodes, "sst_id", "anti")

    # BFS over the forward DAG, starting from src-live compacted files
    frontier = not_in_dest.join(nodes, "sst_id", "semi")
    seen = frontier
    for _ in range(MAX_DAG_DEPTH):
        # expand only non-terminal nodes: not in dest, gen >= dest gen
        expandable = (
            frontier.join(dest, "sst_id", "anti")
            .join(sst_catalog.select("sst_id", "gen"), "sst_id")
            .crossJoin(F.broadcast(dest_gen_df))
            .where(F.col("gen") >= F.col("dest_gen"))
            .select("sst_id")
        )
        nxt = (
            expandable.join(
                compaction_edges.withColumnRenamed("out_sst", "sst_id"),
                "sst_id")
            .select(F.col("in_sst").alias("sst_id")).distinct()
            .join(seen, "sst_id", "anti")
        )
        if nxt.isEmpty():
            break
        seen = seen.unionByName(nxt)
        frontier = nxt
    else:
        # mirror the reference differ's clear-and-throw on a too-deep
        # traversal (RocksDBCheckpointDiffer.internalGetSSTDiffList)
        # rather than returning a silently under-reported diff
        raise RuntimeError(
            f"compaction DAG deeper than {MAX_DAG_DEPTH}; "
            "refusing to return a truncated snapshot diff")

    encountered = (seen.unionByName(direct_same)
                   .unionByName(never_compacted).distinct())
    has_successor = compaction_edges.select(
        F.col("out_sst").alias("sst_id")).distinct()
    info = (
        encountered
        .join(sst_catalog, "sst_id")
        .crossJoin(F.broadcast(dest_gen_df))
        .join(dest.withColumn("in_dest", F.lit(True)), "sst_id", "left")
        .join(nodes.withColumn("is_node", F.lit(True)), "sst_id", "left")
        .join(has_successor.withColumn("has_succ", F.lit(True)),
              "sst_id", "left")
    )
    verdict = (
        F.when(F.col("in_dest"), "SAME")
        .when(F.col("is_node").isNull(), "DIFFERENT")
        .when(F.col("gen") < F.col("dest_gen"), "DIFFERENT")
        .when(F.col("has_succ").isNull(), "DIFFERENT")
    )  # else NULL -> intermediate, filtered out
    return (
        info.withColumn("verdict", verdict)
        .where(F.col("verdict").isNotNull())
        .withColumn(
            "relevant",
            (F.col("verdict") == "DIFFERENT")
            & (F.col("end_key") >= F.lit(prefix_volume))
            & (F.col("start_key") <= F.lit(prefix_volume + "/~")))
        .select("sst_id", "gen", "verdict", "relevant")
        .orderBy("sst_id")
    )
