"""Data-plane transforms expressed relationally (SURVEY.md §2.1 S12,
§2.5 O4, §2.7 scalar surface).

Reference semantics:
  - byte-range read: a ranged GET maps to the block/chunk spans that
    overlap [start, end) — ObjectEndpoint.java:416-424, parser
    RangeHeaderParserUtil.java; EC/striped reads reconstruct from the
    same span algebra (ECBlockInputStream.java:53,116).
  - multipart complete: the S3 ETag is md5 over the concatenated part
    ETags, parts sorted by part number (the fixture stores parts
    unordered on purpose) — S3MultipartUploadCompleteRequest.java:275-276.
  - topology-sorted replicas: datanodes ordered by network distance to
    the reader — KeyManagerImpl.java:2286-2294,
    NetworkTopologyImpl.java:784 (sortByDistanceCost); relationally a
    rank over a distance column.
  - P8 longest-prefix match: PrefixManagerImpl.java:65-125 walks a radix
    tree; Spark-native is candidates-explode + max_by(prefix, length) —
    for huge prefix sets a broadcast trie UDF is the fallback.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.functions import broadcast


def range_read_plan(locations: DataFrame, start: int, end: int) -> DataFrame:
    """S12: per object, the blocks overlapping byte range [start, end)
    with the in-block read offsets — the client read planner as a query."""
    off, ln = F.col("block_offset"), F.col("block_len")
    read_start = F.greatest(F.lit(start) - off, F.lit(0))
    read_end = F.least(ln, F.lit(end) - off)
    return (
        locations.where((off < end) & ((off + ln) > start))
        .select(
            "object_id", "block_seq", "container_id",
            read_start.cast("long").alias("read_start"),
            (read_end - read_start).cast("long").alias("read_len"),
        )
        .where(F.col("read_len") > 0)
        .orderBy("object_id", "block_seq")
    )


def lookup_key(keys: DataFrame, locations: DataFrame,
               db_key: str) -> DataFrame:
    """§3.2 point read: lookupKey returns the full key record WITH its
    ordered block-location list (KeyManagerImpl.lookupKey — the
    OmKeyInfo + keyLocationVersions the client read path consumes).
    The equality predicate on the sort key reaches the parquet scan
    (row-group min/max pruning — the RocksDB point-get analog);
    locations pack into one ordered array column per key.

    The location side is semi-joined to the (broadcast) matched key
    BEFORE the collect_list aggregation, so the point read scans only
    the matching location rows (min/max-pruned) instead of paying a
    table-wide groupBy shuffle per lookup."""
    k = keys.where(F.col("db_key") == db_key)
    locs = (
        locations.join(F.broadcast(k.select("object_id")), "object_id",
                       "left_semi")
        .groupBy("object_id")
        .agg(F.array_sort(F.collect_list(F.struct(
            "block_seq", "container_id", "local_id",
            "block_len", "block_offset"))).alias("blocks"))
    )
    return (
        k.join(locs, "object_id", "left")
        .select("db_key", "object_id", "volume", "bucket", "key_name",
                "data_size", "repl_factor", "creation_time", "owner",
                "blocks")
    )


def lookup_key_blocks(keys: DataFrame, locations: DataFrame,
                      db_key: str) -> DataFrame:
    """Gate-friendly flat projection of lookup_key: one row per block
    (scalar columns only, ordered by block_seq)."""
    return (
        lookup_key(keys, locations, db_key)
        .select("db_key", "object_id", "data_size",
                F.explode("blocks").alias("b"))
        .select("db_key", "object_id", "data_size",
                F.col("b.block_seq").alias("block_seq"),
                F.col("b.container_id").alias("container_id"),
                F.col("b.local_id").alias("local_id"),
                F.col("b.block_len").alias("block_len"),
                F.col("b.block_offset").alias("block_offset"))
        .orderBy("block_seq")
    )


def multipart_etag(locations: DataFrame) -> DataFrame:
    """§2.7: MD5-of-parts ETag per object; parts must be sorted by part
    number first (collect_list is unordered — sort the (seq, md5)
    structs before concatenation)."""
    parts = locations.select(
        "object_id", "block_seq",
        F.md5(F.col("local_id").cast("string")).alias("part_md5"),
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("block_seq", "part_md5"))),
        lambda s: s.getField("part_md5"),
    )
    return (
        parts.groupBy("object_id")
        .agg(F.count("*").alias("n_parts"),
             F.md5(F.concat_ws("", ordered)).alias("etag"))
        .orderBy("object_id")
    )


def tree_distance(path_a: Column, path_b: Column) -> Column:
    """Generalized network-topology distance between two '/'-separated
    topology paths (NetworkTopologyImpl.java:717 getDistanceCost with
    unit inner-node costs): 0 for the same node, else each side pays 1
    per level climbed to the closest common ancestor —
    (depth_a - common) + (depth_b - common).  Depth-generic: works for
    /rack/node, /dc/rack/node, or deeper schemas, and for paths of
    unequal depth (the reference's level-equalising climb)."""
    a = F.split(F.regexp_replace(path_a, "^/", ""), "/")
    b = F.split(F.regexp_replace(path_b, "^/", ""), "/")
    short = F.least(F.size(a), F.size(b))
    # common-prefix length: first index where components differ (the
    # zip stops at the shorter path; array_position finds the first
    # mismatch, 0 = no mismatch within the zipped span)
    zipped = F.zip_with(F.slice(a, 1, short), F.slice(b, 1, short),
                        lambda x, y: x == y)
    first_diff = F.array_position(zipped, F.lit(False))
    common = F.when(first_diff == 0, short).otherwise(first_diff - 1)
    return F.when(path_a == path_b, F.lit(0)).otherwise(
        (F.size(a) - common) + (F.size(b) - common))


def topology_sorted_replicas(replicas: DataFrame, datanodes: DataFrame,
                             client_path: str = "/dc0/rack0/client"
                             ) -> DataFrame:
    """O4: replicas of each container ranked by the generalized
    tree-distance to the client (NetworkTopologyImpl.java:717,
    sortByDistanceCost:784-812): same rack costs 2, same dc / other
    rack costs 4, other dc costs 6 on the 3-level fixture topology —
    not the 2-tier collapse this used before.  The datanode table is a
    broadcast dimension; distance is a per-row expression, so replica
    ranking stays a map-side window over container_id."""
    j = replicas.join(
        broadcast(datanodes.select("datanode", "rack", "topology_path")),
        "datanode")
    distance = tree_distance(F.lit(client_path), F.col("topology_path"))
    w = Window.partitionBy("container_id").orderBy(
        F.col("distance").asc(), F.col("datanode").asc(),
        F.col("replica_idx").asc())
    return (
        j.select("container_id", "datanode", "rack",
                 distance.alias("distance"),
                 "replica_idx")
        .withColumn("read_order", F.row_number().over(w))
        .orderBy("container_id", "read_order")
    )


def longest_prefix_acl(keys: DataFrame, prefixes: list[str]) -> DataFrame:
    """P8: per key, the longest matching ACL prefix (radix-tree
    getLongestPrefix as candidates-explode + max_by)."""
    cand = F.array(*[F.lit(p) for p in prefixes])
    exploded = keys.select(
        "db_key", F.explode(cand).alias("prefix")
    ).where(F.col("db_key").startswith(F.col("prefix")))
    return (
        exploded.groupBy("db_key")
        .agg(F.max_by("prefix", F.length("prefix")).alias("acl_prefix"))
        .orderBy("db_key")
    )


def ec_read_plan(locations: DataFrame, containers: DataFrame,
                 ec_data: int = 3, ec_parity: int = 5 - 3) -> DataFrame:
    """EC reconstruction-read planning (ECBlockInputStream.java:53,116;
    EC group model BlockOutputStream.java:87-142): objects with
    object_id%5==0 are EC(3,2)-striped — block unit = block_seq %
    (data+parity), units 0..2 data, 3..4 parity.  A unit is unavailable
    when its container is SCM-DELETED or absent from SCM entirely.

    Per EC object: DIRECT read if all data blocks are available,
    RECONSTRUCT if the missing data blocks can be covered by available
    parity, UNRECOVERABLE otherwise — the classification driving the
    reference's reconstruction scheduler."""
    stripe = ec_data + ec_parity
    unit = F.col("block_seq") % stripe
    avail_states = containers.where(F.col("state") != "DELETED") \
        .select("container_id")
    j = (
        locations.where(F.col("object_id") % 5 == 0)
        .join(avail_states.withColumn("_avail", F.lit(1)),
              "container_id", "left")
        .select("object_id",
                (unit < ec_data).alias("is_data"),
                F.coalesce(F.col("_avail"), F.lit(0)).alias("avail"))
    )
    agg = j.groupBy("object_id").agg(
        F.count("*").alias("n_blocks"),
        F.sum("avail").alias("n_avail"),
        F.sum(F.when(F.col("is_data") & (F.col("avail") == 0), 1)
              .otherwise(0)).alias("n_missing_data"),
        F.sum(F.when((~F.col("is_data")) & (F.col("avail") == 1), 1)
              .otherwise(0)).alias("n_parity_avail"),
    )
    status = (
        F.when(F.col("n_missing_data") == 0, "DIRECT")
        .when(F.col("n_missing_data") <= F.col("n_parity_avail"), "RECONSTRUCT")
        .otherwise("UNRECOVERABLE")
    )
    return agg.withColumn("status", status).orderBy("object_id")


def ec_reconstruction_plan(locations: DataFrame, containers: DataFrame,
                           ec_data: int = 3, ec_parity: int = 2) -> DataFrame:
    """The decode plan for RECONSTRUCT-class EC objects
    (ECBlockInputStream.java:53,116 — reconstruction reads ANY k
    available units of the group and RS-decodes; source selection
    prefers data units over parity, mirroring the reconstructed-stripe
    reader).  Per object: the missing data units, the k source blocks
    fed to the decoder (data-first, then parity, deterministic
    tie-break), and the byte cost of the decode reads.

    Scale: one broadcast join against the container states + two
    aggregations keyed by object_id; the per-object window ranks at
    most data+parity rows — no skew beyond the EC group width."""
    stripe = ec_data + ec_parity
    unit = F.col("block_seq") % stripe
    avail_states = containers.where(F.col("state") != "DELETED") \
        .select("container_id")
    blocks = (
        locations.where(F.col("object_id") % 5 == 0)
        .join(broadcast(avail_states.withColumn("_avail", F.lit(1))),
              "container_id", "left")
        .select("object_id", "block_seq", "container_id", "block_len",
                unit.alias("unit"),
                (unit < ec_data).alias("is_data"),
                (F.coalesce(F.col("_avail"), F.lit(0)) == 1).alias("avail"))
    )
    w = Window.partitionBy("object_id")
    flagged = blocks.select(
        "*",
        F.sum(F.when(F.col("is_data") & ~F.col("avail"), 1).otherwise(0))
        .over(w).alias("n_missing_data"),
        F.sum(F.when(~F.col("is_data") & F.col("avail"), 1).otherwise(0))
        .over(w).alias("n_parity_avail"),
    ).where((F.col("n_missing_data") > 0)
            & (F.col("n_missing_data") <= F.col("n_parity_avail")))
    rank = F.row_number().over(
        Window.partitionBy("object_id").orderBy(
            F.desc("avail"), F.desc("is_data"), "unit", "block_seq",
            "container_id", "block_len"))
    ranked = flagged.withColumn(
        "src_rank", F.when(F.col("avail"), rank))
    return (
        ranked.groupBy("object_id")
        .agg(
            F.max("n_missing_data").alias("n_missing_data"),
            F.array_join(F.array_sort(F.collect_set(
                F.when(F.col("is_data") & ~F.col("avail"), F.col("unit")))),
                ",").alias("missing_units"),
            F.sum(F.when(F.col("src_rank") <= ec_data, 1).otherwise(0))
            .alias("n_sources"),
            F.sum(F.when(F.col("src_rank") <= ec_data, F.col("block_len"))
                  .otherwise(0)).alias("decode_read_bytes"),
        )
        .orderBy("object_id")
    )


def unique_snapshot_objects(snap1: DataFrame, snap2: DataFrame) -> DataFrame:
    """E2: distinct objects touched by either snapshot, per bucket
    (SnapshotDiffManager.java:1067-1070 objectIdToIsDirMap analog)."""
    u = snap1.select("volume", "bucket", "object_id").unionByName(
        snap2.select("volume", "bucket", "object_id"))
    return (
        u.distinct()
        .groupBy("volume", "bucket")
        .agg(F.count("*").alias("n_objects"))
        .orderBy("volume", "bucket")
    )
