"""ACL evaluation operators (SURVEY.md §2.2 P8 neighborhood).

Reference: every read evaluates the caller's ACLs against the key and
its ancestors — OzoneNativeAuthorizer / OzoneAclUtil walk
volume -> bucket -> (prefix) -> key acl arrays (OmKeyInfo.java:72-113,
OmVolumeArgs.java:50-71; check site KeyManagerImpl.java:814).  Grants
are (type USER/GROUP/WORLD, entity, rights-bitset); a right is allowed
if any matching grant at any level carries it.

Spark-native shape: ancestors-explode of the key path + equi-join to
the grant table + set-union of rights per (key, grantee).  The grant
table is tiny relative to the namespace, so the join broadcasts; the
rights union is a map-side-combinable collect_set — one shuffle keyed
by (db_key, entity), uniform.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _explode_path_ancestors(df: DataFrame, carry: list[str]) -> DataFrame:
    """All grant-bearing ancestor paths of db_key (/vol, /vol/bucket,
    each directory prefix, the key path itself), depth index exploded
    first and each path built with one codegen'd substring_index —
    substring_index(db_key, '/', i) for i in 2..n_parts is exactly the
    i-1 leading components (count >= #delimiters returns the whole
    string, covering the key path itself)."""
    n = F.size(F.split(F.col("db_key"), "/"))
    e = df.select("db_key", *carry,
                  F.explode(F.sequence(F.lit(2), n)).alias("_i"))
    return e.select(
        "db_key", *carry,
        F.expr("substring_index(db_key, '/', _i)").alias("path"))


def effective_acls(keys: DataFrame, acl_entries: DataFrame) -> DataFrame:
    """Per (key, grantee): the union of rights granted anywhere along
    the key's ancestor chain — the materialized form of the
    authorizer's walk (sorted-concatenated rights string, so the set is
    one deterministic scalar)."""
    anc = _explode_path_ancestors(keys.select("db_key"), [])
    j = anc.join(F.broadcast(acl_entries), "path")
    return (
        j.groupBy("db_key", "entity_type", "entity")
        .agg(F.array_join(F.array_sort(F.collect_set("right")), "")
             .alias("rights"))
        .orderBy("db_key", "entity_type", "entity")
    )


def read_allowed(keys: DataFrame, acl_entries: DataFrame) -> DataFrame:
    """The authorizer's per-read verdict for each key's OWNER: allowed
    iff a USER grant for the owner or a WORLD grant on any ancestor
    carries 'r' (KeyManagerImpl.java:814 -> checkAcls).  Left-semi
    against the broadcast grant table; the output keeps deny rows so
    deny is an observable verdict, not an absent row."""
    anc = _explode_path_ancestors(
        keys.select("db_key", F.col("owner").alias("principal")),
        ["principal"])
    grants = acl_entries.where(F.col("right") == "r").select(
        "path", "entity_type", "entity")
    j = anc.join(F.broadcast(grants), "path", "left")
    hit = (
        ((F.col("entity_type") == "USER") & (F.col("entity") == F.col("principal")))
        | (F.col("entity_type") == "WORLD")
    )
    return (
        j.groupBy("db_key", "principal")
        .agg(F.max(F.coalesce(hit, F.lit(False))).alias("allowed"))
        .orderBy("db_key")
    )
