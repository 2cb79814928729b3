"""Compaction (SST DAG) — QuerySpecs + DuckDB oracle SQL twins (split out of the
single-module registry in round 8; see ozone_spark/registry/__init__.py).
"""

from __future__ import annotations

from ._base import *  # noqa: F401,F403 — shared registry namespace
from .q_snapshot import _SST_DIFF_ORACLE  # noqa: F401 — cross-domain helper


COMPACTION_QUERIES = [
    _q(
        "sst_diff_pruning",
        lambda spark, sf: compops.sst_diff_files(
            views(spark, sf)["sst_snapshot_files"],
            views(spark, sf)["sst_catalog"],
            views(spark, sf)["compaction_edges"],
            "snap-s", "snap-d", "/vol1"),
        _SST_DIFF_ORACLE.format(
            catalog=ORACLE_CTES["sst_catalog"],
            edges=ORACLE_CTES["compaction_edges"],
            snapfiles=ORACLE_CTES["sst_snapshot_files"]),
    ),
]

# ---------------------------------------------------------------------------
# SCM admin plane: pipelines, safemode rules, decommission planning
# ---------------------------------------------------------------------------

from ozone_spark.operators import scm as scmops  # noqa: E402
