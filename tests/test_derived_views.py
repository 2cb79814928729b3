"""Bit-exact parity of the derived Ozone-shaped namespace views between the
Spark builders (ozone_spark.tables) and the DuckDB oracle CTEs
(ozone_spark.oracle).  Everything downstream depends on this lockstep."""

from __future__ import annotations

import pytest

from ozone_spark import tables
from ozone_spark.oracle import with_views
from tests.util import assert_match

VIEWS = ["keys", "locations", "containers", "replicas", "datanodes",
         "directories", "snap1", "snap2", "snap3", "snapshot_chain",
         "open_keys", "deleted_keys", "multipart_uploads", "user_volumes",
         "trash_entries", "acl_entries"]


@pytest.mark.parametrize("view", VIEWS)
def test_view_parity(spark, con, sf_dir, view):
    t = tables.namespace_views(spark, sf_dir)
    sql = with_views(f"SELECT * FROM {view}", [view])
    assert_match(t[view], sql, con, name=view)
