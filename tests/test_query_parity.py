"""Mirror of the driver's correctness gate: every registry query with an
oracle must match DuckDB on row count, schema names, and values."""

from __future__ import annotations

import pytest

from ozone_spark.registry import ALL_QUERIES
from tests.util import assert_match

ORACLE_SPECS = [q for q in ALL_QUERIES if q.oracle is not None]
ROWS_ONLY_SPECS = [q for q in ALL_QUERIES if q.oracle is None]


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=lambda s: s.name)
def test_oracle_parity(spark, con, sf_dir, spec):
    assert_match(spec.fn(spark, sf_dir), spec.oracle, con, name=spec.name)


@pytest.mark.parametrize("spec", ROWS_ONLY_SPECS, ids=lambda s: s.name)
def test_rows_only_runs(spark, sf_dir, spec):
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
