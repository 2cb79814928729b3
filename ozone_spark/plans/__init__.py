"""Plan inspection helpers — the engine's window into Catalyst.

Used by tests/test_plans.py to assert the physical properties the
100 TB layout policy is designed to produce (partition pruning, parquet
pushdown, broadcast joins, partial aggregation, top-k)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string (explain() only prints)."""
    try:
        jvm = df._sc._jvm  # type: ignore[attr-defined]
        mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        return df._jdf.queryExecution().explainString(mode)  # type: ignore[attr-defined]
    except Exception:
        import contextlib
        import io
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()


def plan_has(df: DataFrame, *needles: str) -> dict[str, bool]:
    plan = formatted_plan(df)
    return {n: (n in plan) for n in needles}
