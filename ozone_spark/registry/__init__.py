"""Query registry package: every implemented SURVEY.md §2 operator as a
(spark callable, DuckDB oracle SQL) pair — consumed by __spark_entry__.py
and the driver's correctness gate.

Round 8 split the former single-module registry (6.8k lines) into
per-domain modules so oracle SQL is reviewable next to its domain and so
the edit-aware gate rotation can see oracle-text edits (a q_* module's
mtime/content participates in staleness, which the old registry.py could
not — it changed every round by construction).

Layout: `_base.py` holds the shared namespace (views, QuerySpec, _q, the
impl-module imports); `q_<domain>.py` hold QuerySpecs + oracle SQL;
`_order.py` holds the aggregation, gate backlogs and rotation machinery.
This package re-exports the full former registry API.
"""

from __future__ import annotations

from ._base import *  # noqa: F401,F403
from ._order import *  # noqa: F401,F403
from .q_similarity import _GATE_EMB_N, _SF01_EMB_N  # noqa: F401 — tools
