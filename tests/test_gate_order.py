"""Gate-rotation ordering invariants (VERDICT r6 item 6): a query whose
implementing module was edited AFTER its last green CORRECTNESS row must
re-verify at the head of the rotation, behind only never-gated queries —
not wait a full rotation behind its own aging green row."""

from __future__ import annotations

import os

from ozone_spark import registry


def test_spec_source_files_maps_lambda_to_modules():
    specs = {q.name: q for q in registry.ALL_QUERIES}
    files = registry._spec_source_files(specs["pricing_summary"])
    names = {os.path.basename(f) for f in files}
    assert "tpch.py" in names
    # registry.py itself must be excluded (it changes every round)
    assert "registry.py" not in names


def test_edited_module_moves_queries_to_head():
    tpch_file = os.path.join(
        os.path.dirname(registry.__file__), "operators", "tpch.py")
    st = os.stat(tpch_file)
    try:
        os.utime(tpch_file, None)  # bump mtime to "edited just now"
        order = [q.name
                 for q in registry._gate_priority_order(registry._REGISTRY_ORDER)]
    finally:
        os.utime(tpch_file, (st.st_atime, st.st_mtime))
    idx = order.index("pricing_summary")
    # every query ahead of it is either never driver-gated or itself
    # stale; in a fully-drained backlog this lands well inside the
    # driver's ~50-row cap together with the other tpch queries
    tpch_specs = [q.name for q in registry.TPCH_QUERIES]
    head = order[:len(order) // 2]
    assert all(n in head for n in tpch_specs), (
        "tpch queries must rotate forward after a tpch.py edit")
    assert idx < 120, f"stale pricing_summary too deep in rotation: {idx}"


def test_every_spec_has_a_nonempty_source_set():
    """ADVICE r7: a QuerySpec whose lambda references directly-imported
    callables (or whose fn uses function-local imports) must still
    resolve to a non-empty implementing-file set, or the edit-aware
    re-gate is silently disabled for that query."""
    missing = [q.name for q in registry._REGISTRY_ORDER
               if not registry._spec_source_files(q)]
    assert missing == [], f"specs with empty source sets: {missing}"


def test_untouched_rotation_is_stable_and_complete():
    order = [q.name
             for q in registry._gate_priority_order(registry._REGISTRY_ORDER)]
    assert sorted(order) == sorted(q.name for q in registry._REGISTRY_ORDER)
    assert len(order) == len(set(order))
