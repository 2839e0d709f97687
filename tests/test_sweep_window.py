"""Mechanical window-quality gate (VERDICT r4 items 2/6).

The grading driver's correctness sweep covers exactly the FIRST 50 entries
of ``queries()`` (registry ``_PRIORITY`` order), so the front of the
registry IS the round's certification window. These tests pin the two
properties the window must hold, so an accidental registry edit (or a new
registration landing in the wrong tier) fails loudly instead of silently
burning sweep slots:

- every windowed op must still NEED a row (no re-sweeping ops whose driver
  row already certifies their current source — checked against
  tools/driver_row_manifest.json, the staleness tracker's output);
- at least 40 of the 50 must be oracle-backed: a rows-only row adds little
  over the local strict replica, while a hash row is the only evidence the
  replica can't fake. The handful of rows-only slots are reserved for ops
  whose single row certifies a large composition (corpus pipelines) or a
  family with zero rows.
"""

from __future__ import annotations

import json
import os

from bpspark.registry import all_ops

MANIFEST = os.path.join(os.path.dirname(__file__), "..", "tools", "driver_row_manifest.json")


def _window():
    ops = all_ops()
    return [ops[n] for n in list(ops)[:50]]


def test_window_ops_all_need_a_row():
    manifest = json.load(open(MANIFEST))
    manifest.pop("__ingested_correctness__", None)
    import inspect
    import sys

    # the ONE hash definition, shared with the manifest builder (ADVICE r5:
    # an inline re-implementation here would silently stop matching if
    # tools/stale_ops.py ever changed its scheme)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from stale_ops import op_source_hash

    resweeps = []
    for o in _window():
        row = manifest.get(o.name)
        if row is None:
            continue  # NEVER — exactly what the window is for
        src = inspect.getsource(o.fn)
        h = op_source_hash(src, o.sql)
        if h == row["source_hash"]:
            resweeps.append(o.name)  # FRESH — the slot would be wasted
    assert not resweeps, f"window re-sweeps already-certified ops: {resweeps}"


def test_window_is_mostly_hash_certifiable():
    n_oracle = sum(1 for o in _window() if o.sql is not None)
    assert n_oracle >= 40, f"only {n_oracle}/50 windowed ops are oracle-backed"
