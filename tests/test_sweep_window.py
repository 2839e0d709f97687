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
    import sys

    # the ONE hash definition, shared with the manifest builder (ADVICE r5:
    # an inline re-implementation here would silently stop matching if
    # tools/stale_ops.py ever changed its scheme). r10: the scheme hashes
    # the transitive same-module helper closure, not just the fn body.
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from stale_ops import op_closure_source, op_source_hash

    def needs_row(o):
        row = manifest.get(o.name)
        if row is None:
            return True  # NEVER swept
        return op_source_hash(op_closure_source(o.fn), o.sql) != row["source_hash"]

    ops = all_ops()
    window = _window()
    in_window = {o.name for o in window}
    n_needing = sum(1 for o in ops.values() if needs_row(o))
    # Every op that needs a row must be IN the window — except when more
    # than 50 ops need one (a wide refactor round): the window can only
    # hold 50, so up to (n_needing - 50) may queue for the next round and
    # the binding rule degrades to the no-resweep assertion below (no
    # slot may go to a fresh op while a needing op waits outside).
    left_out = [n for n, o in ops.items() if needs_row(o) and n not in in_window]
    assert len(left_out) <= max(0, n_needing - 50), (
        f"ops needing a driver row left outside the window while slots "
        f"exist for them: {left_out}"
    )
    # ...and FRESH ops may only occupy slots the needing set can't fill
    # (r8 amendment: the coverage-finishing window has 47 candidates for
    # 50 slots — the spare slots re-certify fresh ops at the new rev,
    # which is free evidence, not waste; with >50 candidates this reduces
    # to the original no-resweep rule).
    resweeps = [o.name for o in window if not needs_row(o)]
    allowed_fresh = max(0, 50 - n_needing)
    assert len(resweeps) <= allowed_fresh, (
        f"window re-sweeps {len(resweeps)} already-certified ops "
        f"({resweeps}) but only {allowed_fresh} spare slots exist"
    )


def test_plumbing_hash_is_tracked():
    """VERDICT r12 item 7: the closure hash deliberately excludes the
    io/session/registry/config/errors plumbing, so an edit there stales
    nothing mechanically. The manifest must therefore carry a plumbing
    hash (taken at the newest swept rev) for `stale` to compare against —
    when it moves, the tool demands the replica-double battery. This test
    pins that the gate is armed and the hash scheme is computable."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from stale_ops import _PLUMBING_FILES, plumbing_hash

    manifest = json.load(open(MANIFEST))
    entry = manifest.get("__plumbing__")
    assert entry is not None, "manifest missing __plumbing__ — rebuild it"
    assert entry.get("files") == list(_PLUMBING_FILES)
    assert len(entry["source_hash"]) == 64
    live = plumbing_hash()
    assert len(live) == 64
    # NOT asserting live == manifest hash: a plumbing edit mid-round is
    # legal — the gate's job is to FLAG it (stale_ops prints the
    # replica-double demand), not to forbid it.


def test_window_is_mostly_hash_certifiable():
    # r8 amendment: the original >=40 gate assumed a backlog of
    # oracle-backed candidates. The coverage-finishing window must hold
    # every remaining never-swept op, and that tail is rows-only-heavy BY
    # CONSTRUCTION (samplers/sketches/pipeline harnesses were scheduled
    # last precisely because their rows certify least). The invariant
    # that still holds: every oracle-backed op that needs a row is
    # windowed (test above), and the window is still majority
    # hash-certifiable.
    n_oracle = sum(1 for o in _window() if o.sql is not None)
    assert n_oracle >= 30, f"only {n_oracle}/50 windowed ops are oracle-backed"


def test_helper_edit_flags_caller_stale(tmp_path):
    """VERDICT r9 item 3: the staleness hash must cover the transitive
    same-module helper closure — editing ONLY a helper body (op function
    byte-identical) must change every caller's hash."""
    import importlib.util
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from stale_ops import op_closure_source, op_source_hash

    def load(version: str, body: str):
        p = tmp_path / f"fakemod_{version}.py"
        p.write_text(
            "K_CONST = 7\n\n"
            "def _inner(x):\n"
            f"    {body}\n\n"
            "def _helper(x):\n"
            "    return _inner(x) + K_CONST\n\n"
            "def the_op(x):\n"
            "    return _helper(x) * 2\n"
        )
        spec = importlib.util.spec_from_file_location(f"fakemod_{version}", p)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    import inspect

    m1 = load("v1", "return x + 1")
    m2 = load("v2", "return x - 1")  # ONLY the 2nd-level helper differs
    assert inspect.getsource(m1.the_op) == inspect.getsource(m2.the_op)
    assert inspect.getsource(m1._helper) == inspect.getsource(m2._helper)
    c1, c2 = op_closure_source(m1.the_op), op_closure_source(m2.the_op)
    assert "K_CONST = 7" in c1 and "_inner" in c1  # closure includes both
    assert op_source_hash(c1, None) != op_source_hash(c2, None)

    # a module-level constant edit must flag too
    p3 = tmp_path / "fakemod_v3.py"
    p3.write_text((tmp_path / "fakemod_v1.py").read_text().replace("K_CONST = 7", "K_CONST = 8"))
    spec = importlib.util.spec_from_file_location("fakemod_v3", p3)
    m3 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m3)
    assert op_source_hash(op_closure_source(m3.the_op), None) != op_source_hash(c1, None)


def test_mutable_constant_hash_is_runtime_stable_but_edit_sensitive(tmp_path):
    """r10 review follow-up: dict/list module constants are hashed by
    ASSIGNMENT SOURCE, so (a) runtime mutation (module caches filling up
    mid-process) must NOT change an op's hash, while (b) editing the
    constant's source must."""
    import importlib.util
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from stale_ops import op_closure_source

    def load(version: str, src: str):
        p = tmp_path / f"fakemut_{version}.py"
        p.write_text(src)
        spec = importlib.util.spec_from_file_location(f"fakemut_{version}", p)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[spec.name] = mod  # inspect.getmodule needs the registry
        spec.loader.exec_module(mod)
        return mod

    base = (
        "_CACHE = {}\n"
        "MARKERS = {'en': 'the', 'de': 'der'}\n\n"
        "def the_op(x):\n"
        "    _CACHE[x] = MARKERS.get(x)\n"
        "    return _CACHE[x]\n"
    )
    m = load("v1", base)
    h1 = op_closure_source(m.the_op)
    m._CACHE["runtime"] = "junk"  # cache fills mid-process
    assert op_closure_source(m.the_op) == h1, "runtime mutation changed the hash"
    # both constants' assignment sources are in the closure
    assert "_CACHE = {}" in h1 and "MARKERS = {'en': 'the', 'de': 'der'}" in h1

    m2 = load("v2", base.replace("'de': 'der'", "'de': 'und'"))
    assert op_closure_source(m2.the_op) != h1, "constant edit did not flag"


def test_function_local_import_flags_caller_stale(tmp_path):
    """ADVICE r10 (medium): a helper bound by ``from pkg.mod import h``
    INSIDE the op body is a local name — the globals walk can't see it.
    Editing ONLY that helper (op byte-identical) must still change the
    caller's closure hash; same for a function-locally-imported mutable
    constant. Mirrors the real pattern (selection.py imports llm_ops
    helpers inside op bodies)."""
    import importlib
    import inspect
    import shutil
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from stale_ops import op_closure_source, op_source_hash

    def build(version: str, helper_body: str, cache_init: str = "{}"):
        pkgdir = tmp_path / f"fakepkg_{version}"
        pkgdir.mkdir()
        (pkgdir / "__init__.py").write_text("")
        (pkgdir / "helpers.py").write_text(
            f"_LOCAL_CACHE = {cache_init}\n\n"
            "def _deep(x):\n"
            f"    {helper_body}\n\n"
            "def imported_helper(x):\n"
            "    return _deep(x) + len(_LOCAL_CACHE)\n"
        )
        (pkgdir / "ops.py").write_text(
            "def the_op(x):\n"
            f"    from fakepkg_{version}.helpers import _LOCAL_CACHE, imported_helper\n"
            "    return imported_helper(x)\n"
        )
        sys.path.insert(0, str(tmp_path))
        try:
            mod = importlib.import_module(f"fakepkg_{version}.ops")
        finally:
            sys.path.remove(str(tmp_path))
        return mod

    m1 = build("v1", "return x + 1")
    m2 = build("v2", "return x - 1")  # ONLY the 2nd-level helper differs
    # op bodies are identical up to the package name
    s1 = inspect.getsource(m1.the_op).replace("fakepkg_v1", "PKG")
    s2 = inspect.getsource(m2.the_op).replace("fakepkg_v2", "PKG")
    assert s1 == s2
    c1 = op_closure_source(m1.the_op).replace("fakepkg_v1", "PKG")
    c2 = op_closure_source(m2.the_op).replace("fakepkg_v2", "PKG")
    # the transitive closure through the local import is present
    assert "imported_helper" in c1 and "_deep" in c1 and "_LOCAL_CACHE = {}" in c1
    assert op_source_hash(c1, None) != op_source_hash(c2, None)

    # a function-locally-imported mutable constant edit must flag too —
    # and runtime mutation of it must NOT
    m3 = build("v3", "return x + 1", cache_init="{'seed': 1}")
    c3 = op_closure_source(m3.the_op).replace("fakepkg_v3", "PKG")
    assert op_source_hash(c3, None) != op_source_hash(c1, None)
    helpers3 = sys.modules["fakepkg_v3.helpers"]
    helpers3._LOCAL_CACHE["runtime"] = "junk"
    assert op_closure_source(m3.the_op).replace("fakepkg_v3", "PKG") == c3

    for v in ("v1", "v2", "v3"):
        sys.modules.pop(f"fakepkg_{v}.ops", None)
        sys.modules.pop(f"fakepkg_{v}.helpers", None)
        sys.modules.pop(f"fakepkg_{v}", None)
        shutil.rmtree(tmp_path / f"fakepkg_{v}", ignore_errors=True)


def test_closure_hash_excludes_path_dunders(tmp_path):
    """VERDICT r11 What's-wrong 1: a body referencing ``__file__`` (the
    addPyFile zip helper pattern) must NOT pull the checkout's absolute
    path into the closure hash — otherwise a manifest row built via a
    temp git worktree can never match the live tree and the op reports
    perpetually STALE. Loading byte-identical source from two different
    directories must produce byte-identical closure source."""
    import importlib
    import shutil
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from stale_ops import op_closure_source

    PKG_SRC = {
        "__init__.py": (
            "import pathlib\n\n"
            "def zip_helper():\n"
            "    return pathlib.Path(__file__).parent\n"
        ),
        "ops.py": (
            "def the_op(x):\n"
            "    from {pkg} import zip_helper\n"
            "    return (zip_helper(), x)\n"
        ),
    }

    def build(version: str, root) -> object:
        pkg = f"fakepath_{version}"
        pkgdir = root / pkg
        pkgdir.mkdir(parents=True)
        for fname, src in PKG_SRC.items():
            (pkgdir / fname).write_text(src.format(pkg=pkg))
        sys.path.insert(0, str(root))
        try:
            return importlib.import_module(f"{pkg}.ops")
        finally:
            sys.path.remove(str(root))

    # same package NAME and bytes, two different checkout locations
    m1 = build("vA", tmp_path / "checkout_one")
    m2 = build("vB", tmp_path / "checkout_two" / "nested" / "deep")
    c1 = op_closure_source(m1.the_op).replace("fakepath_vA", "PKG")
    c2 = op_closure_source(m2.the_op).replace("fakepath_vB", "PKG")
    assert "zip_helper" in c1                 # the helper itself IS hashed
    assert "__file__ = " not in c1            # but not the absolute path
    assert str(tmp_path) not in c1
    assert c1 == c2, "closure source depends on checkout location"

    for v in ("vA", "vB"):
        sys.modules.pop(f"fakepath_{v}.ops", None)
        sys.modules.pop(f"fakepath_{v}", None)
    shutil.rmtree(tmp_path / "checkout_one", ignore_errors=True)
    shutil.rmtree(tmp_path / "checkout_two", ignore_errors=True)


def test_registry_hashes_are_checkout_location_independent(tmp_path):
    """End-to-end second-checkout regression (VERDICT r11 next-round
    item 1's done-criterion): hashing the FULL live registry from a copy
    of the tree at a different absolute path must give byte-identical
    hashes for every op. This is exactly what build-manifest does via a
    temp git worktree, so equality here is what makes `stale_ops.py
    stale` reproducible (FRESH == all certified, STALE 0 reachable)."""
    import shutil
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from stale_ops import REPO, hash_ops_at

    second = tmp_path / "second_checkout"
    second.mkdir()
    shutil.copytree(os.path.join(REPO, "bpspark"), second / "bpspark",
                    ignore=shutil.ignore_patterns("__pycache__"))

    live = hash_ops_at(REPO)
    other = hash_ops_at(str(second))
    assert set(live) == set(other)
    diff = sorted(n for n in live if live[n] != other[n])
    assert diff == [], f"checkout-location-dependent hashes: {diff}"
