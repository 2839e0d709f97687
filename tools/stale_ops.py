#!/usr/bin/env python
"""Driver-row staleness tracker (VERDICT r2 item 7).

A driver CORRECTNESS row certifies the op's code AS OF the round snapshot
that the driver swept — if the implementation changes afterwards, the row
is stale and the op needs re-verification (this is exactly what happened
to join_asof_latest_prior in round 2). This tool makes that mechanical:

  build-manifest  --round N --rev REV --correctness FILE [...]
      For each round, hash every op's source (inspect.getsource(fn) + the
      oracle SQL) at the given git rev (via a throwaway `git worktree`),
      keep the hash for ops that got a VALID driver row in that round's
      CORRECTNESS file (err == null or a rows-only "no_oracle"), and write
      tools/driver_row_manifest.json (later rounds win).

  stale  (default)
      Compare current op source hashes against the manifest. Prints three
      lists: STALE (valid driver row, source changed since), FRESH (row
      still certifies the code), NEVER (no valid driver row yet). The
      STALE + NEVER union, in registry priority order, is the next sweep
      window candidate set.

The hash covers the op function body + oracle SQL + the TRANSITIVE
same-module helper closure (r10, VERDICT r9 item 3): every function or
class the op body references that lives in the same module is included
(recursively), along with simple module-level constants it reads — so an
op whose behavior changed purely through a helper edit (e.g.
_ivf_centroid_literal, _minhash_index_probe, _pack_greedy_group) now
flags STALE mechanically instead of relying on the builder grepping
callers. Cross-module helpers (bpspark.io.table etc.) remain outside the
closure — they are engine plumbing whose regressions the test suite
catches, not op semantics.

Usage:
  python tools/stale_ops.py                    # report staleness
  python tools/stale_ops.py build-manifest \
      --round 1 --rev 9b82fee --correctness CORRECTNESS_r01.json \
      --round 2 --rev 5fe460e --correctness CORRECTNESS_r02.json
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MANIFEST = os.path.join(REPO, "tools", "driver_row_manifest.json")

def op_source_hash(src: str, sql: str | None) -> str:
    """THE op staleness hash: closure source + oracle SQL. Single shared
    definition — tests/test_sweep_window.py imports this so the window gate
    can never silently fork from the manifest's scheme (ADVICE r5). ``src``
    should be ``op_closure_source(op.fn)`` (r10 scheme), which degrades to
    plain ``inspect.getsource`` when the function has no same-module refs."""
    return hashlib.sha256((src + "\x00" + (sql or "")).encode()).hexdigest()


def _const_repr(v) -> str | None:
    """Deterministic repr for module-level constants worth hashing: plain
    scalars and (nested) tuples/frozensets of them. Anything else (dicts
    built at import, function tables, objects — whose reprs can carry
    memory addresses) returns None and stays out of the hash."""
    if isinstance(v, (bool, int, float, str, bytes)) or v is None:
        return repr(v)
    if isinstance(v, (tuple, frozenset)):
        items = list(v) if isinstance(v, tuple) else sorted(v, key=repr)
        parts = [_const_repr(x) for x in items]
        if any(p is None for p in parts):
            return None
        return "(" + ", ".join(parts) + ")"  # type: ignore[arg-type]
    return None


def op_closure_source(fn) -> str:
    """The op's source PLUS its transitive same-module helper closure
    (VERDICT r9 item 3): AST-walk the function body for referenced names,
    resolve them in the function's globals, and recursively append the
    source of every same-module function/class plus the repr of every
    simple module-level constant. Deterministic: helpers are visited DFS
    in sorted-name order, each emitted once. A helper-body edit thereby
    changes every caller's hash, flagging all its certified callers STALE."""
    import ast
    import inspect
    import textwrap

    mod = inspect.getmodule(fn)
    seen: set[str] = set()
    out: list[str] = []

    def visit(obj, label: str) -> None:
        if label in seen:
            return
        seen.add(label)
        try:
            src = inspect.getsource(obj)
        except (OSError, TypeError):
            return
        out.append(src)
        try:
            tree = ast.parse(textwrap.dedent(src))
        except SyntaxError:
            return
        refs = sorted(
            {n.id for n in ast.walk(tree) if isinstance(n, ast.Name)}
        )
        g = getattr(obj, "__globals__", None)
        if g is None:  # classes don't carry __globals__
            g = vars(mod) if mod else {}
        for r in refs:
            if r == label or r not in g:
                continue
            v = g[r]
            if (inspect.isfunction(v) or inspect.isclass(v)) and inspect.getmodule(v) is mod:
                visit(v, r)
            else:
                rep = _const_repr(v)
                if rep is not None and not inspect.ismodule(v):
                    const_line = f"{r} = {rep}"
                    if const_line not in seen:
                        seen.add(const_line)
                        out.append(const_line)

    visit(fn, getattr(fn, "__name__", "<fn>"))
    return "\n".join(out)


# Runs inside a worktree checkout (old revs included) — keep it compatible
# with every registry version since round 1. Imports op_source_hash from
# THIS file (the current repo's tools dir), not the worktree's copy, so
# every hash in the manifest uses the one shared definition above.
_HASH_SNIPPET = r"""
import json, sys
sys.path.insert(0, {repo!r})
sys.path.insert(1, {tools!r})
from stale_ops import op_source_hash, op_closure_source
from bpspark.registry import all_ops
out = {{}}
for name, op in all_ops().items():
    try:
        src = op_closure_source(op.fn)
    except OSError:
        src = ""
    out[name] = op_source_hash(src, op.sql)
print(json.dumps(out))
"""


def hash_ops_at(repo_dir: str) -> dict[str, str]:
    """Source hash per op for the bpspark tree rooted at ``repo_dir``."""
    res = subprocess.run(
        [
            sys.executable,
            "-c",
            _HASH_SNIPPET.format(repo=repo_dir, tools=os.path.dirname(os.path.abspath(__file__))),
        ],
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(res.stdout.strip().splitlines()[-1])


def hash_ops_at_rev(rev: str) -> dict[str, str]:
    wt = tempfile.mkdtemp(prefix="bpspark_staleck_")
    subprocess.run(
        ["git", "worktree", "add", "--detach", wt, rev],
        cwd=REPO, check=True, capture_output=True,
    )
    try:
        return hash_ops_at(wt)
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            cwd=REPO, check=True, capture_output=True,
        )


def valid_rows(correctness_path: str) -> set[str]:
    """Ops whose driver row actually certifies something: a hash/rows/schema
    check ran AND passed (err null with no false match flag — a hash-FAIL row
    like dedup_substring_spans r3 proves the opposite of certification), or
    the rows-only path recorded a count (err == 'no_oracle' with spark_rows
    populated)."""
    data = json.load(open(correctness_path))
    ok = set()
    for name, row in data.items():
        err = row.get("err")
        checks = (row.get("rows_match"), row.get("schema_match"), row.get("hash_match"))
        # require at least one check to have actually RUN (r8): a row with
        # err null and all three match fields null — e.g. a sweep cut short
        # after launch — must not certify the op as FRESH forever
        if err is None and False not in checks and any(c is not None for c in checks):
            ok.add(name)
        elif str(err).strip() == "no_oracle" and row.get("spark_rows") is not None:
            ok.add(name)
    return ok


def cmd_build_manifest(rounds: list[tuple[int, str, str]]) -> None:
    manifest: dict[str, dict] = {}
    ingested: list[str] = []
    for rnd, rev, cfile in sorted(rounds):
        ingested.append(os.path.basename(cfile))
        hashes = hash_ops_at_rev(rev)
        valid = valid_rows(cfile)
        # Newest driver evidence wins in BOTH directions: a later FAIL or
        # ERROR row also DECERTIFIES an earlier round's passing row —
        # otherwise an op that fails a re-sweep with unchanged source
        # would stay FRESH forever and never re-enter a window.
        attempted = set(json.load(open(cfile)))
        for name in sorted(attempted - valid):
            if manifest.pop(name, None) is not None:
                print(f"  r{rnd}: {name} failed/errored its latest sweep — earlier row decertified")
        for name in sorted(valid):
            if name not in hashes:
                print(f"  warn: r{rnd} row for {name} but op absent at {rev}")
                continue
            manifest[name] = {"round": rnd, "rev": rev, "source_hash": hashes[name]}
    manifest["__ingested_correctness__"] = {
        "round": -1, "rev": "", "source_hash": "", "files": sorted(ingested),
    }
    with open(MANIFEST, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    print(f"wrote {MANIFEST}: {len(manifest) - 1} ops with valid driver rows")


def cmd_stale() -> None:
    if not os.path.exists(MANIFEST):
        sys.exit(f"{MANIFEST} missing — run build-manifest first")
    manifest = json.load(open(MANIFEST))
    # Refuse to propose a window from a manifest that predates a driver
    # artifact (VERDICT r4 item 7: the r4 sweep's rows weren't ingested
    # and `stale` proposed the already-swept window again). Every
    # CORRECTNESS_r*.json in the repo root must have been build-manifest
    # input before the staleness report means anything.
    ingested = set(
        manifest.pop("__ingested_correctness__", {}).get("files", [])
    )
    import glob

    present = {os.path.basename(p) for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))}
    missing = sorted(present - ingested)
    if missing:
        sys.exit(
            "manifest is STALE itself: driver artifact(s) not ingested: "
            + ", ".join(missing)
            + "\nrun build-manifest with every CORRECTNESS_r*.json (plus its"
            " snapshot rev) before generating a window"
        )
    current = hash_ops_at(REPO)
    stale = [
        n for n, h in current.items()
        if n in manifest and manifest[n]["source_hash"] != h
    ]
    fresh = [
        n for n, h in current.items()
        if n in manifest and manifest[n]["source_hash"] == h
    ]
    never = [n for n in current if n not in manifest]
    print(f"FRESH  ({len(fresh)}): driver row still certifies current code")
    print(f"NEVER  ({len(never)}): no valid driver row yet")
    print(f"STALE  ({len(stale)}): impl changed AFTER its driver row — re-verify:")
    for n in stale:
        print(f"  {n}  (row from r{manifest[n]['round']} @ {manifest[n]['rev']})")
    # Window candidates: STALE + NEVER in registry priority order, but
    # oracle-backed (hash-certifiable) ops first within that order — a
    # rows-only driver row adds little over the local strict replica,
    # while a hash row is evidence the replica can't fake (VERDICT r4
    # item 6). The registry's hand-packed tier A should normally agree;
    # this line is the mechanical cross-check.
    sys.path.insert(0, REPO)
    from bpspark.registry import all_ops

    sql_backed = {n for n, o in all_ops().items() if o.sql is not None}
    todo = set(stale) | set(never)
    cand = sorted(
        (n for n in current if n in todo),
        key=lambda n: (n not in sql_backed, list(current).index(n)),
    )[:50]
    n_oracle = sum(1 for n in cand if n in sql_backed)
    print(
        f"\nnext-window candidates (oracle-backed first, then priority order;"
        f" {n_oracle}/{len(cand)} hash-certifiable): " + ", ".join(cand)
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd")
    bm = sub.add_parser("build-manifest")
    bm.add_argument("--round", type=int, action="append", required=True)
    bm.add_argument("--rev", action="append", required=True)
    bm.add_argument("--correctness", action="append", required=True)
    sub.add_parser("stale")
    args = ap.parse_args()
    if args.cmd == "build-manifest":
        if not (len(args.round) == len(args.rev) == len(args.correctness)):
            ap.error("--round/--rev/--correctness must repeat together")
        cmd_build_manifest(list(zip(args.round, args.rev, args.correctness)))
    else:
        cmd_stale()


if __name__ == "__main__":
    main()
