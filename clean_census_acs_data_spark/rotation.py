"""Change-aware driver-sample rotation (VERDICT r10 ask #3).

The driver samples the FIRST 50 entries of ``__spark_entry__.queries()``
for its per-round DuckDB-parity CORRECTNESS_r{N}.json. Rounds 4-10
rotated never-attested entries into that window; by r10 close every
registry entry carried at least one driver attestation, so from r11 the
window must RE-confirm — and the most valuable re-confirmations are the
entries whose implementing code actually changed since they were last
attested. Ordering tiers:

1. re-attest: had a driver row, latest row not hash-green, now
   oracle-backed (e.g. a rows-only entry later given an oracle)
2. fresh oracle-backed: never attested, hash-checkable
3. fresh rows-only: never attested, no oracle
4. CHANGED since attestation: latest row green, but a file implementing
   the entry (defining module + its transitive in-package imports)
   differs from the tree at the commit that landed that round's
   CORRECTNESS artifact — oldest attestation first
5. unchanged: oldest attestation first

Registry (insertion) order is preserved within every tier, so the
rotation is deterministic. Git supplies tier 4 (``git log
--diff-filter=A`` dates each artifact; ``git diff --name-only <commit>``
lists files that differ from today's worktree); when git or the
artifacts are unavailable the tier is empty and the order degrades to
the oldest-attested-first rotation — never an exception.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess

PKG = "clean_census_acs_data_spark"
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------- artifacts


def latest_rows(repo: str = _REPO) -> dict[str, dict]:
    """name -> newest CORRECTNESS row, annotated with ``"round"``.

    Numeric merge order (parsed round number, not filename sort) so an
    unpadded CORRECTNESS_r7.json can never overwrite r10's row."""

    def _round_no(path: str) -> int:
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", os.path.basename(path))
        return int(m.group(1)) if m else -1

    latest: dict[str, dict] = {}
    paths = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")), key=_round_no)
    for path in paths:
        rnd = _round_no(path)
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            latest[name] = {**row, "round": rnd}
    return latest


# ------------------------------------------------------- entry -> files map


_CLOSURE_CACHE: list[tuple[dict[str, set[str]], dict[str, str]]] = []


def _module_dep_closure() -> tuple[dict[str, set[str]], dict[str, str]]:
    """(module -> transitive set of package module NAMES it imports,
    module -> source path), from an AST scan of each module's SOURCE
    (so deferred function-local imports — common here to keep module
    import cheap — count; a namespace scan misses them). Memoized for
    the process lifetime (sources can't change under a running
    process in a way that matters to the rotation; cleared by
    clear_caches()).

    The registry module and the package root are dependency CYCLES, not
    implementations: queries.py imports every queries_round* for
    registration, and every round module imports ``register`` back from
    it — following either direction makes the closure complete and
    every entry "depend on" every file. Both get NO edges (in or out);
    entries defined in queries.py still carry it as their defining
    file, and the file-level hub cut in entry_files() catches any other
    always-shared module."""
    import ast

    if _CLOSURE_CACHE:
        return _CLOSURE_CACHE[0]
    skip = {PKG, PKG + ".queries"}
    # fully static: walk the package DIRECTORY (sys.modules would miss
    # modules that are only ever deferred-imported inside functions)
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_files: dict[str, str] = {}
    for dirpath, dirnames, filenames in os.walk(pkg_dir):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        for fn in filenames:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, pkg_dir)
            parts = rel[: -len(".py")].split(os.sep)
            if parts[-1] == "__init__":
                parts = parts[:-1]
            pkg_files[".".join([PKG, *parts]) if parts else PKG] = path
    direct: dict[str, set[str]] = {}
    for name, path in pkg_files.items():
        deps: set[str] = set()
        if name not in skip:
            try:
                tree = ast.parse(open(path, encoding="utf-8").read())
            except (OSError, SyntaxError):
                tree = None
            pkg_parts = name.split(".")
            # relative imports resolve against the CONTAINING package:
            # for a plain module that is pkg_parts minus the module
            # segment, but an __init__ module IS its package — level 1
            # resolves against itself, not its parent (review r11)
            is_pkg = os.path.basename(path) == "__init__.py"
            anchor = pkg_parts if is_pkg else pkg_parts[:-1]
            for node in ast.walk(tree) if tree else ():
                if isinstance(node, ast.Import):
                    for a in node.names:
                        if a.name == PKG or a.name.startswith(PKG + "."):
                            deps.add(a.name)
                elif isinstance(node, ast.ImportFrom):
                    if node.level:  # relative: resolve against the package
                        base = anchor[: len(anchor) - (node.level - 1)]
                        mod_str = ".".join(base + ([node.module] if node.module else []))
                    else:
                        mod_str = node.module or ""
                    if mod_str == PKG or mod_str.startswith(PKG + "."):
                        deps.add(mod_str)
                        # ``from .operators import dedup`` imports a
                        # MODULE as the bound name — add the submodule
                        # when it is a real package file
                        for a in node.names:
                            sub = f"{mod_str}.{a.name}"
                            if sub in pkg_files:
                                deps.add(sub)
        direct[name] = {d for d in deps if d != name and d not in skip}
    # transitive closure (the graph is ~70 nodes; simple fixpoint)
    closure = {n: set(d) for n, d in direct.items()}
    changed = True
    while changed:
        changed = False
        for n, deps in closure.items():
            extra = set()
            for d in deps:
                extra |= closure.get(d, set())
            if not extra <= deps:
                deps |= extra
                changed = True
    _CLOSURE_CACHE.append((closure, pkg_files))
    return closure, pkg_files


def entry_files(queries: dict, repo: str = _REPO) -> dict[str, frozenset[str]]:
    """entry name -> repo-relative paths of the files implementing it:
    the defining module plus its transitive in-package imports, MINUS
    hub modules.

    A hub module (session.py, io.py, the queries registry — anything in
    more than half the registry's closures) changes almost every round
    and would mark ALL entries "changed", collapsing the tier into
    plain oldest-first; dropping hubs keeps the tier discriminating.
    When a hub genuinely changes behavior, every entry is equally due
    and the oldest-attested-first tier 5 IS the right window."""
    closure, pkg_files = _module_dep_closure()
    raw: dict[str, set[str]] = {}
    for name, fn in queries.items():
        target = fn
        while hasattr(target, "__wrapped__"):
            target = target.__wrapped__
        files: set[str] = set()
        mod_name = getattr(target, "__module__", None)
        try:
            files.add(os.path.abspath(target.__code__.co_filename))
        except AttributeError:
            pass
        for dep in {mod_name, *closure.get(mod_name, set())} - {None}:
            f = pkg_files.get(dep)
            if f:
                files.add(os.path.abspath(f))
        raw[name] = {
            os.path.relpath(f, repo) for f in files if f.startswith(repo + os.sep)
        }
    freq: dict[str, int] = {}
    for files in raw.values():
        for f in files:
            freq[f] = freq.get(f, 0) + 1
    hub_cut = max(1, len(queries) // 2)
    return {
        name: frozenset(f for f in files if freq[f] <= hub_cut)
        for name, files in raw.items()
    }


# ------------------------------------------------------------ git plumbing


def _git(repo: str, *args: str) -> str | None:
    try:
        r = subprocess.run(
            ["git", "-C", repo, *args],
            capture_output=True,
            text=True,
            timeout=30,
        )
    except (OSError, subprocess.TimeoutExpired):
        return None
    return r.stdout if r.returncode == 0 else None

_ROUND_COMMIT_CACHE: dict[tuple[str, int], str | None] = {}
_CHANGED_CACHE: dict[tuple[str, str], frozenset[str] | None] = {}


def round_commit(repo: str, rnd: int) -> str | None:
    """The commit that last ADDED CORRECTNESS_r{rnd}.json — i.e. the
    tree state when that round's attestations were sealed."""
    key = (repo, rnd)
    if key not in _ROUND_COMMIT_CACHE:
        out = _git(
            repo,
            "log",
            "--diff-filter=A",
            "--format=%H",
            "-n1",
            "--",
            f"CORRECTNESS_r{rnd:02d}.json",
            f"CORRECTNESS_r{rnd}.json",
        )
        _ROUND_COMMIT_CACHE[key] = out.strip() if out and out.strip() else None
    return _ROUND_COMMIT_CACHE[key]


def changed_since(repo: str, commit: str) -> frozenset[str] | None:
    """Repo-relative files that differ between ``commit`` and the
    CURRENT WORKTREE (committed + uncommitted edits both count — an
    entry edited five minutes ago is due even before the commit)."""
    key = (repo, commit)
    if key not in _CHANGED_CACHE:
        out = _git(repo, "diff", "--name-only", commit)
        _CHANGED_CACHE[key] = (
            frozenset(line for line in out.splitlines() if line.strip())
            if out is not None
            else None
        )
    return _CHANGED_CACHE[key]


def clear_caches() -> None:
    _ROUND_COMMIT_CACHE.clear()
    _CHANGED_CACHE.clear()
    _CLOSURE_CACHE.clear()


# ------------------------------------------------------------ the ordering


def rotation_order(
    names: list[str],
    oracles: dict | set,
    queries: dict,
    repo: str = _REPO,
    latest: dict[str, dict] | None = None,
) -> list[str]:
    """Order ``names`` per the five tiers in the module docstring."""
    if latest is None:
        try:
            latest = latest_rows(repo)
        except (OSError, ValueError):
            return list(names)  # artifacts unreadable — registry order

    reattest = [
        n
        for n in names
        if n in latest and not latest[n].get("hash_match") and n in oracles
    ]
    fresh_oracle = [n for n in names if n not in latest and n in oracles]
    fresh_rows = [n for n in names if n not in latest and n not in oracles]
    seen = [n for n in names if n in latest and n not in reattest]

    # tier 4/5 split: implementing files changed since last attestation
    try:
        files = entry_files(queries, repo)
    except Exception:
        files = {}
    changed_by_round: dict[int, frozenset[str] | None] = {}
    idx = {n: i for i, n in enumerate(names)}

    def _is_changed(n: str) -> bool:
        rnd = latest[n].get("round")
        if rnd is None or not files.get(n):
            return False
        if rnd not in changed_by_round:
            commit = round_commit(repo, rnd)
            changed_by_round[rnd] = (
                changed_since(repo, commit) if commit else None
            )
        ch = changed_by_round[rnd]
        return bool(ch) and bool(files[n] & ch)

    changed = [n for n in seen if _is_changed(n)]
    unchanged = [n for n in seen if n not in set(changed)]
    # Within both attested tiers: oracle-backed entries first (VERDICT
    # r11 #3 — a rows-only re-sample can only ever return no_oracle, so
    # spending a 50-entry driver-window slot on one buys nothing), then
    # oldest attestation first.
    changed.sort(
        key=lambda n: (n not in oracles, latest[n].get("round", 0), idx[n])
    )
    unchanged.sort(
        key=lambda n: (n not in oracles, latest[n].get("round", 0), idx[n])
    )
    return reattest + fresh_oracle + fresh_rows + changed + unchanged
