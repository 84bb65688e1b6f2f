"""Mechanized evidence staleness for the driver's risk-first ordering.

The driver's correctness budget is bounded, so ``__spark_entry__``
orders catalog entries risk-first. "Risk" needs to know whether an
entry's implementation CHANGED since the round that last produced its
green driver evidence — a fact rounds 2-4 tracked with a hand-maintained
tuple, whose failure mode (a forgotten entry silently carrying stale
evidence) is exactly what the ordering rule exists to prevent.

This module replaces the hand list with content fingerprints:

``fingerprint_catalog()`` maps every catalog entry to a sha256 over

- the entry's build-function source (``inspect.getsource`` — includes
  the ``@register`` decorator, so the oracle EXPRESSION and doc travel
  with it),
- the evaluated oracle SQL string (module-level constants folded in),
- the file bytes of every package module the build function references
  (names/attributes resolved through ``__globals__`` plus in-function
  imports), transitively closed over package-internal imports, and
- the repr of any primitive module-level constants the function reads.

``tools/update_evidence.py`` records, per entry, the fingerprint AS OF
THE GIT TREE the driver tested in the entry's last green round
(``git archive`` of the commit that added ``CORRECTNESS_r{N}.json``,
fingerprinted by a subprocess importing that tree) into
``EVIDENCE.json``. At driver time, an entry is STALE iff its live
fingerprint differs from the recorded one — no curation, conservative
by construction (any byte change in any module the entry can reach
re-prioritizes it). Re-greened entries age out automatically the next
time the tool absorbs a CORRECTNESS file (tests gate that it has).
"""

from __future__ import annotations

import ast
import hashlib
import inspect
import json
import os
import textwrap

PKG = "tv_event_streaming_spark"
PKG_DIR = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(PKG_DIR)
EVIDENCE_PATH = os.path.join(ROOT, "EVIDENCE.json")


def package_module_files() -> dict[str, str]:
    """module name -> absolute file path, for every module in the package."""
    out: dict[str, str] = {}
    for dirpath, _dirs, files in os.walk(PKG_DIR):
        if "__pycache__" in dirpath:
            continue
        for f in files:
            if not f.endswith(".py"):
                continue
            path = os.path.join(dirpath, f)
            rel = os.path.relpath(path, ROOT)
            mod = rel[: -len(".py")].replace(os.sep, ".")
            if mod.endswith(".__init__"):
                mod = mod[: -len(".__init__")]
            out[mod] = path
    return out


def _resolve_from(mod: str, node: ast.ImportFrom, modfiles: dict[str, str]) -> set[str]:
    """Package-internal modules referenced by a from-import, with
    relative levels resolved against the importing module's package."""
    if node.level == 0:
        base = node.module or ""
        if not base.startswith(PKG):
            return set()
    else:
        # package of `mod`: drop the trailing component for plain modules
        pkg_parts = mod.split(".")
        if modfiles.get(mod, "").endswith("__init__.py"):
            parts = pkg_parts
        else:
            parts = pkg_parts[:-1]
        if node.level - 1:
            parts = parts[: -(node.level - 1)]
        base = ".".join(parts + ([node.module] if node.module else []))
    found = set()
    if base in modfiles:
        found.add(base)
    for alias in node.names:
        cand = f"{base}.{alias.name}"
        if cand in modfiles:
            found.add(cand)
    return found


def module_imports(mod: str, modfiles: dict[str, str]) -> set[str]:
    """Package-internal modules imported anywhere in `mod` (module level
    AND inside function bodies — ast.walk covers both)."""
    with open(modfiles[mod], encoding="utf-8") as f:
        tree = ast.parse(f.read())
    found: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                if alias.name in modfiles:
                    found.add(alias.name)
        elif isinstance(node, ast.ImportFrom):
            found |= _resolve_from(mod, node, modfiles)
    found.discard(mod)
    return found


def _closure(seeds: set[str], modfiles: dict[str, str], cache: dict[str, set[str]]) -> set[str]:
    seen: set[str] = set()
    frontier = [m for m in seeds if m in modfiles]
    while frontier:
        m = frontier.pop()
        if m in seen:
            continue
        seen.add(m)
        if m not in cache:
            cache[m] = module_imports(m, modfiles)
        frontier.extend(cache[m] - seen)
    return seen


def _entry_refs(build_fn, modfiles: dict[str, str]) -> tuple[set[str], list[str]]:
    """(package modules, primitive-constant reprs) the build function
    references — via bare names resolved through its globals, plus any
    imports written inside the function body."""
    src = textwrap.dedent(inspect.getsource(build_fn))
    tree = ast.parse(src)
    names = {n.id for n in ast.walk(tree) if isinstance(n, ast.Name)}
    g = build_fn.__globals__
    mods: set[str] = set()
    consts: list[str] = []
    for n in sorted(names):
        v = g.get(n)
        if v is None:
            continue
        if inspect.ismodule(v):
            if v.__name__.startswith(PKG):
                mods.add(v.__name__)
        elif callable(v) and getattr(v, "__module__", "").startswith(PKG):
            mods.add(v.__module__)
        elif isinstance(v, (str, bytes, int, float, bool, tuple, frozenset)):
            consts.append(f"{n}={v!r}")
    own = build_fn.__module__
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                if alias.name in modfiles:
                    mods.add(alias.name)
        elif isinstance(node, ast.ImportFrom):
            mods |= _resolve_from(own, node, modfiles)
    return mods, consts


def fingerprint_catalog() -> dict[str, str]:
    """Entry name -> content fingerprint for the full live catalog."""
    from tv_event_streaming_spark.plans import CATALOG  # noqa: PLC0415

    modfiles = package_module_files()
    file_sha: dict[str, str] = {}
    import_cache: dict[str, set[str]] = {}
    out: dict[str, str] = {}
    for name, entry in CATALOG.items():
        mods, consts = _entry_refs(entry.build, modfiles)
        h = hashlib.sha256()
        h.update(textwrap.dedent(inspect.getsource(entry.build)).encode())
        h.update(b"\x00")
        h.update((entry.oracle or "").encode())
        for c in consts:
            h.update(b"\x00" + c.encode())
        for m in sorted(_closure(mods, modfiles, import_cache)):
            if m not in file_sha:
                with open(modfiles[m], "rb") as f:
                    file_sha[m] = hashlib.sha256(f.read()).hexdigest()
            h.update(f"\x00{m}:{file_sha[m]}".encode())
        out[name] = h.hexdigest()
    return out


def stale_entries() -> set[str]:
    """Entries whose live fingerprint differs from (or is missing in)
    the EVIDENCE.json record of their last driver-green round. Returns
    empty on any failure — ordering then degrades to last-green-round
    order, never crashes the driver contract."""
    try:
        with open(EVIDENCE_PATH, encoding="utf-8") as f:
            recorded = json.load(f).get("entries", {})
        current = fingerprint_catalog()
        return {
            n
            for n, fp in current.items()
            if recorded.get(n, {}).get("fingerprint") != fp
        }
    except Exception:
        return set()


if __name__ == "__main__":
    # used by tools/update_evidence.py to fingerprint an archived tree:
    # prints {name: fingerprint} for whatever tree this file sits in
    print(json.dumps(fingerprint_catalog(), indent=0, sort_keys=True))
