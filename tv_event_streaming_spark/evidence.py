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
- the SOURCE of every package function/class the build function can
  reach — names and ``module.attr`` accesses resolved through
  ``__globals__``, closure cells, and in-function imports, then closed
  transitively over each callee's own references (function-level
  granularity: adding an unrelated function to a shared module does
  NOT re-fingerprint every entry in that module, which matters once
  the risky tier must fit the driver's ~50-entry budget),
- a canonical repr of any IMMUTABLE module-level constants the
  closure reads (mutable containers are fingerprinted by their
  once-bound literal assignment SOURCE instead — a runtime cache's
  ``{}`` stays ``{}`` no matter what the process has executed, so
  staleness never depends on ambient session state), and
- for anything NOT statically resolvable to a specific object (a bare
  module reference with unresolved attributes, a registry dict, a
  schema object, a failed ``getsource``), the file bytes of the
  defining module, transitively closed over package-internal imports —
  the old file-level rule, kept as the conservative fallback so
  dynamic dispatch still re-prioritizes.

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


def _abs_base(mod: str, node: ast.ImportFrom, modfiles: dict[str, str]) -> str | None:
    """Absolute module path a from-import targets, with relative levels
    resolved against the importing module's package; None if the import
    is not package-internal."""
    if node.level == 0:
        base = node.module or ""
        if not base.startswith(PKG):
            return None
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
    return base


def _resolve_from(mod: str, node: ast.ImportFrom, modfiles: dict[str, str]) -> set[str]:
    """Package-internal modules referenced by a from-import, with
    relative levels resolved against the importing module's package."""
    base = _abs_base(mod, node, modfiles)
    if base is None:
        return set()
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


def _const_repr(v, depth: int = 0):
    """Canonical deterministic repr for IMMUTABLE constant values; None
    otherwise. Mutable containers (list/dict/set) are deliberately NOT
    representable here even when their contents currently are: a
    module-level ``_CACHE = {}`` fills up as queries run, and folding
    its live contents into a fingerprint makes staleness depend on what
    the current process happened to execute (found as phantom staleness
    under the full pytest suite, whose session fixture populates
    domain's table caches before the ordering test runs). Mutable
    globals take the assignment-source path instead
    (:func:`_module_assigns`). Frozenset iteration order varies with
    PYTHONHASHSEED, hence the sorted element reprs."""
    import re as _re  # noqa: PLC0415

    if depth > 6:
        return None
    if v is None or isinstance(v, (str, bytes, int, float, bool)):
        return repr(v)
    if isinstance(v, _re.Pattern):
        return f"re.compile({v.pattern!r}, {int(v.flags)})"
    if isinstance(v, tuple):
        parts = [_const_repr(x, depth + 1) for x in v]
        if any(p is None for p in parts):
            return None
        return "(" + ", ".join(parts) + ")"
    if isinstance(v, frozenset):
        parts = [_const_repr(x, depth + 1) for x in v]
        if any(p is None for p in parts):
            return None
        return "{" + ", ".join(sorted(parts)) + "}"
    return None


def _is_literal_node(node: ast.AST) -> bool:
    """True iff the AST node is a pure data literal (no Name/Call) —
    the RHS shapes whose source text is a faithful fingerprint."""
    for n in ast.walk(node):
        if not isinstance(
            n,
            (
                ast.Constant,
                ast.Dict,
                ast.List,
                ast.Set,
                ast.Tuple,
                ast.UnaryOp,
                ast.USub,
                ast.UAdd,
                ast.Load,
                ast.BinOp,
                ast.Add,
                ast.Sub,
                ast.Mult,
            ),
        ):
            return False
    return True


_ASSIGNS_CACHE: dict[str, dict[str, str]] = {}


def _module_assigns(mod: str, modfiles: dict[str, str]) -> dict[str, str]:
    """{name: unparsed literal RHS} for every module-level name bound
    exactly once, to a pure literal, in `mod` — the runtime-independent
    fingerprint for mutable globals (a cache's ``{}`` stays ``{}`` no
    matter what the process has executed). A name bound ANYWHERE else
    at module scope — a second assignment, an augmented assignment, a
    for-target, a rebinding inside a module-level loop or if (the
    ``X = lit`` … ``for: X = f(X)`` fold-builder pattern datapipe uses)
    — is absent, so callers fall back to the module file hash: the
    first literal alone would under-fingerprint the effective value.
    Function/class bodies are skipped (those bindings are local)."""
    path = modfiles.get(mod, mod)
    if path in _ASSIGNS_CACHE:
        return _ASSIGNS_CACHE[path]
    out: dict[str, str] = {}
    bound: dict[str, int] = {}
    try:
        with open(path, encoding="utf-8") as f:
            tree = ast.parse(f.read())
    except (OSError, SyntaxError):
        _ASSIGNS_CACHE[path] = out
        return out

    def scan(body) -> None:
        for node in body:
            if isinstance(
                node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
            ):
                continue  # inner bindings are not module globals
            if isinstance(node, ast.Assign):
                for t in node.targets:
                    for n in ast.walk(t):
                        if isinstance(n, ast.Name):
                            bound[n.id] = bound.get(n.id, 0) + 1
                            if (
                                isinstance(t, ast.Name)
                                and bound[n.id] == 1
                                and _is_literal_node(node.value)
                            ):
                                out[n.id] = ast.unparse(node.value)
            elif isinstance(node, (ast.AnnAssign, ast.AugAssign)):
                if isinstance(node.target, ast.Name):
                    bound[node.target.id] = bound.get(node.target.id, 0) + 1
                    if (
                        isinstance(node, ast.AnnAssign)
                        and node.value is not None
                        and bound[node.target.id] == 1
                        and _is_literal_node(node.value)
                    ):
                        out[node.target.id] = ast.unparse(node.value)
            elif isinstance(node, (ast.For, ast.AsyncFor)):
                for n in ast.walk(node.target):
                    if isinstance(n, ast.Name):
                        bound[n.id] = bound.get(n.id, 0) + 1
                scan(node.body)
                scan(node.orelse)
            elif isinstance(node, ast.If):
                scan(node.body)
                scan(node.orelse)
            elif isinstance(node, (ast.While,)):
                scan(node.body)
                scan(node.orelse)
            elif isinstance(node, (ast.With, ast.AsyncWith)):
                scan(node.body)
            elif isinstance(node, ast.Try):
                scan(node.body)
                for h in node.handlers:
                    scan(h.body)
                scan(node.orelse)
                scan(node.finalbody)

    scan(tree.body)
    for name, n in bound.items():
        if n > 1:
            out.pop(name, None)
    _ASSIGNS_CACHE[path] = out
    return out


_ASSIGNED_CACHE: dict[str, frozenset[str]] = {}


def _assigned_toplevel(mod: str, modfiles: dict[str, str]) -> frozenset[str]:
    """Names bound by top-level ASSIGNMENT statements (any form) in a
    module's source — as opposed to names merely imported into it."""
    cached = _ASSIGNED_CACHE.get(mod)
    if cached is not None:
        return cached
    names: set[str] = set()
    try:
        with open(modfiles[mod], encoding="utf-8") as f:
            tree = ast.parse(f.read())
        for node in tree.body:
            targets = []
            if isinstance(node, ast.Assign):
                targets = node.targets
            elif isinstance(node, (ast.AnnAssign, ast.AugAssign)):
                targets = [node.target]
            for t in targets:
                if isinstance(t, ast.Name):
                    names.add(t.id)
    except (OSError, KeyError, SyntaxError):
        pass
    out = frozenset(names)
    _ASSIGNED_CACHE[mod] = out
    return out


def _defining_module(v, modfiles: dict[str, str]) -> tuple[str, str] | tuple[None, None]:
    """(package module, bound name) whose namespace holds `v` (identity
    scan) — used to pin non-constant, non-callable globals (registry
    dicts, schema objects) to an assignment or a file for the
    conservative fallback. Candidates are IMPORTED explicitly (sorted
    order, sorted names): scanning only what already sits in
    sys.modules would make the fingerprint depend on the ambient import
    state of the calling process — the same catalog would fingerprint
    differently under pytest-the-full-suite vs a bare driver,
    producing phantom staleness.

    A module that ASSIGNS the name at top level outranks one that
    merely imports it: pinning a schema object to the importing module
    (e.g. plans.catalog, which imports half the package) would drag
    that module's whole import closure into the fingerprint of every
    entry touching the object — everything-stales-everything through
    the back door."""
    import importlib  # noqa: PLC0415

    holders: list[tuple[str, str]] = []
    for m in sorted(modfiles):
        try:
            mod = importlib.import_module(m)
        except Exception:
            continue
        # collect EVERY binding of v in this module (no break): a module
        # can both import the object under one name and assign it under
        # another, and stopping at the alphabetically-first binding
        # would misclassify it as non-assigning, defeating the
        # assignment-outranks-import preference below.
        for bname in sorted(vars(mod)):
            if vars(mod)[bname] is v:
                holders.append((m, bname))
    for m, bname in holders:
        if bname in _assigned_toplevel(m, modfiles):
            return m, bname
    return holders[0] if holders else (None, None)


def _entry_closure(
    build_fn, modfiles: dict[str, str]
) -> tuple[dict[str, str], set[str], set[str]]:
    """Function-level reachability closure of a build function.

    Returns ({qualified name: source}, {constant reprs}, {fallback
    modules}). Every package function/class reachable from the build fn
    through resolved names, ``module.attr`` accesses, closure cells, and
    in-function imports contributes its SOURCE; anything that cannot be
    pinned to a specific object degrades that reference to the defining
    module's whole file (the pre-round-5 rule)."""
    import importlib  # noqa: PLC0415

    sources: dict[str, str] = {}
    consts: set[str] = set()
    fallback: set[str] = set()
    seen: list = []  # pins objects so id() reuse can't alias
    seen_ids: set[int] = set()
    frontier: list = [build_fn]

    def add_obj(v, owner_mod: str, name: str = "") -> None:
        """Route a resolved value: package callables join the frontier,
        constants fold into the hash, everything else falls back to its
        defining module's file."""
        if inspect.ismethod(v):
            v = v.__func__
        if inspect.isfunction(v) or inspect.isclass(v):
            if getattr(v, "__module__", "").startswith(PKG):
                frontier.append(v)
            return
        if inspect.ismodule(v):
            if v.__name__.startswith(PKG) and v.__name__ in modfiles:
                fallback.add(v.__name__)
            return
        r = _const_repr(v)
        if r is not None:
            consts.add(f"{name}={r}")
            return
        # mutable/global object: fingerprint its once-bound literal
        # assignment SOURCE when there is one (runtime-state
        # independent — a cache's `{}` stays `{}`), else fall back to
        # the defining module's file hash
        leaf = name.split(".")[-1] if name else ""
        if leaf and owner_mod in modfiles:
            src = _module_assigns(owner_mod, modfiles).get(leaf)
            if src is not None:
                consts.add(f"{owner_mod}.{leaf}:={src}")
                return
        m, bname = _defining_module(v, modfiles)
        if m is not None:
            src = _module_assigns(m, modfiles).get(bname)
            if src is not None:
                consts.add(f"{m}.{bname}:={src}")
            else:
                fallback.add(m)
        elif owner_mod in modfiles:
            fallback.add(owner_mod)

    while frontier:
        obj = frontier.pop()
        if id(obj) in seen_ids:
            continue
        seen_ids.add(id(obj))
        seen.append(obj)
        mod = getattr(obj, "__module__", None) or ""
        if not mod.startswith(PKG):
            continue
        key = f"{mod}.{getattr(obj, '__qualname__', getattr(obj, '__name__', '?'))}"
        try:
            src = textwrap.dedent(inspect.getsource(obj))
        except (OSError, TypeError):
            if mod in modfiles:
                fallback.add(mod)
            continue
        sources.setdefault(key, src)
        if inspect.isclass(obj):
            # class source covers the body; traverse methods so THEIR
            # package references are reached too
            for v in vars(obj).values():
                if isinstance(v, (staticmethod, classmethod)):
                    v = v.__func__
                if inspect.isfunction(v) and v.__module__.startswith(PKG):
                    frontier.append(v)
            continue
        try:
            tree = ast.parse(src)
        except SyntaxError:
            if mod in modfiles:
                fallback.add(mod)
            continue
        if obj is build_fn and tree.body and hasattr(tree.body[0], "decorator_list"):
            # the seed's @register(...) decorator is catalog MACHINERY:
            # its entire effect on this entry is the CatalogEntry fields
            # already hashed directly (build source, evaluated oracle,
            # doc, tags). Traversing it would pull the registry dict —
            # and with it every other entry's build fn — into every
            # fingerprint, reverting to everything-stales-everything.
            tree.body[0].decorator_list = []
        names: set[str] = set()
        attr_bases: dict[str, set[str]] = {}
        for node in ast.walk(tree):
            if isinstance(node, ast.Name):
                names.add(node.id)
            elif isinstance(node, ast.Attribute) and isinstance(node.value, ast.Name):
                attr_bases.setdefault(node.value.id, set()).add(node.attr)
            elif isinstance(node, ast.Import):
                for alias in node.names:
                    if alias.name in modfiles:
                        fallback.add(alias.name)
            elif isinstance(node, ast.ImportFrom):
                base = _abs_base(mod, node, modfiles)
                if base is None or (
                    base not in modfiles
                    and not any(f"{base}.{a.name}" in modfiles for a in node.names)
                ):
                    continue
                try:
                    bmod = importlib.import_module(base)
                except Exception:
                    if base in modfiles:
                        fallback.add(base)
                    continue
                for alias in node.names:
                    sub = f"{base}.{alias.name}"
                    if sub in modfiles:
                        fallback.add(sub)
                        continue
                    v = getattr(bmod, alias.name, None)
                    if v is None:
                        if base in modfiles:
                            fallback.add(base)
                    else:
                        add_obj(v, base, alias.name)
        g = obj.__globals__
        cells: dict[str, object] = {}
        if obj.__closure__:
            for nm, cell in zip(obj.__code__.co_freevars, obj.__closure__):
                try:
                    cells[nm] = cell.cell_contents
                except ValueError:
                    pass
        for n in sorted(names):
            v = cells[n] if n in cells else g.get(n)
            if v is None:
                continue
            if inspect.ismodule(v):
                if not v.__name__.startswith(PKG):
                    continue
                vname = v.__name__
                attrs = attr_bases.get(n)
                if not attrs:
                    # module passed around opaquely — whole-file fallback
                    if vname in modfiles:
                        fallback.add(vname)
                    continue
                for a in sorted(attrs):
                    av = getattr(v, a, None)
                    if av is None:
                        if vname in modfiles:
                            fallback.add(vname)
                    else:
                        add_obj(av, vname, f"{n}.{a}")
            else:
                add_obj(v, mod, n)
    return sources, consts, fallback


def fingerprint_catalog() -> dict[str, str]:
    """Entry name -> content fingerprint for the full live catalog."""
    from tv_event_streaming_spark.plans import CATALOG  # noqa: PLC0415

    modfiles = package_module_files()
    file_sha: dict[str, str] = {}
    import_cache: dict[str, set[str]] = {}
    out: dict[str, str] = {}
    for name, entry in CATALOG.items():
        sources, consts, fallback = _entry_closure(entry.build, modfiles)
        h = hashlib.sha256()
        h.update(textwrap.dedent(inspect.getsource(entry.build)).encode())
        h.update(b"\x00")
        h.update((entry.oracle or "").encode())
        for k in sorted(sources):
            h.update(f"\x00S:{k}\x00".encode() + sources[k].encode())
        for c in sorted(consts):
            h.update(b"\x00C:" + c.encode())
        for m in sorted(_closure(fallback, modfiles, import_cache)):
            if m not in file_sha:
                with open(modfiles[m], "rb") as f:
                    file_sha[m] = hashlib.sha256(f.read()).hexdigest()
            h.update(f"\x00F:{m}:{file_sha[m]}".encode())
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
