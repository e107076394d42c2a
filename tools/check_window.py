#!/usr/bin/env python3
"""Driver-window invariant checker (VERDICT r4 ask #1; symbol-level
auto-exemption per VERDICT r6 ask #2).

The driver attests only the FIRST ``WINDOW`` queries of
``__spark_entry__._QUERIES`` per round, so a query is "stale-green"
whenever its implementing code changed after its last attestation.

Two granularities:

1. **Module level** (the r4 original, kept as the over-approximation):
   ``git diff --name-only <last-round-ref>..HEAD -- pond_spark/``
   gives the changed modules; each query maps to the transitive
   closure of pond_spark modules its entry function imports.

2. **Symbol level** (r6 ask #2 — replaces the hand-written EXEMPT
   table): a query on a changed module is AUTOMATICALLY exempt iff
   every symbol in its reachable set is definition-identical between
   the round boundary and the working tree. Reachability is a BFS
   over a cross-module symbol reference graph (top-level
   functions/classes/constants; names resolve through each module's
   own import table, package ``__init__`` re-exports included).
   A symbol's fingerprint is its AST dump plus the resolved origins
   of every pond_spark name it references — so retargeting an import
   moves the fingerprint even when the def body is unchanged.

   Conservative fallbacks (soundness first): a module that is new,
   unparseable at the boundary, or whose top-level NON-symbol body
   changed (anything beyond defs/classes/assignments/imports,
   e.g. a conditional block) taints ALL its symbols, reducing to
   module-level behavior for that module.

Violations (a below-window query whose reachable symbols changed)
→ exit 1. Exemptions are computed, never hand-written, and printed
with the symbol evidence so they cannot hide.

Run in CI via tests/test_window_invariant.py (synthetic-change mode
exercises the mapper without needing git history).
"""

from __future__ import annotations

import argparse
import ast
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENTRY = os.path.join(REPO, "__spark_entry__.py")
WINDOW = 50

#: sentinel: every symbol of the module is considered changed
ALL = "*"


def _module_to_path(mod: str) -> str | None:
    """pond_spark.a.b -> pond_spark/a/b.py (or package __init__)."""
    rel = mod.replace(".", "/")
    for cand in (rel + ".py", rel + "/__init__.py"):
        if os.path.exists(os.path.join(REPO, cand)):
            return cand
    return None


def _resolve_reexport(pkg: str, name: str) -> str | None:
    """If ``pkg``'s __init__ re-exports ``name`` from a submodule,
    return that submodule (``pond_spark.dedup`` + ``minhash_pairs`` ->
    ``pond_spark.dedup.minhash``)."""
    path = _module_to_path(pkg)
    if not path or not path.endswith("__init__.py"):
        return None
    with open(os.path.join(REPO, path)) as fh:
        tree = ast.parse(fh.read())
    for node in tree.body:
        if isinstance(node, ast.ImportFrom):
            if node.level:  # relative: from .minhash import ...
                base = pkg + "." + (node.module or "")
            elif node.module and node.module.startswith("pond_spark"):
                base = node.module
            else:
                continue
            for a in node.names:
                if (a.asname or a.name) == name:
                    sub = base.rstrip(".")
                    return sub if _module_to_path(sub) else None
    return None


def _imported_pond_modules(tree: ast.AST) -> set[str]:
    """All pond_spark.* modules imported anywhere under ``tree``;
    names re-exported by a package __init__ resolve to the defining
    submodule."""
    mods: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                if a.name.startswith("pond_spark"):
                    mods.add(a.name)
        elif isinstance(node, ast.ImportFrom) and node.module:
            if node.module.startswith("pond_spark"):
                mods.add(node.module)
                for a in node.names:
                    # `from pond_spark.x import y`: y may be a
                    # submodule, or a name the package re-exports
                    sub = f"{node.module}.{a.name}"
                    if _module_to_path(sub):
                        mods.add(sub)
                    else:
                        origin = _resolve_reexport(node.module, a.name)
                        if origin:
                            mods.add(origin)
    return mods


def _referenced_names(tree: ast.AST) -> set[str]:
    names: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            names.add(node.id)
        elif isinstance(node, ast.Attribute):
            # walk to the root name of pond_spark.a.b chains
            cur = node
            while isinstance(cur, ast.Attribute):
                cur = cur.value
            if isinstance(cur, ast.Name):
                names.add(cur.id)
    return names


def _pond_import_graph() -> dict[str, set[str]]:
    """pond_spark-internal module -> modules it imports."""
    graph: dict[str, set[str]] = {}
    pkg_root = os.path.join(REPO, "pond_spark")
    for dirpath, _dirs, files in os.walk(pkg_root):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, REPO)
            mod = rel[:-3].replace("/", ".")
            if mod.endswith(".__init__"):
                mod = mod[: -len(".__init__")]
            with open(path) as fh:
                tree = ast.parse(fh.read())
            graph[mod] = _imported_pond_modules(tree)
    return graph


def _close(mods: set[str], graph: dict[str, set[str]]) -> set[str]:
    out, todo = set(), list(mods)
    while todo:
        m = todo.pop()
        if m in out:
            continue
        out.add(m)
        # Package __init__ edges are NOT traversed: an __init__ that
        # re-exports every sibling would otherwise make each query
        # depend on the whole package. The __init__ FILE itself is in
        # the closure (added below) — a change there still flags — but
        # its re-export imports don't fan out.
        if not _module_to_path(m) or not _module_to_path(m).endswith("__init__.py"):
            todo.extend(graph.get(m, ()))
        if "." in m:
            parent = m.rsplit(".", 1)[0]
            if parent not in out:
                out.add(parent)
    return out


def query_module_map() -> dict[str, set[str]]:
    """query name -> closure of pond_spark modules implementing it."""
    with open(ENTRY) as fh:
        tree = ast.parse(fh.read())

    # entry-local function defs: name -> (pond imports, referenced ids)
    fn_imports: dict[str, set[str]] = {}
    fn_refs: dict[str, set[str]] = {}
    top_imports: dict[str, set[str]] = {}  # imported NAME -> modules
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            fn_imports[node.name] = _imported_pond_modules(node)
            fn_refs[node.name] = _referenced_names(node)
        elif isinstance(node, ast.ImportFrom) and node.module and node.module.startswith("pond_spark"):
            for a in node.names:
                name = a.asname or a.name
                sub = f"{node.module}.{a.name}"
                top_imports.setdefault(name, set()).add(
                    sub if _module_to_path(sub) else node.module
                )
        elif isinstance(node, ast.Import):
            for a in node.names:
                if a.name.startswith("pond_spark"):
                    top_imports.setdefault(a.asname or a.name.split(".")[0], set()).add(a.name)

    def fn_closure(root: str) -> set[str]:
        mods: set[str] = set()
        seen: set[str] = set()
        todo = [root]
        while todo:
            f = todo.pop()
            if f in seen or f not in fn_refs:
                continue
            seen.add(f)
            mods |= fn_imports[f]
            for ref in fn_refs[f]:
                if ref in fn_refs and ref not in seen:
                    todo.append(ref)
                if ref in top_imports:
                    mods |= top_imports[ref]
        return mods

    # lazy oracle builders also implement the query (their pond twin
    # builders are part of the compared surface)
    lazy: dict[str, str] = {}
    for node in tree.body:
        if isinstance(node, ast.AnnAssign) and getattr(node.target, "id", "") == "_LAZY_SQL":
            for k, v in zip(node.value.keys, node.value.values):
                if isinstance(v, ast.Name):
                    lazy[k.value] = v.id

    # registered queries: parse the _QUERIES dict literal
    qmap: dict[str, set[str]] = {}
    graph = _pond_import_graph()
    for node in tree.body:
        if isinstance(node, ast.AnnAssign) and getattr(node.target, "id", "") == "_QUERIES":
            d = node.value
            for k, v in zip(d.keys, d.values):
                qname = k.value
                fn_name = v.elts[0].id  # (q_xxx, SQL) tuple
                mods = fn_closure(fn_name)
                if qname in lazy:
                    mods |= fn_closure(lazy[qname])
                qmap[qname] = _close(mods, graph)
    return qmap


# ---------------------------------------------------------------------------
# symbol-level granularity (r6 ask #2)


def _import_table(tree: ast.Module, self_mod: str) -> dict[str, tuple[str, str | None]]:
    """local name -> (origin module, origin symbol | None-for-module),
    from the module's top-level pond_spark imports. Relative imports
    resolve against ``self_mod`` (its package for modules, itself for
    package __init__s)."""
    pkg = self_mod if _is_package(self_mod) else (
        self_mod.rsplit(".", 1)[0] if "." in self_mod else self_mod
    )
    table: dict[str, tuple[str, str | None]] = {}
    for node in tree.body:
        if isinstance(node, ast.ImportFrom):
            if node.level:
                base = pkg
                for _ in range(node.level - 1):
                    base = base.rsplit(".", 1)[0]
                origin = f"{base}.{node.module}" if node.module else base
            else:
                origin = node.module or ""
            if not origin.startswith("pond_spark"):
                continue
            for a in node.names:
                local = a.asname or a.name
                sub = f"{origin}.{a.name}"
                if _module_to_path(sub):
                    table[local] = (sub, None)  # submodule import
                else:
                    table[local] = (origin, a.name)
        elif isinstance(node, ast.Import):
            for a in node.names:
                if a.name.startswith("pond_spark"):
                    table[a.asname or a.name.split(".")[0]] = (a.name, None)
    return table


def _is_package(mod: str) -> bool:
    p = _module_to_path(mod)
    return bool(p and p.endswith("__init__.py"))


def _inline_imports(node: ast.AST, self_mod: str) -> dict[str, tuple[str, str | None]]:
    """Import table for ImportFrom/Import nodes NESTED inside a symbol
    (the repo's inline-import convention)."""
    fake = ast.Module(
        body=[n for n in ast.walk(node) if isinstance(n, (ast.Import, ast.ImportFrom))],
        type_ignores=[],
    )
    return _import_table(fake, self_mod)


def _symbol_nodes(tree: ast.Module) -> tuple[dict[str, ast.AST], list[ast.AST]]:
    """(top-level symbol name -> defining node, leftover body nodes).

    Symbols: function/class defs and simple assignments (constants).
    Imports are NOT body (re-export-only __init__ diffs must not
    taint); everything else (conditionals, expression statements other
    than docstrings) is leftover body — if it changes, the whole
    module taints."""
    syms: dict[str, ast.AST] = {}
    rest: list[ast.AST] = []
    for i, node in enumerate(tree.body):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            syms[node.name] = node
        elif isinstance(node, ast.Assign):
            named = [t for t in node.targets if isinstance(t, ast.Name)]
            if named and len(named) == len(node.targets):
                for t in named:
                    syms[t.id] = node
            else:
                rest.append(node)
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            syms[node.target.id] = node
        elif isinstance(node, (ast.Import, ast.ImportFrom)):
            continue
        elif i == 0 and isinstance(node, ast.Expr) and isinstance(node.value, ast.Constant):
            continue  # module docstring
        else:
            rest.append(node)
    return syms, rest


def _strip_docstrings(node: ast.AST) -> ast.AST:
    """Copy of ``node`` with every leading docstring Expr removed from
    function/class bodies (docstring edits are not semantic)."""
    import copy

    node = copy.deepcopy(node)
    for n in ast.walk(node):
        if isinstance(
            n, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef, ast.Module)
        ) and n.body:
            first = n.body[0]
            if (
                isinstance(first, ast.Expr)
                and isinstance(first.value, ast.Constant)
                and isinstance(first.value.value, str)
            ):
                n.body = n.body[1:] or [ast.Pass()]
    return node


class ModuleInfo:
    """Parsed view of one pond_spark module at one version."""

    def __init__(self, mod: str, src: str):
        self.mod = mod
        tree = ast.parse(src)
        self.symbols, rest = _symbol_nodes(tree)
        self.body_fp = "|".join(ast.dump(n) for n in rest)
        self.imports = _import_table(tree, mod)

    def refs(self, sym: str) -> tuple[set[str], dict[str, tuple[str, str | None]]]:
        """(referenced names, inline import table) for one symbol."""
        node = self.symbols[sym]
        return _referenced_names(node), _inline_imports(node, self.mod)

    def fingerprint(self, sym: str) -> str:
        """Docstring-stripped AST dump + resolved pond origins of every
        referenced name — retargeting an import moves the fingerprint
        even when the def body is byte-identical; a docstring-only
        edit moves nothing."""
        node = _strip_docstrings(self.symbols[sym])
        names, inline = self.refs(sym)
        origins = sorted(
            f"{n}={':'.join(str(p) for p in (inline.get(n) or self.imports[n]))}"
            for n in names
            if n in inline or n in self.imports
        )
        return ast.dump(node) + "||" + ";".join(origins)


def _load_module(mod: str, ref: str | None) -> ModuleInfo | None:
    """Working-tree (ref=None) or boundary-ref version; None when the
    file is absent or unparseable at that version."""
    path = _module_to_path(mod)
    if path is None:
        return None
    try:
        if ref is None:
            with open(os.path.join(REPO, path)) as fh:
                src = fh.read()
        else:
            src = subprocess.run(
                ["git", "show", f"{ref}:{path}"],
                cwd=REPO, capture_output=True, text=True, check=True,
            ).stdout
        return ModuleInfo(mod, src)
    except (OSError, SyntaxError, subprocess.CalledProcessError):
        return None


def changed_symbols(ref: str, mods: set[str]) -> dict[str, set[str] | str]:
    """For each changed module: the set of symbols whose fingerprint
    differs between ``ref`` and the working tree, or ``ALL`` when the
    module is new/unparseable/has non-symbol body changes."""
    out: dict[str, set[str] | str] = {}
    for mod in mods:
        new = _load_module(mod, None)
        if new is None:  # deleted module: imports break loudly elsewhere
            continue
        old = _load_module(mod, ref)
        if old is None:
            out[mod] = ALL
            continue
        if old.body_fp != new.body_fp:
            out[mod] = ALL
            continue
        names = set(old.symbols) | set(new.symbols)
        diff = {
            n
            for n in names
            if n not in old.symbols
            or n not in new.symbols
            or old.fingerprint(n) != new.fingerprint(n)
        }
        out[mod] = diff
    return out


def _resolve_symbol(
    mod: str, name: str | None, cache: dict[str, ModuleInfo | None]
) -> list[tuple[str, str | None]]:
    """Resolve (module, symbol) through package re-export chains to
    concrete (module, symbol | None) pairs. name=None = whole module."""
    if mod not in cache:
        cache[mod] = _load_module(mod, None)
    info = cache[mod]
    if info is None:
        return []
    if name is None:
        return [(mod, None)]
    if name in info.symbols:
        return [(mod, name)]
    if name in info.imports:
        omod, osym = info.imports[name]
        if (omod, osym) != (mod, name):
            return _resolve_symbol(omod, osym, cache)
    # unresolvable (getattr magic, star import): whole module, sound
    return [(mod, None)]


def query_symbol_reach() -> dict[str, set[tuple[str, str | None]]]:
    """query name -> reachable (module, symbol) set. (mod, None) means
    "the whole module" (a module-object import or an unresolvable
    name — conservatively everything in it)."""
    with open(ENTRY) as fh:
        tree = ast.parse(fh.read())

    fn_nodes: dict[str, ast.AST] = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            fn_nodes[node.name] = node
    fn_refs = {n: _referenced_names(f) for n, f in fn_nodes.items()}
    entry_top = _import_table(tree, "pond_spark")  # pond top-imports

    cache: dict[str, ModuleInfo | None] = {}

    def entry_start(root: str) -> set[tuple[str, str | None]]:
        """pond (module, symbol) pairs imported by the entry closure."""
        start: set[tuple[str, str | None]] = set()
        seen: set[str] = set()
        todo = [root]
        while todo:
            f = todo.pop()
            if f in seen or f not in fn_nodes:
                continue
            seen.add(f)
            inline = _inline_imports(fn_nodes[f], "pond_spark")
            for ref in fn_refs[f]:
                if ref in fn_nodes and ref not in seen:
                    todo.append(ref)
                tab = inline if ref in inline else (
                    entry_top if ref in entry_top else None
                )
                if tab is not None:
                    omod, osym = tab[ref]
                    start.update(_resolve_symbol(omod, osym, cache))
            # imports bound but referenced only via nested helpers the
            # walker can't see (e.g. exec'd strings) — take every
            # inline import of the function, referenced or not
            for local, (omod, osym) in inline.items():
                start.update(_resolve_symbol(omod, osym, cache))
        return start

    def expand(start: set[tuple[str, str | None]]) -> set[tuple[str, str | None]]:
        out: set[tuple[str, str | None]] = set()
        todo = list(start)
        while todo:
            mod, sym = todo.pop()
            if (mod, sym) in out:
                continue
            out.add((mod, sym))
            if mod not in cache:
                cache[mod] = _load_module(mod, None)
            info = cache[mod]
            if info is None:
                continue
            if sym is None:
                todo.extend((mod, s) for s in info.symbols)
                continue
            if sym not in info.symbols:
                continue
            names, inline = info.refs(sym)
            for n in names:
                if n == sym:
                    continue
                if n in inline:
                    todo.extend(_resolve_symbol(*inline[n], cache))
                elif n in info.symbols:
                    todo.append((mod, n))
                elif n in info.imports:
                    todo.extend(_resolve_symbol(*info.imports[n], cache))
        return out

    lazy: dict[str, str] = {}
    for node in tree.body:
        if isinstance(node, ast.AnnAssign) and getattr(node.target, "id", "") == "_LAZY_SQL":
            for k, v in zip(node.value.keys, node.value.values):
                if isinstance(v, ast.Name):
                    lazy[k.value] = v.id

    reach: dict[str, set[tuple[str, str | None]]] = {}
    for node in tree.body:
        if isinstance(node, ast.AnnAssign) and getattr(node.target, "id", "") == "_QUERIES":
            for k, v in zip(node.value.keys, node.value.values):
                qname = k.value
                start = entry_start(v.elts[0].id)
                if qname in lazy:
                    # the oracle side's pond twin builders count too
                    start |= entry_start(lazy[qname])
                reach[qname] = expand(start)
    return reach


def _entry_query_fingerprints(entry_src: str) -> dict[str, str]:
    """query name -> stable fingerprint of its ENTRY-LOCAL definition:
    the AST dump of its function closure (helpers included) plus its
    oracle SQL (constant or lazy builder). Comments/whitespace don't
    move the fingerprint; any semantic edit does."""
    tree = ast.parse(entry_src)
    fns: dict[str, ast.AST] = {}
    consts: dict[str, ast.AST] = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            fns[node.name] = node
        elif isinstance(node, ast.Assign) and len(node.targets) == 1:
            t = node.targets[0]
            if isinstance(t, ast.Name):
                consts[t.id] = node.value
    fn_refs = {name: _referenced_names(n) for name, n in fns.items()}

    def closure_dump(root: str) -> str:
        seen: list[str] = []
        todo = [root]
        while todo:
            f = todo.pop()
            if f in seen or f not in fns:
                continue
            seen.append(f)
            todo.extend(r for r in fn_refs[f] if r in fns and r not in seen)
        return "|".join(ast.dump(fns[f]) for f in sorted(seen))

    # lazy oracle builders: _LAZY_SQL = {"name": _builder, ...}
    lazy: dict[str, str] = {}
    for node in tree.body:
        if isinstance(node, ast.AnnAssign) and getattr(node.target, "id", "") == "_LAZY_SQL":
            for k, v in zip(node.value.keys, node.value.values):
                if isinstance(v, ast.Name):
                    lazy[k.value] = v.id

    out: dict[str, str] = {}
    for node in tree.body:
        if isinstance(node, ast.AnnAssign) and getattr(node.target, "id", "") == "_QUERIES":
            for k, v in zip(node.value.keys, node.value.values):
                qname = k.value
                fn_name = v.elts[0].id
                parts = [closure_dump(fn_name)]
                sql = v.elts[1]
                if isinstance(sql, ast.Name) and sql.id in consts:
                    parts.append(ast.dump(consts[sql.id]))
                if qname in lazy:
                    parts.append(closure_dump(lazy[qname]))
                out[qname] = "|".join(parts)
    return out


def entry_changed_queries(ref: str) -> set[str]:
    """Queries whose entry-local definition (function closure or
    oracle SQL) differs between ``ref`` and the working tree."""
    old_src = subprocess.run(
        ["git", "show", f"{ref}:__spark_entry__.py"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout
    with open(ENTRY) as fh:
        new_src = fh.read()
    old = _entry_query_fingerprints(old_src)
    new = _entry_query_fingerprints(new_src)
    # queries absent at ref are NEW — they must be attested too
    return {q for q, fp in new.items() if old.get(q) != fp}


def registered_order() -> list[str]:
    with open(ENTRY) as fh:
        tree = ast.parse(fh.read())
    for node in tree.body:
        if isinstance(node, ast.AnnAssign) and getattr(node.target, "id", "") == "_QUERIES":
            return [k.value for k in node.value.keys]
    raise RuntimeError("_QUERIES not found")


def last_round_ref() -> str:
    out = subprocess.run(
        ["git", "log", "--grep", "^round [0-9]*: verdict", "-1", "--format=%H"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.strip()
    if not out:
        raise RuntimeError("no round-boundary commit found; pass --ref")
    return out


def changed_modules(ref: str, include_worktree: bool = True) -> set[str]:
    args = ["git", "diff", "--name-only", ref]
    if not include_worktree:
        args.append("HEAD")
    args += ["--", "pond_spark/"]
    out = subprocess.run(args, cwd=REPO, capture_output=True, text=True, check=True).stdout
    mods = set()
    for line in out.splitlines():
        if line.endswith(".py"):
            mod = line[:-3].replace("/", ".")
            if mod.endswith(".__init__"):
                mod = mod[: -len(".__init__")]
            mods.add(mod)
    return mods


def _hits(
    q: str,
    qmod: set[str],
    qreach: set[tuple[str, str | None]],
    changed: dict[str, set[str] | str],
) -> set[str]:
    """Evidence strings for the changed symbols query ``q`` reaches
    (empty = automatically exempt despite module-level edges)."""
    ev: set[str] = set()
    reached_mods = {m for m, _s in qreach}
    for mod, syms in changed.items():
        if syms == ALL:
            # whole-module taint falls back to module granularity
            if mod in qmod or mod in reached_mods:
                ev.add(f"{mod}:*")
            continue
        for m, s in qreach:
            if m != mod:
                continue
            if s is None:
                if syms:
                    ev.add(f"{mod}:* (unresolved ref)")
            elif s in syms:
                ev.add(f"{mod}:{s}")
    return ev


def check(
    changed: dict[str, set[str] | str] | set[str],
    entry_changed: set[str] = frozenset(),
) -> tuple[list[tuple[str, int, set[str]]], list[tuple[str, int, str]]]:
    """(violations, auto_exemptions).

    ``changed`` is either a symbol map from :func:`changed_symbols`
    or a bare module set (synthetic mode — treated as whole-module
    taint). Violations are below-window queries that REACH a changed
    symbol; auto-exemptions are below-window queries with module-level
    edges whose reachable symbols are all unchanged (reported with the
    module list for transparency)."""
    if isinstance(changed, (set, frozenset)):
        changed = {m: ALL for m in changed}
    order = registered_order()
    qmap = query_module_map()
    qreach = query_symbol_reach()
    bad: list[tuple[str, int, set[str]]] = []
    exempted: list[tuple[str, int, str]] = []
    for i, q in enumerate(order):
        if i < WINDOW:
            continue
        mod_hit = set(qmap.get(q, set()) & set(changed))
        ev = _hits(q, qmap.get(q, set()), qreach.get(q, set()), changed)
        if q in entry_changed:
            ev.add("__spark_entry__.py")
        if ev:
            bad.append((q, i, ev))
        elif mod_hit:
            exempted.append((
                q, i,
                "auto: module edge(s) "
                + ", ".join(sorted(mod_hit))
                + " but no reachable symbol changed",
            ))
    return bad, exempted


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--ref", default=None, help="round boundary ref (default: last 'round N: verdict' commit)")
    ap.add_argument("--committed-only", action="store_true", help="ignore uncommitted worktree changes")
    args = ap.parse_args()
    ref = args.ref or last_round_ref()
    mods = changed_modules(ref, include_worktree=not args.committed_only)
    entry_changed = entry_changed_queries(ref)
    changed = changed_symbols(ref, mods)
    print(f"round boundary: {ref[:12]}  changed pond_spark modules: {len(mods)}")
    for m in sorted(changed):
        syms = changed[m]
        detail = "WHOLE MODULE" if syms == ALL else ", ".join(sorted(syms)) or "(no symbol diff)"
        print(f"  changed: {m} [{detail}]")
    if entry_changed:
        print(f"  entry-local changed queries: {', '.join(sorted(entry_changed))}")
    bad, exempted = check(changed, entry_changed)
    for q, i, why in exempted:
        print(f"  EXEMPT: {q} (index {i}) — {why}")
    if bad:
        print(f"\nINVARIANT VIOLATED — {len(bad)} query(s) reaching changed symbols sit "
              f"below the {WINDOW}-query driver window:")
        for q, i, hit in bad:
            print(f"  {q} (index {i}) <- {', '.join(sorted(hit))}")
        return 1
    suffix = f" ({len(exempted)} computed exemption(s))" if exempted else ""
    print(
        f"\nOK: every query reaching changed code is inside the first "
        f"{WINDOW}{suffix}."
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
