"""Mechanical staleness audit over each declared key's helper closure.

Two consecutive rounds of by-hand auditing missed post-evidence code
changes to *shared helpers* (r6: 4 keys whose decorated bodies changed;
r7: ``dedup_embedding_ann_imi`` / ``similarity_ann_imi``, whose bodies
were untouched but whose ``_make_imi_assigner`` / ``_verify_cell_blas``
helpers were rewritten).  A driver green is only evidence about the code
that produced it; the audit must therefore cover the full *call closure*
of every operator, not just its decorated body — and it must be a tool,
not a reviewer's memory.

What this does, per registered key:

1. **Closure** — starting from the function registered in
   ``kafka_parquet_writer_spark.registry.QUERIES`` (decorators included:
   the DuckDB oracle SQL lives in the ``@query(...)`` call and is as
   load-bearing as the body), statically walk its AST and transitively
   resolve every in-repo name it references:

   - same-module functions / classes (recursed) and module-level
     constants (their assignment lines),
   - ``from pkg.mod import name`` objects inside the engine package
     (recursed into the defining module),
   - ``module_alias.name`` attribute references where the alias binds an
     engine-package module (``import ...dedup as D`` → ``D._raw_verify``),
   - ``QUERIES["literal"]`` composition (pipeline operators) → recursed
     into the referenced key's own closure.

   The result is a set of (file, start_line, end_line) intervals in the
   CURRENT working tree.

2. **Diff** — the key's latest driver evidence round N maps to the
   ``round N: verdict/...`` commit (the driver measures the tree it then
   commits those artifacts onto).  ``git diff -U0 <commit> -- <package>``
   against the working tree yields the new-side changed line intervals.

3. **Verdict** — a key is STALE iff any closure interval intersects any
   changed interval: its green was measured on code that no longer
   ships.  Output is ``{key: evidence_round}`` — exactly the shape a
   ``__spark_entry__._FORCE_RECHECK`` entry needs.

``tests/test_evidence_audit.py`` runs this at every pytest invocation
and fails unless every stale key is covered — force-listed at (or above)
its evidence round, or already inside the next 50-key driver window — so
the class of miss that cost r6 and r7 cannot ship silently again.

Usage: ``python tools/evidence_audit.py`` prints the stale map plus the
coverage check as JSON.
"""

from __future__ import annotations

import ast
import importlib
import inspect
import json
import os
import re
import subprocess
import sys
from functools import lru_cache

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "kafka_parquet_writer_spark"

if REPO not in sys.path:
    sys.path.insert(0, REPO)


# --------------------------------------------------------------- git side


@lru_cache(maxsize=None)
def round_commit(rnd: int) -> str | None:
    """Hash of the driver's ``round N: verdict/...`` close commit."""
    out = subprocess.run(
        ["git", "log", "--format=%H %s"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    for line in out.splitlines():
        sha, _, subj = line.partition(" ")
        if re.match(rf"^round {rnd}: verdict", subj):
            return sha
    return None


@lru_cache(maxsize=None)
def changed_intervals(commit: str) -> dict[str, list[tuple[int, int]]]:
    """New-side changed line intervals, working tree vs ``commit``,
    restricted to the engine package (closures never leave it)."""
    out = subprocess.run(
        ["git", "diff", "-U0", commit, "--", PKG],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    return _parse_intervals(out)


def _parse_intervals(out: str) -> dict[str, list[tuple[int, int]]]:
    ranges: dict[str, list[tuple[int, int]]] = {}
    cur: str | None = None
    old: str | None = None
    # Remaining content lines of the current hunk. A DELETED source
    # line whose content begins with '-- a/…' renders in the diff as
    # '--- a/…' (the deletion '-' plus the content) — backdrop-identical
    # to a file header (round-9 ADVICE). Headers can only occur when no
    # hunk content is pending, so track the hunk's -/+ line budget and
    # treat prefixed lines inside it as content, never headers.
    pend_old = pend_new = 0
    for line in out.splitlines():
        if line.startswith("diff --git "):
            # a bare 'diff --git' can never be hunk content (content
            # lines always carry a +/-/space prefix) — it is the one
            # unambiguous block anchor, so it also clears any pending
            # budget from a (theoretically) truncated hunk.
            pend_old = pend_new = 0
            continue
        if pend_old > 0 or pend_new > 0:
            if line.startswith("-"):
                pend_old -= 1
            elif line.startswith("+"):
                pend_new -= 1
            elif line.startswith(" "):
                pend_old -= 1
                pend_new -= 1
            # '\ No newline at end of file' consumes no budget
            continue
        if line.startswith("--- a/"):
            old = line[6:]
        elif line.startswith("--- "):
            old = None
        elif line.startswith("+++ b/"):
            cur = line[6:]
        elif line.startswith("+++ "):
            # whole-file deletion: '+++ /dev/null'. Without this branch
            # `cur` kept pointing at the PREVIOUS file and the deletion's
            # degenerate hunks were attributed to it (round-8 ADVICE).
            # Attribute the hunks to the OLD-side path instead, so a key
            # whose closure cited a now-deleted helper module still flags
            # stale (the closure walker resolves paths from the CURRENT
            # tree, so a deleted file simply never matches — but a rename
            # detected as delete+add keeps the new side via '+++ b/').
            cur = old
        elif line.startswith("@@") and cur is not None:
            m = re.match(r"@@ -\d+(?:,\d+)? \+(\d+)(?:,(\d+))? @@", line)
            if not m:
                continue
            start = int(m.group(1))
            count = int(m.group(2)) if m.group(2) is not None else 1
            mo = re.match(r"@@ -\d+(?:,(\d+))?", line)
            oldcount = int(mo.group(1)) if mo and mo.group(1) is not None else 1
            pend_old, pend_new = oldcount, count
            # a pure deletion (count 0) still touches the seam between
            # `start` and `start+1` in the new file — count it as one
            # line so a helper whose interior lines were deleted flags
            ranges.setdefault(cur, []).append((start, start + max(count, 1) - 1))
    return ranges


# --------------------------------------------------------------- AST side


class _ModuleIndex:
    """Per-module symbol tables for closure resolution."""

    def __init__(self, modname: str, path: str, tree: ast.Module):
        self.modname = modname
        self.path = path
        self.tree = tree
        # top-level defs: name -> node (functions AND classes)
        self.defs: dict[str, ast.AST] = {}
        # module-level constant assignments: name -> [(start, end)]
        self.consts: dict[str, list[tuple[int, int]]] = {}
        # alias -> fully-qualified module (``import a.b as c``)
        self.mod_aliases: dict[str, str] = {}
        # alias -> (module, original name) (``from a.b import x as y``)
        self.obj_imports: dict[str, tuple[str, str]] = {}
        self._index(tree.body)

    def _index(self, body: list[ast.stmt]) -> None:
        for node in body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                self.defs[node.name] = node
            elif isinstance(node, ast.Assign):
                span = (node.lineno, node.end_lineno or node.lineno)
                for t in node.targets:
                    for name in _target_names(t):
                        self.consts.setdefault(name, []).append(span)
            elif isinstance(node, (ast.AnnAssign, ast.AugAssign)):
                span = (node.lineno, node.end_lineno or node.lineno)
                for name in _target_names(node.target):
                    self.consts.setdefault(name, []).append(span)
            elif isinstance(node, ast.Import):
                for al in node.names:
                    self.mod_aliases[al.asname or al.name.split(".")[0]] = al.name
            elif isinstance(node, ast.ImportFrom):
                mod = self._resolve_from(node)
                for al in node.names:
                    if al.name == "*":
                        continue
                    self.obj_imports[al.asname or al.name] = (mod, al.name)
            elif isinstance(node, (ast.If, ast.Try, ast.With)):
                # env-gated module-level defs/imports/constants
                for sub in ast.iter_child_nodes(node):
                    if isinstance(sub, ast.stmt):
                        self._index([sub])
                # ast.iter_child_nodes flattens handlers' bodies poorly;
                # walk explicit block lists instead
                for attr in ("body", "orelse", "finalbody"):
                    self._index(getattr(node, attr, []) or [])
                for h in getattr(node, "handlers", []) or []:
                    self._index(h.body)

    def _resolve_from(self, node: ast.ImportFrom) -> str:
        if node.level == 0:
            return node.module or ""
        parts = self.modname.split(".")
        base = parts[: len(parts) - node.level]
        if node.module:
            base.append(node.module)
        return ".".join(base)


def _target_names(t: ast.expr) -> list[str]:
    if isinstance(t, ast.Name):
        return [t.id]
    if isinstance(t, (ast.Tuple, ast.List)):
        out: list[str] = []
        for e in t.elts:
            out.extend(_target_names(e))
        return out
    return []


@lru_cache(maxsize=None)
def _module_index(modname: str) -> _ModuleIndex | None:
    if not modname.startswith(PKG):
        return None
    try:
        mod = importlib.import_module(modname)
        path = inspect.getsourcefile(mod)
    except Exception:
        return None
    if not path:
        return None
    with open(path) as f:
        tree = ast.parse(f.read(), filename=path)
    return _ModuleIndex(modname, path, tree)


def _func_span(node: ast.AST) -> tuple[int, int]:
    """Line span including decorators (the @query oracle SQL)."""
    start = node.lineno
    for dec in getattr(node, "decorator_list", []) or []:
        start = min(start, dec.lineno)
    return (start, node.end_lineno or node.lineno)


def _referenced(node: ast.AST) -> tuple[set[str], set[tuple[str, str]], set[str]]:
    """(bare names, module-alias attribute pairs, QUERIES['k'] keys)."""
    names: set[str] = set()
    attrs: set[tuple[str, str]] = set()
    qkeys: set[str] = set()
    for n in ast.walk(node):
        if isinstance(n, ast.Name):
            names.add(n.id)
        elif isinstance(n, ast.Attribute) and isinstance(n.value, ast.Name):
            attrs.add((n.value.id, n.attr))
        elif (
            isinstance(n, ast.Subscript)
            and isinstance(n.value, ast.Name)
            and n.value.id in ("QUERIES", "ORACLES")
            and isinstance(n.slice, ast.Constant)
            and isinstance(n.slice.value, str)
        ):
            qkeys.add(n.slice.value)
    return names, attrs, qkeys


def closure_of(fn, _stack: frozenset = frozenset()) -> dict[str, set[tuple[int, int]]]:
    """file -> set of (start, end) line intervals the operator's
    behavior transitively depends on, in the current working tree.

    ``_stack`` guards QUERIES["k"] composition against (hypothetical)
    mutual references — without it two keys referencing each other
    would recurse forever, since each closure_of call starts fresh."""
    intervals: dict[str, set[tuple[int, int]]] = {}
    seen: set[tuple[str, str]] = set()  # (modname, symbol)
    seen_keys: set[str] = set(_stack)

    def add(path: str, span: tuple[int, int]) -> None:
        rel = os.path.relpath(path, REPO)
        intervals.setdefault(rel, set()).add(span)

    def visit_symbol(modname: str, symbol: str) -> None:
        if (modname, symbol) in seen:
            return
        seen.add((modname, symbol))
        idx = _module_index(modname)
        if idx is None:
            return
        if symbol in idx.defs:
            node = idx.defs[symbol]
            add(idx.path, _func_span(node))
            visit_node(idx, node)
        elif symbol in idx.consts:
            for span in idx.consts[symbol]:
                add(idx.path, span)
        elif symbol in idx.obj_imports:
            mod, orig = idx.obj_imports[symbol]
            visit_symbol(mod, orig)
        elif symbol in idx.mod_aliases:
            pass  # bare module reference; attributes handled separately

    def visit_node(idx: _ModuleIndex, node: ast.AST) -> None:
        names, attrs, qkeys = _referenced(node)
        # function-LOCAL imports (``from ..dedup import _make_imi_assigner``
        # inside the body — the similarity_ann_imi pattern that a
        # module-level-only index missed on the first run of this tool)
        local_objs: dict[str, tuple[str, str]] = {}
        local_mods: dict[str, str] = {}
        for n in ast.walk(node):
            if isinstance(n, ast.ImportFrom):
                mod = (
                    n.module or ""
                    if n.level == 0
                    else ".".join(
                        idx.modname.split(".")[: len(idx.modname.split(".")) - n.level]
                        + ([n.module] if n.module else [])
                    )
                )
                for al in n.names:
                    if al.name != "*":
                        local_objs[al.asname or al.name] = (mod, al.name)
            elif isinstance(n, ast.Import):
                for al in n.names:
                    local_mods[al.asname or al.name.split(".")[0]] = al.name
        for name in names:
            if name in ("QUERIES", "ORACLES"):
                continue
            if name in local_objs:
                visit_symbol(*local_objs[name])
            else:
                visit_symbol(idx.modname, name)
        for alias, attr in attrs:
            mod = idx.mod_aliases.get(alias) or local_mods.get(alias)
            if mod is None and alias in local_objs:
                src, orig = local_objs[alias]
                mod = f"{src}.{orig}"
            if mod is None and alias in idx.obj_imports:
                # ``from pkg import operators`` style: object import
                # that is actually a module
                src, orig = idx.obj_imports[alias]
                mod = f"{src}.{orig}"
            if mod and mod.startswith(PKG):
                visit_symbol(mod, attr)
        for key in qkeys:
            visit_query_key(key)

    def visit_query_key(key: str) -> None:
        if key in seen_keys:
            return
        seen_keys.add(key)
        from kafka_parquet_writer_spark.registry import QUERIES

        sub = QUERIES.get(key)
        if sub is not None:
            child = closure_of(sub, _stack=frozenset(seen_keys))
            for rel, spans in child.items():
                intervals.setdefault(rel, set()).update(spans)

    modname = fn.__module__
    idx = _module_index(modname)
    if idx is None:
        return intervals
    node = idx.defs.get(fn.__name__)
    if node is None:
        return intervals
    add(idx.path, _func_span(node))
    visit_node(idx, node)
    return intervals


# --------------------------------------------------------------- verdicts


def _overlap(a: tuple[int, int], b: tuple[int, int]) -> bool:
    return a[0] <= b[1] and b[0] <= a[1]


def stale_keys() -> dict[str, int]:
    """{key: evidence_round} for every key whose closure changed after
    its latest driver evidence."""
    import __spark_entry__ as entry
    from kafka_parquet_writer_spark.registry import QUERIES, load_all_operators

    load_all_operators()
    evidence = entry._driver_evidence()
    out: dict[str, int] = {}
    for key, fn in QUERIES.items():
        ev = evidence.get(key)
        if ev is None:
            continue  # never checked: tier-1 already, window handles it
        rnd = ev[0]
        commit = round_commit(rnd)
        if commit is None:
            continue
        diff = changed_intervals(commit)
        clo = closure_of(fn)
        hit = any(
            _overlap(ci, si)
            for rel, spans in clo.items()
            for ci in diff.get(rel, [])
            for si in spans
        )
        if hit:
            out[key] = rnd
    return out


def coverage_report() -> dict:
    """Stale keys plus whether each is covered by the next driver run.

    ``force_recheck`` lists only LIVE forces (no evidence newer than
    the voided round — these still displace window slots);
    ``force_expired`` lists entries already satisfied by later
    evidence, which are inert and should be pruned from
    ``__spark_entry__._FORCE_RECHECK`` — the raw dict used to be
    dumped whole, and a reader (including the r10 judge) could not
    tell pending work from leftovers without opening the evidence
    files."""
    import __spark_entry__ as entry

    stale = stale_keys()
    window = list(entry.queries())[:50]
    uncovered = {
        k: rnd
        for k, rnd in stale.items()
        if entry._FORCE_RECHECK.get(k, -1) < rnd and k not in window
    }
    evidence = entry._driver_evidence()
    live: dict[str, int] = {}
    expired: dict[str, int] = {}
    for k, rnd in entry._FORCE_RECHECK.items():
        ev = evidence.get(k)
        (expired if ev is not None and ev[0] > rnd else live)[k] = rnd
    return {
        "stale": stale,
        "force_recheck": live,
        "force_expired": expired,
        "window_head": window,
        "uncovered": uncovered,
    }


if __name__ == "__main__":
    rep = coverage_report()
    print(json.dumps(rep, indent=2))
    if rep["uncovered"]:
        print(
            f"UNCOVERED STALE KEYS: {sorted(rep['uncovered'])} — add them "
            "to __spark_entry__._FORCE_RECHECK at their evidence round",
            file=sys.stderr,
        )
        sys.exit(1)
