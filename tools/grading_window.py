"""Show the driver grading window, each query's last driver status, and —
the round-11 addition — which queries' CODE changed AFTER their latest
driver grade (VERDICT r10 task 1: "the driver's grade is the
authoritative signal — the window should lead with changed-code rows").

The external grader runs only the FIRST 50 registry entries per round
(CORRECTNESS_r{N}.json). This tool keeps the rotation honest and, since
round 11, MECHANICAL:

* default        — print the current window with each query's most recent
                   driver verdict, plus never-graded queries.
* --changed      — for every graded query, diff its implementing code
                   between the commit of its latest grade and HEAD:
                   the registry query-function source, its resolved
                   oracle-SQL text, and the transitive closure of
                   package modules the function imports. Print the
                   queries whose grade predates a code change.
* --propose      — emit a proposed next-round priority list: the two
                   gate canaries, then changed-since-grade (oldest
                   grade first), then never-graded, then oldest-graded
                   backfill, capped at the 50-slot window.

Grade commits are the driver's own "round N: verdict/..." commits (they
add CORRECTNESS_r{N}.json and touch no source, so they pin exactly the
code that was graded).

Usage: python tools/grading_window.py [--changed | --propose]
"""

from __future__ import annotations

import ast
import glob
import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50
PKG = "feature_store_fraud_detection_spark"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REGISTRY_REL = f"{PKG}/plans/registry.py"

#: always lead the window: a red canary means harness drift, which
#: re-interprets every other row in the same artifact
CANARIES = ["gate_float_canary", "gate_type_canary"]


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout


def load_history() -> dict[str, tuple[int, str]]:
    """query -> (latest grade round, verdict string)."""
    history: dict[str, tuple[int, str]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        for name, row in json.load(open(path)).items():
            if row.get("err") == "no_oracle":
                # declared rows-only query: the driver records row count
                # only; >0 rows is the pass signal
                verdict = (
                    "rows-only (declared)"
                    if (row.get("spark_rows") or 0) > 0
                    else "rows-only ZERO ROWS"
                )
            elif row.get("err"):
                verdict = "ERR"
            elif row.get("hash_match"):
                verdict = "green"
            elif row.get("rows_match"):
                verdict = "rows-only/red-hash"
            else:
                verdict = "RED"
            history[name] = (rnd, verdict)
    return history


def round_commits() -> dict[int, str]:
    """round -> commit hash of the driver commit that added its grade."""
    out: dict[int, str] = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        base = os.path.basename(path)
        rnd = int(re.search(r"r(\d+)", base).group(1))
        log = _git("log", "--diff-filter=A", "--format=%H", "--", base)
        if log.strip():
            out[rnd] = log.strip().splitlines()[-1]
    return out


# -- registry introspection -------------------------------------------------


def _registry_index(src: str) -> tuple[dict[str, tuple[str, str | None]],
                                       dict[str, str], dict[str, str]]:
    """Parse a registry.py source into:
    (query -> (fn_name, sql_const_or_literal_marker), fn_name -> fn_src,
    const_name -> string value). SQL given inline is stored under a
    synthetic ``<inline:query>`` const name."""
    tree = ast.parse(src)
    fn_src: dict[str, str] = {}
    consts: dict[str, str] = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            fn_src[node.name] = ast.get_source_segment(src, node) or ""
        elif (
            isinstance(node, ast.Assign)
            and len(node.targets) == 1
            and isinstance(node.targets[0], ast.Name)
            and isinstance(node.value, ast.Constant)
            and isinstance(node.value.value, str)
        ):
            consts[node.targets[0].id] = node.value.value
    queries: dict[str, tuple[str, str | None]] = {}
    for node in ast.walk(tree):
        if not isinstance(node, ast.Dict):
            continue
        for k, v in zip(node.keys, node.values):
            if not (
                isinstance(k, ast.Constant)
                and isinstance(k.value, str)
                and isinstance(v, ast.Call)
                and getattr(v.func, "id", getattr(v.func, "attr", ""))
                == "QuerySpec"
            ):
                continue
            args = list(v.args) + [kw.value for kw in v.keywords]
            fn_name = ""
            sql_key: str | None = None
            if args and isinstance(args[0], ast.Name):
                fn_name = args[0].id
            if len(args) > 1:
                a1 = args[1]
                if isinstance(a1, ast.Name):
                    sql_key = a1.id
                elif isinstance(a1, ast.Constant) and isinstance(
                    a1.value, str
                ):
                    sql_key = f"<inline:{k.value}>"
                    consts[sql_key] = a1.value
                elif isinstance(a1, ast.Constant) and a1.value is None:
                    sql_key = None
                else:
                    # computed SQL (f-string/concat): hash the expression
                    sql_key = f"<inline:{k.value}>"
                    consts[sql_key] = ast.dump(a1)
            queries[k.value] = (fn_name, sql_key)
    return queries, fn_src, consts


def _module_file(mod: str) -> str:
    rel = mod.replace(".", "/")
    if os.path.isdir(os.path.join(REPO, rel)):
        return f"{rel}/__init__.py"
    return f"{rel}.py"


class _ModuleIndex:
    """Symbol-level view of one module version: top-level function /
    class / constant sources, the names each symbol references, and the
    (module, symbol) pairs it imports from elsewhere in the package.

    Module-granularity diffing flagged 156 queries after round 10 (any
    edit anywhere in a 3k-line operators file taints every importer);
    symbol granularity reproduces the verdict's hand-audited list.
    """

    def __init__(self, src: str):
        self.src = src
        self.symbols: dict[str, str] = {}
        self.refs: dict[str, set[str]] = {}
        self.sym_imports: dict[str, set[tuple[str, str]]] = {}
        self.top_imports: dict[str, tuple[str, str]] = {}
        try:
            tree = ast.parse(src)
        except SyntaxError:
            return
        for node in tree.body:
            if isinstance(node, ast.ImportFrom) and node.module and (
                node.module.startswith(PKG)
            ):
                for a in node.names:
                    self.top_imports[a.asname or a.name] = (
                        node.module, a.name
                    )
            elif isinstance(
                node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
            ):
                self._add(node, node.name)
            elif isinstance(node, ast.Assign):
                for t in node.targets:
                    if isinstance(t, ast.Name):
                        self._add(node, t.id)

    def _add(self, node: ast.AST, name: str) -> None:
        self.symbols[name] = ast.get_source_segment(self.src, node) or ""
        names: set[str] = set()
        imps: set[tuple[str, str]] = set()
        for sub in ast.walk(node):
            if isinstance(sub, ast.Name):
                names.add(sub.id)
            elif isinstance(sub, ast.ImportFrom) and sub.module and (
                sub.module.startswith(PKG)
            ):
                for a in sub.names:
                    imps.add((sub.module, a.name))
        self.refs[name] = names
        self.sym_imports[name] = imps

    def deps(self, name: str) -> set[tuple[str, str]]:
        """(module_file, symbol) pairs `name` depends on: same-module
        symbols it references, plus package imports (function-local and
        the top-level ones its references resolve to)."""
        out: set[tuple[str, str]] = set()
        for ref in self.refs.get(name, set()):
            if ref in self.symbols and ref != name:
                out.add(("", ref))  # same module, filled by caller
            elif ref in self.top_imports:
                mod, sym = self.top_imports[ref]
                out.add((_module_file(mod), sym))
        for mod, sym in self.sym_imports.get(name, set()):
            out.add((_module_file(mod), sym))
        return out


def _tree_index(ref: str) -> "dict[str, _ModuleIndex]":
    """module file -> _ModuleIndex for every package module at `ref`
    (HEAD reads the worktree so uncommitted edits count as changes)."""
    out: dict[str, _ModuleIndex] = {}
    if ref == "WORKTREE":
        for path in glob.glob(
            os.path.join(REPO, PKG, "**", "*.py"), recursive=True
        ):
            rel = os.path.relpath(path, REPO)
            out[rel] = _ModuleIndex(open(path).read())
        return out
    files = _git("ls-tree", "-r", "--name-only", ref, PKG).splitlines()
    for rel in files:
        if rel.endswith(".py"):
            out[rel] = _ModuleIndex(_git("show", f"{ref}:{rel}"))
    return out


def _symbol_closure(
    idx: dict[str, _ModuleIndex], seeds: set[tuple[str, str]]
) -> set[tuple[str, str]]:
    """Transitive (module_file, symbol) closure over the package."""
    seen: set[tuple[str, str]] = set()
    work = list(seeds)
    while work:
        mf, sym = work.pop()
        if (mf, sym) in seen or mf not in idx:
            continue
        seen.add((mf, sym))
        mi = idx[mf]
        if sym not in mi.symbols:
            continue
        for dmf, dsym in mi.deps(sym):
            work.append((dmf or mf, dsym))
    return seen


def changed_since_grade() -> dict[str, dict]:
    """query -> {round, reasons[...]} for every graded query whose
    implementing code differs between its grade commit and HEAD —
    compared at SYMBOL granularity: the registry query-function source,
    its resolved oracle SQL, and the transitive closure of package
    functions/classes/constants the query function uses."""
    history = load_history()
    commits = round_commits()
    head_src = open(os.path.join(REPO, REGISTRY_REL)).read()
    head_q, head_fns, head_consts = _registry_index(head_src)
    head_idx = _tree_index("WORKTREE")
    head_reg = _ModuleIndex(head_src)

    by_round: dict[int, list[str]] = {}
    for name, (rnd, _) in history.items():
        if name in head_q and rnd in commits:
            by_round.setdefault(rnd, []).append(name)

    out: dict[str, dict] = {}
    old_idx_cache: dict[str, dict[str, _ModuleIndex]] = {}
    for rnd, names in sorted(by_round.items()):
        commit = commits[rnd]
        if commit not in old_idx_cache:
            # only index modules that actually differ vs the worktree;
            # unchanged modules can't change any symbol
            diff_files = set(
                _git("diff", "--name-only", commit, "--", PKG).splitlines()
            )
            idx: dict[str, _ModuleIndex] = {}
            for rel in diff_files:
                if not rel.endswith(".py") or rel == REGISTRY_REL:
                    continue
                try:
                    idx[rel] = _ModuleIndex(_git("show", f"{commit}:{rel}"))
                except subprocess.CalledProcessError:
                    # module did not exist at the grade commit: every
                    # symbol a query now pulls from it is a change
                    idx[rel] = _ModuleIndex("")
            old_idx_cache[commit] = idx
        old_idx = old_idx_cache[commit]
        try:
            old_src = _git("show", f"{commit}:{REGISTRY_REL}")
        except subprocess.CalledProcessError:
            old_src = ""
        old_q, old_fns, old_consts = _registry_index(old_src)
        for name in names:
            reasons: list[str] = []
            fn_name, sql_key = head_q[name]
            if name not in old_q:
                reasons.append("registry entry absent at grade commit")
            else:
                ofn, osql = old_q[name]
                if head_fns.get(fn_name, "") != old_fns.get(ofn, ""):
                    reasons.append(f"registry fn {fn_name} changed")
                new_sql = head_consts.get(sql_key) if sql_key else None
                old_sql = old_consts.get(osql) if osql else None
                if new_sql != old_sql:
                    reasons.append("oracle SQL changed")
            # symbol closure of the query fn's package dependencies
            seeds = {
                (_module_file(mod), sym)
                for mod, sym in head_reg.sym_imports.get(fn_name, set())
                | set(head_reg.top_imports.get(r, (None, None))
                      for r in head_reg.refs.get(fn_name, set())
                      if r in head_reg.top_imports)
                if mod
            }
            changed_syms = []
            for mf, sym in sorted(_symbol_closure(head_idx, seeds)):
                if mf not in old_idx:
                    continue  # module identical at grade commit
                new_s = head_idx[mf].symbols.get(sym)
                old_s = old_idx[mf].symbols.get(sym)
                if new_s != old_s:
                    changed_syms.append(f"{mf}:{sym}")
            if changed_syms:
                reasons.append("symbols changed: " + ", ".join(changed_syms))
            if reasons:
                out[name] = {"round": rnd, "reasons": reasons}
    return out


def propose_window() -> list[str]:
    """Mechanical next-round priority list (<= WINDOW entries):
    canaries -> changed-since-grade with a DuckDB oracle (oldest grade
    first; the driver's hash check is the authoritative signal) ->
    never graded -> oldest-grade oracle-backed backfill -> changed
    rows-only queries last (a rows-only grade is weak — each has an
    oracle-checked deterministic twin carrying the real signal, so they
    only take slots nothing stronger wants). Queries in the registry's
    _REGRADE_WAIVED (guard-only changes re-verified hash-identical this
    round) are excluded from the changed set."""
    import feature_store_fraud_detection_spark.plans.registry as _reg
    from feature_store_fraud_detection_spark.plans.registry import QUERIES

    waived = getattr(_reg, "_REGRADE_WAIVED", {})
    history = load_history()
    changed = {
        n: v for n, v in changed_since_grade().items() if n not in waived
    }
    names = list(QUERIES)

    def has_oracle(n: str) -> bool:
        return QUERIES[n].oracle is not None

    window: list[str] = [c for c in CANARIES if c in QUERIES]
    changed_sorted = sorted(
        changed.items(), key=lambda kv: (kv[1]["round"], kv[0])
    )
    for name, _ in changed_sorted:
        if name not in window and has_oracle(name):
            window.append(name)
    for name in sorted(n for n in names if n not in history):
        if name not in window and len(window) < WINDOW:
            window.append(name)
    backfill = sorted(
        (
            n
            for n in names
            if n in history and n not in window and has_oracle(n)
        ),
        key=lambda n: (history[n][0], n),
    )
    for name in backfill:
        if len(window) >= WINDOW:
            break
        window.append(name)
    for name, _ in changed_sorted:  # rows-only changed, if room remains
        if len(window) >= WINDOW:
            break
        if name not in window:
            window.append(name)
    return window[:WINDOW]


def main() -> int:
    from feature_store_fraud_detection_spark.plans.registry import QUERIES

    if "--changed" in sys.argv:
        changed = changed_since_grade()
        if not changed:
            print("no graded query's code changed since its grade")
            return 0
        for name, info in sorted(
            changed.items(), key=lambda kv: (kv[1]["round"], kv[0])
        ):
            print(f"{name:34s} graded r{info['round']}")
            for r in info["reasons"]:
                print(f"    {r}")
        print(f"\n{len(changed)} queries changed since their grade")
        return 0

    if "--propose" in sys.argv:
        for name in propose_window():
            print(f'    "{name}",')
        return 0

    history = load_history()
    names = list(QUERIES)
    print(f"registry: {len(names)} queries; window = first {WINDOW}\n")
    print("== grading window ==")
    for i, name in enumerate(names[:WINDOW]):
        rnd, verdict = history.get(name, (0, "never graded"))
        tag = f"r{rnd} {verdict}" if rnd else verdict
        print(f"{i + 1:3d}. {name:34s} {tag}")
    ungraded = [n for n in names[WINDOW:] if n not in history]
    stale = [
        (n, history[n]) for n in names[WINDOW:] if n in history
        and history[n][1] != "green"
    ]
    print(f"\n== outside the window, never graded ({len(ungraded)}) ==")
    for n in ungraded:
        print(f"     {n}")
    if stale:
        print("\n== outside the window, last verdict NOT green ==")
        for n, (rnd, verdict) in stale:
            print(f"     {n:34s} r{rnd} {verdict}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
