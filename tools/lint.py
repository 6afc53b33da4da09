"""AST linter for the repo (no third-party lint tools ship in this image).

Reference parity: the reference gates merges on flake8 (reference
Makefile:21-23); this covers the highest-signal subset of those checks with
the stdlib only:

  F401  unused import
  F811  redefinition of an unused name (same scope, no use between defs)
  B006  mutable default argument (list/dict/set literal)
  E722  bare `except:`
  F632  `is` / `is not` comparison against a str/number literal
  W605  invalid escape sequence in a non-raw string literal (via compile
        warnings at parse time)

Suppress a line with `# noqa` (optionally `# noqa: F401`).

Usage: python tools/lint.py [paths...]   (default: package + scripts + tools)
Exit 1 when any finding is reported.
"""

from __future__ import annotations

import ast
import sys
import warnings
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DEFAULT_TARGETS = [
    REPO / "audiblelight_tpu",
    REPO / "scripts",
    REPO / "tools",
    REPO / "bench.py",
    REPO / "__graft_entry__.py",
]


def _noqa_lines(src: str) -> dict[int, str]:
    out = {}
    for i, line in enumerate(src.splitlines(), 1):
        if "# noqa" in line:
            _, _, rest = line.partition("# noqa")
            out[i] = rest.strip().lstrip(":").strip()
    return out


class _ScopeChecker(ast.NodeVisitor):
    """Collects findings that need scope-aware name tracking."""

    def __init__(self):
        self.findings: list[tuple[int, str, str]] = []

    # -- imports -----------------------------------------------------------
    def check_module(self, tree: ast.Module):
        self._check_unused_imports(tree)
        self._check_scope_body(tree.body)
        for node in ast.walk(tree):
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                self._check_mutable_defaults(node)
                self._check_scope_body(node.body)
            elif isinstance(node, ast.ClassDef):
                self._check_scope_body(node.body)
            elif isinstance(node, ast.ExceptHandler) and node.type is None:
                self.findings.append((node.lineno, "E722", "bare `except:`"))
            elif isinstance(node, ast.Compare):
                self._check_is_literal(node)

    def _check_unused_imports(self, tree: ast.Module):
        # Imports guarded by `if TYPE_CHECKING:` feed string annotations the
        # AST walker can't see as Name nodes — exempt those lines.
        tc_lines: set[int] = set()
        for node in ast.walk(tree):
            if isinstance(node, ast.If):
                t = node.test
                if (isinstance(t, ast.Name) and t.id == "TYPE_CHECKING") or (
                    isinstance(t, ast.Attribute) and t.attr == "TYPE_CHECKING"
                ):
                    for sub in ast.walk(node):
                        tc_lines.add(sub.lineno) if hasattr(sub, "lineno") else None
        imported: dict[str, tuple[int, str]] = {}
        for node in ast.walk(tree):
            if getattr(node, "lineno", None) in tc_lines:
                continue
            if isinstance(node, ast.Import):
                for a in node.names:
                    name = (a.asname or a.name).split(".")[0]
                    imported[name] = (node.lineno, a.name)
            elif isinstance(node, ast.ImportFrom):
                if node.module == "__future__":
                    continue  # compiler directive, never referenced by name
                for a in node.names:
                    if a.name == "*":
                        continue
                    name = a.asname or a.name
                    imported[name] = (node.lineno, f"{node.module}.{a.name}")
        if not imported:
            return
        used: set[str] = set()
        for node in ast.walk(tree):
            if isinstance(node, ast.Name):
                used.add(node.id)
            elif isinstance(node, ast.Attribute):
                pass  # the base Name node is walked separately
        # Names re-exported via __all__ strings count as used
        for node in ast.walk(tree):
            if isinstance(node, ast.Assign):
                for t in node.targets:
                    if isinstance(t, ast.Name) and t.id == "__all__":
                        for el in ast.walk(node.value):
                            if isinstance(el, ast.Constant) and isinstance(el.value, str):
                                used.add(el.value)
        for name, (lineno, full) in imported.items():
            if name not in used and not name.startswith("_"):
                self.findings.append((lineno, "F401", f"unused import `{full}`"))

    # -- same-scope redefinition ------------------------------------------
    def _check_scope_body(self, body: list[ast.stmt]):
        seen: dict[str, int] = {}
        used_since: set[str] = set()
        for stmt in body:
            for node in ast.walk(stmt):
                if isinstance(node, ast.Name) and isinstance(node.ctx, ast.Load):
                    used_since.add(node.id)
            if isinstance(stmt, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                name = stmt.name
                has_decorators = bool(stmt.decorator_list)
                if name in seen and name not in used_since and not has_decorators:
                    self.findings.append(
                        (
                            stmt.lineno,
                            "F811",
                            f"redefinition of unused `{name}` (first defined line {seen[name]})",
                        )
                    )
                seen[name] = stmt.lineno
                used_since.discard(name)

    # -- mutable defaults ---------------------------------------------------
    def _check_mutable_defaults(self, fn):
        for d in list(fn.args.defaults) + [d for d in fn.args.kw_defaults if d]:
            if isinstance(d, (ast.List, ast.Dict, ast.Set)):
                self.findings.append(
                    (d.lineno, "B006", f"mutable default argument in `{fn.name}`")
                )

    # -- `is` with literal ---------------------------------------------------
    def _check_is_literal(self, node: ast.Compare):
        for op, comp in zip(node.ops, node.comparators):
            if isinstance(op, (ast.Is, ast.IsNot)):
                if isinstance(comp, ast.Constant) and isinstance(
                    comp.value, (str, int, float, bytes)
                ) and not isinstance(comp.value, bool):
                    self.findings.append(
                        (node.lineno, "F632", "`is` comparison with a literal")
                    )


def lint_file(path: Path) -> list[str]:
    src = path.read_text()
    noqa = _noqa_lines(src)
    out: list[str] = []
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always", SyntaxWarning)
        try:
            tree = ast.parse(src, filename=str(path))
        except SyntaxError as e:
            return [f"{path}:{e.lineno}: E999 syntax error: {e.msg}"]
    for w in caught:
        if "invalid escape sequence" in str(w.message):
            lineno = getattr(w, "lineno", 0) or 0
            if lineno not in noqa:
                out.append(f"{path}:{lineno}: W605 {w.message}")

    checker = _ScopeChecker()
    checker.check_module(tree)
    for lineno, code, msg in sorted(checker.findings):
        tag = noqa.get(lineno)
        if tag is not None and (tag == "" or code in tag):
            continue
        out.append(f"{path}:{lineno}: {code} {msg}")
    return out


def main(argv: list[str]) -> int:
    targets = [Path(a) for a in argv] if argv else DEFAULT_TARGETS
    files: list[Path] = []
    for t in targets:
        if t.is_dir():
            files.extend(sorted(t.rglob("*.py")))
        elif t.suffix == ".py":
            files.append(t)
    findings: list[str] = []
    for f in files:
        findings.extend(lint_file(f))
    for line in findings:
        print(line)
    print(f"lint: {len(files)} files, {len(findings)} finding(s)")
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
