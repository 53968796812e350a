#!/usr/bin/env python
"""Minimal dependency-free linter (the environment has no ruff/flake8).

CI-parity with the reference's clippy gate (.github/workflows/ci.yml:4-12,
`cargo clippy -D warnings`): fails the build on
  - syntax errors (via ast.parse)
  - unused imports (module scope)
  - bare `assert` statements inside the public API module (typed errors
    required there; reference denies unwrap/expect outside tests,
    src/lib.rs:1-39)

Run: python scripts/lint.py   (exit 0 = clean)
"""

from __future__ import annotations

import ast
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
PKG = ROOT / "aes_zero_knowledge_proof_circuit_tpu"
NO_ASSERT = {PKG / "api.py"}


def _imported_names(tree: ast.Module):
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                yield node, a, (a.asname or a.name.split(".")[0])
        elif isinstance(node, ast.ImportFrom):
            for a in node.names:
                if a.name == "*":
                    continue
                yield node, a, (a.asname or a.name)


def _used_names(tree: ast.Module) -> set:
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            n = node
            while isinstance(n, ast.Attribute):
                n = n.value
            if isinstance(n, ast.Name):
                used.add(n.id)
    # names re-exported via __all__ strings count as used
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id == "__all__":
                    for el in ast.walk(node.value):
                        if isinstance(el, ast.Constant) and isinstance(
                                el.value, str):
                            used.add(el.value)
    return used


def lint_file(path: pathlib.Path) -> list:
    problems = []
    src = path.read_text()
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: syntax error: {e.msg}"]
    used = _used_names(tree)
    for node, alias, bound in _imported_names(tree):
        if bound == "annotations":
            continue
        if bound not in used:
            problems.append(
                f"{path}:{node.lineno}: unused import '{bound}'"
            )
    if path in NO_ASSERT:
        for node in ast.walk(tree):
            if isinstance(node, ast.Assert):
                problems.append(
                    f"{path}:{node.lineno}: bare assert in public API "
                    "(raise a typed ZkAesError instead)"
                )
    return problems


def main() -> int:
    targets = sorted(PKG.rglob("*.py")) + sorted(
        (ROOT / "scripts").glob("*.py")
    ) + [ROOT / "bench.py", ROOT / "__graft_entry__.py"]
    problems = []
    for path in targets:
        if "__pycache__" in str(path):
            continue
        problems.extend(lint_file(path))
    for p in problems:
        print(p)
    print(f"lint: {len(problems)} problem(s) in {len(targets)} files")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
