#!/usr/bin/env python
"""Stdlib fallback linter: a small ruff subset for offline images.

`scripts/check.sh` prefers real ruff (`[tool.ruff]` in pyproject.toml,
dev-tooling parity with `/root/reference/pyproject.toml:63-73`); this
AST-based checker covers the highest-signal rules when ruff isn't
installable (no egress):

  F401  unused import (module scope; `__init__.py` re-exports exempt)
  F811  redefinition of an imported name by another import
  F541  f-string without placeholders
  E722  bare `except:`
  B006  mutable default argument
  W605  invalid escape sequence (via compile() SyntaxWarning)

Exit status 1 if any finding (or syntax error) is reported.
"""

from __future__ import annotations

import ast
import sys
import warnings
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
TARGETS = ["yolox_tpu", "tests", "scripts", "bench.py", "__graft_entry__.py"]
MUTABLE = (ast.List, ast.Dict, ast.Set, ast.ListComp, ast.DictComp,
           ast.SetComp)


def _imported_names(tree: ast.Module):
    """(lineno, asname) for every module-scope import binding."""
    out = []
    for node in tree.body:
        if isinstance(node, ast.Import):
            for a in node.names:
                out.append((node.lineno, a.asname or a.name.split(".")[0]))
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue
            for a in node.names:
                if a.name != "*":
                    out.append((node.lineno, a.asname or a.name))
    return out


def _used_names(tree: ast.AST):
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            # pick up dotted roots like `os.path` -> `os`
            n = node
            while isinstance(n, ast.Attribute):
                n = n.value
            if isinstance(n, ast.Name):
                used.add(n.id)
    return used


def check_file(path: Path):
    findings = []
    src = path.read_text()
    try:
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always", SyntaxWarning)
            compile(src, str(path), "exec")
        for w in caught:
            if "invalid escape sequence" in str(w.message):
                findings.append((w.lineno or 0, "W605", str(w.message)))
        tree = ast.parse(src, str(path))
    except SyntaxError as e:
        return [(e.lineno or 0, "E999", f"syntax error: {e.msg}")]

    dunder_all = set()
    for node in tree.body:
        if (isinstance(node, ast.Assign) and len(node.targets) == 1
                and isinstance(node.targets[0], ast.Name)
                and node.targets[0].id == "__all__"
                and isinstance(node.value, (ast.List, ast.Tuple))):
            dunder_all = {e.value for e in node.value.elts
                          if isinstance(e, ast.Constant)}

    if path.name != "__init__.py":
        used = _used_names(tree)
        seen: dict[str, int] = {}
        for lineno, name in _imported_names(tree):
            if name in seen:
                findings.append(
                    (lineno, "F811",
                     f"redefinition of `{name}` (first import line "
                     f"{seen[name]})"))
            seen[name] = lineno
            if name not in used and name not in dunder_all:
                findings.append((lineno, "F401", f"unused import `{name}`"))

    # format specs ({x:.4f}) are themselves JoinedStr nodes in py3.12 —
    # not user-written f-strings, exempt from F541
    spec_ids = {id(n.format_spec) for n in ast.walk(tree)
                if isinstance(n, ast.FormattedValue) and n.format_spec}
    for node in ast.walk(tree):
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            findings.append((node.lineno, "E722", "bare `except:`"))
        elif isinstance(node, ast.JoinedStr) and id(node) not in spec_ids:
            if not any(isinstance(v, ast.FormattedValue)
                       for v in node.values):
                findings.append(
                    (node.lineno, "F541", "f-string without placeholders"))
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for d in (node.args.defaults
                      + [d for d in node.args.kw_defaults if d]):
                if isinstance(d, MUTABLE):
                    findings.append(
                        (d.lineno, "B006",
                         f"mutable default argument in `{node.name}`"))
    return findings


def main() -> int:
    paths = []
    for t in TARGETS:
        p = ROOT / t
        paths.extend(sorted(p.rglob("*.py")) if p.is_dir() else [p])
    n = 0
    for path in paths:
        for lineno, code, msg in check_file(path):
            print(f"{path.relative_to(ROOT)}:{lineno}: {code} {msg}")
            n += 1
    print(f"lint_lite: {n} finding(s) in {len(paths)} files")
    return 1 if n else 0


if __name__ == "__main__":
    sys.exit(main())
