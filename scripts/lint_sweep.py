"""AST lint sweep (no third-party linters in this image): duplicate
imports, unused imports, and duplicate top-level def/class names.

Report-only; exit 1 if any finding.  r3 verdict item 7 — the
`core/tiler.py` duplicate-import residue motivated a repo-wide pass.

Usage: python scripts/lint_sweep.py [paths...]   (default: unmicst_tpu/
tests/ scripts/ bench.py __graft_entry__.py)
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path


def imported_names(node: ast.AST):
    """Yield (local_name, canonical_import_key) for an import node."""
    if isinstance(node, ast.Import):
        for a in node.names:
            yield (a.asname or a.name.split(".")[0], f"import {a.name}")
    elif isinstance(node, ast.ImportFrom):
        mod = "." * node.level + (node.module or "")
        for a in node.names:
            yield (a.asname or a.name, f"from {mod} import {a.name}")


def check_file(path: Path) -> list:
    src = path.read_text()
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: syntax error: {e.msg}"]
    findings = []

    # duplicate MODULE-LEVEL import statements (same canonical key
    # twice).  Function-local re-imports are a deliberate pattern in
    # tests/scripts (standalone snippets) and are not flagged.
    seen = {}
    imports = []  # (local_name, lineno, in_try)
    module_nodes = list(tree.body)
    for node in tree.body:
        if isinstance(node, ast.Try):  # optional-dependency guards
            module_nodes.extend(node.body)
    for node in module_nodes:
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            in_try = node not in tree.body
            for local, key in imported_names(node):
                if key in seen and not in_try:
                    findings.append(
                        f"{path}:{node.lineno}: duplicate import "
                        f"({key!r}, first at line {seen[key]})"
                    )
                seen.setdefault(key, node.lineno)
                imports.append((local, node.lineno, in_try))

    # unused imports: module-level only, skip __init__.py (re-export
    # surface), skip names used in __all__ or string annotations
    if path.name != "__init__.py":
        used = set()
        for node in ast.walk(tree):
            if isinstance(node, ast.Name):
                used.add(node.id)
            elif isinstance(node, ast.Attribute):
                pass  # base captured via its Name node
        for s in ast.walk(tree):
            if isinstance(s, ast.Constant) and isinstance(s.value, str):
                used.update(s.value.replace(".", " ").split())
        for local, lineno, in_try in imports:
            if local in ("annotations", "*") or in_try:
                continue
            if local not in used:
                findings.append(f"{path}:{lineno}: unused import {local!r}")

    # duplicate top-level def/class names (shadowing)
    top = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            if node.name in top:
                findings.append(
                    f"{path}:{node.lineno}: duplicate top-level def "
                    f"{node.name!r} (first at line {top[node.name]})"
                )
            top[node.name] = node.lineno
    return findings


def main(argv: list) -> int:
    roots = argv or [
        "unmicst_tpu", "tests", "scripts", "bench.py", "__graft_entry__.py"
    ]
    files = []
    for r in roots:
        p = Path(r)
        files.extend(sorted(p.rglob("*.py")) if p.is_dir() else [p])
    all_findings = []
    for f in files:
        all_findings.extend(check_file(f))
    for line in all_findings:
        print(line)
    print(f"-- lint_sweep: {len(files)} files, {len(all_findings)} findings")
    return 1 if all_findings else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
