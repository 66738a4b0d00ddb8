#!/usr/bin/env python
"""Offline hygiene linter (the runnable face of .pre-commit-config.yaml).

The reference gates commits on black + ruff at line length 100 plus the
standard pre-commit hygiene hooks (`.pre-commit-config.yaml:1-34`); this
environment has no network to install those, so this checker enforces the
same observable surface with the standard library only:

  * line length <= 100 (ruff/black E501 surface; URLs in comments exempt)
  * no trailing whitespace, no tabs in indentation
  * files end with exactly one newline
  * syntax-valid Python (ast parse)
  * unused top-level imports (ruff F401), with __init__ re-export exemption

Exit 0 = clean.  Run directly (``python scripts/lint.py``) or via the local
pre-commit hook.
"""

import ast
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
TARGETS = ["ba_path_planning_tpu", "tests", "scripts", "bench.py",
           "__graft_entry__.py", "conftest.py"]
MAX_LEN = 100


def iter_files():
    for t in TARGETS:
        p = ROOT / t
        if p.is_file():
            yield p
        else:
            yield from sorted(p.rglob("*.py"))


def check_file(path: Path) -> list[str]:
    errors = []
    rel = path.relative_to(ROOT)
    text = path.read_text()
    lines = text.split("\n")
    for i, line in enumerate(lines, 1):
        if len(line) > MAX_LEN and "http" not in line:
            errors.append(f"{rel}:{i}: line too long ({len(line)} > {MAX_LEN})")
        if line != line.rstrip():
            errors.append(f"{rel}:{i}: trailing whitespace")
        stripped = line.lstrip(" ")
        if stripped.startswith("\t"):
            errors.append(f"{rel}:{i}: tab in indentation")
    if text and not text.endswith("\n"):
        errors.append(f"{rel}: missing final newline")
    if text.endswith("\n\n"):
        errors.append(f"{rel}: multiple trailing newlines")

    try:
        tree = ast.parse(text)
    except SyntaxError as e:
        errors.append(f"{rel}:{e.lineno}: syntax error: {e.msg}")
        return errors

    if path.name != "__init__.py":
        errors.extend(f"{rel}:{ln}: unused import '{name}'"
                      for name, ln in unused_imports(tree, text))
    return errors


def unused_imports(tree: ast.AST, text: str) -> list[tuple[str, int]]:
    imported: dict[str, int] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                name = (a.asname or a.name).split(".")[0]
                imported[name] = node.lineno
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue
            for a in node.names:
                if a.name == "*":
                    continue
                imported[a.asname or a.name] = node.lineno
    used = {n.id for n in ast.walk(tree) if isinstance(n, ast.Name)}
    used |= {n.attr for n in ast.walk(tree) if isinstance(n, ast.Attribute)}
    # attribute chains only record the leaf; scan identifiers textually too
    # (covers usage inside docstrings' doctest blocks and __all__ strings)
    out = []
    for name, ln in imported.items():
        if name in used or f"{name}." in text.replace(f"import {name}", ""):
            continue
        if name.startswith("_") or f'"{name}"' in text or f"'{name}'" in text:
            continue
        out.append((name, ln))
    return out


def main() -> int:
    all_errors = []
    n = 0
    for f in iter_files():
        n += 1
        all_errors.extend(check_file(f))
    for e in all_errors:
        print(e)
    print(f"lint: {n} files checked, {len(all_errors)} issue(s)",
          file=sys.stderr)
    return 1 if all_errors else 0


if __name__ == "__main__":
    sys.exit(main())
