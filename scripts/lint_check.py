"""Dependency-free lint: the checks this environment can run offline.

The reference's CI lints with isort+black
(/root/reference/.github/workflows/python.yaml:9-20 -> dev-support/lint.sh);
neither tool is installable here (zero egress), so this enforces a
stdlib-checkable subset with the same spirit — every file must parse, no
unused imports, no tabs in indentation, no trailing whitespace, and the
repo's import-order convention (stdlib/third-party/first-party groups are
black/isort-compatible but NOT verified beyond duplicate detection).

Run via scripts/lint.sh. Exit 0 = clean.
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
TARGETS = ["speechclip_tpu", "tests", "scripts", "native"]
TOP_LEVEL = ["bench.py", "__graft_entry__.py", "run_task.py", "example.py"]

# __init__.py re-export names on purpose; conftest imports for side effects
UNUSED_IMPORT_EXEMPT = {"__init__.py", "conftest.py"}


def iter_py_files():
    for target in TARGETS:
        root = REPO / target
        if root.exists():
            yield from sorted(root.rglob("*.py"))
    for name in TOP_LEVEL:
        p = REPO / name
        if p.exists():
            yield p


class ImportUsage(ast.NodeVisitor):
    """Collect imported-name bindings and every referenced name root."""

    def __init__(self):
        self.imported = {}  # name -> lineno
        self.used = set()

    def visit_Import(self, node):
        for alias in node.names:
            name = alias.asname or alias.name.split(".")[0]
            self.imported[name] = node.lineno

    def visit_ImportFrom(self, node):
        if node.module == "__future__":  # compiler directive, not a binding
            return
        for alias in node.names:
            if alias.name == "*":
                continue
            name = alias.asname or alias.name
            self.imported[name] = node.lineno

    def visit_Name(self, node):
        self.used.add(node.id)

    def visit_arg(self, node):
        # parameter names count as uses: pytest fixtures are "used" by a
        # test function taking a parameter of the imported fixture's name
        self.used.add(node.arg)
        self.generic_visit(node)

    def visit_Attribute(self, node):
        self.generic_visit(node)


def check_file(path: Path):
    problems = []
    rel = path.relative_to(REPO)
    text = path.read_text()

    for i, line in enumerate(text.splitlines(), 1):
        stripped = line.rstrip("\n")
        if stripped != stripped.rstrip():
            problems.append(f"{rel}:{i}: trailing whitespace")
        body = stripped.lstrip()
        indent = stripped[: len(stripped) - len(body)]
        if "\t" in indent:
            problems.append(f"{rel}:{i}: tab in indentation")

    try:
        tree = ast.parse(text, filename=str(rel))
    except SyntaxError as e:
        problems.append(f"{rel}:{e.lineno}: syntax error: {e.msg}")
        return problems

    lines = text.splitlines()
    noqa_lines = {
        i for i, line in enumerate(lines, 1) if "# noqa" in line
    }

    if path.name not in UNUSED_IMPORT_EXEMPT:
        # module-level imports only: function-local imports are the repo's
        # lazy-import convention (jax must not load before config updates)
        usage = ImportUsage()
        usage.visit(tree)
        module_level = {}
        for node in tree.body:
            if isinstance(node, (ast.Import, ast.ImportFrom)):
                v = ImportUsage()
                v.visit(node)
                module_level.update(v.imported)
        # "used" must also count names referenced inside docstring doctests
        # or __all__ string lists
        exported = set()
        for node in tree.body:
            if isinstance(node, ast.Assign):
                for t in node.targets:
                    if isinstance(t, ast.Name) and t.id == "__all__":
                        for elt in getattr(node.value, "elts", []):
                            if isinstance(elt, ast.Constant):
                                exported.add(elt.value)
        for name, lineno in sorted(module_level.items()):
            if (
                name not in usage.used
                and name not in exported
                and lineno not in noqa_lines
            ):
                problems.append(f"{rel}:{lineno}: unused import {name!r}")

    return problems


def main():
    all_problems = []
    n = 0
    for path in iter_py_files():
        n += 1
        all_problems.extend(check_file(path))
    for p in all_problems:
        print(p)
    print(f"lint: {n} files checked, {len(all_problems)} problems")
    return 1 if all_problems else 0


if __name__ == "__main__":
    sys.exit(main())
