"""Static architecture-invariant gates (CLAUDE.md contracts).

The runtime package must not depend on torch: CLAUDE.md pins "all torch
imports happen in speechclip_tpu/convert/ and tests only" (torch is a
checkpoint-reading and test-oracle tool, never a runtime dependency —
README "no torch at runtime"). This walks every source file with ast so a
function-local ``import torch`` cannot slip past a grep for the module
header.
"""

import ast
import os

import speechclip_tpu

PKG_ROOT = os.path.dirname(speechclip_tpu.__file__)


def _imported_module_roots(path):
    with open(path) as f:
        tree = ast.parse(f.read(), filename=path)
    roots = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                roots.add(alias.name.split(".")[0])
        elif isinstance(node, ast.ImportFrom):
            if node.module and node.level == 0:
                roots.add(node.module.split(".")[0])
    return roots


def test_no_torch_outside_convert():
    offenders = []
    for dirpath, _dirs, files in os.walk(PKG_ROOT):
        rel = os.path.relpath(dirpath, PKG_ROOT)
        if rel.split(os.sep)[0] in ("convert", "__pycache__"):
            continue
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(dirpath, fname)
            if "torch" in _imported_module_roots(path):
                offenders.append(os.path.relpath(path, PKG_ROOT))
    assert not offenders, (
        f"torch imported outside speechclip_tpu/convert/: {offenders} — "
        "torch is a conversion/test-oracle dependency only (CLAUDE.md)"
    )


def test_convert_is_not_imported_by_runtime_module_level():
    """convert/ (the only torch-importing subpackage) must only be reached
    lazily — a module-level ``from .convert import ...`` anywhere else
    would make torch a transitive import of the runtime package."""
    offenders = []
    for dirpath, _dirs, files in os.walk(PKG_ROOT):
        rel = os.path.relpath(dirpath, PKG_ROOT)
        if rel.split(os.sep)[0] in ("convert", "__pycache__"):
            continue
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(dirpath, fname)
            with open(path) as f:
                tree = ast.parse(f.read(), filename=path)
            # only MODULE-level statements (lazy in-function imports are the
            # sanctioned pattern, e.g. load_any_checkpoint)
            for node in tree.body:
                mods = []
                if isinstance(node, ast.Import):
                    mods = [a.name for a in node.names]
                elif isinstance(node, ast.ImportFrom) and node.module:
                    mods = [node.module]
                for m in mods:
                    if "convert" in m.split("."):
                        offenders.append(os.path.relpath(path, PKG_ROOT))
    assert not offenders, (
        f"module-level import of speechclip_tpu.convert from: {offenders}"
    )
