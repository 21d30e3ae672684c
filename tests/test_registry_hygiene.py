"""Registry-module hygiene: the consolidated domain modules concatenate
many former batches, so a later section redefining an earlier section's
module-level helper silently wins at QUERY RUNTIME while each oracle
froze its own value at decoration time — a guaranteed hash mismatch
(bit us twice in round 5: _LATE_DAYS across TPC-H batches,
_PACK_BUDGET across packing batches). These checks make the collision
class a test failure instead of a driver-round surprise. Pure AST —
no Spark session needed."""

from __future__ import annotations

import ast
import glob
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REGISTRY_FILES = sorted(
    f
    for f in glob.glob(os.path.join(REPO, "datas_spark", "registry_*.py"))
    if not f.endswith("registry_core.py")
) + [os.path.join(REPO, "datas_spark", "registry.py")]


@pytest.mark.parametrize(
    "path", REGISTRY_FILES, ids=[os.path.basename(p) for p in REGISTRY_FILES]
)
def test_no_duplicate_toplevel_definitions(path):
    tree = ast.parse(open(path).read())
    seen: dict[str, int] = {}
    dups = []
    for node in tree.body:
        names = []
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            names = [node.name]
        elif isinstance(node, ast.Assign):
            names = [t.id for t in node.targets if isinstance(t, ast.Name)]
        for n in names:
            if n in seen:
                dups.append(f"{n} (lines {seen[n]} and {node.lineno})")
            seen[n] = node.lineno
    assert not dups, (
        f"{os.path.basename(path)} redefines module-level names — the last "
        f"binding wins at query runtime while oracles froze their own: {dups}"
    )


@pytest.mark.parametrize(
    "path", REGISTRY_FILES, ids=[os.path.basename(p) for p in REGISTRY_FILES]
)
def test_no_conflicting_import_aliases(path):
    tree = ast.parse(open(path).read())
    bound: dict[str, str] = {}
    conflicts = []
    for node in ast.walk(tree):
        pairs = []
        if isinstance(node, ast.ImportFrom):
            pairs = [(a.asname or a.name, f"{node.module}.{a.name}") for a in node.names]
        elif isinstance(node, ast.Import):
            pairs = [(a.asname or a.name.split(".")[0], a.name) for a in node.names]
        for name, target in pairs:
            if name in bound and bound[name] != target:
                conflicts.append(
                    f"{name}: {bound[name]} vs {target} (line {node.lineno})"
                )
            bound[name] = target
    assert not conflicts, (
        f"{os.path.basename(path)} rebinds an import alias to a different "
        f"target — runtime name lookups take the LAST binding: {conflicts}"
    )
