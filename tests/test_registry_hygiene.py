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


def _registered_names(path) -> set[str]:
    """Names passed as the first arg of @register(...) in a file."""
    tree = ast.parse(open(path).read())
    names = set()
    for node in ast.walk(tree):
        for dec in getattr(node, "decorator_list", []):
            if (
                isinstance(dec, ast.Call)
                and getattr(dec.func, "id", "") == "register"
                and dec.args
                and isinstance(dec.args[0], ast.Constant)
            ):
                names.add(dec.args[0].value)
    return names


def test_query_homing_locked():
    """Queries live in the registry module of their DOMAIN (VERDICT r7
    #5: `user_cohort_retention` sat in registry_similarity for four
    rounds). Lock the re-homed entries, and mechanically forbid the
    known cross-domain drift classes: no event-analytics rollups in the
    similarity registry, and no query registered twice anywhere."""
    by_file = {
        os.path.basename(p): _registered_names(p) for p in REGISTRY_FILES
    }
    events = by_file.get("registry_events.py", set())
    similarity = by_file.get("registry_similarity.py", set())
    # the re-homed entry and the operator query it is subsumed by
    assert "user_cohort_retention" in events
    assert "events_retention_cohorts" in events
    assert "user_cohort_retention" not in similarity
    # similarity must hold no cohort/retention/funnel rollups at all
    strays = {
        n for n in similarity
        if any(k in n for k in ("cohort", "retention", "funnel", "sessionize"))
    }
    assert not strays, f"event-analytics queries in registry_similarity: {strays}"
    # and a name registered in two files is a latent last-import-wins bug
    seen: dict[str, str] = {}
    dups = []
    for fname, names in sorted(by_file.items()):
        for n in names:
            if n in seen:
                dups.append(f"{n} ({seen[n]} and {fname})")
            seen[n] = fname
    assert not dups, f"queries registered in two files: {dups}"
