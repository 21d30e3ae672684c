"""Executed-plan auditing: walk Spark's physical plan (through AQE
wrappers) and report the properties that decide whether a query
survives a 100× scale-up.

Why this is engine code and not just test code: a pipeline that
composes operators into new plans wants the same regression gates the
repo's own registry has (``tests/test_plans.py`` consumes exactly
these helpers). Everything here is read-only introspection over
``df._jdf.queryExecution()`` — no execution is triggered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = [
    "plan_text",
    "walk_plan",
    "has_node",
    "global_window_violations",
    "scan_info",
    "shuffle_count",
    "broadcast_join_count",
]


def plan_text(df: DataFrame) -> str:
    """The executed (physical) plan as text — what ``explain()`` prints
    for the final plan, capturable for assertions."""
    return df._jdf.queryExecution().executedPlan().toString()


def walk_plan(node):
    """Yield every physical node, descending through AQE wrappers
    (AdaptiveSparkPlanExec hides the real tree in ``initialPlan``)."""
    yield node
    if node.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        yield from walk_plan(node.initialPlan())
        return
    for i in range(node.children().length()):
        yield from walk_plan(node.children().apply(i))


def _root(df: DataFrame):
    return df._jdf.queryExecution().executedPlan()


def has_node(df: DataFrame, simple_name: str) -> bool:
    """True if any physical node's class simple name matches."""
    return any(
        nd.getClass().getSimpleName() == simple_name for nd in walk_plan(_root(df))
    )


def _has_aggregate_below(node) -> bool:
    first = True
    for nd in walk_plan(node):
        if first:
            first = False
            continue
        if "Aggregate" in nd.getClass().getSimpleName():
            return True
    return False


def global_window_violations(df: DataFrame) -> list[str]:
    """Partition-less WindowExec nodes ranking RAW rows — the
    single-reducer scale killer. A partition-less window is acceptable
    only above an aggregate (it then orders |groups| metadata rows,
    not data)."""
    bad = []
    for nd in walk_plan(_root(df)):
        if nd.getClass().getSimpleName() in ("WindowExec", "WindowGroupLimitExec"):
            if nd.partitionSpec().isEmpty() and not _has_aggregate_below(nd):
                bad.append(nd.getClass().getSimpleName())
    return bad


def scan_info(df: DataFrame) -> list[dict]:
    """Per parquet scan: the pushed filters and read schema — the two
    lines that tell you whether predicate pushdown and column pruning
    actually reached the file format."""
    out = []
    for line in plan_text(df).splitlines():
        s = line.strip()
        if "PushedFilters:" not in s and "ReadSchema:" not in s:
            continue
        # FileScan renders as one long line: "... PushedFilters: [...],
        # ReadSchema: struct<...>" — split both out of the same line
        entry = {}
        if "PushedFilters:" in s:
            rest = s.split("PushedFilters:", 1)[1]
            entry["pushed_filters"] = rest.split("ReadSchema:", 1)[0].strip().rstrip(",")
        if "ReadSchema:" in s:
            entry["read_schema"] = s.split("ReadSchema:", 1)[1].strip()
        out.append(entry)
    return out


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan — each is a full
    materialize-and-repartition of its input; the first number to
    stare at when a query is slower than it should be."""
    return sum(
        1
        for nd in walk_plan(_root(df))
        if nd.getClass().getSimpleName() == "ShuffleExchangeExec"
    )


def broadcast_join_count(df: DataFrame) -> int:
    """Number of broadcast hash joins — the joins that DIDN'T shuffle
    their big side."""
    return sum(
        1
        for nd in walk_plan(_root(df))
        if nd.getClass().getSimpleName() == "BroadcastHashJoinExec"
    )
