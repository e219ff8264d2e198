"""Plan audit: assert that the physical plan Catalyst picked is the plan
the engine is designed around — filters reach the parquet scan,
dimension joins broadcast, aggregations have a map-side partial phase.

Scale rationale (SURVEY.md §4): on 100 TB these properties are the
difference between scanning columns of matching row groups and scanning
the table; tests pin them so an innocent refactor can't silently turn a
broadcast join into a 600-partition shuffle."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lists from every scan node in the plan."""
    txt = explain_str(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", txt)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def has_partial_agg(df: DataFrame) -> bool:
    txt = explain_str(df)
    return "partial_" in txt  # partial_count / partial_sum / ...


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Column sets actually read by each scan (projection pruning)."""
    txt = explain_str(df)
    out = []
    for m in re.findall(r"ReadSchema: struct<([^>]*)>", txt):
        cols = {c.split(":")[0].strip() for c in m.split(",") if c.strip()}
        out.append(cols)
    return out


# Logical nodes that bound the row count flowing into a global window:
# a limit caps it outright; an aggregate reduces to |group keys| (every
# engine site ranks a post-agg leaderboard or a top-K cut, never a fact
# table). Local/OneRow relations are driver-literal leaves.
_BOUNDING = {"GlobalLimit", "LocalLimit", "Aggregate"}
_BOUNDED_LEAVES = {"LocalRelation", "OneRowRelation"}


def _subtree_bounded(node) -> bool:
    name = node.getClass().getSimpleName()
    if name in _BOUNDING:
        return True
    n = node.children().size()
    if n == 0:
        return name in _BOUNDED_LEAVES
    return all(_subtree_bounded(node.children().apply(i)) for i in range(n))


def unbounded_global_windows(df: DataFrame) -> list[str]:
    """Zero-partition Window nodes whose input is NOT provably bounded
    by a limit/aggregate on every path to a leaf — the one window shape
    that silently becomes a single-task global sort over a fact table
    at 100 TB. The engine's rule: an empty-partition window may only
    rank an already-bounded frame (top-K after limit, post-agg
    leaderboard); this walker pins that invariant on the optimized
    logical plan (VERDICT r3 item 3)."""
    out: list[str] = []

    def walk(node) -> None:
        name = node.getClass().getSimpleName()
        if name == "Window" and node.partitionSpec().size() == 0:
            child = node.children().apply(0)
            if not _subtree_bounded(child):
                out.append(node.simpleString(25))
        for i in range(node.children().size()):
            walk(node.children().apply(i))

    walk(df._jdf.queryExecution().optimizedPlan())
    return out


def _subtree_bound_kind(node) -> str:
    """Strongest claim provable for every path from `node` to a leaf:
    'limit' (every path hits a limit or a literal leaf before anything
    else), 'aggregate' (bounded, but at least one path's bounding node
    is an Aggregate — the bound is then |grouping keys|, which is only
    a real bound when the key grain is constant-cardinality), or
    'unbounded'."""
    name = node.getClass().getSimpleName()
    if name in ("GlobalLimit", "LocalLimit"):
        return "limit"
    if name == "Aggregate":
        return "aggregate"
    n = node.children().size()
    if n == 0:
        return "limit" if name in _BOUNDED_LEAVES else "unbounded"
    kinds = {_subtree_bound_kind(node.children().apply(i)) for i in range(n)}
    if "unbounded" in kinds:
        return "unbounded"
    return "aggregate" if "aggregate" in kinds else "limit"


def global_window_bounds(df: DataFrame) -> list[tuple[str, str]]:
    """(bound_kind, node description) for every zero-partition Window in
    the optimized plan. 'unbounded' is always a violation (the existing
    invariant); 'aggregate' is only safe when the grouping grain is a
    DOCUMENTED constant-cardinality bound (value lattice, score grain,
    day grain) — plan_audit enforces that via the GLOBAL_WINDOW_OK
    allowlist (VERDICT r10 item 6: the exemption used to live in
    per-op docstrings, so a future op could silently inherit it)."""
    out: list[tuple[str, str]] = []

    def walk(node) -> None:
        name = node.getClass().getSimpleName()
        if name == "Window" and node.partitionSpec().size() == 0:
            out.append(
                (_subtree_bound_kind(node.children().apply(0)),
                 node.simpleString(25))
            )
        for i in range(node.children().size()):
            walk(node.children().apply(i))

    walk(df._jdf.queryExecution().optimizedPlan())
    return out


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange nodes (broadcast exchanges excluded) —
    the scale-cost signature of a plan."""
    txt = explain_str(df, "simple")
    return len(re.findall(r"(?<!Broadcast)Exchange (?:hash|range|Single)", txt))
