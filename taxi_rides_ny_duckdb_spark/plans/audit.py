"""Physical-plan audits — scale-hazard detection as a library feature.

The q4/q9 lesson (BASELINE.md sf1 checkpoint; VERDICT r5): Catalyst's
size estimator prices a 2-3-column projection of a FACT table by its
pruned on-disk bytes, which at small SF sits under
``autoBroadcastJoinThreshold`` — so the optimizer happily builds a
hashed relation of what is, at 100 TB, the biggest table in the
cluster. The estimate is superlinear-wrong (18× at sf1 for q4) because
the hashed relation holds deserialized rows + hash overhead, not
parquet-compressed bytes. The fix is a per-join ``merge`` hint; THIS
module is the guard that finds the joins that still need one.

``broadcast_fact_builds`` walks the executed SparkPlan (via py4j) and
returns every broadcast join whose BUILD side reads a named fact table
without an intervening aggregation. An aggregation node bounds the
build side's cardinality by its grouping keys, so e.g. q11's 1-row
global aggregate over lineitem or q15's per-supplier revenue are NOT
flagged — those broadcasts are size-bounded by construction and remain
correct at any scale (per-key aggregates are dim-sized, not
fact-sized). A RAW fact scan on a build side is flagged always: there
is no scale at which broadcasting an unaggregated fact is the plan you
want.

Use in deployment the same way the test suite uses it: audit every
production plan once per release; any non-empty result is a
regression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Tables that scale linearly with the data volume — never broadcastable raw.
DEFAULT_FACTS: tuple[str, ...] = ("lineitem", "orders", "events", "documents", "embeddings")

_BROADCAST_JOINS = ("BroadcastHashJoinExec", "BroadcastNestedLoopJoinExec")


def _children(node) -> list:
    seq = node.children()
    return [seq.apply(i) for i in range(seq.size())]


def _raw_fact_scans(node, facts: tuple[str, ...]) -> set[str]:
    """Fact tables scanned in this subtree with no aggregation between
    the scan and the subtree root (DFS that stops at Aggregate nodes)."""
    hits: set[str] = set()
    stack = [node]
    while stack:
        n = stack.pop()
        cls = n.getClass().getSimpleName()
        if "Aggregate" in cls:
            continue  # cardinality bounded by grouping keys below here
        if "Scan" in cls or not _children(n):
            text = n.toString()
            for t in facts:
                if f"{t}.parquet" in text or f"/{t}]" in text:
                    hits.add(t)
            continue
        stack.extend(_children(n))
    return hits


def broadcast_fact_builds(
    df: DataFrame, facts: tuple[str, ...] = DEFAULT_FACTS
) -> list[tuple[str, set[str]]]:
    """Return ``(join_class, {fact tables})`` for every broadcast join
    in ``df``'s executed plan whose build side reads a fact table raw
    (no aggregation boundary). Empty list ⇔ the plan is free of the
    narrow-projection broadcast hazard."""
    plan = df._jdf.queryExecution().executedPlan()
    out: list[tuple[str, set[str]]] = []
    stack = [plan]
    while stack:
        n = stack.pop()
        cls = n.getClass().getSimpleName()
        if cls in _BROADCAST_JOINS:
            kids = _children(n)
            if len(kids) == 2:
                side = n.buildSide().toString()
                build = kids[0] if "BuildLeft" in side else kids[1]
                found = _raw_fact_scans(build, facts)
                if found:
                    out.append((cls, found))
        stack.extend(_children(n))
    return out
