"""Unpartitioned-window plan guard.

A ``WindowExec`` with no partition spec executes its frame in ONE task —
fine when the frame is census-bounded (the repo's documented envelope:
order statistics over a value census, bucketed cumulatives over
``O(buckets)`` rows, RRF over a ``limit(top_n)`` candidate list), fatal
when it sneaks over a raw SF-growing frame (a single task sorting the
corpus). A full replica run emits ~700 benign
``WindowExec: No Partition Defined`` warnings, so a real regression
would hide in the noise (VERDICT r6 item 4); this module walks the
OPTIMIZED LOGICAL plan instead and mechanically verifies that every
partition-less Window sits above a bounding node.

Bounding rules (every leaf-path below the window must satisfy one):

- passes through an ``Aggregate`` — output rows are bounded by
  group/value cardinality, the census discipline;
- passes through a ``GlobalLimit``/``LocalLimit`` — bounded by the
  literal limit (the TakeOrdered-then-rank candidate-list shape);
- terminates in a ``LocalRelation``/``OneRowRelation``/``Range`` leaf —
  driver-literal data;
- terminates in a ``LogicalRDD`` leaf — in this repo these arise ONLY
  from ``spark.createDataFrame`` of collected model-sized results
  (codebooks, bin tables, centroid tables), which are bounded by
  design and documented at each call site.

Anything else — a partition-less Window whose subtree reaches a file
relation without an intervening Aggregate/Limit — is a violation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: nodes that bound the row count of everything above them
_BOUNDING_NODES = {"Aggregate", "GlobalLimit", "LocalLimit"}

#: leaves that are driver-local / model-sized by construction
_BOUNDED_LEAVES = {"LocalRelation", "OneRowRelation", "Range", "LogicalRDD"}


def _simple_name(node) -> str:
    return node.getClass().getSimpleName()


def _children(node):
    return [node.children().apply(i) for i in range(node.children().size())]


def _subtree_bounded(node) -> bool:
    """True when every leaf-path below ``node`` passes through a bounding
    node or ends in a bounded leaf."""
    name = _simple_name(node)
    if name in _BOUNDING_NODES:
        return True
    kids = _children(node)
    if not kids:
        return name in _BOUNDED_LEAVES
    return all(_subtree_bounded(k) for k in kids)


def unpartitioned_window_violations(df: DataFrame) -> list[str]:
    """Walk ``df``'s optimized logical plan; return one description per
    partition-less Window whose input frame is NOT provably bounded.
    Empty list == the plan honors the census-window discipline."""
    violations: list[str] = []
    stack = [df._jdf.queryExecution().optimizedPlan()]
    while stack:
        node = stack.pop()
        if (
            _simple_name(node) == "Window"
            and node.partitionSpec().size() == 0
        ):
            child = _children(node)[0]
            if not _subtree_bounded(child):
                chain = []
                c = child
                while True:
                    chain.append(_simple_name(c))
                    kids = _children(c)
                    if not kids:
                        break
                    c = kids[0]
                violations.append(
                    "unpartitioned Window over unbounded frame: "
                    + " > ".join(chain)
                )
        stack.extend(_children(node))
    return violations
