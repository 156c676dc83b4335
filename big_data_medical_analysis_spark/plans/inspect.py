"""Physical-plan introspection over the pre-execution plan string.

All helpers parse ``queryExecution().executedPlan().toString()`` — with AQE
on this is the *initial* physical plan (``isFinalPlan=false``), which is
exactly what plan-shape assertions want: it shows the statically chosen join
strategies, scan pushdowns, and exchanges before runtime re-optimization
coalesces or converts them. (AQE only ever improves on this plan, never
removes a pushdown.)
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The (initial) physical plan as a string — what ``df.explain()``
    prints, capturable."""
    return df._jdf.queryExecution().executedPlan().toString()


def has_node(df: DataFrame, node: str) -> bool:
    """True if the plan contains an operator whose name includes ``node``
    (e.g. "BroadcastHashJoin", "TakeOrderedAndProject", "SortMergeJoin")."""
    return node in physical_plan(df)


def node_count(df: DataFrame, node: str) -> int:
    """Occurrences of ``node`` in the plan string."""
    return physical_plan(df).count(node)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges): every one
    of these is a full network repartition of its input — the unit of cost
    the docstrings budget ("one shuffle on the session key")."""
    plan = physical_plan(df)
    return len(re.findall(r"Exchange (?:hash|range|rangepartitioning|RoundRobin|SinglePartition)", plan))


def broadcast_join_count(df: DataFrame) -> int:
    """Broadcast joins of either flavor (hash / nested-loop)."""
    plan = physical_plan(df)
    return plan.count("BroadcastHashJoin") + plan.count(
        "BroadcastNestedLoopJoin"
    )


def unpartitioned_window_count(df: DataFrame) -> int:
    """Number of Window operators executing over a single global partition
    (their child is an ``Exchange SinglePartition``) — the plan-level
    equivalent of WindowExec's "No Partition Defined" runtime warning.
    Each such window serializes its input through one task; the engine
    allows exactly three DISCLOSED dimension-/axis-sized cases (see
    bench.py's audit allowlist), and any new one should fail loudly
    instead of scrolling past as a log line."""
    lines = physical_plan(df).splitlines()
    n = 0
    for i, ln in enumerate(lines):
        # A window node's input chain below it is (optionally) a Sort, then
        # the exchange that established its partitioning. A foldable
        # partition key is optimized away by Catalyst, so this check can't
        # be gamed by partitionBy(lit(1)).
        if re.search(r"\bWindow(GroupLimit)? \[", ln):
            for nxt in lines[i + 1 : i + 4]:
                if "Exchange SinglePartition" in nxt:
                    n += 1
                    break
                # pass-through sort/projection between window and exchange
                if not re.search(r"\b(Sort \[|Project \[)", nxt):
                    break
    return n


def pushed_filters(df: DataFrame) -> list[str]:
    """The ``PushedFilters: [...]`` list of every scan in the plan, one
    string per scan (empty string for a scan with no pushdown)."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", physical_plan(df))


def read_schemas(df: DataFrame) -> list[str]:
    """The ``ReadSchema:`` struct of every file scan — the column-pruning
    audit: a scan whose ReadSchema lists columns the query never uses is
    reading bytes for nothing."""
    # plan strings truncate long lines with "..." — capture to end-of-line,
    # not to the closing ">"
    return re.findall(r"ReadSchema: (struct<[^\n]*)", physical_plan(df))


def observed_metrics(df, name: str, *exprs):
    """Attach named observation metrics to a plan and return
    ``(observed_df, observation)`` — ``observation.get`` yields the metric
    dict after the first action on the observed frame.

    This is the zero-cost operational-observability surface (row counts,
    value totals, null tallies collected as accumulator-style metrics
    during a job, no second pass) — at 100 TB a pipeline asserts its
    invariants from these instead of re-scanning with ``count()``. Works
    identically on streaming frames via the listener API.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *exprs), obs
