"""Physical-plan audit API — programmatic access to the plan properties
that decide scale behavior (SURVEY.md §4: everything the reference lacked,
Catalyst provides; this module is how we PROVE each query actually gets it).

Used by tests/test_plans.py; also handy interactively:

    from gridmr_spark.plans import audit
    print(audit(df))
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


def physical_plan(df, mode: str = "formatted") -> str:
    """The string df.explain(mode) would print."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def pushed_filters(df) -> list[str]:
    """Filter expressions that reached the parquet scan(s)."""
    plan = physical_plan(df)
    return [
        line.split("PushedFilters:", 1)[1].strip()
        for line in plan.splitlines()
        if "PushedFilters:" in line
    ]


def read_schemas(df) -> list[str]:
    """Column sets actually read from each scan (column pruning check)."""
    plan = physical_plan(df)
    return [
        line.split("ReadSchema:", 1)[1].strip()
        for line in plan.splitlines()
        if "ReadSchema:" in line
    ]


_JOIN_KINDS = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


@dataclass
class PlanReport:
    joins: list[str] = field(default_factory=list)
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    n_scans: int = 0
    n_exchanges: int = 0
    n_hash_aggregates: int = 0
    has_take_ordered: bool = False
    has_window_group_limit: bool = False
    has_cartesian: bool = False

    def __str__(self) -> str:  # compact human summary
        return (
            f"scans={self.n_scans} exchanges={self.n_exchanges} "
            f"hashAggs={self.n_hash_aggregates} joins={self.joins} "
            f"takeOrdered={self.has_take_ordered} wgl={self.has_window_group_limit} "
            f"cartesian={self.has_cartesian}\n"
            f"pushed={self.pushed_filters}\nread={self.read_schemas}"
        )


def audit(df) -> PlanReport:
    simple = physical_plan(df, "simple")
    return PlanReport(
        joins=[k for k in _JOIN_KINDS for _ in range(simple.count(k))],
        pushed_filters=pushed_filters(df),
        read_schemas=read_schemas(df),
        n_scans=len(re.findall(r"Scan parquet", simple)),
        n_exchanges=simple.count("Exchange"),
        n_hash_aggregates=simple.count("HashAggregate"),
        has_take_ordered="TakeOrderedAndProject" in simple,
        has_window_group_limit="WindowGroupLimit" in simple,
        has_cartesian="CartesianProduct" in simple,
    )


def aqe_final_plan(df) -> str:
    """EXECUTE the frame and return its AQE FINAL plan (isFinalPlan=true).

    The pre-execution explain shows only the initial plan: AQE's runtime
    decisions — skew-join splitting, partition coalescing, join demotion —
    exist only in the final plan, which Spark materializes on the SAME
    DataFrame's queryExecution once an action has run. Callers pay one
    collect(); use a row-light projection when auditing wide joins."""
    df.collect()
    return physical_plan(df, "simple")


def skew_split_joins(plan: str) -> int:
    """How many join nodes AQE actually split for skew (``skew=true``
    markers in a final plan from :func:`aqe_final_plan`)."""
    return plan.count("skew=true")
