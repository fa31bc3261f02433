"""Physical-plan audit: is this the plan you'd want at 100 TB?

The reference has no optimizer to inspect (SURVEY.md §4.1 — it is a
record-at-a-time interpreter); on Spark the physical plan IS the
performance contract, so the engine ships a first-class way to read it.
``audit(df)`` distills ``executedPlan`` into the handful of facts that
decide whether a plan scales:

* ``python_eval_nodes`` — BatchEvalPython/ArrowEvalPython stages.  Empty
  for every hot path that claims to be JVM-only; a deliberate pandas-UDF
  stage (IVF assignment, EWMA, multimodal) shows up here on purpose.
* ``pushed_filters`` / ``read_schemas`` — did predicates and column
  pruning reach the scan?  A scan reading all columns for a 2-column
  projection is wrong.
* ``exchanges`` — every shuffle in the plan.  Joins/aggs need them;
  map-only claims (split_assign, chunking, quality rules) must show 0.
* ``broadcast_joins`` / ``sortmerge_joins`` — which side of the
  broadcast-vs-shuffle decision each join landed on.
* ``partial_aggregates`` — map-side combine present before the shuffle.
* ``codegen_spans`` — WholeStageCodegen regions (wider is better).

Used by ``tests/test_plans.py`` to pin plan shapes so perf regressions
are loud, and available to users as a pre-deploy check:

    from wrangle_pypes_spark.plans import audit
    rep = audit(df)
    assert not rep.python_eval_nodes and rep.pushdown_ok()
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import List

from pyspark.sql import DataFrame


@dataclass
class PlanReport:
    """Distilled physical-plan facts (see module docstring)."""

    plan: str
    python_eval_nodes: List[str] = field(default_factory=list)
    pushed_filters: List[str] = field(default_factory=list)
    read_schemas: List[str] = field(default_factory=list)
    exchanges: List[str] = field(default_factory=list)
    broadcast_joins: int = 0
    sortmerge_joins: int = 0
    partial_aggregates: int = 0
    final_aggregates: int = 0
    codegen_spans: int = 0
    filter_nodes: int = 0

    def shuffle_count(self) -> int:
        return len(self.exchanges)

    def pushdown_ok(self) -> bool:
        """True when the plan either has no Filter NODES at all (nothing
        to push — a bare projection/aggregation passes) or at least one
        scan carries a pushed filter.  Coarse on purpose: a multi-scan
        join legitimately has filterless dims, so "every scan pushed" is
        not checkable from here — inspect ``pushed_filters`` per scan
        when it matters."""
        if not self.read_schemas:
            return True
        if self.filter_nodes == 0:
            return True
        return any(f not in ("", "[]") for f in self.pushed_filters)

    def jvm_only(self) -> bool:
        return not self.python_eval_nodes


def audit(df: DataFrame) -> PlanReport:
    """Build a :class:`PlanReport` from the DataFrame's executed plan.

    Plan-build only — no job runs (AQE re-plans at runtime, so counts
    reflect the static plan; exchange counts are upper bounds under
    coalescing, and ``codegen_spans`` is 0 for a not-yet-executed
    AdaptiveSparkPlan — codegen regions only materialize in the final
    plan).
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    rep = PlanReport(plan=plan)
    # node lines look like "+- *(2) HashAggregate(...)" (codegen star),
    # ":- BroadcastHashJoin ..." or "+- !ArrowAggregatePython(...)"
    _prefix = re.compile(r"^[\s+:!-]*(\*\s*)?(\(\d+\)\s*)?")
    _python_nodes = ("BatchEvalPython", "ArrowEvalPython",
                     "ArrowAggregatePython", "ArrowWindowPython",
                     "WindowInPandas", "AggregateInPandas",
                     "MapInPandas", "MapInArrow",
                     "FlatMapGroupsInPandas", "FlatMapGroupsInArrow",
                     "FlatMapCoGroupsInPandas",
                     "PythonMapInArrow")
    # NOTE: "FlatMapGroupsWithState" is deliberately absent — that is
    # the JVM (Scala/Java) stateful node, not a Python-eval stage; the
    # Python twin prints FlatMapGroupsInPandasWithState, which the
    # "FlatMapGroupsInPandas" prefix already matches.
    for line in plan.splitlines():
        s = _prefix.sub("", line)
        if s.startswith(_python_nodes):
            rep.python_eval_nodes.append(s.split("(")[0].strip())
        if s.startswith("Exchange"):
            rep.exchanges.append(s.split(",")[0])
        if s.startswith(("BroadcastHashJoin", "BroadcastNestedLoopJoin")):
            rep.broadcast_joins += 1
        if s.startswith("SortMergeJoin"):
            rep.sortmerge_joins += 1
        if s.startswith(("HashAggregate", "ObjectHashAggregate",
                         "SortAggregate")):
            if "partial" in s:
                rep.partial_aggregates += 1
            else:
                rep.final_aggregates += 1
    rep.codegen_spans = len(re.findall(r"WholeStageCodegen", plan))
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        rep.pushed_filters.append(m.group(1))
    for m in re.finditer(r"ReadSchema: ([^\n]*)", plan):
        rep.read_schemas.append(m.group(1).strip())
    rep.filter_nodes = len(re.findall(r"^[\s+:!-]*(?:\*\s*)?(?:\(\d+\)\s*)?"
                                      r"Filter[ (]", plan, re.MULTILINE))
    return rep


def assert_jvm_only(df: DataFrame) -> None:
    """Raise AssertionError naming the offending stages if the plan
    evaluates any Python in-line (use on hot paths that must codegen)."""
    rep = audit(df)
    if not rep.jvm_only():
        raise AssertionError(
            f"plan evaluates Python in-line: {rep.python_eval_nodes}")
