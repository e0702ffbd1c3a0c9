"""Physical-plan introspection helpers.

The engine's performance contract is checked against the plan, not
vibes: filters and projections must reach the parquet scan
(``PushedFilters`` / ``ReadSchema``), small dimensions must broadcast,
and the hot path must stay inside whole-stage codegen (no
``BatchEvalPython`` except in the explicitly Arrow-batched multimodal
operators).  ``tests/test_plans.py`` pins these properties.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def scan_summary(df: DataFrame) -> list[dict]:
    """Per parquet scan: pushed filters and the column subset read."""
    text = formatted_plan(df)
    scans = []
    for block in re.split(r"\n\(\d+\) ", text):
        if not block.startswith("Scan parquet"):
            continue
        pushed = re.search(r"PushedFilters: \[(.*?)\]", block)
        schema = re.search(r"ReadSchema: struct<(.*?)>", block, re.S)
        scans.append(
            {
                "pushed_filters": pushed.group(1) if pushed else "",
                "read_columns": [
                    c.split(":")[0].strip()
                    for c in (schema.group(1).split(",") if schema else [])
                    if c.strip()
                ],
            }
        )
    return scans


def join_strategies(df: DataFrame) -> list[str]:
    """Physical join operators in execution order."""
    text = formatted_plan(df)
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)",
        text,
    )


def python_eval_nodes(df: DataFrame) -> list[str]:
    """Distinct Python-execution operators (empty ⇒ fully JVM-side)."""
    text = formatted_plan(df)
    return sorted(
        set(
            re.findall(
                r"(BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas)",
                text,
            )
        )
    )


def codegen_span_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen subtrees (fewer = wider spans).

    NOTE: under AQE the pre-execution plan hides codegen nodes — this
    returns 0 until the plan is final.  Use
    ``executed_codegen_span_count`` for the real number."""
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", formatted_plan(df))))


def executed_codegen_span_count(df: DataFrame) -> int:
    """Codegen span count of the FINAL (post-AQE) physical plan.
    Executes THIS Dataset's own QueryExecution (a ``count()`` would
    plan a separate query and leave this plan non-final).  Drains via
    ``toLocalIterator`` so the audit never buffers the full result on
    the driver.  The tree string marks each codegen subtree with a
    ``*(N)`` stage prefix."""
    for _ in df.toLocalIterator():
        pass
    text = df._jdf.queryExecution().executedPlan().toString()
    return len(set(re.findall(r"\*\((\d+)\)", text)))


def partition_filters(df: DataFrame) -> list[str]:
    """Per parquet scan: the PartitionFilters entry (non-empty ⇒ the
    scan prunes whole partition directories before reading a byte)."""
    text = formatted_plan(df)
    return [
        m.strip()
        for m in re.findall(r"PartitionFilters: \[(.*?)\]", text)
    ]


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the plan (0 for fully
    co-located bucketed joins/aggregations).

    NOTE: this counts NODE OCCURRENCES in the pre-execution formatted
    plan, which overstates iterative queries that read a cached
    InMemoryRelation — the cache's build lineage (including its one
    Exchange) is reprinted inside every InMemoryTableScan that reads
    it, so a 5-round loop over one cached table shows the same
    already-executed Exchange 5+ times.  Fine for the simple one-pass
    queries ``tests/test_plans.py`` pins at 0; use
    ``executed_exchange_count`` for an honest count on iterative
    plans."""
    text = formatted_plan(df)
    return len(re.findall(r"\n\(\d+\) Exchange", text))


def _walk_executed_plan(node, seen: set, shuffles: set) -> None:
    """Recursive walk of the executed SparkPlan OBJECT tree via py4j.

    The tree STRING is unusable for honest shuffle counting: every
    AdaptiveSparkPlan node prints an ``== Initial Plan ==`` section
    whose exchanges carry their own plan_ids (never executed), and the
    indentation of nested adaptive sections does not line up with the
    surrounding tree, so the sections cannot even be stripped reliably.
    Walking the objects sidesteps all of it — an AdaptiveSparkPlanExec
    is entered through ``executedPlan()`` (the final plan; the initial
    plan is simply never visited), query stages through ``plan()``,
    cached relations through the InMemoryRelation's ``cachedPlan()``
    (visited once per SparkPlan id, matching the fact that the cache
    build's shuffle ran once no matter how many scans read it), and
    ReusedExchange through its child (same id ⇒ deduped)."""
    nid = node.id()
    if nid in seen:
        return
    seen.add(nid)
    cls = node.getClass().getSimpleName()
    if cls == "ShuffleExchangeExec":
        shuffles.add(nid)
    elif cls == "AdaptiveSparkPlanExec":
        _walk_executed_plan(node.executedPlan(), seen, shuffles)
        return
    elif cls == "ReusedExchangeExec":
        _walk_executed_plan(node.child(), seen, shuffles)
        return
    elif cls.endswith("QueryStageExec"):
        _walk_executed_plan(node.plan(), seen, shuffles)
        return
    elif cls == "InMemoryTableScanExec":
        _walk_executed_plan(node.relation().cachedPlan(), seen, shuffles)
        return
    children = node.children()
    for i in range(children.size()):
        _walk_executed_plan(children.apply(i), seen, shuffles)


def executed_exchange_count(df: DataFrame) -> int:
    """Distinct shuffle Exchanges that actually EXECUTE in the final
    (post-AQE) physical plan.

    Walks the executed-plan object tree (see ``_walk_executed_plan``)
    and counts distinct ShuffleExchangeExec nodes by SparkPlan id —
    the number of shuffles the query actually paid for, with cached
    lineage counted once and AQE's never-executed initial plans
    excluded.  BroadcastExchange is excluded (not a shuffle).  Drains
    the Dataset first if AQE hasn't finalized the plan."""
    plan = df._jdf.queryExecution().executedPlan()
    if "isFinalPlan=false" in plan.toString():
        for _ in df.toLocalIterator():
            pass
        plan = df._jdf.queryExecution().executedPlan()
    seen: set = set()
    shuffles: set = set()
    _walk_executed_plan(plan, seen, shuffles)
    return len(shuffles)
