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


def executed_exchange_count(df: DataFrame) -> int:
    """Distinct shuffle Exchanges that actually EXECUTE in the final
    (post-AQE) physical plan.

    Counts unique ``plan_id``s: the executed-plan tree string reprints
    a cached InMemoryRelation's build lineage inside every
    InMemoryTableScan that reads it, but those reprints carry the SAME
    plan_id — the exchange ran once when the cache was built, not once
    per read — so distinct-ids is the number of shuffles the query
    actually paid for.  BroadcastExchange is excluded (not a shuffle).
    Drains the Dataset first if AQE hasn't finalized the plan."""
    text = df._jdf.queryExecution().executedPlan().toString()
    if "isFinalPlan=false" in text:
        for _ in df.toLocalIterator():
            pass
        text = df._jdf.queryExecution().executedPlan().toString()
    ids = set(
        re.findall(
            r"(?<![A-Za-z])Exchange [^\n]*?\[plan_id=(\d+)\]", text
        )
    )
    if ids:
        return len(ids)
    # non-AQE plans print no plan_id; fall back to occurrence count
    return len(re.findall(r"(?<![A-Za-z])Exchange (?:hash|range|Single|RoundRobin)", text))
