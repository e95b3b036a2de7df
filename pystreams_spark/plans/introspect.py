"""Physical-plan introspection (SURVEY.md §4.4): the 100 TB posture is
only real if the plans prove it. These helpers parse the executed plan
so tests can assert the properties that matter at scale:

- filters/projections reach the parquet scan (PushedFilters/ReadSchema),
- dimension joins broadcast instead of shuffling the fact side,
- aggregates are partial (map-side combine) before the exchange,
- ORDER BY + LIMIT plans as TakeOrderedAndProject, not a full sort,
- narrow chains fuse into WholeStageCodegen spans,
- shuffle (Exchange) count matches the operator's design budget.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def _balanced_capture(text: str, start: int, open_ch: str, close_ch: str) -> str:
    """Return the contents between the bracket at ``start`` and its
    MATCHING close (depth-aware — a naive regex truncates at the first
    close char inside nested structs / In(...) lists)."""
    depth = 0
    for i in range(start, len(text)):
        if text[i] == open_ch:
            depth += 1
        elif text[i] == close_ch:
            depth -= 1
            if depth == 0:
                return text[start + 1 : i]
    return text[start + 1 :]


def _split_top_level(inner: str) -> list[str]:
    """Split on commas at bracket depth 0 only — predicate texts like
    ``LessThanOrEqual(l_shipdate,1998-09-02 ...)`` and nested
    ``struct<...>`` fields contain commas of their own."""
    parts, depth, cur = [], 0, []
    for ch in inner:
        if ch in "([<":
            depth += 1
        elif ch in ")]>":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return [p for p in parts if p]


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter predicates the parquet source accepted for pushdown
    (whole predicate strings, commas inside predicates preserved)."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: ", plan):
        start = m.end()
        if start < len(plan) and plan[start] == "[":
            out.extend(_split_top_level(_balanced_capture(plan, start, "[", "]")))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """TOP-LEVEL column lists actually read by each file scan (pruning
    check); nested struct fields stay inside their parent entry."""
    plan = formatted_plan(df)
    schemas = []
    for m in re.finditer(r"ReadSchema: struct", plan):
        start = m.end()
        if start < len(plan) and plan[start] == "<":
            inner = _balanced_capture(plan, start, "<", ">")
            schemas.append([c.split(":")[0].strip() for c in _split_top_level(inner)])
    return schemas


def shuffle_count(df: DataFrame) -> int:
    """Number of DATA-SHUFFLE Exchange operators (hash / range /
    single-partition / round-robin). BroadcastExchange and
    ReusedExchange are deliberately NOT counted — a broadcast moves the
    small side only, and counting it would let a real extra shuffle
    hide inside an inflated budget. AQE reuse means the printed count
    is still an upper bound on executed shuffles."""
    return len(
        re.findall(
            r"\bExchange (hashpartitioning|rangepartitioning|SinglePartition|RoundRobinPartitioning)",
            executed_plan(df),
        )
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df) or "BroadcastNestedLoopJoin" in executed_plan(df)


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in executed_plan(df)


def has_partial_aggregate(df: DataFrame) -> bool:
    """True when the plan contains a map-side partial HashAggregate
    (keys present before the exchange)."""
    return bool(re.search(r"HashAggregate\(keys=.*functions=\[partial_", executed_plan(df)))


def wholestage_codegen_count(df: DataFrame, force: bool = True) -> int:
    """Distinct WholeStageCodegen spans. Under AQE the plan only shows
    codegen stars once final, so (with ``force``) run the plan through
    the noop sink first and read the final adaptive plan."""
    plan = executed_plan(df)
    if "isFinalPlan=false" in plan and force:
        # finalize THIS DataFrame's own query execution by running its
        # plan distributed and returning only a count — df.collect()
        # would materialize every row on the driver, and df.write/
        # df.count would spawn a FRESH QueryExecution and leave this
        # plan unfinalized (same pattern as runtime_metrics)
        df._jdf.queryExecution().executedPlan().execute().count()
        plan = executed_plan(df)
    ids = set(re.findall(r"\*\((\d+)\)", plan))
    if not ids:
        ids = set(re.findall(r"\[codegen id : (\d+)\]", formatted_plan(df)))
    return len(ids)


def runtime_metrics(df: DataFrame, execute: bool = True) -> list[dict]:
    """POST-execution observability: run the plan (noop sink — full
    computation, nothing collected) and harvest every operator's SQL
    metrics (output rows, shuffle bytes/records, spill sizes, peak
    memory) from the executed plan tree. This is the number source for
    "did this shuffle what I think it shuffled" questions that static
    plan text can't answer — the per-operator truth the Spark UI shows,
    programmatically, so a pipeline can assert runtime budgets (e.g.
    shuffle bytes ≤ X) in tests or log them per production run.

    Returns [{operator, metric, value}] for every metric with a
    non-default value. AQE is unwrapped to the FINAL adaptive plan.

    Execution detail: a sink write (even noop) wraps the query in a NEW
    QueryExecution whose metrics start at zero, so the probe executes
    THIS DataFrame's own plan instance via its RDD — full distributed
    computation, only a count comes back to the driver.
    """
    qe = df._jdf.queryExecution()
    if execute:
        qe.executedPlan().execute().count()
    plan = qe.executedPlan()
    if plan.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        plan = plan.executedPlan()

    rows: list[dict] = []

    def walk(node):
        name = node.getClass().getSimpleName()
        try:
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                metric = kv._1()
                v = kv._2().value()
                if v not in (0, -1):
                    rows.append(
                        {"operator": name, "metric": str(metric), "value": int(v)}
                    )
        except Exception:
            pass  # metric-less nodes (e.g. reused exchanges)
        kids = node.children()
        for i in range(kids.size()):
            walk(kids.apply(i))
        if name.endswith("QueryStageExec"):
            # AQE materialized stages hold their subtree outside children()
            try:
                walk(node.plan())
            except Exception:
                pass

    walk(plan)
    return rows


def metric_total(metrics: list[dict], metric_substr: str) -> int:
    """Sum a named metric family over all operators (e.g. 'shuffle
    bytes written', 'spill')."""
    return sum(
        m["value"] for m in metrics if metric_substr in m["metric"].lower()
    )
