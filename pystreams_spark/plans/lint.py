"""Plan linter: mechanical scale-cliff detection on a physical plan.

`tests/test_plans.py` asserts these properties query-by-query for the
registry; this module packages the same checks as a reusable API so a
pipeline author can gate THEIR composed plans the way our suite gates
ours (e.g. `assert_clean(df)` in a pre-deploy test, or `lint(df)` in a
notebook while iterating). Checks are the ones that matter at 100 TB:

- W_CARTESIAN: CartesianProduct / BroadcastNestedLoopJoin — O(n·m) row
  pairs; legitimate only for deliberately all-pairs operators.
- W_ROW_UDF: BatchEvalPython — a row-at-a-time Python UDF in the hot
  path (per-row pickle round-trip; 10-100× slower than Arrow kernels
  and an optimizer barrier).
- W_PYTHON_STAGES: more Arrow/Python eval stages than the budget — a
  kernel output is probably being re-derived through a self-join
  lineage instead of checkpointed (the r2 bench regression shape).
- W_SINGLE_PARTITION: an Exchange SinglePartition feeding a Window or
  Sort — the whole dataset serialized through ONE task (the classic
  `Window.orderBy` with no partitionBy cliff). Global aggregates also
  plan a SinglePartition exchange, but over partial-aggregate rows
  (|partitions| rows), which is fine and not flagged.
- W_REPEATED_EXPR: the SAME expensive sub-expression (regex split /
  extract / replace / count, JSON parse) appears >2 times in one plan —
  Catalyst's subexpression elimination does NOT reach inside
  higher-order-function lambdas (they are interpreted), so an inline
  `tokens(text)` consumed by a transform() re-runs the regex per
  element: O(tokens²) per doc. Shipped once as the 5d161bd regression
  (bigram_lm_quality 2.1 s → 12.1 s); the fix is always the same —
  project the expression ONCE behind an attribute and consume the
  attribute (CollapseProject keeps the barrier because the non-cheap
  producer is multiply-referenced).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from .introspect import executed_plan

_PY_NODES = re.compile(
    r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas"
    r"|FlatMapCoGroupsInPandas|BatchEvalPythonUDTF|MapInArrow"
)

# Expression families worth deduplicating: each evaluation is a regex
# scan or a parse of the full input string, so N copies in one plan
# means N full passes over the value (worse inside HOF lambdas, where
# a copy per ELEMENT is possible).
_EXPENSIVE_CALLS = re.compile(
    r"\b(split|regexp_extract|regexp_extract_all|regexp_replace"
    r"|regexp_count|regexp_instr|from_json|get_json_object|json_tuple"
    r"|parse_json|sentences|levenshtein)\("
)


def _balanced_args(text: str, open_idx: int) -> str:
    """Contents of the paren group starting at ``open_idx`` ('(')."""
    depth = 0
    for i in range(open_idx, len(text)):
        if text[i] == "(":
            depth += 1
        elif text[i] == ")":
            depth -= 1
            if depth == 0:
                return text[open_idx + 1 : i]
    return text[open_idx + 1 :]


def repeated_expensive_exprs(plan: str, threshold: int = 2) -> dict[str, int]:
    """{normalized call → count} for expensive calls appearing more than
    ``threshold`` times in the plan text. Normalization strips exprIds
    (``#123``) and whitespace so the same logical sub-expression
    matches across Project/Generate/Filter nodes; distinct inputs
    (``split(text,…)`` vs ``split(bg,…)``) stay distinct."""
    counts: dict[str, int] = {}
    for m in _EXPENSIVE_CALLS.finditer(plan):
        args = _balanced_args(plan, m.end() - 1)
        key = re.sub(r"#\d+", "#", m.group(1) + "(" + args + ")")
        key = re.sub(r"\s+", "", key)
        counts[key] = counts.get(key, 0) + 1
    return {k: v for k, v in counts.items() if v > threshold}


def _indent(line: str) -> int:
    """Tree depth of a plan line (prefix chars before the operator name
    in Spark's `+-`/`:-` ASCII tree)."""
    return len(line) - len(line.lstrip(" :+-*("))


def lint(
    df: DataFrame,
    allow_cartesian: bool = False,
    python_stage_budget: int = 2,
    repeated_expr_threshold: int = 2,
) -> list[dict]:
    """Return [{code, message}] findings for the DataFrame's executed
    plan (empty list = clean). Purely static — does not run the query."""
    plan = executed_plan(df)
    findings: list[dict] = []

    if not allow_cartesian:
        for op in ("CartesianProduct", "BroadcastNestedLoopJoin"):
            if op in plan:
                findings.append(
                    {
                        "code": "W_CARTESIAN",
                        "message": f"{op} in plan: O(n*m) pair blow-up at scale. "
                        "Add an equi-join key (even a coarse bucket) or pass "
                        "allow_cartesian=True if all-pairs is the point.",
                    }
                )

    if re.search(r"BatchEvalPython(?!UDTF)", plan):
        findings.append(
            {
                "code": "W_ROW_UDF",
                "message": "Row-at-a-time Python UDF (BatchEvalPython): per-row "
                "pickle round-trip and an optimizer barrier. Rewrite as Column "
                "algebra or an Arrow kernel (pandas_udf / mapInPandas).",
            }
        )

    n_py = len(_PY_NODES.findall(plan))
    if n_py > python_stage_budget:
        findings.append(
            {
                "code": "W_PYTHON_STAGES",
                "message": f"{n_py} Python-eval stages in one plan (budget "
                f"{python_stage_budget}): a kernel output may be re-evaluated "
                "through a self-join lineage — localCheckpoint it once.",
            }
        )

    repeated = repeated_expensive_exprs(plan, threshold=repeated_expr_threshold)
    if repeated:
        worst = max(repeated.items(), key=lambda kv: kv[1])
        findings.append(
            {
                "code": "W_REPEATED_EXPR",
                "message": f"expensive sub-expression repeated {worst[1]}x in "
                f"one plan ({worst[0][:120]}): no CSE inside HOF lambdas — "
                "project it once behind an attribute and consume the "
                "attribute (the 5d161bd O(tokens^2) trap).",
            }
        )

    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        depth = _indent(line)
        parent = None
        for j in range(i - 1, -1, -1):
            if _indent(lines[j]) < depth:
                parent = lines[j]
                break
        if parent and re.search(r"\b(Window|Sort)\b", parent):
            findings.append(
                {
                    "code": "W_SINGLE_PARTITION",
                    "message": "Exchange SinglePartition feeds a Window/Sort: "
                    "the full dataset flows through ONE task. Add a partition "
                    "key to the window, or use the two-pass prefix-sum shape "
                    "(operators/selection.ordered_cumsum) for global ordering.",
                }
            )
            break

    return findings


def assert_clean(df: DataFrame, **kwargs) -> None:
    """Raise AssertionError listing every finding (for use in tests /
    pre-deploy gates). Raised explicitly, not via ``assert`` — the gate
    must fire under ``python -O`` too."""
    findings = lint(df, **kwargs)
    if findings:
        raise AssertionError(
            "plan lint: "
            + "; ".join(f"[{f['code']}] {f['message']}" for f in findings)
        )
