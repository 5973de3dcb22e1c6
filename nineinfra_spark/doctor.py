"""Plan doctor: the scale rules as a user-facing API.

``scale_risks(df)`` inspects a DataFrame's EXECUTED physical plan and
returns the anti-patterns that break at cluster scale — the same
rules ``tests/test_plan_lint.py`` enforces over the whole query
registry, packaged so a user can vet their own plans before running
them against 100 TB:

- ``cartesian``: an unbounded ``CartesianProduct`` — O(|L|·|R|) rows;
  at fact-table sizes this never finishes. Re-express as an equi-join
  or bound one side and broadcast it.
- ``nested-loop``: ``BroadcastNestedLoopJoin`` — fine when the
  broadcast side is a constant-size frame (a 1-row total, a bounded
  dimension), quadratic wall otherwise. The doctor can't see row
  counts, so it reports the shape and leaves the bounded/unbounded
  call to the caller.
- ``global-window``: a ``Window`` with an EMPTY partition spec and a
  non-empty order spec moves the ENTIRE input to one task ("No
  Partition Defined for Window operation"). Suppressed when the
  window's subtree contains a ``TakeOrderedAndProject``/
  ``GlobalLimit`` (the rank-after-top-k pattern: the window sees ≤N
  rows). Fix with ``plans._util.ranked_prefix`` (distributed rank /
  prefix-sum) or rank after a top-k limit.
- ``row-python``: ``BatchEvalPython`` — row-at-a-time Python UDF in
  the hot path, ~10-100× slower than an Arrow-batched pandas UDF
  (``ArrowEvalPython`` / ``MapInPandas`` are the fast shapes and are
  not flagged).

Detection is plan-text based and versioned against Spark 4's
``treeString`` format: a ``Window`` line prints
``Window [exprs], [partitionSpec], [orderSpec]`` and OMITS empty
specs, so 2 top-level bracket groups whose last group carries a sort
direction = unpartitioned+ordered, while 2 groups without one is the
harmless partitionBy-without-orderBy; ``WindowGroupLimit`` lines are
excluded (their 2-group form is the partitioned one).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_WINDOW_NODE = re.compile(r"(?:^|[\s:+-])Window \[")


@dataclass(frozen=True)
class Finding:
    """One scale risk: a ``kind`` from the module docstring, the plan
    line that triggered it, and a one-line remediation hint."""

    kind: str
    line: str
    hint: str


def top_level_groups(line: str) -> list[str]:
    """Top-level ``[...]`` groups of one plan line."""
    groups, depth, start = [], 0, -1
    for i, ch in enumerate(line):
        if ch == "[":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append(line[start : i + 1])
    return groups


def node_col(line: str) -> int:
    """Column where the node starts in one treeString line (first char
    that is not tree-drawing: space, ':', '+', '-'). A codegen star
    ``*(3) Node`` counts from the star — it sits at the node's indent
    column, keeping starred and plain siblings comparable. Greater
    column = deeper in the tree."""
    for i, ch in enumerate(line):
        if ch not in " :+-":
            return i
    return len(line)


def subtree(lines: list[str], idx: int) -> str:
    """The treeString SUBTREE rooted at ``lines[idx]``: following lines
    strictly deeper than the root (a sibling or ancestor at the same
    or shallower column ends it) — so a limit found here really feeds
    the node, not some later branch of the plan."""
    root_col = node_col(lines[idx])
    out = [lines[idx]]
    for line in lines[idx + 1 :]:
        if line.strip() and node_col(line) <= root_col:
            break
        out.append(line)
    return "\n".join(out)


def unpartitioned_window_lines(plan: str) -> list[int]:
    """Indices of ``Window`` plan lines with an EMPTY partition spec
    and a non-empty order spec (the single-partition shape)."""
    out = []
    for idx, line in enumerate(plan.splitlines()):
        if not _WINDOW_NODE.search(line):
            continue
        groups = top_level_groups(line)
        if len(groups) == 2 and (
            " ASC" in groups[-1] or " DESC" in groups[-1]
        ):
            out.append(idx)
    return out


def scale_risks_in_plan(plan: str) -> list[Finding]:
    """The rule engine over an already-rendered physical-plan string
    (``df._jdf.queryExecution().executedPlan().toString()``)."""
    findings: list[Finding] = []
    lines = plan.splitlines()
    for idx, line in enumerate(lines):
        stripped = line.strip()
        if "CartesianProduct" in line:
            findings.append(
                Finding(
                    "cartesian",
                    stripped,
                    "O(|L|*|R|) rows — re-express as an equi-join, or "
                    "bound one side and broadcast it",
                )
            )
        if "BroadcastNestedLoopJoin" in line:
            findings.append(
                Finding(
                    "nested-loop",
                    stripped,
                    "fine only if the broadcast side is constant-size "
                    "(1-row total / bounded dimension); otherwise add an "
                    "equi-join key",
                )
            )
        if "BatchEvalPython" in line:
            findings.append(
                Finding(
                    "row-python",
                    stripped,
                    "row-at-a-time Python UDF — use a pandas_udf / "
                    "mapInPandas (Arrow-batched) instead",
                )
            )
    for idx in unpartitioned_window_lines(plan):
        below = subtree(lines, idx)
        if "TakeOrderedAndProject" in below or "GlobalLimit" in below:
            continue  # rank-after-top-k: the window sees <= N rows
        findings.append(
            Finding(
                "global-window",
                lines[idx].strip(),
                "Window.orderBy without partitionBy single-partitions "
                "the input — use plans._util.ranked_prefix or rank "
                "after a top-k limit",
            )
        )
    # AQE plans print Final AND Initial sections — the same operator
    # appears twice; report each distinct risk once
    return list(dict.fromkeys(findings))


def scale_risks(df) -> list[Finding]:
    """Inspect ``df``'s executed physical plan for scale
    anti-patterns. Returns [] when the plan is clean. Building the
    plan does not execute the query (AQE plans render their initial
    plan; both Final and Initial sections are scanned, so a risk in
    either is reported)."""
    plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    return scale_risks_in_plan(plan)
