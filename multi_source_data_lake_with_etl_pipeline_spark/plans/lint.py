"""Physical-plan linter: flag 100 TB anti-patterns before they ship.

The optimizer cannot veto a plan that is *legal* but hopeless at
scale; this module reads `explain`-level text of the EXECUTED plan and
surfaces the classic cliffs, each with the fix the rest of this repo
uses. It is advisory tooling (CI plan tests pin specific operators;
this is the generic screen for new queries).

Checks:

- ``cartesian``: a ``CartesianProduct`` / non-broadcast nested-loop
  join — O(N·M) row pairing; broadcast the small side or add an
  equi-key.
- ``python-udf``: ``BatchEvalPython`` — row-at-a-time Python in the
  hot path; use built-in expressions or Arrow (``ArrowEvalPython`` is
  allowed).
- ``global-window``: a window function with an EMPTY partition spec —
  Spark funnels every row through ONE task to order the whole
  dataset; partition the window or pre-aggregate.
- ``single-partition-exchange``: ``Exchange SinglePartition`` feeding
  a non-trivial subtree — a global sort/limit choke point (fine for a
  final scalar aggregate, deadly mid-plan).
- ``mega-filter``: a Filter condition containing higher-order
  functions over hundreds of characters — usually the optimizer
  inlined an expensive array expression into an inferred pre-Generate
  filter (see PLANS.md round-3 note); restructure with
  ``explode_outer`` + a post-Generate null check.
- ``exact-percentile``: Spark's exact ``percentile``/``median``
  aggregate — its buffer holds EVERY group value (an OpenHashMap per
  group), so a 3-group percentile over a 100 TB fact is an unbounded
  single-buffer sort. Use
  ``operators.quality.exact_percentiles`` (value-histogram order
  statistics, identical results) or ``percentile_approx``. Allowed
  only over pre-aggregated bounded groups (allowlist with the bound).
"""

from __future__ import annotations

import contextlib
import io
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class LintFinding:
    code: str
    message: str


def _plan_text(df: DataFrame) -> str:
    # Ask the JVM for the explain STRING directly (what DataFrame.explain
    # prints) instead of capturing stdout: redirect_stdout swaps the
    # PROCESS-global sys.stdout, so concurrent linters (thread-pooled
    # sweeps) would capture each other's plans — and the direct call
    # skips a print round trip.
    try:
        text = df.sparkSession._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    except Exception:  # non-classic sessions: fall back to stdout capture
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        text = buf.getvalue()
    # The Final Plan reflects AQE's actual choices; lint that when
    # present, else the whole text.
    return text.split("== Initial Plan ==")[0]


_HOF_TOKENS = ("lambdafunction", "transform(", "aggregate(", "filter(split")


def lint_plan(df: DataFrame, mega_filter_chars: int = 400) -> list[LintFinding]:
    """Return scale-risk findings for *df*'s physical plan (empty list
    = no known anti-pattern)."""
    text = _plan_text(df)
    findings: list[LintFinding] = []
    if "CartesianProduct" in text:
        # BroadcastNestedLoopJoin is NOT flagged: the small side is
        # broadcast, which is the sanctioned shape for tiny cross joins.
        findings.append(
            LintFinding(
                "cartesian",
                "CartesianProduct join: O(N*M) pairing with both sides "
                "partitioned — broadcast the small side or add an equi-join key",
            )
        )
    if "BatchEvalPython" in text:
        findings.append(
            LintFinding(
                "python-udf",
                "row-at-a-time Python UDF (BatchEvalPython) in the plan — use "
                "built-in expressions or Arrow-batched pandas UDFs",
            )
        )
    # windowspecdefinition(part…, ord ASC, frame): when the FIRST
    # argument is itself a sort item, the partition list is empty —
    # a single-task global ordering.
    if re.search(r"windowspecdefinition\(\s*[^,()]*\s+(ASC|DESC)", text):
        findings.append(
            LintFinding(
                "global-window",
                "window function with no PARTITION BY — the whole dataset "
                "sorts in ONE task; partition the window or pre-aggregate",
            )
        )
    for m in re.finditer(r"Condition : (.+)", text):
        cond = m.group(1)
        if len(cond) >= mega_filter_chars and any(t in cond for t in _HOF_TOKENS):
            findings.append(
                LintFinding(
                    "mega-filter",
                    "Filter inlines a large higher-order expression (likely an "
                    "inferred pre-Generate filter) — use explode_outer + a "
                    "post-Generate null check (PLANS.md round-3 note)",
                )
            )
            break
    # exact Percentile/Median aggregate: `percentile(` never matches
    # `percentile_approx(` (underscore, not paren, follows); `median(`
    # needs a lookbehind so e.g. a column alias `*_median(` can't hide
    # it but `regr_`-style prefixed names don't false-positive.
    if re.search(r"(?<![\w.])(percentile|median)\(", text):
        findings.append(
            LintFinding(
                "exact-percentile",
                "exact percentile/median aggregate buffers every group value — "
                "use operators.quality.exact_percentiles (same results, "
                "histogram-bounded) or percentile_approx",
            )
        )
    # Exchange SinglePartition is fine as the LAST hop of a scalar
    # aggregate/limit; flag it only when a Window/Sort/Generate sits
    # above it (mid-plan choke).
    if re.search(r"Exchange SinglePartition", text):
        pos = text.index("Exchange SinglePartition")
        above = text[:pos]
        tree = above.split("== Physical Plan ==")[-1]
        if re.search(r"\b(Window|Generate|SortMergeJoin)\b", tree):
            findings.append(
                LintFinding(
                    "single-partition-exchange",
                    "Exchange SinglePartition feeding heavy operators — a "
                    "one-task choke point mid-plan",
                )
            )
    return findings
