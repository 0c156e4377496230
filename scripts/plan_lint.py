"""Plan lint: sweep every queries() entry's PHYSICAL plan for scale
red flags.  Not a correctness gate — a perf review the same way
tests/test_plans.py is, but exhaustive instead of curated.

Flags:
- CartesianProduct           non-broadcast cross product (O(n*m) at scale)
- BroadcastNestedLoopJoin    flagged UNLESS its build side is a
                             provably tiny (grouping-key-free, i.e.
                             1-row) aggregate — the scalar-crossJoin
                             pattern is fine, anything else is an
                             O(n*m) bomb hiding behind a broadcast
- Exchange rangepartitioning global sort shuffle (top-k should be
                             TakeOrderedAndProject; intended only for
                             explicitly-sorted sinks)
- BatchEvalPython            row-at-a-time Python UDF in the plan
                             (must be ArrowEvalPython / mapInPandas)
- exchanges=N                shuffle count, FYI ordering

Usage: python scripts/plan_lint.py [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eggv_spark.session import get_session  # noqa: E402


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _walk(node):
    yield node
    kids = node.children()
    for i in range(kids.length()):
        yield from _walk(kids.apply(i))


def unbounded_nested_loops(df) -> int:
    """Count BroadcastNestedLoopJoin nodes whose build side is NOT a
    provably tiny aggregate.  "Provably tiny" = the build subtree
    contains a grouping-key-free HashAggregate/SortAggregate/
    ObjectHashAggregate (keys=[] -> exactly one output row), which is
    the legitimate scalar-crossJoin pattern (join a 1-row global
    statistic onto every row).  Any other BNLJ build side is
    unbounded at scale and gets flagged — this makes the previously
    by-inspection-only judgement mechanical."""
    bad = 0
    root = df._jdf.queryExecution().executedPlan()
    for node in _walk(root):
        if node.nodeName() != "BroadcastNestedLoopJoin":
            continue
        kids = node.children()
        side = str(node.buildSide())
        build = kids.apply(1) if "Right" in side else kids.apply(0)
        sub = build.toString()
        tiny = any(
            f"{agg}(keys=[]" in sub
            for agg in ("HashAggregate", "SortAggregate",
                        "ObjectHashAggregate")
        )
        if not tiny:
            bad += 1
    return bad


def main() -> int:
    spark = get_session(
        "plan-lint", master="local[4]", shuffle_partitions=4,
        extra_confs={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    registry = entry.queries()
    names = sys.argv[1:] or list(registry)
    findings: list[str] = []
    for name in names:
        try:
            df = registry[name](spark, sf_dir)
            plan = plan_of(df)
        except Exception as exc:  # streaming plans can't executedPlan pre-start
            findings.append(f"SKIP  {name}: {type(exc).__name__}")
            continue
        flags = []
        if "CartesianProduct" in plan:
            flags.append("CARTESIAN")
        if "BroadcastNestedLoopJoin" in plan:
            n_bad = unbounded_nested_loops(df)
            if n_bad:
                flags.append(f"UNBOUNDED-BNLJ({n_bad})")
        if "Exchange rangepartitioning" in plan:
            flags.append("GLOBAL-SORT")
        if "BatchEvalPython" in plan:
            flags.append("ROW-PYTHON-UDF")
        n_ex = plan.count("Exchange ")
        line = f"{'FLAG' if flags else 'ok  '}  {name}: exchanges={n_ex}"
        if flags:
            line += "  " + ",".join(flags)
            findings.append(line)
        print(line, flush=True)
    print("\n--- summary ---")
    for f in findings:
        print(f)
    n_flagged = len([f for f in findings if f.startswith("FLAG")])
    print(f"{n_flagged} flagged")
    # Nonzero on flags so the stage-gate chain actually fails on an
    # anti-pattern (it advertised this but the old exit code was
    # always 0); SKIPs (streaming pre-start) stay informational.
    return 1 if n_flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
