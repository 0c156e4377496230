"""Plan lint: sweep every queries() entry's PHYSICAL plan for scale
red flags.  Not a correctness gate — a perf review the same way
tests/test_plans.py is, but exhaustive instead of curated.

Flags:
- CartesianProduct           non-broadcast cross product (O(n*m) at scale)
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
            plan = plan_of(registry[name](spark, sf_dir))
        except Exception as exc:  # streaming plans can't executedPlan pre-start
            findings.append(f"SKIP  {name}: {type(exc).__name__}")
            continue
        flags = []
        if "CartesianProduct" in plan:
            flags.append("CARTESIAN")
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
