"""Optimization-round profiler: for each headline query, measure
construction time (registry call — includes any eager per-step jobs),
noop-sink execution time, and the number of Spark jobs each phase
launches, then save ``explain("formatted")`` under plans/<tag>/.

The bench times construction+execution together; splitting them tells
us whether a slow query is slow because of driver-side plan work /
eager checkpoint jobs (construction) or the distributed plan itself
(execution) — guide §1 "decide whether the time is going to ...".

Usage: python scripts/profile_bench.py [--tag r10_before] [query ...]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eggv_spark.session import get_session  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:]]
    tag = "r10_before"
    if "--tag" in args:
        i = args.index("--tag")
        tag = args[i + 1]
        del args[i : i + 2]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plan_dir = os.path.join(repo, "plans", tag)
    os.makedirs(plan_dir, exist_ok=True)

    spark = get_session(
        "eggv-profile",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_confs={
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    import bench
    import __spark_entry__ as entrymod

    registry = entrymod.queries()
    names = args or [n for n in bench.HEADLINE if n in registry]

    tracker = spark.sparkContext.statusTracker()

    rows = []
    for name in names:
        spark.sparkContext.setJobDescription(f"profile: {name}")
        # untimed warm-up (same policy as bench.py)
        registry[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

        best = None
        for _ in range(2):
            j0 = len(tracker.getJobIdsForGroup(None))
            t0 = time.perf_counter()
            df = registry[name](spark, sf_dir)
            t1 = time.perf_counter()
            j1 = len(tracker.getJobIdsForGroup(None))
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            j2 = len(tracker.getJobIdsForGroup(None))
            rec = {
                "query": name,
                "construct_s": round(t1 - t0, 3),
                "exec_s": round(t2 - t1, 3),
                "total_s": round(t2 - t0, 3),
                "jobs_construct": j1 - j0,
                "jobs_exec": j2 - j1,
            }
            if best is None or rec["total_s"] < best["total_s"]:
                best = rec
        # plan capture (construction may repeat eager work; fine)
        df = registry[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        with open(os.path.join(plan_dir, f"{name}.txt"), "w") as fh:
            fh.write(plan)
        best["exchanges"] = len(re.findall(r"\bExchange\b", plan))
        best["bhj"] = len(re.findall(r"BroadcastHashJoin", plan))
        best["smj"] = len(re.findall(r"SortMergeJoin", plan))
        best["python"] = len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", plan)
        )
        rows.append(best)
        print(json.dumps(best), flush=True)

    out = os.path.join(repo, "plans", f"profile_{tag}.json")
    with open(out, "w") as fh:
        json.dump(rows, fh, indent=1)
    print(f"wrote {out}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
