"""Time one or more registered queries in isolation (noop sink) and
optionally dump their formatted plans.

Usage: python tools/profile_query.py name [name ...]
           [--runs N] [--sf DIR] [--plan-dir DIR] [--suffix S]

Times each query with the same methodology as bench.py (noop sink,
median of N runs, warm JVM) and, with --plan-dir, writes
<dir>/<name>_<suffix>.txt holding `.explain("formatted")` plus the
executed-plan string (post-AQE shape, exchange/scan counts).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parlerproject_spark import queries as Q  # noqa: E402
from parlerproject_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    runs, sf_dir, plan_dir, suffix = 3, "/root/testdata/sf0.1", None, "before"
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--runs":
            runs = int(args[i + 1]); i += 2
        elif a == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif a == "--plan-dir":
            plan_dir = args[i + 1]; i += 2
        elif a == "--suffix":
            suffix = args[i + 1]; i += 2
        else:
            names.append(a); i += 1

    spark = get_spark("profile")
    registry = Q.queries()
    # Warm JVM + Arrow daemons, as bench.py does.
    Q.flagship(spark, sf_dir).count()
    spark.range(32).mapInPandas(lambda it: it, "id long").count()

    out: dict[str, dict] = {}
    for name in names:
        fn = registry[name]
        per = []
        for _ in range(runs):
            start = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            per.append(round(time.perf_counter() - start, 3))
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        executed = df._jdf.queryExecution().executedPlan().toString()
        n_ex = len(set(re.findall(r"Exchange .*?\[plan_id=(\d+)\]", executed)))
        n_scan = len(re.findall(r"Scan parquet", plan))
        n_py = len(re.findall(
            r"BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|"
            r"FlatMapGroupsInPandas", plan))
        out[name] = {"runs": per, "median": sorted(per)[len(per) // 2],
                     "exchanges": n_ex, "scans": n_scan, "python_nodes": n_py}
        if plan_dir:
            os.makedirs(plan_dir, exist_ok=True)
            with open(os.path.join(plan_dir, f"{name}_{suffix}.txt"),
                      "w") as fh:
                fh.write(plan)
        print(json.dumps({name: out[name]}))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
