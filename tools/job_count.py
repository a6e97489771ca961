"""Count Spark JOBS per registered query — deterministic and
steal-immune, unlike wall-clock medians on a noisy host (the r13
methodology note). A "job" here is every driver-synchronized action:
collects inside iterative trainers, eager checkpoints, AQE stage-jobs
of the final noop write — i.e. the count of sequential driver round
trips, the thing that dominates small-input latency and cluster
round-trip cost.

Usage: python tools/job_count.py name [name ...] [--sf DIR]
Prints one JSON line per query: {"name": ..., "jobs": N, "sec": S}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parlerproject_spark import queries as Q  # noqa: E402
from parlerproject_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    spark = get_spark("job_count")
    registry = Q.queries()
    Q.flagship(spark, sf_dir).count()
    spark.range(32).mapInPandas(lambda it: it, "id long").count()

    sc = spark.sparkContext
    out: dict[str, dict] = {}
    for name in names:
        group = f"jobcount:{name}"
        sc.setJobGroup(group, name)
        start = time.perf_counter()
        registry[name](spark, sf_dir).write.format("noop").mode(
            "overwrite").save()
        sec = round(time.perf_counter() - start, 3)
        sc.setJobGroup(None, None)
        jobs = sc.statusTracker().getJobIdsForGroup(group)
        out[name] = {"jobs": len(jobs), "sec": sec}
        print(json.dumps({name: out[name]}))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
