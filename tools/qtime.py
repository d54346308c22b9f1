#!/usr/bin/env python3
"""Fresh-process per-query timer for optimization A/Bs.

Usage: python tools/qtime.py [--sf SF_DIR] [--reps N] name [name ...]

Warms the session the same way bench.py does, then times each named
registry query REPS times via the noop sink (bench methodology) and
prints one JSON line {name: [sec, ...]}. Runs everything inside ONE
process: startup cost is excluded from the numbers, and steady-state
reps (2+) are the comparison basis per the verify skill.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from guidance_for_analytics_observability_on_aws_spark.plans.registry import REGISTRY  # noqa: E402
from guidance_for_analytics_observability_on_aws_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    reps = 3
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1
    import bench

    spark = get_spark("gfaooa-qtime")
    spark.sparkContext.setLogLevel("ERROR")
    bench._warm(spark, sf_dir)
    out: dict[str, list[float]] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"qtime:{name}")
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            REGISTRY[name].builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(round(time.perf_counter() - t0, 3))
        out[name] = ts
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
