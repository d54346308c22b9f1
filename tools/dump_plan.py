#!/usr/bin/env python3
"""Dump .explain("formatted") for registry queries to plans/<round>/ (GFAOOA_PLAN_ROUND, default r16).

Usage: python tools/dump_plan.py SUFFIX name [name ...]

Writes plans/<round>/<name>_<SUFFIX>.txt for each named query (built at
sf0.1 — plan shape, not execution). SUFFIX is normally "before" or
"after".
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from guidance_for_analytics_observability_on_aws_spark.plans.registry import REGISTRY  # noqa: E402
from guidance_for_analytics_observability_on_aws_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("GFAOOA_PLAN_ROUND", "r16"))


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("gfaooa-dump-plan")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = REGISTRY[name].builder(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
