"""Dump `.explain("formatted")` for headline queries to text files.

Usage: python tools_dump_plans.py <out_dir> [suffix] [qprefix ...]

Writes <out_dir>/<query>_<suffix>.txt for each headline query (or the
subset matching the given prefixes) at $SPARK_GRAFT_SF_DIR (default
sf0.1). Plans are captured WITHOUT executing the query (AQE initial
plan — isFinalPlan=false — which is the comparable artifact across
trees; the optimization evidence in OPTIMIZATION_r11.md quotes these
files).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import HEADLINE
from oculus_data_pipeline_spark.queries import get_queries
from oculus_data_pipeline_spark.session import get_spark


def main() -> int:
    out_dir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "plan"
    prefixes = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    names = [
        n
        for n in HEADLINE
        if not prefixes or any(n.startswith(p) for p in prefixes)
    ]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump-plans")
    queries = get_queries()
    for n in names:
        try:
            df = queries[n](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # a broken query should not kill the dump
            plan = f"ERROR building/explaining {n}: {type(e).__name__}: {e}"
        with open(os.path.join(out_dir, f"{n}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(n, "ok" if not plan.startswith("ERROR") else "ERROR")
    return 0


if __name__ == "__main__":
    sys.exit(main())
