"""Determinism stress: N consecutive sf0.1 evaluations of the named
queries with full row-set compares (LOCAL_HARNESS §8 evidence).

    python tools_determinism_stress.py q139 q141 q61 [...]

Each query is materialized N (default 3) times in one session; the
sorted full row sets must be identical across runs. Catches
nondeterministic plans (unstable tie-breaks, float reduction order,
rounding drift) that a single oracle compare can miss.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from oculus_data_pipeline_spark.queries import QUERIES
from oculus_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = int(os.environ.get("SPARK_GRAFT_DET_RUNS", "3"))


def main() -> int:
    prefixes = sys.argv[1:]
    names = [n for n in QUERIES if any(n.startswith(p) for p in prefixes)]
    if not names:
        print(f"no queries match {prefixes}")
        return 2
    spark = get_spark("det-stress")
    rc = 0
    for n in names:
        runs = []
        for _ in range(N_RUNS):
            df = QUERIES[n](spark, SF_DIR)
            runs.append(sorted(tuple(r) for r in df.collect()))
        same = all(r == runs[0] for r in runs[1:])
        print(f"{n} rows {len(runs[0])} {N_RUNS}-run identical: {same}")
        if not same:
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
