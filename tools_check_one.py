"""Quick single-query oracle check: python tools_check_one.py qNNN [qMMM ...]

Runs each named registry query against its DuckDB oracle at sf0.001
and sf0.01 using the same exact-value compare the test suite uses.
Dev tool only — the suite (tests/test_oracle_queries.py) is the gate.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from oracle_harness import compare, duckdb_conn  # noqa: E402

from oculus_data_pipeline_spark.queries import ORACLE, QUERIES  # noqa: E402
from oculus_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    prefixes = sys.argv[1:]
    names = [n for n in QUERIES if any(n.startswith(p) for p in prefixes)]
    if not names:
        print(f"no queries match {prefixes}")
        return 2
    spark = get_spark("check-one", cpus=8, shuffle_partitions=8)
    rc = 0
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        conn = duckdb_conn(sf_dir)
        for n in names:
            df = QUERIES[n](spark, sf_dir)
            if n not in ORACLE:
                print(f"{sf_dir} {n}: rows={df.count()} (no oracle)")
                continue
            problems = compare(df, conn, ORACLE[n], n)
            nrows = df.count()
            if problems:
                rc = 1
                print(f"{sf_dir} {n}: FAIL rows={nrows}")
                for p in problems[:8]:
                    print("   ", p)
            else:
                status = "pass" if nrows > 0 else "VACUOUS (0 rows)"
                print(f"{sf_dir} {n}: {status} rows={nrows}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
