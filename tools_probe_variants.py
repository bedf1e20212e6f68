"""Same-session interleaved variant probe: time a query under a
baseline/variant toggle A/B/A/B within ONE SparkSession, so box drift
cancels pairwise (the protocol OPTIMIZATION_r11 §1 adopted after the
r10 single-run comparison was shown unsound).

Variants are monkeypatches that flip exactly one mechanism:

  nockpt   — DataFrame.localCheckpoint / persist become identity, so a
             query that checkpoints a shared intermediate recomputes it
             per branch instead (the q161-family question, VERDICT r11
             item 3).
  nofanout — sources.tables._fanout becomes identity, so the scan is
             NOT re-spread after the read (the cost-aware-fanout
             question, VERDICT r11 item 2). The handle memo is cleared
             around every toggle so both arms build fresh plans.

Usage:
  python tools_probe_variants.py nockpt q161 q214 [--pairs 4]
  python tools_probe_variants.py nofanout q199 q172 [--pairs 4]

Prints one JSON line per query: per-pair (base_s, variant_s) and the
median variant/base ratio. Dev/evidence tool only — never run by the
driver.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame  # noqa: E402

from oculus_data_pipeline_spark.queries import QUERIES  # noqa: E402
from oculus_data_pipeline_spark.session import get_spark  # noqa: E402
from oculus_data_pipeline_spark.sources import tables  # noqa: E402


def _clear_handles() -> None:
    tables._HANDLE_CACHE.clear()


class _NoCkpt:
    """localCheckpoint(eager=False) and persist() -> identity."""

    def __enter__(self):
        self._lc = DataFrame.localCheckpoint
        self._p = DataFrame.persist
        DataFrame.localCheckpoint = lambda self, eager=True: self
        DataFrame.persist = lambda self, *a, **k: self
        return self

    def __exit__(self, *exc):
        DataFrame.localCheckpoint = self._lc
        DataFrame.persist = self._p


class _NoFanout:
    def __enter__(self):
        self._f = tables._fanout
        tables._fanout = lambda spark, df, name, path: df
        return self

    def __exit__(self, *exc):
        tables._fanout = self._f


class _ForceFanout:
    """Force fanout=True regardless of the caller's flag — for
    re-probing queries that default to fanout=False since r12."""

    def __enter__(self):
        import oculus_data_pipeline_spark.queries as qmod

        self._lt = tables.load_table
        forced = lambda spark, sf_dir, name, fanout=False: self._lt(  # noqa: E731
            spark, sf_dir, name, fanout=True
        )
        tables.load_table = forced
        qmod.load_table = forced
        return self

    def __exit__(self, *exc):
        import oculus_data_pipeline_spark.queries as qmod

        tables.load_table = self._lt
        qmod.load_table = self._lt


VARIANTS = {
    "nockpt": _NoCkpt,
    "nofanout": _NoFanout,
    "forcefanout": _ForceFanout,
}


def time_query(spark, name: str, sf_dir: str) -> float:
    t0 = time.perf_counter()
    df = QUERIES[name](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("variant", choices=sorted(VARIANTS))
    ap.add_argument("prefixes", nargs="+")
    ap.add_argument("--pairs", type=int, default=4)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    names = [
        n for n in QUERIES if any(n.startswith(p) for p in args.prefixes)
    ]
    if not names:
        print(f"no queries match {args.prefixes}")
        return 2

    spark = get_spark("probe-variants")
    # warm the JVM + page cache the way bench.py does (shortened)
    import glob
    import os

    for tbl in sorted(glob.glob(os.path.join(args.sf_dir, "*.parquet"))):
        spark.read.parquet(tbl).write.format("noop").mode("overwrite").save()

    patch = VARIANTS[args.variant]
    for name in names:
        pairs: list[tuple[float, float]] = []
        for p in range(args.pairs):
            order = ["base", "var"] if p % 2 == 0 else ["var", "base"]
            got = {}
            for arm in order:
                _clear_handles()
                if arm == "var":
                    with patch():
                        got[arm] = time_query(spark, name, args.sf_dir)
                else:
                    got[arm] = time_query(spark, name, args.sf_dir)
            pairs.append((round(got["base"], 3), round(got["var"], 3)))
        ratios = [v / b for b, v in pairs if b > 0]
        print(
            json.dumps(
                {
                    "query": name,
                    "variant": args.variant,
                    "pairs_base_var": pairs,
                    "median_ratio_var_over_base": round(
                        statistics.median(ratios), 3
                    ),
                }
            )
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
