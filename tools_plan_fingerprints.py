"""Per-query plan fingerprints — the machine-derived source of the
bench JSON's "replanned" key (r7 verdict item 1: the hand-maintained
bench.REPLANNED list had no reset enforcement, so one forgotten edit
would mis-attribute ordinary noise to a re-plan).

For every registered query this tool builds the DataFrame at a FIXED
scale factor (sf0.001 — plan-build only plus whatever bounded jobs
plan construction itself runs, e.g. the LSH COUNT(*) sizing pass or
IVF centroid collects) and hashes the NORMALIZED optimized logical
plan. Normalization strips the run-varying parts — expression ids
(``#123``), JVM object addresses (``@1a2b3c``), checkpoint RDD
numbers — so the hash is stable across processes for an unchanged
plan and changes exactly when the logical plan (operators, join
shapes, expressions, literals) changes.

Round protocol:
  python tools_plan_fingerprints.py --round N        # write PLAN_FINGERPRINTS_rN.json
  python tools_plan_fingerprints.py --check          # recompute, diff vs newest committed file
bench.py emits  replanned = diff(two newest committed snapshots);
tests/test_plan_fingerprints.py pins the derivation and (env-gated,
SPARK_GRAFT_FP_CHECK=1) that the newest snapshot matches the tree.
"""

from __future__ import annotations

import argparse
import glob
import hashlib
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

FP_SF_DIR = "/root/testdata/sf0.001"
FP_GLOB = "PLAN_FINGERPRINTS_r*.json"

_NORM_PATTERNS = [
    (re.compile(r"#\d+"), "#"),                      # expression ids
    (re.compile(r"@[0-9a-fA-F]{4,}"), "@"),          # JVM object addresses
    (re.compile(r"\bSQLQueryContext\([^)]*\)"), ""),
    (re.compile(r"\bStatistics\([^)]*\)"), ""),
    # localCheckpoint materializations surface as LogicalRDD/ExistingRDD
    # whose only varying token is the (already-stripped) expr ids; the
    # RDD name embeds a numeric id in some renderings:
    (re.compile(r"\bMapPartitionsRDD\[\d+\]"), "MapPartitionsRDD[]"),
    (re.compile(r"\[plan_id=\d+\]"), "[plan_id=]"),
]


def normalize_plan(text: str) -> str:
    for pat, rep in _NORM_PATTERNS:
        text = pat.sub(rep, text)
    # collapse whitespace so renderer wrapping changes don't churn hashes
    return re.sub(r"\s+", " ", text).strip()


def plan_fingerprint(df) -> str:
    text = df._jdf.queryExecution().optimizedPlan().toString()
    return hashlib.sha256(normalize_plan(text).encode()).hexdigest()[:16]


def compute_all(sf_dir: str = FP_SF_DIR, names: list[str] | None = None) -> dict[str, str]:
    from oculus_data_pipeline_spark.queries import get_queries
    from oculus_data_pipeline_spark.session import get_spark

    spark = get_spark("plan-fingerprints")
    out: dict[str, str] = {}
    for name, fn in sorted(get_queries().items()):
        if names and name not in names:
            continue
        try:
            out[name] = plan_fingerprint(fn(spark, sf_dir))
        except Exception as exc:  # a broken plan must be loud, not absent
            out[name] = f"ERROR:{type(exc).__name__}"
    return out


def committed_snapshots(repo_dir: str | None = None) -> list[tuple[int, str]]:
    """[(round, path)] for every committed snapshot, ascending round."""
    repo_dir = repo_dir or os.path.dirname(os.path.abspath(__file__))
    snaps = []
    for p in glob.glob(os.path.join(repo_dir, FP_GLOB)):
        m = re.search(r"_r(\d+)\.json$", p)
        if m:
            snaps.append((int(m.group(1)), p))
    return sorted(snaps)


def derive_replanned(repo_dir: str | None = None) -> list[str]:
    """The bench "replanned" key: queries whose fingerprint differs
    between the two newest committed snapshots (new queries count —
    their plan is new by definition). With fewer than two snapshots
    there is no baseline, so nothing is claimed."""
    snaps = committed_snapshots(repo_dir)
    if len(snaps) < 2:
        return []
    with open(snaps[-2][1]) as f:
        prev = json.load(f)["fingerprints"]
    with open(snaps[-1][1]) as f:
        cur = json.load(f)["fingerprints"]
    return sorted(q for q, h in cur.items() if prev.get(q) != h)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, help="write PLAN_FINGERPRINTS_r<N>.json")
    ap.add_argument("--check", action="store_true",
                    help="recompute and diff vs the newest committed snapshot")
    ap.add_argument("--sf-dir", default=FP_SF_DIR)
    ap.add_argument("--only", nargs="*", help="restrict to these query names")
    args = ap.parse_args()

    fps = compute_all(args.sf_dir, args.only)
    errors = {q: h for q, h in fps.items() if h.startswith("ERROR")}
    if errors:
        print(f"PLAN BUILD ERRORS: {errors}", file=sys.stderr)

    if args.check:
        snaps = committed_snapshots()
        if not snaps:
            print("no committed snapshot to check against", file=sys.stderr)
            sys.exit(2)
        with open(snaps[-1][1]) as f:
            committed = json.load(f)["fingerprints"]
        diff = sorted(
            q for q in set(fps) | set(committed)
            if fps.get(q) != committed.get(q)
        )
        print(json.dumps({"snapshot": snaps[-1][1], "diff": diff}))
        sys.exit(1 if diff else 0)

    if args.round is None:
        print(json.dumps(fps, indent=0))
        return
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"PLAN_FINGERPRINTS_r{args.round}.json",
    )
    with open(path, "w") as f:
        json.dump(
            {"round": args.round, "sf_dir": args.sf_dir, "fingerprints": fps},
            f, indent=1, sort_keys=True,
        )
        f.write("\n")
    print(f"wrote {path} ({len(fps)} queries, {len(errors)} errors)")


if __name__ == "__main__":
    main()
