"""Interleaved A/B bench comparison between two git trees.

The r10 harness compared trees with ONE bench run each and claimed a
15% win that the judge's own interleaved runs showed to be host noise
(ratio 1.018). Single-run-per-tree comparisons cannot resolve tree
effects smaller than the box's drift (documented ±10% across a
session, ±10-50% for sub-2 s queries); this tool replaces that
protocol per the r10 verdict:

  A/B/A/B... alternating runs (>= 3 pairs), settled starts, each run a
  fresh `python bench.py` subprocess in its own git worktree, and the
  REPORTED number is the per-pair median ratio with its spread — drift
  affects adjacent runs almost equally, so the pairwise ratio cancels
  the box where a cross-session comparison cannot.

Usage:
    python tools_bench_ab.py --tree-a HEAD --tree-b <ref> \
        [--pairs 3] [--sf-dir /root/testdata/sf0.1] [--settle 10]

Prints one JSON line:
  {"tree_a": ..., "tree_b": ..., "pairs": N,
   "pair_total_ratios": [...],          # total_a / total_b per pair
   "median_total_ratio": ..., "spread": [min, max],
   "per_query_median_ratio": ...,       # median over queries of
                                        # median-over-pairs a/b
   "noise_bound": ...,                  # max |pair ratio - median|
   "verdict": "A faster" | "B faster" | "within noise"}
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile
import time


def _run_bench(tree_dir: str, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=tree_dir,
        env=env,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    # bench prints TWO JSON lines (main + truncation-proof top15);
    # the main one carries "metric"
    for line in reversed(out.strip().splitlines()):
        line = line.strip()
        if line.startswith("{") and '"metric"' in line:
            return json.loads(line)
    raise RuntimeError(f"no main JSON line in bench output from {tree_dir}")


def _make_worktree(repo: str, ref: str, base: str) -> str:
    path = os.path.join(base, f"wt_{ref.replace('/', '_')}_{os.getpid()}")
    subprocess.run(
        ["git", "-C", repo, "worktree", "add", "--detach", path, ref],
        check=True,
        capture_output=True,
    )
    return path


def _drop_worktree(repo: str, path: str) -> None:
    subprocess.run(
        ["git", "-C", repo, "worktree", "remove", "--force", path],
        check=False,
        capture_output=True,
    )


def summarize(
    pair_ratios: list[float], per_query: dict[str, list[float]]
) -> dict:
    """Ratio statistics + the conservative verdict: a tree is only
    called faster/slower when the WHOLE noise band (median ± max
    deviation) clears 1.0 — a median alone can sit 10% off 1.0 purely
    from one contaminated pair on this box."""
    med = statistics.median(pair_ratios)
    noise = max(abs(r - med) for r in pair_ratios)
    pq_med = (
        statistics.median(
            statistics.median(v) for v in per_query.values()
        )
        if per_query
        else float("nan")
    )
    if med + noise < 1.0:
        verdict = "A faster"
    elif med - noise > 1.0:
        verdict = "B faster"
    else:
        verdict = "within noise"
    return {
        "pair_total_ratios": [round(r, 4) for r in pair_ratios],
        "median_total_ratio": round(med, 4),
        "spread": [round(min(pair_ratios), 4), round(max(pair_ratios), 4)],
        "per_query_median_ratio": round(pq_med, 4),
        "noise_bound": round(noise, 4),
        "verdict": verdict,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tree-a", default="HEAD")
    ap.add_argument("--tree-b", required=True)
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument(
        "--settle",
        type=float,
        default=10.0,
        help="seconds to sleep before each run (settled starts)",
    )
    ap.add_argument(
        "--repo", default=os.path.dirname(os.path.abspath(__file__))
    )
    args = ap.parse_args()
    if args.pairs < 3:
        ap.error("--pairs must be >= 3 (one pair cannot bound noise)")

    base = tempfile.mkdtemp(prefix="bench_ab_")
    wt_a = _make_worktree(args.repo, args.tree_a, base)
    wt_b = _make_worktree(args.repo, args.tree_b, base)
    try:
        pair_ratios: list[float] = []
        per_query: dict[str, list[float]] = {}
        totals: list[tuple[float, float]] = []
        for p in range(args.pairs):
            # alternate run order per pair (A/B, B/A, A/B, ...): load
            # drifting DURING a pair flatters whichever tree runs
            # second, so a fixed order turns monotone drift into a
            # systematic tree bias — alternation cancels it across
            # pairs (observed in this tool's first deployment: totals
            # rose 173→203 s across 3 pairs and the fixed A-first
            # order pushed every later ratio up)
            first_a = p % 2 == 0
            time.sleep(args.settle)
            r1 = _run_bench(wt_a if first_a else wt_b, args.sf_dir)
            time.sleep(args.settle)
            r2 = _run_bench(wt_b if first_a else wt_a, args.sf_dir)
            ra, rb = (r1, r2) if first_a else (r2, r1)
            totals.append((ra["value"], rb["value"]))
            pair_ratios.append(ra["value"] / rb["value"])
            for q in set(ra["queries"]) & set(rb["queries"]):
                if rb["queries"][q] > 0:
                    per_query.setdefault(q, []).append(
                        ra["queries"][q] / rb["queries"][q]
                    )
            print(
                f"# pair {p + 1}/{args.pairs}: A={ra['value']:.1f}s "
                f"B={rb['value']:.1f}s ratio={pair_ratios[-1]:.3f}",
                file=sys.stderr,
            )
        summary = summarize(pair_ratios, per_query)
        summary.update(
            tree_a=args.tree_a,
            tree_b=args.tree_b,
            sf_dir=args.sf_dir,
            pairs=args.pairs,
            totals=totals,
        )
        print(json.dumps(summary))
    finally:
        _drop_worktree(args.repo, wt_a)
        _drop_worktree(args.repo, wt_b)


if __name__ == "__main__":
    main()
