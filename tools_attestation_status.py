"""Attestation freshness report: python tools_attestation_status.py

The external driver attests only the first 50 registered queries each
round (ordering = `_ATTESTATION_PRIORITY` in queries.py) and records
per-query rows/schema/hash matches in CORRECTNESS_r{NN}.json. Window
rotation comments have so far cited a hand-computed union of those
JSONs; this tool computes it, so rotation claims are machine-checkable
(the r3 advisor caught one wrong hand-written attribution).

Prints, from the union of every CORRECTNESS_r*.json in the repo root:
  - per-query latest FULL-green round (rows+schema+hash all true) and
    latest driver row of any kind;
  - registry totals (full-green / rows-only-by-design / failing /
    never-attested);
  - the current 50-slot window with each member's pre-window status —
    flags window slots that are already fresh (wasted slot) and
    non-window queries whose latest green is oldest (rotation seeds);
  - the oldest-stale ordering to seed the NEXT round's window.

Dev/evidence tool only — reads JSONs and queries.py, runs no Spark.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, "/root/repo")

REPO = os.path.dirname(os.path.abspath(__file__))

# q46/q85 ship no oracle by design (HLL estimate / iterative k-means);
# the driver records rows-only for them and their closed-form
# companions q134/q135 carry the full-green evidence instead.
ROWS_ONLY_BY_DESIGN = {"q46_approx_distinct", "q85_ivf_kmeans_ann"}


def load_rounds() -> dict[int, dict]:
    rounds = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            rounds[int(m.group(1))] = json.load(f)
    return rounds


def full_green(entry: dict) -> bool:
    return bool(
        entry.get("rows_match")
        and entry.get("schema_match")
        and entry.get("hash_match")
    )


def rows_only_green(entry: dict) -> bool:
    # The driver's weaker check for oracle-less queries: it records
    # err='no_oracle' with the Spark row count and null match fields.
    # Green = rows recorded and no error other than the by-design one.
    return entry.get("spark_rows") is not None and entry.get("err") in (
        None,
        "no_oracle",
    )


def main() -> int:
    from oculus_data_pipeline_spark.queries import (  # noqa: E402
        QUERIES,
        _ATTESTATION_PRIORITY,
        _attestation_order,
    )

    rounds = load_rounds()
    if not rounds:
        print("no CORRECTNESS_r*.json found")
        return 2

    latest_green: dict[str, int] = {}
    latest_row: dict[str, int] = {}
    latest_state: dict[str, str] = {}
    for rno in sorted(rounds):
        for name, entry in rounds[rno].items():
            if name not in QUERIES:
                continue  # renamed/retired slot; ignore stale rows
            latest_row[name] = rno
            if name in ROWS_ONLY_BY_DESIGN:
                if rows_only_green(entry):
                    latest_green[name] = rno
                    latest_state[name] = "rows-only-by-design"
            elif full_green(entry):
                latest_green[name] = rno
                latest_state[name] = "full-green"
            else:
                latest_state[name] = "FAIL(r%d: rows=%s schema=%s hash=%s)" % (
                    rno,
                    entry.get("rows_match"),
                    entry.get("schema_match"),
                    entry.get("hash_match"),
                )

    never = [n for n in QUERIES if n not in latest_row]
    # A query is "failing" only if its LATEST driver row is not green.
    failing = [
        n
        for n in QUERIES
        if n in latest_row and latest_green.get(n) != latest_row[n]
    ]

    print(f"rounds seen: {sorted(rounds)}")
    print(f"registry: {len(QUERIES)} queries")
    n_full = sum(1 for n in latest_state.values() if n == "full-green")
    n_design = sum(
        1 for n in latest_state.values() if n == "rows-only-by-design"
    )
    print(
        f"latest-row state: {n_full} full-green, {n_design} rows-only-by-design, "
        f"{len(failing)} failing-at-latest, {len(never)} never-attested"
    )
    for n in failing:
        print(
            f"  FAILING {n}: {latest_state.get(n, '?')} "
            f"(last green r{latest_green.get(n, 0)})"
        )
    for n in never:
        print(f"  NEVER-ATTESTED {n}")

    hist: dict[int, int] = {}
    for n in QUERIES:
        hist[latest_green.get(n, 0)] = hist.get(latest_green.get(n, 0), 0) + 1
    print("latest-green histogram (round -> #queries, 0 = never green):")
    for rno in sorted(hist):
        print(f"  r{rno}: {hist[rno]}")

    window = _attestation_order(QUERIES)[:50]
    if list(_ATTESTATION_PRIORITY) != window:
        print("WARNING: _ATTESTATION_PRIORITY does not equal the first 50 "
              "registered queries — window slots are leaking to alphabetical fill")
    fresh_cut = max(rounds)
    fresh = [n for n in window if latest_green.get(n, 0) >= fresh_cut]
    print("\ncurrent window (50): green-age profile")
    print("(a slot already green in the newest JSON is only justified by a "
          "changed execution path or oracle — otherwise it's a wasted slot)")
    for n in window:
        g = latest_green.get(n, 0)
        tag = " <- already green in newest JSON" if n in fresh else ""
        print(f"  {n}: last green r{g}{tag}")

    outside = [n for n in QUERIES if n not in set(window)]
    outside.sort(key=lambda n: (latest_green.get(n, 0), n))
    print("\noldest-green OUTSIDE the window (next-rotation seeds, top 55):")
    for n in outside[:55]:
        print(f"  r{latest_green.get(n, 0)}: {n}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
