"""Giant-group probe: time the prefix-scan consumers (q122 sequence
packing, q190 pack manifest) on a fixture where ONE source owns 50% of
all documents — the motivating case in operators/prefixsum.py's
docstring (at 100 TB one crawl source can be half the corpus, so a
``W.partitionBy(source)`` running sum would put half the data in one
task) — at 1× and K× volume, and record the growth exponents in
SCALING.md (r6 verdict item 4: the skewed case was covered by a unit
test but not a timing probe).

Fixture: sf0.1 documents with ``source`` remapped to 'giant' for a
deterministic (xxhash64) half of rows; the K× variant replicates with
disjoint doc_ids and a " copyset{i}" text suffix, remapped the same
way so the giant group scales with the corpus. (tools_scaling_probe
moved to a per-replica word SHUFFLE in r9 because suffixed replicas
are near-dup cliques that corrupt similarity exponents — irrelevant
here: q122/q190 consume token counts and group sizes, not
similarity, so the cheap suffix stays.) Only documents.parquet is
written — both queries read nothing else.

Stderr is captured across the timed runs and scanned for
``WindowExec: No Partition Defined`` (the warning count is printed and
recorded — it must be zero: the whole point of the prefix scan is that
no window sees the giant group whole).

Writes a marker-delimited section that tools_scaling_probe.py
preserves when it regenerates the main table.
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from oculus_data_pipeline_spark.queries import get_queries
from oculus_data_pipeline_spark.session import get_spark
from oculus_data_pipeline_spark.sources.tables import load_table

MARK_START = "<!-- giant-group-probe -->"
MARK_END = "<!-- /giant-group-probe -->"

SRC = "/root/testdata/sf0.1"
K = int(os.environ.get("SCALE_K", "8"))
PROBES = ["q122_sequence_packing", "q190_pack_manifest"]
DOC_ID_STRIDE = 1_000_000  # same as tools_scaling_probe.KEY_SHIFTS


def _remap_giant(df):
    # deterministic half of rows lands in one giant source
    return df.withColumn(
        "source",
        F.when(F.pmod(F.xxhash64("doc_id"), 2) == 0, F.lit("giant")).otherwise(
            F.col("source")
        ),
    )


def build_fixtures(spark, base_dir: str, big_dir: str) -> None:
    src = load_table(spark, SRC, "documents")
    _remap_giant(src).write.mode("overwrite").parquet(
        os.path.join(base_dir, "documents.parquet")
    )
    parts = []
    for i in range(K):
        df = src.withColumn("doc_id", F.col("doc_id") + F.lit(i * DOC_ID_STRIDE))
        if i > 0:
            df = df.withColumn("text", F.concat(F.col("text"), F.lit(f" copyset{i}")))
        parts.append(df)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    _remap_giant(out).write.mode("overwrite").parquet(
        os.path.join(big_dir, "documents.parquet")
    )


def time_query(spark, qs, name: str, sf_dir: str) -> float:
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    return best


def verdict(alpha: float) -> str:
    # same tiers as tools_scaling_probe (±30% box noise shifts alpha
    # by ~0.13 at K=8, hence the margins)
    if alpha <= 1 / 3:
        return "sub-linear"
    if alpha <= 0.85:
        return "~linear"
    if alpha <= 1.1:
        return "linear"
    return "SUPER-LINEAR"


def main() -> None:
    # capture fd 2 BEFORE creating the session: the JVM subprocess
    # inherits fd 2 at launch, so a dup2 after get_spark would leave
    # log4j writing to the real terminal and the warning count below
    # would be vacuously 0 no matter what the plans did (bench.py
    # orders these the same way, and a round-7 self-review caught this
    # probe getting it backwards)
    orig_err = os.dup(2)
    cap = tempfile.NamedTemporaryFile(prefix="giant_stderr_", delete=False)
    os.dup2(cap.fileno(), 2)
    tmp = tempfile.mkdtemp(prefix="giant_group_")
    base_dir = os.path.join(tmp, "base")
    big_dir = os.path.join(tmp, f"x{K}")
    try:
        spark = get_spark("giant-group-probe")
        qs = get_queries()
        build_fixtures(spark, base_dir, big_dir)
        rows = []
        for name in PROBES:
            # warm BOTH directories identically: the Kx side would
            # otherwise pay first-touch parquet/footer costs the 1x
            # side never pays, biasing alpha upward near tier edges
            time_query(spark, qs, name, base_dir)
            time_query(spark, qs, name, big_dir)
            t1 = time_query(spark, qs, name, base_dir)
            tk = time_query(spark, qs, name, big_dir)
            alpha = math.log(max(tk, 1e-9) / max(t1, 1e-9)) / math.log(K)
            rows.append((name, t1, tk, tk / t1, alpha, verdict(alpha)))
    finally:
        sys.stderr.flush()
        os.dup2(orig_err, 2)
        os.close(orig_err)
        cap.seek(0)
        captured = cap.read()
        cap.close()
        os.unlink(cap.name)
        os.write(2, captured)
        shutil.rmtree(tmp, ignore_errors=True)
    n_warn = captured.count(b"WindowExec: No Partition Defined")

    giant_pct = 50
    section = "\n".join(
        [
            MARK_START,
            "",
            "## Giant-group probe (generated by tools_giant_group_probe.py)",
            "",
            f"Fixture: sf0.1 documents with ONE source ('giant') owning",
            f"~{giant_pct}% of all rows (deterministic xxhash64 half), timed at",
            f"1x and {K}x volume (disjoint doc_ids, perturbed text — same",
            "replication as the main table above). This is the case the",
            "distributed prefix scan (operators/prefixsum.py) exists for:",
            "a source-partitioned running-sum window would put half the",
            "corpus in one task; the scan's per-(partition, group) passes",
            "keep every task domain-bounded regardless of group skew.",
            "",
            "| query | 1x (s) | " + f"{K}x (s) | ratio | alpha | verdict |",
            "|---|---|---|---|---|---|",
        ]
        + [
            f"| {n} | {t1:.2f} | {tk:.2f} | {r:.1f}x | {a:.2f} | {v} |"
            for n, t1, tk, r, a, v in rows
        ]
        + [
            "",
            f"Unpartitioned-window warnings across all timed runs: **{n_warn}**",
            "(must be 0 — no window ever sees the giant group whole).",
            "",
            MARK_END,
        ]
    )

    path = "SCALING.md"
    text = open(path).read() if os.path.exists(path) else ""
    if MARK_START in text:
        pre = text.split(MARK_START)[0].rstrip("\n")
        post = text.split(MARK_END, 1)[1] if MARK_END in text else ""
        text = pre + "\n\n" + section + post
    else:
        text = text.rstrip("\n") + "\n\n" + section + "\n"
    with open(path, "w") as f:
        f.write(text)
    for n, t1, tk, r, a, v in rows:
        print(f"{n}: 1x={t1:.2f}s {K}x={tk:.2f}s ratio={r:.1f}x alpha={a:.2f} {v}")
    print(f"unpartitioned_window_warnings={n_warn}")


if __name__ == "__main__":
    main()
