"""Measures the r8 verdict's item-4 question: is the root-hook join's
per-round cost at toy scale trimmable, or is per-round job latency the
irreducible floor?

The only sound trim of the verdict's option (a) — "skip the hook join
on rounds where the neighbor-min step already changed nothing" — is
the FINAL round, by the quiescence theorem: if the neighbor-min step
changes no label, then along every edge (u,v) both comp[u] <= comp[v]
and comp[v] <= comp[u] hold (each node's label is already <= all its
neighbors'), so comp is CONSTANT per connected component; the constant
is a member node c with comp[c] = c and comp[u] <= u for all u, hence
c = the component min — i.e. the algorithm has fully converged and the
hook and jump stages cannot change anything either. On every earlier
round the neighbor-min delta is non-empty (otherwise the loop would
have stopped), so there is no mid-run round where the skip applies.
Detecting the empty delta BEFORE building the hook therefore needs no
extra probe job — the convergence count just moves from the round's
tail (after hook+jump) to its head (after neighbor-min), and the final
round simply never builds its hook+jump stages.

This probe times the shipped connected_components against that
skip-final-hook variant on q97's REAL near-dup edge set at the bench
SF, verifies both produce identical components, and reports the
per-round decomposition. Decision rule (the box's noise band is ±30%
per memory'd measurement): a delta inside the band = commit the
latency-floor argument in SCALING.md; a delta beyond it = adopt the
variant (which re-plans all 8 CC consumers and re-opens their
attestation rows).

Run: python tools_cc_hook_probe.py 2>/dev/null   (~3 min at sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from oculus_data_pipeline_spark.operators import similarity
from oculus_data_pipeline_spark.session import get_spark
from oculus_data_pipeline_spark.sources.tables import load_table

REPS = 5
# The box's run-to-run noise band per memory'd measurement; the
# docstring's decision rule compares the measured delta against it.
NOISE_BAND = 0.30


def cc_skip_final_hook(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 64,
    stats: dict | None = None,
) -> DataFrame:
    """connected_components with the convergence count moved to the
    neighbor-min delta (sound per the module docstring's quiescence
    theorem): the final round materializes only the neighbor-min step;
    hook+jump of round r materialize lazily inside round r+1's count
    job, so the job count per round is unchanged and the quiescence
    round is strictly lighter. Semantics identical: same fixpoint,
    same raise-on-non-convergence."""
    s, d = F.col(src), F.col(dst)
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(s.alias("a"), d.alias("b")),
                    F.struct(d.alias("a"), s.alias("b")),
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .distinct()
        .repartition("b")
        .persist()
    )
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=False)
    )
    changed = 1
    for it in range(max_iterations):
        if stats is not None:
            stats["iterations"] = it + 1
        neighbor_min = (
            sym.join(labels, sym.b == labels.id)
            .groupBy("a")
            .agg(F.min("comp").alias("nmin"))
        )
        stepped = (
            labels.join(neighbor_min, labels.id == neighbor_min.a, "left")
            .select(
                "id",
                "comp",
                F.least(
                    F.col("comp"), F.coalesce("nmin", F.col("comp"))
                ).alias("mid"),
            )
            .localCheckpoint(eager=False)
        )
        # the convergence count now rides the NEIGHBOR-MIN output (and
        # materializes the previous round's lazy hook+jump lineage) —
        # one job per round, same as the shipped version
        changed = stepped.where("mid < comp").limit(1).count()
        if changed == 0:
            labels = stepped.select("id", "comp")
            break
        hooks = stepped.groupBy("comp").agg(F.min("mid").alias("hmin"))
        hooked = stepped.join(hooks, "comp").select(
            "id", F.least("mid", "hmin").alias("mid2")
        )
        jump = stepped.select(
            F.col("id").alias("jid"), F.col("comp").alias("jcomp")
        )
        labels = (
            hooked.join(jump, hooked.mid2 == jump.jid, "left")
            .select(
                "id",
                F.least(
                    F.col("mid2"), F.coalesce("jcomp", F.col("mid2"))
                ).alias("comp"),
            )
            .localCheckpoint(eager=False)
        )
    sym.unpersist()
    if changed != 0:
        raise RuntimeError(
            f"cc_skip_final_hook did not converge in {max_iterations} rounds"
        )
    return labels.select("id", "comp")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("cc-hook-probe")
    from oculus_data_pipeline_spark.operators.graph_algo import (
        connected_components,
    )

    # q97's real edge set, eagerly pinned so the probe times CC alone
    edges = similarity.lsh_near_dup_pairs(
        load_table(spark, sf_dir, "embeddings"), threshold=0.4, p_max=16
    ).localCheckpoint()
    n_edges = edges.count()

    # warm BOTH variants (one throwaway run each): the r9 review caught
    # the original probe warming only the shipped CC and timing the
    # variant against a warmer JVM/page cache — a bias in the variant's
    # favor on a probe whose adopt/don't decision rides this comparison
    for fn in (connected_components, cc_skip_final_hook):
        fn(edges, src="id_a", dst="id_b").write.format("noop").mode(
            "overwrite"
        ).save()

    # fair alternating A/B — shipped, variant, shipped, variant, ... —
    # so slow drift (GC state, page cache, external load) biases
    # neither side; min-of-REPS per side
    times: dict[str, list[float]] = {"cur": [], "new": []}
    rounds: dict[str, int] = {}
    for _ in range(REPS):
        for key, fn in (
            ("cur", connected_components),
            ("new", cc_skip_final_hook),
        ):
            stats: dict = {}
            t0 = time.perf_counter()
            fn(edges, src="id_a", dst="id_b", stats=stats).write.format(
                "noop"
            ).mode("overwrite").save()
            times[key].append(time.perf_counter() - t0)
            rounds[key] = stats["iterations"]
    t_cur, t_new = min(times["cur"]), min(times["new"])
    r_cur, r_new = rounds["cur"], rounds["new"]

    # identical output?
    a = connected_components(edges, src="id_a", dst="id_b")
    b = cc_skip_final_hook(edges, src="id_a", dst="id_b")
    same = (
        a.exceptAll(b).limit(1).count() == 0
        and b.exceptAll(a).limit(1).count() == 0
    )

    # per-round fixed-latency floor: a minimal count job over the
    # already-checkpointed labels-sized df, REPS reps
    probe_df = edges.select(F.col("id_a").alias("id")).distinct().localCheckpoint()
    floors = []
    for _ in range(REPS * 2):
        t0 = time.perf_counter()
        probe_df.where("id < 0").limit(1).count()
        floors.append(time.perf_counter() - t0)
    floor = min(floors)

    # the verdict is DERIVED from this run's measurement (r9 review:
    # the original report hard-coded a prior run's numbers and its
    # conclusion, so a rerun whose data refuted the prose would still
    # persist the prose)
    delta = (t_cur - t_new) / t_cur
    if delta <= NOISE_BAND:
        decision = (
            f"The measured benefit of skipping that one round's hook+jump\n"
            f"stages is {delta * 100:.0f}% of the CC portion "
            f"({t_cur:.2f}s vs {t_new:.2f}s minima,\n"
            f"{REPS} alternating reps per side, both variants warmed) — "
            f"inside the\n"
            f"box's +/-{NOISE_BAND * 100:.0f}% noise band. NOT adopted: the "
            f"absolute delta\n"
            f"({t_cur - t_new:.2f}s) does not buy back re-planning all 8 CC "
            f"consumers,\n"
            "and the per-round structure it would trim is exactly what\n"
            "converges in O(log n) rounds at 100x — where per-round cost\n"
            "is shuffle-of-|edges| bound and the hook's two extra bounded\n"
            "stages are noise against non-convergence.\n"
        )
    else:
        decision = (
            f"The measured benefit is {delta * 100:.0f}% of the CC portion "
            f"({t_cur:.2f}s vs\n"
            f"{t_new:.2f}s minima, {REPS} alternating reps per side, both "
            f"variants\n"
            f"warmed) — BEYOND the +/-{NOISE_BAND * 100:.0f}% noise band. "
            f"Per the decision\n"
            "rule, ADOPT the skip-final-hook variant (a code change this\n"
            "probe does not make: it re-plans all 8 CC consumers and\n"
            "re-opens their attestation rows). This section records the\n"
            "measurement that forces it.\n"
        )
    report = (
        f"q97 edge set: {n_edges} edges at {sf_dir}\n"
        f"shipped CC:          best of {REPS} = {t_cur:.2f}s, rounds={r_cur}\n"
        f"skip-final-hook CC:  best of {REPS} = {t_new:.2f}s, rounds={r_new} "
        f"(identical components: {same})\n"
        f"min per-JOB fixed latency (count over a checkpointed df): "
        f"{floor * 1000:.0f} ms -> rounds x per-job = {r_cur * floor:.2f}s "
        f"of the {t_cur:.2f}s total;\n"
        f"the remainder is per-STAGE scheduling of the ~6 shuffle stages\n"
        f"each round fuses, plus the bounded shuffles themselves.\n"
        "\n"
        "Verdict (r8 item 4, measured r9): the only sound application of\n"
        '"skip the hook when neighbor-min changed nothing" is the FINAL\n'
        "round — by the quiescence theorem (module docstring) an empty\n"
        "neighbor-min delta already proves full convergence, and every\n"
        "earlier round has a non-empty delta or the loop would have\n"
        "stopped. " + decision
    )
    print(report)

    # persist as a marker-delimited SCALING.md section (preserved by
    # tools_scaling_probe.py regenerations, like skew-probe)
    marker_s, marker_e = "<!-- cc-hook-cost -->", "<!-- /cc-hook-cost -->"
    section = (
        f"\n{marker_s}\n\n"
        "## CC root-hook marginal cost (generated by tools_cc_hook_probe.py)\n\n"
        "```\n" + report + "```\n" + marker_e + "\n"
    )
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "SCALING.md")
    if os.path.exists(path):
        text = open(path).read()
        if marker_s in text and marker_e in text:
            head, rest = text.split(marker_s, 1)
            _, tail = rest.split(marker_e, 1)
            text = head.rstrip("\n") + "\n" + section + tail
        else:
            text = text.rstrip("\n") + "\n" + section
        with open(path, "w") as f:
            f.write(text)
        print("SCALING.md cc-hook-cost section written")


if __name__ == "__main__":
    main()
