"""Scaling probe: replicate the sf0.1 tables ×K with disjoint keys into
a temp dir, run headline operators at 1× and K×, and record the runtime
ratio → SCALING.md. Near-K× (or better) ratios mean the plans scale
with data, not with overhead; super-K× ratios flag quadratic terms.

Facts (lineitem/orders/events/documents) are replicated with shifted
keys; dims stay fixed (the realistic shape of growth).
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
from oculus_data_pipeline_spark.sources.tables import TABLES, load_table

K = int(os.environ.get("SCALE_K", "8"))
SRC = "/root/testdata/sf0.1"

# Plans whose asymptotic growth is known from their construction,
# independent of what this box measures at this fixture size.
KNOWN_ASYMPTOTES = {
    "q133_allpairs_jaccard_exact": (
        "known Σdf² QUADRATIC asymptote (unguarded all-pairs, opt-in "
        "QA tier; q31/q32/q66 are the scale paths)"
    ),
    # The synthetic embedding corpus has CONSTANT pair density at the
    # cos≥0.4 near-dup threshold (measured r9 with exact numpy
    # all-pairs: 62/246/920 true pairs at N=500/1000/2000 — ×4 per
    # doubling — and ZERO pairs above cos 0.6, i.e. background
    # moderate-similarity pairs, not bounded dup clusters). Emitted
    # pairs therefore grow ∝ N² by the DATA's nature — any
    # exact-output plan is Ω(true pairs) here. The plan keeps
    # candidates-per-vector constant via auto-sized P, which is the
    # optimum; on a real dedup corpus (bounded cluster sizes, pairs
    # ∝ N) the same plan is Θ(N).
    "q51_cosine_near_dup_pairs": (
        "OUTPUT-BOUND on this corpus: constant cos≥0.4 pair density "
        "→ true pairs ∝ N² (no plan avoids Ω(output)); "
        "bounded-cluster corpora give Θ(N)"
    ),
    "q97_semantic_clusters": (
        "rides the q51 edge set — OUTPUT-BOUND on this corpus "
        "(true pairs ∝ N²); bounded-cluster corpora give Θ(N)"
    ),
    "q121_hybrid_near_dup_report": (
        "semantic leg rides the q51 edge set — OUTPUT-BOUND on this "
        "corpus (true pairs ∝ N²); lexical leg is linear"
    ),
}
PROBES = [
    "q01_pricing_summary",
    "q03_region_revenue",
    "q16_session_windows",
    "q30_exact_dedup",
    "q31_ngram_jaccard_pairs",
    # q133 = unguarded all-pairs exact Jaccard, the explicit opt-in QA
    # tier (role-swapped with q31 in round 5). Deliberately quadratic
    # (Σ df²; 6.6× at 8× measured in r4 under its old q31 name) —
    # probed anyway so SCALING.md keeps the honest number next to the
    # guarded default's.
    "q133_allpairs_jaccard_exact",
    "q32_minhash_lsh_pairs",
    "q66_lsh_verified_near_dups",
    "q62_graph_edges",
    "q51_cosine_near_dup_pairs",
    "q70_curation_pipeline",
    "q84_image_decode",
    "q136_video_decode",
    "q86_simhash_near_dups",
    "q87_cdc_apply",
    "q88_multires_rollup",
    "q90_sole_late_supplier",
    "q93_pagerank",
    "q94_tfidf_top_terms",
    "q97_semantic_clusters",
    "q98_value_outliers",
    "q107_pii_redaction",
    "q109_unigram_rarity",
    "q112_canonical_docs",
    "q113_int8_quantization",
    "q114_bucketed_range_join",
    "q118_embedding_decontamination",
    "q120_prepare_corpus",
    # the one registered LSH-family member previously missing a probe
    # row — added r8 so every de-pinned auto-sized-P plan has a
    # measured exponent on the shipped tree (r7 verdict item 4)
    "q121_hybrid_near_dup_report",
    "q124_point_in_time_join",
    "q126_entity_resolution",
    "q127_part_cooccurrence",
    "q128_gap_sessionization",
    "q125_interevent_gap_stats",
    # round-6 window-scaling sweep members not already probed: the
    # value-histogram crossings (q36/q57/q59/q99/q117/q147) and the
    # second distributed-prefix-scan consumer (q122)
    "q36_rank_with_ties",
    "q57_stratified_sample",
    "q59_correlated_subquery",
    "q99_group_median",
    "q117_group_percentiles",
    "q122_sequence_packing",
    "q147_approx_percentile_bound",
    "q129_gap_fill_forward",
    "q130_incremental_agg_merge",
    "q138_pq_encode",
    "q139_segment_scrub",
    "q140_embedding_gram",
    "q141_source_mixture",
    "q142_pq_adc_topk",
    "q143_snapshot_diff",
    "q144_stratified_split",
    "q145_table_fingerprint",
    "q146_variant_extract",
    "q148_power_iteration",
    "q149_ivf_pq_topk",
    "q150_cms_heavy_hitters",
    "q151_winsorized_stats",
    "q152_count_sketch",
    "q153_bloom_membership",
    "q154_hard_negatives",
    "q155_ewma_smoothing",
    "q156_ab_test_stats",
    "q157_pq_lloyd_update",
    "q158_pareto_frontier",
    "q159_pps_sample",
    "q160_label_gini",
    "q161_chi_square",
    "q162_k_anonymity",
    "q163_column_profile",
    "q164_referential_integrity",
    "q165_group_mode",
    "q39_lsh_bucket_stats",
    "q166_dedup_weights",
    "q167_cluster_size_histogram",
    "q168_ivf_pq_trained",
    "q169_label_propagation",
    "q170_markov_transitions",
    "q171_minhash_accuracy",
    "q172_weighted_median",
    "q173_event_debounce",
    "q174_expectations_report",
    "q175_oov_rate",
    "q176_source_overlap_matrix",
    "q177_token_diversity",
    "q178_quality_calibration",
    "q179_group_aware_split",
    "q180_key_skew_profile",
    "q181_time_weighted_avg",
    "q182_mad_outliers",
    "q183_rolling_active_users",
    "q184_compression_ratio",
    "q185_collocations",
    "q186_near_dup_provenance",
    "q187_vocab_growth",
    "q188_dup_rate_by_source",
    "q189_embedding_norm_profile",
    "q190_pack_manifest",
    "q191_rrf_fusion",
    "q192_sequential_patterns",
    "q193_contrastive_triplets",
    "q194_burstiness",
    "q195_zorder_layout",
    "q196_padding_waste",
    "q197_sorted_neighborhood",
    "q198_interval_coverage",
    "q199_fd_audit",
    "q200_segment_dedup",
    "q201_cusum_changepoint",
    "q202_mutual_nn_margin",
    "q203_shuffle_shards",
    "q204_curriculum_schedule",
    "q205_apportionment",
    "q206_lag_xcorr",
    "q207_temporal_integrity",
    "q208_split_leakage",
    "q209_kmv_set_ops",
    "q210_drop_waterfall",
    "q211_bfs_distances",
    "q212_zone_map_report",
    "q213_gdpr_impact",
    "q214_benford_audit",
    "q215_kcore_peel",
    "q216_rank_agreement",
    "q217_lang_confusion",
    "q218_seasonality_profile",
    "q219_join_cardinality_forecast",
    "q220_watermark_lateness",
]

KEY_SHIFTS = {
    "lineitem": {"l_orderkey": 10_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 0},
    "events": {"event_id": 10_000_000, "user_id": 0},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}


def build_scaled(spark, out_dir: str) -> None:
    for t in TABLES:
        src = load_table(spark, SRC, t)
        if t in KEY_SHIFTS:
            parts = []
            for i in range(K):
                df = src
                for col, stride in KEY_SHIFTS[t].items():
                    if stride:
                        df = df.withColumn(col, F.col(col) + F.lit(i * stride))
                # DECORRELATE replicas (r9 finding): the pre-r9
                # perturbations — a " copyset{i}" text suffix and an
                # embedding rotation — left replicas of the same row
                # WITHIN the near-dup thresholds (replica trigram sets
                # were ~identical; rotated copies of these smooth
                # synthetic embeddings keep high cosine), so every
                # original row's K replicas formed a true near-dup
                # K-clique and the TRUE-PAIR workload grew ~K^2
                # (measured: q97 edges 242 -> 5262 -> 47454 at
                # 1x/8x/27x, ~quadratic in K). That conflated output
                # growth with algorithmic growth in every near-dup
                # exponent. Realistic corpus growth adds more clusters
                # of the SAME size, not ever-bigger clusters.
                if t == "documents" and i > 0:
                    # deterministic per-replica word shuffle: word-BAG
                    # (vocabulary, df growth — q133's Sigma df^2
                    # realism) is preserved, but word 3-gram shingle
                    # sets of two permutations over the ~35-word vocab
                    # share ~0.1% of shingles, so cross-replica
                    # Jaccard ~ 0 while within-replica similarity
                    # structure is untouched
                    df = df.withColumn(
                        "text",
                        F.expr(
                            "array_join(transform(array_sort(zip_with("
                            "split(text, ' '), "
                            "sequence(1, size(split(text, ' '))), "
                            f"(w, p) -> named_struct("
                            f"'h', xxhash64(w, p, {i}), 'w', w))), "
                            "s -> s.w), ' ')"
                        ),
                    )
                if t == "embeddings" and i > 0:
                    # deterministic per-replica sign-flip pattern: an
                    # isometry (norms and all WITHIN-replica cosines
                    # exactly preserved), while cross-replica cosine
                    # cos(D_i x, D_j y) = sum_t s_t x_t y_t over a
                    # pseudo-random +/-1 pattern concentrates at 0
                    # (~1/sqrt(dim)) — unlike rotation, this holds for
                    # ANY vector structure
                    et = src.schema["embedding"].dataType.elementType.simpleString()
                    df = df.withColumn(
                        "embedding",
                        F.expr(
                            "zip_with(embedding, "
                            "sequence(1, size(embedding)), "
                            f"(x, t) -> cast(x * (1 - 2 * "
                            f"pmod(xxhash64(t, {i}), 2)) as {et}))"
                        ),
                    )
                parts.append(df)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        else:
            out = src
        out.write.mode("overwrite").parquet(os.path.join(out_dir, f"{t}.parquet"))


def time_query(qs, name, sf_dir) -> float:
    # construction included: iterative operators (connected components,
    # k-means, pagerank-with-checkpoint) materialize work eagerly while
    # the plan is being built, not at the final write
    t0 = time.perf_counter()
    df = qs[name](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


if __name__ == "__main__":
    spark = get_spark("scaling-probe")
    qs = get_queries()
    tmp = tempfile.mkdtemp(prefix="sfbig_")
    try:
        build_scaled(spark, tmp)
        lines = [
            "# SCALING — measured runtime ratio at %d× data (generated by tools_scaling_probe.py)" % K,
            "",
            "| query | 1× (s) | %d× (s) | ratio | verdict (α = log ratio / log %d) |"
            % (K, K),
            "|---|---|---|---|---|",
        ]
        for name in PROBES:
            # warm BOTH scales so persisted/memoized subplans (e.g.
            # q62's shared classification, the LSH shingle tables) are
            # materialized on each side — otherwise the 1× run is a
            # cache hit and the K× run pays cache build, inflating the
            # ratio with a probe artifact
            time_query(qs, name, SRC)
            time_query(qs, name, tmp)
            t1 = time_query(qs, name, SRC)
            tk = time_query(qs, name, tmp)
            ratio = tk / t1
            # Verdict from the measured growth exponent, not a bare
            # ratio-vs-K cutoff: the old `ratio < K` rule let q133's
            # 7.2×-at-8× read "sub-linear" while the prose below
            # correctly calls it the known super-linear opt-in tier
            # (r5 verdict item 2). alpha = log(ratio)/log(K) estimates
            # t ~ N^alpha. Tier semantics carry their plain meaning:
            # on FIXED resources t ∝ N (alpha = 1) is ideal
            # proportional scaling, so SUPER-LINEAR — the quadratic-
            # term flag — starts only beyond linear plus this box's
            # noise (±30% per query shifts alpha by log(1.3)/log(8)
            # ≈ 0.13, hence the 1.1 cutoff). <= 1/3 is overhead-
            # dominated flat; <= 0.85 tracks the data with overhead
            # still amortizing; <= 1.1 is ≈ proportional.
            alpha = math.log(max(ratio, 0.01)) / math.log(K)
            verdict = (
                "sub-linear"
                if alpha <= 1 / 3
                else (
                    "~linear"
                    if alpha <= 0.85
                    else ("linear" if alpha <= 1.1 else "SUPER-LINEAR")
                )
            )
            # Known-by-construction asymptotes stay in the table even
            # when the measured exponent wobbles across a tier cutoff
            # (q133 measured 7.2× / 12.6× / 7.9× across three runs of
            # the same plan): the measurement stays, the annotation
            # keeps the table from contradicting what the code does.
            if name in KNOWN_ASYMPTOTES:
                verdict += f" — {KNOWN_ASYMPTOTES[name]}"
            lines.append(
                f"| {name} | {t1:.2f} | {tk:.2f} | {ratio:.1f}× |"
                f" α≈{alpha:.2f} {verdict} |"
            )
            print(lines[-1])
        lines += [
            "",
            "q88 persists its rollup levels, so its timed runs at both",
            "scales read the warmed cache — the meaningful scale",
            "evidence for it is the plan test (one raw-data pass,",
            "tests/test_operators.py).",
            "",
            "Facts replicated with disjoint keys; dims fixed. Ratios well",
            "under the data factor mean fixed overhead still dominates at",
            "this size; anything super-linear flags a quadratic term.",
            "",
            "Known super-linear entry: q133, the UNGUARDED all-pairs",
            "exact n-gram Jaccard — since round 5 the explicit opt-in QA",
            "tier (max_df=None), while q31 registers the stop-shingle-",
            "guarded library default (max_df=5, join work bounded at",
            "O(#shingles*max_df^2) — measured ~linear above). The",
            "testdata vocabulary is ~35 uniformly-hot words, so every",
            "shingle is shared by ~|docs|/vocab documents and the exact",
            "unfiltered pairwise intersection count is inherently",
            "quadratic in corpus size — no exact algorithm avoids it",
            "without frequency skew (AllPairs prefix filtering was",
            "measured WORSE here: 74x; available via prefix_filter=True",
            "for Zipfian corpora). Hashing shingles to 48-bit int join",
            "keys cut the ratio 35x -> ~18x. The scale paths for near-dup",
            "detection are the guarded default (q31) and MinHash-LSH",
            "(q32, ~linear) with exact Jaccard verification on candidate",
            "pairs only (q66).",
            "",
            "Embedding near-dup pairs (q51) default to hyperplane-LSH",
            "bucketed candidates + exact cosine re-rank (all-pairs is",
            "opt-in via exact=True); replica embeddings carry",
            "per-replica deterministic sign-flips (an isometry) and",
            "replica documents a per-replica word shuffle, so replicas",
            "are DECORRELATED and the probe measures algorithmic",
            "growth, not manufactured cross-replica near-dup cliques",
            "(r9 finding: the old suffix/rotation perturbations left",
            "replicas within the near-dup thresholds — true pairs grew",
            "~K², conflating output growth with plan growth in every",
            "near-dup exponent). Since round 7 the ENTIRE registered",
            "LSH family (q38/q39/q51/q97/q118/q119/q121/q202)",
            "auto-sizes its plane count from COUNT(*) — P = min(16,",
            "max(4, bit_length(N//32))), the same integer formula in",
            "the Spark plan and the DuckDB oracle, over gated static",
            "planes at a fixed per-table index stride — so bucket",
            "occupancy (hence candidates per vector) stays ~32 as N",
            "grows. The pre-r7 variants pinned P=6: an N^2/2^7",
            "per-table candidate asymptote for the self-join family",
            "(q202's 8.4x at 8x in the r6 SCALING table was that",
            "pinned regime entering its quadratic phase).",
            "q172's",
            "alpha ~0.87 is a global sort crossing from overhead- to",
            "data-dominated (N log N, no quadratic term).",
        ]
        # q97's cost floor is per-job fixed latency × O(diameter) CC
        # rounds (README "known floors") — record the MEASURED round
        # count at both scales so the committed exponent carries its
        # iteration factor (r7 verdict item 4). Rounds include the
        # final no-change round that proves quiescence.
        from oculus_data_pipeline_spark.operators.graph_algo import (
            connected_components,
        )
        from oculus_data_pipeline_spark.operators import similarity

        # The third row's graph deliberately uses CORRELATED replicas
        # (the pre-r9 rotation fixture): rotated copies of these
        # smooth synthetic embeddings stay within the near-dup
        # threshold, so the K× graph grows dense cross-replica edge
        # regions with diameter > 20 — the fixture that caught two
        # silent O(diameter) stalls in r8. Kept ON PURPOSE as a
        # convergence STRESSOR, clearly labeled; it is no longer a
        # scaling measurement (the decorrelated row above is).
        def _correlated_stress_emb(k: int):
            src_e = load_table(spark, SRC, "embeddings")
            parts = []
            for i in range(k):
                df = src_e.withColumn(
                    "vec_id", F.col("vec_id") + F.lit(i * 1_000_000)
                )
                if i > 0:
                    dim = F.size("embedding")
                    df = df.withColumn(
                        "embedding",
                        F.concat(
                            F.slice(F.col("embedding"), F.lit(i + 1), dim - i),
                            F.slice(F.col("embedding"), 1, i),
                        ),
                    )
                parts.append(df)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            return out.localCheckpoint()

        cc_lines = ["", "<!-- cc-rounds -->", ""]
        cc_sources = [
            ("1×", load_table(spark, SRC, "embeddings")),
            (f"{K}× decorrelated", load_table(spark, tmp, "embeddings")),
            (f"{K}× CORRELATED stress", _correlated_stress_emb(K)),
        ]
        for label, emb in cc_sources:
            pairs = similarity.lsh_near_dup_pairs(
                emb, threshold=0.4, p_max=16
            )
            st: dict = {}
            n_edges = pairs.count()
            connected_components(
                pairs, src="id_a", dst="id_b", stats=st
            ).write.format("noop").mode("overwrite").save()
            cc_lines.append(
                f"q97 CC at {label}: {n_edges} near-dup edges, "
                f"{st['iterations']} propagation rounds (incl. the "
                f"quiescence-proof round)"
            )
        # reference the cc-hook-cost decomposition only when that
        # section actually exists to be preserved below — a
        # regeneration on a tree without it must not commit a dangling
        # pointer (r9 review finding)
        _old_scaling = (
            open("SCALING.md").read() if os.path.exists("SCALING.md") else ""
        )
        _has_hook = (
            "<!-- cc-hook-cost -->" in _old_scaling
            and "<!-- /cc-hook-cost -->" in _old_scaling
        )
        cc_lines += [
            "",
            "Rounds are label-region MERGES (Shiloach-Vishkin root",
            "hooking + pointer jumping): O(log n) in the largest",
            "component's node count, independent of graph diameter.",
            "The decorrelated row is the SCALING measure (replicas are",
            "isometric sign-flipped copies, so components replicate and",
            "rounds stay ~flat as K grows). The CORRELATED row is the",
            "convergence STRESSOR kept from the pre-r9 fixture — its",
            "dense cross-replica near-dup graph (diameter > 20)",
            "silently exhausted plain neighbor-min's round cap (r8),",
            "and permuted ids stalled the jump-only variant at interior",
            "local-minimum labels (r8 second finding). Per-round cost",
            "is two shuffle-joins + one groupBy, so q97's wall clock is",
            "rounds × fixed per-round scheduling latency at toy scale",
            "(the ~6 shuffle STAGES each round fuses, not the single",
            "job submission"
            + (
                " — decomposed in the cc-hook-cost section\nbelow"
                if _has_hook
                else ""
            )
            + ") and rounds × shuffle-of-|edges| at cluster scale.",
            "<!-- /cc-rounds -->",
        ]
        lines += cc_lines
        for ln in cc_lines:
            print(ln)
        out = "\n".join(lines) + "\n"
        # preserve the marker-delimited sections written by
        # tools_skew_probe.py / tools_giant_group_probe.py across
        # regenerations (cc-rounds is regenerated above, so it is NOT
        # in the preserve list — a stale copy would shadow the fresh
        # measurement)
        if os.path.exists("SCALING.md"):
            old = open("SCALING.md").read()
            for mark in (
                "skew-probe",
                "giant-group-probe",
                "cc-hook-cost",
                "k27-spotcheck",
            ):
                ms, me = f"<!-- {mark} -->", f"<!-- /{mark} -->"
                if ms in old and me in old:
                    kept = old.split(ms)[1].split(me)[0]
                    out += "\n" + ms + kept + me + "\n"
        with open("SCALING.md", "w") as f:
            f.write(out)
        print("SCALING.md written")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
