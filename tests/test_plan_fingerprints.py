"""Guards for the machine-derived bench ``"replanned"`` key (r7
verdict item 3): the key is the diff of the two newest committed
PLAN_FINGERPRINTS_r*.json snapshots, so these tests pin (a) the plan
normalization that makes fingerprints process-stable, (b) the
snapshot-diff derivation itself, (c) that bench.py actually emits the
derivation and not a hand list, and (d) — env-gated, because it
builds all 220 plans (~3 min) — that the NEWEST committed snapshot
matches the current tree, which is the check that turns a forgotten
end-of-round regeneration into a test failure instead of a silently
misleading bench JSON.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tools_plan_fingerprints as fp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_normalize_strips_run_varying_tokens():
    """Expression ids, JVM addresses, plan ids, RDD numbers, and
    whitespace wrapping all vary run-to-run for an UNCHANGED plan —
    normalization must erase exactly those."""
    a = (
        "Project [id#123L, v#124]\n"
        "+- LogicalRDD MapPartitionsRDD[42] org.apache.x@1a2b3c4d "
        "[plan_id=7]"
    )
    b = (
        "Project [id#991L,   v#992]\n"
        "+- LogicalRDD MapPartitionsRDD[77] org.apache.x@99ffee00 "
        "[plan_id=31]"
    )
    assert fp.normalize_plan(a) == fp.normalize_plan(b)
    # but a REAL plan change (different operator/expression) survives
    c = a.replace("Project", "Filter")
    assert fp.normalize_plan(a) != fp.normalize_plan(c)
    # HOF lambda variables number from a SESSION-GLOBAL counter — the
    # digits live in the variable NAME, not the expr id (r8 audit:
    # building q168 first renamed every later plan's lambdas)
    d = "filter(xs#10, lambdafunction(lambda x_2#11 > 0, lambda x_2#11))"
    e = "filter(xs#44, lambdafunction(lambda x_77#9 > 0, lambda x_77#9))"
    assert fp.normalize_plan(d) == fp.normalize_plan(e)


def test_code_trace_reaches_checkpoint_hidden_operators():
    """The r8 CC rewrite happened behind a localCheckpoint — the
    returned plan text is an unchanged LogicalRDD scan, so only the
    code component can flag consumers. Pin that every CC consumer's
    trace includes connected_components, and that the trace is
    docstring-insensitive (doc churn must never claim a re-plan)."""
    reg = fp._package_registry(REPO)
    cc_qual = "oculus_data_pipeline_spark/operators/graph_algo.py:connected_components"

    def closure(name):
        seen, frontier = {}, [name]
        while frontier:
            n = frontier.pop()
            for qual, h, refs in reg.get(n, ()):
                if qual in seen:
                    continue
                seen[qual] = h
                frontier.extend(r for r in refs if r in reg)
        return seen

    for consumer in ("q97_semantic_clusters", "q76_dedup_clusters",
                     "q120_prepare_corpus", "q210_drop_waterfall"):
        assert cc_qual in closure(consumer), consumer
    # docstring-insensitivity: same function modulo docstring → same hash
    import ast as _ast

    a = _ast.parse('def f(x):\n    """doc one"""\n    return x + 1').body[0]
    b = _ast.parse('def f(x):\n    """another"""\n    return x + 1').body[0]
    c = _ast.parse('def f(x):\n    return x + 2').body[0]
    assert fp._node_entry("q", a)[1] == fp._node_entry("q", b)[1]
    assert fp._node_entry("q", a)[1] != fp._node_entry("q", c)[1]


def test_derive_replanned_diffs_two_newest(tmp_path):
    """replanned == queries whose fingerprint differs between the two
    newest snapshots; new queries count; with <2 snapshots nothing is
    claimed."""
    def snap(rnd, fps):
        p = tmp_path / f"PLAN_FINGERPRINTS_r{rnd}.json"
        p.write_text(json.dumps({"round": rnd, "fingerprints": fps}))

    snap(3, {"q1": "aa", "q2": "bb"})
    assert fp.derive_replanned(str(tmp_path)) == []  # only one snapshot
    snap(4, {"q1": "aa", "q2": "CHANGED", "q3": "new"})
    assert fp.derive_replanned(str(tmp_path)) == ["q2", "q3"]
    # round 10 sorts AFTER round 4 numerically (not lexically)
    snap(10, {"q1": "aa", "q2": "CHANGED", "q3": "new"})
    assert fp.derive_replanned(str(tmp_path)) == []


def test_bench_emits_the_derivation():
    """bench.py's replanned key is the derivation, byte-for-byte — no
    hand-maintained list left to forget resetting."""
    import bench

    assert bench.replanned_queries() == fp.derive_replanned()


def test_bench_top15_line_shape():
    """The second bench line must keep the EXPENSIVE-head evidence
    whatever the driver's tail cut does to the main line: descending
    by time, name-tiebroken (deterministic), capped at 15, sum
    matching its own entries."""
    import bench

    timings = {f"q{i:03d}": float(i % 7) for i in range(1, 41)}
    out = bench.top15_line(timings)
    vals = list(out["top15"].values())
    assert len(vals) == 15
    assert vals == sorted(vals, reverse=True)
    # ties broken by name: equal-valued entries appear in name order
    names = list(out["top15"])
    for a, b in zip(names, names[1:]):
        if out["top15"][a] == out["top15"][b]:
            assert a < b
    assert out["top15_sum"] == round(sum(vals), 3)
    # fewer queries than 15: no padding, no crash
    small = bench.top15_line({"qa": 2.0, "qb": 1.0})
    assert list(small["top15"]) == ["qa", "qb"]


def test_fingerprint_code_drift_survives_bad_bookkeeping(tmp_path, monkeypatch):
    """A malformed snapshot entry or an unparseable package file must
    surface as drift for that query, never as an exception — the check
    runs AFTER the whole timed bench, and raising there discards all
    timings (r8 advice)."""
    import bench

    snap = tmp_path / "PLAN_FINGERPRINTS_r7.json"
    snap.write_text(json.dumps({"round": 7, "fingerprints": {
        "q_ok_shape_but_gone": "deadbeef.feedface",
        "q_malformed": "no-dot-separator",
    }}))
    # bench imports committed_snapshots from fp AT CALL TIME, so the
    # module-attribute patch reaches it
    monkeypatch.setattr(
        fp, "committed_snapshots", lambda *_a, **_k: [(7, str(snap))]
    )
    drift = bench.fingerprint_code_drift()
    assert "q_malformed" in drift        # "." not in hash → drift, pre-try
    assert "q_ok_shape_but_gone" in drift  # KeyError path → drift, no raise


def test_bench_keys_survive_truncated_snapshot_file(tmp_path, monkeypatch):
    """A TRUNCATED snapshot file (the half-finished regeneration the
    drift check's docstring motivates) must surface as a sentinel in
    BOTH bench keys, never as an exception — json.load raises OUTSIDE
    the per-query guard, and both functions are called after the whole
    timed run (r9 review finding: the r8-advice fix only guarded
    per-entry failures)."""
    import bench

    good = tmp_path / "PLAN_FINGERPRINTS_r8.json"
    good.write_text(json.dumps({"round": 8, "fingerprints": {}}))
    bad = tmp_path / "PLAN_FINGERPRINTS_r9.json"
    bad.write_text('{"round": 9, "fingerprints": {"q01":')  # truncated
    monkeypatch.setattr(
        fp,
        "committed_snapshots",
        lambda *_a, **_k: [(8, str(good)), (9, str(bad))],
    )
    drift = bench.fingerprint_code_drift()
    assert drift == ["__snapshot_unreadable:JSONDecodeError__"]
    replanned = bench.replanned_queries()
    assert replanned == [
        "__replanned_derivation_failed:JSONDecodeError__"
    ]


def test_newest_snapshot_covers_registry():
    """The newest committed snapshot names EXACTLY the registered
    queries, with no plan-build errors recorded — a partial or
    error-bearing snapshot would make the replanned diff lie."""
    snaps = fp.committed_snapshots(REPO)
    assert snaps, "no committed PLAN_FINGERPRINTS_r*.json"
    with open(snaps[-1][1]) as f:
        fps = json.load(f)["fingerprints"]
    from oculus_data_pipeline_spark.queries import get_queries

    assert sorted(fps) == sorted(get_queries())
    bad = {q: h for q, h in fps.items() if h.startswith("ERROR")}
    assert not bad, f"snapshot carries plan-build errors: {bad}"


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_FP_CHECK") != "1",
    reason="builds all registry plans (~3 min) — set SPARK_GRAFT_FP_CHECK=1",
)
def test_snapshot_matches_tree():
    """End-of-round gate: the newest committed snapshot must equal a
    fresh recomputation on this tree. Run on the final tree after
    `python tools_plan_fingerprints.py --round N`.

    Runs the TOOL in a subprocess — that is the contract (snapshot ==
    what the round protocol's command produces), and the suite's
    shared session is NOT a valid baseline: earlier test modules
    legitimately mutate session conf (broadcast thresholds etc.), and
    an in-process compute_all inherited that state — the full suite
    failed this check while the standalone tool passed it twice."""
    import subprocess

    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools_plan_fingerprints.py"),
         "--check"],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, (
        "snapshot is stale vs the tree — regenerate with "
        f"tools_plan_fingerprints.py --round <N>: {proc.stdout[-2000:]}"
    )


def test_query_registry_has_no_duplicate_registrations():
    """@query silently overwrites on a duplicate name (the decorator
    stays byte-identical to keep 220 code-trace hashes stable — a
    runtime guard inside it would flag every query as replanned), so
    the no-duplicates invariant is pinned statically: every @query
    call site's name literal must be unique, and each must have
    reached the registry."""
    import ast

    import oculus_data_pipeline_spark.queries as qmod
    from oculus_data_pipeline_spark.queries import ORACLE, QUERIES

    tree = ast.parse(open(qmod.__file__).read())
    names = [
        dec.args[0].value
        for node in ast.walk(tree)
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef))
        for dec in node.decorator_list
        if isinstance(dec, ast.Call)
        and getattr(dec.func, "id", "") == "query"
        and dec.args
        and isinstance(dec.args[0], ast.Constant)
    ]
    dupes = sorted({n for n in names if names.count(n) > 1})
    assert not dupes, f"duplicate @query registrations: {dupes}"
    assert len(names) == len(QUERIES)  # every call site reached the dict
    assert set(ORACLE) <= set(QUERIES)


def test_bench_ab_summary_math_and_conservative_verdict():
    """tools_bench_ab is the sanctioned same-box perf-comparison
    protocol (r10 verdict item 2): pin its median/noise arithmetic
    and that a verdict is only rendered when the WHOLE noise band
    clears 1.0 — one contaminated pair must never flip 'within
    noise' into a win/loss."""
    from tools_bench_ab import summarize

    s = summarize([1.1571, 1.0381, 0.9605, 0.6615], {"q": [1.0, 1.2]})
    assert s["median_total_ratio"] == 0.9993
    assert s["spread"] == [0.6615, 1.1571]
    assert s["noise_bound"] == 0.3378
    assert s["verdict"] == "within noise"
    assert s["per_query_median_ratio"] == 1.1

    # clear wins require median ± noise entirely past 1.0
    assert summarize([0.80, 0.82, 0.85], {})["verdict"] == "A faster"
    assert summarize([1.20, 1.22, 1.25], {})["verdict"] == "B faster"
    # a single outlier pair widens the band back to inconclusive
    assert summarize([0.80, 0.82, 1.05], {})["verdict"] == "within noise"
