"""Per-query plan fingerprints — the machine-derived source of the
bench JSON's "replanned" key (r7 verdict item 3: the hand-maintained
bench.REPLANNED list had no reset enforcement, so one forgotten edit
would mis-attribute ordinary noise to a re-plan).

Each fingerprint has TWO dot-joined components, and a query counts as
replanned when either moves:

1. ``plan`` — sha256 of the NORMALIZED analyzed logical plan, built
   at a FIXED scale factor (sf0.001; plan construction may run its
   own bounded jobs, e.g. the LSH COUNT(*) sizing pass or IVF
   centroid collects). Normalization strips run-varying tokens —
   expression ids (``#123``), name-embedded lambda counters
   (``x_2#``), JVM addresses (``@1a2b3c``), RDD/plan numbers. The SQL
   cache is cleared before every build: a query's plan text must not
   depend on what an earlier-sorted query left cached (the r8 audit
   found exactly that coupling — q168's re-plan shifted
   InMemoryRelation presence in 20+ later-built plans). The ANALYZED
   plan is hashed, not the optimized one — see plan_fingerprint for
   the RewriteDistinctAggregates counter-leak that makes optimized
   text unnormalizable.
2. ``code`` — sha256 over the docstring/comment-stripped ASTs of
   every package-level function, class, or constant STATICALLY
   reachable from the query function (its body + decorators, so
   oracle-SQL helpers count, then transitively by referenced name).
   This closes the plan-hash blind spot for iterative operators: a
   connected-components or Lloyd-step rewrite happens behind a
   localCheckpoint, so the returned plan text is an unchanged
   LogicalRDD scan — only the code component can see it. Name
   resolution is by simple name across the package (collisions
   over-approximate: flagging too many queries is conservative,
   missing a re-plan is not).

Round protocol:
  python tools_plan_fingerprints.py --round N        # write PLAN_FINGERPRINTS_rN.json
  python tools_plan_fingerprints.py --check          # recompute, diff vs newest committed file
  python tools_plan_fingerprints.py --round 7 --repo-dir <worktree>
      # regenerate a baseline from an older tree with CURRENT tool
      # semantics (snapshots are only comparable at equal semantics)
bench.py emits  replanned = diff(two newest committed snapshots);
tests/test_plan_fingerprints.py pins the derivation and (env-gated,
SPARK_GRAFT_FP_CHECK=1) that the newest snapshot matches the tree.
"""

from __future__ import annotations

import argparse
import ast
import glob
import hashlib
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

FP_SF_DIR = "/root/testdata/sf0.001"
FP_GLOB = "PLAN_FINGERPRINTS_r*.json"
PKG = "oculus_data_pipeline_spark"

_NORM_PATTERNS = [
    (re.compile(r"#\d+"), "#"),                      # expression ids
    # higher-order-function lambda variables carry a SESSION-GLOBAL
    # counter in the NAME itself (lambda x_2# vs x_77#) — building any
    # earlier query shifts every later plan's numbers. Applied after
    # the expr-id strip, so this rewrites name-final counters only at
    # expr-id sites (x_2# → x_#).
    (re.compile(r"_\d+#"), "_#"),
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
    # the ANALYZED plan, not the optimized one: optimizer rewrites can
    # embed session-global counter state in ways no regex normalizes —
    # RewriteDistinctAggregates assigns multi-distinct gid numbers and
    # Expand projection ORDER from expression-id-keyed set iteration,
    # so q207's optimized text flapped with how many expressions
    # earlier builds had allocated. The analyzed plan is a faithful,
    # deterministic rendering of what the code constructed (including
    # data-derived literals like auto-sized LSH plane counts); with
    # the Spark version pinned, optimizer-behavior drift can't happen
    # within a round, and code-driven changes are what the replanned
    # key exists to catch.
    text = df._jdf.queryExecution().analyzed().toString()
    return hashlib.sha256(normalize_plan(text).encode()).hexdigest()[:16]


class _DocStrip(ast.NodeTransformer):
    """Remove docstrings so comment/doc churn never flags a re-plan."""

    def _strip(self, node):
        self.generic_visit(node)
        if (
            node.body
            and isinstance(node.body[0], ast.Expr)
            and isinstance(node.body[0].value, ast.Constant)
            and isinstance(node.body[0].value.value, str)
        ):
            node.body = node.body[1:] or [ast.Pass()]
        return node

    visit_FunctionDef = visit_AsyncFunctionDef = visit_ClassDef = _strip
    visit_Module = _strip


def _node_entry(qual: str, node: ast.AST) -> tuple[str, str, frozenset[str]]:
    """(qualname, docstring-insensitive AST hash, referenced names)."""
    stripped = _DocStrip().visit(node)
    h = hashlib.sha256(ast.dump(stripped).encode()).hexdigest()[:16]
    names = frozenset(
        n.id for n in ast.walk(stripped) if isinstance(n, ast.Name)
    ) | frozenset(
        a.attr for a in ast.walk(stripped) if isinstance(a, ast.Attribute)
    )
    return qual, h, names


def _package_registry(repo_dir: str) -> dict[str, list[tuple[str, str, frozenset[str]]]]:
    """simple name -> entries for every top-level def/class/constant
    in the package (constants matter: PLANE_STRIDE = 48 would be a
    re-plan of every LSH query with no function body changing)."""
    reg: dict[str, list] = {}

    def add(name: str, qual: str, node: ast.AST) -> None:
        reg.setdefault(name, []).append(_node_entry(qual, node))

    for path in sorted(
        glob.glob(os.path.join(repo_dir, PKG, "**", "*.py"), recursive=True)
    ):
        rel = os.path.relpath(path, repo_dir)
        with open(path) as f:
            tree = ast.parse(f.read())
        for node in tree.body:
            if isinstance(
                node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
            ):
                add(node.name, f"{rel}:{node.name}", node)
            elif isinstance(node, ast.Assign):
                for tgt in node.targets:
                    if isinstance(tgt, ast.Name):
                        add(tgt.id, f"{rel}:{tgt.id}", node)
            elif isinstance(node, ast.AnnAssign) and isinstance(
                node.target, ast.Name
            ):
                add(node.target.id, f"{rel}:{node.target.id}", node)
    return reg


_REG_CACHE: dict[str, dict] = {}


def code_trace_hash(query_name: str, repo_dir: str) -> str:
    """Hash of everything package-level statically reachable from the
    query function by simple-name reference, fixpoint-expanded."""
    if repo_dir not in _REG_CACHE:
        _REG_CACHE[repo_dir] = _package_registry(repo_dir)
    reg = _REG_CACHE[repo_dir]
    seen: dict[str, str] = {}
    frontier = [query_name]
    while frontier:
        name = frontier.pop()
        for qual, h, refs in reg.get(name, ()):
            if qual in seen:
                continue
            seen[qual] = h
            frontier.extend(r for r in refs if r in reg)
    if not seen:  # a query the registry can't see would silence the diff
        raise KeyError(f"{query_name} not found in {repo_dir}/{PKG}")
    joined = "|".join(f"{q}={h}" for q, h in sorted(seen.items()))
    return hashlib.sha256(joined.encode()).hexdigest()[:16]


def compute_all(
    sf_dir: str = FP_SF_DIR,
    names: list[str] | None = None,
    repo_dir: str | None = None,
) -> dict[str, str]:
    repo_dir = repo_dir or os.path.dirname(os.path.abspath(__file__))
    from oculus_data_pipeline_spark.queries import get_queries
    from oculus_data_pipeline_spark.session import get_spark

    spark = get_spark("plan-fingerprints")
    out: dict[str, str] = {}
    for name, fn in sorted(get_queries().items()):
        if names and name not in names:
            continue
        try:
            # isolate: an earlier-built query's cache must not leak
            # InMemoryRelation nodes into this plan's text
            spark.catalog.clearCache()
            out[name] = (
                f"{plan_fingerprint(fn(spark, sf_dir))}"
                f".{code_trace_hash(name, repo_dir)}"
            )
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
    ap.add_argument(
        "--repo-dir",
        help="build plans + code traces from this tree instead of the "
        "tool's own (regenerating an old round's baseline under "
        "current tool semantics)",
    )
    args = ap.parse_args()

    if args.repo_dir:
        # the older tree's package must shadow this repo's
        sys.path.insert(0, os.path.abspath(args.repo_dir))
    fps = compute_all(args.sf_dir, args.only, args.repo_dir)
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
        if args.only:
            # targeted check: only the selected queries are claims —
            # without this, every non-selected committed query would
            # read as a spurious diff (fps.get returns None)
            committed = {q: h for q, h in committed.items() if q in args.only}
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
