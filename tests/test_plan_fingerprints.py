"""Pin the physical-plan shape of every bench-headline query.

A fingerprint drift (extra shuffle, broadcast join degrading to
sort-merge, codegen falling back to row-at-a-time Python) is a scale
regression even when test-scale wall-clock doesn't move. Fails with the
per-marker delta; regenerate intentionally with
``SPARK_GRAFT_REGEN_PLAN_FP=1``.

Eager-construction caveat: queries declared ``eager=True`` in the
registry (q_mmr, q_hits, the delta-peel/iterative graph family, the
IVF index builds) execute their distributed passes at fn() time —
their returned plan, and therefore the pinned fingerprint, covers only
the FINAL bounded result (often all-zero). The fingerprint still pins
"construction stayed eager and the residual plan didn't grow"; the
real scale posture for those queries is guarded by their dedicated
scale tests (tests/test_graph_scale.py, test_ivf_index.py,
test_scale_ops.py) and bench.py, which times construction +
materialization together. ``test_eager_declarations`` below pins the
eager set itself so a new collect()/localCheckpoint() query can't land
undeclared.
"""

from __future__ import annotations

import json
import os

FP_PATH = os.path.join(os.path.dirname(__file__), "plan_fingerprints.json")


def test_headline_plan_fingerprints(spark, sf_dir):
    from bench import HEADLINE
    from fraud_detection_spark.plans.fingerprint import plan_fingerprint
    from fraud_detection_spark.registry import load_all

    R = load_all()
    got = {}
    for name in HEADLINE:
        # Fingerprints must be cache-state independent: a shared .cache()
        # (e.g. the dedup shingle table) materialized by an earlier test
        # swaps the Arrow/Exchange stages for an InMemoryTableScan and
        # the counts drift. Capture every plan cold.
        spark.catalog.clearCache()
        got[name] = plan_fingerprint(R[name].fn(spark, sf_dir))

    if os.environ.get("SPARK_GRAFT_REGEN_PLAN_FP") == "1":
        from fraud_detection_spark.plans.fingerprint import FINGERPRINT_CONVENTION

        with open(FP_PATH, "w") as f:
            json.dump(
                {"_convention": FINGERPRINT_CONVENTION, **got},
                f,
                indent=1,
                sort_keys=True,
            )
        return

    assert os.path.exists(FP_PATH), (
        f"no committed fingerprints at {FP_PATH}; run with "
        "SPARK_GRAFT_REGEN_PLAN_FP=1 to create them"
    )
    with open(FP_PATH) as f:
        want = json.load(f)

    drift = []
    for name in HEADLINE:
        if name not in want:
            drift.append(f"{name}: no committed fingerprint (new query?)")
            continue
        for marker, n in got[name].items():
            expected = want[name].get(marker, 0)
            if n != expected:
                drift.append(f"{name}.{marker}: committed {expected}, now {n}")
    assert not drift, "plan drift detected:\n  " + "\n  ".join(drift)


def test_eager_declarations():
    """The registry's ``eager=True`` set must cover every query whose
    construction executes Spark jobs (collect / toPandas /
    localCheckpoint, directly or through a helper), and nothing else.

    Derived by an AST fixpoint over every module that registers
    queries: a function is eager if its body calls an eager marker or
    any function already known to be eager (by name, which is unique
    across operator modules for the helpers involved). This keeps the
    declared set honest — a new collect() inside a query fails here
    until the registration says eager=True, so the fingerprint /
    dtype-sweep caveats stay accurate.
    """
    import ast
    import subprocess

    from fraud_detection_spark.registry import load_all

    files = subprocess.run(
        ["grep", "-rl", "@query", "fraud_detection_spark"],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ).stdout.split()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    markers = {"collect", "toPandas", "localCheckpoint"}
    funcs: dict[str, set] = {}
    for rel in files:
        tree = ast.parse(open(os.path.join(root, rel)).read())
        for n in ast.walk(tree):
            if isinstance(n, ast.FunctionDef):
                calls = set()
                for c in ast.walk(n):
                    if isinstance(c, ast.Call):
                        if isinstance(c.func, ast.Attribute):
                            calls.add(c.func.attr)
                        elif isinstance(c.func, ast.Name):
                            calls.add(c.func.id)
                funcs.setdefault(n.name, set()).update(calls)
    eager = {n for n, c in funcs.items() if c & markers}
    changed = True
    while changed:
        changed = False
        for n, c in funcs.items():
            if n not in eager and c & eager:
                eager.add(n)
                changed = True
    # .first() is ambiguous in AST (F.first window aggregate vs
    # DataFrame.first) — the three queries below collect a scalar
    # bound via .first() without tripping the markers above.
    ast_eager = ({n for n in eager if n.startswith("q_")}
                 | {"q_semdedup", "q_knn_ivf_coarse", "q_knn_ivf_pq"})

    R = load_all()
    declared = {n for n, q in R.items() if q.eager}
    assert declared == ast_eager, (
        f"registry eager declarations out of sync with source:\n"
        f"  declared-but-not-detected: {sorted(declared - ast_eager)}\n"
        f"  detected-but-not-declared: {sorted(ast_eager - declared)}"
    )
