"""CATALOG.md generator — one line per declared query (name, tags,
oracle status, implementing module) so the full query surface is
reviewable without reading the registry. ``tests/test_catalog.py``
fails when the committed file goes stale; regenerate with:

    python -m fraud_detection_spark.catalog
"""

from __future__ import annotations

HEADER = """# CATALOG — declared queries

Auto-generated from the registry (`python -m fraud_detection_spark.catalog`);
`tests/test_catalog.py` keeps it in sync. "oracle" = DuckDB-differential
hash check; "rows-only" = RNG/LSH/ML op verified by property tests.

| Query | Check | Tags | Module |
|---|---|---|---|
"""

# Per-query caveats appended to the Check cell — scoping notes a reader
# of the "oracle" claim needs (kept here so regeneration preserves them).
CHECK_NOTES = {
    "q_dedup_jaccard": (
        "oracle (probabilistic: 8-byte md5 fingerprints vs the oracle's "
        "full digests — exact absent a ~2⁻⁵⁰ collision/prefix-tie, "
        "dedup.py jaccard_sketch_docs)"
    ),
    "q_dedup_doc_cluster": (
        "oracle (edges from q_dedup_jaccard — same fingerprint caveat)"
    ),
}


def render() -> str:
    from fraud_detection_spark.registry import load_all

    lines = [HEADER]
    registry = load_all()
    for name in sorted(registry):
        q = registry[name]
        check = CHECK_NOTES.get(name) or ("oracle" if q.oracle else "rows-only")
        tags = ", ".join(q.tags) if q.tags else "—"
        module = q.fn.__module__.replace("fraud_detection_spark.", "")
        lines.append(f"| `{name}` | {check} | {tags} | {module} |\n")
    n_oracle = sum(1 for q in registry.values() if q.oracle)
    lines.append(
        f"\n{len(registry)} queries, {n_oracle} oracle-checked, "
        f"{len(registry) - n_oracle} rows-only.\n"
    )
    return "".join(lines)


if __name__ == "__main__":
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "CATALOG.md")
    with open(path, "w") as f:
        f.write(render())
    print(f"wrote {os.path.abspath(path)}")
