"""Driver-sample rotation computed from cumulative CORRECTNESS history.

The driver verifies a 50-query prefix of ``__spark_entry__.queries()``
each round, so the ordering of that dict IS the verification schedule.
Through round 5 the prefix was hand-curated; this module automates the
policy the hand curation converged on (VERDICT r5 "Next round" #1/#6):

1. queries whose implementation changed this round and were NOT in the
   previous round's sample lead (they need fresh driver evidence and
   cost no rotation slot);
2. then every other query not sampled in the previous round, oldest
   driver-green round first (never-verified queries sort as round 0,
   i.e. first) — this is what walks the r1-green relational block back
   through the driver after four rounds of code evolution;
3. queries that WERE sampled in the previous round go last (changed
   ones first among them), so consecutive-round samples are disjoint
   while coverage is wide enough — local oracle-parity tests
   (tests/test_oracle_parity.py) cover in-round changes until their
   rotation slot comes up.

Ties break by registry declaration order, so the schedule is a pure
deterministic function of (history files, registry, touched set).

Greenness per round: ``hash_match is True`` for oracle-checked queries;
for rows-only queries (``err == "no_oracle"``) a recorded
``spark_rows`` is the strongest evidence the driver emits, so it counts
as that round's verification.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

_CORRECTNESS_GLOB = "CORRECTNESS_r*.json"
_ROUND_RE = re.compile(r"CORRECTNESS_r(\d+)\.json$")


def load_history(root: str | Path) -> dict[int, dict[str, dict]]:
    """Read every CORRECTNESS_r{N}.json under ``root`` -> {round: {query: row}}."""
    out: dict[int, dict[str, dict]] = {}
    for p in sorted(Path(root).glob(_CORRECTNESS_GLOB)):
        m = _ROUND_RE.search(p.name)
        if not m:
            continue
        try:
            data = json.loads(p.read_text())
        except (OSError, json.JSONDecodeError):
            continue
        if isinstance(data, dict):
            out[int(m.group(1))] = data
    return out


def _is_green(row: dict) -> bool:
    if row.get("hash_match") is True:
        return True
    # rows-only query: driver recorded a row count with no oracle error
    return row.get("err") == "no_oracle" and row.get("spark_rows") is not None


def compute_priority(
    registry_names: list[str],
    history: dict[int, dict[str, dict]],
    touched: set[str] | frozenset[str] = frozenset(),
    pinned: tuple[str, ...] = (),
) -> list[str]:
    """Order ``registry_names`` into the driver-sample schedule.

    ``pinned`` names lead the schedule unconditionally, in the given
    order, ahead of every bucket — the freeze VERDICT r6 #1 mandates:
    queries that have NEVER appeared in any CORRECTNESS_r*.json must
    not be displaced from the 50-slot sample by a fresh batch of
    touched-and-unsampled round-N work (round 6's 51 new queries
    squeezed 15 of themselves out exactly that way). Names in
    ``pinned`` that are absent from ``registry_names`` are ignored.

    Pure function of its inputs; see module docstring for the policy.
    """
    last_round = max(history) if history else 0
    prev_sample = set(history.get(last_round, {}))
    last_green: dict[str, int] = {}
    for rnd, rows in history.items():
        for name, row in rows.items():
            if _is_green(row):
                last_green[name] = max(last_green.get(name, 0), rnd)

    idx = {n: i for i, n in enumerate(registry_names)}
    pin_rank = {n: i for i, n in enumerate(pinned) if n in idx}

    def key(name: str):
        if name in pin_rank:
            return (-1, pin_rank[name], 0)
        in_prev = name in prev_sample
        is_touched = name in touched
        # touched ALWAYS leads (round 8, VERDICT r7 #3): an operator
        # whose implementation changed this round has stale evidence
        # no matter how recent — fresh-evidence-for-changed-code
        # outranks the consecutive-round disjointness that governs the
        # untouched buckets (previously touched-and-in-prev-sample sat
        # behind every never-in-prev query and fell out of the 50-slot
        # sample entirely, so a round-N fix went a full round unproven)
        if is_touched:
            bucket = 0
        elif not in_prev:
            bucket = 1
        else:
            bucket = 2
        return (bucket, last_green.get(name, 0), idx[name])

    return sorted(registry_names, key=key)
