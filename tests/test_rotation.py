"""Ordering-property tests for the automated driver-sample rotation
(fraud_detection_spark/rotation.py, VERDICT r5 next-round #6)."""

from __future__ import annotations

import json
from pathlib import Path

from fraud_detection_spark.rotation import compute_priority, load_history

REPO = Path(__file__).resolve().parent.parent

GREEN = {"rows_match": True, "schema_match": True, "hash_match": True,
         "spark_rows": 1, "oracle_rows": 1, "err": None}
ROWS_ONLY = {"rows_match": None, "schema_match": None, "hash_match": None,
             "spark_rows": 3, "oracle_rows": None, "err": "no_oracle"}
FAILED = {"rows_match": True, "schema_match": True, "hash_match": False,
          "spark_rows": 1, "oracle_rows": 1, "err": None}


def test_prev_round_sample_goes_last():
    names = ["a", "b", "c", "d"]
    history = {1: {"a": GREEN, "b": GREEN}, 2: {"c": GREEN}}
    order = compute_priority(names, history)
    # c was sampled in the latest round (2) -> last; a/b green in r1 and
    # d never sampled (green-round 0) -> d first, then a, b.
    assert order == ["d", "a", "b", "c"]


def test_touched_and_unsampled_leads():
    names = ["a", "b", "c"]
    history = {1: {"a": GREEN}, 2: {"b": GREEN}}
    order = compute_priority(names, history, touched={"a"})
    assert order[0] == "a"  # touched beats oldest-green c (never sampled)
    assert order == ["a", "c", "b"]


def test_touched_in_prev_sample_leads_everything():
    """Round 8 (VERDICT r7 #3): a touched query's evidence is stale by
    definition, so it outranks even never-in-prev-sample queries —
    previously it sat behind all of them and fell out of the sample."""
    names = ["a", "b", "c"]
    history = {1: {"c": GREEN}, 2: {"a": GREEN, "b": GREEN}}
    order = compute_priority(names, history, touched={"b"})
    assert order == ["b", "c", "a"]


def test_rows_only_counts_as_green_failure_does_not():
    names = ["ok", "rows", "bad"]
    history = {1: {"ok": GREEN, "rows": ROWS_ONLY, "bad": FAILED}, 2: {}}
    order = compute_priority(names, history)
    # bad has no green round (0) -> first; ok/rows tie on round 1 ->
    # registry order.
    assert order == ["bad", "ok", "rows"]


def test_deterministic_and_total():
    names = [f"q{i}" for i in range(20)]
    history = {1: {f"q{i}": GREEN for i in range(0, 10)},
               2: {f"q{i}": GREEN for i in range(5, 9)}}
    a = compute_priority(names, history, touched={"q3"})
    b = compute_priority(list(names), dict(history), touched={"q3"})
    assert a == b
    assert sorted(a) == sorted(names)


def test_real_schedule_first_50_disjoint_from_latest_round():
    """The driver samples the first 50 of queries(); the computed r6
    schedule must not repeat anything the r5 driver already checked
    (VERDICT r5 next-round #1)."""
    import sys

    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entry

    history = load_history(REPO)
    assert history, "CORRECTNESS_r*.json history must exist at repo root"
    latest = max(history)
    prev_sample = set(history[latest])
    names = list(entry.queries())
    new_this_round = [n for n in names if not any(n in h for h in history.values())]
    first50 = set(names[:50])
    # untouched prev-round queries stay out of the sample entirely
    assert not (first50 & prev_sample - entry._TOUCHED_THIS_ROUND)
    # touched queries ALWAYS make the sample (VERDICT r7 #3: the
    # CORRECTNESS_rN sample must contain every operator added or
    # touched in round N), even the ones sampled last round
    assert entry._TOUCHED_THIS_ROUND <= first50
    # the remaining budget goes to queries with no driver history: when
    # more than 50 such queries exist (round 6 added 51+), the prefix
    # must be exhausted by touched + new (pigeonhole); otherwise every
    # new query must be inside the prefix
    if len(new_this_round) + len(entry._TOUCHED_THIS_ROUND) >= 50:
        assert first50 <= set(new_this_round) | entry._TOUCHED_THIS_ROUND
    else:
        assert set(new_this_round) <= first50


def test_real_schedule_oldest_green_first():
    """Within the unsampled/untouched bucket the schedule is
    non-decreasing in last-driver-green round."""
    import sys

    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entry

    history = load_history(REPO)
    latest = max(history)
    prev_sample = set(history[latest])
    last_green: dict[str, int] = {}
    for rnd, rows in history.items():
        for name, row in rows.items():
            green = row.get("hash_match") is True or (
                row.get("err") == "no_oracle" and row.get("spark_rows") is not None
            )
            if green:
                last_green[name] = max(last_green.get(name, 0), rnd)
    names = list(entry.queries())
    bucket1 = [
        n for n in names
        if n not in prev_sample and n not in entry._TOUCHED_THIS_ROUND
    ]
    greens = [last_green.get(n, 0) for n in bucket1]
    assert greens == sorted(greens)


def test_history_loader_shape():
    history = load_history(REPO)
    assert set(history) == set(range(1, max(history) + 1))
    for rows in history.values():
        assert rows and all(isinstance(v, dict) for v in rows.values())


def test_pinned_head_leads_in_given_order():
    """Pinned names lead the schedule in the given order, even ahead of
    touched-and-unsampled queries (VERDICT r6 #1 freeze); pinned names
    absent from the registry are ignored."""
    names = ["a", "b", "c", "d"]
    history = {1: {"a": GREEN}, 2: {"b": GREEN}}
    order = compute_priority(names, history, touched={"d"}, pinned=("c", "a", "zz"))
    assert order[:2] == ["c", "a"]
    assert order == ["c", "a", "d", "b"]


def test_real_schedule_pins_lead_until_satisfied():
    """Pinned operators with zero driver history (VERDICT r6 'What's
    missing' #1) must occupy the head of the sample; pins AUTO-RETIRE
    once driver evidence exists (so this test stays meaningful across
    rounds without edits — in round 8, once CORRECTNESS_r07 records
    them, live_pins is empty and the normal rotation resumes)."""
    import sys

    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entry

    history = load_history(REPO)
    ever = {n for rows in history.values() for n in rows}
    live = [n for n in entry._PINNED_HEAD if n not in ever]
    names = list(entry.queries())
    assert names[: len(live)] == live
    # regardless of pin retirement, anything never driver-sampled must
    # still fit the 50-slot sample (or fill it entirely)
    never = [n for n in names if n not in ever]
    if len(never) < 50:
        assert set(never) <= set(names[:50])
    else:
        assert set(names[:50]) <= set(never)
