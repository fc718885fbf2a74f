#!/usr/bin/env python
"""Construct/execute decomposition of the HEADLINE suite (guide §1).

For every HEADLINE query, in one warm tuned session, measures
  construct = wall of fn(spark, SF_DIR)   (driver-side plan building;
              for eager=True queries this includes their Spark jobs)
  execute   = wall of the noop-sink write (the distributed compute)
and, when PY4J_COUNT=1, the number of py4j commands issued during
construction (the round-trip chatter the construction fixes target).

Prints one line per query sorted by construct desc, then totals.
This is the round-16/17 optimization instrument: the driver runs each
query ONCE in one long session, so construction seconds are bench
seconds at 1:1.

Usage:
    python tools/decompose.py [q_name ...]     # default: all HEADLINE

Env:
    SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)
    PY4J_COUNT=1         also count py4j commands per construction
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from bench import HEADLINE
    from fraud_detection_spark.registry import load_all
    from fraud_detection_spark.session import get_spark

    names = sys.argv[1:] or HEADLINE
    registry = load_all()
    spark = get_spark("fds-decompose")
    spark.range(1000).summary().collect()
    spark.range(64).repartition(32).mapInPandas(
        lambda batches: batches, schema="id bigint"
    ).write.format("noop").mode("overwrite").save()

    count_py4j = os.environ.get("PY4J_COUNT") == "1"
    counter = {"n": 0}
    if count_py4j:
        client = spark.sparkContext._gateway._gateway_client
        orig = client.send_command

        def counted(*a, **kw):
            counter["n"] += 1
            return orig(*a, **kw)

        client.send_command = counted

    rows = []
    for name in names:
        q = registry[name]
        counter["n"] = 0
        t0 = time.perf_counter()
        df = q.fn(spark, SF_DIR)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        rows.append(
            {
                "name": name,
                "construct": round(t1 - t0, 3),
                "execute": round(t2 - t1, 3),
                "eager": q.eager,
                "py4j": counter["n"] if count_py4j else None,
            }
        )

    rows.sort(key=lambda r: -r["construct"])
    for r in rows:
        py = f" py4j={r['py4j']}" if r["py4j"] is not None else ""
        eager = " EAGER" if r["eager"] else ""
        print(
            f"{r['name']}: construct {r['construct']:7.3f}  "
            f"execute {r['execute']:7.3f}{py}{eager}"
        )
    tc = sum(r["construct"] for r in rows)
    te = sum(r["execute"] for r in rows)
    print(
        json.dumps(
            {
                "n_queries": len(rows),
                "construct_total": round(tc, 1),
                "execute_total": round(te, 1),
                "total": round(tc + te, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
