"""Worker-side import independence: declared queries must run when the
python workers CANNOT import this package.

cloudpickle serializes module-level functions by reference, so an
Arrow stage / pandas_udf that touches a module-level helper makes the
worker re-import fraud_detection_spark — which fails whenever the
consuming driver runs from a foreign cwd with the repo reachable only
through its own sys.path (8 of 160 declared queries broke this way).
The package registers itself for pickle-by-value in __init__
(vendored-cloudpickle parent-package walk covers every submodule);
this test pins the property by driving representative previously-
failing queries from a subprocess whose cwd is a temp dir.
"""

from __future__ import annotations

import subprocess
import sys

# one per affected shape: module-level Arrow fn (chunk dedup), nested
# closure calling a module helper (BPE), decorated @pandas_udf
# (udf_examples), applyInPandas (semdedup), module helper chain
# (media features)
_PROBE_QUERIES = (
    "q_chunk_dedup",
    "q_bpe_tokens",
    "q_pandas_udf_score",
    "q_semdedup",
    "q_media_features",
)

_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
import __spark_entry__ as e
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
qs = e.queries()
for name in {queries!r}:
    n = qs[name](spark, "/root/testdata/sf0.001").count()
    print("RAN", name, n, flush=True)
spark.stop()
"""


def test_declared_queries_run_from_foreign_cwd(tmp_path):
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH",)  # the breakage this test guards against
    }
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=repo, queries=_PROBE_QUERIES)],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    for name in _PROBE_QUERIES:
        assert f"RAN {name}" in proc.stdout, (name, proc.stdout, proc.stderr[-2000:])
