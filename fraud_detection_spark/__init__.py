"""fraud_detection_spark — a PySpark-native analytics engine.

Re-expresses the query / data-processing capabilities of the reference
fraud-detection MLOps pipeline (wtfashwin/fraud-detection) as idiomatic
Spark: DataFrame/SQL for the relational surface, MLlib for the model
pipeline, Structured Streaming for the online/async serving path, plus
LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) designed for 100 TB scale.

Layout
------
- ``session``    : tuned SparkSession builder
- ``registry``   : declared-query registry (name -> callable + oracle SQL)
- ``sources``    : table loaders, schemas, synthetic generators
- ``operators``  : relational / aggregate / window / ML-metric / text /
                   dedup / similarity operators, each a registered query
- ``functions``  : reusable column-expression helpers
- ``ml``         : SMOTE transformer + MLlib training pipeline
- ``streaming``  : Structured Streaming serving path (score -> upsert)
- ``plans``      : physical-plan assertions (pushdown / broadcast checks)
"""

__version__ = "0.1.0"

# Ship this package's functions to python workers BY VALUE.
#
# cloudpickle serializes module-level functions by *reference* (the
# worker re-imports the defining module), so any declared query whose
# Arrow stage / pandas_udf touches a module-level helper — bpe_encode,
# the CDC chunker, the media featurizers — fails with
# ModuleNotFoundError the moment the consuming driver's python workers
# don't have this repo on their import path (e.g. driver launched from
# another cwd with sys.path pointing here; reproduced on a vanilla
# session — 8 of 160 declared queries broke). Registering the package
# for pickle-by-value makes every function defined under
# fraud_detection_spark self-contained on the wire (the vendored
# cloudpickle walks parent packages, so one registration covers all
# submodules). The referenced globals are small published constants
# (merge tables, weight vectors, cache caps) — KBs in the task
# closure, the same payload the nested-closure pattern already ships.
try:  # pragma: no cover - trivial guard for non-pyspark contexts
    import sys as _sys

    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # noqa: BLE001 - best-effort: by-reference still works in-repo
    pass
