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
