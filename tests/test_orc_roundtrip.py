"""ORC round-trip with the same Catalyst contracts as parquet:
pushdown, pruning, partition filters, and value-exact content."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_orc_roundtrip_pushdown_and_pruning(spark, sf_dir, tmp_path):
    from fraud_detection_spark.plans.checks import formatted_plan
    from fraud_detection_spark.sources import load_table
    from fraud_detection_spark.sources.orc import read_orc, write_orc

    li = load_table(spark, sf_dir, "lineitem")
    out = str(tmp_path / "lineitem_orc")
    write_orc(li, out)

    back = read_orc(spark, out)
    assert back.count() == li.count()

    q = back.filter(F.col("l_quantity") > 45).select("l_orderkey", "l_quantity")
    plan = formatted_plan(q)
    assert "PushedFilters" in plan and "l_quantity" in plan, plan
    assert "l_comment" not in plan  # column pruning: unused cols absent
    want = li.filter(F.col("l_quantity") > 45).count()
    assert q.count() == want

    # content equality on a deterministic projection
    a = (
        back.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .toPandas()
        .sort_values(["l_orderkey", "l_linenumber"])
        .reset_index(drop=True)
    )
    b = (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .toPandas()
        .sort_values(["l_orderkey", "l_linenumber"])
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_orc_partitioned_prunes_directories(spark, sf_dir, tmp_path):
    from fraud_detection_spark.plans.checks import formatted_plan
    from fraud_detection_spark.sources import load_table
    from fraud_detection_spark.sources.orc import read_orc, write_orc

    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_orc_by_lang")
    write_orc(docs, out, partition_cols=["lang"])

    back = read_orc(spark, out)
    q = back.filter(F.col("lang") == "en").select("doc_id")
    plan = formatted_plan(q)
    assert "PartitionFilters" in plan and "lang" in plan, plan
    assert q.count() == docs.filter(F.col("lang") == "en").count()
