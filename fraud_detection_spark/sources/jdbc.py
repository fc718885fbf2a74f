"""JDBC source/sink — the reference's Postgres surface re-expressed on
Spark's JDBC data source (reference: api/app.py:265-268 reads the
results table, api/worker.py:90-99 upserts with ON CONFLICT).

Runs against embedded Apache Derby (the JDBC driver Spark itself ships
with, so this works offline); the same helpers take any JDBC url +
driver — Postgres in the reference deployment.

Scale notes (the parts that matter on a cluster):
- reads must be PARTITIONED (``predicates`` or ``partitionColumn`` +
  bounds): an unpartitioned ``spark.read.jdbc`` funnels the whole table
  through ONE executor connection. Both forms are exercised in tests.
- the upsert follows the classic Spark-JDBC merge recipe: append the
  batch into a staging table with N parallel connections, then one
  transactional ``MERGE INTO`` on the database side (Derby >= 10.11
  and Postgres >= 15 both speak standard MERGE; the reference's
  ``ON CONFLICT DO UPDATE`` is the Postgres-specific equivalent).
  Spark never round-trips existing rows — the database does the merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_url(db_path: str, create: bool = True) -> str:
    return f"jdbc:derby:{db_path}" + (";create=true" if create else "")


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    driver: str = DERBY_DRIVER,
) -> None:
    """df -> JDBC table. Each write task opens its own connection, so a
    partitioned df writes with partition-parallelism."""
    df.write.format("jdbc").option("url", url).option("dbtable", table).option(
        "driver", driver
    ).mode(mode).save()


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str = DERBY_DRIVER,
    predicates: list[str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Partitioned JDBC read. Exactly one of ``predicates`` or
    ``partition_column``(+bounds) should be given for a parallel read;
    with neither, the read is single-connection (only for tiny tables).
    """
    props = {"driver": driver}
    if predicates is not None:
        return spark.read.jdbc(url, table, predicates=predicates, properties=props)
    if partition_column is not None:
        return spark.read.jdbc(
            url,
            table,
            column=partition_column,
            lowerBound=lower_bound,
            upperBound=upper_bound,
            numPartitions=num_partitions or 4,
            properties=props,
        )
    return spark.read.jdbc(url, table, properties=props)


def table_exists(spark: SparkSession, url: str, table: str) -> bool:
    """JDBC-metadata existence check. Unquoted identifiers are stored
    case-normalized (Derby/Postgres: upper/lower), so both the given
    and the upcased spelling are probed."""
    jvm = spark.sparkContext._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        for pat in (table, table.upper()):
            rs = conn.getMetaData().getTables(None, None, pat, None)
            if rs.next():
                return True
        return False
    finally:
        conn.close()


def execute_sql(spark: SparkSession, url: str, sql: str) -> None:
    """Run one DDL/DML statement on the database via the JVM's
    DriverManager (driver-side, one connection — used for MERGE/DDL,
    never for data transfer)."""
    jvm = spark.sparkContext._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        stmt = conn.createStatement()
        try:
            stmt.executeUpdate(sql)
        finally:
            stmt.close()
    finally:
        conn.close()


def upsert_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    key_cols: list[str],
    driver: str = DERBY_DRIVER,
) -> None:
    """ON-CONFLICT-DO-UPDATE parity (api/worker.py:90-99): append the
    batch to a staging table in parallel, then one server-side
    ``MERGE INTO`` keyed on ``key_cols``; replayed batches converge.

    The target table must exist (created by a prior ``write_jdbc``)."""
    spark = df.sparkSession
    staging = f"{table}_staging"
    write_jdbc(df, url, staging, mode="overwrite", driver=driver)
    cols = df.columns
    non_key = [c for c in cols if c not in key_cols]
    # string keys arrive as CLOB in Derby (Spark's default mapping) and
    # CLOBs are not comparable — cast both sides for the join predicate
    dtypes = dict(df.dtypes)

    def key_expr(side: str, c: str) -> str:
        ref = f'{side}."{c}"'
        return f"CAST({ref} AS VARCHAR(512))" if dtypes[c] == "string" else ref

    on = " AND ".join(f"{key_expr('t', c)} = {key_expr('s', c)}" for c in key_cols)
    set_clause = ", ".join(f't."{c}" = s."{c}"' for c in non_key)
    insert_cols = ", ".join(f'"{c}"' for c in cols)
    insert_vals = ", ".join(f's."{c}"' for c in cols)
    execute_sql(
        spark,
        url,
        f'MERGE INTO {table} t USING {staging} s ON {on} '
        f"WHEN MATCHED THEN UPDATE SET {set_clause} "
        f"WHEN NOT MATCHED THEN INSERT ({insert_cols}) VALUES ({insert_vals})",
    )
    execute_sql(spark, url, f"DROP TABLE {staging}")
