"""Catalog / DDL surface (SURVEY.md §2.G ops G5/G6).

The reference's HBase DDL (``HbaseDML.java:48-95``: create namespace,
create table with existence check) maps to the Spark catalog: CREATE
DATABASE IF NOT EXISTS / saveAsTable / catalog introspection.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.smoke  # ~5-min preflight tier (COVERAGE.md)


@pytest.fixture()
def catalog_db(spark):
    spark.sql("CREATE DATABASE IF NOT EXISTS gmall_test")
    yield "gmall_test"
    spark.sql("DROP DATABASE IF EXISTS gmall_test CASCADE")


def test_ddl_create_namespace_idempotent(spark, catalog_db):
    """G6 (``HbaseDML.java:48-60``): idempotent namespace creation."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {catalog_db}")  # second time
    assert any(db.name == catalog_db for db in spark.catalog.listDatabases())


def test_ddl_create_table_and_existence_check(spark, sf_dir, catalog_db):
    """G5 (``HbaseDML.java:63-95``): create-if-absent + write + read back."""
    tbl = f"{catalog_db}.dim_nation"
    if not spark.catalog.tableExists(tbl):
        (spark.read.parquet(f"{sf_dir}/nation.parquet")
         .write.saveAsTable(tbl))
    assert spark.catalog.tableExists(tbl)
    n = spark.table(tbl).count()
    assert n == spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    # point get through the catalog table (G1 over the created table)
    row = spark.table(tbl).filter(F.col("n_nationkey") == 7).collect()
    assert len(row) == 1


def test_ddl_sql_view(spark, sf_dir, catalog_db):
    """Views complete the DDL surface: the SQL entry point works over
    registered tables (the reference's unused spark-sql dependency)."""
    spark.read.parquet(f"{sf_dir}/region.parquet").createOrReplaceTempView("region_v")
    out = spark.sql("SELECT r_name, count(*) AS n FROM region_v GROUP BY r_name")
    assert out.count() == 5
