"""Write-layout helpers: partitioned writes and small-file compaction."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sparkstreamingproject_spark.sources.writers import (
    compact_parquet, write_partitioned,
)


def _count_files(path):
    return sum(1 for dp, _, fs in os.walk(path)
               for f in fs if f.endswith(".parquet"))


def test_write_partitioned_prunes(spark, sf_dir, tmp_path):
    out = str(tmp_path / "by_status")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_partitioned(orders, out, ["o_orderstatus"], mode="overwrite")
    # partition pruning: reading one status touches only its directory
    one = spark.read.parquet(out).filter(F.col("o_orderstatus") == "F")
    assert one.count() == orders.filter("o_orderstatus = 'F'").count()
    from sparkstreamingproject_spark.plans.inspect import explain_str
    assert "o_orderstatus" in explain_str(one)  # appears as PartitionFilters


def test_compact_parquet_reduces_files(spark, sf_dir, tmp_path):
    out = str(tmp_path / "fragmented")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li.repartition(40).write.parquet(out)  # simulate streaming small files
    before_files = _count_files(out)
    before_rows = spark.read.parquet(out).count()
    after_files = compact_parquet(spark, out)
    assert after_files < before_files
    assert spark.read.parquet(out).count() == before_rows
