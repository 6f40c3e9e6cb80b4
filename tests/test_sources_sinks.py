"""Source/sink roundtrip tests: all-string scans, partitioned parquet."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_excel_sql__spark.sinks.excel_writer import CellGrid
from etl_pipeline_excel_sql__spark.sinks.parquet import (
    write_csv,
    write_json,
    write_parquet_partitioned,
)
from etl_pipeline_excel_sql__spark.sources.excel import (
    grid_to_dataframe,
    read_csv_all_string,
)


def test_grid_to_dataframe_all_string_with_ordinal(spark):
    grid = CellGrid()
    grid.set(1, 1, "Key")
    grid.set(1, 2, "Val")
    grid.set(2, 1, "a")
    grid.set(2, 2, 42)       # non-string cell -> stringified
    grid.set(3, 1, "b")      # missing (3,2) -> NULL
    df = grid_to_dataframe(spark, grid)
    assert df.columns == ["Key", "Val", "_row_ordinal"]
    assert [f.dataType.simpleString() for f in df.schema.fields[:2]] == [
        "string", "string",
    ]
    rows = {r.Key: (r.Val, r._row_ordinal) for r in df.collect()}
    assert rows == {"a": ("42", 0), "b": (None, 1)}


def test_csv_all_string_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, 2.5, "x"), (2, 3.0, None)], "a int, b double, c string")
    path = str(tmp_path / "csv")
    write_csv(df, path)
    back = read_csv_all_string(spark, path)
    assert all(f.dataType.simpleString() == "string" for f in back.schema.fields)
    got = {r.a: (r.b, r.c) for r in back.collect()}
    assert got["1"] == ("2.5", "x")
    assert got["2"][0] == "3.0"


def test_json_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string")
    path = str(tmp_path / "json")
    write_json(df, path)
    back = spark.read.json(path)
    assert {(r.id, r.v) for r in back.collect()} == {(1, "x"), (2, "y")}


def test_partitioned_parquet_prunes(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, "even" if i % 2 == 0 else "odd") for i in range(100)],
        "id long, parity string",
    )
    path = str(tmp_path / "pq")
    write_parquet_partitioned(df, path, partition_cols=["parity"])
    back = spark.read.parquet(path)
    assert back.count() == 100
    # partition pruning: the filtered scan must read only one directory
    pruned = back.filter(F.col("parity") == "even")
    assert pruned.count() == 50
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_partitioned_parquet_salted_file_count(spark, tmp_path):
    df = spark.createDataFrame([(i, "k") for i in range(1000)], "id long, part string")
    path = str(tmp_path / "salted")
    write_parquet_partitioned(df, path, partition_cols=["part"], files_per_partition=3)
    import glob

    files = glob.glob(f"{path}/part=k/*.parquet")
    assert 1 <= len(files) <= 4
    assert spark.read.parquet(path).count() == 1000


def test_compact_parquet(spark, tmp_path):
    from etl_pipeline_excel_sql__spark.sinks.parquet import compact_parquet

    src = str(tmp_path / "many")
    df = spark.createDataFrame([(i,) for i in range(1000)], "id long")
    df.repartition(20).write.parquet(src)  # 20 small files
    import glob

    assert len(glob.glob(f"{src}/*.parquet")) == 20
    out = str(tmp_path / "compacted")
    n = compact_parquet(spark, src, out, target_file_bytes=10**9)
    assert n == 1
    assert len(glob.glob(f"{out}/*.parquet")) == 1
    assert spark.read.parquet(out).count() == 1000
