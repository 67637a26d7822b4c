from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedupe_spark.catalog import SnapshotCatalog
from dedupe_spark.functions.ids import with_dense_id


def test_dense_id_matches_global_window(spark):
    rows = [(f"k{i:04d}",) for i in range(500)]
    df = spark.createDataFrame(rows, "fp string").repartition(13)
    got = {r["fp"]: r["block_id"] for r in with_dense_id(df, ["fp"]).collect()}
    expect = {f"k{i:04d}": i for i in range(500)}
    assert got == expect


def test_dense_id_deterministic(spark):
    rows = [(f"x{i % 97:03d}{i:04d}",) for i in range(300)]
    df = spark.createDataFrame(rows, "fp string")
    a = {r["fp"]: r["block_id"] for r in with_dense_id(df.repartition(3), ["fp"]).collect()}
    b = {r["fp"]: r["block_id"] for r in with_dense_id(df.repartition(17), ["fp"]).collect()}
    assert a == b


def test_catalog_atomic_overwrite_and_time_travel(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path / "wh"))
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    df2 = spark.createDataFrame([(3, "c")], "id long, v string")
    s1 = cat.write("t", df1, summary={"rows": 2})
    s2 = cat.write("t", df2)
    assert (s1, s2) == (1, 2)
    assert cat.read("t").count() == 1  # current = overwrite
    assert cat.read("t", snapshot_id=1).count() == 2  # time travel
    snaps = cat.snapshots("t")
    assert [s["snapshot_id"] for s in snaps] == [1, 2]
    assert snaps[0]["summary"] == {"rows": 2}


def test_catalog_append_mode(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path / "wh2"))
    df1 = spark.createDataFrame([(1,)], "id long")
    df2 = spark.createDataFrame([(2,)], "id long")
    cat.write("t", df1)
    cat.write("t", df2, mode="append")
    assert sorted(r["id"] for r in cat.read("t").collect()) == [1, 2]


def test_catalog_missing_table_raises(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path / "wh3"))
    with pytest.raises(FileNotFoundError):
        cat.read("nope")
