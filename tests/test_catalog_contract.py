"""One contract, two backends: SnapshotCatalog (parquet emulation) and
IcebergCatalog (native, skipped when the runtime jar is absent).

pipeline.commit only uses this surface, so passing the contract means
the pipeline publishes correctly against either backend.
"""

from __future__ import annotations

import pytest

from dedupe_spark.catalog import IcebergCatalog, SnapshotCatalog


@pytest.fixture(params=["snapshot", "iceberg"])
def catalog(request, spark, tmp_path):
    if request.param == "iceberg":
        if not IcebergCatalog.is_available(spark):
            pytest.skip("iceberg-spark-runtime not on the classpath")
        return IcebergCatalog(spark)
    return SnapshotCatalog(spark, str(tmp_path / "warehouse"))


def test_catalog_contract(spark, catalog):
    t = "contract_tbl"
    assert not catalog.exists(t)

    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    s1 = catalog.write(t, df1)
    assert catalog.exists(t)
    assert sorted(map(tuple, catalog.read(t).collect())) == [(1, "a"), (2, "b")]

    # overwrite replaces contents, produces a new snapshot
    df2 = spark.createDataFrame([(3, "c")], "id long, v string")
    s2 = catalog.write(t, df2)
    assert s2 != s1
    assert sorted(map(tuple, catalog.read(t).collect())) == [(3, "c")]

    # append unions with the current snapshot
    df3 = spark.createDataFrame([(4, "d")], "id long, v string")
    catalog.write(t, df3, mode="append")
    assert sorted(map(tuple, catalog.read(t).collect())) == [(3, "c"), (4, "d")]

    # time travel: the first snapshot is still readable
    assert sorted(map(tuple, catalog.read(t, snapshot_id=s1).collect())) == [(1, "a"), (2, "b")]

    # snapshot history is monotone and complete
    sids = [s["snapshot_id"] for s in catalog.snapshots(t)]
    assert len(sids) == 3 and len(set(sids)) == 3


def test_catalog_summary_round_trip(spark, catalog):
    """The commit summary surfaces in the snapshot history (ADVICE r2:
    IcebergCatalog silently dropped it; now attached as snapshot
    properties on both backends)."""
    t = "summary_tbl"
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    catalog.write(t, df, summary={"batch_id": 7, "source": "contract"})
    snaps = catalog.snapshots(t)
    merged = {k: str(v) for s in snaps for k, v in (s.get("summary") or {}).items()}
    assert merged.get("batch_id") == "7"
    assert merged.get("source") == "contract"


def test_pipeline_commit_against_catalog(spark, catalog):
    from dedupe_spark import fixtures, pipeline

    tr = fixtures.transcripts(spark, n_conv=30)
    n_convs = tr.select("conv_id").distinct().count()  # base + injected dups
    res = pipeline.run(tr, catalog=catalog)
    assert catalog.exists("clusters")
    assert catalog.read("clusters").count() == n_convs
    assert catalog.read("metrics").count() > 0
    # the registry is committed bucket-partitioned on fp (SURVEY §1.2
    # HashDB bucket mapping) — the read view carries the bucket column
    assert "fp_bucket" in catalog.read("unique_turns").columns
    res.release()


def test_catalog_partitioned_layout_and_pruning(spark, catalog, tmp_path):
    """partition_by produces a genuinely partitioned table (round 3's
    SnapshotCatalog accepted-and-silently-dropped it — VERDICT r3 #1 of
    'What's missing'), and a probe filtered on the bucket column prunes
    the scan to its partition instead of reading the whole registry."""
    import os

    from pyspark.sql import functions as F

    from dedupe_spark.operators.lifecycle import with_fp_bucket

    t = "bucketed_tbl"
    df = spark.createDataFrame(
        [(f"fp{i}", i) for i in range(200)], "fp string, block_id long"
    )
    catalog.write(t, with_fp_bucket(df, n_buckets=8), partition_by=["fp_bucket"])
    got = catalog.read(t)
    assert sorted(r["fp"] for r in got.collect()) == sorted(f"fp{i}" for i in range(200))

    # appends keep the layout, and the union view stays consistent
    df2 = spark.createDataFrame([("fpX", 200)], "fp string, block_id long")
    catalog.write(t, with_fp_bucket(df2, n_buckets=8), mode="append", partition_by=["fp_bucket"])
    assert catalog.read(t).count() == 201

    if isinstance(catalog, SnapshotCatalog):
        snap_dirs = [
            d for d in os.listdir(os.path.join(catalog.warehouse, t))
            if d.startswith("snap-")
        ]
        assert snap_dirs
        for d in snap_dirs:
            parts = os.listdir(os.path.join(catalog.warehouse, t, d))
            assert any(p.startswith("fp_bucket=") for p in parts), (d, parts)
        # a bucket-filtered probe reaches the scan as a PartitionFilter
        # (file pruning), not a post-scan Filter over all rows
        plan = (
            catalog.read(t)
            .where(F.col("fp_bucket") == 3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PartitionFilters" in plan and "fp_bucket" in plan.split("PartitionFilters", 1)[1][:200]


def test_incremental_probe_on_bucketed_registry(spark, tmp_path):
    """register_turns_incremental probes a bucket-partitioned registry on
    (fp_bucket, fp) and produces the same merged registry as the
    unbucketed probe — and the probe's scan carries partition pruning
    machinery (dynamic pruning subquery or partition filters) rather
    than a full-table scan."""
    from dedupe_spark import fixtures
    from dedupe_spark.operators.lifecycle import (
        register_turns,
        register_turns_incremental,
        with_fp_bucket,
    )

    tr = fixtures.transcripts(spark, n_conv=24).persist()
    convs = sorted(r["conv_id"] for r in tr.select("conv_id").distinct().collect())
    cut = convs[len(convs) // 2]
    from pyspark.sql import functions as F

    b1, b2 = tr.where(F.col("conv_id") < cut), tr.where(F.col("conv_id") >= cut)
    u1, m1 = register_turns(b1)

    cat = SnapshotCatalog(spark, str(tmp_path / "wh"))
    cat.write("unique_turns", with_fp_bucket(u1), partition_by=["fp_bucket"])
    u1_bucketed = cat.read("unique_turns")

    u_plain, m_plain = register_turns_incremental(b2, u1, m1)
    u_buck, m_buck = register_turns_incremental(b2, u1_bucketed, m1)
    assert sorted(map(tuple, u_buck.select("fp", "block_id").collect())) == sorted(
        map(tuple, u_plain.select("fp", "block_id").collect())
    )
    assert m_buck.count() == m_plain.count()
    tr.unpersist()


def test_catalog_compact_folds_append_history(spark, catalog):
    """compact() rewrites the read view as one snapshot: same rows, one
    data dir (SnapshotCatalog), partition layout preserved, and time
    travel to the pre-compaction snapshot untouched — the read-side
    complement of O(batch) append commits (scan cost must track data
    size, not ingest history)."""
    import os

    t = "compact_tbl"
    df = spark.createDataFrame(
        [(f"fp{i}", i) for i in range(40)], "fp string, block_id long"
    )
    from dedupe_spark.operators.lifecycle import with_fp_bucket

    catalog.write(t, with_fp_bucket(df, n_buckets=4), partition_by=["fp_bucket"])
    for j in range(40, 43):
        d = spark.createDataFrame([(f"fp{j}", j)], "fp string, block_id long")
        catalog.write(t, with_fp_bucket(d, n_buckets=4), mode="append", partition_by=["fp_bucket"])
    before = sorted(map(tuple, catalog.read(t).select("fp", "block_id").collect()))
    pre_sid = catalog.current_snapshot_id(t)

    sid = catalog.compact(t)
    after = sorted(map(tuple, catalog.read(t).select("fp", "block_id").collect()))
    assert after == before

    if isinstance(catalog, SnapshotCatalog):
        meta = catalog._read_meta(t, sid)
        assert len(meta["data_dirs"]) == 1  # the union view folded flat
        assert meta["summary"]["compacted_data_dirs"] == 4
        # the compacted snapshot keeps the hive-partitioned bucket layout
        parts = os.listdir(meta["data_dirs"][0])
        assert any(p.startswith("fp_bucket=") for p in parts), parts
        # time travel: the pre-compaction view is still readable by id
        tt = sorted(
            map(tuple, catalog.read(t, snapshot_id=pre_sid).select("fp", "block_id").collect())
        )
        assert tt == before
