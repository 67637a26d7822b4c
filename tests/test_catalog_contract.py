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
    res.release()
