from __future__ import annotations

from pyspark.sql import functions as F

from dedupe_spark import fixtures


def test_plan_deterministic():
    p1 = fixtures.build_plan(100)
    p2 = fixtures.build_plan(100)
    assert p1.equals(p2)
    assert (p1["dup_class"].isin(["base", "exact", "near", "structural"])).all()
    # ~30% of base convs spawn duplicates
    n_base = (p1["dup_class"] == "base").sum()
    assert n_base == 100
    assert len(p1) > 110  # copies exist


def test_transcript_schema_and_invariants(spark, transcripts_small):
    df = transcripts_small
    assert df.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    # turn 0 is always user
    assert df.where("turn_idx = 0").where("role != 'user'").count() == 0
    # contiguous turn_idx per conversation
    agg = df.groupBy("conv_id").agg(
        F.count("*").alias("n"), F.max("turn_idx").alias("mx"), F.min("turn_idx").alias("mn")
    )
    assert agg.where((F.col("mx") != F.col("n") - 1) | (F.col("mn") != 0)).count() == 0
    # tool set only on tool turns
    assert df.where("role != 'tool' AND tool IS NOT NULL").count() == 0
    assert df.where("role = 'tool' AND tool IS NULL").count() == 0
    # ts strictly increasing within conversation (30s steps)
    assert df.count() > 400


def test_generation_is_deterministic_across_runs(spark):
    a = fixtures.transcripts(spark, n_conv=30).orderBy("conv_id", "turn_idx").collect()
    b = fixtures.transcripts(spark, n_conv=30).orderBy("conv_id", "turn_idx").collect()
    assert a == b


def test_exact_duplicates_are_exact(spark, transcripts_small):
    plan = fixtures.build_plan(120)
    exact = plan[plan["dup_class"] == "exact"]
    if len(exact) == 0:
        return
    row = exact.iloc[0]
    df = transcripts_small
    a = [r["text"] for r in df.where(F.col("conv_id") == row["conv_id"]).orderBy("turn_idx").collect()]
    b = [
        r["text"]
        for r in df.where(F.col("conv_id") == row["cluster_seed_id"]).orderBy("turn_idx").collect()
    ]
    assert a == b and len(a) > 0


def test_labeled_pairs_sane(spark):
    lp = fixtures.labeled_pairs(spark, n_conv=120)
    counts = {r["is_dup"]: r["n"] for r in lp.groupBy("is_dup").agg(F.count("*").alias("n")).collect()}
    assert counts.get(True, 0) > 10
    assert counts.get(False, 0) >= 3 * counts.get(True, 0)
    assert lp.where("conv_id_a >= conv_id_b").count() == 0
